"""Pallas TPU kernel for the rasterizer's tile shading (forward + custom VJP).

The XLA formulation in rasterizer.py materializes (pixels x edge-candidates)
intermediates per tile in the backward pass; this kernel keeps the whole
(tile_px^2 x Ke) computation in VMEM registers, unrolling the static edge
-candidate loop, and implements the exact backward analytically:

  forward:  winding(p) = anchor(p) + sum_k sign_k * crossing_k(p)
            d2(p) = min_k dist^2(p, segment_k)   [+ argmin k*]
            sil(p) = sigmoid(sign(winding) * d2 / sigma)

  backward: only the argmin segment k*(p) receives gradient;
            d(d2)/d(endpoints) uses the envelope theorem through the
            clamped projection parameter t (exactly what XLA autodiff
            computes, without the (P x Ke) mask materialization).

Lane-dense pixel layout: a (tile_px, tile_px) block maps poorly onto the
VPU's (8, 128) vector registers when tile_px < 128 (a 32x32 f32 array pads
its 32 lanes to 128 -> 4x idle lanes on every elementwise op). When
tile_px^2 is a multiple of 128 the kernels therefore work on the tile's
pixels FLATTENED to (tile_px^2 / 128, 128) — e.g. tile_px=32 -> (8, 128),
exactly one fully-dense vreg — recovering pixel coordinates from a flat
iota. The XLA caller reshapes the per-pixel buffers (anchors, sil, amin,
gcot) to the flat layout around the pallas_call (free: layout-only).
Small tiles with tile_px^2 < 128 keep the 2D form.

Per-tile packed inputs (built in XLA, gathers stay outside the kernel):
  seg_pack (B, T, 8, Ke): rows = [p0x, p0y, p1x, p1y, sign, valid, flip, 0]
  anchors  (B, T, R, 128) flat (or (B, T, tp, tp) when tp^2 < 128)

The kernel grid is (B, T); each instance shades one tile.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def is_tpu_backend() -> bool:
    """True on TPU-like backends (native 'tpu' or plugin platforms such as
    the axon relay) where the Mosaic-TPU Pallas kernels can lower; False on
    cpu/gpu, which take interpreter mode / the XLA fallback paths."""
    return jax.default_backend() not in ("cpu", "gpu", "cuda", "rocm")


def _interpret() -> bool:
    # Interpreter mode off-TPU so the kernel is testable without one
    # (Mosaic TPU lowering is not available on cpu/gpu backends).
    return not is_tpu_backend()


def pix_shape(tile_px: int):
    """In-kernel pixel-array shape: lane-dense flat form when possible."""
    P = tile_px * tile_px
    if P % 128 == 0:
        return (P // 128, 128)
    return (tile_px, tile_px)


def _pixel_grids(tile_px: int):
    """ix, iy pixel-index grids (float) in the kernel's pixel-array shape."""
    shape = pix_shape(tile_px)
    if shape == (tile_px, tile_px):
        iy = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        ix = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    else:
        pid = (jax.lax.broadcasted_iota(jnp.int32, shape, 0) * 128
               + jax.lax.broadcasted_iota(jnp.int32, shape, 1))
        iy = pid // tile_px
        ix = pid % tile_px
    return ix.astype(jnp.float32), iy.astype(jnp.float32)


# Edge slots per conditionally-executed chunk. Swept on the real chip
# (scripts/ab_shade.py, 30f/256^2/tile128/ke48, slope-timed fwd+bwd ms):
# chunk 8 -> 0.966, 16 -> 1.013, ke (no adaptivity) -> 1.376; full headline
# fit 0.706 s (chunk 8) vs 0.728 s (chunk 16). Skipped chunks are
# bit-identical no-ops on-chip (max|dsil| = rel|dgrad| = 0 in the sweep).
_EDGE_CHUNK = 8


def _shade_fwd_kernel(seg_ref, anchor_ref, sil_ref, *rest,
                      tile_px: int, image_size: int, g: int, sigma: float,
                      cap2: float, ke: int, want_residuals: bool = True):
    t = pl.program_id(1)
    gx = (t % g).astype(jnp.float32)
    gy = (t // g).astype(jnp.float32)
    ix, iy = _pixel_grids(tile_px)
    inv_s = 1.0 / image_size
    px = (gx * tile_px + ix + 0.5) * inv_s
    py = (gy * tile_px + iy + 0.5) * inv_s
    x1 = (gx + 1.0) * tile_px * inv_s

    if want_residuals:
        amin_ref, rx_ref, ry_ref, tc_ref = rest[:4]
        scratch = rest[4:]
    else:
        scratch = rest
    wind_scr, d2_scr = scratch[:2]

    seg = seg_ref[0, 0]  # (8, ke) resident block: one load, not 11*ke
    # Edge slots are a contiguous hit prefix (the binning selection packs
    # them first), so chunks of the unrolled edge loops run under pl.when
    # (n_e > chunk start): per-INSTANCE adaptive — a stage-B candidate tile
    # using 12 of the 48-slot budget runs 1 chunk, not 3. Skipped chunks
    # are bit-identical no-ops (invalid slots add 0.0 winding and sit 99
    # units away, losing every distance compare).
    n_e = jnp.sum(seg[5, :]).astype(jnp.int32)

    # Pass 1: winding (needs ALL edges before relevance can be decided).
    wind_scr[...] = anchor_ref[0, 0]
    for lo in range(0, ke, _EDGE_CHUNK):

        @pl.when(n_e > lo)
        def _wind_chunk(lo=lo):
            winding = wind_scr[...]
            for k in range(lo, min(lo + _EDGE_CHUNK, ke)):
                ax = seg[0, k]
                ay = seg[1, k]
                bx = seg[2, k]
                by = seg[3, k]
                sgn = seg[4, k]
                dy = by - ay
                dy_safe = jnp.where(jnp.abs(dy) > 1e-12, dy, 1.0)
                spans = (ay <= py) != (by <= py)
                tt = (py - ay) / dy_safe
                xi = ax + tt * (bx - ax)
                cross = spans & (xi > px) & (xi <= x1)
                winding = winding + jnp.where(cross, sgn, 0.0)
            wind_scr[...] = winding

    winding = wind_scr[...]
    covered = jnp.abs(winding) > 0.5

    # Pass 2: distance to the nearest SILHOUETTE-RELEVANT edge. For covered
    # pixels only edges across which the winding drops to 0 count (internal
    # contour edges — winding w <-> w±1 — must not dim interior coverage).
    # w_other = w - flip*sign(cross2d); flip (packed row 6) is the winding
    # jump across the directed edge. A pixel exactly on the edge line keeps
    # the edge (pre-fix behavior).
    # The winning edge's residual geometry (rx, ry, tc) is carried along and
    # written out: the backward pass then needs NO per-edge recomputation —
    # it becomes per-pixel elementwise math + a one-hot matmul (see
    # _shade_bwd_vjp).
    d2_scr[...] = jnp.full(pix_shape(tile_px), cap2, jnp.float32)
    if want_residuals:  # 4 extra carry scratches, only for grad callers
        am_scr, rx_scr, ry_scr, tc_scr = scratch[2:]
        am_scr[...] = jnp.full(pix_shape(tile_px), -1, jnp.int32)
        rx_scr[...] = jnp.zeros(pix_shape(tile_px), jnp.float32)
        ry_scr[...] = jnp.zeros(pix_shape(tile_px), jnp.float32)
        tc_scr[...] = jnp.zeros(pix_shape(tile_px), jnp.float32)
    for lo in range(0, ke, _EDGE_CHUNK):

        @pl.when(n_e > lo)
        def _dist_chunk(lo=lo):
            d2min = d2_scr[...]
            if want_residuals:
                amin = am_scr[...]
                rxm = rx_scr[...]
                rym = ry_scr[...]
                tcm = tc_scr[...]
            for k in range(lo, min(lo + _EDGE_CHUNK, ke)):
                ax = seg[0, k]
                ay = seg[1, k]
                bx = seg[2, k]
                by = seg[3, k]
                flipk = seg[6, k]
                ex = bx - ax
                ey = by - ay
                denom = jnp.maximum(ex * ex + ey * ey, 1e-12)
                tc = jnp.clip(((px - ax) * ex + (py - ay) * ey) / denom,
                              0.0, 1.0)
                dx = px - (ax + tc * ex)
                dyp = py - (ay + tc * ey)
                d2 = dx * dx + dyp * dyp

                cross2d = ex * (py - ay) - ey * (px - ax)
                w_other = winding - flipk * jnp.sign(cross2d)
                rel = (jnp.abs(w_other) < 0.5) | (cross2d == 0.0) | ~covered
                d2 = jnp.where(rel, d2, cap2)
                better = d2 < d2min
                d2min = jnp.where(better, d2, d2min)
                if want_residuals:
                    amin = jnp.where(better, k, amin)
                    rxm = jnp.where(better, dx, rxm)
                    rym = jnp.where(better, dyp, rym)
                    tcm = jnp.where(better, tc, tcm)
            d2_scr[...] = d2min
            if want_residuals:
                am_scr[...] = amin
                rx_scr[...] = rxm
                ry_scr[...] = rym
                tc_scr[...] = tcm

    d2min = d2_scr[...]
    signed = jnp.where(covered, d2min, -d2min)
    sil_ref[0, 0] = jax.nn.sigmoid(signed / sigma)
    if want_residuals:
        amin_ref[0, 0] = am_scr[...]
        rx_ref[0, 0] = rx_scr[...]
        ry_ref[0, 0] = ry_scr[...]
        tc_ref[0, 0] = tc_scr[...]


def _flatten_px(x, tile_px: int):
    """(B, T, tp, tp) -> the kernel's pixel layout (layout-only reshape)."""
    shape = pix_shape(tile_px)
    if shape == (tile_px, tile_px):
        return x
    return x.reshape(x.shape[:2] + shape)


def _unflatten_px(x, tile_px: int):
    if x.shape[2:] == (tile_px, tile_px):
        return x
    return x.reshape(x.shape[:2] + (tile_px, tile_px))


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def shade_tiles_pallas(seg_pack, anchors, static):
    """(B, T, tp, tp) soft silhouette tiles.

    Args:
      seg_pack: (B, T, 8, Ke) packed per-tile segment data (see module doc).
      anchors: (B, T, tp, tp) winding anchors.
      static: tuple (tile_px, image_size, g, sigma, cap2, ke) — hashable.
    """
    # Primal (no-grad) call: forward-only renders (evidence masks, the
    # stage-B full-res rescore, viz) skip the 4 residual carries + writes.
    return _shade_fwd(seg_pack, anchors, static, want_residuals=False)[0]


def _shade_fwd(seg_pack, anchors, static, want_residuals: bool = True):
    tile_px, image_size, g, sigma, cap2, ke = static
    B, T = seg_pack.shape[:2]
    ps = pix_shape(tile_px)
    kern = partial(_shade_fwd_kernel, tile_px=tile_px, image_size=image_size,
                   g=g, sigma=sigma, cap2=cap2, ke=ke,
                   want_residuals=want_residuals)
    px_spec = pl.BlockSpec((1, 1) + ps, lambda b, t: (b, t, 0, 0),
                           memory_space=pltpu.VMEM)
    n_out = 5 if want_residuals else 1
    out_shape = [jax.ShapeDtypeStruct((B, T) + ps, jnp.float32),
                 jax.ShapeDtypeStruct((B, T) + ps, jnp.int32),
                 jax.ShapeDtypeStruct((B, T) + ps, jnp.float32),
                 jax.ShapeDtypeStruct((B, T) + ps, jnp.float32),
                 jax.ShapeDtypeStruct((B, T) + ps, jnp.float32)][:n_out]
    scratch = [pltpu.VMEM(ps, jnp.float32), pltpu.VMEM(ps, jnp.float32)]
    if want_residuals:
        scratch += [pltpu.VMEM(ps, jnp.int32)] + [
            pltpu.VMEM(ps, jnp.float32)] * 3
    outs = pl.pallas_call(
        kern,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, 1, 8, ke), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            px_spec,
        ],
        out_specs=[px_spec] * n_out,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=_interpret(),
    )(seg_pack, _flatten_px(anchors, tile_px))
    sil = _unflatten_px(outs[0], tile_px)
    if not want_residuals:
        return (sil,)
    _, amin, rxs, rys, tcs = outs
    return sil, amin, rxs, rys, tcs


def _shade_fwd_vjp(seg_pack, anchors, static):
    sil, amin, rxs, rys, tcs = _shade_fwd(seg_pack, anchors, static)
    return sil, (sil, amin, rxs, rys, tcs)


def _shade_bwd_vjp(static, residuals, gcot):
    """Backward from forward-saved residuals — no per-edge recomputation.

    The forward stores each pixel's argmin edge id and its residual
    geometry (rx, ry, tc). The gradient to edge k's endpoints is then a
    masked sum over the pixels that selected k:

      d d2/d a = -2 r (1 - tc);   d d2/d b = -2 r tc   (envelope theorem
      through the clamped projection parameter, as before)

    expressed as one one-hot matmul per tile — (P, ke) selection matrix
    against (P, 4) per-pixel contributions — which XLA fuses and the MXU
    executes, replacing the old Pallas backward's ke x 4 full-tile
    reductions (the dominant backward cost).
    """
    tile_px, image_size, g, sigma, cap2, ke = static
    sil, amin, rxs, rys, tcs = residuals
    B, T = sil.shape[:2]
    sil_f = _flatten_px(sil, tile_px)
    gcot_f = _flatten_px(gcot, tile_px)

    covered = sil_f >= 0.5  # sign(winding) recovered from the forward
    base = gcot_f * sil_f * (1.0 - sil_f) / sigma
    base = jnp.where(covered, base, -base)
    wa = -2.0 * base * (1.0 - tcs)
    wb = -2.0 * base * tcs
    contrib = jnp.stack([wa * rxs, wa * rys, wb * rxs, wb * rys],
                        axis=-1)                        # (B, T, *ps, 4)
    contrib = contrib.reshape(B, T, -1, 4)
    onehot = (amin.reshape(B, T, -1, 1)
              == jnp.arange(ke, dtype=jnp.int32)).astype(jnp.float32)
    # HIGHEST: the TPU default lowers f32 matmuls to single-pass bf16,
    # which costs ~0.5% relative gradient error; the 3-pass form is exact
    # enough (~1e-6) and still negligible next to the forward.
    g4 = jnp.einsum("btpk,btpc->btck", onehot, contrib,
                    precision=jax.lax.Precision.HIGHEST)  # (B, T, 4, ke)
    gseg = jnp.concatenate(
        [g4, jnp.zeros((B, T, 4, ke), jnp.float32)], axis=2)
    return gseg, None


shade_tiles_pallas.defvjp(_shade_fwd_vjp, _shade_bwd_vjp)
