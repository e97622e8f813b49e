"""Pallas TPU kernel for hard z-buffer depth tiles (forward + custom VJP).

The ordinal-depth loss (reference homan/lossutils.py:133-169) consumes NMR's
z-buffer depth renders at FULL image size for the object and each hand every
iteration — by far the largest rasterization workload when `lw_depth > 0`.
The XLA formulation (rasterizer._face_depth) materializes (pixels x
face-candidates) intermediates in both passes of autodiff; this kernel keeps
the whole (tile_px^2 x Kf) computation in VMEM, and the backward becomes a
one-hot matmul from forward-saved argmax ids (the design proven out by
render/pallas_shade.py).

Key algebra: over a triangle, INVERSE depth is linear in screen space
(perspective-correct interpolation), so each candidate face is reduced in
XLA prep to seven numbers:

  inside(p)  <=>  e_i(p) = A_i px + B_i py + C_i >= 0   (i = 0, 1, 2;
                  coefficients sign-folded by the face's winding)
  invz(p)     =   Az px + Bz py + Cz

and the kernel's per-(pixel, face) work is 4 linear evaluations + compares:

  forward:  best(p)  = max_k invz_k(p) over inside faces   [+ argmax k*]
            depth(p) = 1 / best(p)  (0 where uncovered)

  backward: only the winning face k*(p) receives gradient;
            d depth / d (Az, Bz, Cz) = -depth^2 * (px, py, 1),
            accumulated per tile as a one-hot (P x Kf) matmul on the MXU.
            The hard inside test gets no gradient (envelope), exactly like
            a CUDA z-buffer's depth backward.

Gradients w.r.t. vertices flow through ordinary XLA autodiff of the prep
(coefficients are smooth functions of projected verts; binning gathers
transpose to scatter-adds).

Per-tile packed input (built in XLA):
  face_pack (B, T, 16, Kf): rows = [A0,B0,C0, A1,B1,C1, A2,B2,C2,
                                    Az,Bz,Cz, valid, 0,0,0]
Pixel buffers use the lane-dense flat layout of pallas_shade when
tile_px^2 % 128 == 0.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from homan_tpu.render.pallas_shade import _flatten_px, _interpret, pix_shape


_FACE_CHUNK = 64  # face slots per conditionally-executed chunk


def _depth_fwd_kernel(pack_ref, depth_ref, amax_ref, best_scr, am_scr, *,
                      tile_px: int, image_size: int, g: int, kf: int):
    """One tile. Face-VECTORIZED: a scalar loop over all Kf candidates (the
    shade kernel's pattern) unrolls Kf x 13 scalar VMEM extracts — at the
    depth pass's Kf=256 that blows up the Mosaic compile. Instead, each
    unrolled step processes one 128-pixel ROW against a CHUNK of faces as
    (chunk, 128) vector ops, reducing with a cross-sublane max/argmax.

    Chunks are conditionally executed: the binning top_k packs valid faces
    into a contiguous slot prefix, so chunk c runs only when
    n_hit > c * _FACE_CHUNK (pl.when). At full-image sizes most tiles bin
    ZERO faces (the entities cover a fraction of the frame) and most
    covered tiles use a fraction of the Kf=256 budget — measured 3.4x on
    the ordinal-depth bench workload (10f, 512^2, object + hand). Skipped
    chunks leave the running max untouched, so outputs are bit-identical.
    """
    t = pl.program_id(1)
    gx = (t % g).astype(jnp.float32)
    gy = (t // g).astype(jnp.float32)
    inv_s = 1.0 / image_size

    pack = pack_ref[0, 0]  # (16, kf) resident block
    n_hit = jnp.sum(pack[12, :]).astype(jnp.int32)

    P = tile_px * tile_px
    rows, n_rows = ((128, P // 128) if P % 128 == 0 else (tile_px, tile_px))
    best_scr[...] = jnp.zeros((n_rows, rows), jnp.float32)
    am_scr[...] = jnp.full((n_rows, rows), kf, jnp.int32)

    for lo in range(0, kf, _FACE_CHUNK):
        ch = min(_FACE_CHUNK, kf - lo)

        @pl.when(n_hit > lo)
        def _chunk(lo=lo, ch=ch):
            col = lambda i: pack[i, lo:lo + ch][:, None]  # (ch, 1)
            a0, b0, c0 = col(0), col(1), col(2)
            a1, b1, c1 = col(3), col(4), col(5)
            a2, b2, c2 = col(6), col(7), col(8)
            az, bz, cz = col(9), col(10), col(11)
            valid = col(12) > 0.0
            kidx = jax.lax.broadcasted_iota(jnp.int32, (ch, rows), 0)
            loc_best, loc_amax = [], []
            for r in range(n_rows):
                pid = jnp.arange(rows, dtype=jnp.int32) + r * rows
                ix = (pid % tile_px).astype(jnp.float32)[None, :]
                iy = (pid // tile_px).astype(jnp.float32)[None, :]
                px = (gx * tile_px + ix + 0.5) * inv_s  # (1, rows)
                py = (gy * tile_px + iy + 0.5) * inv_s
                e0 = a0 * px + b0 * py + c0  # (ch, rows)
                e1 = a1 * px + b1 * py + c1
                e2 = a2 * px + b2 * py + c2
                invz = az * px + bz * py + cz
                inside = (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0) & valid
                cand = jnp.where(inside, invz, 0.0)
                best = jnp.max(cand, axis=0, keepdims=True)  # (1, rows)
                # First-match argmax (ties resolve to the lowest face slot,
                # like jnp.argmax in the XLA path).
                loc_best.append(best)
                loc_amax.append(jnp.min(jnp.where(cand == best, kidx, kf),
                                        axis=0, keepdims=True))
            lb = jnp.concatenate(loc_best, axis=0)       # (n_rows, rows)
            la = jnp.concatenate(loc_amax, axis=0) + lo  # global slot ids
            prev = best_scr[...]
            # Strict >: equal invz across chunks keeps the earlier (lower)
            # slot, matching the single-pass first-match argmax.
            better = lb > prev
            best_scr[...] = jnp.where(better, lb, prev)
            am_scr[...] = jnp.where(better, la, am_scr[...])

    best = best_scr[...]
    covered = best > 0.0
    ps = pix_shape(tile_px)
    depth_ref[0, 0] = jnp.where(
        covered, 1.0 / jnp.maximum(best, 1e-9), 0.0).reshape(ps)
    amax_ref[0, 0] = jnp.where(covered, am_scr[...], -1).reshape(ps)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def depth_tiles_pallas(face_pack, static):
    """(B, T, tp, tp) hard z-buffer depth tiles (0 where uncovered).

    Args:
      face_pack: (B, T, 16, Kf) packed per-tile face data (see module doc).
      static: tuple (tile_px, image_size, g, kf) — hashable.
    """
    depth, _ = _depth_fwd(face_pack, static)
    return depth


def _depth_fwd(face_pack, static):
    tile_px, image_size, g, kf = static
    B, T = face_pack.shape[:2]
    ps = pix_shape(tile_px)
    kern = partial(_depth_fwd_kernel, tile_px=tile_px,
                   image_size=image_size, g=g, kf=kf)
    px_spec = pl.BlockSpec((1, 1) + ps, lambda b, t: (b, t, 0, 0),
                           memory_space=pltpu.VMEM)
    P = tile_px * tile_px
    scr_shape = (P // 128, 128) if P % 128 == 0 else (tile_px, tile_px)
    depth, amax = pl.pallas_call(
        kern,
        grid=(B, T),
        in_specs=[pl.BlockSpec((1, 1, 16, kf), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[px_spec] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((B, T) + ps, jnp.float32),
            jax.ShapeDtypeStruct((B, T) + ps, jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM(scr_shape, jnp.float32),
                        pltpu.VMEM(scr_shape, jnp.int32)],
        interpret=_interpret(),
    )(face_pack)
    if ps != (tile_px, tile_px):
        depth = depth.reshape(B, T, tile_px, tile_px)
        amax = amax.reshape(B, T, tile_px, tile_px)
    return depth, amax


def _depth_fwd_vjp(face_pack, static):
    depth, amax = _depth_fwd(face_pack, static)
    return depth, (depth, amax)


def _depth_bwd_kernel(depth_ref, amax_ref, gcot_ref, g_ref, *,
                      tile_px: int, image_size: int, g: int, kf: int):
    """Backward tile: gpack rows 9..11 (Az, Bz, Cz cotangents).

    Per winning face k: d depth/d (Az,Bz,Cz) = -depth^2 (px, py, 1). The
    XLA einsum formulation materializes a (P, Kf) one-hot per tile in HBM
    (~2.7 GB/iter at 512^2 x Kf=256 — measured 3.6 ms, bandwidth-bound);
    here the selection masks live in vregs and chunks of face slots are
    skipped via pl.when once past the tile's max winning slot (slot order
    is the binning prefix, so max(amax) bounds the occupied chunks).
    """
    from homan_tpu.render.pallas_shade import _pixel_grids

    t = pl.program_id(1)
    gx = (t % g).astype(jnp.float32)
    gy = (t // g).astype(jnp.float32)
    inv_s = 1.0 / image_size
    ix, iy = _pixel_grids(tile_px)
    px = (gx * tile_px + ix + 0.5) * inv_s
    py = (gy * tile_px + iy + 0.5) * inv_s

    depth = depth_ref[0, 0]
    amax = amax_ref[0, 0]
    coef = jnp.where(depth > 0.0, -gcot_ref[0, 0] * depth * depth, 0.0)
    cx = coef * px
    cy = coef * py
    g_ref[0, 0] = jnp.zeros((16, kf), jnp.float32)
    mx = jnp.max(amax)  # -1 on fully-uncovered tiles: every chunk skips
    for lo in range(0, kf, _FACE_CHUNK):
        ch = min(_FACE_CHUNK, kf - lo)

        @pl.when(mx >= lo)
        def _chunk(lo=lo, ch=ch):
            r0, r1, r2 = [], [], []
            for k in range(ch):
                m = (amax == lo + k).astype(jnp.float32)
                r0.append(jnp.sum(m * cx))
                r1.append(jnp.sum(m * cy))
                r2.append(jnp.sum(m * coef))
            g_ref[0, 0, 9:12, lo:lo + ch] = jnp.stack(
                [jnp.stack(r0), jnp.stack(r1), jnp.stack(r2)])


def _depth_bwd_vjp(static, residuals, gcot):
    tile_px, image_size, g, kf = static
    depth, amax = residuals
    B, T = depth.shape[:2]
    ps = pix_shape(tile_px)
    depth_f = _flatten_px(depth, tile_px).reshape((B, T) + ps)
    gcot_f = _flatten_px(gcot, tile_px).reshape((B, T) + ps)
    amax_f = _flatten_px(amax, tile_px).reshape((B, T) + ps)
    kern = partial(_depth_bwd_kernel, tile_px=tile_px,
                   image_size=image_size, g=g, kf=kf)
    px_spec = pl.BlockSpec((1, 1) + ps, lambda b, t: (b, t, 0, 0),
                           memory_space=pltpu.VMEM)
    gpack = pl.pallas_call(
        kern,
        grid=(B, T),
        in_specs=[px_spec] * 3,
        out_specs=pl.BlockSpec((1, 1, 16, kf), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, 16, kf), jnp.float32),
        interpret=_interpret(),
    )(depth_f, amax_f, gcot_f)
    return (gpack,)


depth_tiles_pallas.defvjp(_depth_fwd_vjp, _depth_bwd_vjp)
