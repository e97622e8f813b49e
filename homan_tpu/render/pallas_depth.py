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


def _depth_fwd_kernel(pack_ref, depth_ref, amax_ref, *,
                      tile_px: int, image_size: int, g: int, kf: int):
    """One tile. Face-VECTORIZED: a scalar loop over all Kf candidates (the
    shade kernel's pattern) unrolls Kf x 13 scalar VMEM extracts — at the
    depth pass's Kf=256 that blows up the Mosaic compile. Instead, each
    unrolled step processes one 128-pixel ROW against ALL faces at once as
    (Kf, 128) vector ops, reducing with a cross-sublane max/argmax. Same
    flops, ~20x fewer program statements, dense (8, 128) vregs.
    """
    t = pl.program_id(1)
    gx = (t % g).astype(jnp.float32)
    gy = (t // g).astype(jnp.float32)
    inv_s = 1.0 / image_size

    pack = pack_ref[0, 0]  # (16, kf) resident block
    col = lambda i: pack[i, :][:, None]  # (kf, 1)
    a0, b0, c0 = col(0), col(1), col(2)
    a1, b1, c1 = col(3), col(4), col(5)
    a2, b2, c2 = col(6), col(7), col(8)
    az, bz, cz = col(9), col(10), col(11)
    valid = col(12) > 0.0

    P = tile_px * tile_px
    rows, n_rows = ((128, P // 128) if P % 128 == 0 else (tile_px, tile_px))
    kidx = jax.lax.broadcasted_iota(jnp.int32, (kf, rows), 0)
    depth_rows, amax_rows = [], []
    for r in range(n_rows):
        pid = jnp.arange(rows, dtype=jnp.int32) + r * rows
        ix = (pid % tile_px).astype(jnp.float32)[None, :]
        iy = (pid // tile_px).astype(jnp.float32)[None, :]
        px = (gx * tile_px + ix + 0.5) * inv_s  # (1, rows)
        py = (gy * tile_px + iy + 0.5) * inv_s
        e0 = a0 * px + b0 * py + c0  # (kf, rows)
        e1 = a1 * px + b1 * py + c1
        e2 = a2 * px + b2 * py + c2
        invz = az * px + bz * py + cz
        inside = (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0) & valid
        cand = jnp.where(inside, invz, 0.0)
        best = jnp.max(cand, axis=0, keepdims=True)  # (1, rows)
        # First-match argmax (ties resolve to the lowest face slot, like
        # jnp.argmax in the XLA path).
        amax = jnp.min(jnp.where(cand == best, kidx, kf),
                       axis=0, keepdims=True)
        depth_rows.append(
            jnp.where(best > 0.0, 1.0 / jnp.maximum(best, 1e-9), 0.0))
        amax_rows.append(jnp.where(best > 0.0, amax, -1))

    ps = pix_shape(tile_px)
    depth_ref[0, 0] = jnp.concatenate(depth_rows, axis=0).reshape(ps)
    amax_ref[0, 0] = jnp.concatenate(amax_rows, axis=0).reshape(ps)


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
        interpret=_interpret(),
    )(face_pack)
    if ps != (tile_px, tile_px):
        depth = depth.reshape(B, T, tile_px, tile_px)
        amax = amax.reshape(B, T, tile_px, tile_px)
    return depth, amax


def _depth_fwd_vjp(face_pack, static):
    depth, amax = _depth_fwd(face_pack, static)
    return depth, (depth, amax)


def _depth_bwd_vjp(static, residuals, gcot):
    tile_px, image_size, g, kf = static
    depth, amax = residuals
    B, T = depth.shape[:2]
    depth_f = _flatten_px(depth, tile_px).reshape(B, T, -1)
    gcot_f = _flatten_px(gcot, tile_px).reshape(B, T, -1)
    amax_f = _flatten_px(amax, tile_px).reshape(B, T, -1)

    # Per-tile pixel coordinates, same arithmetic as the kernel.
    P = depth_f.shape[-1]
    tvec = jnp.arange(T, dtype=jnp.float32)
    pid = jnp.arange(P, dtype=jnp.float32)
    inv_s = 1.0 / image_size
    px = ((tvec % g)[:, None] * tile_px + pid[None] % tile_px + 0.5) * inv_s
    py = ((tvec // g)[:, None] * tile_px + pid[None] // tile_px + 0.5) * inv_s

    coef = jnp.where(depth_f > 0.0, -gcot_f * depth_f * depth_f, 0.0)
    contrib = jnp.stack([coef * px[None], coef * py[None], coef], axis=-1)
    onehot = (amax_f[..., None]
              == jnp.arange(kf, dtype=jnp.int32)).astype(jnp.float32)
    # HIGHEST: see pallas_shade._shade_bwd_vjp — the TPU-default single-pass
    # bf16 matmul costs ~0.5% relative gradient error; 3-pass is ~exact.
    g3 = jnp.einsum("btpk,btpc->btck", onehot, contrib,
                    precision=jax.lax.Precision.HIGHEST)  # (B, T, 3, kf)
    zeros = jnp.zeros((B, T, 9, kf), jnp.float32)
    gpack = jnp.concatenate(
        [zeros, g3, jnp.zeros((B, T, 4, kf), jnp.float32)], axis=2)
    return (gpack,)


depth_tiles_pallas.defvjp(_depth_fwd_vjp, _depth_bwd_vjp)
