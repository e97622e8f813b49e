"""Pallas TPU kernel for mesh -> interior-SDF voxelization.

The XLA formulation (interactions/sdf.py) streams (grid-slab x faces)
intermediates through HBM (~500 ms per scene iteration at 10 frames x 3.5k
faces); this kernel keeps each (point-block x face-tile) distance block in
VMEM, looping face tiles sequentially per point block. Voxel grids carry no
gradient (the scene loss stop-gradients them), so the kernel is forward-only.

Layout:
  tri_pack (B, 16, Fpad): rows 0-8 = [ax ay az bx by bz cx cy cz] of each
    (normalized-space) triangle, row 9 = validity; Fpad multiple of 128.
  output phi (B, NB, PB): interior distance per grid point (0 outside),
    point blocks of PB linear grid indices.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PB = 1024  # grid points per block (stored as (8, 128) output tiles)
TF = 128   # faces per tile


def _interpret() -> bool:
    # Interpreter mode off-TPU (Mosaic lowering is cpu/gpu-unavailable).
    from homan_tpu.render.pallas_shade import is_tpu_backend
    return not is_tpu_backend()


def _voxelize_kernel(tri_ref, phi_ref, *, grid_size: int, n_tiles: int,
                     big: float):
    nb_idx = pl.program_id(1)
    g = grid_size
    lin = nb_idx * PB + jax.lax.broadcasted_iota(jnp.int32, (PB, 1), 0)
    # linear index -> (ix, iy, iz) -> cell-center coords in [-1, 1]
    ix = lin // (g * g)
    iy = (lin // g) % g
    iz = lin % g
    inv = 1.0 / g
    px = -1.0 + (2.0 * ix.astype(jnp.float32) + 1.0) * inv  # (PB, 1)
    py = -1.0 + (2.0 * iy.astype(jnp.float32) + 1.0) * inv
    pz = -1.0 + (2.0 * iz.astype(jnp.float32) + 1.0) * inv
    # xy-column rows for the ray parity (all z cells of a column share it):
    # PB points = CP whole columns, (col, z) row-major.
    CP = PB // g
    col = nb_idx * CP + jax.lax.broadcasted_iota(jnp.int32, (CP, 1), 0)
    cpx = -1.0 + (2.0 * (col // g).astype(jnp.float32) + 1.0) * inv
    cpy = -1.0 + (2.0 * (col % g).astype(jnp.float32) + 1.0) * inv

    def tile_body(t, carry):
        d2min, crossings = carry
        sl = pl.ds(t * TF, TF)
        ax = tri_ref[0, 0, sl][None, :]  # (1, TF)
        ay = tri_ref[0, 1, sl][None, :]
        az = tri_ref[0, 2, sl][None, :]
        bx = tri_ref[0, 3, sl][None, :]
        by = tri_ref[0, 4, sl][None, :]
        bz = tri_ref[0, 5, sl][None, :]
        cx = tri_ref[0, 6, sl][None, :]
        cy = tri_ref[0, 7, sl][None, :]
        cz = tri_ref[0, 8, sl][None, :]
        valid = tri_ref[0, 9, sl][None, :]

        # ---- point-triangle distance^2: Ericson dot-product form ----
        # (Real-Time Collision Detection 5.1.5, restructured for the VPU —
        # A/B'd on v5e as variant D in scripts/ab_voxelizer.py: 9.2 vs
        # 15.1 ms/call, 1.64x over the plane/edge-projection form, values
        # equal to ~1e-5.) Two structural wins:
        #   * every divide hoists to per-triangle (1, TF) reciprocals:
        #     the edge denominators |ab|^2, |ac|^2, |cb|^2 and the plane
        #     denominator |n|^2 do not depend on the point;
        #   * the six Ericson dots collapse to d1, d2 plus single subs
        #     (d3 = d1 - |ab|^2, d4 = d2 - ab.ac, d5 = d1 - ab.ac,
        #     d6 = d2 - |ac|^2), and each clamped-edge distance becomes
        #     apap - (2 d - u) u / |e|^2 with the clamp moved to the
        #     numerator u = clip(d, 0, |e|^2).
        # Same math as the XLA twin (min over clamped edge distances;
        # plane distance iff the projection's barycentrics va, vb, vc are
        # all >= 0) — the parity test now cross-checks two independent
        # formulations. ~74 full-tile ops vs ~161 before.
        abx, aby, abz = bx - ax, by - ay, bz - az    # (1, TF): amortized
        acx, acy, acz = cx - ax, cy - ay, cz - az
        abab = abx * abx + aby * aby + abz * abz
        acac = acx * acx + acy * acy + acz * acz
        acab = abx * acx + aby * acy + abz * acz
        cbcb = jnp.maximum(abab + acac - 2.0 * acab, 1e-12)  # |c-b|^2
        inv_abab = 1.0 / jnp.maximum(abab, 1e-12)
        inv_acac = 1.0 / jnp.maximum(acac, 1e-12)
        inv_cbcb = 1.0 / cbcb
        nx = aby * acz - abz * acy
        ny = abz * acx - abx * acz
        nz = abx * acy - aby * acx
        nn_raw = nx * nx + ny * ny + nz * nz
        inv_nn = 1.0 / jnp.maximum(nn_raw, 1e-18)
        # degenerate (zero-area) triangles, e.g. pad_mesh padding faces,
        # must take the edge branch: their plane distance is identically 0
        nondegen = nn_raw > 1e-18

        apx, apy, apz = px - ax, py - ay, pz - az    # (PB, TF) from here
        d1 = abx * apx + aby * apy + abz * apz       # ab . ap
        d2_ = acx * apx + acy * apy + acz * apz      # ac . ap
        apap = apx * apx + apy * apy + apz * apz
        d3 = d1 - abab                               # ab . bp
        d4 = d2_ - acab                              # ac . bp
        d5 = d1 - acab                               # ab . cp
        d6 = d2_ - acac                              # ac . cp
        va = d3 * d6 - d5 * d4                       # sum va+vb+vc = |n|^2
        vb = d5 * d2_ - d1 * d6
        vc = d1 * d4 - d3 * d2_
        twod1 = d1 + d1
        uab = jnp.minimum(jnp.maximum(d1, 0.0), abab)
        d2ab = apap - (twod1 - uab) * uab * inv_abab
        uac = jnp.minimum(jnp.maximum(d2_, 0.0), acac)
        d2ac = apap - (d2_ + d2_ - uac) * uac * inv_acac
        e = d4 - d3                                  # (c-b) . bp
        ubc = jnp.minimum(jnp.maximum(e, 0.0), cbcb)
        bpbp = apap - twod1 + abab
        d2bc = bpbp - (e + e - ubc) * ubc * inv_cbcb
        edge_d2 = jnp.minimum(d2ab, jnp.minimum(d2ac, d2bc))
        inside_face = (va >= 0) & (vb >= 0) & (vc >= 0) & nondegen
        dplane = apx * nx + apy * ny + apz * nz
        plane_d2 = dplane * dplane * inv_nn
        d2 = jnp.where(inside_face, plane_d2, edge_d2)
        d2 = jnp.where(valid > 0.5, jnp.maximum(d2, 0.0), big)
        d2min = jnp.minimum(d2min, jnp.min(d2, axis=1, keepdims=True))

        # ---- +z ray crossing parity (2D xy containment + z above) ----
        # Column-parity form (A/B'd on v5e, scripts/ab_voxelizer.py +
        # NOTES_ROUND5): the xy edge functions and z_tri are evaluated once
        # per xy-COLUMN on (CP, TF) rows — all z cells of a column share
        # them — then broadcast back to (PB, TF) with one sublane reshape
        # for the z compare. Bit-identical to the single-pass (PB, TF) form
        # (same float exprs, same order) at 0.86x its runtime (14.4 vs
        # 16.7 ms, 10 frames x 1280 faces, grid 32); the z-loop variant
        # (commit 4986c91) fails Mosaic lowering (i1 vector reshape) and
        # was discarded.
        e0 = (bx - ax) * (cpy - ay) - (by - ay) * (cpx - ax)
        e1 = (cx - bx) * (cpy - by) - (cy - by) * (cpx - bx)
        e2 = (ax - cx) * (cpy - cy) - (ay - cy) * (cpx - cx)
        inside_xy = (((e0 >= 0) & (e1 >= 0) & (e2 >= 0))
                     | ((e0 <= 0) & (e1 <= 0) & (e2 <= 0)))
        area2 = e0 + e1 + e2
        nondegen = jnp.abs(area2) > 1e-12
        denom2 = jnp.where(nondegen, area2, 1.0)
        z_tri = (e1 * az + e2 * bz + e0 * cz) / denom2
        hit = inside_xy & nondegen & (valid > 0.5)
        CP = PB // grid_size
        z_pb = jnp.broadcast_to(z_tri[:, None, :],
                                (CP, grid_size, TF)).reshape(PB, TF)
        hit_pb = jnp.broadcast_to(hit[:, None, :],
                                  (CP, grid_size, TF)).reshape(PB, TF)
        cross = hit_pb & (z_pb > pz)
        crossings = crossings + jnp.sum(cross.astype(jnp.float32), axis=1,
                                        keepdims=True)
        return d2min, crossings

    d2min = jnp.full((PB, 1), big, jnp.float32)
    crossings = jnp.zeros((PB, 1), jnp.float32)
    d2min, crossings = jax.lax.fori_loop(0, n_tiles, tile_body,
                                         (d2min, crossings))
    odd = jnp.mod(crossings, 2.0) > 0.5
    dist = jnp.sqrt(jnp.maximum(d2min, 1e-20))
    # (PB, 1) -> (8, 128) row-major: point p -> (p // 128, p % 128)
    phi_ref[0] = jnp.where(odd, dist, 0.0).reshape(PB // 128, 128)


def pack_triangles(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """(B, V, 3) + (F, 3) -> (B, 16, Fpad) packed rows (see module doc)."""
    B = verts.shape[0]
    F = faces.shape[0]
    fpad = ((F + TF - 1) // TF) * TF
    tri = verts[:, faces]  # (B, F, 3, 3)
    rows = tri.reshape(B, F, 9).transpose(0, 2, 1)  # (B, 9, F)
    valid = jnp.ones((B, 1, F), rows.dtype)
    pack = jnp.concatenate([rows, valid,
                            jnp.zeros((B, 6, F), rows.dtype)], axis=1)
    return jnp.pad(pack, ((0, 0), (0, 0), (0, fpad - F)))


@partial(jax.jit, static_argnames=("grid_size",))
def voxelize_interior_sdf_pallas(verts: jnp.ndarray, faces: jnp.ndarray,
                                 grid_size: int = 32) -> jnp.ndarray:
    """Drop-in for interactions.sdf.voxelize_interior_sdf (forward only)."""
    g = grid_size
    assert (g ** 3) % PB == 0, "grid^3 must divide the point-block size"
    assert PB % g == 0, "point blocks must hold whole xy-columns"
    tri_pack = pack_triangles(jnp.asarray(verts, jnp.float32), faces)
    B = tri_pack.shape[0]
    n_tiles = tri_pack.shape[2] // TF
    nb = (g ** 3) // PB
    rows_per_block = PB // 128
    kern = partial(_voxelize_kernel, grid_size=g, n_tiles=n_tiles, big=1e9)
    phi = pl.pallas_call(
        kern,
        grid=(B, nb),
        in_specs=[pl.BlockSpec((1, 16, tri_pack.shape[2]),
                               lambda b, n: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, rows_per_block, 128),
                               lambda b, n: (b, n, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, (g ** 3) // 128, 128),
                                       jnp.float32),
        interpret=_interpret(),
    )(tri_pack)
    return jax.lax.stop_gradient(phi.reshape(B, g, g, g))
