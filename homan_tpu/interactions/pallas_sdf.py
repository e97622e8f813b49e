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

        # ---- point-triangle distance^2 (plane vs closest edge) ----
        def seg_d2(sx, sy, sz, ex, ey, ez):
            dx, dy, dz = ex - sx, ey - sy, ez - sz
            # reciprocal on the (1, TF) face rows, multiply on the (PB, TF)
            # broadcast domain — avoids a full-tile divide
            inv_dd = 1.0 / jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-12)
            tt = ((px - sx) * dx + (py - sy) * dy + (pz - sz) * dz) * inv_dd
            tt = jnp.clip(tt, 0.0, 1.0)
            qx = px - (sx + tt * dx)
            qy = py - (sy + tt * dy)
            qz = pz - (sz + tt * dz)
            return qx * qx + qy * qy + qz * qz

        edge_d2 = jnp.minimum(
            seg_d2(ax, ay, az, bx, by, bz),
            jnp.minimum(seg_d2(bx, by, bz, cx, cy, cz),
                        seg_d2(cx, cy, cz, ax, ay, az)))

        # face normal
        ux, uy, uz = bx - ax, by - ay, bz - az
        vx, vy, vz = cx - ax, cy - ay, cz - az
        nx = uy * vz - uz * vy
        ny = uz * vx - ux * vz
        nz = ux * vy - uy * vx
        nn_raw = nx * nx + ny * ny + nz * nz
        inv_nn = 1.0 / jnp.maximum(nn_raw, 1e-18)  # (1, TF) row
        dplane = (px - ax) * nx + (py - ay) * ny + (pz - az) * nz
        # projection onto the plane (row-scaled normal, no full-tile divide)
        qx = px - dplane * (nx * inv_nn)
        qy = py - dplane * (ny * inv_nn)
        qz = pz - dplane * (nz * inv_nn)
        # barycentric test of projection (scaled by n)
        w0 = (((by - qy) * (cz - qz) - (bz - qz) * (cy - qy)) * nx
              + ((bz - qz) * (cx - qx) - (bx - qx) * (cz - qz)) * ny
              + ((bx - qx) * (cy - qy) - (by - qy) * (cx - qx)) * nz)
        w1 = (((cy - qy) * (az - qz) - (cz - qz) * (ay - qy)) * nx
              + ((cz - qz) * (ax - qx) - (cx - qx) * (az - qz)) * ny
              + ((cx - qx) * (ay - qy) - (cy - qy) * (ax - qx)) * nz)
        w2 = (((ay - qy) * (bz - qz) - (az - qz) * (by - qy)) * nx
              + ((az - qz) * (bx - qx) - (ax - qx) * (bz - qz)) * ny
              + ((ax - qx) * (by - qy) - (ay - qy) * (bx - qx)) * nz)
        # degenerate (zero-area) triangles, e.g. pad_mesh padding faces,
        # must take the edge branch: their plane distance is identically 0
        inside_face = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & (nn_raw > 1e-18)
        plane_d2 = dplane * dplane * inv_nn
        d2 = jnp.where(inside_face, plane_d2, edge_d2)
        d2 = jnp.where(valid > 0.5, d2, big)
        d2min = jnp.minimum(d2min, jnp.min(d2, axis=1, keepdims=True))

        # ---- +z ray crossing parity (2D xy containment + z above) ----
        # NOTE: a per-xy-column evaluation ((CP,TF) rows + a z-plane loop,
        # commit 4986c91) is bit-identical but pays g sequential loop trips
        # per tile — likely a net loss on TPU (pending A/B); this is the
        # single-pass (PB,TF) form.
        e0 = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
        e1 = (cx - bx) * (py - by) - (cy - by) * (px - bx)
        e2 = (ax - cx) * (py - cy) - (ay - cy) * (px - cx)
        inside_xy = (((e0 >= 0) & (e1 >= 0) & (e2 >= 0))
                     | ((e0 <= 0) & (e1 <= 0) & (e2 <= 0)))
        area2 = e0 + e1 + e2
        nondegen = jnp.abs(area2) > 1e-12
        denom2 = jnp.where(nondegen, area2, 1.0)
        z_tri = (e1 * az + e2 * bz + e0 * cz) / denom2
        cross = inside_xy & nondegen & (z_tri > pz) & (valid > 0.5)
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
