#!/usr/bin/env python
"""A/B/C timing of the grid-voxelizer parity formulations on real TPU.

Queued in NOTES_ROUND4.md ("Grid-voxelizer perf ideas"): the per-column
ray-parity form (commit 4986c91) was reverted pending a TPU measurement.
Three kernels, all bit-identical outputs (asserted here):

  A  single-pass: parity edge functions on the full (PB, TF) point domain
     (the shipped kernel, homan_tpu/interactions/pallas_sdf.py).
  B  column-parity + z-loop: edge functions once per xy-column (CP, TF),
     then a g-trip fori_loop scattering per-z counts (commit 4986c91).
  C  column-parity + broadcast: edge functions + z_tri on (CP, TF), then
     one sublane-reshape broadcast back to (PB, TF) for the single-pass
     crossing compare — no sequential z trips, ~12 parity multiplies saved.

Usage: python scripts/ab_voxelizer.py [--frames 10] [--faces 2000] [--reps 50]
"""
from __future__ import annotations

import argparse
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from homan_tpu.interactions.pallas_sdf import (
    PB, TF, pack_triangles, voxelize_interior_sdf_pallas, _interpret)


def _common_distance(tri_ref, sl, px, py, pz, big):
    """Point-triangle distance^2 + xy edge functions for one face tile.

    Returns (d2 masked by validity, parity pieces) with px/py rows of any
    leading size (PB or CP)."""
    ax = tri_ref[0, 0, sl][None, :]
    ay = tri_ref[0, 1, sl][None, :]
    az = tri_ref[0, 2, sl][None, :]
    bx = tri_ref[0, 3, sl][None, :]
    by = tri_ref[0, 4, sl][None, :]
    bz = tri_ref[0, 5, sl][None, :]
    cx = tri_ref[0, 6, sl][None, :]
    cy = tri_ref[0, 7, sl][None, :]
    cz = tri_ref[0, 8, sl][None, :]
    valid = tri_ref[0, 9, sl][None, :]

    def seg_d2(sx, sy, sz, ex, ey, ez):
        dx, dy, dz = ex - sx, ey - sy, ez - sz
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
    ux, uy, uz = bx - ax, by - ay, bz - az
    vx, vy, vz = cx - ax, cy - ay, cz - az
    nx = uy * vz - uz * vy
    ny = uz * vx - ux * vz
    nz = ux * vy - uy * vx
    nn_raw = nx * nx + ny * ny + nz * nz
    inv_nn = 1.0 / jnp.maximum(nn_raw, 1e-18)
    dplane = (px - ax) * nx + (py - ay) * ny + (pz - az) * nz
    qx = px - dplane * (nx * inv_nn)
    qy = py - dplane * (ny * inv_nn)
    qz = pz - dplane * (nz * inv_nn)
    w0 = (((by - qy) * (cz - qz) - (bz - qz) * (cy - qy)) * nx
          + ((bz - qz) * (cx - qx) - (bx - qx) * (cz - qz)) * ny
          + ((bx - qx) * (cy - qy) - (by - qy) * (cx - qx)) * nz)
    w1 = (((cy - qy) * (az - qz) - (cz - qz) * (ay - qy)) * nx
          + ((cz - qz) * (ax - qx) - (cx - qx) * (az - qz)) * ny
          + ((cx - qx) * (ay - qy) - (cy - qy) * (ax - qx)) * nz)
    w2 = (((ay - qy) * (bz - qz) - (az - qz) * (by - qy)) * nx
          + ((az - qz) * (bx - qx) - (ax - qx) * (bz - qz)) * ny
          + ((ax - qx) * (by - qy) - (ay - qy) * (bx - qx)) * nz)
    inside_face = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & (nn_raw > 1e-18)
    plane_d2 = dplane * dplane * inv_nn
    d2 = jnp.where(inside_face, plane_d2, edge_d2)
    d2 = jnp.where(valid > 0.5, d2, big)
    return d2, (ax, ay, az, bx, by, bz, cx, cy, cz, valid)


def _parity_pieces(tri9, ppx, ppy):
    """xy edge functions on an arbitrary row domain; same float exprs as A."""
    ax, ay, az, bx, by, bz, cx, cy, cz, valid = tri9
    e0 = (bx - ax) * (ppy - ay) - (by - ay) * (ppx - ax)
    e1 = (cx - bx) * (ppy - by) - (cy - by) * (ppx - bx)
    e2 = (ax - cx) * (ppy - cy) - (ay - cy) * (ppx - cx)
    inside_xy = (((e0 >= 0) & (e1 >= 0) & (e2 >= 0))
                 | ((e0 <= 0) & (e1 <= 0) & (e2 <= 0)))
    area2 = e0 + e1 + e2
    nondegen = jnp.abs(area2) > 1e-12
    denom2 = jnp.where(nondegen, area2, 1.0)
    z_tri = (e1 * az + e2 * bz + e0 * cz) / denom2
    hit = inside_xy & nondegen & (valid > 0.5)
    return z_tri, hit


def _kernel_b(tri_ref, phi_ref, *, grid_size: int, n_tiles: int, big: float):
    """Variant B: column parity + per-z fori_loop scatter (4986c91)."""
    nb_idx = pl.program_id(1)
    g = grid_size
    lin = nb_idx * PB + jax.lax.broadcasted_iota(jnp.int32, (PB, 1), 0)
    ix = lin // (g * g)
    iy = (lin // g) % g
    iz = lin % g
    inv = 1.0 / g
    px = -1.0 + (2.0 * ix.astype(jnp.float32) + 1.0) * inv
    py = -1.0 + (2.0 * iy.astype(jnp.float32) + 1.0) * inv
    pz = -1.0 + (2.0 * iz.astype(jnp.float32) + 1.0) * inv
    CP = PB // g
    col = nb_idx * CP + jax.lax.broadcasted_iota(jnp.int32, (CP, 1), 0)
    cpx = -1.0 + (2.0 * (col // g).astype(jnp.float32) + 1.0) * inv
    cpy = -1.0 + (2.0 * (col % g).astype(jnp.float32) + 1.0) * inv
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (1, g), 1)

    def tile_body(t, carry):
        d2min, crossings = carry
        sl = pl.ds(t * TF, TF)
        d2, tri9 = _common_distance(tri_ref, sl, px, py, pz, big)
        d2min = jnp.minimum(d2min, jnp.min(d2, axis=1, keepdims=True))
        z_tri, hit = _parity_pieces(tri9, cpx, cpy)

        def z_body(k, cr):
            zk = -1.0 + (2.0 * k.astype(jnp.float32) + 1.0) * inv
            cross = hit & (z_tri > zk)
            cc = jnp.sum(cross.astype(jnp.float32), axis=1, keepdims=True)
            return cr + cc * (k_iota == k).astype(jnp.float32)

        crossings = jax.lax.fori_loop(0, g, z_body, crossings)
        return d2min, crossings

    d2min = jnp.full((PB, 1), big, jnp.float32)
    crossings = jnp.zeros((PB // g, g), jnp.float32)
    d2min, crossings = jax.lax.fori_loop(0, n_tiles, tile_body,
                                         (d2min, crossings))
    odd = (jnp.mod(crossings, 2.0) > 0.5).reshape(PB, 1)
    dist = jnp.sqrt(jnp.maximum(d2min, 1e-20))
    phi_ref[0] = jnp.where(odd, dist, 0.0).reshape(PB // 128, 128)


def _kernel_c(tri_ref, phi_ref, *, grid_size: int, n_tiles: int, big: float):
    """Variant C: column parity, broadcast (CP,TF)->(PB,TF), single pass."""
    nb_idx = pl.program_id(1)
    g = grid_size
    lin = nb_idx * PB + jax.lax.broadcasted_iota(jnp.int32, (PB, 1), 0)
    ix = lin // (g * g)
    iy = (lin // g) % g
    iz = lin % g
    inv = 1.0 / g
    px = -1.0 + (2.0 * ix.astype(jnp.float32) + 1.0) * inv
    py = -1.0 + (2.0 * iy.astype(jnp.float32) + 1.0) * inv
    pz = -1.0 + (2.0 * iz.astype(jnp.float32) + 1.0) * inv
    CP = PB // g
    col = nb_idx * CP + jax.lax.broadcasted_iota(jnp.int32, (CP, 1), 0)
    cpx = -1.0 + (2.0 * (col // g).astype(jnp.float32) + 1.0) * inv
    cpy = -1.0 + (2.0 * (col % g).astype(jnp.float32) + 1.0) * inv

    def tile_body(t, carry):
        d2min, crossings = carry
        sl = pl.ds(t * TF, TF)
        d2, tri9 = _common_distance(tri_ref, sl, px, py, pz, big)
        d2min = jnp.minimum(d2min, jnp.min(d2, axis=1, keepdims=True))
        z_tri, hit = _parity_pieces(tri9, cpx, cpy)
        # Broadcast column rows back to point rows: linear order is
        # (col, z) row-major, so repeating each column row g times along the
        # sublane axis reproduces the (PB, TF) layout exactly.
        z_pb = jnp.broadcast_to(z_tri[:, None, :], (CP, g, TF)).reshape(
            PB, TF)
        hit_pb = jnp.broadcast_to(hit[:, None, :], (CP, g, TF)).reshape(
            PB, TF)
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
    phi_ref[0] = jnp.where(odd, dist, 0.0).reshape(PB // 128, 128)


def _kernel_d(tri_ref, phi_ref, *, grid_size: int, n_tiles: int, big: float):
    """Variant D: column parity + Ericson dot-product distance.

    The point-triangle distance is rebuilt from six dot products with ALL
    divides hoisted to per-triangle (1, TF) reciprocals:
      * d3..d6 collapse to single subs from d1, d2 (d3 = d1 - |ab|^2,
        d4 = d2 - ab.ac, d5 = d1 - ab.ac, d6 = d2 - |ac|^2);
      * each clamped-edge distance is apap - (2 d - u) u / |e|^2 with the
        numerator clamp u = clip(d, 0, |e|^2) replacing the parameter clamp
        (|e|^2 > 0), so the divide becomes a hoisted reciprocal;
      * inside-face test uses the Ericson barycentric numerators va, vb, vc
        (sum = |n|^2, per-triangle), plane distance = (ap.n)^2 / |n|^2.
    ~74 full-tile ops vs ~161 for the A/C formulation, zero full-tile
    divides. Same math (min over clamped edges; plane iff projection
    inside), so values agree to float tolerance, not bit-exactly.
    """
    nb_idx = pl.program_id(1)
    g = grid_size
    lin = nb_idx * PB + jax.lax.broadcasted_iota(jnp.int32, (PB, 1), 0)
    ix = lin // (g * g)
    iy = (lin // g) % g
    iz = lin % g
    inv = 1.0 / g
    px = -1.0 + (2.0 * ix.astype(jnp.float32) + 1.0) * inv
    py = -1.0 + (2.0 * iy.astype(jnp.float32) + 1.0) * inv
    pz = -1.0 + (2.0 * iz.astype(jnp.float32) + 1.0) * inv
    CP = PB // g
    col = nb_idx * CP + jax.lax.broadcasted_iota(jnp.int32, (CP, 1), 0)
    cpx = -1.0 + (2.0 * (col // g).astype(jnp.float32) + 1.0) * inv
    cpy = -1.0 + (2.0 * (col % g).astype(jnp.float32) + 1.0) * inv

    def tile_body(t, carry):
        d2min, crossings = carry
        sl = pl.ds(t * TF, TF)
        ax = tri_ref[0, 0, sl][None, :]
        ay = tri_ref[0, 1, sl][None, :]
        az = tri_ref[0, 2, sl][None, :]
        bx = tri_ref[0, 3, sl][None, :]
        by = tri_ref[0, 4, sl][None, :]
        bz = tri_ref[0, 5, sl][None, :]
        cx = tri_ref[0, 6, sl][None, :]
        cy = tri_ref[0, 7, sl][None, :]
        cz = tri_ref[0, 8, sl][None, :]
        valid = tri_ref[0, 9, sl][None, :]

        # ---- per-triangle (1, TF) precomputation: amortized over PB ----
        abx, aby, abz = bx - ax, by - ay, bz - az
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
        nondegen = nn_raw > 1e-18

        # ---- (PB, TF) domain ----
        apx, apy, apz = px - ax, py - ay, pz - az
        d1 = abx * apx + aby * apy + abz * apz   # ab . ap
        d2 = acx * apx + acy * apy + acz * apz   # ac . ap
        apap = apx * apx + apy * apy + apz * apz
        d3 = d1 - abab   # ab . bp
        d4 = d2 - acab   # ac . bp
        d5 = d1 - acab   # ab . cp
        d6 = d2 - acac   # ac . cp
        va = d3 * d6 - d5 * d4
        vb = d5 * d2 - d1 * d6
        vc = d1 * d4 - d3 * d2
        twod1 = d1 + d1
        # edge AB: u = clip(d1, 0, abab); d2 = apap - (2 d1 - u) u / abab
        uab = jnp.minimum(jnp.maximum(d1, 0.0), abab)
        d2ab = apap - (twod1 - uab) * uab * inv_abab
        # edge AC
        uac = jnp.minimum(jnp.maximum(d2, 0.0), acac)
        d2ac = apap - (d2 + d2 - uac) * uac * inv_acac
        # edge BC: e = (c-b).bp = d4 - d3; |bp|^2 = apap - 2 d1 + abab
        e = d4 - d3
        ubc = jnp.minimum(jnp.maximum(e, 0.0), cbcb)
        bpbp = apap - twod1 + abab
        d2bc = bpbp - (e + e - ubc) * ubc * inv_cbcb
        edge_d2 = jnp.minimum(d2ab, jnp.minimum(d2ac, d2bc))
        inside = (va >= 0) & (vb >= 0) & (vc >= 0) & nondegen
        dpl = apx * nx + apy * ny + apz * nz
        plane_d2 = dpl * dpl * inv_nn
        d2 = jnp.where(inside, plane_d2, edge_d2)
        d2 = jnp.where(valid > 0.5, jnp.maximum(d2, 0.0), big)
        d2min = jnp.minimum(d2min, jnp.min(d2, axis=1, keepdims=True))

        # ---- parity: identical to the shipped column form ----
        z_tri, hit = _parity_pieces(
            (ax, ay, az, bx, by, bz, cx, cy, cz, valid), cpx, cpy)
        z_pb = jnp.broadcast_to(z_tri[:, None, :], (CP, g, TF)).reshape(
            PB, TF)
        hit_pb = jnp.broadcast_to(hit[:, None, :], (CP, g, TF)).reshape(
            PB, TF)
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
    phi_ref[0] = jnp.where(odd, dist, 0.0).reshape(PB // 128, 128)


def _run_variant(kern_fn, verts, faces, grid_size):
    g = grid_size
    # Same divisibility contract as the shipped kernel
    # (voxelize_interior_sdf_pallas:159): truncating nb or a misaligned
    # column stride would produce silently wrong output, not an error.
    assert (g ** 3) % PB == 0 and PB % g == 0, \
        f"grid {g}: g^3 must divide into {PB}-pixel blocks of whole columns"
    tri_pack = pack_triangles(jnp.asarray(verts, jnp.float32), faces)
    B = tri_pack.shape[0]
    n_tiles = tri_pack.shape[2] // TF
    nb = (g ** 3) // PB
    kern = partial(kern_fn, grid_size=g, n_tiles=n_tiles, big=1e9)
    phi = pl.pallas_call(
        kern,
        grid=(B, nb),
        in_specs=[pl.BlockSpec((1, 16, tri_pack.shape[2]),
                               lambda b, n: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, PB // 128, 128),
                               lambda b, n: (b, n, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, (g ** 3) // 128, 128),
                                       jnp.float32),
        interpret=_interpret(),
    )(tri_pack)
    return phi.reshape(B, g, g, g)


run_b = jax.jit(partial(_run_variant, _kernel_b), static_argnames="grid_size")
run_c = jax.jit(partial(_run_variant, _kernel_c), static_argnames="grid_size")
run_d = jax.jit(partial(_run_variant, _kernel_d), static_argnames="grid_size")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--faces", type=int, default=2000)
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--grid", type=int, default=32)
    args = ap.parse_args()

    from homan_tpu.core.meshes import bumpy_potato
    v, f = bumpy_potato(3, 0.08, seed=0)
    v, f = np.asarray(v), np.asarray(f)
    # jitter per frame; normalize into [-0.8, 0.8]
    rng = np.random.default_rng(0)
    verts = v[None] + 0.01 * rng.standard_normal((args.frames, *v.shape))
    verts = verts / np.abs(verts).max() * 0.8
    verts = jnp.asarray(verts, jnp.float32)
    faces = jnp.asarray(f[: args.faces])
    print(f"frames={verts.shape[0]} faces={faces.shape[0]} grid={args.grid}")

    variants = {
        "A_single_pass": lambda: voxelize_interior_sdf_pallas(
            verts, faces, args.grid),
        "B_column_zloop": lambda: run_b(verts, faces, grid_size=args.grid),
        "C_column_bcast": lambda: run_c(verts, faces, grid_size=args.grid),
        "D_ericson_dots": lambda: run_d(verts, faces, grid_size=args.grid),
    }
    ref = None
    ref_name = None
    for name, fn in variants.items():
        try:
            out = np.asarray(jax.block_until_ready(fn()))
        except Exception as e:  # Mosaic lowering may reject a variant
            print(f"{name}: FAILED {type(e).__name__}: {e}")
            continue
        if ref is None:
            ref, ref_name = out, name
        # Exactness is only meaningful against the variant that actually
        # became the baseline (A may have failed above).
        exact = (f"bit_exact_vs_{ref_name.split('_')[0]}="
                 f"{np.array_equal(out, ref)} "
                 f"maxdiff={np.abs(out - ref).max():.2e}")
        t0 = time.perf_counter()
        for _ in range(args.reps):
            r = fn()
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / args.reps
        print(f"{name}: {dt * 1e3:8.3f} ms/call  {exact}")


if __name__ == "__main__":
    main()
