#!/usr/bin/env python
"""Decompose the depth-render cost (ordinal-depth configs) on TPU.

The depth bench workload (10f x 100it) runs at ~21.6 ms/iter — 10x the
silhouette step. This script slope-times (see ab_shade.timed) the pieces:

  D0 depth prep only (project + line coeffs + face top_k + gather pack)
  D1 full rasterize_depth forward
  D2 full rasterize_depth fwd + backward (grad wrt verts)
  S1 for scale: silhouette rasterize_soft fwd+bwd on the same scene

Usage: PYTHONPATH=.:$AXON python scripts/ab_depth.py [--reps 3]
"""
from __future__ import annotations

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from homan_tpu.core.meshes import bumpy_potato
from homan_tpu.render import RasterSettings, rasterize_depth, rasterize_soft
from homan_tpu.render import rasterizer as R

SCAN_K1, SCAN_K2 = 25, 225


def timed(fn, arg, reps):
    def body(c, i):
        return c + 1e-9 * i, fn(arg, c)

    def wall(K):
        scan = jax.jit(lambda eps: jax.lax.scan(
            body, eps, jnp.arange(K, dtype=jnp.float32))[1])
        jax.block_until_ready(scan(jnp.float32(0)))
        best = float("inf")
        for i in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(scan(jnp.float32((i + 1) * 1e-7)))
            best = min(best, time.perf_counter() - t0)
        return best

    return (wall(SCAN_K2) - wall(SCAN_K1)) / (SCAN_K2 - SCAN_K1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--rend", type=int, default=256)
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    v, f = bumpy_potato(3, 0.08, seed=0)
    rng = np.random.default_rng(0)
    offs = 0.02 * rng.standard_normal((args.frames, 1, 3)).astype(np.float32)
    verts0 = jnp.asarray(np.asarray(v)[None]
                         + np.array([0, 0, 0.75], np.float32) + offs)
    topo = R.MeshTopology.from_faces(np.asarray(f))
    K = jnp.tile(jnp.asarray([[[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]],
                             jnp.float32), (args.frames, 1, 1))
    s = RasterSettings(image_size=args.rend, tile_px=args.tile,
                       edges_per_tile=48)
    print(f"frames={args.frames} S={args.rend} tile={args.tile} "
          f"kf={min(s.faces_per_tile, topo.faces.shape[0])} "
          f"F={topo.faces.shape[0]}")

    S, tp = s.image_size, s.tile_px
    g = S // tp
    kf = min(s.faces_per_tile, topo.faces.shape[0])

    def prep_only(vv):
        # mirror of _rasterize_depth_pallas's prep closure
        def one(v1, k1):
            uv, z = R.project_ndc(v1[None], k1[None])
            uv, z = uv[0], z[0]
            tri_uv = uv[topo.faces]
            tri_z = z[topo.faces]
            area = R._edge_fn(tri_uv[:, 0, :], tri_uv[:, 1, :],
                              tri_uv[:, 2, :])
            f_valid = (tri_z > s.znear).all(-1) & (jnp.abs(area) > 1e-12)
            f_idx, f_hit = R._bin_boxes(tri_uv.min(1), tri_uv.max(1),
                                        f_valid, s, kf, margin=0.5 / S)
            return (jnp.sum(tri_uv) + jnp.sum(f_idx)
                    + jnp.sum(f_hit) + jnp.sum(tri_z))

        return jnp.sum(jax.vmap(one)(vv, K))

    t = timed(jax.jit(lambda vv, eps: prep_only(vv + eps)), verts0,
              args.reps)
    print(f"D0_prep_topk     fwd {t*1e3:7.3f} ms")

    def depth_fwd(vv):
        return jnp.sum(rasterize_depth(vv, topo, K, s)["depth"])

    t = timed(jax.jit(lambda vv, eps: depth_fwd(vv + eps)), verts0,
              args.reps)
    print(f"D1_depth_fwd         {t*1e3:7.3f} ms")

    def depth_grad(vv, eps):
        val, grad = jax.value_and_grad(depth_fwd)(vv + eps)
        return val + jnp.sum(grad)

    t = timed(jax.jit(depth_grad), verts0, args.reps)
    print(f"D2_depth_fwd+bwd     {t*1e3:7.3f} ms")

    def sil_grad(vv, eps):
        val, grad = jax.value_and_grad(lambda q: jnp.sum(rasterize_soft(
            q, topo, K, s)["sil"]))(vv + eps)
        return val + jnp.sum(grad)

    t = timed(jax.jit(sil_grad), verts0, args.reps)
    print(f"S1_sil_fwd+bwd       {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
