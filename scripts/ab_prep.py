#!/usr/bin/env python
"""Decompose the Pallas-shade PREP cost (rasterizer._pallas_prep) on TPU.

ab_shade.py found prep (project + contour + anchors + binning + pack) costs
~1.2 ms fwd / ~1.7 ms fwd+bwd at the headline shape — on par with the shade
kernel itself. This script times cumulative prefixes of the prep pipeline
with the same scanned-dispatch harness (50 calls per dispatch; the axon
relay round-trip otherwise dominates) to locate the expensive stage:

  P0 project_ndc only
  P1 + _contour_data
  P2 + anchor rows (the (S,E) span/intersection grid + g-column einsum)
  P3 + _bin_boxes (tile overlap + top_k)
  P4 + gather/pack (= full _pallas_prep)

Usage: PYTHONPATH=.:$AXON python scripts/ab_prep.py [--frames 30] [--reps 5]
"""
from __future__ import annotations

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from homan_tpu.core.meshes import bumpy_potato
from homan_tpu.render.rasterizer import project_ndc
from homan_tpu.render import RasterSettings
from homan_tpu.render import rasterizer as R

SCAN_K1, SCAN_K2 = 25, 225  # slope timing cancels the ~25 ms dispatch
# constant (a relay round-trip costs the same regardless of device work —
# see ab_shade.timed)


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
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--rend", type=int, default=256)
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--ke", type=int, default=48)
    ap.add_argument("--reps", type=int, default=5)
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
                       edges_per_tile=args.ke)
    S, tp = s.image_size, s.tile_px
    g = S // tp
    ke = min(s.edges_per_tile, topo.edges.shape[0])
    margin = s.bin_margin_px / S
    ys_all = (jnp.arange(S) + 0.5) / S
    E = topo.edges.shape[0]
    print(f"frames={args.frames} S={S} tile={tp} ke={ke} "
          f"E={E} F={topo.faces.shape[0]}")

    def stage(v_all, upto):
        def per_frame(vv, kk):
            uv, z = project_ndc(vv[None], kk[None])
            uv, z = uv[0], z[0]
            if upto == 0:
                return jnp.sum(uv) + jnp.sum(z)
            p0, p1, cross_sign, is_contour, flip, _, _, _ = R._contour_data(
                uv, z, topo, s)
            if upto == 1:
                return (jnp.sum(p0) + jnp.sum(p1) + jnp.sum(cross_sign)
                        + jnp.sum(flip))
            x_right = (jnp.arange(g, dtype=jnp.float32) + 1.0) * tp / S
            y0 = p0[:, 1][None, :]
            y1 = p1[:, 1][None, :]
            py = ys_all[:, None]
            spans = (y0 <= py) != (y1 <= py)
            t = (py - y0) / jnp.where(jnp.abs(y1 - y0) > 1e-12, y1 - y0, 1.0)
            x_int = p0[:, 0][None, :] + t * (p1[:, 0] - p0[:, 0])[None, :]
            contrib = jnp.where(spans, cross_sign[None, :], 0.0)
            anchors = jnp.einsum(
                "se,gse->gs", contrib,
                (x_int[None] > x_right[:, None, None]).astype(jnp.float32))
            if upto == 2:
                return jnp.sum(anchors)
            seg = uv[topo.edges]
            e_idx, e_hit, e_demand = R._bin_boxes(
                seg.min(1), seg.max(1), is_contour, s, ke, margin=margin,
                with_demand=True)
            if upto == 3:
                return (jnp.sum(e_idx.astype(jnp.float32))
                        + jnp.sum(e_hit) + jnp.sum(anchors))
            if upto == 5:  # the SHIPPED prep, whatever it currently is
                sp, ap, _, _ = R._pallas_prep(vv[None], topo, kk[None], s)
                return jnp.sum(sp[0, :, :4]) + jnp.sum(ap)
            hitf = e_hit.astype(jnp.float32)
            s0 = jnp.where(e_hit[..., None], p0[e_idx], 99.0)
            s1 = jnp.where(e_hit[..., None], p1[e_idx], 99.0)
            sgn = cross_sign[e_idx] * hitf
            flip_pack = flip[e_idx] * is_contour[e_idx] * hitf
            seg_pack = jnp.stack(
                [s0[..., 0], s0[..., 1], s1[..., 0], s1[..., 1], sgn, hitf,
                 flip_pack, jnp.zeros_like(sgn)], axis=-2)
            tile_gx = jnp.arange(g * g) % g
            rows = (jnp.arange(g * g) // g)[:, None] * tp + jnp.arange(
                tp)[None]
            anchor_rows = anchors[tile_gx[:, None], rows]
            anchor_px = jnp.broadcast_to(anchor_rows[:, :, None],
                                         (g * g, tp, tp))
            return jnp.sum(seg_pack[:, :4]) + jnp.sum(anchor_px)

        return jnp.sum(jax.vmap(per_frame)(v_all, K))

    names = ["P0_project", "P1_+contour", "P2_+anchors", "P3_+topk",
             "P4_+oldpack", "P5_shipped_full"]
    prev_f = prev_g = 0.0
    for upto, name in enumerate(names):
        f_fn = jax.jit(lambda vv, eps, _u=upto: stage(vv + eps, _u))
        def g_fn(vv, eps, _u=upto):
            val, grad = jax.value_and_grad(lambda q: stage(q, _u))(vv + eps)
            return val + jnp.sum(grad)  # consume grad or XLA DCEs the bwd

        g_fn = jax.jit(g_fn)
        t_f = timed(f_fn, verts0, args.reps)
        t_g = timed(g_fn, verts0, args.reps)
        print(f"{name:16s} fwd {t_f*1e3:7.3f} ms (+{(t_f-prev_f)*1e3:6.3f})"
              f"   fwd+bwd {t_g*1e3:7.3f} ms (+{(t_g-prev_g)*1e3:6.3f})")
        prev_f, prev_g = t_f, t_g


if __name__ == "__main__":
    main()
