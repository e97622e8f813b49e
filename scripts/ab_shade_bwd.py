#!/usr/bin/env python
"""A/B the shade BACKWARD formulations on TPU.

The shipped backward (_shade_bwd_vjp) is an XLA one-hot einsum whose (P, ke)
selection matrix is materialized in HBM per tile (~377 MB/iter at the
headline shape) — measured ~0.55 ms/iter, bandwidth-bound. Variants here
compute gseg inside a Pallas kernel so the one-hot (or its equivalent)
stays in VMEM:

  X_xla      shipped einsum backward (baseline)
  K_loop     Pallas: per-edge masked reductions (ke x 4 full-tile reduces)
  K_dot      Pallas: flatten pixels to (P, ke) one-hot + MXU dot
  K_dot3     Pallas: batched 3D dot over sublane-row groups

All produce gseg (B, T, 8, Ke); exactness is checked against X_xla.
Timing uses the slope method (see ab_shade.timed).

Usage: PYTHONPATH=.:$AXON python scripts/ab_shade_bwd.py [--reps 3]
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

from homan_tpu.core.meshes import bumpy_potato
from homan_tpu.render import RasterSettings
from homan_tpu.render import rasterizer
from homan_tpu.render.pallas_shade import (_interpret, _shade_fwd,
                                           _shade_bwd_vjp, pix_shape)

SCAN_K1, SCAN_K2 = 25, 225


def timed(fn, reps):
    def wall(K):
        def body(c, i):
            return c + 1e-9 * i, jnp.sum(fn(c))

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


# ---------------------------------------------------------------------------
# Pallas backward kernels. All take flat-layout residuals per tile and write
# g4 (1, 1, 8, ke). Shared elementwise prologue:
def _prologue(sil, gcot, tcs, rxs, rys, sigma):
    covered = sil >= 0.5
    base = gcot * sil * (1.0 - sil) / sigma
    base = jnp.where(covered, base, -base)
    wa = -2.0 * base * (1.0 - tcs)
    wb = -2.0 * base * tcs
    return wa * rxs, wa * rys, wb * rxs, wb * rys


def _bwd_kernel_loop(amin_ref, rx_ref, ry_ref, tc_ref, sil_ref, gcot_ref,
                     g_ref, *, sigma: float, ke: int):
    c0, c1, c2, c3 = _prologue(sil_ref[0, 0], gcot_ref[0, 0], tc_ref[0, 0],
                               rx_ref[0, 0], ry_ref[0, 0], sigma)
    amin = amin_ref[0, 0]
    rows = [[], [], [], []]
    for k in range(ke):
        m = (amin == k).astype(jnp.float32)
        rows[0].append(jnp.sum(m * c0))
        rows[1].append(jnp.sum(m * c1))
        rows[2].append(jnp.sum(m * c2))
        rows[3].append(jnp.sum(m * c3))
    g4 = jnp.stack([jnp.stack(r) for r in rows])  # (4, ke)
    g_ref[0, 0] = jnp.concatenate([g4, jnp.zeros((4, ke), jnp.float32)],
                                  axis=0)


def _bwd_kernel_dot(amin_ref, rx_ref, ry_ref, tc_ref, sil_ref, gcot_ref,
                    g_ref, *, sigma: float, ke: int):
    c0, c1, c2, c3 = _prologue(sil_ref[0, 0], gcot_ref[0, 0], tc_ref[0, 0],
                               rx_ref[0, 0], ry_ref[0, 0], sigma)
    P = c0.size
    contrib = jnp.stack([c0, c1, c2, c3], axis=-1).reshape(P, 4)
    amin = amin_ref[0, 0].reshape(P, 1)
    onehot = (amin == jax.lax.broadcasted_iota(jnp.int32, (P, ke), 1)
              ).astype(jnp.float32)
    g4 = jax.lax.dot_general(onehot, contrib, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (ke, 4)
    g_ref[0, 0] = jnp.concatenate(
        [g4.T, jnp.zeros((4, ke), jnp.float32)], axis=0)


def _bwd_kernel_dot3(amin_ref, rx_ref, ry_ref, tc_ref, sil_ref, gcot_ref,
                     g_ref, *, sigma: float, ke: int):
    c0, c1, c2, c3 = _prologue(sil_ref[0, 0], gcot_ref[0, 0], tc_ref[0, 0],
                               rx_ref[0, 0], ry_ref[0, 0], sigma)
    R = c0.shape[0]
    amin = amin_ref[0, 0]
    onehot = (amin[:, :, None] == jax.lax.broadcasted_iota(
        jnp.int32, (R, 128, ke), 2)).astype(jnp.float32)  # (R, 128, ke)
    contrib = jnp.stack([c0, c1, c2, c3], axis=1)  # (R, 4, 128)
    g4b = jax.lax.dot_general(
        contrib, onehot, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (R, 4, ke)
    g4 = jnp.sum(g4b, axis=0)
    g_ref[0, 0] = jnp.concatenate(
        [g4, jnp.zeros((4, ke), jnp.float32)], axis=0)


def make_pallas_bwd(kernel, static):
    tile_px, image_size, g, sigma, cap2, ke = static

    def bwd(residuals, gcot):
        sil, amin, rxs, rys, tcs = residuals
        B, T = sil.shape[:2]
        ps = pix_shape(tile_px)
        silf = sil.reshape(sil.shape[:2] + ps)
        gcotf = gcot.reshape(gcot.shape[:2] + ps)
        px_spec = pl.BlockSpec((1, 1) + ps, lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM)
        g_spec = pl.BlockSpec((1, 1, 8, ke), lambda b, t: (b, t, 0, 0),
                              memory_space=pltpu.VMEM)
        kern = partial(kernel, sigma=sigma, ke=ke)
        return pl.pallas_call(
            kern, grid=(B, T),
            in_specs=[px_spec] * 6,
            out_specs=g_spec,
            out_shape=jax.ShapeDtypeStruct((B, T, 8, ke), jnp.float32),
            interpret=_interpret())(amin, rxs, rys, tcs, silf, gcotf)

    return bwd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--rend", type=int, default=256)
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--ke", type=int, default=48)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    v, f = bumpy_potato(3, 0.08, seed=0)
    rng = np.random.default_rng(0)
    offs = 0.02 * rng.standard_normal((args.frames, 1, 3)).astype(np.float32)
    verts = jnp.asarray(np.asarray(v)[None]
                        + np.array([0, 0, 0.75], np.float32) + offs)
    topo = rasterizer.MeshTopology.from_faces(np.asarray(f))
    K = jnp.tile(jnp.asarray([[[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]],
                             jnp.float32), (args.frames, 1, 1))
    s = RasterSettings(image_size=args.rend, tile_px=args.tile,
                       edges_per_tile=args.ke)
    seg_pack, anchor_px, _, static = jax.jit(
        rasterizer._pallas_prep,
        static_argnames=("settings",))(verts, topo, K, settings=s)
    ke_eff = min(args.ke, topo.edges.shape[0])
    margin = s.bin_margin_px / args.rend
    static = (args.tile, args.rend, args.rend // args.tile, s.sigma,
              margin * margin, ke_eff)
    print(f"frames={args.frames} rend={args.rend} tile={args.tile} "
          f"ke={ke_eff}")

    # Fixed residuals + cotangent: the bwd is what we're timing.
    residuals = jax.jit(lambda sp, a: _shade_fwd(sp, a, static))(
        seg_pack, anchor_px)
    residuals = jax.block_until_ready(residuals)
    gcot = jnp.asarray(np.random.default_rng(1).standard_normal(
        residuals[0].shape).astype(np.float32))

    def xla_bwd(eps):
        res = (residuals[0] + eps * 0.0,) + residuals[1:]
        return _shade_bwd_vjp(static, res, gcot + eps)[0]

    ref = np.asarray(jax.block_until_ready(jax.jit(xla_bwd)(
        jnp.float32(0))))
    t = timed(xla_bwd, args.reps)
    print(f"{'X_xla':10s} {t * 1e3:7.3f} ms   (baseline)")

    for name, kern in [("K_loop", _bwd_kernel_loop),
                       ("K_dot", _bwd_kernel_dot),
                       ("K_dot3", _bwd_kernel_dot3)]:
        pb = make_pallas_bwd(kern, static)

        def f(eps, _pb=pb):
            res = (residuals[0] + eps * 0.0,) + tuple(
                residuals[1:])
            return _pb((res[0], res[1], res[2], res[3], res[4]),
                       gcot + eps)

        try:
            out = np.asarray(jax.block_until_ready(
                jax.jit(f)(jnp.float32(0))))
        except Exception as e:
            print(f"{name:10s} FAILED {type(e).__name__}: {str(e)[:160]}")
            continue
        d = float(np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-12))
        t = timed(f, args.reps)
        print(f"{name:10s} {t * 1e3:7.3f} ms   rel|dg|={d:.2e}")


if __name__ == "__main__":
    main()
