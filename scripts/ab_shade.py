#!/usr/bin/env python
"""A/B timing of shade-kernel formulations on the real TPU.

The r04 roofline trace attributes the whole fit while-loop to one xplane op,
so the shade kernel's true share of the ~3.2 ms/iter headline step is unknown
(BENCH_r04 extra.roofline charges the entire program to the kernel -> its
"21% of VPU peak" is a LOWER bound). This script measures the kernel
standalone on exactly the inputs the headline fit produces
(rasterizer._pallas_prep on a 30-frame potato scene, 256^2, tile128, ke=48)
and times formulation variants:

  A  shipped kernel (render/pallas_shade.py)
  B  + per-edge scalar reciprocals (inv_dy, inv_denom): the two full-tile
     divides become multiplies (same trick as the voxelizer Ericson rework)
  C  = B + Ericson dot-product distance (d2 = apap - (2 d1 - u) u * inv_dd,
     clamp moved to the numerator) + apx/apy reuse between the distance and
     the cross2d relevance test
  D  = C + deferred residual geometry: the forward stores only (amin, tc);
     the backward reconstructs rx/ry from seg_pack via a second one-hot MXU
     matmul, so the per-edge rx/ry selects drop out of the forward
  E  = D with pixel-row sub-blocking (grid (B, T, R)): bounds the live vreg
     set per instance to probe whether tile128's 16-vreg-per-array carries
     spill to VMEM between unrolled edge iterations

Every timing loop perturbs the input per call and blocks per call (the axon
relay can report ~0 ms for repeated executions on identical values —
NOTES_ROUND5 "relay measurement trap").

Usage: python scripts/ab_shade.py [--frames 30] [--reps 30] [--ke 48]
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
from homan_tpu.render.pallas_shade import (_interpret, _pixel_grids,
                                           pix_shape, shade_tiles_pallas)
from homan_tpu import utils_profiling as up

HI = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Parametrized forward kernel (covers variants B..E; A is the shipped module)
# ---------------------------------------------------------------------------
def _fwd_kernel(seg_ref, anchor_ref, *out_refs, tile_px: int, image_size: int,
                g: int, sigma: float, cap2: float, ke: int, ericson: bool,
                defer: bool, rchunk, want_residuals: bool):
    t = pl.program_id(1)
    gx = (t % g).astype(jnp.float32)
    gy = (t // g).astype(jnp.float32)
    if rchunk is None:
        ix, iy = _pixel_grids(tile_px)
        shape = pix_shape(tile_px)
    else:
        r = pl.program_id(2)
        shape = (rchunk, 128)
        pid = ((r * rchunk + jax.lax.broadcasted_iota(jnp.int32, shape, 0))
               * 128 + jax.lax.broadcasted_iota(jnp.int32, shape, 1))
        iy = (pid // tile_px).astype(jnp.float32)
        ix = (pid % tile_px).astype(jnp.float32)
    inv_s = 1.0 / image_size
    px = (gx * tile_px + ix + 0.5) * inv_s
    py = (gy * tile_px + iy + 0.5) * inv_s
    x1 = (gx + 1.0) * tile_px * inv_s

    seg = seg_ref[0, 0]
    winding = anchor_ref[0, 0]
    for k in range(ke):
        ax = seg[0, k]
        ay = seg[1, k]
        bx = seg[2, k]
        by = seg[3, k]
        sgn = seg[4, k]
        dy = by - ay
        inv_dy = 1.0 / jnp.where(jnp.abs(dy) > 1e-12, dy, 1.0)
        spans = (ay <= py) != (by <= py)
        tt = (py - ay) * inv_dy
        xi = ax + tt * (bx - ax)
        cross = spans & (xi > px) & (xi <= x1)
        winding = winding + jnp.where(cross, sgn, 0.0)
    covered = jnp.abs(winding) > 0.5
    notcov = ~covered

    d2min = jnp.full(shape, cap2, jnp.float32)
    amin = jnp.full(shape, -1, jnp.int32)
    tcm = jnp.zeros(shape, jnp.float32)
    if want_residuals and not defer:
        rxm = jnp.zeros(shape, jnp.float32)
        rym = jnp.zeros(shape, jnp.float32)
    for k in range(ke):
        ax = seg[0, k]
        ay = seg[1, k]
        bx = seg[2, k]
        by = seg[3, k]
        flipk = seg[6, k]
        ex = bx - ax
        ey = by - ay
        denom = jnp.maximum(ex * ex + ey * ey, 1e-12)
        inv_denom = 1.0 / denom
        apx = px - ax
        apy = py - ay
        d1 = apx * ex + apy * ey
        cross2d = ex * apy - ey * apx
        if ericson:
            u = jnp.clip(d1, 0.0, denom)
            apap = apx * apx + apy * apy
            d2 = apap - (d1 + d1 - u) * u * inv_denom
            tc = u * inv_denom
            dx = dyp = None
        else:
            tc = jnp.clip(d1 * inv_denom, 0.0, 1.0)
            dx = apx - tc * ex
            dyp = apy - tc * ey
            d2 = dx * dx + dyp * dyp
        w_other = winding - flipk * jnp.sign(cross2d)
        rel = (jnp.abs(w_other) < 0.5) | (cross2d == 0.0) | notcov
        d2 = jnp.where(rel, d2, cap2)
        better = d2 < d2min
        d2min = jnp.where(better, d2, d2min)
        if want_residuals:
            amin = jnp.where(better, k, amin)
            tcm = jnp.where(better, tc, tcm)
            if not defer:
                if dx is None:
                    dx = apx - tc * ex
                    dyp = apy - tc * ey
                rxm = jnp.where(better, dx, rxm)
                rym = jnp.where(better, dyp, rym)

    signed = jnp.where(covered, d2min, -d2min)
    out_refs[0][0, 0] = jax.nn.sigmoid(signed / sigma)
    if want_residuals:
        if defer:
            out_refs[1][0, 0] = amin
            out_refs[2][0, 0] = tcm
        else:
            out_refs[1][0, 0] = amin
            out_refs[2][0, 0] = rxm
            out_refs[3][0, 0] = rym
            out_refs[4][0, 0] = tcm


def _call_fwd(seg_pack, anchors_flat, static, *, ericson, defer, rchunk,
              want_residuals):
    tile_px, image_size, g, sigma, cap2, ke = static
    B, T = seg_pack.shape[:2]
    ps = pix_shape(tile_px)
    kern = partial(_fwd_kernel, tile_px=tile_px, image_size=image_size, g=g,
                   sigma=sigma, cap2=cap2, ke=ke, ericson=ericson,
                   defer=defer, rchunk=rchunk, want_residuals=want_residuals)
    if rchunk is None:
        grid = (B, T)
        px_spec = pl.BlockSpec((1, 1) + ps, lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM)
        seg_spec = pl.BlockSpec((1, 1, 8, ke), lambda b, t: (b, t, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        assert ps[1] == 128 and ps[0] % rchunk == 0
        grid = (B, T, ps[0] // rchunk)
        px_spec = pl.BlockSpec((1, 1, rchunk, 128),
                               lambda b, t, r: (b, t, r, 0),
                               memory_space=pltpu.VMEM)
        seg_spec = pl.BlockSpec((1, 1, 8, ke), lambda b, t, r: (b, t, 0, 0),
                                memory_space=pltpu.VMEM)
    n_out = (3 if defer else 5) if want_residuals else 1
    dtypes = [jnp.float32, jnp.int32, jnp.float32, jnp.float32, jnp.float32]
    out_shape = [jax.ShapeDtypeStruct((B, T) + ps, dt)
                 for dt in dtypes[:n_out]]
    return pl.pallas_call(
        kern, grid=grid, in_specs=[seg_spec, px_spec],
        out_specs=[px_spec] * n_out, out_shape=out_shape,
        interpret=_interpret())(seg_pack, anchors_flat)


def _pixel_centers_flat(static):
    """(T,)+ps pixel-center coordinates in the kernel's flat layout."""
    tile_px, S, g, _, _, _ = static
    ps = pix_shape(tile_px)
    if ps == (tile_px, tile_px):
        iy = jnp.arange(tile_px, dtype=jnp.float32)[:, None] * jnp.ones(
            (1, tile_px), jnp.float32)
        ix = jnp.ones((tile_px, 1), jnp.float32) * jnp.arange(
            tile_px, dtype=jnp.float32)[None]
    else:
        pid = jnp.arange(ps[0])[:, None] * 128 + jnp.arange(128)[None]
        iy = (pid // tile_px).astype(jnp.float32)
        ix = (pid % tile_px).astype(jnp.float32)
    T = g * g
    gx = (jnp.arange(T, dtype=jnp.float32) % g)[:, None, None]
    gy = (jnp.arange(T, dtype=jnp.float32) // g)[:, None, None]
    inv_s = 1.0 / S
    px = (gx * tile_px + ix[None] + 0.5) * inv_s
    py = (gy * tile_px + iy[None] + 0.5) * inv_s
    return px, py


def make_shade(name, *, ericson, defer, rchunk):
    """custom-vjp shade fn matching shade_tiles_pallas's contract but on the
    FLAT pixel layout (timing-only; no unflatten reshapes)."""

    @partial(jax.custom_vjp, nondiff_argnums=(2,))
    def shade(seg_pack, anchors_flat, static):
        return _call_fwd(seg_pack, anchors_flat, static, ericson=ericson,
                         defer=defer, rchunk=rchunk, want_residuals=False)[0]

    def fwd(seg_pack, anchors_flat, static):
        outs = _call_fwd(seg_pack, anchors_flat, static, ericson=ericson,
                         defer=defer, rchunk=rchunk, want_residuals=True)
        if defer:
            sil, amin, tcs = outs
            return sil, (seg_pack, sil, amin, tcs)
        sil, amin, rxs, rys, tcs = outs
        return sil, (sil, amin, rxs, rys, tcs)

    def bwd(static, res, gcot):
        tile_px, S, g, sigma, cap2, ke = static
        if defer:
            seg_pack, sil, amin, tcs = res
        else:
            sil, amin, rxs, rys, tcs = res
        B, T = sil.shape[:2]
        ps = sil.shape[2:]
        P = int(np.prod(ps))
        covered = sil >= 0.5
        base = gcot * sil * (1.0 - sil) / sigma
        base = jnp.where(covered, base, -base)
        wa = (-2.0 * base * (1.0 - tcs)).reshape(B, T, P)
        wb = (-2.0 * base * tcs).reshape(B, T, P)
        onehot = (amin.reshape(B, T, P, 1)
                  == jnp.arange(ke, dtype=jnp.int32)).astype(jnp.float32)
        if defer:
            pxc, pyc = _pixel_centers_flat(static)
            pxf = jnp.broadcast_to(pxc[None], (B, T) + ps).reshape(B, T, P)
            pyf = jnp.broadcast_to(pyc[None], (B, T) + ps).reshape(B, T, P)
            segf = seg_pack[:, :, :4, :]  # ax, ay, bx, by rows
            pe = jnp.einsum("btpk,btrk->btpr", onehot, segf,
                            precision=HI)  # (B,T,P,4)
            axp, ayp = pe[..., 0], pe[..., 1]
            exp_ = pe[..., 2] - axp
            eyp = pe[..., 3] - ayp
            tcf = tcs.reshape(B, T, P)
            rx = pxf - (axp + tcf * exp_)
            ry = pyf - (ayp + tcf * eyp)
        else:
            rx = rxs.reshape(B, T, P)
            ry = rys.reshape(B, T, P)
        contrib = jnp.stack([wa * rx, wa * ry, wb * rx, wb * ry], axis=-1)
        g4 = jnp.einsum("btpk,btpc->btck", onehot, contrib, precision=HI)
        gseg = jnp.concatenate(
            [g4, jnp.zeros((B, T, 4, ke), jnp.float32)], axis=2)
        return gseg, None

    shade.defvjp(fwd, bwd)
    shade.__name__ = name
    return shade


# ---------------------------------------------------------------------------
# Harness
# ---------------------------------------------------------------------------
def build_inputs(frames: int, rend: int, tile: int, ke: int):
    v, f = bumpy_potato(3, 0.08, seed=0)
    v = np.asarray(v)
    rng = np.random.default_rng(0)
    offs = 0.02 * rng.standard_normal((frames, 1, 3)).astype(np.float32)
    verts = jnp.asarray(v[None] + np.array([0, 0, 0.75], np.float32) + offs)
    topo = rasterizer.MeshTopology.from_faces(np.asarray(f))
    K = jnp.tile(jnp.asarray([[[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]],
                             jnp.float32), (frames, 1, 1))
    settings = RasterSettings(image_size=rend, tile_px=tile,
                              edges_per_tile=ke)
    seg_pack, anchor_px, e_demand, _ = jax.jit(
        rasterizer._pallas_prep,
        static_argnames=("settings",))(verts, topo, K, settings=settings)
    # static must be host python scalars (custom_vjp nondiff + BlockSpec
    # shapes); the jitted prep returns them as device arrays.
    ke_eff = min(ke, topo.edges.shape[0])
    margin = settings.bin_margin_px / rend
    static = (tile, rend, rend // tile, settings.sigma, margin * margin,
              ke_eff)
    tile_px = static[0]
    ps = pix_shape(tile_px)
    anchors_flat = anchor_px.reshape(anchor_px.shape[:2] + ps)
    return (jax.block_until_ready(seg_pack), anchors_flat, static,
            int(jnp.max(e_demand)))


SCAN_K1, SCAN_K2 = 25, 225  # slope timing: per-step = (t_K2 - t_K1)/200


def timed(fn, seg_pack, reps):
    """ms per kernel call: slope of wall time vs scanned call count.

    A single dispatch through the axon relay costs ~25 ms REGARDLESS of
    device work (measured 2026-08-19: a 50-step scan of a 58k-element sum
    and a 200-step one both total ~26 ms), so per-call = total/K is wrong
    for cheap kernels. Timing the same scan at two lengths and taking the
    slope cancels the dispatch constant. Each scan step perturbs the input
    (carry-dependent) so the device cannot skip repeated executions on
    identical values.
    """

    def body(c, i):
        out = fn(seg_pack, c)
        if isinstance(out, tuple):  # (value, grad): consume BOTH or XLA
            y = out[0] + jnp.sum(out[1])  # dead-code-eliminates the backward
        else:
            y = jnp.sum(out)
        return c + 1e-9 * i, y

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
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()

    seg_pack, anchors_flat, static, demand = build_inputs(
        args.frames, args.rend, args.tile, args.ke)
    tile_px, S, g, sigma, cap2, ke = static

    # How much of the fit step is the non-kernel prep (project + contour +
    # bin + top-k)? Time it with the same scanned harness, fwd and fwd+bwd
    # through a sum-of-seg_pack surrogate loss.
    v, f = bumpy_potato(3, 0.08, seed=0)
    rng = np.random.default_rng(0)
    offs = 0.02 * rng.standard_normal((args.frames, 1, 3)).astype(np.float32)
    verts0 = jnp.asarray(np.asarray(v)[None]
                         + np.array([0, 0, 0.75], np.float32) + offs)
    topo = rasterizer.MeshTopology.from_faces(np.asarray(f))
    Km = jnp.tile(jnp.asarray([[[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]],
                              jnp.float32), (args.frames, 1, 1))
    sett = RasterSettings(image_size=args.rend, tile_px=args.tile,
                          edges_per_tile=args.ke)

    def prep_loss(vv):
        sp, _, _, _ = rasterizer._pallas_prep(vv, topo, Km, sett)
        return jnp.sum(sp[:, :, :4])

    t_pf = timed(jax.jit(lambda vv, eps: prep_loss(vv + eps)), verts0,
                 args.reps)
    t_pg = timed(jax.jit(lambda vv, eps: jax.value_and_grad(prep_loss)(
        vv + eps)), verts0, args.reps)
    print(f"{'prep_only':15s} fwd {t_pf * 1e3:7.3f} ms"
          f"{'':17s}fwd+bwd {t_pg * 1e3:7.3f} ms")
    print(f"frames={args.frames} rend={S} tile={tile_px} ke={ke} "
          f"max_edge_demand={demand}" + (" (OVERFLOW!)" if demand > ke else ""))
    fl = up.shade_flops_per_iter(args.frames, S, ke)
    w = jnp.asarray(np.random.default_rng(1).standard_normal(
        anchors_flat.shape[:2] + pix_shape(tile_px)).astype(np.float32))

    ps = pix_shape(tile_px)

    def shipped(sp, anch, st):
        # module kernel returns (B,T,tp,tp); flatten for comparable loss
        out = shade_tiles_pallas(sp, anch.reshape(
            anch.shape[:2] + (tile_px, tile_px)), st)
        return out.reshape(out.shape[:2] + ps)

    def make_chunk_variant(chunk):
        """Shipped kernel with _EDGE_CHUNK overridden (read at trace time).

        chunk >= ke collapses the per-instance `pl.when` adaptivity to a
        single all-or-nothing chunk (the pre-r4-final kernel modulo the
        empty-tile skip) — the A/B for the snapshot-commit edge-chunking
        change. Skipped chunks must be bit-identical no-ops: the max|dsil|
        / rel|dgrad| columns against A_shipped are the on-chip proof.
        """
        def fn(sp, anch, st):
            import homan_tpu.render.pallas_shade as psh
            old = psh._EDGE_CHUNK
            psh._EDGE_CHUNK = chunk  # active during jit tracing (fn body)
            try:
                out = shade_tiles_pallas(sp, anch.reshape(
                    anch.shape[:2] + (tile_px, tile_px)), st)
            finally:
                psh._EDGE_CHUNK = old
            return out.reshape(out.shape[:2] + ps)
        return fn

    variants = {
        "A_shipped": shipped,
        "A_chunk8": make_chunk_variant(8),
        "A_chunk_ke": make_chunk_variant(10 ** 6),
        "B_recip": make_shade("B", ericson=False, defer=False, rchunk=None),
        "C_ericson": make_shade("C", ericson=True, defer=False, rchunk=None),
        "D_defer": make_shade("D", ericson=True, defer=True, rchunk=None),
        "E_defer_r8": make_shade("E8", ericson=True, defer=True, rchunk=8),
        "E_defer_r32": make_shade("E32", ericson=True, defer=True, rchunk=32),
        "E_nodefer_r32": make_shade("EC32", ericson=True, defer=False,
                                    rchunk=32),
    }

    ref_sil = None
    ref_g = None
    for name, shade in variants.items():
        fwd_fn = jax.jit(lambda sp, eps, _s=shade: _s(
            sp + eps, anchors_flat, static))
        val_fn = jax.jit(lambda sp, eps, _s=shade: jax.value_and_grad(
            lambda q: jnp.sum(_s(q, anchors_flat, static) * w))(sp + eps))
        try:
            sil = np.asarray(jax.block_until_ready(
                fwd_fn(seg_pack, np.float32(0))))
            _, grad = jax.block_until_ready(val_fn(seg_pack, np.float32(0)))
            grad = np.asarray(grad)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        if ref_sil is None:
            ref_sil, ref_g = sil, grad
            sil_d = g_d = 0.0
        else:
            sil_d = float(np.abs(sil - ref_sil).max())
            g_d = float(np.abs(grad - ref_g).max() / max(np.abs(ref_g).max(),
                                                         1e-12))
        t_f = timed(fwd_fn, seg_pack, args.reps)
        t_g = timed(val_fn, seg_pack, args.reps)
        tf_f = fl["vpu_flops"] * (53.0 / 54.0) / t_f / 1e12
        tf_g = fl["vpu_flops"] / t_g / 1e12
        print(f"{name:15s} fwd {t_f * 1e3:7.3f} ms ({tf_f:5.2f} VPU TF/s)  "
              f"fwd+bwd {t_g * 1e3:7.3f} ms ({tf_g:5.2f} TF/s)  "
              f"max|dsil|={sil_d:.2e} rel|dgrad|={g_d:.2e}")


if __name__ == "__main__":
    main()
