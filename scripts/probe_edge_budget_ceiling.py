"""Measure the (tile_px, edges_per_tile) feasibility/perf envelope on TPU.

Produces the measured ceiling table behind render.rasterizer.
auto_edge_settings: for each tile size, the largest edges_per_tile whose
fused Pallas shade kernel (forward + analytic-VJP backward) still compiles
and runs at 256², plus steady-state step time so the auto-bucket can prefer
the fastest feasible config, not just the smallest.

Run on the real chip (no JAX_PLATFORMS override):
    python scripts/probe_edge_budget_ceiling.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from homan_tpu.core.meshes import bumpy_potato
from homan_tpu.render import RasterSettings, rasterize_soft
from homan_tpu.render.rasterizer import MeshTopology


def main():
    B, S = 10, 256
    v, f = bumpy_potato(3, 0.08, seed=0)  # 642 verts / 1280 faces
    topo = MeshTopology.from_faces(np.asarray(f))
    rng = np.random.RandomState(0)
    verts = np.tile(v[None], (B, 1, 1)) + rng.randn(B, 1, 3) * 0.01
    verts = verts.astype(np.float32)
    verts[..., 2] += 0.7
    K = np.tile(np.array([[[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]]],
                         np.float32), (B, 1, 1))
    target = (rng.rand(B, S, S) > 0.5).astype(np.float32)
    vj, Kj, tj = jnp.asarray(verts), jnp.asarray(K), jnp.asarray(target)

    print(f"device={jax.devices()[0].device_kind} B={B} S={S} "
          f"faces={f.shape[0]} edges={topo.edges.shape[0]}")
    for tile in (32, 64, 128):
        for ke in (48, 96, 128, 192, 256, 384, 512):
            if ke > topo.edges.shape[0]:
                continue
            s = RasterSettings(image_size=S, tile_px=tile, edges_per_tile=ke)

            def loss(vv):
                sil = rasterize_soft(vv, topo, Kj, s)["sil"]
                return ((sil - tj) ** 2).mean()

            g = jax.jit(jax.value_and_grad(loss))
            try:
                out = jax.block_until_ready(g(vj))
            except Exception as e:
                msg = str(e).split("\n")[0][:110]
                print(f"tile={tile:4d} ke={ke:4d}  FAIL {type(e).__name__}: "
                      f"{msg}")
                continue
            t0 = time.perf_counter()
            for _ in range(5):
                out = g(vj)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / 5
            print(f"tile={tile:4d} ke={ke:4d}  ok   {dt * 1e3:8.3f} ms/step",
                  flush=True)


if __name__ == "__main__":
    main()
