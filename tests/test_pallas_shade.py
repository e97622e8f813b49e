"""Pallas tile-shading kernel vs the XLA formulation (interpret mode on CPU)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from homan_tpu.core.meshes import bumpy_potato
from homan_tpu.render import RasterSettings, rasterize_soft
from homan_tpu.render.rasterizer import MeshTopology


def make_scene(b=2):
    v, f = bumpy_potato(2, 0.25, seed=0)
    topo = MeshTopology.from_faces(f)
    rng = np.random.RandomState(0)
    offs = rng.randn(b, 1, 3).astype(np.float32) * 0.03
    verts = jnp.asarray(v)[None] + jnp.asarray([0, 0, 1.0]) + jnp.asarray(offs)
    K = jnp.tile(jnp.asarray([[[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]]),
                 (b, 1, 1))
    return verts, topo, K


SET_XLA = RasterSettings(image_size=64, tile_px=32, edges_per_tile=96)
SET_PAL = dataclasses.replace(SET_XLA, use_pallas=True)


def test_pallas_forward_matches_xla():
    verts, topo, K = make_scene()
    a = rasterize_soft(verts, topo, K, SET_XLA)["sil"]
    b = rasterize_soft(verts, topo, K, SET_PAL)["sil"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_pallas_gradient_matches_xla():
    verts, topo, K = make_scene(b=1)
    target = (rasterize_soft(verts + jnp.asarray([0.02, 0, 0]), topo, K,
                             SET_XLA)["sil"] > 0.5).astype(jnp.float32)

    def loss(v, st):
        sil = rasterize_soft(v, topo, K, st)["sil"]
        return ((sil - target) ** 2).sum()

    g_xla = jax.grad(lambda v: loss(v, SET_XLA))(verts)
    g_pal = jax.grad(lambda v: loss(v, SET_PAL))(verts)
    gx = np.asarray(g_xla)
    gp = np.asarray(g_pal)
    # same sparsity pattern and values (both route gradient via argmin edge)
    denom = np.abs(gx).max()
    np.testing.assert_allclose(gp / denom, gx / denom, atol=3e-3)


def test_pallas_under_jit_and_value():
    verts, topo, K = make_scene()

    @jax.jit
    def f(v):
        return rasterize_soft(v, topo, K, SET_PAL)["sil"].sum()

    out = float(f(verts))
    assert np.isfinite(out) and out > 0
