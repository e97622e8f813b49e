"""Native meshops: build, then verify against the python/scipy references."""
import numpy as np
import pytest

from homan_tpu import native
from homan_tpu.core.meshes import bumpy_potato, save_obj


@pytest.fixture(scope="module", autouse=True)
def built_library():
    from homan_tpu.native.build import build
    try:
        build(verbose=False)
    except Exception as e:  # toolchain missing: fallbacks still tested
        pytest.skip(f"native build unavailable: {e}")
    native._LIB = None  # force reload
    assert native.available()


def test_edt_matches_scipy():
    from scipy.ndimage import distance_transform_edt
    rng = np.random.RandomState(0)
    mask = rng.rand(64, 48) > 0.95
    mask[20:24, 10:14] = True
    ours = native.edt2d_squared(mask)
    ref = distance_transform_edt(~mask) ** 2
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_edt_empty_mask():
    out = native.edt2d_squared(np.zeros((8, 8), bool))
    assert (out > 1e9).all()  # INF-ish everywhere


def test_decimate_quadric():
    v, f = bumpy_potato(3, 1.0, seed=0)  # 1280 faces
    v2, f2 = native.decimate(v, f, 300)
    assert f2.shape[0] <= 320
    assert f2.shape[0] > 150
    assert f2.min() >= 0 and f2.max() < v2.shape[0]
    # Decimated mesh stays near the original surface
    from homan_tpu.interactions.contact import batch_pairwise_dist2
    import jax.numpy as jnp
    d2 = batch_pairwise_dist2(jnp.asarray(v2)[None], jnp.asarray(v)[None])
    nn = np.sqrt(np.asarray(d2.min(axis=2))[0])
    assert nn.mean() < 0.08  # mean drift under 8% of the unit radius


def test_obj_parse_matches_python(tmp_path):
    from homan_tpu.core.meshes import load_obj as py_load
    v, f = bumpy_potato(2, 0.5, seed=1)
    p = str(tmp_path / "m.obj")
    save_obj(p, v, f)
    v1, f1 = native.load_obj(p)
    v2, f2 = py_load(p)
    np.testing.assert_allclose(v1, v2, atol=1e-6)
    np.testing.assert_array_equal(f1, f2)


def test_raster_phong_matches_rasterize_hard():
    """The native z-buffer viz renderer is bit-equivalent (float eps) to the
    XLA rasterize_hard it replaces on the host path."""
    if not native.raster_available():
        pytest.skip("libmeshops.so without raster_phong")
    import jax.numpy as jnp
    from homan_tpu.render import RasterSettings, rasterize_hard
    from homan_tpu.render.rasterizer import MeshTopology

    v, f = bumpy_potato(3, 0.08, seed=1)
    v = np.asarray(v, np.float32) + np.array([0.05, -0.02, 0.6], np.float32)
    K = np.array([[1.2, 0, 0.5], [0, 1.2, 0.5], [0, 0, 1]], np.float32)
    S = 128
    colors = np.tile(np.array([[0.8, 0.6, 0.2]], np.float32),
                     (f.shape[0], 1))
    for shading in ("phong", "flat"):
        out_x = rasterize_hard(
            jnp.asarray(v)[None], MeshTopology.from_faces(np.asarray(f)),
            jnp.asarray(K)[None], jnp.asarray(colors),
            RasterSettings(image_size=S,
                           faces_per_tile=min(2048, f.shape[0] + 64)),
            shading=shading)
        out_n = native.raster_phong(v, f, K, colors, image_size=S,
                                    shading=shading)
        sx = np.asarray(out_x["sil"])[0]
        assert (sx == out_n["sil"]).mean() == 1.0
        assert sx.mean() > 0.02  # scene actually visible
        both = sx & out_n["sil"]
        np.testing.assert_allclose(np.asarray(out_x["depth"])[0][both],
                                   out_n["depth"][both], atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_x["rgb"])[0][both],
                                   out_n["rgb"][both], atol=1e-4)


def test_render_scene_uses_native_path():
    """render_scene returns identical frames through the native fast path
    and the XLA fallback."""
    if not native.raster_available():
        pytest.skip("libmeshops.so without raster_phong")
    from homan_tpu.viz import render_viz

    v, f = bumpy_potato(2, 0.1, seed=0)
    v = np.asarray(v, np.float32)[None] + np.array([0, 0, 0.7], np.float32)
    K = np.array([[[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]]], np.float32)
    frames_native = render_viz.render_scene([v], [np.asarray(f)], ["gold"],
                                            K, image_size=64)
    import homan_tpu.native as native_mod
    real = native_mod.raster_available
    try:
        native_mod.raster_available = lambda: False
        frames_xla = render_viz.render_scene([v], [np.asarray(f)], ["gold"],
                                             K, image_size=64)
    finally:
        native_mod.raster_available = real
    assert len(frames_native) == len(frames_xla) == 1
    # uint8 frames: allow off-by-one from float rounding
    diff = np.abs(frames_native[0].astype(int) - frames_xla[0].astype(int))
    assert diff.max() <= 1


def test_process_meshes_cli(tmp_path):
    """The batch preprocessing driver (shapemeshprocess.py equivalent) runs
    end to end: mesh list in, decimated OBJs out."""
    from homan_tpu.cli import process_meshes
    from homan_tpu.core.meshes import load_obj

    v, f = bumpy_potato(3, 1.0, seed=0)  # 1280 faces
    src = tmp_path / "potato.obj"
    save_obj(str(src), v, f)
    mesh_list = tmp_path / "meshes.txt"
    mesh_list.write_text(f"{src}\n")
    out_root = tmp_path / "processed"

    process_meshes.main(["--mesh_list", str(mesh_list),
                         "--out_root", str(out_root),
                         "--target_faces", "300"])

    out = out_root / "potato_300.obj"
    assert out.exists()
    v2, f2 = load_obj(str(out))
    assert 150 < f2.shape[0] <= 320
    assert f2.min() >= 0 and f2.max() < v2.shape[0]
