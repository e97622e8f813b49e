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
