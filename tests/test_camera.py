import jax
import jax.numpy as jnp
import numpy as np

from homan_tpu.core import camera, geometry


def test_batch_proj2d_pinhole():
    K = jnp.asarray(np.array([[[100.0, 0, 320], [0, 100, 240], [0, 0, 1]]],
                             np.float32))
    pts = jnp.asarray(np.array([[[0.0, 0, 2], [1, 1, 2]]], np.float32))
    uv = np.asarray(camera.batch_proj2d(pts, K))
    np.testing.assert_allclose(uv[0, 0], [320, 240], atol=1e-4)
    np.testing.assert_allclose(uv[0, 1], [370, 290], atol=1e-4)


def test_compute_transformation_persp_order():
    """scale -> rotate -> translate, row-vector convention v @ R."""
    rng = np.random.RandomState(0)
    mesh = jnp.asarray(rng.randn(7, 3).astype(np.float32))
    R = geometry.rodrigues(jnp.asarray([[0.3, -0.2, 0.5]], dtype=jnp.float32))
    t = jnp.asarray(np.array([[[1.0, 2.0, 3.0]]], np.float32))
    s = jnp.asarray([2.0])
    verts, verts_det = camera.compute_transformation_persp(mesh, t, R, s)
    expected = 2.0 * np.asarray(mesh) @ np.asarray(R[0]) + np.array([1, 2, 3.0])
    np.testing.assert_allclose(np.asarray(verts[0]), expected, atol=1e-5)
    np.testing.assert_allclose(np.asarray(verts_det[0]), expected, atol=1e-5)


def test_persp_detach_topology():
    """verts_det must block gradient to the mesh but keep it for trans."""
    mesh = jnp.ones((5, 3))
    t = jnp.zeros((1, 1, 3))

    def loss_mesh(m):
        _, det = camera.compute_transformation_persp(m, t)
        return (det ** 2).sum()

    def loss_trans(tr):
        _, det = camera.compute_transformation_persp(mesh, tr)
        return (det ** 2).sum()

    g_mesh = jax.grad(loss_mesh)(mesh)
    g_trans = jax.grad(loss_trans)(t)
    assert float(jnp.abs(g_mesh).sum()) == 0.0
    assert float(jnp.abs(g_trans).sum()) > 0.0


def test_get_K_crop_resize_identity():
    """Cropping the full image to its own size must leave K unchanged."""
    K = jnp.asarray(np.array([[[500.0, 0, 320], [0, 500, 240], [0, 0, 1]]],
                             np.float32))
    boxes = jnp.asarray(np.array([[0.0, 0.0, 256.0, 256.0]], np.float32))
    K2 = camera.get_K_crop_resize(K, boxes, 256)
    np.testing.assert_allclose(np.asarray(K2), np.asarray(K), atol=1e-4)


def test_get_K_crop_resize_projection_consistency():
    """A 3D point projects to consistent pixel coords before/after cropping."""
    K = jnp.asarray(np.array([[[500.0, 0, 320], [0, 480, 250], [0, 0, 1]]],
                             np.float32))
    box = np.array([[100.0, 50.0, 400.0, 350.0]], np.float32)  # 300x300 crop
    K_roi = camera.get_K_crop_resize(K, jnp.asarray(box), 256)
    pt = jnp.asarray(np.array([[[0.2, -0.1, 1.5]]], np.float32))
    uv_full = np.asarray(camera.batch_proj2d(pt, K))[0, 0]
    uv_crop = np.asarray(camera.batch_proj2d(pt, K_roi))[0, 0]
    expected = (uv_full - box[0, :2]) * 256.0 / 300.0
    np.testing.assert_allclose(uv_crop, expected, atol=1e-3)


def test_weakcam_to_persp_trans():
    """Projecting the origin translated by t must land at the weak-cam center,
    and the scale must equal f/tz."""
    K = jnp.asarray(np.array([[[500.0, 0, 320], [0, 500, 240], [0, 0, 1]]],
                             np.float32))
    weak = jnp.asarray(np.array([[250.0, 400.0, 200.0]], np.float32))
    t = camera.weakcam_to_persp_trans(weak, K)
    assert float(t[0, 2]) == 2.0  # 500/250
    uv = np.asarray(camera.batch_proj2d(t[:, None, :], K))[0, 0]
    np.testing.assert_allclose(uv, [400.0, 200.0], atol=1e-4)


def test_normalize_K():
    K = np.array([[500.0, 0, 320], [0, 480, 240], [0, 0, 1]], np.float32)
    Kn = np.asarray(camera.normalize_K(jnp.asarray(K), 640))
    np.testing.assert_allclose(Kn[0, 0], 500 / 640, atol=1e-6)
    np.testing.assert_allclose(Kn[2, 2], 1.0, atol=1e-6)


def test_local_to_global_cam_shapes():
    bboxes = jnp.asarray(np.array([[10.0, 20.0, 110.0, 140.0]], np.float32))
    cams = jnp.asarray(np.array([[0.9, 0.05, -0.02]], np.float32))
    out = camera.local_to_global_cam(bboxes, cams, 640)
    assert out.shape == (1, 3)
    assert np.all(np.isfinite(np.asarray(out)))
