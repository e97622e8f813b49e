import jax
import jax.numpy as jnp
import numpy as np
import pytest

from homan_tpu.core import geometry


def random_rotation_np(rng, n):
    """Independent ground truth: rotation matrices via QR of gaussians."""
    A = rng.randn(n, 3, 3)
    Q, R = np.linalg.qr(A)
    # Make determinant +1
    det = np.linalg.det(Q)
    Q[:, :, 0] *= np.sign(det)[:, None]
    return Q


def test_rot6d_roundtrip():
    rng = np.random.RandomState(0)
    R = random_rotation_np(rng, 16).astype(np.float32)
    r6d = geometry.matrix_to_rot6d(jnp.asarray(R))
    R2 = geometry.rot6d_to_matrix(r6d)
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)


def test_rot6d_is_rotation():
    rng = np.random.RandomState(1)
    raw = jnp.asarray(rng.randn(8, 6).astype(np.float32))
    R = geometry.rot6d_to_matrix(raw)
    eye = jnp.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(np.asarray(eye), np.tile(np.eye(3), (8, 1, 1)),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), np.ones(8),
                               atol=1e-5)


def test_rot6d_accepts_flat_and_32():
    rng = np.random.RandomState(2)
    raw = rng.randn(4, 6).astype(np.float32)
    R1 = geometry.rot6d_to_matrix(jnp.asarray(raw))
    R2 = geometry.rot6d_to_matrix(jnp.asarray(raw.reshape(4, 3, 2)))
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), atol=1e-6)


def test_rodrigues_matches_scipy():
    from scipy.spatial.transform import Rotation
    rng = np.random.RandomState(3)
    aa = rng.randn(10, 3).astype(np.float32)
    R = geometry.rodrigues(jnp.asarray(aa))
    R_ref = Rotation.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(np.asarray(R), R_ref, atol=1e-5)


def test_rodrigues_zero_angle():
    R = geometry.rodrigues(jnp.zeros((2, 3)))
    np.testing.assert_allclose(np.asarray(R), np.tile(np.eye(3), (2, 1, 1)),
                               atol=1e-6)
    # Gradient must be finite at zero
    g = jax.grad(lambda a: geometry.rodrigues(a).sum())(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_matrix_to_axis_angle_roundtrip():
    rng = np.random.RandomState(4)
    aa = rng.randn(12, 3).astype(np.float32) * 0.8
    R = geometry.rodrigues(jnp.asarray(aa))
    aa2 = geometry.matrix_to_axis_angle(R)
    np.testing.assert_allclose(np.asarray(aa2), aa, atol=1e-4)


def test_random_rotations_uniform():
    key = jax.random.PRNGKey(0)
    R = geometry.random_rotations(key, 512)
    R = np.asarray(R)
    eye = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (512, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(512), atol=1e-4)
    # Rough uniformity: mean rotated z-axis should be near zero
    z = R[:, 2, :]
    assert np.abs(z.mean(0)).max() < 0.15


def test_random_rotations_upright():
    key = jax.random.PRNGKey(1)
    R = np.asarray(geometry.random_rotations(key, 64, upright=True))
    eye = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (64, 1, 1)), atol=1e-5)


def test_compute_dist_z():
    v1 = jnp.asarray(np.array([[0, 0, 0.0], [0, 0, 1.0]]))
    v2 = jnp.asarray(np.array([[0, 0, 2.0], [0, 0, 3.0]]))
    assert float(geometry.compute_dist_z(v1, v2)) == pytest.approx(1.0)
    v3 = jnp.asarray(np.array([[0, 0, 0.5], [0, 0, 2.5]]))
    assert float(geometry.compute_dist_z(v1, v3)) == pytest.approx(0.0)


def test_center_vertices():
    rng = np.random.RandomState(5)
    v = jnp.asarray(rng.randn(10, 3).astype(np.float32) + 3.0)
    f = jnp.asarray(rng.randint(0, 10, (4, 3)))
    vc, fc = geometry.center_vertices(v, f)
    np.testing.assert_allclose(np.asarray(vc.mean(0)), np.zeros(3), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(fc), np.asarray(f)[:, ::-1])
