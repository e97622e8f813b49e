"""Rotation representations and sampling. Pure jnp, fully vmap/jit friendly.

Parity targets (reference, /root/reference):
  * homan/utils/geometry.py:9-40   rot6d <-> matrix
  * homan/utils/geometry.py:89-134 uniform SO(3) sampling (Arvo 1992)
  * homan/utils/geometry.py:50-66  center_vertices
  * homan/utils/geometry.py:69-86  compute_dist_z

Conventions: rotations act on ROW vectors from the right, `v_rot = v @ R`,
matching the reference's `torch.matmul(meshes, rotations)` everywhere.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(v: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize along `axis` (same eps semantics as F.normalize)."""
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, eps)


def rot6d_to_matrix(rot_6d: jnp.ndarray) -> jnp.ndarray:
    """6D rotation (Zhou et al. CVPR'19) -> 3x3 rotation matrices.

    Args:
      rot_6d: (..., 6) or (..., 3, 2) continuous 6D rotation.
    Returns:
      (..., 3, 3) rotation matrices. Columns are the Gram-Schmidt frame,
      i.e. R[..., :, k] = b_k, matching homan/utils/geometry.py:9-27.
    """
    batch_shape = rot_6d.shape[:-1] if rot_6d.shape[-1] == 6 else rot_6d.shape[:-2]
    r = rot_6d.reshape(batch_shape + (3, 2))
    a1 = r[..., 0]
    a2 = r[..., 1]
    b1 = normalize(a1)
    b2 = normalize(a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def matrix_to_rot6d(rotmat: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices (..., 3, 3) -> 6D representation (..., 3, 2).

    Keeps the first two columns (homan/utils/geometry.py:30-40).
    """
    return rotmat[..., :, :2]


def rodrigues(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3).

    These matrices act on COLUMN vectors (standard convention), as consumed by
    the MANO layer; transpose before using in the row-vector convention.
    Taylor-safe at theta -> 0.
    """
    # Safe norm: clamp under the sqrt so the gradient at ||aa|| = 0 is exact
    # (sin(theta)*K ~ aa there) instead of NaN from d||.||/d(aa) at 0.
    sq = jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(sq, 1e-24))
    k = axis_angle / theta
    kx, ky, kz = k[..., 0], k[..., 1], k[..., 2]
    zero = jnp.zeros_like(kx)
    K = jnp.stack(
        [
            jnp.stack([zero, -kz, ky], axis=-1),
            jnp.stack([kz, zero, -kx], axis=-1),
            jnp.stack([-ky, kx, zero], axis=-1),
        ],
        axis=-2,
    )
    t = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis_angle.dtype), K.shape)
    return eye + jnp.sin(t) * K + (1.0 - jnp.cos(t)) * (K @ K)


def matrix_to_axis_angle(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices (..., 3, 3) -> axis-angle (..., 3). Column convention."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sin(theta)
    scale = jnp.where(
        sin_theta[..., None] > 1e-6,
        theta[..., None] / jnp.maximum(2.0 * sin_theta[..., None], 1e-12),
        0.5 + theta[..., None] ** 2 / 12.0,  # small-angle series
    )
    return w * scale


def euler_angles_to_matrix(angles: jnp.ndarray, convention: str) -> jnp.ndarray:
    """Euler angles (..., len(convention)) -> rotation matrices, intrinsic."""

    def _axis_rot(axis: str, a: jnp.ndarray) -> jnp.ndarray:
        c, s = jnp.cos(a), jnp.sin(a)
        one, zero = jnp.ones_like(a), jnp.zeros_like(a)
        if axis == "X":
            rows = [(one, zero, zero), (zero, c, -s), (zero, s, c)]
        elif axis == "Y":
            rows = [(c, zero, s), (zero, one, zero), (-s, zero, c)]
        elif axis == "Z":
            rows = [(c, -s, zero), (s, c, zero), (zero, zero, one)]
        else:
            raise ValueError(f"bad axis {axis}")
        return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)

    R = _axis_rot(convention[0], angles[..., 0])
    for i, axis in enumerate(convention[1:], start=1):
        R = R @ _axis_rot(axis, angles[..., i])
    return R


def random_rotations(key: jax.Array, n: int, upright: bool = False) -> jnp.ndarray:
    """Sample n rotation matrices; uniform over SO(3) by default.

    Reproduces the Arvo'92 construction of homan/utils/geometry.py:89-134
    (rotation about z composed with a Householder reflection) so stage-B pose
    candidates have the same distribution as the reference.
    """
    if upright:
        k1, k2, k3 = jax.random.split(key, 3)
        a1 = jax.random.uniform(k1, (n,), minval=0.0, maxval=2 * jnp.pi)
        a2 = jax.random.uniform(k2, (n,), minval=-jnp.pi / 6, maxval=jnp.pi / 6)
        a3 = jax.random.uniform(k3, (n,), minval=-jnp.pi / 12, maxval=jnp.pi / 12)
        return euler_angles_to_matrix(jnp.stack([a1, a2, a3], axis=-1), "YXZ")

    x = jax.random.uniform(key, (3, n))
    x1, x2, x3 = x[0], x[1], x[2]
    tau = 2 * jnp.pi
    c1, s1 = jnp.cos(tau * x1), jnp.sin(tau * x1)
    zero, one = jnp.zeros_like(x1), jnp.ones_like(x1)
    R = jnp.stack(
        [
            jnp.stack([c1, s1, zero], axis=1),
            jnp.stack([-s1, c1, zero], axis=1),
            jnp.stack([zero, zero, one], axis=1),
        ],
        axis=1,
    )  # (n, 3, 3)
    v = jnp.stack(
        [
            jnp.cos(tau * x2) * jnp.sqrt(x3),
            jnp.sin(tau * x2) * jnp.sqrt(x3),
            jnp.sqrt(1.0 - x3),
        ],
        axis=1,
    )  # (n, 3)
    H = jnp.eye(3)[None] - 2.0 * v[:, :, None] * v[:, None, :]
    return -(H @ R)


def center_vertices(vertices: jnp.ndarray, faces: jnp.ndarray, flip_y: bool = True):
    """Centroid-align vertices; optionally flip y (image coords) and rewind faces."""
    vertices = vertices - vertices.mean(axis=0, keepdims=True)
    if flip_y:
        vertices = vertices * jnp.array([1.0, -1.0, 1.0], dtype=vertices.dtype)
        faces = faces[:, ::-1]
    return vertices, faces


def compute_dist_z(verts1: jnp.ndarray, verts2: jnp.ndarray) -> jnp.ndarray:
    """Gap between the z-extents of two vertex sets; 0 if they overlap."""
    a, b = verts1[:, 2].min(), verts1[:, 2].max()
    c, d = verts2[:, 2].min(), verts2[:, 2].max()
    overlap = (d >= a) & (b >= c)
    gap = jnp.minimum(jnp.abs(c - b), jnp.abs(a - d))
    return jnp.where(overlap, 0.0, gap)


def combine_verts(verts_list) -> jnp.ndarray:
    """Concatenate (B, V_i, 3) vertex sets along the vertex axis."""
    b = verts_list[0].shape[0]
    return jnp.concatenate([v.reshape(b, -1, 3) for v in verts_list], axis=1)
