"""Camera models, projection, ROI intrinsics. Pure jnp.

Parity targets (reference, /root/reference):
  * homan/utils/camera.py:108-139  compute_transformation_persp (+detach trick)
  * homan/utils/camera.py:59-105   compute_transformation_ortho
  * homan/utils/camera.py:9-36     local_to_global_cam
  * homan/utils/camera.py:39-56    compute_K_roi
  * libyana.camutils.project.batch_proj2d, kcrop.get_K_crop_resize,
    camconvs.batch_weakcam2persptrans (absorbed here; the reference imports
    them from the external libyana helper package).

All intrinsics are pinhole K = [[fx,0,cx],[0,fy,cy],[0,0,1]]; "normalized"
(`orig_size=1`) means fx,cx are fractions of image size, so projected points
land in [0, 1] over the image.

The `*_det` outputs reproduce the reference's detach topology: vertices whose
MANO/articulation gradient is blocked so interaction losses only steer the
rigid transform (homan/utils/camera.py:134-139).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from homan_tpu.core import bbox as bbox_ops


def batch_proj2d(verts: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Project camera-space points with intrinsics.

    Args:
      verts: (B, V, 3) camera-space points.
      K: (B, 3, 3) intrinsics.
    Returns:
      (B, V, 2) image-plane coordinates (in K's units).
    """
    proj = jnp.einsum("bvj,bkj->bvk", verts, K)
    return proj[..., :2] / jnp.maximum(proj[..., 2:3], 1e-9)


def project_points(verts: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Like batch_proj2d but returns (u, v, z) with z the camera depth."""
    proj = jnp.einsum("bvj,bkj->bvk", verts, K)
    uv = proj[..., :2] / jnp.maximum(proj[..., 2:3], 1e-9)
    return jnp.concatenate([uv, verts[..., 2:3]], axis=-1)


def compute_transformation_persp(
    meshes: jnp.ndarray,
    translations: jnp.ndarray,
    rotations: jnp.ndarray | None = None,
    intrinsic_scales: jnp.ndarray | None = None,
):
    """scale -> rotate (row-vector) -> translate.

    Args:
      meshes: (V, 3) or (B, V, 3).
      translations: (B, 1, 3).
      rotations: (B, 3, 3) acting on row vectors (v @ R).
      intrinsic_scales: (B,) or scalar.
    Returns:
      (verts, verts_det): both (B, V, 3); verts_det has the mesh geometry
      gradient stopped (rigid params still differentiable).
    """
    B = translations.shape[0]
    if meshes.ndim == 2:
        meshes = jnp.broadcast_to(meshes[None], (B,) + meshes.shape)
    if rotations is None:
        rotations = jnp.broadcast_to(jnp.eye(3, dtype=meshes.dtype), (B, 3, 3))
    if intrinsic_scales is None:
        intrinsic_scales = jnp.ones((B,), dtype=meshes.dtype)
    scales = jnp.reshape(intrinsic_scales, (-1, 1, 1))
    meshes_scaled = scales * meshes
    verts = jnp.einsum("bvj,bjk->bvk", meshes_scaled, rotations) + translations
    verts_det = (
        jnp.einsum("bvj,bjk->bvk", jax.lax.stop_gradient(meshes_scaled), rotations)
        + translations
    )
    return verts, verts_det


def weakcam_to_persp_trans(weak_cams_px: jnp.ndarray, K_px: jnp.ndarray,
                           focal_scale: float = 1.0) -> jnp.ndarray:
    """Weak-perspective camera (pixel units) -> perspective translation.

    Args:
      weak_cams_px: (B, 3) [s_px, tx_px, ty_px]: scale in pixels/unit and
        pixel-space image translation of the origin.
      K_px: (B, 3, 3) pixel intrinsics.
    Returns:
      (B, 3) camera-space translation t with f/tz = s (depth from scale) and
      (tx_px, ty_px) deprojection through K, absorbing the libyana
      camconvs.batch_weakcam2persptrans contract used at
      homan/utils/camera.py:96-97.
    """
    fx = K_px[:, 0, 0] * focal_scale
    fy = K_px[:, 1, 1] * focal_scale
    cx, cy = K_px[:, 0, 2], K_px[:, 1, 2]
    s = weak_cams_px[:, 0]
    tz = fx / jnp.maximum(s, 1e-9)
    tx = (weak_cams_px[:, 1] - cx) * tz / fx
    ty = (weak_cams_px[:, 2] - cy) * tz / fy
    return jnp.stack([tx, ty, tz], axis=-1)


def compute_transformation_ortho(
    meshes: jnp.ndarray,
    cams: jnp.ndarray,
    rotations: jnp.ndarray | None = None,
    intrinsic_scales: jnp.ndarray | None = None,
    K: jnp.ndarray | None = None,
    image_size: int = 640,
):
    """Scaled-orthographic (HMR-style) camera -> 3D transformation.

    Mirrors homan/utils/camera.py:59-105: the weak-persp cam [s, tx, ty]
    (normalized, HMR convention) is converted to a perspective translation
    through the (normalized) intrinsics K, then applied after rotation.
    """
    B = cams.shape[0]
    if meshes.ndim == 2:
        meshes = jnp.broadcast_to(meshes[None], (B,) + meshes.shape)
    if rotations is None:
        rotations = jnp.broadcast_to(jnp.eye(3, dtype=meshes.dtype), (B, 3, 3))
    if intrinsic_scales is None:
        intrinsic_scales = jnp.ones((B,), dtype=meshes.dtype)
    persp_scale = cams[:, :1] / 2 * image_size  # pixels per unit
    persp_trans = (cams[:, 1:] + 1.0 / cams[:, :1]) * persp_scale
    weak_px = jnp.concatenate([persp_scale, persp_trans], axis=1)
    K_px = K.at[:, :2].multiply(image_size) if K is not None else None
    trans = weakcam_to_persp_trans(weak_px, K_px)[:, None, :]
    verts_rot = jnp.einsum("bvj,bjk->bvk", meshes, rotations)
    verts_rot_det = jnp.einsum(
        "bvj,bjk->bvk", jax.lax.stop_gradient(meshes), rotations)
    scales = jnp.reshape(intrinsic_scales, (-1, 1, 1))
    return scales * (verts_rot + trans), scales * (verts_rot_det + trans)


def get_K_crop_resize(K: jnp.ndarray, boxes_xyxy: jnp.ndarray,
                      target_size: int) -> jnp.ndarray:
    """Intrinsics for a crop resized to target_size x target_size.

    Args:
      K: (B, 3, 3) pixel intrinsics of the full image.
      boxes_xyxy: (B, 4) crop boxes in pixels.
    Returns:
      (B, 3, 3) pixel intrinsics valid inside the resized crop. Absorbs the
      libyana kcrop.get_K_crop_resize contract (homan/pose_optimization.py:247).
    """
    x1, y1, x2, y2 = (boxes_xyxy[:, i] for i in range(4))
    sx = target_size / jnp.maximum(x2 - x1, 1e-9)
    sy = target_size / jnp.maximum(y2 - y1, 1e-9)
    fx = K[:, 0, 0] * sx
    fy = K[:, 1, 1] * sy
    cx = (K[:, 0, 2] - x1) * sx
    cy = (K[:, 1, 2] - y1) * sy
    skew = K[:, 0, 1] * sx
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    row0 = jnp.stack([fx, skew, cx], axis=-1)
    row1 = jnp.stack([zeros, fy, cy], axis=-1)
    row2 = jnp.stack([zeros, zeros, ones], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def get_K_crop_resize_np(K, boxes_xyxy, target_size: int):
    """Numpy twin of get_K_crop_resize for host-side evidence prep.

    Eagerly dispatching the jnp version costs ~15 device ops per call
    (~20 ms each over a remote-TPU relay) to produce nine numbers; per-frame
    evidence loops use this instead. Same formula, same shapes.
    """
    import numpy as np
    K = np.asarray(K, np.float32).copy()
    boxes = np.asarray(boxes_xyxy, np.float32)
    sx = target_size / np.maximum(boxes[:, 2] - boxes[:, 0], 1e-9)
    sy = target_size / np.maximum(boxes[:, 3] - boxes[:, 1], 1e-9)
    out = np.zeros(boxes.shape[:1] + (3, 3), np.float32)
    out[:, 0, 0] = K[:, 0, 0] * sx
    out[:, 0, 1] = K[:, 0, 1] * sx
    out[:, 0, 2] = (K[:, 0, 2] - boxes[:, 0]) * sx
    out[:, 1, 1] = K[:, 1, 1] * sy
    out[:, 1, 2] = (K[:, 1, 2] - boxes[:, 1]) * sy
    out[:, 2, 2] = 1.0
    return out


def normalize_K(K: jnp.ndarray, size) -> jnp.ndarray:
    """Divide the first two rows of K by the image size (`orig_size=1` space)."""
    K = jnp.asarray(K, jnp.float32)
    scale = jnp.ones((3, 1), K.dtype).at[:2, 0].set(1.0 / size)
    return K * scale


def compute_K_roi(upper_left, b, img_size, focal_length: float = 1.0) -> jnp.ndarray:
    """Normalized intrinsics of a square ROI crop (homan/utils/camera.py:39-56)."""
    x1, y1 = upper_left
    f = focal_length * img_size / b
    px = (img_size / 2 - x1) / b
    py = (img_size / 2 - y1) / b
    return jnp.array([[[f, 0, px], [0, f, py], [0, 0, 1]]], dtype=jnp.float32)


def local_to_global_cam(bboxes: jnp.ndarray, cams: jnp.ndarray, L: float) -> jnp.ndarray:
    """Weak-persp camera w.r.t. a bbox -> w.r.t. full image (camera.py:9-36).

    Args:
      bboxes: (N, 4) xyxy boxes.
      cams: (N, 3) bbox-local weak-perspective cameras.
      L: max(height, width) of the image.
    """
    square = bbox_ops.make_bbox_square(bbox_ops.bbox_xy_to_wh(bboxes))
    x, y, b = square[:, 0], square[:, 1], square[:, 2]
    s_crop = b * cams[:, 0] / 2
    t_crop = cams[:, 1:] + 1.0 / cams[:, 0:1]
    s_og = s_crop / L
    t_og = t_crop + jnp.stack([x, y], axis=-1) / s_crop[:, None]
    s = s_og * 2
    t = t_og - 0.5 / s_og[:, None]
    return jnp.concatenate([s[:, None], t], axis=1)
