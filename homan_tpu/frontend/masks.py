"""Host-side mask preparation: crops, resizes, occlusion-aware targets.

Replaces the detectron2 BitMasks/ROIAlign dependency of the reference
(homan/lib2d/maskutils.py, homan/pointrend.py:118-140) with plain numpy
bilinear sampling. The occlusion-aware target convention is kept exactly:
-1 = occluded/ignore, 0 = background, 1 = foreground
(homan/pose_optimization.py:66-69).
"""
from __future__ import annotations

from functools import partial as _partial
from typing import Dict, Sequence

import jax as _jax
import jax.numpy as jnp
import numpy as np

from homan_tpu.core import bbox as bbox_ops
from homan_tpu.core import camera as cam

REND_SIZE = 256  # evidence resolution (homan/constants.py:31)


def crop_and_resize(masks: np.ndarray, boxes_xyxy: np.ndarray,
                    size: int) -> np.ndarray:
    """Bilinear crop+resize of masks to (size, size), detectron2-compatible.

    Args:
      masks: (N, H, W) float or bool.
      boxes_xyxy: (N, 4).
    Returns:
      (N, size, size) float32 in [0, 1] (threshold at 0.5 for bits).
    """
    masks = np.asarray(masks, np.float32)
    boxes = np.asarray(boxes_xyxy, np.float32)
    n, h, w = masks.shape
    # ROIAlign-style: sample `size` points per axis at bin centers. Fully
    # batch-vectorized: the per-mask python loop was ~40% of the host-side
    # per-sample evidence cost at dataset scale (same per-element
    # arithmetic, so values are bit-identical).
    steps = (np.arange(size, dtype=np.float32) + 0.5) / size
    xs = boxes[:, 0:1] + steps[None] * (boxes[:, 2:3] - boxes[:, 0:1]) - 0.5
    ys = boxes[:, 1:2] + steps[None] * (boxes[:, 3:4] - boxes[:, 1:2]) - 0.5
    x0 = np.floor(xs).astype(np.int64)
    y0 = np.floor(ys).astype(np.int64)
    fx = xs - x0  # (n, size)
    fy = ys - y0
    idx = np.arange(n)[:, None, None]

    def take(yy, xx):
        # Zero outside the image (detectron2 ROIAlign semantics) —
        # border-clamping would replicate edge foreground across the
        # out-of-image strip of a crop that extends past the frame.
        inb = (((yy >= 0) & (yy < h))[:, :, None]
               & ((xx >= 0) & (xx < w))[:, None, :])
        yc = np.clip(yy, 0, h - 1)
        xc = np.clip(xx, 0, w - 1)
        return masks[idx, yc[:, :, None], xc[:, None, :]] * inb

    return ((1 - fy)[:, :, None] * ((1 - fx)[:, None] * take(y0, x0)
                                    + fx[:, None] * take(y0, x0 + 1))
            + fy[:, :, None] * ((1 - fx)[:, None] * take(y0 + 1, x0)
                                + fx[:, None] * take(y0 + 1, x0 + 1)))


@_partial(_jax.jit, static_argnames=("size",))
def _crop_and_resize_jax(masks, boxes, size: int):
    """jnp twin of :func:`crop_and_resize` — same ROIAlign bin-center
    arithmetic, same zero-outside-image semantics."""
    masks = masks.astype(jnp.float32)
    boxes = boxes.astype(jnp.float32)
    n, h, w = masks.shape
    steps = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    xs = boxes[:, 0:1] + steps[None] * (boxes[:, 2:3] - boxes[:, 0:1]) - 0.5
    ys = boxes[:, 1:2] + steps[None] * (boxes[:, 3:4] - boxes[:, 1:2]) - 0.5
    x0 = jnp.floor(xs).astype(jnp.int32)
    y0 = jnp.floor(ys).astype(jnp.int32)
    fx = xs - x0
    fy = ys - y0
    idx = jnp.arange(n)[:, None, None]

    def take(yy, xx):
        inb = (((yy >= 0) & (yy < h))[:, :, None]
               & ((xx >= 0) & (xx < w))[:, None, :])
        yc = jnp.clip(yy, 0, h - 1)
        xc = jnp.clip(xx, 0, w - 1)
        return masks[idx, yc[:, :, None], xc[:, None, :]] * inb

    return ((1 - fy)[:, :, None] * ((1 - fx)[:, None] * take(y0, x0)
                                    + fx[:, None] * take(y0, x0 + 1))
            + fy[:, :, None] * ((1 - fx)[:, None] * take(y0 + 1, x0)
                                + fx[:, None] * take(y0 + 1, x0 + 1)))


def crop_and_resize_dev(masks, boxes_xyxy, size: int):
    """Device-side :func:`crop_and_resize` (jitted). Returns a jax array —
    callers own the single host transfer. Used on the hot evidence path
    (gtevidence's full-frame mask upsample) where the numpy version's
    gathers were ~25% of the per-sample host cost at dataset scale; the
    exact-parity surfaces (add_target_hand_occlusions, whose torch-equality
    test pins bit-exact numpy results) keep the numpy path."""
    return _crop_and_resize_jax(jnp.asarray(masks), jnp.asarray(boxes_xyxy),
                                size)


def add_occlusions(masks: Sequence[np.ndarray], occluder_mask: np.ndarray,
                   mask_bboxes: Sequence[np.ndarray]):
    """Mark occluder pixels as -1 in ROI object masks
    (homan/lib2d/maskutils.py:16-38).

    Args:
      masks: list of (R, R) bool object crop-masks.
      occluder_mask: (B, H, W) one-hot occluder masks (e.g. hands).
      mask_bboxes: list of (4,) square xywh boxes matching each crop.
    """
    out = []
    occ = np.asarray(occluder_mask, np.float32)
    for mask, box in zip(masks, mask_bboxes):
        box_xyxy = bbox_ops.bbox_wh_to_xy(np.asarray(box, np.float32))
        occl = crop_and_resize(occ, np.tile(box_xyxy, (occ.shape[0], 1)),
                               mask.shape[0]) >= 0.5
        with_occ = np.asarray(mask, np.float32).copy()
        with_occ[occl.sum(0) > 0] = -1
        with_occ[np.asarray(mask, bool)] = 1
        out.append(with_occ)
    return out


def add_target_hand_occlusions(person_parameters: Dict,
                               object_parameters: Dict,
                               K: np.ndarray,
                               square_expand: float = 0.0,
                               rend_size: int = REND_SIZE) -> Dict:
    """Build per-hand occlusion-aware target masks + ROI intrinsics
    (homan/lib2d/maskutils.py:41-81).

    Args:
      person_parameters: {"bboxes" (B,4) xyxy, "masks" (B,H,W)}; updated
        in place with target_masks, K_roi (normalized), square_bboxes.
      object_parameters: {"full_mask" (H,W), or (B,H,W) per row}.
      K: (3, 3) pixel intrinsics of the full image, or (B, 3, 3) per row.
    """
    import jax.numpy as jnp

    person_masks = np.asarray(person_parameters["masks"], np.float32)
    tight = np.asarray(person_parameters["bboxes"], np.float32)
    b = tight.shape[0]
    square = bbox_ops.bbox_wh_to_xy(
        bbox_ops.make_bbox_square(bbox_ops.bbox_xy_to_wh(tight),
                                  bbox_expansion=square_expand))
    target = crop_and_resize(person_masks, square, rend_size)
    target = (target >= 0.5).astype(np.float32)
    obj_full = np.asarray(object_parameters["full_mask"], np.float32)
    if obj_full.ndim == 2:
        obj_full = np.tile(obj_full[None], (b, 1, 1))
    obj_crops = crop_and_resize(obj_full, square, rend_size) >= 0.5
    target[obj_crops] = -1

    K = jnp.asarray(K, jnp.float32)
    K_b = jnp.tile(K[None], (b, 1, 1)) if K.ndim == 2 else K
    K_roi = cam.get_K_crop_resize(K_b, jnp.asarray(square, jnp.float32),
                                  rend_size)
    K_roi = np.array(K_roi)  # writable copy
    K_roi[:, :2] = K_roi[:, :2] / rend_size  # normalized rendering space

    person_parameters["target_masks"] = target
    person_parameters["K_roi"] = K_roi
    person_parameters["square_bboxes"] = square
    return person_parameters
