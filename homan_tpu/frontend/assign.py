"""Greedy assignment of segmentation masks to rendered hand instances.

Equivalent of HOMan.assign_human_masks (homan/homan.py:239-296): compute IoU
between every rendered hand silhouette and every detected human mask, then
greedily match best pairs; unmatched hands get an empty mask (zero depth
-ordering loss). Host-side numpy — runs once per clip before fitting.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def assign_human_masks(person_silhouettes: np.ndarray,
                       masks_human: Optional[np.ndarray],
                       min_overlap: float = 0.5) -> np.ndarray:
    """Args:
      person_silhouettes: (N_h, H, W) rendered hand silhouettes (bool).
      masks_human: (N_m, H, W) detected human/hand masks (bool) or None.
    Returns:
      (N_h, H, W) float32: each hand's assigned mask (zeros if unmatched).
    """
    sils = np.asarray(person_silhouettes, bool)
    n_h = sils.shape[0]
    out = np.zeros(sils.shape, np.float32)
    if masks_human is None or len(masks_human) == 0:
        return out
    masks = np.asarray(masks_human, bool)
    inter = (masks[None, :] & sils[:, None]).sum((2, 3)).astype(np.float64)
    union = (masks[None, :] | sils[:, None]).sum((2, 3)).astype(np.float64)
    iou = np.where(union > 0, inter / np.maximum(union, 1), 0.0)  # (N_h, N_m)
    order = np.dstack(np.unravel_index(np.argsort(-iou.ravel()),
                                       iou.shape))[0]
    used_h, used_m = set(), set()
    for hi, mi in order:
        if hi in used_h or mi in used_m:
            continue
        if iou[hi, mi] < min_overlap:
            break
        out[hi] = masks[mi]
        used_h.add(int(hi))
        used_m.add(int(mi))
    return out


# COCO class names (homan/coco.py role): index = detectron2 class id + 1 (BG).
COCO_CLASS_NAMES = [
    "BG", "person", "bicycle", "car", "motorcycle", "airplane", "bus",
    "train", "truck", "boat", "traffic light", "fire hydrant", "stop sign",
    "parking meter", "bench", "bird", "cat", "dog", "horse", "sheep", "cow",
    "elephant", "bear", "zebra", "giraffe", "backpack", "umbrella", "handbag",
    "tie", "suitcase", "frisbee", "skis", "snowboard", "sports ball", "kite",
    "baseball bat", "baseball glove", "skateboard", "surfboard",
    "tennis racket", "bottle", "wine glass", "cup", "fork", "knife", "spoon",
    "bowl", "banana", "apple", "sandwich", "orange", "broccoli", "carrot",
    "hot dog", "pizza", "donut", "cake", "chair", "couch", "potted plant",
    "bed", "dining table", "toilet", "tv", "laptop", "mouse", "remote",
    "keyboard", "cell phone", "microwave", "oven", "toaster", "sink",
    "refrigerator", "book", "clock", "vase", "scissors", "teddy bear",
    "hair drier", "toothbrush",
]
