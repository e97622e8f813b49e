"""Per-frame 2D/3D evidence assembly with pluggable detector backends.

TPU-native re-design of homan/prepare/frameinfos.py + homan/mocap.py +
homan/pointrend.py: the pretrained host-side networks (FrankMocap hand
regressor, PointRend segmenter, 100DOH detector) become *evidence providers*
behind small protocols, with three interchangeable implementations:

  * CachedEvidence      — replay detections recorded to disk (the production
                          path on TPU pods: detectors run offline/elsewhere);
  * callables the user supplies (torch models on a host GPU, an ONNX runtime,
    a service) matching the same signatures;
  * gt-synthesis        — tests/benchmarks (homan_tpu.frontend.gtsynth).

The assembled per-frame outputs keep the reference's dict contracts
(person_parameters / obj_mask_infos) so the fitting stages are agnostic to
where the evidence came from.
"""
from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Dict, List, Optional, Protocol, Sequence

import numpy as np

from homan_tpu.core import bbox as bbox_ops
from homan_tpu.frontend import masks as mask_lib

REND_SIZE = mask_lib.REND_SIZE
BBOX_EXPANSION_FACTOR = 0.3  # homan/constants.py:32


class MaskProvider(Protocol):
    """Instance masks for given boxes (PointRend contract,
    homan/pointrend.py:56-140)."""

    def masks_from_bboxes(self, image: np.ndarray, boxes_xyxy: np.ndarray,
                          class_ids: Sequence[int]) -> List[Dict]:
        """Returns per box: {"full_mask" (H, W) bool, "score" float}."""
        ...


class HandPoseProvider(Protocol):
    """MANO estimates for hand crops (FrankMocap contract,
    homan/mocap.py:34-113)."""

    def regress(self, image: np.ndarray, hand_bboxes: Dict[str, np.ndarray]
                ) -> Dict[str, Dict]:
        """Returns per side: {"verts" (778,3), "verts2d" (778,2),
        "mano_pca_pose" (P,), "mano_rot" (3,), "mano_betas" (10,),
        "mano_trans" (3,), "rotations" (3,3), "translations" (1,3),
        "cams" (3,)}."""
        ...


@dataclasses.dataclass
class CachedEvidence:
    """Replays per-frame evidence recorded by `save_frame_evidence`.

    Mask queries dispatch on class: entries recorded with "class_id" == -1
    answer object queries (class_ids == [-1]); every other entry answers
    hand queries, in the order they were recorded (which must match the
    clip's hand-side order). Entries without "class_id" are returned for
    every query (legacy caches).
    """
    root: str
    _memo: Dict = dataclasses.field(default_factory=dict, repr=False)

    def _load(self, frame_key: str) -> Dict:
        # Each frame record is queried ~5x per clip assembly (tight boxes:
        # object + hand; get_frame_infos: regress + hand masks + object
        # mask) — memoize the unpickle. Bounded FIFO: records carry
        # full-resolution masks.
        if frame_key not in self._memo:
            if len(self._memo) >= 128:
                self._memo.pop(next(iter(self._memo)))
            with open(os.path.join(self.root, f"{frame_key}.pkl"),
                      "rb") as f:
                self._memo[frame_key] = pickle.load(f)
        return self._memo[frame_key]

    def masks_from_bboxes(self, frame_key, boxes_xyxy, class_ids):
        masks = self._load(frame_key)["masks"]
        if not masks or "class_id" not in masks[0]:
            return masks
        want_object = bool(class_ids) and class_ids[0] == -1
        return [m for m in masks if (m["class_id"] == -1) == want_object]

    def regress(self, frame_key, hand_bboxes):
        return self._load(frame_key)["hands"]


def save_frame_evidence(root: str, frame_key: str, masks: List[Dict],
                        hands: Dict[str, Dict]):
    """Record one frame's evidence. `masks` entries should carry
    "class_id" (-1 = object, 0 = hand) so replay can split the queries."""
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, f"{frame_key}.pkl"), "wb") as f:
        pickle.dump({"masks": masks, "hands": hands}, f)


def square_bbox_with_expansion(bbox_xyxy: np.ndarray,
                               expansion: float = BBOX_EXPANSION_FACTOR
                               ) -> np.ndarray:
    """Square xywh crop box around a detection (homan/pointrend.py:129-133)."""
    return bbox_ops.make_bbox_square(bbox_ops.bbox_xy_to_wh(bbox_xyxy),
                                     bbox_expansion=expansion)


def build_object_mask_info(full_mask: np.ndarray, bbox_xyxy: np.ndarray,
                           occluder_masks: Optional[np.ndarray],
                           rend_size: int = REND_SIZE) -> Dict:
    """Object evidence for one frame: crop mask + occlusion-aware target
    (homan/prepare/frameinfos.py:161-177).

    Args:
      full_mask: (H, W) object instance mask.
      bbox_xyxy: (4,) tight object box.
      occluder_masks: (N, H, W) hand masks occluding the object (or None).
    Returns dict with bbox (xywh), square_bbox (xywh), full_mask,
      crop_mask (R, R), target_crop_mask in {-1, 0, 1}.
    """
    full_mask = np.asarray(full_mask, np.float32)
    bbox_wh = bbox_ops.bbox_xy_to_wh(np.asarray(bbox_xyxy, np.float32))
    square = square_bbox_with_expansion(np.asarray(bbox_xyxy, np.float32))
    square_xyxy = bbox_ops.bbox_wh_to_xy(square)
    crop = mask_lib.crop_and_resize(full_mask[None], square_xyxy[None],
                                    rend_size)[0] >= 0.5
    if occluder_masks is not None and len(occluder_masks):
        target = mask_lib.add_occlusions(
            [crop.astype(np.float32)], np.asarray(occluder_masks, np.float32),
            [square])[0]
    else:
        target = crop.astype(np.float32)
    return {
        "bbox": bbox_wh,
        "square_bbox": square,
        "full_mask": full_mask,
        "crop_mask": crop,
        "target_crop_mask": target,
    }


def process_hand_estimates(estimates: Dict[str, Dict],
                           hand_masks: Dict[str, np.ndarray],
                           hand_bboxes: Dict[str, np.ndarray]) -> List[Dict]:
    """Assemble person_parameters for one frame in the reference layout
    (homan/mocap.py:80-113): one entry per present hand side, LEFT before
    RIGHT — the reference's fixed processing order (frameinfos.py:128-152).
    A per-frame bbox sort would make the interleaved hand layout unstable
    across frames whenever the hands cross."""
    # A side needs BOTH an estimate and a detection box: cached evidence may
    # record more hands than the current clip tracks (e.g. an EPIC clip
    # whose left-hand track is missing) — such sides are skipped, like the
    # reference only processes hands with boxes (frameinfos.py:110-159).
    sides = [s for s in ("left_hand", "right_hand")
             if s in estimates and hand_bboxes.get(s) is not None]
    out = []
    for side in sides:
        est = dict(estimates[side])
        est["hand_side"] = side.replace("_hand", "")
        est["bboxes"] = np.asarray(hand_bboxes[side], np.float32)
        if side in hand_masks and hand_masks[side] is not None:
            est["masks"] = np.asarray(hand_masks[side], np.float32)
        out.append(est)
    return out


def process_body_estimates(body_estimates: Optional[List[Dict]],
                           bboxes_xyxy: np.ndarray,
                           image_size: int = 640,
                           masks: Optional[np.ndarray] = None) -> Dict:
    """Body-mocap variant of the evidence assembly (homan/mocap.py:116-179).

    Rescales each person's weak-perspective camera from its 224-crop frame
    to the detection box, sorts people left to right by bbox x (the
    reference's debugging convention), and resizes person masks to the
    square image frame for the ordinal-depth loss.

    Args:
      body_estimates: per-person dicts with pred_vertices_smpl (V, 3),
        faces (F, 3), pred_camera (3,) weak-persp in the 224 crop,
        bbox_scale_ratio (float), global_cams (3,); or None (boxes only).
      bboxes_xyxy: (N, 4).
      masks: optional (N, H, W) person bitmasks.
    Returns:
      person_parameters dict: bboxes (+ cams/local_cams/verts/faces when
      estimates are given, masks when masks are given), all sorted.
    """
    bboxes_xyxy = np.asarray(bboxes_xyxy, np.float32)
    inds = np.argsort(bboxes_xyxy[:, 0])
    out: Dict = {"bboxes": bboxes_xyxy[inds]}
    if body_estimates is not None:
        verts = np.stack([np.asarray(p["pred_vertices_smpl"], np.float32)
                          for p in body_estimates])
        faces = np.asarray(body_estimates[0]["faces"], np.int32)[None]
        max_dim = np.max(bbox_ops.bbox_xy_to_wh(bboxes_xyxy)[:, 2:], axis=1)
        local_cams, global_cams = [], []
        for b, pred in zip(max_dim, body_estimates):
            local_cam = np.asarray(pred["pred_camera"], np.float32).copy()
            scale_o2n = float(pred["bbox_scale_ratio"]) * b / 224.0
            local_cam[0] /= scale_o2n
            local_cam[1:] /= local_cam[:1]
            local_cams.append(local_cam)
            global_cams.append(np.asarray(pred["global_cams"], np.float32))
        out.update(
            cams=np.stack(global_cams)[inds],
            local_cams=np.stack(local_cams)[inds],
            verts=verts[inds],
            faces=faces,
        )
    if masks is not None:
        full = np.tile(np.asarray([[0, 0, image_size, image_size]],
                                  np.float32), (len(bboxes_xyxy), 1))
        resized = mask_lib.crop_and_resize(
            np.asarray(masks, np.float32), full, image_size)
        out["masks"] = resized[inds]
    return out


def get_frame_infos(images: Sequence[np.ndarray],
                    hand_provider,
                    mask_provider,
                    hand_bboxes: Dict[str, Optional[np.ndarray]],
                    obj_bboxes: np.ndarray,
                    camintr: np.ndarray,
                    image_size: int = 640,
                    rend_size: int = REND_SIZE,
                    frame_keys: Optional[Sequence[str]] = None):
    """Collect per-frame evidence for a clip (homan/prepare/frameinfos.py:37-84).

    Args:
      images: frame_nb RGB frames (resized square).
      hand_provider / mask_provider: evidence providers (protocols above).
        CachedEvidence instances receive frame_keys instead of images.
      hand_bboxes: side -> (4,) square xywh boxes, or (frame_nb, 4) per-frame
        boxes (or None when absent).
      obj_bboxes: (frame_nb, 4) xyxy object boxes.
      camintr: (frame_nb, 3, 3) pixel intrinsics.
    Returns:
      (person_parameters_per_frame, obj_mask_infos_per_frame)
    """
    cached = isinstance(hand_provider, CachedEvidence)
    person_params_frames = []
    obj_infos_frames = []

    def frame_box(b, i):
        b = np.asarray(b, np.float32)
        return b[i] if b.ndim == 2 else b

    for i, image in enumerate(images):
        key = frame_keys[i] if frame_keys is not None else str(i)
        handle = key if cached else image

        present = {s: frame_box(b, i) for s, b in hand_bboxes.items()
                   if b is not None}
        hand_estimates = hand_provider.regress(handle, present)

        # Hand masks (for occlusion-aware object targets + depth ordering)
        hand_boxes_xyxy = np.stack(
            [bbox_ops.bbox_wh_to_xy(np.asarray(b, np.float32))
             for b in present.values()]) if present else np.zeros((0, 4))
        hand_mask_dicts = mask_provider.masks_from_bboxes(
            handle, hand_boxes_xyxy, [0] * len(present)) if present else []
        # Pair masks to sides by identity when the provider tags them
        # ("hand_side"); fall back to positional order ONLY when the counts
        # match — a short list zipped positionally would silently hand the
        # right hand's mask to the left side.
        if hand_mask_dicts and all("hand_side" in m
                                   for m in hand_mask_dicts):
            hand_masks = {m["hand_side"]: m["full_mask"]
                          for m in hand_mask_dicts
                          if m["hand_side"] in present}
        elif len(hand_mask_dicts) == len(present):
            hand_masks = {s: m["full_mask"] for s, m in
                          zip(present.keys(), hand_mask_dicts)}
        else:
            import logging
            logging.getLogger(__name__).warning(
                "frame %s: %d hand masks for %d tracked hands and no "
                "hand_side tags — masks skipped for this frame",
                key, len(hand_mask_dicts), len(present))
            hand_masks = {}
        # Keep per-frame mask shapes consistent for stacking: a side whose
        # mask is missing this frame gets an all-zero (no-evidence) mask.
        if hand_masks and len(hand_masks) < len(present):
            shape = next(iter(hand_masks.values())).shape
            for s in present:
                hand_masks.setdefault(s, np.zeros(shape, bool))

        obj_mask_dicts = mask_provider.masks_from_bboxes(
            handle, np.asarray(obj_bboxes[i])[None], [-1])
        occluders = (np.stack([np.asarray(m, np.float32)
                               for m in hand_masks.values()])
                     if hand_masks else None)
        obj_info = build_object_mask_info(
            obj_mask_dicts[0]["full_mask"], obj_bboxes[i], occluders,
            rend_size)
        obj_infos_frames.append(obj_info)
        person_params_frames.append(process_hand_estimates(
            hand_estimates, hand_masks, present))
    return person_params_frames, obj_infos_frames


def stack_person_parameters(frames: Sequence[List[Dict]]) -> List[Dict]:
    """Per-frame hand lists -> per-hand stacked params in the interleaved
    [h1_t1, h2_t1, h1_t2, ...] layout consumed by the joint fit
    (homan/jointopt.py:55-91)."""
    hand_nb = len(frames[0])
    out = []
    keys = [k for k, v in frames[0][0].items()
            if isinstance(v, np.ndarray)]
    rows = []
    for frame in frames:
        assert len(frame) == hand_nb, "hand count must be constant in a clip"
        rows.extend(frame)
    stacked = {k: np.stack([np.asarray(r[k], np.float32) for r in rows])
               for k in keys}
    stacked["hand_sides"] = [frames[0][h]["hand_side"]
                             for h in range(hand_nb)]
    out.append(stacked)
    return out[0]
