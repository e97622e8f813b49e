"""Converters from reference (hassony2/homan) artifacts into homan_tpu
evidence formats.

The reference records three kinds of per-clip artifacts:
  * per-frame person_parameters dicts from FrankMocap post-processing
    (homan/mocap.py:34-113 + homan/prepare/frameinfos.py:128-160): hands
    concatenated along dim 0, torch tensors, with a "hand_side" label list;
  * per-box PointRend annotations (homan/pointrend.py:118-140):
    {bbox, class_id, full_mask, score, square_bbox, crop_mask};
  * indep_fit.pkl stage checkpoints (fit_vid_dataset.py:310-319):
    {person_parameters (per-frame list), object_parameters (per-frame list),
     obj_verts_can, obj_faces, super2d_img_path}.

These converters turn them into (a) CachedEvidence frame records replayable
through --evidence_root, and (b) a homan_tpu independent-fit payload directly
consumable by cli.fit_video.build_joint_inputs — the bridge for parity runs
against recorded reference detections.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def _np(x):
    """numpy view of a possibly-torch, possibly-device tensor."""
    if hasattr(x, "detach"):
        x = x.detach()
    if hasattr(x, "cpu"):
        x = x.cpu()
    if hasattr(x, "numpy"):
        x = x.numpy()
    return np.asarray(x)


def _norm_side(side: str) -> str:
    side = str(side)
    return side if side.endswith("_hand") else f"{side}_hand"


def convert_person_parameters(frame_params: Dict):
    """Reference per-frame person_parameters -> per-side evidence.

    Args:
      frame_params: dict with hands stacked along dim 0 (homan/mocap.py:80-97
        keys; "hand_side"/"label" is a list of side names).
    Returns:
      (estimates {side: est}, hand_masks {side: (H, W)},
       hand_bboxes {side: (4,) xyxy}) in homan_tpu provider conventions
       (HandPoseProvider contract, frontend/evidence.py).
    """
    sides_raw = frame_params.get("hand_side", frame_params.get("label"))
    if isinstance(sides_raw, str):
        sides_raw = [sides_raw]
    sides = [_norm_side(s) for s in sides_raw]
    estimates, hand_masks, hand_bboxes = {}, {}, {}
    key_map = {
        "verts": "verts", "verts2d": "verts2d",
        "rotations": "rotations", "translations": "translations",
        "mano_pca_pose": "mano_pca_pose", "mano_rot": "mano_rot",
        "mano_trans": "mano_trans", "mano_betas": "mano_betas",
        "cams": "cams",
    }
    for h, side in enumerate(sides):
        est = {}
        for ref_key, our_key in key_map.items():
            if ref_key in frame_params:
                est[our_key] = _np(frame_params[ref_key])[h].astype(
                    np.float32)
        if "translations" in est and est["translations"].ndim == 1:
            est["translations"] = est["translations"][None]
        estimates[side] = est
        if "masks" in frame_params:
            hand_masks[side] = _np(frame_params["masks"])[h]
        if "bboxes" in frame_params:
            hand_bboxes[side] = _np(frame_params["bboxes"])[h].astype(
                np.float32)
    return estimates, hand_masks, hand_bboxes


def convert_pointrend_annotations(annotations: Sequence[Dict],
                                  hand_class: int = 0) -> List[Dict]:
    """PointRend per-box dicts (homan/pointrend.py:118-140) -> CachedEvidence
    mask entries ({"full_mask", "score", "class_id"}).

    Reference hand queries run with class_idx=0 (the COCO person class,
    frameinfos.py:23-26) so hand annotations carry class_id == 0; object
    queries use the most-likely class (frameinfos.py:161-165) so object
    annotations carry that object's real COCO id. In CachedEvidence terms:
    class_id == hand_class -> hand (0), anything else -> object (-1).
    """
    out = []
    for a in annotations:
        class_id = int(_np(a["class_id"])) if "class_id" in a else hand_class
        out.append({
            "full_mask": _np(a["full_mask"]).astype(bool),
            "score": float(_np(a["score"])) if "score" in a else 1.0,
            "class_id": 0 if class_id == hand_class else -1,
        })
    return out


def record_cached_evidence(root: str, frame_key: str,
                           person_params: Optional[Dict] = None,
                           object_full_mask: Optional[np.ndarray] = None,
                           object_score: float = 1.0,
                           extra_mask_annotations: Sequence[Dict] = ()):
    """Write one frame's reference artifacts as a CachedEvidence record.

    Hand masks (from person_params["masks"]) are stored class_id=0 in side
    order; the object mask class_id=-1; any extra PointRend annotations are
    appended converted.
    """
    from homan_tpu.frontend.evidence import save_frame_evidence
    estimates, hand_masks, _ = (convert_person_parameters(person_params)
                                if person_params else ({}, {}, {}))
    masks: List[Dict] = [{"full_mask": np.asarray(m).astype(bool),
                          "score": 1.0, "class_id": 0, "hand_side": side}
                         for side, m in hand_masks.items()]
    if object_full_mask is not None:
        masks.append({"full_mask": np.asarray(object_full_mask).astype(bool),
                      "score": object_score, "class_id": -1})
    masks.extend(convert_pointrend_annotations(extra_mask_annotations))
    save_frame_evidence(root, frame_key, masks, estimates)
    return masks, estimates


def convert_indep_fit(indep: Dict) -> Dict:
    """Reference indep_fit.pkl payload -> homan_tpu independent-fit payload
    (directly consumable by cli.fit_video.build_joint_inputs; enables
    resuming a reference stage-1 checkpoint on TPU).

    The reference stores person_parameters as a per-frame list with hands
    concatenated along dim 0 (frameinfos.py:153-160) — concatenating the
    frames reproduces homan's interleaved [h1_t1, h2_t1, h1_t2, ...] layout
    (homan/homan.py:61-64) that build_joint_inputs expects.
    """
    person_frames = indep["person_parameters"]
    first = person_frames[0]
    sides_raw = first.get("hand_side", first.get("label"))
    if isinstance(sides_raw, str):
        sides_raw = [sides_raw]
    hand_sides = [_norm_side(s).replace("_hand", "") for s in sides_raw]

    keys = ["verts", "verts2d", "rotations", "translations",
            "mano_pca_pose", "mano_rot", "mano_trans", "mano_betas",
            "target_masks", "K_roi", "masks", "bboxes"]
    person_parameters = {}
    for k in keys:
        if k in first:
            person_parameters[k] = np.concatenate(
                [_np(f[k]).astype(np.float32) for f in person_frames])
    person_parameters["hand_sides"] = hand_sides

    object_parameters = []
    for o in indep["object_parameters"]:
        conv = {k: _np(o[k]).astype(np.float32)
                for k in ("rotations", "translations", "target_masks",
                          "K_roi") if k in o}
        conv["masks"] = (_np(o["masks"]).astype(np.float32)
                         if o.get("masks") is not None else
                         _np(o["full_mask"]).astype(np.float32)
                         if o.get("full_mask") is not None else None)
        if conv.get("target_masks") is not None and \
                conv["target_masks"].ndim == 2:
            conv["target_masks"] = conv["target_masks"][None]
        object_parameters.append(conv)

    obj_verts_can = _np(indep["obj_verts_can"]).astype(np.float32)
    if obj_verts_can.ndim == 3:
        obj_verts_can = obj_verts_can[0]
    obj_faces = _np(indep["obj_faces"])
    if obj_faces.ndim == 3:
        obj_faces = obj_faces[0]
    return {
        "person_parameters": person_parameters,
        "object_parameters": object_parameters,
        "obj_verts_can": obj_verts_can,
        "obj_faces": obj_faces.astype(np.int32),
        "hand_sides": hand_sides,
    }


STATE_KEYS = ("translations_object", "rotations_object", "translations_hand",
              "rotations_hand", "mano_pca_pose", "mano_rot", "mano_trans",
              "mano_betas", "int_scales_object", "int_scales_hand",
              "cams_hand")


def convert_joint_fit_state(state_dict: Dict) -> Dict[str, np.ndarray]:
    """Reference joint_fit.pt state_dict -> homan_tpu checkpoint dict.

    The reference's nn.Parameter names (homan/homan.py:66-131) match
    HomanState's fields one to one (rotations stored as rot6d (B, 3, 2));
    buffers (masks, intrinsics, mano model tables) are dropped — they are
    rebuilt from the dataset/evidence on load.
    """
    out = {}
    for k in STATE_KEYS:
        if k in state_dict:
            out[k] = _np(state_dict[k]).astype(np.float32)
    for k in ("int_scales_object", "int_scales_hand"):
        if k in out:
            out[k] = out[k].reshape(-1)[:1]
    return out
