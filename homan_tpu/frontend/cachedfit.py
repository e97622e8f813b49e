"""Stage A+B from cached detector evidence (--evidence_root path).

The production TPU flow: detectors (FrankMocap / PointRend / 100DOH) run
offline on a host GPU or another service; their outputs are recorded per
frame as CachedEvidence records (frontend.adapters converts the reference's
native artifacts). This module assembles those records into the
independent-fit payload, mirroring the reference's stage-A/B portion of
fit_vid_dataset.py:249-319 with real (non-GT) evidence.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from homan_tpu.fit import poseinit
from homan_tpu.frontend import masks as mask_lib
from homan_tpu.frontend.evidence import (CachedEvidence, get_frame_infos,
                                         stack_person_parameters)
from homan_tpu.render import RasterSettings


def frame_key(seq_idx, frame_id) -> str:
    """Naming convention for CachedEvidence records of a dataset clip."""
    return f"{seq_idx}_{int(frame_id):06d}"


def prepare_independent_fit_cached(annots: Dict, args, mano_layer,
                                   image_size: int, rend_size: int = 256,
                                   evidence_root: str = "",
                                   sample_folder: str = "/tmp") -> Dict:
    """Cached-evidence equivalent of gtevidence.prepare_independent_fit.

    Expects one CachedEvidence record per frame at
    {evidence_root}/{seq_idx}_{frame_id:06d}.pkl with hand estimates
    (FrankMocap layout via adapters.convert_person_parameters) and
    class-tagged hand/object masks.
    """
    T = len(annots["frame_idxs"])
    K_px = np.asarray(annots["camera"]["K"], np.float64)
    cache = CachedEvidence(evidence_root)
    keys = [frame_key(annots.get("seq_idx", "clip"), fid)
            for fid in annots["frame_idxs"]]

    hand_bboxes = {}
    for hand in annots["hands"]:
        box = hand.get("bbox")
        hand_bboxes[hand["label"]] = (np.asarray(box, np.float32)
                                      if box is not None else None)
    obj_bboxes = np.asarray(annots["objects"][0]["bbox"], np.float32)
    if obj_bboxes.ndim == 1:
        obj_bboxes = np.tile(obj_bboxes[None], (T, 1))

    obj = annots["objects"][0]
    obj_verts_can = np.asarray(obj["canverts3d"])
    if obj_verts_can.ndim == 3:
        obj_verts_can = obj_verts_can[0]
    obj_faces = np.asarray(obj["faces"])
    if obj_faces.ndim == 3:
        obj_faces = obj_faces[0]
    # Overlap stage-B program compiles with the cached-evidence assembly.
    poseinit.prewarm_programs(
        obj_verts_can, obj_faces, T,
        num_initializations=args.num_initializations,
        num_iterations=args.num_obj_iterations,
        rend_size=rend_size, settings=RasterSettings(image_size=rend_size),
        parallel_frames=bool(getattr(args, "stageb_parallel_frames", 0)),
        block=False)

    # Tight per-frame boxes from the cached detection masks when they are
    # class-tagged: the reference's boxes come from the detections
    # themselves (PointRend / 100DOH); dataset boxes can be coarse union
    # crops (e.g. Core50's .mat hand+object crop), which would mis-scale the
    # stage-B auto-depth init.
    from homan_tpu.frontend.gtevidence import mask_to_bbox
    sides = [h["label"] for h in annots["hands"]]
    tight_hand = {s: [] for s in sides}
    tight_obj = []
    for key in keys:
        obj_m = cache.masks_from_bboxes(key, None, [-1])
        hand_m = cache.masks_from_bboxes(key, None, [0])
        tight_obj.append(mask_to_bbox(obj_m[0]["full_mask"])
                         if obj_m and "class_id" in obj_m[0] else None)
        for s, m in zip(sides, hand_m if hand_m else []):
            if "class_id" in m:
                tight_hand[s].append(mask_to_bbox(m["full_mask"]))
    if all(b is not None for b in tight_obj):
        obj_bboxes = np.stack(tight_obj)
    for s in sides:
        if len(tight_hand[s]) == T:
            hand_bboxes[s] = np.stack(tight_hand[s])

    person_frames, obj_infos = get_frame_infos(
        images=[None] * T, hand_provider=cache, mask_provider=cache,
        hand_bboxes=hand_bboxes, obj_bboxes=obj_bboxes, camintr=K_px,
        image_size=image_size, rend_size=rend_size, frame_keys=keys)

    object_parameters = poseinit.find_optimal_poses(
        obj_verts_can, obj_faces, obj_infos,
        [K_px[t] for t in range(T)], (image_size, image_size),
        num_initializations=args.num_initializations,
        num_iterations=args.num_obj_iterations,
        parallel_frames=bool(getattr(args, "stageb_parallel_frames", 0)),
        rend_size=rend_size,
        settings=RasterSettings(image_size=rend_size),
        seed=args.seed)
    import jax.numpy as jnp
    for t in range(T):
        full = np.asarray(obj_infos[t]["full_mask"], np.float32)
        object_parameters[t]["masks"] = jnp.asarray(full)
        object_parameters[t]["full_mask"] = jnp.asarray(full)

    person_parameters = stack_person_parameters(person_frames)
    hand_sides = [s.replace("_hand", "")
                  for s in person_parameters.pop("hand_sides")]
    H = len(hand_sides)

    # Occlusion-aware hand targets + per-hand ROI intrinsics
    # (homan/lib2d/maskutils.py:41-81 flow, per interleaved row)
    if "masks" in person_parameters:
        targets, K_rois = [], []
        bboxes_xyxy = person_parameters["bboxes"]
        for i in range(T * H):
            t = i // H
            single = mask_lib.add_target_hand_occlusions(
                {"bboxes": bboxes_xyxy[i:i + 1],
                 "masks": person_parameters["masks"][i:i + 1]},
                {"full_mask": np.asarray(obj_infos[t]["full_mask"],
                                         np.float32)},
                K_px[t], rend_size=rend_size)
            targets.append(single["target_masks"][0])
            K_rois.append(single["K_roi"][0])
        person_parameters["target_masks"] = np.stack(targets)
        person_parameters["K_roi"] = np.stack(K_rois)
    person_parameters["hand_sides"] = hand_sides

    return {
        "person_parameters": person_parameters,
        "object_parameters": object_parameters,
        "obj_verts_can": obj_verts_can,
        "obj_faces": obj_faces,
        "hand_sides": hand_sides,
    }
