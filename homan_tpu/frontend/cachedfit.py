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
        hand_m = cache.masks_from_bboxes(key, None, [0]) or []
        # An empty detection mask (recorded detector miss) must NOT become
        # a degenerate [0,0,1,1] tight box: keep the dataset box instead.
        if (obj_m and "class_id" in obj_m[0]
                and np.any(obj_m[0]["full_mask"])):
            tight_obj.append(mask_to_bbox(obj_m[0]["full_mask"]))
        else:
            tight_obj.append(None)
        # Pair masks to sides by identity when tagged (see
        # evidence.get_frame_infos); positional zip only on a full set.
        if hand_m and all("hand_side" in m for m in hand_m):
            paired = [(m["hand_side"], m) for m in hand_m
                      if m.get("hand_side") in tight_hand]
        elif len(hand_m) == len(sides):
            paired = list(zip(sides, hand_m))
        else:
            paired = []
        for s, m in paired:
            if "class_id" in m and np.any(m["full_mask"]):
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
    # (homan/lib2d/maskutils.py:41-81 flow). ONE vectorized call over all
    # T*H interleaved rows (row i = t*H + h), with per-row object masks and
    # intrinsics — the per-row loop this replaces dispatched eager device
    # ops T*H times (~seconds per sample on a relay-attached TPU; see
    # gtevidence.py's identical pattern).
    if "masks" in person_parameters:
        obj_full = np.stack([np.asarray(obj_infos[t]["full_mask"],
                                        np.float32) for t in range(T)])
        pp = {"bboxes": person_parameters["bboxes"],
              "masks": person_parameters["masks"]}
        batched = mask_lib.add_target_hand_occlusions(
            pp, {"full_mask": np.repeat(obj_full, H, axis=0)},
            np.repeat(np.asarray(K_px, np.float32), H, axis=0),
            rend_size=rend_size)
        person_parameters["target_masks"] = np.asarray(
            batched["target_masks"])
        person_parameters["K_roi"] = np.asarray(batched["K_roi"])
    person_parameters["hand_sides"] = hand_sides

    return {
        "person_parameters": person_parameters,
        "object_parameters": object_parameters,
        "obj_verts_can": obj_verts_can,
        "obj_faces": obj_faces,
        "hand_sides": hand_sides,
    }
