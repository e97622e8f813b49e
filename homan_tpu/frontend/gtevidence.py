"""Stage A+B evidence preparation from dataset ground truth (--gt_masks path).

Equivalent of homan/prepare/gtmasks.py:14-123 + the stage-A/B portion of
fit_vid_dataset.py:249-319 for the GT ablation: object and hand masks are
rendered from the dataset's GT meshes with our rasterizer, hand keypoint
evidence comes from GT projections, MANO initialization from GT pose (or
rest pose when the dataset has none), and the object pose candidates run
through the standard stage-B search.
"""
from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp

from homan_tpu.core import mano as mano_lib
from homan_tpu.fit import poseinit
from homan_tpu.frontend import masks as mask_lib
from homan_tpu.render import RasterSettings, rasterize_soft
from homan_tpu.render.rasterizer import MeshTopology


def render_full_mask(verts: np.ndarray, topo: MeshTopology, K_px: np.ndarray,
                     image_size: int) -> np.ndarray:
    """(B, S, S) bool full-image masks from GT geometry
    (homan/prepare/gtmasks.py role)."""
    Kn = np.asarray(K_px, np.float64).copy()
    Kn[:, :2] = Kn[:, :2] / image_size
    settings = RasterSettings(image_size=min(image_size, 256),
                              edges_per_tile=128)
    sil = rasterize_soft(jnp.asarray(verts, jnp.float32), topo,
                         jnp.asarray(Kn, jnp.float32), settings)["sil"]
    masks = sil > 0.5  # device
    if settings.image_size != image_size:
        S0 = settings.image_size
        full = jnp.tile(jnp.asarray([[0, 0, S0, S0]], jnp.float32),
                        (masks.shape[0], 1))
        masks = mask_lib.crop_and_resize_dev(
            masks.astype(jnp.float32), full, image_size) >= 0.5
    return np.asarray(masks)


def render_instance_masks(verts_list, faces_list, K_px: np.ndarray,
                          image_size: int):
    """Per-instance VISIBILITY masks from ONE z-buffered combined render —
    the reference's render_gt_masks semantics (homan/prepare/gtmasks.py:
    27-86: all hand+object meshes in a single scene, one-hot instance
    colors packed into the RGB channels, so instances occlude each other
    exactly like real detections would). Rendering each mesh separately
    (the pre-round-5 behavior) marks hand pixels BEHIND the object as hand
    evidence and vice versa, which flips the {-1,0,1} target encodings
    wherever hand and object overlap — found by the full-driver parity
    test (hand-target agreement 0.37 vs the reference).

    Args:
      verts_list: list of (B, Vi, 3) per-instance camera-space verts.
      faces_list: list of (Fi, 3) per-instance faces.
    Returns:
      list of (B, H, W) bool visibility masks, one per instance.
    """
    from homan_tpu.core.meshes import merge_meshes
    from homan_tpu.render import rasterize_hard

    n = len(verts_list)
    assert 1 <= n <= 3, "instance masks ride the RGB channels (<= 3), like " \
        "the reference's one-hot textures (gtmasks.py:40-68)"
    B = verts_list[0].shape[0]
    merged_v, merged_f = merge_meshes(
        [(np.zeros((v.shape[1], 3), np.float32), f)
         for v, f in zip(verts_list, faces_list)])
    verts = np.concatenate([np.asarray(v, np.float32) for v in verts_list],
                           axis=1)
    colors = np.zeros((merged_f.shape[0], 3), np.float32)
    off = 0
    for i, f in enumerate(faces_list):
        colors[off:off + len(np.asarray(f)), i] = 1.0
        off += len(np.asarray(f))
    topo = MeshTopology.from_faces(merged_f)

    Kn = np.asarray(K_px, np.float64).copy()
    Kn[:, :2] = Kn[:, :2] / image_size
    settings = RasterSettings(image_size=min(image_size, 256),
                              edges_per_tile=128)
    out = rasterize_hard(jnp.asarray(verts), topo,
                         jnp.asarray(Kn, jnp.float32), jnp.asarray(colors),
                         settings, background=0.0, ambient=1.0, diffuse=0.0,
                         specular=0.0, shading="flat")
    # Threshold + full-frame upsample ON DEVICE, one bool transfer: the old
    # host path (f32 RGB transfer + numpy ROIAlign upsample per instance)
    # was ~25% of the per-sample evidence cost at dataset scale (cProfile,
    # NOTES_ROUND6 perf section).
    rgb = out["rgb"]  # (B, S0, S0, 3) device
    S0 = settings.image_size
    chans = jnp.reshape(jnp.transpose(rgb[..., :n] > 0.5, (3, 0, 1, 2)),
                        (n * B, S0, S0))
    if S0 != image_size:
        full = jnp.tile(jnp.asarray([[0, 0, S0, S0]], jnp.float32),
                        (n * B, 1))
        chans = mask_lib.crop_and_resize_dev(
            chans.astype(jnp.float32), full, image_size) >= 0.5
    m_all = np.asarray(chans).reshape(n, B, image_size, image_size)
    return [m_all[i] for i in range(n)]


def procrustes_rigid(src: np.ndarray, dst: np.ndarray):
    """Best-fit rotation/translation dst ~ src @ R + t (row-vector R, the
    model convention). The FrankMocap global-pose initialization of the
    reference's evidence (mocap.py:64-68) is replaced in the GT path by this
    exact alignment of the rest hand to the GT vertices."""
    src_c = src - src.mean(0)
    dst_c = dst - dst.mean(0)
    H = src_c.T @ dst_c
    U, _, Vt = np.linalg.svd(H)
    d = np.sign(np.linalg.det(U @ Vt))
    R = U @ np.diag([1.0, 1.0, d]) @ Vt  # src-row @ R ~ dst-row
    t = dst.mean(0) - src.mean(0) @ R
    return R.astype(np.float32), t.astype(np.float32)


def mask_to_bbox(mask: np.ndarray) -> np.ndarray:
    ys, xs = np.nonzero(mask)
    if len(xs) == 0:
        return np.array([0.0, 0.0, 1.0, 1.0], np.float32)
    return np.array([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1],
                    np.float32)


def prepare_independent_fit(annots: Dict, args, dataset, mano_layer,
                            image_size: int, rend_size: int = 256,
                            sample_folder: str = "/tmp") -> Dict:
    """Build the indep_fit payload (person/object parameters) from GT."""
    T = len(annots["frame_idxs"])
    K_px = np.asarray(annots["camera"]["K"], np.float64)
    hand_sides = []
    hand_infos = []
    for hand in annots["hands"]:
        hand_sides.append(hand["label"].replace("_hand", ""))
        hand_infos.append(hand)
    H = len(hand_sides)

    obj = annots["objects"][0]
    obj_verts_can = np.asarray(obj["canverts3d"])
    if obj_verts_can.ndim == 3:
        obj_verts_can = obj_verts_can[0]
    obj_faces = np.asarray(obj["faces"])
    if obj_faces.ndim == 3:
        obj_faces = obj_faces[0]
    obj_topo = MeshTopology.from_faces(obj_faces)

    # Overlap stage-B program compiles with the GT mask renders below
    # (find_optimal_poses would otherwise compile them serially).
    poseinit.prewarm_programs(
        obj_verts_can, obj_topo, T,
        num_initializations=args.num_initializations,
        num_iterations=args.num_obj_iterations,
        rend_size=rend_size, settings=RasterSettings(image_size=rend_size),
        parallel_frames=bool(getattr(args, "stageb_parallel_frames", 0)),
        block=False)

    # ---- GT masks: one combined z-buffered scene, per-instance VISIBILITY
    # (the reference's render_gt_masks semantics — see render_instance_masks;
    # hands without GT verts keep empty masks and stay out of the scene).
    hand_faces = np.asarray(mano_layer.faces("right"))
    live = [h for h in range(H)
            if np.abs(np.asarray(hand_infos[h]["verts3d"])).sum() > 0]
    scene_verts = [np.asarray(hand_infos[h]["verts3d"], np.float32)
                   for h in live]
    scene_faces = [hand_faces for _ in live]
    scene_verts.append(np.asarray(obj["verts3d"], np.float32))
    scene_faces.append(np.asarray(obj_faces))
    vis = render_instance_masks(scene_verts, scene_faces, K_px, image_size)
    obj_masks = vis[-1]
    hand_masks_all = [np.zeros_like(obj_masks) for _ in range(H)]
    for i, h in enumerate(live):
        hand_masks_all[h] = vis[i]

    # ---- Object evidence + stage-B search ---------------------------------
    from homan_tpu.frontend.evidence import build_object_mask_info
    annotations = []
    for t in range(T):
        occluders = np.stack([hm[t] for hm in hand_masks_all]) if H else None
        bbox = mask_to_bbox(obj_masks[t])
        info = build_object_mask_info(obj_masks[t], bbox, occluders,
                                      rend_size)
        annotations.append(info)
        annotations[-1]["full_mask"] = obj_masks[t].astype(np.float32)

    object_parameters = poseinit.find_optimal_poses(
        obj_verts_can, obj_topo, annotations,
        [K_px[t] for t in range(T)], (image_size, image_size),
        num_initializations=args.num_initializations,
        num_iterations=args.num_obj_iterations,
        # poseinit's TPU-tuned defaults apply: successive halving to the
        # best quarter + half-res refinement with full-res rescoring
        # (measured IoU-neutral, see find_optimal_poses docstring).
        parallel_frames=bool(getattr(args, "stageb_parallel_frames", 0)),
        rend_size=rend_size,
        settings=RasterSettings(image_size=rend_size),
        seed=args.seed)
    for t in range(T):
        object_parameters[t]["masks"] = jnp.asarray(
            obj_masks[t], jnp.float32)
        object_parameters[t]["full_mask"] = jnp.asarray(
            obj_masks[t], jnp.float32)

    # ---- Hand evidence -----------------------------------------------------
    rows = {"verts": [], "verts2d": [], "rotations": [], "translations": [],
            "mano_pca_pose": [], "mano_rot": [], "mano_trans": [],
            "mano_betas": [], "target_masks": [], "K_roi": [], "masks": []}
    # Per-side rest pose (loop invariant); jitted forward — eager per-row
    # dispatch to a remote accelerator costs seconds per call.
    rest_by_side = {
        side: np.asarray(mano_lib.mano_forward_jit(
            mano_layer.params[side], jnp.zeros(10), jnp.zeros(3),
            jnp.zeros(45))["verts"])
        for side in set(hand_sides)}
    for t in range(T):
        for h, hand in enumerate(hand_infos):
            side = hand_sides[h]
            hv = np.asarray(hand["verts3d"][t], np.float32)
            if np.abs(hv).sum() == 0:  # no GT: rest-pose init at 0.6m
                hv = rest_by_side[side] + np.array([0, 0, 0.6], np.float32)
            # numpy projection (host math; no device round trip)
            proj = hv @ np.asarray(K_px[t], np.float32).T
            uv = proj[:, :2] / np.maximum(proj[:, 2:], 1e-9)
            # MANO init: zero articulation, global rotation/translation from
            # Procrustes alignment of the rest hand to the GT vertices (the
            # reference's FrankMocap init role); articulation is recovered by
            # the joint fit from keypoint/silhouette evidence.
            R_init, t_init = procrustes_rigid(rest_by_side[side], hv)
            mano_trans = hv.mean(0) * 0  # local frame at origin
            # verts_hand_og must be LOCAL-frame (the reference stores
            # FrankMocap's hand-frame verts and composes verts_og @ R + t,
            # homan/homan.py:357-378); storing the posed GT verts here
            # would double-apply (R_init, t_init) at initialization when
            # optimize_mano=0. The exact local twin of the GT verts keeps
            # any GT articulation: (hv - t) @ R^T inverts the row-vector
            # transform, so init renders land exactly on the GT masks.
            rows["verts"].append((hv - t_init) @ R_init.T)
            rows["verts2d"].append(uv.astype(np.float32))
            rows["rotations"].append(R_init)
            rows["translations"].append(t_init[None])
            rows["mano_pca_pose"].append(
                np.zeros(16, np.float32))
            rows["mano_rot"].append(np.zeros(3, np.float32))
            rows["mano_trans"].append(mano_trans.astype(np.float32))
            rows["mano_betas"].append(np.zeros(10, np.float32))
            rows["masks"].append(hand_masks_all[h][t].astype(np.float32))

    person_parameters = {k: np.stack(v) for k, v in rows.items()
                         if k not in ("target_masks", "K_roi") and len(v)}

    # ---- Occlusion-aware hand targets (maskutils.add_target_hand_occlusions)
    # Hand ROI boxes: the reference driver squares the DATASET's GT hand
    # boxes with a 0.1 expansion before any evidence flows
    # (fit_vid_dataset.py:213-226) and those squared boxes become
    # person_parameters["bboxes"], hence the hand K_roi/target crops. Use
    # the same convention when the dataset provides hand boxes; fall back
    # to the rendered-mask tight box (hands without GT never have one).
    from homan_tpu.core import bbox as bbox_ops
    bboxes = []
    for t in range(T):
        for h in range(H):
            hb = hand_infos[h].get("bbox")
            if hb is not None and np.asarray(hb).size:
                hb = np.asarray(hb, np.float32)
                box_t = hb[t] if hb.ndim == 2 else hb
                sq = bbox_ops.make_bbox_square(
                    bbox_ops.bbox_xy_to_wh(box_t), bbox_expansion=0.1)
                bboxes.append(np.asarray(
                    bbox_ops.bbox_wh_to_xy(np.clip(sq, 0, None)),
                    np.float32))
            else:
                bboxes.append(mask_to_bbox(hand_masks_all[h][t]))
    pp = {"bboxes": np.stack(bboxes), "masks": person_parameters["masks"]}
    # One vectorized call over all T*H rows, with per-row object masks and
    # intrinsics (row order matches the interleaved layout: i = t*H + h).
    obj_full_per_hand = np.repeat(obj_masks.astype(np.float32), H, axis=0)
    K_per_row = np.repeat(np.asarray(K_px, np.float32), H, axis=0)
    batched = mask_lib.add_target_hand_occlusions(
        pp, {"full_mask": obj_full_per_hand}, K_per_row,
        rend_size=rend_size)
    person_parameters["target_masks"] = batched["target_masks"]
    person_parameters["K_roi"] = batched["K_roi"]
    person_parameters["bboxes"] = pp["bboxes"]

    return {
        "person_parameters": person_parameters,
        "object_parameters": object_parameters,
        "obj_verts_can": obj_verts_can,
        "obj_faces": obj_faces,
        "hand_sides": hand_sides,
    }
