"""Fit hand+object pose over dataset clips — the main driver.

Flag-compatible equivalent of the reference's fit_vid_dataset.py (same lw_*
loss-weight convention, staging, checkpoints and result layout):

  stage A: collect per-frame 2D evidence (cached detections or GT synthesis);
  stage B: object pose candidate search per frame (homan_tpu.fit.poseinit);
  stage C: joint hand+object optimization (homan_tpu.fit.joint);
  outputs: indep_fit.pkl, joint_fit.npz, results.pkl, overlay videos.

Detector networks are not bundled: evidence comes from --evidence_root
(cached detections, see homan_tpu.frontend.evidence) or --gt_masks 1
(render GT meshes as evidence, the reference's ablation path).

Run e.g.:
  python -m homan_tpu.cli.fit_video --dataset ho3d --split val \
      --gt_masks 1 --frame_nb 10 --num_initializations 200
"""
from __future__ import annotations

import argparse
import logging
import os
import pickle
from collections import defaultdict

import numpy as np

logger = logging.getLogger("homan_tpu.fit_video")


def get_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Optimize object meshes w.r.t. hand.")
    parser.add_argument("--dataset", default="ho3d",
                        choices=["ho3d", "epic", "core50"])
    parser.add_argument("--split", default="val",
                        choices=["train", "val", "trainval", "test"])
    parser.add_argument("--chunk_step", default=4, type=int)
    parser.add_argument("--frame_nb", default=10, type=int)
    parser.add_argument("--data_step", default=100, type=int)
    parser.add_argument("--data_offset", default=0, type=int)
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--box_mode", choices=["gt", "track"], default="gt")
    parser.add_argument("--output_dir", default="output")
    parser.add_argument("--num_obj_iterations", default=50, type=int)
    parser.add_argument("--num_joint_iterations", default=201, type=int)
    parser.add_argument("--num_initializations", default=500, type=int)
    parser.add_argument("--mesh_path", type=str)
    parser.add_argument("--result_root", default="results/tmp")
    parser.add_argument("--resume")
    parser.add_argument("--resume_indep", action="store_true")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--viz_step", default=20, type=int)
    parser.add_argument("--save_indep", action="store_true")
    parser.add_argument("--only_missing", choices=[0, 1], type=int)
    parser.add_argument("--gt_masks", choices=[0, 1], default=0, type=int)
    parser.add_argument("--evidence_root", type=str,
                        help="cached detections (frontend.evidence format)")
    parser.add_argument("--hand_checkpoint",
                        default="extra_data/hand_module/pretrained_weights/"
                                "pose_shape_best.pth",
                        help="accepted for reference CLI compatibility "
                             "(fit_vid_dataset.py:56-60): the FrankMocap "
                             "checkpoint for a LIVE hand regressor; this "
                             "pipeline consumes recorded detections "
                             "(--evidence_root) or GT synthesis "
                             "(--gt_masks) instead")
    parser.add_argument("--smpl_path", default="extra_data/smpl",
                        help="accepted for reference CLI compatibility "
                             "(fit_vid_dataset.py:61-64); see "
                             "--hand_checkpoint")
    parser.add_argument("--optimize_mano", choices=[0, 1], default=1, type=int)
    parser.add_argument("--optimize_mano_beta", choices=[0, 1], default=1,
                        type=int)
    parser.add_argument("--optimize_object_scale", choices=[0, 1], default=0,
                        type=int)
    parser.add_argument("--hand_proj_mode", default="persp",
                        choices=["ortho", "persp"])
    parser.add_argument("--sdf_mode", default="direct",
                        choices=["grid", "direct"],
                        help="collision/contact SDF: 'direct' (default) = "
                             "exact interior SDF at sampled verts (~3x "
                             "faster config-3 steps on TPU, identical "
                             "converged IoU), 'grid' = strict reference "
                             "voxelize+trilinear semantics")
    parser.add_argument("--collision_mode", default="sdf",
                        choices=["sdf", "tritri"],
                        help="collision backend: 'sdf' (reference default "
                             "branch) or 'tritri' (TPU-native equivalent "
                             "of the reference's BVH mesh_intersection "
                             "branch: exact triangle-intersection pairs, "
                             "point-to-plane penetration)")
    parser.add_argument("--rend_size", default=256, type=int)
    parser.add_argument("--stageb_parallel_frames", choices=[0, 1], default=0,
                        type=int,
                        help="batch stage-B frames 1..T-1 in one program "
                             "(init from frame 0 instead of chaining)")
    parser.add_argument("--frames_sharded", choices=[0, 1], default=0,
                        type=int,
                        help="shard the clip's frame axis over all devices "
                             "for the stage-C joint fit (sequence "
                             "parallelism; needs frame_nb %% device_count "
                             "== 0, falls back to unsharded otherwise)")
    parser.add_argument("--prewarm", choices=[0, 1], default=1, type=int,
                        help="compile the stage-C joint-fit program in a "
                             "background thread while stages A+B run "
                             "(XLA compiles overlap; hides the joint "
                             "compile on the first sample)")
    parser.add_argument("--mano_root", default="extra_data/mano")
    parser.add_argument("--closed_fmano_path", type=str,
                        help="closed-fist MANO faces npy (reference "
                             "local_data/closed_fmano.npy format); when "
                             "absent the wrist ring is closed by fan "
                             "triangulation (identical topology)")
    # Loss weights: the lw_ convention of fit_vid_dataset.py:91-158
    parser.add_argument("--lw_smooth", type=float, default=2000)
    parser.add_argument("--lw_v2d_hand", type=float, default=50)
    parser.add_argument("--lw_inter", type=float, default=1)
    parser.add_argument("--lw_contact", type=float, default=0)
    parser.add_argument("--lw_depth", type=float, default=0)
    parser.add_argument("--lw_pca", type=float, default=0.004)
    parser.add_argument("--lw_sil_obj", type=float, default=1)
    parser.add_argument("--lw_sil_hand", type=float, default=0)
    parser.add_argument("--lw_collision", type=float, default=0)
    parser.add_argument("--lw_scale_obj", type=float, default=0.001)
    parser.add_argument("--lw_scale_hand", type=float, default=0.001)
    args = parser.parse_args(argv)
    args.lw_smooth_obj = args.lw_smooth
    args.lw_smooth_hand = args.lw_smooth
    logger.info("Calling with args: %s", args)
    return args


def build_joint_inputs(person_parameters, object_parameters, obj_verts_can,
                       obj_faces, camintr_nc, hand_sides, mano_layer,
                       image_size, rend_size, masks_shape,
                       sdf_mode="direct", collision_mode="sdf",
                       optimize_mano=True, optimize_mano_beta=True,
                       optimize_object_scale=False, hand_proj_mode="persp"):
    """person/object parameter dicts -> (state, consts, cfg)
    (homan/jointopt.py:52-124 role)."""
    import jax.numpy as jnp
    from homan_tpu.fit import model as M
    from homan_tpu.render.rasterizer import MeshTopology

    B = len(object_parameters)
    H = len(hand_sides)
    cfg = M.HomanConfig(hand_sides=tuple(hand_sides), image_size=image_size,
                        rend_size=rend_size, sdf_mode=sdf_mode,
                        collision_mode=collision_mode,
                        optimize_mano=bool(optimize_mano),
                        optimize_mano_beta=bool(optimize_mano_beta),
                        optimize_object_scale=bool(optimize_object_scale),
                        hand_proj_mode=hand_proj_mode)

    # jnp concatenation keeps stage-B outputs resident on device: np here
    # would round-trip every mask/param through the host (seconds on a
    # tunneled TPU; measured in the pipeline profile).
    obj_trans = jnp.concatenate([jnp.asarray(o["translations"])
                                 for o in object_parameters])
    obj_rots = jnp.concatenate([jnp.asarray(o["rotations"])
                                for o in object_parameters])
    obj_tar = jnp.concatenate(
        [jnp.asarray(o["target_masks"], jnp.float32).reshape(
            (-1,) + tuple(np.shape(o["target_masks"])[-2:]))
         for o in object_parameters])
    obj_Kroi = jnp.concatenate([jnp.asarray(o["K_roi"])[:, 0]
                                if jnp.asarray(o["K_roi"]).ndim == 4
                                else jnp.asarray(o["K_roi"])
                                for o in object_parameters])

    p = person_parameters  # stacked dict (frontend.evidence layout)
    state = M.init_state(
        cfg,
        translations_object=obj_trans,
        rotations_object=obj_rots,
        translations_hand=p["translations"].reshape(B * H, 1, 3),
        rotations_hand=p["rotations"],
        mano_pca_pose=p["mano_pca_pose"],
        mano_rot=p["mano_rot"],
        mano_trans=p["mano_trans"],
        mano_betas=p["mano_betas"],
    )
    obj_topo = MeshTopology.from_faces(obj_faces)
    hand_topo = MeshTopology.from_faces(
        np.asarray(mano_layer.faces("right")))
    hand_tar = p["target_masks"]
    consts = M.HomanConsts(
        verts_object_og=jnp.asarray(obj_verts_can, jnp.float32),
        faces_object=obj_topo,
        verts_hand_og=jnp.asarray(p["verts"], jnp.float32),
        faces_hand=hand_topo,
        ref_verts2d_hand=jnp.asarray(p["verts2d"], jnp.float32),
        ref_mask_object=jnp.asarray(obj_tar > 0, jnp.float32),
        keep_mask_object=jnp.asarray(obj_tar >= 0, jnp.float32),
        ref_mask_hand=jnp.asarray(hand_tar > 0, jnp.float32),
        keep_mask_hand=jnp.asarray(hand_tar >= 0, jnp.float32),
        camintr_rois_object=jnp.asarray(obj_Kroi, jnp.float32),
        camintr_rois_hand=jnp.asarray(p["K_roi"], jnp.float32),
        camintr=jnp.asarray(camintr_nc, jnp.float32),
        mano_params_by_side={s: mano_layer.params[s] for s in hand_sides},
        masks_object=jnp.stack(
            [jnp.asarray(o["masks"], jnp.float32)
             if o.get("masks") is not None
             else jnp.zeros(masks_shape, jnp.float32)
             for o in object_parameters]),
        masks_hand=jnp.asarray(
            p.get("masks", np.zeros((B * H,) + masks_shape, np.float32)),
            jnp.float32),
    )
    return state, consts, cfg


def _frames_shard_devices(frame_nb: int) -> int:
    """Largest device count that divides the clip length (whole frames per
    device); 1 = sequence parallelism not applicable."""
    import jax
    ndev = len(jax.devices())
    return max(d for d in range(1, ndev + 1) if frame_nb % d == 0)


def _spawn_joint_prewarm(annots, args, mano_layer, image_size, loss_weights,
                         closed_hand_faces):
    """Compile stage C's programs in a daemon thread while stages A+B run.

    The joint-fit program is keyed only on SHAPES (frame_nb, mesh topology,
    rend_size, loss weights, iteration chunks), all known before stage B
    produces its values — so a dummy-valued run through the same
    build_joint_inputs + joint.prewarm path populates the executable cache
    concurrently (XLA compiles overlap ~2x on the axon relay).

    Honors HOMAN_TPU_DISABLE_PREWARM=1 (the same off-switch as
    poseinit.prewarm_programs) and returns None when disabled."""
    import os
    import threading

    if os.environ.get("HOMAN_TPU_DISABLE_PREWARM") == "1":
        return None

    def job():
        try:
            from homan_tpu.fit import joint
            T = len(annots["frame_idxs"])
            hand_sides = [h["label"].replace("_hand", "")
                          for h in annots["hands"]] or ["right"]
            H = len(hand_sides)
            obj = annots["objects"][0]
            overts = np.asarray(obj["canverts3d"], np.float32)
            if overts.ndim == 3:
                overts = overts[0]
            ofaces = np.asarray(obj["faces"])
            if ofaces.ndim == 3:
                ofaces = ofaces[0]
            V = int(mano_layer.params["right"]["v_template"].shape[0])
            R = args.rend_size
            BH = T * H
            eye = np.eye(3, dtype=np.float32)
            person = {
                "translations": np.zeros((BH, 1, 3), np.float32),
                "rotations": np.tile(eye, (BH, 1, 1)),
                "mano_pca_pose": np.zeros((BH, 16), np.float32),
                "mano_rot": np.zeros((BH, 3), np.float32),
                "mano_trans": np.zeros((BH, 3), np.float32),
                "mano_betas": np.zeros((BH, 10), np.float32),
                "verts": np.zeros((BH, V, 3), np.float32),
                "verts2d": np.zeros((BH, V, 2), np.float32),
                "target_masks": np.zeros((BH, R, R), np.float32),
                "K_roi": np.tile(eye, (BH, 1, 1)),
                "masks": np.zeros((BH, image_size, image_size), np.float32),
            }
            objp = [{
                "translations": np.zeros((1, 1, 3), np.float32),
                "rotations": np.tile(eye, (1, 1, 1)),
                "target_masks": np.zeros((1, R, R), np.float32),
                "K_roi": np.tile(eye, (1, 1, 1)),
                "masks": None,
            } for _ in range(T)]
            camintr = np.tile(eye, (T, 1, 1))
            state, consts, cfg = build_joint_inputs(
                person, objp, overts, ofaces, camintr, hand_sides,
                mano_layer, image_size, R, (image_size, image_size),
                sdf_mode=args.sdf_mode, collision_mode=args.collision_mode,
                optimize_mano=args.optimize_mano,
                optimize_mano_beta=args.optimize_mano_beta,
                optimize_object_scale=args.optimize_object_scale,
                hand_proj_mode=args.hand_proj_mode)
            joint.prewarm(state, consts, cfg, loss_weights=loss_weights,
                          num_iterations=args.num_joint_iterations,
                          closed_hand_faces=closed_hand_faces,
                          viz_step=args.viz_step if args.viz_step else None)
        except Exception as exc:  # never break fits
            logger.debug("stage-C prewarm failed: %s", exc)

    th = threading.Thread(target=job, daemon=True, name="stageC-prewarm")
    th.start()
    return th


def main(args):
    import jax
    from homan_tpu.core import camera as cam_lib
    from homan_tpu.core.mano import ManoLayer
    from homan_tpu.data.factory import get_dataset
    from homan_tpu.eval import pointmetrics
    from homan_tpu.fit import joint, poseinit, postprocess
    from homan_tpu.fit import model as M
    from homan_tpu.frontend import gtevidence
    from homan_tpu.frontend import masks as mask_lib

    np.random.seed(args.seed)
    dataset, image_size = get_dataset(args.dataset, split=args.split,
                                      frame_nb=args.frame_nb,
                                      box_mode=args.box_mode,
                                      chunk_step=args.chunk_step,
                                      mano_root=args.mano_root)
    print(f"Processing {len(dataset)} samples")
    if os.path.exists(os.path.join(args.mano_root, "MANO_RIGHT.pkl")):
        mano_layer = ManoLayer.from_folder(args.mano_root)
    else:
        logger.warning("MANO data not found at %s: using the synthetic test "
                       "model (fits will be structurally correct only)",
                       args.mano_root)
        mano_layer = ManoLayer.synthetic(0)

    loss_weights = {k: v for k, v in vars(args).items() if k.startswith("lw_")}
    loss_weights.pop("lw_smooth", None)

    # Closed-fist hand topology for the SDF collision/contact terms
    # (homan/lossutils.py:15,43-64 loads local_data/closed_fmano.npy; we
    # derive the identical closure when no file is supplied).
    closed_hand_faces = None
    if loss_weights.get("lw_collision", 0) > 0 or \
            loss_weights.get("lw_contact", 0) > 0:
        from homan_tpu.core.meshes import load_closed_hand_faces
        path = args.closed_fmano_path
        if path and not os.path.exists(path):
            raise SystemExit(f"--closed_fmano_path not found: {path}")
        closed_hand_faces = load_closed_hand_faces(
            path, np.asarray(mano_layer.faces("right")))

    all_metrics = defaultdict(list)
    from homan_tpu.utils_profiling import StageTimers
    for sample_idx in range(args.data_offset, len(dataset), args.data_step):
        timers = StageTimers()
        sample_folder = os.path.join(args.result_root, "samples",
                                     f"{sample_idx:08d}")
        os.makedirs(sample_folder, exist_ok=True)
        check_path = os.path.join(sample_folder, "joint_fit.npz")
        if args.only_missing and os.path.exists(check_path):
            print(f"Skipping existing {check_path}")
            continue

        with timers.time("annots_fetch"):
            annots = dataset[sample_idx]
        indep_fit_path = os.path.join(sample_folder, "indep_fit.pkl")

        if args.resume:
            resume_folder = os.path.join(args.resume, "samples",
                                         f"{sample_idx:08d}")
            with open(os.path.join(resume_folder, "indep_fit.pkl"), "rb") as f:
                indep = pickle.load(f)
            state_override = None
            if not args.resume_indep:
                ck = np.load(os.path.join(resume_folder, "joint_fit.npz"))
                state_override = {k: ck[k] for k in ck.files}
        else:
            if not args.gt_masks and not args.evidence_root:
                raise SystemExit(
                    "need --gt_masks 1 or --evidence_root (no detector "
                    "networks are bundled)")
            prewarm_thread = None
            # The jit cache is keyed on input SHARDINGS too: when stage C
            # will run frame-sharded, the unsharded prewarm executable
            # would never be reused — skip it instead of compiling waste.
            will_shard = (args.frames_sharded and _frames_shard_devices(
                len(annots["frame_idxs"])) > 1)
            if args.prewarm and not will_shard:
                prewarm_thread = _spawn_joint_prewarm(
                    annots, args, mano_layer, image_size, loss_weights,
                    closed_hand_faces)
            with timers.time("stageAB_evidence_poseinit"):
                if args.gt_masks:
                    indep = gtevidence.prepare_independent_fit(
                        annots, args, dataset, mano_layer, image_size,
                        rend_size=args.rend_size, sample_folder=sample_folder)
                else:
                    from homan_tpu.frontend import cachedfit
                    indep = cachedfit.prepare_independent_fit_cached(
                        annots, args, mano_layer, image_size,
                        rend_size=args.rend_size,
                        evidence_root=args.evidence_root,
                        sample_folder=sample_folder)
            state_override = None
            with timers.time("save_indep"):
                with open(indep_fit_path, "wb") as f:
                    pickle.dump(indep, f)
            if prewarm_thread is not None:
                # Join before the real stage C so the two identical compiles
                # never race (the real call then hits the executable cache).
                # Bounded: if the evidence shapes diverged from the prewarm
                # guess (e.g. non-square EPIC masks), don't serialize on a
                # compile the real call can't reuse.
                with timers.time("stageC_prewarm_join"):
                    prewarm_thread.join(timeout=180)

        camintr_nc = np.asarray(annots["camera"]["K"], np.float64).copy()
        camintr_nc[:, :2] = camintr_nc[:, :2] / image_size

        with timers.time("build_joint_inputs"):
            state, consts, cfg = build_joint_inputs(
                indep["person_parameters"], indep["object_parameters"],
                indep["obj_verts_can"], indep["obj_faces"], camintr_nc,
                indep["hand_sides"], mano_layer, image_size, args.rend_size,
                (image_size, image_size), sdf_mode=args.sdf_mode,
                collision_mode=args.collision_mode,
                optimize_mano=args.optimize_mano,
                optimize_mano_beta=args.optimize_mano_beta,
                optimize_object_scale=args.optimize_object_scale,
                hand_proj_mode=args.hand_proj_mode)
        if state_override is not None:
            state = postprocess.state_from_dict(state_override)

        # Edge-budget auto-sizing: a contour edge dropped by the per-tile
        # top-k corrupts winding REGIONS silently (94% wrong silhouette
        # pixels measured on the hand mesh at ke=32), so the budget is
        # sized to measured demand, never warned past. auto_edge_settings
        # keeps the default settings when they cover demand (prewarmed
        # executables stay valid) and buckets up only for denser meshes.
        # Runs on the CPU backend: it is a host diagnostic, and its two
        # small programs cost ~40 s of remote-TPU relay compile if placed
        # there. A RuntimeError here (mesh too dense for the VMEM ceiling)
        # must abort the fit — that is the point.
        roi_settings = None  # None = compute_all_losses default settings
        from homan_tpu.fit import model as M2
        from homan_tpu.render.rasterizer import (RasterSettings,
                                                 auto_edge_settings)
        from homan_tpu.viz.render_viz import _viz_device_ctx
        # Fetch ONLY the object-pose leaves (a few KB): device_get of
        # the whole consts pytree would pull every evidence mask off
        # the device (tens of MB over the relay per sample).
        rot_h, trans_h, scale_h, vog_h, faces_h, krois_h = \
            jax.device_get((state.rotations_object,
                            state.translations_object,
                            state.int_scales_object,
                            consts.verts_object_og,
                            consts.faces_object,
                            consts.camintr_rois_object))
        with timers.time("edge_budget_check"), _viz_device_ctx():
            vo, _ = M2.get_verts_object_parts_jit(rot_h, trans_h,
                                                  scale_h, vog_h)
            default_settings = RasterSettings(image_size=args.rend_size)
            sized = auto_edge_settings(vo, faces_h, krois_h,
                                       default_settings)
        if sized != default_settings:
            logger.warning(
                "edge budget auto-sized for this mesh: edges_per_tile "
                "%d -> %d (tile_px %d -> %d); the stage-C prewarm for the "
                "default settings is bypassed",
                default_settings.edges_per_tile, sized.edges_per_tile,
                default_settings.tile_px, sized.tile_px)
            roi_settings = sized

        # Periodic optimization snapshots every viz_step iterations
        # (homan/jointopt.py:158-177 role); frames become an evolution video.
        optim_frames = []

        def viz_callback(iters_done, s):
            try:
                from homan_tpu.viz.render_viz import visualize_hand_object
                with timers.time("viz_step_snapshots"):
                    frontal, _ = visualize_hand_object(
                        s, consts, cfg, images=annots.get("images"),
                        viz_len=1, image_size=256)
                    optim_frames.append(frontal[0])
            except Exception as exc:
                logger.warning("viz_step render failed: %s", exc)

        if args.frames_sharded:
            from homan_tpu.parallel import frames as fpar
            use = _frames_shard_devices(state.translations_object.shape[0])
            if use > 1:
                fmesh = fpar.make_frame_mesh(use)
                state, consts = fpar.shard_frames(state, consts, fmesh)
                logger.info("stage C frame axis sharded over %d devices",
                            use)
            else:
                logger.warning(
                    "--frames_sharded: %d frames don't split over the "
                    "available devices; running unsharded",
                    state.translations_object.shape[0])

        # Runtime backstop for the setup-time auto-sizing: demand is
        # re-measured by the renderer at EVERY iteration (losses.py
        # edge_budget_excess metric); any positive excess means dropped
        # contour edges somewhere mid-fit — the converged state cannot be
        # trusted. RECOVER instead of losing the sample: discard the fit,
        # bump to the next feasible bucket sized to the MEASURED demand
        # (rasterizer.bump_edge_settings — the reference's CUDA rasterizer
        # loops all faces per pixel and cannot overflow, losses.py:73, so
        # sample loss here would be a TPU-only regression), and re-run
        # from the same initial state. Hard-fail only when tile_px=16
        # still cannot cover the demand (genuinely unsatisfiable mesh).
        from homan_tpu.render.rasterizer import bump_edge_settings
        for fit_attempt in range(4):  # ladder depth: ke buckets + tile halvings
            optim_frames.clear()
            with timers.time("stageC_joint_fit") as hold:
                final_state, history = joint.optimize_hand_object(
                    state, consts, cfg, loss_weights=loss_weights,
                    num_iterations=args.num_joint_iterations,
                    closed_hand_faces=closed_hand_faces,
                    roi_settings=roi_settings,
                    viz_step=args.viz_step if args.viz_step else None,
                    viz_callback=viz_callback if args.viz_step else None)
                hold["sync"] = final_state
            excess = (float(np.asarray(history["edge_budget_excess"]).max())
                      if "edge_budget_excess" in history else 0.0)
            if excess <= 0:
                break
            cur = (roi_settings if roi_settings is not None
                   else RasterSettings(image_size=args.rend_size))
            demand = int(excess) + cur.edges_per_tile
            roi_settings = bump_edge_settings(cur, demand)  # raises at tile16
            logger.warning(
                "edge budget overflowed by %d mid-fit (pose moved past the "
                "sizing headroom); discarding the fit and re-running with "
                "edges_per_tile %d -> %d (tile_px %d -> %d), attempt %d",
                int(excess), cur.edges_per_tile, roi_settings.edges_per_tile,
                cur.tile_px, roi_settings.tile_px, fit_attempt + 2)
        else:
            raise RuntimeError(
                "edge budget still overflowing after exhausting the "
                "recovery ladder — the converged silhouettes are corrupted")

        np.savez(check_path, **postprocess.state_to_dict(final_state))

        # Overlay renders + clip video (fit_vid_dataset.py:403-469 role)
        try:
            from homan_tpu.viz.render_viz import (make_video, save_image_grid,
                                                  visualize_hand_object)
            with timers.time("viz_final"):
                frontal, top_down = visualize_hand_object(
                    final_state, consts, cfg,
                    images=annots.get("images"),
                    viz_len=min(5, args.frame_nb), image_size=256)
                init_frontal, _ = visualize_hand_object(
                    state, consts, cfg, images=annots.get("images"),
                    viz_len=min(5, args.frame_nb), image_size=256)
                save_image_grid(
                    {"frontal": frontal, "top_down": top_down,
                     "init": init_frontal},
                    os.path.join(sample_folder, "final_points.png"))
                make_video([np.concatenate([f, t], axis=1)
                            for f, t in zip(frontal, top_down)],
                           os.path.join(sample_folder, "final_points.webm"),
                           fps=8)
                if optim_frames:  # optimization-evolution video
                    make_video(
                        [init_frontal[0]] + optim_frames + [frontal[0]],
                        os.path.join(sample_folder,
                                     "optim_evolution.webm"), fps=4)
        except Exception as exc:  # viz failures must not kill fits
            logger.warning("visualization failed: %s", exc)

        # Metrics vs GT when the dataset provides it. A single clip's point
        # metrics are small matmuls — the CPU backend skips two remote-TPU
        # program compiles (eval_ho3d keeps its 64-frame device batches).
        sample_metrics = {}
        from homan_tpu.viz.render_viz import _viz_device_ctx
        with timers.time("metrics_postprocess"), _viz_device_ctx():
            import jax.numpy as jnp
            vh_og = jax.device_get(consts.verts_hand_og)
            fit = postprocess.post_process(
                jax.device_get(final_state),
                jax.device_get(consts.mano_params_by_side),
                jax.device_get(consts.verts_object_og), cfg,
                verts_hand_og=vh_og)
            init = postprocess.post_process(
                jax.device_get(state),
                jax.device_get(consts.mano_params_by_side),
                jax.device_get(consts.verts_object_og), cfg,
                verts_hand_og=vh_og)
            gt_obj = None
            if "verts3d" in annots["objects"][0] and annots["objects"][0][
                    "verts3d"] is not None:
                gt_obj = jnp.asarray(np.asarray(
                    annots["objects"][0]["verts3d"]))
                # Final + pre-joint-optimization metrics, reference key
                # naming (fit_vid_dataset.py:471-516).
                for suffix, res in (("", fit), ("_init", init)):
                    m = pointmetrics.get_point_metrics(gt_obj,
                                                       res["verts_object"])
                    for k, v in m.items():
                        sample_metrics[f"{k}_obj{suffix}"] = v
            gt_hand = annots["hands"][0].get("verts3d")
            if gt_hand is not None and np.abs(gt_hand).sum() > 0:
                gt_hand = jnp.asarray(np.asarray(gt_hand)).reshape(-1, 778, 3)
                for suffix, res in (("", fit), ("_init", init)):
                    m = pointmetrics.get_point_metrics(gt_hand,
                                                       res["verts_hand"])
                    sample_metrics[f"verts_dists_hand{suffix}"] = \
                        m["verts_dists"]
                    if gt_obj is not None:
                        am = pointmetrics.get_align_metrics(
                            gt_hand, res["verts_hand"], gt_obj,
                            res["verts_object"])
                        for k, v in am.items():
                            sample_metrics[f"{k}{suffix}"] = v
            # Interaction metrics need no GT (fit_vid_dataset.py:487-493).
            # Multi-hand clips: all hands of a frame merge into one point
            # set (the reference's get_inter_metrics intent at
            # pointmetrics.py:104-111; its 2-hand branch is dead code).
            try:
                for suffix, res in (("", fit), ("_init", init)):
                    vh = res["verts_hand"]
                    nframes = res["verts_object"].shape[0]
                    im = pointmetrics.get_inter_metrics(
                        vh.reshape(nframes, -1, 3), res["verts_object"],
                        consts.faces_hand, consts.faces_object)
                    for k, v in im.items():
                        sample_metrics[f"{k}{suffix}"] = v
            except Exception as exc:
                logger.debug("inter metrics skipped: %s", exc)

        for k, v in history.items():
            sample_metrics.setdefault(f"final_{k}", []).append(
                float(np.asarray(v)[-1]))
        for k, v in sample_metrics.items():
            all_metrics[k].extend(v if isinstance(v, list) else [v])
        with open(os.path.join(sample_folder, "results.pkl"), "wb") as f:
            pickle.dump({"opts": vars(args), "metrics": sample_metrics,
                         "losses": {k: np.asarray(v).tolist()
                                    for k, v in history.items()}}, f)
        with open(os.path.join(args.result_root, "results.pkl"), "wb") as f:
            pickle.dump({"opts": vars(args), "metrics": dict(all_metrics)}, f)
        logger.info("[%d] stage timers:\n%s", sample_idx, timers.report())
        print(f"[{sample_idx}] done; final loss "
              f"{float(np.asarray(history['loss'])[-1]):.4f}")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)-8s %(message)s")
    main(get_args())
