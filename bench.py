#!/usr/bin/env python
"""Benchmarks: headline joint fit + stage-B search + full A+B+C pipeline.

North star (BASELINE.md): a full clip joint fit in < 10 s on one TPU v5e
chip. Prints ONE JSON line {"metric", "value", "unit", "vs_baseline",
"extra"} where vs_baseline is (10 s / headline) — > 1.0 beats the target —
and "extra" carries the additional workload timings:

  joint_fit_30f_400it_s   30-frame clip, 400 Adam iters, default losses,
                          256^2 ROI evidence (the headline; reference
                          workload shape fit_vid_dataset.py:65-67 +
                          jointopt.py:29).
  stageb_500c_50it_10f_s  object pose search: 500 candidates x 50 iters,
                          10 frames, 256^2 (homan/pose_optimization.py:386-488
                          workload), TPU-tuned default schedule.
  pipeline_10f_s          stages A (GT-mask evidence synthesis) + B + C
                          (201 joint iters, the reference step-1 default)
                          for one 10-frame clip.

All timings are steady-state (second run; jit caches warm). Evidence is
synthesized with the gt-masks path, so no datasets or license-gated files
are needed.

Usage: python bench.py [--preset full|smoke] [--frames N] [--iters N]
"""
from __future__ import annotations

import argparse
import json
import time


def _tile_for(rend):
    """Largest raster tile that divides the render size (bench presets)."""
    return 128 if rend % 128 == 0 else (64 if rend % 64 == 0 else 32)


_STEADY_REPEATS = 1  # set per preset in main(); min-of-k steady timing


def _denan(x):
    """Failed extras serialize as null, not the invalid-JSON NaN token."""
    if isinstance(x, dict):
        return {k: _denan(v) for k, v in x.items()}
    if isinstance(x, float) and x != x:
        return None
    return x


_PROGRESS = None  # set by main(); _timed ticks it so the hang watchdog can
                  # tell a slow-but-alive workload from a wedged device call


def _tick():
    if _PROGRESS is not None:
        _PROGRESS["t"] = time.time()


def _timed(fn):
    """(steady_s, compile_and_first_s, out): first call pays compilation;
    steady state is the min over _STEADY_REPEATS runs (the tunneled TPU is
    contention-sensitive, so a single sample can absorb relay noise)."""
    import jax
    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(out)
    compile_and_run = time.perf_counter() - t0
    _tick()
    steady = float("inf")
    for _ in range(max(1, _STEADY_REPEATS)):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        steady = min(steady, time.perf_counter() - t0)
        _tick()
    return steady, compile_and_run, out


def bench_joint(frames: int, iters: int, rend: int, subdiv: int):
    """Headline: jitted joint fit (stage C) on a synthetic clip."""
    from homan_tpu.core.meshes import bumpy_potato
    from homan_tpu.frontend.gtsynth import make_synthetic_scene
    from homan_tpu.fit import joint
    from homan_tpu.render import RasterSettings

    scene = make_synthetic_scene(
        seed=0, frame_nb=frames, image_size=max(2 * rend, 128),
        rend_size=rend, obj_mesh=bumpy_potato(subdiv, 0.08, seed=0))
    tile = _tile_for(rend)
    settings = RasterSettings(image_size=rend, tile_px=tile,
                              edges_per_tile=48)

    def run():
        final, history = joint.optimize_hand_object(
            scene.init_state, scene.consts, scene.cfg,
            num_iterations=iters, roi_settings=settings)
        return final

    elapsed, compile_s, _ = _timed(run)
    return elapsed, compile_s


def _synthetic_clip_annots(frames: int, image_size: int, subdiv: int,
                           mesh=None):
    """In-memory clip annotations (hands/objects/camera) for the GT path."""
    import jax.numpy as jnp
    import numpy as np
    from homan_tpu.core import mano as mano_lib
    from homan_tpu.core.meshes import bumpy_potato

    layer = mano_lib.ManoLayer.synthetic(0)
    v, f = mesh if mesh is not None else bumpy_potato(subdiv, 0.08, seed=0)
    K = np.array([[image_size * 0.9, 0, image_size / 2],
                  [0, image_size * 0.9, image_size / 2],
                  [0, 0, 1.0]], np.float32)
    rest = np.asarray(mano_lib.mano_forward_jit(
        layer.params["right"], jnp.zeros(10), jnp.zeros(3),
        jnp.zeros(45))["verts"])
    hand_verts, obj_verts = [], []
    for t in range(frames):
        ang = 0.04 * t
        Rz = np.array([[np.cos(ang), -np.sin(ang), 0],
                       [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
        obj_verts.append(v @ Rz.T
                         + np.array([0.02 + 0.002 * t, -0.01, 0.55],
                                    np.float32))
        hand_verts.append(rest + np.array([0.1 - 0.002 * t, 0.0, 0.58],
                                          np.float32))
    annots = {
        "frame_idxs": list(range(frames)),
        "camera": {"K": np.tile(K[None], (frames, 1, 1))},
        "hands": [{"label": "right_hand",
                   "verts3d": np.stack(hand_verts)}],
        "objects": [{"canverts3d": v, "faces": f,
                     "verts3d": np.stack(obj_verts)}],
    }
    return annots, layer, image_size


def bench_stageb(frames: int, inits: int, obj_iters: int, rend: int,
                 subdiv: int):
    """Stage B alone on synthesized evidence (tuned default schedule)."""
    import numpy as np
    from homan_tpu.fit import poseinit
    from homan_tpu.frontend.evidence import build_object_mask_info
    from homan_tpu.frontend.gtevidence import mask_to_bbox, render_full_mask
    from homan_tpu.render import RasterSettings
    from homan_tpu.render.rasterizer import MeshTopology

    annots, _, image_size = _synthetic_clip_annots(frames, max(2 * rend, 128),
                                                   subdiv)
    obj = annots["objects"][0]
    topo = MeshTopology.from_faces(obj["faces"])
    masks = render_full_mask(obj["verts3d"], topo, annots["camera"]["K"],
                             image_size)
    annotations = []
    for t in range(frames):
        info = build_object_mask_info(masks[t], mask_to_bbox(masks[t]),
                                      None, rend)
        info["full_mask"] = masks[t].astype(np.float32)
        annotations.append(info)
    tile = _tile_for(rend)
    # ke=64, not 48: the half-res refinement renders the whole 128^2 image
    # as ONE 128px tile, so every contour edge competes for the same slots
    # (ke=48 measurably drops IoU .979 -> .968).
    settings = RasterSettings(image_size=rend, tile_px=tile,
                              edges_per_tile=64)

    best_iou = {}

    def run():
        res = poseinit.find_optimal_poses(
            obj["canverts3d"], topo, annotations,
            [annots["camera"]["K"][t] for t in range(frames)],
            (image_size, image_size), num_initializations=inits,
            num_iterations=obj_iters, rend_size=rend, settings=settings,
            seed=0)
        best_iou["iou"] = float(res[0]["best_iou"])
        return res[0]["rotations"]

    elapsed, compile_s, _ = _timed(run)
    return elapsed, compile_s, best_iou["iou"]


def bench_multiclip(n_clips: int, frames: int, iters: int, rend: int,
                    subdiv: int):
    """Throughput: N independent clips vmapped + sharded in one program
    (parallel/clips.py — the multi-chip production layout, here on 1 chip).
    """
    import jax
    from homan_tpu.core.mano import ManoLayer
    from homan_tpu.core.meshes import bumpy_potato
    from homan_tpu.frontend.gtsynth import make_synthetic_scene
    from homan_tpu.parallel import clips as par
    from homan_tpu.render import RasterSettings

    layer = ManoLayer.synthetic(0)
    obj_mesh = bumpy_potato(subdiv, 0.08, seed=0)
    scenes = [make_synthetic_scene(seed=i, frame_nb=frames,
                                   image_size=max(2 * rend, 128),
                                   rend_size=rend, mano_layer=layer,
                                   obj_mesh=obj_mesh)
              for i in range(n_clips)]
    states = par.stack_clips([s.init_state for s in scenes])
    consts = par.stack_clips([s.consts for s in scenes])
    tile = _tile_for(rend)
    settings = RasterSettings(image_size=rend, tile_px=tile,
                              edges_per_tile=48)

    def run():
        final, _ = par.fit_clips_batched(
            states, consts, scenes[0].cfg, num_iterations=iters,
            roi_settings=settings)
        return final

    elapsed, compile_s, _ = _timed(run)
    return elapsed, compile_s


def bench_depth(frames: int, iters: int, rend: int, subdiv: int):
    """Joint fit with the ordinal-depth term on (lw_depth=1): renders object
    + each hand at FULL image size every iteration through the XLA depth
    path (homan/lossutils.py:133-169 workload; fit/losses.py:410-428)."""
    from homan_tpu.core.meshes import bumpy_potato
    from homan_tpu.frontend.gtsynth import make_synthetic_scene
    from homan_tpu.fit import joint
    from homan_tpu.render import RasterSettings

    scene = make_synthetic_scene(
        seed=0, frame_nb=frames, image_size=max(2 * rend, 128),
        rend_size=rend, obj_mesh=bumpy_potato(subdiv, 0.08, seed=0),
        with_full_masks=True)
    tile = _tile_for(rend)
    settings = RasterSettings(image_size=rend, tile_px=tile,
                              edges_per_tile=48)

    def run():
        final, _ = joint.optimize_hand_object(
            scene.init_state, scene.consts, scene.cfg,
            loss_weights={"lw_depth": 1.0},
            num_iterations=iters, roi_settings=settings)
        return final

    elapsed, compile_s, _ = _timed(run)
    return elapsed, compile_s


def bench_config3(frames: int, iters: int, rend: int, subdiv: int,
                  sdf_mode: str):
    """Joint fit with collision + contact on (the reference step-2 recipe,
    README.md:228-238: --lw_collision 0.001 --lw_contact 1). sdf_mode
    'direct' is the exact grid-free default; 'grid' voxelizes per iteration
    like the reference's SDFSceneLoss (scenesdf.py:119-121)."""
    import dataclasses
    from homan_tpu.core.meshes import bumpy_potato
    from homan_tpu.frontend.gtsynth import make_synthetic_scene
    from homan_tpu.fit import joint
    from homan_tpu.render import RasterSettings

    scene = make_synthetic_scene(
        seed=0, frame_nb=frames, image_size=max(2 * rend, 128),
        rend_size=rend, obj_mesh=bumpy_potato(subdiv, 0.08, seed=0))
    cfg = dataclasses.replace(scene.cfg, sdf_mode=sdf_mode)
    # optimize_hand_object merges these onto DEFAULT_LW itself
    lw = {"lw_collision": 1e-3, "lw_contact": 1.0}
    tile = _tile_for(rend)
    settings = RasterSettings(image_size=rend, tile_px=tile,
                              edges_per_tile=48)

    def run():
        final, _ = joint.optimize_hand_object(
            scene.init_state, scene.consts, cfg, loss_weights=lw,
            num_iterations=iters,
            closed_hand_faces=scene.closed_hand_faces,
            roi_settings=settings)
        return final

    elapsed, compile_s, _ = _timed(run)
    return elapsed, compile_s


def bench_roofline(frames: int, iters: int, rend: int, subdiv: int,
                   headline_steady_s: float, depth_steady_s: float,
                   depth_frames: int, depth_iters: int,
                   stageb_inits: int = 500, stageb_obj_iters: int = 50,
                   c3_frames: int = 10, c3_iters: int = 400):
    """MFU / duty-cycle accounting (VERDICT r3 #2).

    Two evidence levels:
      * aggregate: analytic kernel FLOPs (utils_profiling.shade_flops_per
        _iter, exact in (pixels x edge-candidates), op weights counted from
        the kernel source) divided by the UNTRACED steady wall — a lower
        bound on kernel utilization since it charges the whole program
        (Adam, MANO, projections, dispatch) to the shade kernel;
      * traced: one short (50-iter) run under jax.profiler; the xplane
        per-op busy times give the true device duty cycle within the traced
        span and the shade kernel's own busy seconds -> its achieved
        TFLOP/s vs the v5e VPU peak. Trace capture over the axon relay
        costs minutes of wall, so the traced run is short and the trace
        wall is never used as a denominator.
    """
    import jax
    from homan_tpu import utils_profiling as up
    from homan_tpu.core.meshes import bumpy_potato
    from homan_tpu.frontend.gtsynth import make_synthetic_scene
    from homan_tpu.fit import joint
    from homan_tpu.render import RasterSettings

    ke = 48
    peaks = up.V5E_PEAK
    fl = up.shade_flops_per_iter(frames, rend, ke)
    out = {
        "assumptions": {
            "v5e_vpu_f32_tflops": peaks["vpu_f32_tflops"],
            "v5e_mxu_f32_tflops": peaks["mxu_f32_tflops"],
            "shade_ops_per_pix_edge":
                up.SHADE_FWD_OPS_PER_PIX_EDGE
                + up.SHADE_BWD_VPU_OPS_PER_PIX_EDGE,
        },
        "headline_aggregate": {
            "shade_vpu_gflop_per_iter": round(fl["vpu_flops"] / 1e9, 2),
            "achieved_vpu_tflops":
                round(fl["vpu_flops"] * iters / headline_steady_s / 1e12, 3),
            "vpu_roofline_fraction":
                round(fl["vpu_flops"] * iters / headline_steady_s / 1e12
                      / peaks["vpu_f32_tflops"], 3),
        },
    }
    if depth_steady_s == depth_steady_s:  # not NaN
        # depth kernel: ~30 VPU ops per (pixel, face-candidate): 3 edge
        # functions (18) + inv-z interpolation + argmax select (12), over
        # object (1280 faces capped at 256/tile) + hand passes.
        dfl = (float(depth_frames) * rend * rend * 256 * 30.0) * 2
        out["depth_aggregate"] = {
            "achieved_vpu_tflops":
                round(dfl * depth_iters / depth_steady_s / 1e12, 3),
            "vpu_roofline_fraction":
                round(dfl * depth_iters / depth_steady_s / 1e12
                      / peaks["vpu_f32_tflops"], 3),
        }

    # Traced short run (same shapes/settings as the headline).
    scene = make_synthetic_scene(
        seed=0, frame_nb=frames, image_size=max(2 * rend, 128),
        rend_size=rend, obj_mesh=bumpy_potato(subdiv, 0.08, seed=0))
    tile = _tile_for(rend)
    settings = RasterSettings(image_size=rend, tile_px=tile,
                              edges_per_tile=ke)
    trace_iters = 50

    def run():
        final, _ = joint.optimize_hand_object(
            scene.init_state, scene.consts, scene.cfg,
            num_iterations=trace_iters, roi_settings=settings)
        return final

    jax.block_until_ready(run())  # compile outside the trace
    stats = up.measure_duty_cycle(run)
    if "device_busy_s" in stats:
        per_op = stats.get("per_op_s", {})
        total_busy = stats["device_busy_s"]
        # Mosaic kernels appear as custom-call / tpu_custom_call ops; fall
        # back to the single largest op when the name match finds nothing.
        shade_busy = sum(v for k, v in per_op.items()
                         if "custom" in k.lower() or "shade" in k.lower())
        if shade_busy == 0 and per_op:
            shade_busy = max(per_op.values())
        out["headline_traced"] = {
            "trace_iters": trace_iters,
            "duty_cycle_in_span": round(stats["duty_cycle"], 3),
            "device_busy_s": round(total_busy, 4),
            "shade_kernel_busy_s": round(shade_busy, 4),
            "shade_busy_fraction":
                round(shade_busy / max(total_busy, 1e-9), 3),
            "shade_kernel_achieved_vpu_tflops":
                round(fl["vpu_flops"] * trace_iters
                      / max(shade_busy, 1e-9) / 1e12, 3),
            "shade_kernel_vpu_roofline_fraction":
                round(fl["vpu_flops"] * trace_iters
                      / max(shade_busy, 1e-9) / 1e12
                      / peaks["vpu_f32_tflops"], 3),
            "top_ops_s": {k[:80]: round(v, 4)
                          for k, v in list(per_op.items())[:5]},
        }

    def _traced_block(run_fn, kernel_flops, label):
        """Shared trace -> {duty, kernel busy fraction, achieved TF/s}."""
        jax.block_until_ready(run_fn())  # compile outside the trace
        st = up.measure_duty_cycle(run_fn)
        if "device_busy_s" not in st:
            return {"error": f"no profiler data for {label}"}
        per = st.get("per_op_s", {})
        busy = st["device_busy_s"]
        kern = sum(v for k, v in per.items()
                   if "custom" in k.lower() or "shade" in k.lower()
                   or "voxel" in k.lower())
        if kern == 0 and per:
            kern = max(per.values())
        tf = kernel_flops / max(kern, 1e-9) / 1e12
        return {
            "duty_cycle_in_span": round(st["duty_cycle"], 3),
            "device_busy_s": round(busy, 4),
            "kernel_busy_s": round(kern, 4),
            "kernel_busy_fraction": round(kern / max(busy, 1e-9), 3),
            "kernel_achieved_vpu_tflops": round(tf, 3),
            "kernel_vpu_roofline_fraction":
                round(tf / peaks["vpu_f32_tflops"], 3),
            "top_ops_s": {k[:80]: round(v, 4)
                          for k, v in list(per.items())[:4]},
        }

    # --- stage B traced (VERDICT r4 weak #3): one candidate-refinement
    # program — the dominant stage-B cost (refine at half resolution, the
    # production schedule). Binding resource is named by which bucket
    # dominates: kernel_busy_fraction ~1 -> VPU shade kernel; low duty
    # cycle -> host/dispatch; neither -> XLA prep ops.
    try:
        import dataclasses as dc

        import jax.numpy as jnp
        import numpy as np
        from homan_tpu.core.meshes import bumpy_potato as _potato
        from homan_tpu.fit import poseinit as _pi
        from homan_tpu.core import geometry as _geo

        v_b, f_b = _potato(subdiv, 0.08, seed=0)
        from homan_tpu.render.rasterizer import MeshTopology as _MT
        topo_b = _MT.from_faces(f_b)
        refine = rend // 2
        sett_b = RasterSettings(image_size=refine,
                                tile_px=_tile_for(refine),
                                edges_per_tile=64)
        C = stageb_inits // 4 if stageb_inits >= 64 else stageb_inits
        rots = _geo.random_rotations(jax.random.PRNGKey(0), C)
        rot6d = _geo.matrix_to_rot6d(rots)
        trans = jnp.tile(jnp.asarray([[0.0, 0.0, 0.6]], jnp.float32)[:, None],
                         (C, 1, 1))
        ref_m = jnp.zeros((refine, refine), jnp.float32).at[
            refine // 4: 3 * refine // 4, refine // 4: 3 * refine // 4].set(1)
        keep_m = jnp.ones_like(ref_m)
        K_roi = jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]],
                            jnp.float32)
        trace_b_iters = 10

        def run_b():
            params, losses, ious, _ = _pi._fit_candidates(
                jnp.asarray(v_b), topo_b, ref_m, keep_m,
                jnp.zeros_like(ref_m), K_roi, rot6d, trans, sett_b,
                num_iterations=trace_b_iters)
            return losses

        ke_b = min(64, topo_b.edges.shape[0])
        fl_b = up.shade_flops_per_iter(C, refine, ke_b)
        out["stageb_traced"] = dict(
            _traced_block(run_b, fl_b["vpu_flops"] * trace_b_iters,
                          "stageb"),
            candidates=C, refine_size=refine, trace_iters=trace_b_iters)
    except Exception as exc:  # noqa: BLE001
        out["stageb_traced"] = {"error": str(exc)[:200]}

    # --- grid-SDF traced: short config3 run with sdf_mode="grid" (the
    # strict reference-semantics path; per-iteration voxelize at 32^3).
    try:
        import dataclasses as dc
        from homan_tpu.frontend.gtsynth import make_synthetic_scene as _mss
        from homan_tpu.fit import joint as _joint

        c3_rend = 256 if rend >= 256 else rend
        scene_g = _mss(seed=0, frame_nb=c3_frames,
                       image_size=max(2 * c3_rend, 128), rend_size=c3_rend,
                       obj_mesh=_potato(subdiv, 0.08, seed=0))
        cfg_g = dc.replace(scene_g.cfg, sdf_mode="grid")
        sett_g = RasterSettings(image_size=c3_rend,
                                tile_px=_tile_for(c3_rend),
                                edges_per_tile=48)
        trace_g_iters = 25

        def run_g():
            final, _ = _joint.optimize_hand_object(
                scene_g.init_state, scene_g.consts, cfg_g,
                loss_weights={"lw_collision": 1e-3, "lw_contact": 1.0},
                num_iterations=trace_g_iters,
                closed_hand_faces=scene_g.closed_hand_faces,
                roi_settings=sett_g)
            return final

        n_faces = (scene_g.consts.faces_object.faces.shape[0]
                   + scene_g.closed_hand_faces.shape[0])
        # Ericson-form voxelizer: ~74 full-tile VPU ops per (cell, face)
        # (NOTES_ROUND5 "Grid-SDF voxelizer" section), 2 meshes per frame.
        fl_g = up.voxelize_flops_per_iter(c3_frames, 1, n_faces,
                                          ops_per_pair=74.0)
        out["config3_grid_traced"] = dict(
            _traced_block(run_g, fl_g["vpu_flops"] * trace_g_iters,
                          "config3_grid"),
            frames=c3_frames, trace_iters=trace_g_iters,
            note=("kernel_* lumps all Mosaic custom-calls: shade + "
                  "voxelizer + depth; TF/s uses the voxelizer op count "
                  "only, so it is a lower bound on that kernel"))
    except Exception as exc:  # noqa: BLE001
        out["config3_grid_traced"] = {"error": str(exc)[:200]}

    return (out,)


def bench_pipeline(frames: int, inits: int, obj_iters: int, joint_iters: int,
                   rend: int, subdiv: int):
    """Stages A+B+C end to end for one clip (GT-mask evidence path)."""
    import argparse as ap
    import numpy as np
    from homan_tpu.cli.fit_video import build_joint_inputs
    from homan_tpu.fit import joint
    from homan_tpu.frontend.gtevidence import prepare_independent_fit
    from homan_tpu.render import RasterSettings

    annots, layer, image_size = _synthetic_clip_annots(
        frames, max(2 * rend, 128), subdiv)
    args = ap.Namespace(num_initializations=inits,
                        num_obj_iterations=obj_iters, seed=0,
                        stageb_parallel_frames=0)
    tile = _tile_for(rend)
    settings = RasterSettings(image_size=rend, tile_px=tile,
                              edges_per_tile=64)

    def run():
        indep = prepare_independent_fit(annots, args, None, layer,
                                        image_size, rend_size=rend)
        camintr_nc = np.asarray(annots["camera"]["K"], np.float64).copy()
        camintr_nc[:, :2] = camintr_nc[:, :2] / image_size
        state, consts, cfg = build_joint_inputs(
            indep["person_parameters"], indep["object_parameters"],
            indep["obj_verts_can"], indep["obj_faces"], camintr_nc,
            indep["hand_sides"], layer, image_size, rend,
            (image_size, image_size))
        final, _ = joint.optimize_hand_object(
            state, consts, cfg, num_iterations=joint_iters,
            roi_settings=settings)
        return final

    elapsed, compile_s, _ = _timed(run)
    return elapsed, compile_s


def bench_throughput(n_samples: int, frames: int, inits: int, obj_iters: int,
                     joint_iters: int, rend: int, subdiv: int):
    """Dataset-scale amortization (VERDICT r3 #4): N sequential samples
    through the full A+B+C path in ONE process — shared mesh topology,
    per-sample poses, exactly the reference's per-sample driver loop shape
    (fit_vid_dataset.py:190-533). Unlike bench_pipeline's min-of-k repeat
    of ONE sample, every sample here is a distinct fit (different GT
    evidence + init poses), so the host glue (evidence synthesis, stage-B
    candidate setup, state assembly) is paid each time and only the jitted
    programs amortize. Reports first-sample and steady per-sample wall +
    samples/hour/chip."""
    import argparse as ap
    import jax
    import numpy as np
    from homan_tpu.cli.fit_video import build_joint_inputs
    from homan_tpu.fit import joint
    from homan_tpu.frontend.gtevidence import prepare_independent_fit
    from homan_tpu.render import RasterSettings

    annots0, layer, image_size = _synthetic_clip_annots(
        frames, max(2 * rend, 128), subdiv)
    args = ap.Namespace(num_initializations=inits,
                        num_obj_iterations=obj_iters, seed=0,
                        stageb_parallel_frames=0)
    tile = _tile_for(rend)
    settings = RasterSettings(image_size=rend, tile_px=tile,
                              edges_per_tile=64)

    def perturbed(k):
        """Sample k: same topology, rigidly perturbed GT trajectories."""
        rng = np.random.RandomState(1000 + k)
        ang = float(rng.uniform(-0.5, 0.5))
        Rz = np.array([[np.cos(ang), -np.sin(ang), 0],
                       [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
        dt = rng.uniform(-0.03, 0.03, size=3).astype(np.float32)
        annots = dict(annots0)
        annots["objects"] = [dict(o) for o in annots0["objects"]]
        annots["hands"] = [dict(h) for h in annots0["hands"]]
        ov = annots0["objects"][0]["verts3d"]
        c = ov.mean(axis=(0, 1), keepdims=True)
        annots["objects"][0]["verts3d"] = ((ov - c) @ Rz.T + c + dt)
        annots["hands"][0]["verts3d"] = annots0["hands"][0]["verts3d"] + dt
        return annots

    def one_sample(k):
        annots = perturbed(k)
        indep = prepare_independent_fit(annots, args, None, layer,
                                        image_size, rend_size=rend)
        camintr_nc = np.asarray(annots["camera"]["K"], np.float64).copy()
        camintr_nc[:, :2] = camintr_nc[:, :2] / image_size
        state, consts, cfg = build_joint_inputs(
            indep["person_parameters"], indep["object_parameters"],
            indep["obj_verts_can"], indep["obj_faces"], camintr_nc,
            indep["hand_sides"], layer, image_size, rend,
            (image_size, image_size))
        final, _ = joint.optimize_hand_object(
            state, consts, cfg, num_iterations=joint_iters,
            roi_settings=settings)
        return final

    times = []
    for k in range(n_samples):
        t0 = time.perf_counter()
        jax.block_until_ready(one_sample(k))
        times.append(time.perf_counter() - t0)
        _tick()
    rest = sorted(times[1:]) or times
    steady = rest[len(rest) // 2]  # median of the non-first samples
    return ({
        "n_samples": n_samples,
        "first_sample_s": round(times[0], 3),
        "per_sample_steady_s": round(steady, 3),
        "samples_per_hour_chip": round(3600.0 / steady, 1),
        "all_s": [round(t, 3) for t in times],
    },)


def bench_throughput_hetero(n_samples: int, frames: int, inits: int,
                            obj_iters: int, joint_iters: int, rend: int):
    """Heterogeneous-topology throughput (VERDICT r4 #4): samples cycle 3
    distinct object meshes spanning 2 shape buckets (two 1280-face potatoes
    with different vertex content + one 320-face potato), exactly the mixed
    -YCB-object shape of a real dataset pass (fit_vid_dataset.py:190). Pays
    what bench_throughput's shared topology never does: MeshTopology host
    builds per new mesh content and a full program recompile per new shape
    bucket. Reports the per-bucket first-visit walls (compile evidence),
    steady per-sample over revisits, and the topology-cache hit rate."""
    import argparse as ap
    import jax
    import numpy as np
    from homan_tpu.cli.fit_video import build_joint_inputs
    from homan_tpu.core.meshes import bumpy_potato
    from homan_tpu.fit import joint
    from homan_tpu.frontend.gtevidence import prepare_independent_fit
    from homan_tpu.render import RasterSettings
    from homan_tpu.render import rasterizer as rast

    meshes = [
        ("potato1280_a", bumpy_potato(3, 0.08, seed=0)),
        ("potato1280_b", bumpy_potato(3, 0.08, seed=11)),
        ("potato320", bumpy_potato(2, 0.08, seed=4)),
    ]
    args = ap.Namespace(num_initializations=inits,
                        num_obj_iterations=obj_iters, seed=0,
                        stageb_parallel_frames=0)
    tile = _tile_for(rend)
    settings = RasterSettings(image_size=rend, tile_px=tile,
                              edges_per_tile=64)
    stats0 = dict(rast._TOPOLOGY_CACHE_STATS)

    def one_sample(k):
        name, mesh = meshes[k % len(meshes)]
        annots, layer, image_size = _synthetic_clip_annots(
            frames, max(2 * rend, 128), 3, mesh=mesh)
        rng = np.random.RandomState(2000 + k)
        dt = rng.uniform(-0.02, 0.02, size=3).astype(np.float32)
        annots["objects"][0]["verts3d"] = annots["objects"][0]["verts3d"] + dt
        indep = prepare_independent_fit(annots, args, None, layer,
                                        image_size, rend_size=rend)
        camintr_nc = np.asarray(annots["camera"]["K"], np.float64).copy()
        camintr_nc[:, :2] = camintr_nc[:, :2] / image_size
        state, consts, cfg = build_joint_inputs(
            indep["person_parameters"], indep["object_parameters"],
            indep["obj_verts_can"], indep["obj_faces"], camintr_nc,
            indep["hand_sides"], layer, image_size, rend,
            (image_size, image_size))
        final, _ = joint.optimize_hand_object(
            state, consts, cfg, num_iterations=joint_iters,
            roi_settings=settings)
        return name, final

    times, names = [], []
    for k in range(n_samples):
        t0 = time.perf_counter()
        name, out = one_sample(k)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
        names.append(name)
        _tick()
    first_visit = {}
    revisit = []
    for name, t in zip(names, times):
        if name in first_visit:
            revisit.append(t)
        else:
            first_visit[name] = round(t, 3)
    revisit_sorted = sorted(revisit) or times
    steady = revisit_sorted[len(revisit_sorted) // 2]
    stats1 = rast._TOPOLOGY_CACHE_STATS
    hits = stats1["hits"] - stats0["hits"]
    misses = stats1["misses"] - stats0["misses"]
    return ({
        "n_samples": n_samples,
        "meshes": [n for n, _ in meshes],
        "first_visit_s": first_visit,
        "per_sample_steady_s": round(steady, 3),
        "samples_per_hour_chip": round(3600.0 / steady, 1),
        "topology_cache": {"hits": hits, "misses": misses,
                           "hit_rate": round(hits / max(hits + misses, 1),
                                             3)},
        "all_s": [round(t, 3) for t in times],
    },)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="full", choices=["full", "smoke"])
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--rend", type=int, default=None)
    args = ap.parse_args()

    # Persistent-cache evidence (VERDICT r2 #3): record whether this process
    # started with a warm on-disk XLA cache and how many entries it added —
    # "entries_before > 0, few added" reads as a warm second process.
    import glob
    import os
    import homan_tpu
    cache_dir = getattr(homan_tpu, "_JIT_CACHE_DIR", None)
    cache_before = (len(glob.glob(os.path.join(cache_dir, "*")))
                    if cache_dir and os.path.isdir(cache_dir) else 0)

    if args.preset == "full":
        global _STEADY_REPEATS
        _STEADY_REPEATS = 3
        frames = args.frames or 30
        iters = args.iters or 400
        rend = args.rend or 256
        subdiv = 3  # 1280-face object
        baseline_s = 10.0
        extras_cfg = dict(frames=10, inits=500, obj_iters=50, rend=rend,
                          subdiv=subdiv)
    else:
        frames = args.frames or 3
        iters = args.iters or 20
        rend = args.rend or 64
        subdiv = 2
        baseline_s = 10.0 * (3 / 30) * (20 / 400)  # scaled target
        extras_cfg = dict(frames=2, inits=24, obj_iters=5, rend=rend,
                          subdiv=subdiv)

    # Hang watchdog: a wedged device tunnel blocks inside a C call that no
    # signal can interrupt, which would leave the driver with NO record at
    # all. A daemon thread watches per-workload progress and, after
    # `watchdog_s` without any workload finishing, prints the partial JSON
    # (real numbers for what completed, null for the rest) and hard-exits.
    import sys
    import threading
    watchdog_s = float(os.environ.get("HOMAN_BENCH_WATCHDOG_S", "900"))
    progress = {"t": time.time(), "stage": "startup"}
    global _PROGRESS
    _PROGRESS = progress
    partial = {}  # filled as workloads finish; read by the watchdog

    def _emit(record, code=None):
        print(json.dumps(_denan(record)), flush=True)
        if code is not None:
            os._exit(code)

    def _watch():
        while True:
            time.sleep(15)
            idle = time.time() - progress["t"]
            if watchdog_s > 0 and idle > watchdog_s:
                rec = _partial_record(partial)
                print(f"bench watchdog: no progress for {idle:.0f}s "
                      f"(stuck in {progress['stage']}); emitting partial "
                      "record", file=sys.stderr)
                _emit(rec, code=2)

    threading.Thread(target=_watch, daemon=True).start()

    def soft(fn, *a, n_out=2, **kw):
        """One failing extra workload must not kill the whole bench record."""
        progress["t"] = time.time()
        progress["stage"] = fn.__name__
        try:
            out = fn(*a, **kw)
        except Exception as exc:  # noqa: BLE001 — record and move on
            import traceback
            traceback.print_exc()
            print(f"bench workload {fn.__name__} failed: {exc}",
                  file=sys.stderr)
            out = (float("nan"),) * n_out
        progress["t"] = time.time()
        return out

    n_clips = 4 if args.preset == "full" else 2
    depth_iters = 100 if args.preset == "full" else 5
    c3_iters = 400 if args.preset == "full" else 5
    ec = extras_cfg
    nan = float("nan")

    def _partial_record(vals):
        g = lambda k, d=nan: vals.get(k, d)  # noqa: E731
        headline = g("headline")
        return {
            "metric": f"joint_fit_{frames}f_{iters}it_seconds",
            "value": round(headline, 4) if headline == headline else nan,
            "unit": "s",
            "vs_baseline": (round(baseline_s / headline, 4)
                            if headline == headline else nan),
            "extra": {
                f"stageb_{ec['inits']}c_{ec['obj_iters']}it_"
                f"{ec['frames']}f_s": round(g("sb"), 3),
                "stageb_best_iou": round(g("sb_iou"), 4),
                f"pipeline_{ec['frames']}f_s": round(g("pl"), 3),
                f"multiclip_{n_clips}x{ec['frames']}f_s": round(g("mc"), 3),
                f"depth_{ec['frames']}f_{depth_iters}it_s": round(g("dp"), 3),
                f"config3_direct_{ec['frames']}f_{c3_iters}it_s":
                    round(g("c3d"), 3),
                f"config3_grid_{ec['frames']}f_{c3_iters}it_s":
                    round(g("c3g"), 3),
                "roofline": vals.get("roofline"),
                "throughput": vals.get("tput"),
                "throughput_hetero": vals.get("tput_het"),
                "jit_cache": {
                    "enabled": bool(cache_dir),
                    "entries_before": cache_before,
                    "entries_added": (
                        len(glob.glob(os.path.join(cache_dir, "*")))
                        - cache_before
                        if cache_dir and os.path.isdir(cache_dir) else 0),
                },
                "compile_s": {"joint": round(g("headline_c"), 1),
                              "stageb": round(g("sb_c"), 1),
                              "pipeline": round(g("pl_c"), 1),
                              "multiclip": round(g("mc_c"), 1),
                              "depth": round(g("dp_c"), 1),
                              "config3_direct": round(g("c3d_c"), 1),
                              "config3_grid": round(g("c3g_c"), 1)},
            },
        }

    # The headline is NOT exception-wrapped (a broken headline must fail the
    # bench loudly), but it does report progress so the watchdog can tell a
    # hung tunnel from a slow compile.
    progress["stage"] = "bench_joint"
    partial["headline"], partial["headline_c"] = bench_joint(
        frames, iters, rend, subdiv)
    progress["t"] = time.time()
    partial["sb"], partial["sb_c"], partial["sb_iou"] = soft(
        bench_stageb, n_out=3, **extras_cfg)
    partial["pl"], partial["pl_c"] = soft(
        bench_pipeline, joint_iters=201 if args.preset == "full" else 5,
        **extras_cfg)
    partial["mc"], partial["mc_c"] = soft(
        bench_multiclip, n_clips, extras_cfg["frames"],
        iters if args.preset == "full" else 5,
        extras_cfg["rend"], extras_cfg["subdiv"])
    partial["dp"], partial["dp_c"] = soft(
        bench_depth, extras_cfg["frames"], depth_iters,
        extras_cfg["rend"], extras_cfg["subdiv"])
    partial["c3d"], partial["c3d_c"] = soft(
        bench_config3, extras_cfg["frames"], c3_iters,
        extras_cfg["rend"], extras_cfg["subdiv"], sdf_mode="direct")
    partial["c3g"], partial["c3g_c"] = soft(
        bench_config3, extras_cfg["frames"], c3_iters,
        extras_cfg["rend"], extras_cfg["subdiv"], sdf_mode="grid")
    (partial["roofline"],) = soft(
        bench_roofline, frames, iters, rend, subdiv,
        n_out=1,
        headline_steady_s=partial["headline"],
        depth_steady_s=partial.get("dp", nan),
        depth_frames=ec["frames"], depth_iters=depth_iters,
        stageb_inits=ec["inits"], stageb_obj_iters=ec["obj_iters"],
        c3_frames=ec["frames"], c3_iters=c3_iters)
    # Same per-sample shape as bench_pipeline, so per_sample_steady_s is
    # directly comparable to pipeline_10f_s (VERDICT r3 #4's <= ~1.2x bar).
    (partial["tput"],) = soft(
        bench_throughput, 8 if args.preset == "full" else 2,
        ec["frames"], ec["inits"], ec["obj_iters"],
        201 if args.preset == "full" else 5,
        ec["rend"], ec["subdiv"], n_out=1)
    (partial["tput_het"],) = soft(
        bench_throughput_hetero, 9 if args.preset == "full" else 3,
        ec["frames"], ec["inits"], ec["obj_iters"],
        201 if args.preset == "full" else 5, ec["rend"], n_out=1)

    result = _partial_record(partial)
    _emit(result)
    return result


if __name__ == "__main__":
    main()
