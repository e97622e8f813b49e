#!/usr/bin/env python
"""Headline benchmark: joint hand+object fit, 30-frame clip, 400 Adam iters.

North star (BASELINE.md): full clip in < 10 s on one TPU v5e chip. Prints ONE
JSON line {"metric", "value", "unit", "vs_baseline"} where vs_baseline is
(10 s / measured): > 1.0 beats the target.

The workload mirrors the reference defaults (fit_vid_dataset.py:65-67,
jointopt.py:29): default loss weights (object silhouette + hand keypoints +
smoothness + priors + coarse interaction), 256^2 ROI evidence, a ~1.3k-face
object and a 1.5k-face MANO hand per frame. Evidence is synthesized with the
gt-masks path, so the benchmark needs no datasets or license-gated files.

Usage: python bench.py [--preset full|smoke] [--frames N] [--iters N]
"""
from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="full", choices=["full", "smoke"])
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--rend", type=int, default=None)
    args = ap.parse_args()

    if args.preset == "full":
        frames = args.frames or 30
        iters = args.iters or 400
        rend = args.rend or 256
        subdiv = 3  # 1280-face object
        baseline_s = 10.0
    else:
        frames = args.frames or 3
        iters = args.iters or 20
        rend = args.rend or 64
        subdiv = 2
        baseline_s = 10.0 * (3 / 30) * (20 / 400)  # scaled target

    import jax
    from homan_tpu.core.meshes import bumpy_potato
    from homan_tpu.frontend.gtsynth import make_synthetic_scene
    from homan_tpu.fit import joint
    from homan_tpu.render import RasterSettings

    dev = jax.devices()[0]
    scene = make_synthetic_scene(
        seed=0, frame_nb=frames, image_size=max(2 * rend, 128),
        rend_size=rend, obj_mesh=bumpy_potato(subdiv, 0.08, seed=0))
    tile = 128 if rend % 128 == 0 else (64 if rend % 64 == 0 else 32)
    settings = RasterSettings(image_size=rend, tile_px=tile,
                              edges_per_tile=64)

    def run(n_iters):
        final, history = joint.optimize_hand_object(
            scene.init_state, scene.consts, scene.cfg,
            num_iterations=n_iters, roi_settings=settings)
        jax.block_until_ready(final)
        return history

    # Compile (separate program for a different iteration count would
    # recompile, so warm up with the real count).
    t0 = time.perf_counter()
    run(iters)
    compile_and_run = time.perf_counter() - t0

    t0 = time.perf_counter()
    history = run(iters)
    elapsed = time.perf_counter() - t0

    iou = float(history["iou_object"][-1])
    result = {
        "metric": f"joint_fit_{frames}f_{iters}it_seconds",
        "value": round(elapsed, 4),
        "unit": "s",
        "vs_baseline": round(baseline_s / elapsed, 4),
    }
    print(json.dumps(result))
    # Diagnostics on stderr-adjacent extra lines are avoided: the contract is
    # ONE json line; stash extras in the line itself? No — keep it clean.
    return result, {"compile_s": compile_and_run, "device": str(dev),
                    "final_iou": iou}


if __name__ == "__main__":
    main()
