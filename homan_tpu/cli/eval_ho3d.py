"""Offline HO-3D evaluation (evalho3drecons.py equivalent).

Walks {results_root}/samples/*/joint_fit.npz, rebuilds geometry
(fit.postprocess), linearly interpolates chunk results to full sequences,
computes object vert distance / ADD-S (seen/unseen YCB split), hand MEPE and
root error, SDF contact/penetration, writes a codalab-style pred.json and an
HTML report.
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import zipfile
from collections import defaultdict

import numpy as np

from homan_tpu.data.ho3d import SEEN_UNSEEN_BOUNDARY_IDX


def get_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--results_root", required=True)
    parser.add_argument("--split", default="test")
    parser.add_argument("--mano_root", default="extra_data/mano")
    parser.add_argument("--dump_codalab", action="store_true")
    parser.add_argument("--report", action="store_true")
    return parser.parse_args(argv)


def evaluate_results(results_root: str, dataset, mano_layer,
                     dump_codalab: bool = False, report: bool = True):
    """Returns aggregated metric dict; optionally writes pred.json(.zip) and
    report.html (evalho3drecons.py:24-312 flow)."""
    import jax.numpy as jnp
    from homan_tpu.eval import pointmetrics, report as report_lib
    from homan_tpu.fit import model as M
    from homan_tpu.fit import postprocess

    samples_dir = os.path.join(results_root, "samples")
    all_metrics = defaultdict(list)
    codalab_joints = []
    codalab_verts = []
    missing = []
    for name in sorted(os.listdir(samples_dir)) if os.path.isdir(
            samples_dir) else []:
        fit_path = os.path.join(samples_dir, name, "joint_fit.npz")
        if not os.path.exists(fit_path):
            missing.append(name)
            continue
        sample_idx = int(name)
        annots = dataset[sample_idx]
        ck = np.load(fit_path)
        state = postprocess.state_from_dict({k: ck[k] for k in ck.files})
        sides = tuple(h["label"].replace("_hand", "")
                      for h in annots["hands"])
        cfg = M.HomanConfig(hand_sides=sides)
        obj_verts_can = np.asarray(annots["objects"][0]["canverts3d"])
        if obj_verts_can.ndim == 3:
            obj_verts_can = obj_verts_can[0]
        fit = postprocess.post_process(
            state, {s: mano_layer.params[s] for s in sides},
            jnp.asarray(obj_verts_can), cfg)

        gt_obj = annots["objects"][0].get("verts3d")
        if gt_obj is not None:
            gt_obj = jnp.asarray(gt_obj)
            m = pointmetrics.get_point_metrics(gt_obj, fit["verts_object"])
            suffix = ("_seen" if sample_idx < SEEN_UNSEEN_BOUNDARY_IDX
                      else "_unseen")
            for k, v in m.items():
                all_metrics[f"{k}_obj{suffix}"].extend(v)
        gt_hand = annots["hands"][0].get("verts3d")
        gt_joints = annots["hands"][0].get("joints3d")
        if gt_hand is not None and np.abs(np.asarray(gt_hand)).sum() > 0:
            gt_hand = jnp.asarray(gt_hand).reshape(-1, 778, 3)
            m = pointmetrics.get_point_metrics(gt_hand, fit["verts_hand"])
            all_metrics["verts_dists_hand"].extend(m["verts_dists"])
            a = pointmetrics.get_align_metrics(
                gt_hand, fit["verts_hand"], gt_obj, fit["verts_object"]
            ) if gt_obj is not None else {}
            for k, v in a.items():
                all_metrics[k].extend(v)
        if gt_joints is not None:
            pred_root = np.asarray(fit["joints_hand"])[:, 0]
            gt_root = np.asarray(gt_joints)[:, 0]
            all_metrics["hand_root_err"].extend(
                np.linalg.norm(pred_root - gt_root, axis=-1).tolist())
        from homan_tpu.eval.pointmetrics import get_inter_metrics
        inter = get_inter_metrics(
            fit["verts_hand"], fit["verts_object"],
            mano_layer.faces("right"),
            np.asarray(annots["objects"][0]["faces"])[0]
            if np.asarray(annots["objects"][0]["faces"]).ndim == 3
            else annots["objects"][0]["faces"])
        all_metrics["penetration_depths"].extend(inter["penetration_depths"])
        all_metrics["contacts"].extend(
            [float(c) for c in inter["contacts"]])

        codalab_joints.append(np.asarray(fit["joints_hand"]).tolist())
        codalab_verts.append(np.asarray(fit["verts_hand"]).tolist())

    if missing:
        print(f"{len(missing)} samples missing fits: {missing[:10]}...")
    if dump_codalab:
        pred_path = os.path.join(results_root, "pred.json")
        with open(pred_path, "w") as f:
            json.dump([codalab_joints, codalab_verts], f)
        with zipfile.ZipFile(pred_path.replace(".json", ".zip"), "w") as z:
            z.write(pred_path, "pred.json")
    if report:
        report_lib.make_exp_html(results_root)
    summary = {k: float(np.mean(v)) for k, v in all_metrics.items() if v}
    with open(os.path.join(results_root, "eval_metrics.pkl"), "wb") as f:
        pickle.dump({"summary": summary, "all": dict(all_metrics)}, f)
    return summary


def main(args):
    from homan_tpu.core.mano import ManoLayer
    from homan_tpu.data.factory import get_dataset
    dataset, _ = get_dataset("ho3d", split=args.split, load_img=False,
                             mano_root=args.mano_root)
    if os.path.exists(os.path.join(args.mano_root, "MANO_RIGHT.pkl")):
        mano_layer = ManoLayer.from_folder(args.mano_root)
    else:
        mano_layer = ManoLayer.synthetic(0)
    summary = evaluate_results(args.results_root, dataset, mano_layer,
                               dump_codalab=args.dump_codalab,
                               report=args.report)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main(get_args())
