"""Offline HO-3D evaluation (evalho3drecons.py equivalent).

Implements the official protocol (evalho3drecons.py:24-312 +
homan/eval/ho3devalutils.py:16-96):

  1. Walk {results_root}/samples/*/joint_fit.npz and rebuild per-frame
     geometry from the checkpointed fit parameters (fit.postprocess).
  2. Group chunk fits by sequence and linearly interpolate them to the FULL
     sequence framerate (ho3devalutils.py:53-96 via
     pointmetrics.interpolate_sequence).
  3. Walk the 13 test sequences in the official ordering (EVAL_SEQ_ORDER,
     evalho3drecons.py:66-69) and score every full-rate frame: object vert
     distance + ADD-S with the seen/unseen split keyed on the running frame
     index vs SEEN_UNSEEN_BOUNDARY_IDX=7694 (evalho3drecons.py:140-147),
     hand root error (:160-162), SDF contact / penetration depth (:176-188).
  4. Render turntable videos every display_freq frames and one
     middle-of-sequence overlay video per sequence (:163-174, 191-221).
  5. Dump codalab pred.json/pred.zip over the full interpolated frame stream
     in HO3D's joint order and coordinate frame (ho3devalutils.py:16-33),
     and an HTML report of per-sequence means.

Metrics run batched on-device (frame batches), not per-frame host calls.
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import zipfile
from collections import OrderedDict, defaultdict
from typing import Dict

import numpy as np

from homan_tpu.core.mano import JOINT_REORDER
from homan_tpu.data.ho3d import EVAL_SEQ_ORDER, SEEN_UNSEEN_BOUNDARY_IDX

# Ours -> HO3D joint convention: exact inverse of JOINT_REORDER
# (homan/datasets/ho3d.py:73-76). The reference hardcodes `unorder_idxs` at
# evalho3drecons.py:105-107 with an off-by-one (indices 4-6 read 10,11,12
# instead of 9,10,11, duplicating 12 and dropping 9); we use the true inverse.
UNORDER_IDXS = np.argsort(np.asarray(JOINT_REORDER))
# Predictions are fit in the flipped camera frame (camextr y/z flip,
# homan/datasets/ho3d.py:83); codalab wants the original HO3D frame. The flip
# is self-inverse (evalho3drecons.py:101 applies the same matrix both ways).
CAMEXTR3 = np.array([[1.0, 0, 0], [0, -1, 0], [0, 0, -1]], np.float32)


def get_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--results_root",
                        help="experiment root holding samples/*/joint_fit*")
    parser.add_argument("--root", help="reference-compatible alias for "
                        "--results_root (evalho3drecons.py:25)")
    parser.add_argument("--dataset", default="ho3d", choices=["ho3d"],
                        help="accepted for reference CLI compatibility; the "
                             "official protocol is HO3D-specific")
    parser.add_argument("--split", default="test")
    parser.add_argument("--frame_nb", default=None, type=int,
                        help="frames per chunk used when fitting "
                             "(evalho3drecons.py:26); defaults to the value "
                             "recorded by the fit run (results.pkl opts), "
                             "else the reference default 10")
    parser.add_argument("--box_mode", default="gt", choices=["gt", "track"])
    parser.add_argument("--chunk_step", default=None, type=int,
                        help="defaults to the fit run's recorded value "
                             "(results.pkl opts), else the reference "
                             "default 1 (evalho3drecons.py:38) — which "
                             "silently mismatches fit_video's default 4; "
                             "sample indices only pair with the right GT "
                             "chunk when this equals the fit's setting")
    parser.add_argument("--mano_root", default="extra_data/mano")
    parser.add_argument("--dump_codalab", action="store_true")
    parser.add_argument("--report", action="store_true")
    parser.add_argument("--render_videos", action="store_true")
    parser.add_argument("--display_freq", default=1000, type=int,
                        help="turntable video every N full-rate frames "
                             "(evalho3drecons.py:37)")
    args = parser.parse_args(argv)
    if args.results_root is None:
        args.results_root = args.root
    if args.results_root is None:
        parser.error("one of --results_root / --root is required")
    _resolve_fit_options(args)
    return args


def _resolve_fit_options(args):
    """Match the eval dataset's chunk schedule to the fit run under eval.

    collect_sequence_results pairs sample folder NN with dataset[NN], which
    is only the chunk the fit actually saw when (frame_nb, chunk_step)
    equal the fit's settings. The reference ships a silent desync (fit
    default chunk_step=4, eval default 1, evalho3drecons.py:38 vs
    fit_vid_dataset.py:46-48); here any flag the user left unset is filled
    from the fit driver's recorded opts ({results_root}/results.pkl), and
    an explicit mismatch warns loudly instead of mis-pairing GT silently.
    """
    import logging
    recorded: Dict = {}
    try:
        with open(os.path.join(args.results_root, "results.pkl"), "rb") as f:
            recorded = pickle.load(f).get("opts", {}) or {}
    except Exception:
        pass
    for flag, ref_default in (("chunk_step", 1), ("frame_nb", 10)):
        given = getattr(args, flag)
        rec = recorded.get(flag)
        if given is None:
            setattr(args, flag, int(rec) if rec is not None else ref_default)
        elif rec is not None and int(rec) != int(given):
            logging.getLogger(__name__).warning(
                "--%s %s does not match the fit run's recorded %s=%s "
                "(results.pkl); sample indices will pair with DIFFERENT "
                "chunks' ground truth", flag, given, flag, rec)


def collect_sequence_results(results_root: str, dataset, mano_layer):
    """samples/*/joint_fit.npz -> seq_res[seq][frame_pos] = per-frame dict
    (evalho3drecons.py:78-97 flow). frame_pos is the position of the frame
    within its sequence's full frame list."""
    import jax.numpy as jnp
    from homan_tpu.fit import model as M
    from homan_tpu.fit import postprocess

    samples_dir = os.path.join(results_root, "samples")
    seq_res: Dict[str, "OrderedDict[int, Dict]"] = defaultdict(OrderedDict)
    missing = []
    names = sorted(os.listdir(samples_dir)) if os.path.isdir(
        samples_dir) else []
    for name in names:
        fit_path = os.path.join(samples_dir, name, "joint_fit.npz")
        if not os.path.exists(fit_path):
            missing.append(name)
            continue
        annots = dataset[int(name)]
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
        seq = annots.get("seq_idx", name)
        frame_idxs = annots.get("frame_idxs",
                                list(range(len(annots["hands"][0]["bbox"])
                                           if "bbox" in annots["hands"][0]
                                           else np.asarray(
                                               fit["verts_object"]).shape[0])))
        hand_nb = len(annots["hands"])
        verts_hand = np.asarray(fit["verts_hand"])
        joints_hand = np.asarray(fit["joints_hand"])
        verts_obj = np.asarray(fit["verts_object"])
        images = annots.get("images")
        for i, fid in enumerate(frame_idxs):
            # interleaved [h1_t1, h2_t1, h1_t2, ...] layout: hand 0 of
            # frame i sits at i*hand_nb (homan/homan.py:61-64 convention)
            seq_res[seq][int(fid)] = {
                "hand_verts3d": verts_hand[i * hand_nb],
                "hand_joints3d": joints_hand[i * hand_nb],
                "obj_verts3d": verts_obj[i],
                "camintr": np.asarray(annots["camera"]["K"][i])
                if "camera" in annots else None,
                "img_path": (annots.get("image_paths") or [None] * (i + 1))[i]
                if "image_paths" in annots else None,
                "image": images[i] if images is not None else None,
            }
    return seq_res, missing


def _interp_sequence(frames_dict: "OrderedDict[int, Dict]", positions,
                     frame_nb: int, keys):
    """Chunk-frame dicts -> full-rate stacked arrays per key
    (ho3devalutils.py:53-96 via np.interp; clamped extrapolation)."""
    from homan_tpu.eval.pointmetrics import interpolate_sequence
    chunk_pos = np.asarray(positions, np.float64)
    out = {}
    for key in keys:
        vals = np.stack([frames_dict[f][key] for f in frames_dict], axis=0)
        out[key] = interpolate_sequence(chunk_pos, vals,
                                        np.arange(frame_nb, dtype=np.float64))
    return out


def _batched_obj_metrics(gt: np.ndarray, pred: np.ndarray,
                         batch: int = 64):
    """Per-frame object vert distance + ADD-S, batched on device."""
    import jax.numpy as jnp
    from homan_tpu.eval import pointmetrics
    dists, adds = [], []
    for s in range(0, gt.shape[0], batch):
        g = jnp.asarray(gt[s:s + batch])
        p = jnp.asarray(pred[s:s + batch])
        dists += [float(x) for x in pointmetrics.verts_dists(g, p)]
        adds += [float(x) for x in pointmetrics.add_s(g, p)]
    return dists, adds


def _batched_inter_metrics(hand: np.ndarray, obj: np.ndarray,
                           hand_faces, obj_faces, batch: int = 64):
    from homan_tpu.eval import pointmetrics
    pen, contact = [], []
    for s in range(0, hand.shape[0], batch):
        import jax.numpy as jnp
        m = pointmetrics.get_inter_metrics(
            jnp.asarray(hand[s:s + batch]), jnp.asarray(obj[s:s + batch]),
            hand_faces, obj_faces)
        pen += m["pen_depths"]
        contact += [float(c) for c in m["has_contact"]]
    return pen, contact


def evaluate_results(results_root: str, dataset, mano_layer,
                     dump_codalab: bool = False, report: bool = True,
                     render_videos: bool = False, display_freq: int = 1000,
                     sequences=None,
                     boundary_idx: int = SEEN_UNSEEN_BOUNDARY_IDX,
                     inter_metrics: bool = True):
    """Run the full protocol; returns the aggregated metric summary.

    The dataset must expose `vid_rows` (seq -> frame_ids),
    `get_obj_verts_trans(seq, fid)`, `get_joints3d(seq, fid)` and chunk-mode
    `__getitem__`; homan_tpu.data.ho3d.HO3D does.
    """
    from homan_tpu.eval import report as report_lib
    from homan_tpu.viz import render_viz

    seq_res, missing = collect_sequence_results(results_root, dataset,
                                                mano_layer)
    if missing:
        print(f"Missing {len(missing)} samples {missing[:10]} "
              f"at {results_root}/samples")

    vid_rows = {row["seq_idx"]: row for row in dataset.vid_rows}
    if sequences is None:
        sequences = [s for s in EVAL_SEQ_ORDER
                     if s in seq_res or s in vid_rows]
        # Any fitted sequence outside the official ordering (fabricated test
        # trees) is appended so nothing silently drops.
        sequences += [s for s in seq_res if s not in EVAL_SEQ_ORDER]

    hand_faces = mano_layer.faces("right")
    vid_folder = os.path.join(results_root, "test_vids")
    if render_videos:
        os.makedirs(vid_folder, exist_ok=True)

    loss_errors = defaultdict(list)
    full_html_rows = []
    codalab_joints, codalab_verts = [], []
    full_idx = 0
    for seq in sequences:
        row = vid_rows[seq]
        if seq not in seq_res:
            # Unfitted official sequence: its frames still occupy positions
            # in the full-rate ordering — advance the seen/unseen counter so
            # later sequences keep the correct boundary.
            print(f"No fits for sequence {seq}: skipping "
                  f"{len(row['frame_ids'])} frames "
                  "(seen/unseen counter advanced)")
            full_idx += len(row["frame_ids"])
            continue
        frame_ids = list(row["frame_ids"])
        frame_nb = len(frame_ids)
        print(f"Evaluating {seq}: {len(seq_res[seq])} fitted frames -> "
              f"{frame_nb} full-rate frames")
        pos_of = {fid: i for i, fid in enumerate(frame_ids)}
        frames_dict = seq_res[seq]
        positions = [pos_of[f] for f in sorted(frames_dict)]
        frames_dict = OrderedDict(
            (f, frames_dict[f]) for f in sorted(frames_dict))
        interp = _interp_sequence(
            frames_dict, positions, frame_nb,
            keys=("hand_verts3d", "hand_joints3d", "obj_verts3d"))

        # GT per full-rate frame, flipped camera frame (dataset applies
        # camextr; the reference flips in eval instead — same metric values
        # since the flip is orthogonal).
        gt_obj = np.stack([dataset.get_obj_verts_trans(seq, fid)
                           for fid in frame_ids])
        gt_roots = np.stack([dataset.get_joints3d(seq, fid)[0]
                             for fid in frame_ids])
        obj_faces = np.asarray(
            dataset.get_obj_verts_can(seq, frame_ids[0])[1])

        seq_errors = defaultdict(list)
        obj_dists, obj_adds = _batched_obj_metrics(gt_obj,
                                                   interp["obj_verts3d"])
        root_errs = np.linalg.norm(
            interp["hand_joints3d"][:, 0] - gt_roots, axis=-1)
        pen_depths, contacts = ([], [])
        if inter_metrics:
            pen_depths, contacts = _batched_inter_metrics(
                interp["hand_verts3d"], interp["obj_verts3d"],
                hand_faces, obj_faces)

        seq_frame_vid_idx = 0
        for fpos in range(frame_nb):
            loss_errors["obj_dist"].append(obj_dists[fpos])
            loss_errors["obj_add-s"].append(obj_adds[fpos])
            seq_errors["obj_dist"].append(obj_dists[fpos])
            seq_errors["obj_add-s"].append(obj_adds[fpos])
            # AP (unseen-object) frames start at index 7694 of the official
            # full-rate ordering (evalho3drecons.py:140-147)
            if full_idx >= boundary_idx:
                loss_errors["obj_dist_unseen"].append(obj_dists[fpos])
                loss_errors["add-s_unseen"].append(obj_adds[fpos])
            else:
                loss_errors["obj_dist_seen"].append(obj_dists[fpos])
                loss_errors["add-s_seen"].append(obj_adds[fpos])
            full_idx += 1
            loss_errors["hand_root"].append(float(root_errs[fpos]))
            seq_errors["hand_root"].append(float(root_errs[fpos]))
            if inter_metrics:
                loss_errors["has_contact"].append(contacts[fpos])
                seq_errors["has_contact"].append(contacts[fpos])
                loss_errors["pen_depths"].append(pen_depths[fpos])
                seq_errors["pen_depths"].append(pen_depths[fpos])

            # codalab stream: HO3D joint order, original HO3D frame
            codalab_joints.append(
                (interp["hand_joints3d"][fpos] @ CAMEXTR3)[UNORDER_IDXS])
            codalab_verts.append(interp["hand_verts3d"][fpos] @ CAMEXTR3)

        seq_html = {"seq": seq}
        if render_videos:
            camintr_px = None
            first = next(iter(frames_dict.values()))
            if first.get("camintr") is not None:
                camintr_px = np.asarray(first["camintr"], np.float64)
            K_nc = np.eye(3) if camintr_px is None else camintr_px.copy()
            if camintr_px is not None:
                K_nc[:2] = K_nc[:2] / getattr(dataset, "image_size", 640)
            K_nc = np.tile(K_nc[None].astype(np.float32), (frame_nb, 1, 1))
            # turntable every display_freq frames (evalho3drecons.py:163-174)
            for fpos in range(0, frame_nb, max(1, display_freq)):
                path = os.path.join(
                    vid_folder, f"rot_{seq}_{seq_frame_vid_idx:06d}.mp4")
                frames = render_viz.turntable_frames(
                    [interp["hand_verts3d"][fpos:fpos + 1],
                     interp["obj_verts3d"][fpos:fpos + 1]],
                    [hand_faces, obj_faces], ["grey", "gold"],
                    K_nc[fpos:fpos + 1], n_steps=12, image_size=128)
                render_viz.make_video(frames, path)
                seq_html[f"rot_{seq_frame_vid_idx:05d}_video_path"] = path
                seq_frame_vid_idx += 1
            # middle-of-sequence overlay video (evalho3drecons.py:191-221)
            half = 30
            mid = frame_nb // 2
            sl = slice(max(0, mid - half), min(frame_nb, mid + half))
            frames = render_viz.render_scene(
                [interp["hand_verts3d"][sl], interp["obj_verts3d"][sl]],
                [hand_faces, obj_faces], ["grey", "gold"],
                K_nc[sl], image_size=128)
            path = os.path.join(vid_folder, f"seq_{seq}.mp4")
            render_viz.make_video(frames, path)
            seq_html["clip_video_path"] = path
        for key, vals in seq_errors.items():
            seq_html[key] = float(np.mean(vals))
        full_html_rows.append(seq_html)

    summary = {k: float(np.mean(v)) for k, v in loss_errors.items() if v}
    summary_median = {k: float(np.median(v))
                      for k, v in loss_errors.items() if v}
    summary_max = {k: float(np.max(v)) for k, v in loss_errors.items() if v}
    # The reference prints all three aggregates (evalho3drecons.py:227-238)
    print("Mean errors");   print(summary)
    print("Median errors"); print(summary_median)
    print("Max errors");    print(summary_max)

    if dump_codalab:
        dump_codalab_pred(os.path.join(results_root, "pred.json"),
                          codalab_joints, codalab_verts)
    if report:
        report_lib.make_exp_html(results_root)
        eval_html = os.path.join(results_root, "eval_report.html")
        write_eval_html(eval_html, summary, full_html_rows)
    with open(os.path.join(results_root, "eval_metrics.pkl"), "wb") as f:
        pickle.dump({"summary": summary, "median": summary_median,
                     "max": summary_max, "all": dict(loss_errors),
                     "per_seq": full_html_rows}, f)
    return summary


def dump_codalab_pred(pred_path: str, joints_list, verts_list):
    """Official-format pred.json + zip (ho3devalutils.py:16-33): a 2-list
    [joints, verts], 4-decimal rounding."""
    payload = [[np.asarray(j).round(4).tolist() for j in joints_list],
               [np.asarray(v).round(4).tolist() for v in verts_list]]
    with open(pred_path, "w") as f:
        json.dump(payload, f)
    with zipfile.ZipFile(pred_path.replace(".json", ".zip"), "w",
                         zipfile.ZIP_DEFLATED) as z:
        z.write(pred_path, "pred.json")
    print(f"Dumped {len(payload[0])} joint and {len(payload[1])} vert "
          f"predictions to {pred_path}(.zip)")


def write_eval_html(path: str, summary: Dict, per_seq_rows):
    """Per-sequence mean table + overall summary (analyze.make_exp_html
    role at evalho3drecons.py:240-247), dependency-free HTML."""
    cols = sorted({k for row in per_seq_rows for k in row
                   if not k.endswith("video_path")})
    parts = ["<html><body><h1>HO3D evaluation</h1><h2>Summary</h2><table>"]
    for k in sorted(summary):
        parts.append(f"<tr><td>{k}</td><td>{summary[k]:.5f}</td></tr>")
    parts.append("</table><h2>Per sequence</h2><table><tr>")
    parts += [f"<th>{c}</th>" for c in cols]
    parts.append("<th>videos</th></tr>")
    for row in per_seq_rows:
        parts.append("<tr>")
        for c in cols:
            v = row.get(c, "")
            parts.append(f"<td>{v:.5f}</td>" if isinstance(v, float)
                         else f"<td>{v}</td>")
        vids = [f'<a href="{row[k]}">{k}</a>' for k in row
                if k.endswith("video_path")]
        parts.append("<td>" + " ".join(vids) + "</td></tr>")
    parts.append("</table></body></html>")
    with open(path, "w") as f:
        f.write("".join(parts))
    return path


def main(args):
    from homan_tpu.core.mano import ManoLayer
    from homan_tpu.data.factory import get_dataset
    dataset, _ = get_dataset("ho3d", split=args.split, load_img=False,
                             frame_nb=args.frame_nb, box_mode=args.box_mode,
                             chunk_step=args.chunk_step,
                             mano_root=args.mano_root)
    if os.path.exists(os.path.join(args.mano_root, "MANO_RIGHT.pkl")):
        mano_layer = ManoLayer.from_folder(args.mano_root)
    else:
        mano_layer = ManoLayer.synthetic(0)
    summary = evaluate_results(args.results_root, dataset, mano_layer,
                               dump_codalab=args.dump_codalab,
                               report=args.report,
                               render_videos=args.render_videos,
                               display_freq=args.display_freq)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main(get_args())
