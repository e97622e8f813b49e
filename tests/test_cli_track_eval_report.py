"""track_dataset / eval / report drivers on synthetic inputs."""
import os
import pickle

import numpy as np
import pytest


def test_track_dataset_gt_boxes(tmp_path):
    from homan_tpu.cli import track_dataset

    class FakeDataset:
        def __len__(self):
            return 2

        def __getitem__(self, idx):
            T = 6
            boxes = np.tile(np.array([10.0, 10, 50, 50]), (T, 1))
            boxes += np.arange(T)[:, None] * 2
            boxes[3] = np.nan  # missing detection
            return {
                "seq_idx": f"vid{idx}",
                "hands": [{"label": "right_hand", "bbox": boxes}],
                "objects": [{"bbox": boxes + 5}],
            }

    args = track_dataset.get_args(
        ["--dataset", "core50", "--save_root", str(tmp_path)])
    path = track_dataset.main(args, dataset=FakeDataset())
    with open(path, "rb") as f:
        tracked = pickle.load(f)
    assert set(tracked) == {"vid0", "vid1"}
    assert np.isfinite(tracked["vid0"]["right_hand"]).all()
    assert tracked["vid0"]["right_hand"].shape == (6, 4)


def test_report_html(tmp_path):
    from homan_tpu.eval import report
    sdir = tmp_path / "samples" / "00000000"
    sdir.mkdir(parents=True)
    with open(sdir / "results.pkl", "wb") as f:
        pickle.dump({
            "losses": {"loss": np.linspace(5, 1, 50).tolist()},
            "metrics": {"verts_dists_hand": [0.01, 0.02]},
        }, f)
    out = report.make_exp_html(str(tmp_path))
    assert os.path.exists(out)
    content = open(out).read()
    assert "verts_dists_hand" in content
    assert "polyline" in content  # svg loss curve
    assert "0.015" in content  # mean


def test_report_dump(tmp_path):
    from homan_tpu.eval import report
    p = report.dump({"lr": 0.01}, {"m": [1.0, 2.0]}, str(tmp_path / "r.pkl"))
    assert p["metrics"]["m"] == [1.0, 2.0]
    with open(tmp_path / "r.pkl", "rb") as f:
        assert pickle.load(f)["opts"]["lr"] == 0.01


def test_track_sequence_with_injected_detector():
    from homan_tpu.tracking.sequences import track_sequence
    rng = np.random.RandomState(0)
    frames = [np.zeros((100, 120, 3), np.uint8) for _ in range(5)]

    def detector(img):
        assert img.shape == (64, 64, 3)  # resized square
        return {"right_hand": np.array([10, 10, 30, 30]) + rng.randn(4),
                "objects": np.array([20, 20, 40, 40])}

    tracks = track_sequence(frames, detector,
                            {"right_hand": 1, "objects": 1}, image_size=64)
    assert tracks["right_hand"].shape == (5, 4)
    assert np.isfinite(tracks["objects"]).all()


@pytest.mark.slow
def test_eval_ho3d_on_fit_results(tmp_path):
    """Official-protocol loop (evalho3drecons.py:24-312): fabricate chunked
    fits over two sequences (one seen, one unseen-AP), interpolate to full
    rate, check seen/unseen assignment, codalab stream length, and that a
    perfect linear-motion fit scores zero error at every interpolated frame.
    """
    import json

    import jax.numpy as jnp
    from homan_tpu.cli.eval_ho3d import evaluate_results
    from homan_tpu.core.mano import ManoLayer
    from homan_tpu.core.meshes import bumpy_potato
    from homan_tpu.fit import model as M, postprocess

    layer = ManoLayer.synthetic(0)
    v, f = bumpy_potato(1, 0.08, seed=0)
    FULL_T = 6  # full sequence length; chunks only cover frames {0,2,3,5}
    K = np.eye(3, dtype=np.float32)

    def full_state(seed):
        # Linear per-frame motion => chunk->full interpolation is exact.
        rng = np.random.RandomState(seed)
        t0, dt = rng.randn(3) * 0.02, rng.randn(3) * 0.01
        tt = np.arange(FULL_T)[:, None]
        return M.init_state(
            M.HomanConfig(hand_sides=("right",)),
            translations_object=(np.array([[0, 0, 0.5]]) + t0 + tt * dt
                                 )[:, None],
            rotations_object=np.tile(np.eye(3), (FULL_T, 1, 1)),
            translations_hand=(np.array([[0.1, 0, 0.5]]) - t0 + tt * dt
                               )[:, None],
            rotations_hand=np.tile(np.eye(3), (FULL_T, 1, 1)),
            mano_pca_pose=np.zeros((FULL_T, 16)),
            mano_rot=np.zeros((FULL_T, 3)),
            mano_trans=np.zeros((FULL_T, 3)),
            mano_betas=np.zeros((FULL_T, 10)),
        )

    cfg = M.HomanConfig(hand_sides=("right",))
    seqs = {"SM1": full_state(0), "AP10": full_state(1)}
    fits = {s: postprocess.post_process(
        st, {"right": layer.params["right"]}, jnp.asarray(v), cfg)
        for s, st in seqs.items()}

    def slice_state(st, idxs):
        # int_scales_* are (1,) globals; everything else is per-frame
        return M.HomanState(**{
            k: np.asarray(val) if np.asarray(val).shape[0] == 1
            else np.asarray(val)[np.asarray(idxs)]
            for k, val in vars(st).items()})

    chunks = [("SM1", [0, 2]), ("SM1", [3, 5]),
              ("AP10", [0, 2]), ("AP10", [3, 5])]
    for i, (seq, fids) in enumerate(chunks):
        sdir = tmp_path / "samples" / f"{i:08d}"
        sdir.mkdir(parents=True)
        np.savez(sdir / "joint_fit.npz",
                 **postprocess.state_to_dict(slice_state(seqs[seq], fids)))

    class FakeDataset:
        image_size = 64
        vid_rows = [{"seq_idx": s, "frame_ids": list(range(FULL_T)),
                     "frame_nb": FULL_T} for s in seqs]

        def __getitem__(self, idx):
            seq, fids = chunks[idx]
            return {
                "seq_idx": seq,
                "frame_idxs": fids,
                "hands": [{"label": "right_hand"}],
                "objects": [{"canverts3d": v, "faces": f}],
                "camera": {"K": np.tile(K[None], (len(fids), 1, 1))},
            }

        def get_obj_verts_trans(self, seq, fid):
            return np.asarray(fits[seq]["verts_object"])[fid]

        def get_obj_verts_can(self, seq, fid):
            return v, f

        def get_joints3d(self, seq, fid):
            return np.asarray(fits[seq]["joints_hand"])[fid]

    summary = evaluate_results(str(tmp_path), FakeDataset(), layer,
                               dump_codalab=True, report=True,
                               render_videos=True,
                               boundary_idx=FULL_T)  # AP10 frames = unseen
    # Perfect linear "fit": zero errors at every interpolated frame
    assert summary["obj_dist"] < 1e-5
    assert summary["obj_dist_seen"] < 1e-5
    assert summary["obj_dist_unseen"] < 1e-5
    assert summary["hand_root"] < 1e-5
    # Seen/unseen keyed on the full-rate frame counter: 6 frames each
    with open(tmp_path / "eval_metrics.pkl", "rb") as fh:
        all_metrics = pickle.load(fh)["all"]
    assert len(all_metrics["obj_dist_seen"]) == FULL_T
    assert len(all_metrics["obj_dist_unseen"]) == FULL_T
    # Codalab stream covers every full-rate frame of both sequences
    with open(tmp_path / "pred.json") as fh:
        joints_pred, verts_pred = json.load(fh)
    assert len(joints_pred) == 2 * FULL_T and len(verts_pred) == 2 * FULL_T
    assert np.asarray(joints_pred[0]).shape == (21, 3)
    assert os.path.exists(tmp_path / "pred.zip")
    assert os.path.exists(tmp_path / "report.html")
    assert os.path.exists(tmp_path / "eval_report.html")
    assert os.path.exists(tmp_path / "test_vids" / "seq_SM1.mp4")
    assert os.path.exists(tmp_path / "test_vids" / "rot_AP10_000000.mp4")


def test_eval_skips_unfitted_sequence_but_counts_frames(tmp_path):
    """An official sequence with no fits must still advance the seen/unseen
    frame counter (the boundary is an absolute frame index)."""
    import jax.numpy as jnp
    from homan_tpu.cli.eval_ho3d import evaluate_results
    from homan_tpu.core.mano import ManoLayer
    from homan_tpu.core.meshes import bumpy_potato
    from homan_tpu.fit import model as M, postprocess

    layer = ManoLayer.synthetic(0)
    v, f = bumpy_potato(1, 0.08, seed=0)
    T = 2
    cfg = M.HomanConfig(hand_sides=("right",))
    state = M.init_state(
        cfg,
        translations_object=np.tile([[0, 0, 0.5]], (T, 1))[:, None],
        rotations_object=np.tile(np.eye(3), (T, 1, 1)),
        translations_hand=np.tile([[0.1, 0, 0.5]], (T, 1))[:, None],
        rotations_hand=np.tile(np.eye(3), (T, 1, 1)),
        mano_pca_pose=np.zeros((T, 16)), mano_rot=np.zeros((T, 3)),
        mano_trans=np.zeros((T, 3)), mano_betas=np.zeros((T, 10)))
    fit = postprocess.post_process(state, {"right": layer.params["right"]},
                                   jnp.asarray(v), cfg)
    # Only MPM10 has a fit; SM1 (6 frames, earlier in the ordering) has none
    sdir = tmp_path / "samples" / "00000000"
    sdir.mkdir(parents=True)
    np.savez(sdir / "joint_fit.npz", **postprocess.state_to_dict(state))

    class FakeDataset:
        image_size = 64
        vid_rows = [{"seq_idx": s, "frame_ids": [0, 1], "frame_nb": 2}
                    for s in ("MPM10",)] + [
                    {"seq_idx": "SM1", "frame_ids": list(range(6)),
                     "frame_nb": 6}]

        def __getitem__(self, idx):
            return {"seq_idx": "MPM10", "frame_idxs": [0, 1],
                    "hands": [{"label": "right_hand"}],
                    "objects": [{"canverts3d": v, "faces": f}],
                    "camera": {"K": np.tile(np.eye(3, dtype=np.float32)[None],
                                            (2, 1, 1))}}

        def get_obj_verts_trans(self, seq, fid):
            return np.asarray(fit["verts_object"])[fid]

        def get_obj_verts_can(self, seq, fid):
            return v, f

        def get_joints3d(self, seq, fid):
            return np.asarray(fit["joints_hand"])[fid]

    # boundary at 7: SM1's 6 skipped frames + MPM10 frame 0 are "seen",
    # MPM10 frame 1 is "unseen" — only if the counter advances over SM1
    summary = evaluate_results(str(tmp_path), FakeDataset(), layer,
                               report=False, inter_metrics=False,
                               boundary_idx=7)
    with open(tmp_path / "eval_metrics.pkl", "rb") as fh:
        all_metrics = pickle.load(fh)["all"]
    assert len(all_metrics["obj_dist_seen"]) == 1
    assert len(all_metrics["obj_dist_unseen"]) == 1


def test_compare_experiments(tmp_path):
    """Cross-experiment comparison table (homan/eval/analyze.py role)."""
    from homan_tpu.eval import report
    for name, lr, err in (("expA", 0.01, 0.02), ("expB", 0.001, 0.01)):
        root = tmp_path / name
        root.mkdir()
        report.dump({"lr": lr, "same_opt": 1},
                    {"verts_dists_hand": [err, err * 2]},
                    str(root / "results.pkl"))
    out = report.compare_experiments(
        [str(tmp_path / "expA"), str(tmp_path / "expB")],
        str(tmp_path / "cmp.html"), sort_metric="verts_dists_hand")
    content = open(out).read()
    assert "expA" in content and "expB" in content
    assert "lr" in content           # differing option shown
    assert "same_opt" not in content  # identical option hidden
    # sorted by the metric: expB (smaller error) first
    assert content.index("expB") < content.index("expA")


def test_codalab_joint_order_is_exact_inverse():
    """UNORDER_IDXS must invert the HO3D->ours reorder exactly (the
    reference's hardcoded unorder table has an off-by-one, documented in
    cli/eval_ho3d.py)."""
    from homan_tpu.cli.eval_ho3d import UNORDER_IDXS
    from homan_tpu.core.mano import JOINT_REORDER
    reorder = np.asarray(JOINT_REORDER)
    np.testing.assert_array_equal(reorder[UNORDER_IDXS], np.arange(21))
    np.testing.assert_array_equal(UNORDER_IDXS[reorder], np.arange(21))


def test_eval_resolves_chunk_schedule_from_fit_opts(tmp_path):
    """eval_ho3d fills frame_nb/chunk_step from the fit run's recorded
    opts (results.pkl) so dataset[int(sample_dir)] pairs with the chunk
    the fit actually saw; explicit flags win (with a warning); reference
    defaults apply when nothing is recorded (evalho3drecons.py:26,38)."""
    import argparse
    import pickle

    from homan_tpu.cli.eval_ho3d import _resolve_fit_options

    root = tmp_path / "res"
    root.mkdir()
    with open(root / "results.pkl", "wb") as f:
        pickle.dump({"opts": {"chunk_step": 4, "frame_nb": 30}}, f)

    ns = argparse.Namespace(results_root=str(root), chunk_step=None,
                            frame_nb=None)
    _resolve_fit_options(ns)
    assert (ns.chunk_step, ns.frame_nb) == (4, 30)

    ns2 = argparse.Namespace(results_root=str(root), chunk_step=2,
                             frame_nb=None)
    _resolve_fit_options(ns2)  # explicit flag kept, recorded fills the rest
    assert (ns2.chunk_step, ns2.frame_nb) == (2, 30)

    ns3 = argparse.Namespace(results_root=str(tmp_path), chunk_step=None,
                             frame_nb=None)
    _resolve_fit_options(ns3)  # nothing recorded -> reference defaults
    assert (ns3.chunk_step, ns3.frame_nb) == (1, 10)
