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


def test_eval_ho3d_on_fit_results(tmp_path, monkeypatch):
    """Full loop: fabricate a fit result + dataset, run the evaluator."""
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
        mano_pca_pose=np.zeros((T, 16)),
        mano_rot=np.zeros((T, 3)),
        mano_trans=np.zeros((T, 3)),
        mano_betas=np.zeros((T, 10)),
    )
    sdir = tmp_path / "samples" / "00000000"
    sdir.mkdir(parents=True)
    np.savez(sdir / "joint_fit.npz", **postprocess.state_to_dict(state))

    fit = postprocess.post_process(state, {"right": layer.params["right"]},
                                   jnp.asarray(v), cfg)

    class FakeDataset:
        def __getitem__(self, idx):
            return {
                "hands": [{"label": "right_hand",
                           "verts3d": np.asarray(fit["verts_hand"]),
                           "joints3d": np.asarray(fit["joints_hand"])[:, :21]}],
                "objects": [{"canverts3d": v, "faces": f,
                             "verts3d": np.asarray(fit["verts_object"])}],
            }

    summary = evaluate_results(str(tmp_path), FakeDataset(), layer,
                               dump_codalab=True, report=True)
    # Perfect "fit": zero errors
    assert summary["verts_dists_hand"] < 1e-5
    assert summary["hand_root_err"] < 1e-5
    assert summary["verts_dists_obj_seen"] < 1e-5
    assert os.path.exists(tmp_path / "pred.json")
    assert os.path.exists(tmp_path / "pred.zip")
    assert os.path.exists(tmp_path / "report.html")
