"""End-to-end CLI driver test: fit_video on a fabricated HO3D tree with GT
-mask evidence (the reference's --gt_masks ablation path)."""
import os
import pickle

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy e2e fits


@pytest.fixture(scope="module")
def ho3d_tree(tmp_path_factory):
    from homan_tpu.core.meshes import bumpy_potato, save_obj
    root = tmp_path_factory.mktemp("ho3d_cli")
    seq = "ABF11"
    meta = root / "ho3d" / "train" / seq / "meta"
    meta.mkdir(parents=True)
    rng = np.random.RandomState(0)
    K = np.array([[614.0, 0, 320.0], [0, 614.0, 240.0], [0, 0, 1]])
    for i in range(4):
        annot = {
            "camMat": K,
            "handJoints3D": rng.randn(21, 3) * 0.02 + [0.1, 0, -0.5],
            "handPose": (rng.randn(48) * 0.05).astype(np.float64),
            "handTrans": np.array([0.1, 0.0, -0.5]),
            "handBeta": np.zeros(10),
            "objName": "003_cracker_box",
            "objRot": (np.array([0.2, 0.1, 0.05]) * (1 + 0.1 * i)).reshape(3, 1),
            "objTrans": np.array([0.0, 0.0, -0.45]),
        }
        with open(meta / f"{i:04d}.pkl", "wb") as f:
            pickle.dump(annot, f)
    ycb = root / "ycbmodels" / "003_cracker_box"
    ycb.mkdir(parents=True)
    v, fc = bumpy_potato(2, 0.08, seed=1)
    save_obj(str(ycb / "textured_simple_2000.obj"), v, fc)
    return str(root)


def test_fit_video_gt_masks_end_to_end(ho3d_tree, tmp_path, monkeypatch):
    from homan_tpu.cli import fit_video

    monkeypatch.chdir(tmp_path)
    result_root = str(tmp_path / "results")
    args = fit_video.get_args([
        "--dataset", "ho3d", "--split", "val",
        "--gt_masks", "1",
        "--frame_nb", "3", "--chunk_step", "1",
        "--data_step", "100",
        "--num_initializations", "24",
        "--num_obj_iterations", "10",
        "--num_joint_iterations", "15",
        "--viz_step", "5",
        "--rend_size", "64",
        "--result_root", result_root,
        "--mano_root", str(tmp_path / "no_mano"),
    ])
    # Point the dataset at the fabricated tree
    import homan_tpu.data.factory as factory
    orig = factory.get_dataset

    def patched(name, **kw):
        kw.update(root=ho3d_tree,
                  ycb_root=os.path.join(ho3d_tree, "ycbmodels"),
                  cache_folder=str(tmp_path / "cache"), load_img=False)
        from homan_tpu.core.mano import ManoLayer
        kw["mano_layer"] = ManoLayer.synthetic(0)
        kw.pop("mano_root", None)
        return orig(name, **kw)

    monkeypatch.setattr("homan_tpu.data.factory.get_dataset", patched)
    monkeypatch.setattr("homan_tpu.cli.fit_video.get_dataset", patched,
                        raising=False)

    fit_video.main(args)

    sample_dir = os.path.join(result_root, "samples", "00000000")
    assert os.path.exists(os.path.join(sample_dir, "indep_fit.pkl"))
    assert os.path.exists(os.path.join(sample_dir, "joint_fit.npz"))
    assert os.path.exists(os.path.join(sample_dir, "results.pkl"))
    # --viz_step chunks the scan and records an optimization-evolution video
    assert os.path.exists(os.path.join(sample_dir, "optim_evolution.webm"))
    with open(os.path.join(sample_dir, "results.pkl"), "rb") as f:
        res = pickle.load(f)
    assert "metrics" in res and "losses" in res
    losses = np.asarray(res["losses"]["loss"])
    assert losses.shape == (15,)
    assert np.isfinite(losses).all()
    # hand metric present (GT verts available in this tree), plus the
    # reference driver's aligned / init / interaction metric set
    # (fit_vid_dataset.py:471-516 key naming).
    for key in ("verts_dists_hand", "verts_dists_hand_init",
                "chamfer_dists_obj", "chamfer_dists_obj_init",
                "hand_mean_aligned", "obj_chamfer_aligned",
                "hand_mean_aligned_init", "pen_depths", "has_contact",
                "pen_depths_init"):
        assert key in res["metrics"], key
    # Step-2 refinement recipe (reference README.md:228-238): resume from the
    # step-1 checkpoint with the SDF collision + contact terms switched on.
    # This drives the closed-fist topology derivation through the CLI
    # (config 3; homan/lossutils.py:43-64,112-130).
    args2 = fit_video.get_args([
        "--dataset", "ho3d", "--split", "val", "--gt_masks", "1",
        "--frame_nb", "3", "--chunk_step", "1",
        "--num_joint_iterations", "2", "--rend_size", "64",
        "--lw_collision", "0.001", "--lw_contact", "1.0",
        "--result_root", str(tmp_path / "results2"),
        "--resume", result_root,
        "--mano_root", str(tmp_path / "no_mano"),
    ])
    fit_video.main(args2)
    sample2 = os.path.join(str(tmp_path / "results2"), "samples", "00000000")
    assert os.path.exists(os.path.join(sample2, "joint_fit.npz"))
    with open(os.path.join(sample2, "results.pkl"), "rb") as f:
        res2 = pickle.load(f)
    assert "loss_collision" in res2["losses"]
    assert "loss_contact" in res2["losses"]
    assert np.isfinite(np.asarray(res2["losses"]["loss"])).all()


def test_fit_video_frames_sharded(ho3d_tree, tmp_path, monkeypatch):
    """--frames_sharded 1 routes stage C through the sequence-parallel path
    (frame axis over the largest dividing device count — 4 frames -> 4 of
    the 8 virtual devices) and still writes a valid fit."""
    from homan_tpu.cli import fit_video

    monkeypatch.chdir(tmp_path)
    result_root = str(tmp_path / "results_sharded")
    args = fit_video.get_args([
        "--dataset", "ho3d", "--split", "val",
        "--gt_masks", "1",
        "--frame_nb", "4", "--chunk_step", "1",
        "--num_initializations", "24",
        "--num_obj_iterations", "5",
        "--num_joint_iterations", "6",
        "--viz_step", "0",
        "--rend_size", "64",
        "--frames_sharded", "1",
        "--result_root", result_root,
        "--mano_root", str(tmp_path / "no_mano"),
    ])
    import homan_tpu.data.factory as factory
    orig = factory.get_dataset

    def patched(name, **kw):
        kw.update(root=ho3d_tree,
                  ycb_root=os.path.join(ho3d_tree, "ycbmodels"),
                  cache_folder=str(tmp_path / "cache_sharded"),
                  load_img=False)
        from homan_tpu.core.mano import ManoLayer
        kw["mano_layer"] = ManoLayer.synthetic(0)
        kw.pop("mano_root", None)
        return orig(name, **kw)

    monkeypatch.setattr("homan_tpu.data.factory.get_dataset", patched)
    monkeypatch.setattr("homan_tpu.cli.fit_video.get_dataset", patched,
                        raising=False)

    fit_video.main(args)

    sample_dir = os.path.join(result_root, "samples", "00000000")
    assert os.path.exists(os.path.join(sample_dir, "joint_fit.npz"))
    with open(os.path.join(sample_dir, "results.pkl"), "rb") as f:
        res = pickle.load(f)
    losses = np.asarray(res["losses"]["loss"])
    assert losses.shape == (6,)
    assert np.isfinite(losses).all()


def test_fit_video_edge_budget_auto_recovery(ho3d_tree, tmp_path,
                                             monkeypatch):
    """Mid-fit edge-budget overflow must RE-RUN the sample with a bumped
    budget instead of raising (VERDICT r4 missing #3). Simulates the
    sizing miss (initial-pose demand under budget, fit motion over it) by
    forcing an undersized budget past the auto-sizer, then asserts the
    recovery loop bumps and the sample completes."""
    import numpy as np
    from homan_tpu.cli import fit_video
    from homan_tpu.render import rasterizer as rast
    from homan_tpu.render.rasterizer import RasterSettings

    monkeypatch.chdir(tmp_path)
    result_root = str(tmp_path / "results")
    args = fit_video.get_args([
        "--dataset", "ho3d", "--split", "val",
        "--gt_masks", "1",
        "--frame_nb", "3", "--chunk_step", "1",
        "--num_initializations", "16",
        "--num_obj_iterations", "5",
        "--num_joint_iterations", "10",
        "--viz_step", "0",
        "--rend_size", "64",
        "--result_root", result_root,
        "--mano_root", str(tmp_path / "no_mano"),
    ])
    import homan_tpu.data.factory as factory
    orig = factory.get_dataset

    def patched(name, **kw):
        kw.update(root=ho3d_tree,
                  ycb_root=os.path.join(ho3d_tree, "ycbmodels"),
                  cache_folder=str(tmp_path / "cache"), load_img=False)
        from homan_tpu.core.mano import ManoLayer
        kw["mano_layer"] = ManoLayer.synthetic(0)
        kw.pop("mano_root", None)
        return orig(name, **kw)

    monkeypatch.setattr("homan_tpu.data.factory.get_dataset", patched)

    # Force an undersized budget through the sizing stage (what a fit whose
    # motion exceeds the 1.3x headroom looks like to the runtime backstop).
    starved = RasterSettings(image_size=64, tile_px=16, edges_per_tile=8)
    monkeypatch.setattr(rast, "auto_edge_settings",
                        lambda *a, **k: starved)
    bumps = []
    real_bump = rast.bump_edge_settings

    def counting_bump(settings, demand, **kw):
        out = real_bump(settings, demand, **kw)
        bumps.append((settings.edges_per_tile, out.edges_per_tile,
                      out.tile_px))
        return out

    monkeypatch.setattr(rast, "bump_edge_settings", counting_bump)
    monkeypatch.setattr("homan_tpu.cli.fit_video.RasterSettings",
                        RasterSettings, raising=False)

    fit_video.main(args)

    sample_dir = os.path.join(result_root, "samples", "00000000")
    assert os.path.exists(os.path.join(sample_dir, "joint_fit.npz")), \
        "recovery must not lose the sample"
    assert bumps, "the starved budget must have triggered >= 1 bump"
    assert all(new > old for old, new, _ in bumps)
    # The recovered fit's history must be overflow-free.
    with open(os.path.join(sample_dir, "results.pkl"), "rb") as f:
        res = pickle.load(f)
    excess = np.asarray(res["losses"].get("edge_budget_excess", [0.0]))
    assert float(excess.max()) <= 0
