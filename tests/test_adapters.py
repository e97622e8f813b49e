"""Reference-artifact adapters: FrankMocap/PointRend/indep_fit converters and
the cached-evidence (--evidence_root) fitting path."""
import os
import pickle

import numpy as np
import pytest


def make_reference_person_params(n_hands=2, seed=0, image_size=128,
                                 as_torch=True):
    """Fabricate a per-frame dict in the reference's FrankMocap layout
    (homan/mocap.py:80-97: hands stacked on dim 0, torch tensors)."""
    rng = np.random.RandomState(seed)
    d = {
        "bboxes": rng.rand(n_hands, 4).astype(np.float32) * image_size,
        "cams": rng.randn(n_hands, 3).astype(np.float32),
        "verts": rng.randn(n_hands, 778, 3).astype(np.float32),
        "verts2d": rng.rand(n_hands, 778, 2).astype(np.float32) * image_size,
        "rotations": np.tile(np.eye(3, dtype=np.float32),
                             (n_hands, 1, 1)),
        "translations": rng.randn(n_hands, 1, 3).astype(np.float32),
        "mano_pca_pose": rng.randn(n_hands, 16).astype(np.float32),
        "mano_rot": np.zeros((n_hands, 3), np.float32),
        "mano_trans": np.zeros((n_hands, 3), np.float32),
        "mano_betas": np.zeros((n_hands, 10), np.float32),
        "masks": rng.rand(n_hands, image_size, image_size) > 0.8,
        "hand_side": ["left_hand", "right_hand"][:n_hands],
    }
    if as_torch:
        import torch
        d = {k: torch.from_numpy(np.asarray(v)) if not isinstance(v, list)
             else v for k, v in d.items()}
    return d


def test_convert_person_parameters_torch_two_hands():
    from homan_tpu.frontend.adapters import convert_person_parameters
    ref = make_reference_person_params(n_hands=2)
    est, masks, boxes = convert_person_parameters(ref)
    assert set(est) == {"left_hand", "right_hand"}
    assert est["right_hand"]["verts"].shape == (778, 3)
    assert est["right_hand"]["translations"].shape == (1, 3)
    assert masks["left_hand"].shape == (128, 128)
    assert boxes["left_hand"].shape == (4,)
    # hand order preserved: index 0 is the left hand
    np.testing.assert_array_equal(
        est["left_hand"]["mano_pca_pose"],
        np.asarray(ref["mano_pca_pose"][0]))


def test_convert_pointrend_annotations():
    """Reference hand annotations carry class_id 0 (person, the class_idx=0
    query at frameinfos.py:23-26); object annotations carry their real COCO
    id (most-likely-class query, frameinfos.py:161-165). class 39 (bottle)
    must convert to an OBJECT (-1) entry, not a hand."""
    from homan_tpu.frontend.adapters import convert_pointrend_annotations
    annots = [{"bbox": np.zeros(4), "class_id": 39,
               "full_mask": np.ones((32, 32)), "score": 0.97,
               "square_bbox": np.zeros(4), "crop_mask": np.ones((8, 8))},
              {"bbox": np.zeros(4), "class_id": -1,
               "full_mask": np.zeros((32, 32)), "score": 0.88,
               "square_bbox": np.zeros(4), "crop_mask": np.zeros((8, 8))},
              {"bbox": np.zeros(4), "class_id": 0,
               "full_mask": np.ones((32, 32)), "score": 0.5,
               "square_bbox": np.zeros(4), "crop_mask": np.ones((8, 8))}]
    out = convert_pointrend_annotations(annots)
    assert out[0]["class_id"] == -1  # bottle -> object
    assert out[1]["class_id"] == -1  # already-object sentinel preserved
    assert out[2]["class_id"] == 0   # person -> hand
    assert out[0]["full_mask"].dtype == bool
    assert out[1]["score"] == pytest.approx(0.88)


def test_cached_evidence_class_dispatch(tmp_path):
    """Recorded class-tagged masks answer hand and object queries
    separately (the reference runs two PointRend calls per frame)."""
    from homan_tpu.frontend.adapters import record_cached_evidence
    from homan_tpu.frontend.evidence import CachedEvidence

    ref = make_reference_person_params(n_hands=1, image_size=64)
    obj_mask = np.zeros((64, 64), bool)
    obj_mask[10:30, 10:30] = True
    record_cached_evidence(str(tmp_path), "k0", ref, obj_mask,
                           object_score=0.93)
    cache = CachedEvidence(str(tmp_path))
    hand_masks = cache.masks_from_bboxes("k0", np.zeros((1, 4)), [0])
    obj_masks = cache.masks_from_bboxes("k0", np.zeros((1, 4)), [-1])
    assert len(hand_masks) == 1 and len(obj_masks) == 1
    np.testing.assert_array_equal(obj_masks[0]["full_mask"], obj_mask)
    assert obj_masks[0]["score"] == pytest.approx(0.93)
    hands = cache.regress("k0", None)
    assert "left_hand" in hands


def test_convert_indep_fit_builds_joint_inputs():
    """A reference-layout indep_fit payload converts into build_joint_inputs
    consumables and compiles a loss evaluation."""
    import jax.numpy as jnp
    import torch
    from homan_tpu.cli.fit_video import build_joint_inputs
    from homan_tpu.core.mano import ManoLayer
    from homan_tpu.core.meshes import bumpy_potato
    from homan_tpu.fit import losses as L

    T, R = 2, 32
    v, f = bumpy_potato(1, 0.08, seed=0)
    person_frames = []
    for t in range(T):
        p = make_reference_person_params(n_hands=1, seed=t, image_size=64)
        p["target_masks"] = torch.rand(1, R, R)
        p["K_roi"] = torch.eye(3)[None]
        person_frames.append(p)
    object_frames = [{
        "rotations": torch.eye(3)[None],
        "translations": torch.zeros(1, 1, 3) + torch.tensor([0, 0, 0.5]),
        "target_masks": torch.rand(R, R),
        "K_roi": torch.eye(3)[None],
        "masks": torch.zeros(64, 64),
    } for _ in range(T)]
    ref_indep = {
        "person_parameters": person_frames,
        "object_parameters": object_frames,
        "obj_verts_can": torch.from_numpy(v),
        "obj_faces": torch.from_numpy(f),
        "super2d_img_path": "unused.png",
    }

    from homan_tpu.frontend.adapters import convert_indep_fit
    indep = convert_indep_fit(ref_indep)
    assert indep["hand_sides"] == ["left"]
    assert indep["person_parameters"]["verts"].shape == (T, 778, 3)

    layer = ManoLayer.synthetic(0)
    K_nc = np.tile(np.eye(3, dtype=np.float64)[None], (T, 1, 1))
    state, consts, cfg = build_joint_inputs(
        indep["person_parameters"], indep["object_parameters"],
        indep["obj_verts_can"], indep["obj_faces"], K_nc,
        indep["hand_sides"], layer, 64, R, (64, 64))
    lw = dict(L.DEFAULT_LW)
    from homan_tpu.render import RasterSettings
    loss_dict, _ = L.compute_all_losses(
        state, consts, cfg, lw,
        roi_settings=RasterSettings(image_size=R, tile_px=16,
                                    faces_per_tile=384, edges_per_tile=128))
    total = L.weighted_sum(loss_dict, lw)
    assert np.isfinite(float(total))


@pytest.mark.slow
def test_fit_video_evidence_root_end_to_end(tmp_path, monkeypatch):
    """--evidence_root drives stages A+B+C from converter-produced caches
    (VERDICT round-1 gap: the non-GT path had never been fed data)."""
    import jax.numpy as jnp
    from homan_tpu.cli import fit_video
    from homan_tpu.core import mano as mano_lib
    from homan_tpu.core.meshes import bumpy_potato
    from homan_tpu.frontend.adapters import record_cached_evidence
    from homan_tpu.frontend.cachedfit import frame_key
    from homan_tpu.frontend.gtevidence import (mask_to_bbox, procrustes_rigid,
                                               render_full_mask)
    from homan_tpu.render.rasterizer import MeshTopology

    monkeypatch.chdir(tmp_path)
    T, image_size = 3, 128
    layer = mano_lib.ManoLayer.synthetic(0)
    v, f = bumpy_potato(1, 0.08, seed=1)
    K = np.array([[115.0, 0, 64], [0, 115.0, 64], [0, 0, 1]])
    rng = np.random.RandomState(0)
    rest = np.asarray(mano_lib.mano_forward_jit(
        layer.params["right"], jnp.zeros(10), jnp.zeros(3),
        jnp.zeros(45))["verts"])

    obj_verts, hand_verts = [], []
    for t in range(T):
        obj_verts.append(v + np.array([0.02 + 0.003 * t, -0.01, 0.5],
                                      np.float32))
        hand_verts.append(rest + np.array([0.08, 0.0, 0.52], np.float32))
    obj_verts, hand_verts = np.stack(obj_verts), np.stack(hand_verts)

    obj_topo = MeshTopology.from_faces(f)
    hand_topo = MeshTopology.from_faces(np.asarray(layer.faces("right")))
    obj_masks = render_full_mask(obj_verts, obj_topo,
                                 np.tile(K[None], (T, 1, 1)), image_size)
    hand_masks = render_full_mask(hand_verts, hand_topo,
                                  np.tile(K[None], (T, 1, 1)), image_size)

    # Record reference-layout evidence (torch tensors) per frame
    import torch
    ev_root = str(tmp_path / "evidence")
    seq = "synthclip"
    hand_boxes = []
    for t in range(T):
        hv = hand_verts[t]
        proj = hv @ K.T
        uv = (proj[:, :2] / proj[:, 2:]).astype(np.float32)
        R_init, t_init = procrustes_rigid(rest, hv)
        box = mask_to_bbox(hand_masks[t])
        hand_boxes.append(box)
        person = {
            "bboxes": torch.from_numpy(box[None]),
            "cams": torch.zeros(1, 3),
            "verts": torch.from_numpy(hv[None]),
            "verts2d": torch.from_numpy(uv[None]),
            "rotations": torch.from_numpy(R_init[None]),
            "translations": torch.from_numpy(t_init[None, None]),
            "mano_pca_pose": torch.zeros(1, 16),
            "mano_rot": torch.zeros(1, 3),
            "mano_trans": torch.zeros(1, 3),
            "mano_betas": torch.zeros(1, 10),
            "masks": torch.from_numpy(hand_masks[t][None]),
            "hand_side": ["right_hand"],
        }
        record_cached_evidence(ev_root, frame_key(seq, t), person,
                               obj_masks[t])

    class FakeDataset:
        def __len__(self):
            return 1

        def __getitem__(self, idx):
            return {
                "seq_idx": seq,
                "frame_idxs": list(range(T)),
                "images": [None] * T,
                "hands": [{"label": "right_hand",
                           "bbox": np.stack(hand_boxes),
                           "verts3d": hand_verts}],
                "objects": [{"canverts3d": v, "faces": f,
                             "verts3d": obj_verts,
                             "bbox": np.stack([mask_to_bbox(m)
                                               for m in obj_masks])}],
                "camera": {"K": np.tile(K[None], (T, 1, 1))},
                "setup": {"right_hand": 1, "objects": 1},
            }

    import homan_tpu.data.factory as factory
    monkeypatch.setattr(factory, "get_dataset",
                        lambda name, **kw: (FakeDataset(), image_size))
    monkeypatch.setattr("homan_tpu.cli.fit_video.get_dataset",
                        lambda name, **kw: (FakeDataset(), image_size),
                        raising=False)

    result_root = str(tmp_path / "results")
    args = fit_video.get_args([
        "--dataset", "ho3d", "--split", "val",
        "--evidence_root", ev_root,
        "--frame_nb", str(T), "--data_step", "1",
        "--num_initializations", "24", "--num_obj_iterations", "10",
        "--num_joint_iterations", "12", "--rend_size", "64",
        "--result_root", result_root,
        "--mano_root", str(tmp_path / "no_mano"),
    ])
    fit_video.main(args)

    sample_dir = os.path.join(result_root, "samples", "00000000")
    assert os.path.exists(os.path.join(sample_dir, "joint_fit.npz"))
    with open(os.path.join(sample_dir, "results.pkl"), "rb") as fh:
        res = pickle.load(fh)
    losses = np.asarray(res["losses"]["loss"])
    assert losses.shape == (12,) and np.isfinite(losses).all()
    # stage B found the object from cached masks: silhouette IoU is high
    ious = np.asarray(res["losses"]["iou_object"])
    assert ious[-1] > 0.6, ious


@pytest.mark.slow
def test_fit_video_core50_evidence_root(tmp_path, monkeypatch):
    """Core50 end to end THROUGH the real dataset class: .mat-annotated
    tree (bbox + side), shipped sphere exemplar (no ShapeNet dump, no user
    registry), cached detector evidence driving stages A+B+C."""
    import jax.numpy as jnp
    from PIL import Image
    from scipy.io import savemat
    import torch

    from homan_tpu.cli import fit_video
    from homan_tpu.core import mano as mano_lib
    from homan_tpu.data.core50 import Core50
    from homan_tpu.frontend.adapters import record_cached_evidence
    from homan_tpu.frontend.cachedfit import frame_key
    from homan_tpu.frontend.gtevidence import (mask_to_bbox, procrustes_rigid,
                                               render_full_mask)
    from homan_tpu.render.rasterizer import MeshTopology

    monkeypatch.chdir(tmp_path)
    T = 3
    image_size = 350
    # ---- fabricate the dataset tree: s2/o31 (ball; annot says Right) ----
    root = tmp_path / "core50"
    img_dir = root / "core50_350x350" / "s2" / "o31"
    annot_dir = root / "core50_350x350_Annot" / "s2" / "o31"
    img_dir.mkdir(parents=True)
    annot_dir.mkdir(parents=True)
    for i in range(T):
        Image.new("RGB", (350, 350)).save(img_dir / f"C_02_31_{i:03d}.png")
        savemat(str(annot_dir / f"CropAnnot_02_31_{i:03d}.mat"), {"annot": {
            "hand": {"root2d": np.array([[180.0, 170.0]]),
                     "root_depth_png": np.uint8(200), "side": "R"},
            "object": {"root2d": np.array([[175.0, 175.0]]),
                       "root_depth_png": np.uint8(190)},
            "crop": np.array([[120.0, 120.0, 240.0, 240.0]]),
        }})

    ds = Core50(root=str(root), frame_nb=T, chunk_step=1,
                cache_folder=str(tmp_path / "cache"), load_img=False)
    annots = ds[0]
    assert annots["hands"][0]["label"] == "right_hand"  # .mat override
    obj_verts_can = annots["objects"][0]["canverts3d"][0]
    obj_faces = annots["objects"][0]["faces"][0]
    K = annots["camera"]["K"][0]

    # ---- synthesize "detections" consistent with a plausible scene ----
    layer = mano_lib.ManoLayer.synthetic(0)
    rest = np.asarray(mano_lib.mano_forward_jit(
        layer.params["right"], jnp.zeros(10), jnp.zeros(3),
        jnp.zeros(45))["verts"])
    obj_topo = MeshTopology.from_faces(obj_faces)
    hand_topo = MeshTopology.from_faces(np.asarray(layer.faces("right")))
    obj_verts = np.stack([obj_verts_can + np.array([0.01, 0.0, 0.4],
                                                   np.float32)] * T)
    hand_verts = np.stack([rest + np.array([0.06, 0.0, 0.42], np.float32)]
                          * T)
    obj_masks = render_full_mask(obj_verts, obj_topo,
                                 np.tile(K[None], (T, 1, 1)), image_size)
    hand_masks = render_full_mask(hand_verts, hand_topo,
                                  np.tile(K[None], (T, 1, 1)), image_size)
    ev_root = str(tmp_path / "evidence")
    for t in range(T):
        hv = hand_verts[t]
        proj = hv @ np.asarray(K, np.float32).T
        uv = (proj[:, :2] / proj[:, 2:]).astype(np.float32)
        R_init, t_init = procrustes_rigid(rest, hv)
        person = {
            "bboxes": torch.from_numpy(mask_to_bbox(hand_masks[t])[None]),
            "cams": torch.zeros(1, 3),
            "verts": torch.from_numpy(hv[None]),
            "verts2d": torch.from_numpy(uv[None]),
            "rotations": torch.from_numpy(R_init[None]),
            "translations": torch.from_numpy(t_init[None, None]),
            "mano_pca_pose": torch.zeros(1, 16),
            "mano_rot": torch.zeros(1, 3),
            "mano_trans": torch.zeros(1, 3),
            "mano_betas": torch.zeros(1, 10),
            "masks": torch.from_numpy(hand_masks[t][None]),
            "hand_side": ["right_hand"],
        }
        record_cached_evidence(ev_root, frame_key(annots["seq_idx"], t),
                               person, obj_masks[t])

    import homan_tpu.data.factory as factory
    monkeypatch.setattr(factory, "get_dataset",
                        lambda name, **kw: (ds, 350))
    monkeypatch.setattr("homan_tpu.cli.fit_video.get_dataset",
                        lambda name, **kw: (ds, 350), raising=False)

    result_root = str(tmp_path / "results")
    args = fit_video.get_args([
        "--dataset", "core50",
        "--evidence_root", ev_root,
        "--frame_nb", str(T), "--data_step", "1",
        "--num_initializations", "24", "--num_obj_iterations", "10",
        "--num_joint_iterations", "10", "--rend_size", "64",
        "--result_root", result_root,
        "--mano_root", str(tmp_path / "no_mano"),
    ])
    fit_video.main(args)
    sample_dir = os.path.join(result_root, "samples", "00000000")
    assert os.path.exists(os.path.join(sample_dir, "joint_fit.npz"))
    with open(os.path.join(sample_dir, "results.pkl"), "rb") as fh:
        res = pickle.load(fh)
    ious = np.asarray(res["losses"]["iou_object"])
    assert np.isfinite(ious).all()
    assert ious[-1] > 0.5, ious


def test_convert_reference_tree_and_resume(tmp_path, monkeypatch):
    """cli.convert_reference turns a reference results tree (torch
    indep_fit.pkl + joint_fit.pt) into homan_tpu layout; fit_video --resume
    continues the converted joint fit."""
    import torch
    from homan_tpu.cli import convert_reference, fit_video
    from homan_tpu.core.meshes import bumpy_potato

    monkeypatch.chdir(tmp_path)
    T, R = 2, 64  # rend 64 = the smallest tile-aligned ROI
    v, f = bumpy_potato(1, 0.08, seed=0)
    src = tmp_path / "ref_results"
    sdir = src / "samples" / "00000000"
    sdir.mkdir(parents=True)

    person_frames = []
    for t in range(T):
        p = make_reference_person_params(n_hands=1, seed=t, image_size=64)
        p["target_masks"] = torch.rand(1, R, R)
        p["K_roi"] = torch.eye(3)[None]
        person_frames.append(p)
    ref_indep = {
        "person_parameters": person_frames,
        "object_parameters": [{
            "rotations": torch.eye(3)[None],
            "translations": torch.tensor([[[0.0, 0.0, 0.5]]]),
            "target_masks": torch.rand(R, R),
            "K_roi": torch.eye(3)[None],
            "masks": torch.zeros(64, 64),
        } for _ in range(T)],
        "obj_verts_can": torch.from_numpy(v),
        "obj_faces": torch.from_numpy(f),
        "super2d_img_path": "unused.png",
    }
    with open(sdir / "indep_fit.pkl", "wb") as fh:
        pickle.dump(ref_indep, fh)
    state_dict = {
        "translations_object": torch.rand(T, 1, 3) + torch.tensor([0, 0, 1.0]),
        "rotations_object": torch.eye(3)[:, :2].repeat(T, 1, 1),
        "translations_hand": torch.rand(T, 1, 3),
        "rotations_hand": torch.eye(3)[:, :2].repeat(T, 1, 1),
        "mano_pca_pose": torch.zeros(T, 16),
        "mano_rot": torch.zeros(T, 3),
        "mano_trans": torch.zeros(T, 3),
        "mano_betas": torch.zeros(T, 10),
        "int_scales_object": torch.ones(1),
        "int_scales_hand": torch.ones(1),
        "verts_object_og": torch.zeros(5, 3),  # buffer: must be dropped
    }
    torch.save({"state_dict": state_dict}, sdir / "joint_fit.pt")

    dst = tmp_path / "converted"
    convert_reference.main(convert_reference.get_args(
        ["--src", str(src), "--dst", str(dst)]))
    assert (dst / "samples" / "00000000" / "indep_fit.pkl").exists()
    ck = np.load(dst / "samples" / "00000000" / "joint_fit.npz")
    assert "verts_object_og" not in ck.files
    np.testing.assert_allclose(ck["translations_object"],
                               np.asarray(state_dict["translations_object"]))

    # Resume the converted fit through the driver (2 more iterations)
    class FakeDataset:
        def __len__(self):
            return 1

        def __getitem__(self, idx):
            return {"seq_idx": "ref", "frame_idxs": list(range(T)),
                    "images": [None] * T,
                    "hands": [{"label": "left_hand"}],
                    "objects": [{"canverts3d": v, "faces": f}],
                    "camera": {"K": np.tile(np.eye(3, dtype=np.float64)[None],
                                            (T, 1, 1)) * 64},
                    "setup": {"left_hand": 1, "objects": 1}}

    import homan_tpu.data.factory as factory
    monkeypatch.setattr(factory, "get_dataset",
                        lambda name, **kw: (FakeDataset(), 64))
    monkeypatch.setattr("homan_tpu.cli.fit_video.get_dataset",
                        lambda name, **kw: (FakeDataset(), 64),
                        raising=False)
    result_root = str(tmp_path / "resumed")
    args = fit_video.get_args([
        "--dataset", "ho3d", "--resume", str(dst),
        "--frame_nb", str(T), "--data_step", "1",
        "--num_joint_iterations", "2", "--rend_size", str(R),
        "--result_root", result_root,
        "--mano_root", str(tmp_path / "no_mano"),
    ])
    fit_video.main(args)
    assert os.path.exists(os.path.join(result_root, "samples", "00000000",
                                       "joint_fit.npz"))


@pytest.mark.slow
def test_fit_video_epic_evidence_root(tmp_path, monkeypatch):
    """EPIC end to end THROUGH the real dataset class: clip mining from a
    fabricated EPIC-100 annotation table, HOA detections -> tracked boxes,
    shipped noun registry (sphere fallback), cached evidence A+B+C."""
    import jax.numpy as jnp
    import pandas as pd
    import torch

    from homan_tpu.cli import fit_video
    from homan_tpu.core import mano as mano_lib
    from homan_tpu.data import hoa as hoa_lib
    from homan_tpu.data.epic import VIDEO_H, VIDEO_W, Epic
    from homan_tpu.frontend.adapters import record_cached_evidence
    from homan_tpu.frontend.cachedfit import frame_key
    from homan_tpu.frontend.gtevidence import (mask_to_bbox, procrustes_rigid,
                                               render_full_mask)
    from homan_tpu.render.rasterizer import MeshTopology

    monkeypatch.chdir(tmp_path)
    T, step = 3, 2
    image_size = 640
    # ---- fabricate EPIC-100 annotations + HOA detections ----
    annotations_path = tmp_path / "EPIC_100_train.pkl"
    pd.DataFrame([{"video_id": "P01_01", "noun": "cup", "verb": "take",
                   "start_frame": 0, "stop_frame": 30}]).to_pickle(
        annotations_path)
    hoa_root = tmp_path / "hoa"
    hoa_root.mkdir()
    dets = []
    for fi in range(31):
        x = 0.3 + 0.002 * fi
        dets.append(hoa_lib.FrameDetections(
            video_id="P01_01", frame_number=fi,
            hands=[hoa_lib.HandDetection(
                bbox=hoa_lib.BBox(x, 0.3, x + 0.25, 0.7), score=0.9,
                state=hoa_lib.HandState.PORTABLE_OBJECT,
                side=hoa_lib.HandSide.RIGHT,
                object_offset=hoa_lib.FloatVector(0.01, 0.02))],
            objects=[hoa_lib.ObjectDetection(
                bbox=hoa_lib.BBox(x - 0.1, 0.35, x + 0.1, 0.6), score=0.8)],
        ))
    with open(hoa_root / "P01_01.pkl", "wb") as fh:
        pickle.dump(dets, fh)

    ds = Epic(annotations_path=str(annotations_path), hoa_root=str(hoa_root),
              frames_root=str(tmp_path / "noframes"), nouns=("cup",),
              frame_nb=T, frame_step=step,
              cache_folder=str(tmp_path / "cache"), load_img=False)
    assert len(ds) == 1
    annots = ds[0]
    assert annots["objects"][0]["canverts3d"] is not None  # noun registry
    assert annots["hands"][0]["label"] == "right_hand"
    obj_verts_can = annots["objects"][0]["canverts3d"][0]
    obj_faces = annots["objects"][0]["faces"][0]
    K = annots["camera"]["K"][0]

    # ---- synthesize detections-consistent cached evidence ----
    layer = mano_lib.ManoLayer.synthetic(0)
    rest = np.asarray(mano_lib.mano_forward_jit(
        layer.params["right"], jnp.zeros(10), jnp.zeros(3),
        jnp.zeros(45))["verts"])
    obj_topo = MeshTopology.from_faces(obj_faces)
    hand_topo = MeshTopology.from_faces(np.asarray(layer.faces("right")))
    obj_verts = np.stack([obj_verts_can + np.array([0.0, 0.0, 0.35],
                                                   np.float32)] * T)
    hand_verts = np.stack([rest + np.array([0.05, 0.0, 0.38], np.float32)]
                          * T)
    # Masks rendered in the HOA video frame (the dataset's K convention)
    obj_masks = render_full_mask(obj_verts, obj_topo,
                                 np.tile(K[None], (T, 1, 1)), VIDEO_W)
    hand_masks = render_full_mask(hand_verts, hand_topo,
                                  np.tile(K[None], (T, 1, 1)), VIDEO_W)
    obj_masks = obj_masks[:, :VIDEO_H]
    hand_masks = hand_masks[:, :VIDEO_H]
    ev_root = str(tmp_path / "evidence")
    for t in range(T):
        hv = hand_verts[t]
        proj = hv @ np.asarray(K, np.float32).T
        uv = (proj[:, :2] / proj[:, 2:]).astype(np.float32)
        R_init, t_init = procrustes_rigid(rest, hv)
        person = {
            "bboxes": torch.from_numpy(mask_to_bbox(hand_masks[t])[None]),
            "cams": torch.zeros(1, 3),
            "verts": torch.from_numpy(hv[None]),
            "verts2d": torch.from_numpy(uv[None]),
            "rotations": torch.from_numpy(R_init[None]),
            "translations": torch.from_numpy(t_init[None, None]),
            "mano_pca_pose": torch.zeros(1, 16),
            "mano_rot": torch.zeros(1, 3),
            "mano_trans": torch.zeros(1, 3),
            "mano_betas": torch.zeros(1, 10),
            "masks": torch.from_numpy(hand_masks[t][None]),
            "hand_side": ["right_hand"],
        }
        record_cached_evidence(ev_root, frame_key(annots["seq_idx"],
                                                  annots["frame_idxs"][t]),
                               person, obj_masks[t])

    import homan_tpu.data.factory as factory
    monkeypatch.setattr(factory, "get_dataset",
                        lambda name, **kw: (ds, image_size))
    monkeypatch.setattr("homan_tpu.cli.fit_video.get_dataset",
                        lambda name, **kw: (ds, image_size), raising=False)
    result_root = str(tmp_path / "results")
    args = fit_video.get_args([
        "--dataset", "epic",
        "--evidence_root", ev_root,
        "--frame_nb", str(T), "--data_step", "1",
        "--num_initializations", "24", "--num_obj_iterations", "10",
        "--num_joint_iterations", "10", "--rend_size", "64",
        "--result_root", result_root,
        "--mano_root", str(tmp_path / "no_mano"),
    ])
    fit_video.main(args)
    sample_dir = os.path.join(result_root, "samples", "00000000")
    assert os.path.exists(os.path.join(sample_dir, "joint_fit.npz"))
    with open(os.path.join(sample_dir, "results.pkl"), "rb") as fh:
        res = pickle.load(fh)
    ious = np.asarray(res["losses"]["iou_object"])
    assert np.isfinite(ious).all()
    assert ious[-1] > 0.4, ious
