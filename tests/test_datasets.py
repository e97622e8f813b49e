"""Dataset-layer tests on synthetic on-disk file trees (no real data)."""
import os
import pickle

import numpy as np
import pytest

from homan_tpu.core.mano import ManoLayer
from homan_tpu.core.meshes import bumpy_potato, save_obj
from homan_tpu.data import hoa as hoa_lib
from homan_tpu.data.factory import get_dataset


@pytest.fixture(scope="module")
def ho3d_tree(tmp_path_factory):
    """Fabricate a minimal HO3D v2 layout: 1 train seq with 6 frames."""
    root = tmp_path_factory.mktemp("ho3d_data")
    seq = "ABF11"  # in VAL_SEQS via train subfolder
    meta = root / "ho3d" / "train" / seq / "meta"
    rgb = root / "ho3d" / "train" / seq / "rgb"
    meta.mkdir(parents=True)
    rgb.mkdir(parents=True)
    rng = np.random.RandomState(0)
    K = np.array([[614.0, 0, 320.0], [0, 614.0, 240.0], [0, 0, 1]])
    for i in range(6):
        annot = {
            "camMat": K,
            "handJoints3D": rng.randn(21, 3) * 0.05 + [0, 0, -0.5],
            "handPose": (rng.randn(48) * 0.1).astype(np.float64),
            "handTrans": np.array([0.02, 0.01, -0.5]),
            "handBeta": np.zeros(10),
            "objName": "003_cracker_box",
            "objRot": rng.randn(3, 1) * 0.3,
            "objTrans": np.array([0.0, 0.0, -0.45]),
        }
        with open(meta / f"{i:04d}.pkl", "wb") as f:
            pickle.dump(annot, f)
    ycb = root / "ycbmodels" / "003_cracker_box"
    ycb.mkdir(parents=True)
    v, fc = bumpy_potato(1, 0.1, seed=1)
    save_obj(str(ycb / "textured_simple_2000.obj"), v, fc)
    return str(root)


def test_ho3d_dataset(ho3d_tree, tmp_path):
    ds, image_size = get_dataset(
        "ho3d", split="val", frame_nb=3, chunk_step=1, chunk_spacing=2,
        root=ho3d_tree, ycb_root=os.path.join(ho3d_tree, "ycbmodels"),
        mano_layer=ManoLayer.synthetic(0),
        cache_folder=str(tmp_path / "cache"), load_img=False)
    assert image_size == 640
    assert len(ds) >= 2
    sample = ds[0]
    assert sample["setup"] == {"right_hand": 1, "objects": 1}
    hand = sample["hands"][0]
    assert hand["label"] == "right_hand"
    assert hand["verts3d"].shape == (3, 778, 3)
    assert hand["verts2d"].shape == (3, 778, 2)
    assert hand["joints3d"].shape == (3, 21, 3)
    obj = sample["objects"][0]
    assert obj["canverts3d"].shape[1:] == (obj["canverts3d"].shape[1], 3)
    assert obj["verts3d"].shape[0] == 3
    assert sample["camera"]["K"].shape == (3, 3, 3)
    # y/z flip applied: GT hand z should be positive (in front of camera)
    assert hand["verts3d"][..., 2].mean() > 0
    # cache round-trip
    ds2, _ = get_dataset(
        "ho3d", split="val", frame_nb=3, chunk_step=1, chunk_spacing=2,
        root=ho3d_tree, ycb_root=os.path.join(ho3d_tree, "ycbmodels"),
        mano_layer=ManoLayer.synthetic(0),
        cache_folder=str(tmp_path / "cache"), load_img=False)
    assert len(ds2) == len(ds)


def test_ho3d_gt_projects_into_image(ho3d_tree, tmp_path):
    ds, _ = get_dataset(
        "ho3d", split="val", frame_nb=2, chunk_step=1, chunk_spacing=3,
        root=ho3d_tree, ycb_root=os.path.join(ho3d_tree, "ycbmodels"),
        mano_layer=ManoLayer.synthetic(0),
        cache_folder=str(tmp_path / "c2"), load_img=False)
    sample = ds[0]
    v2d = sample["hands"][0]["verts2d"]
    assert np.isfinite(v2d).all()
    assert (v2d > -640).all() and (v2d < 1280).all()


@pytest.fixture(scope="module")
def core50_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("core50_data")
    from PIL import Image
    for session in ("s1", "s2"):
        for obj in ("o1", "o23"):
            d = root / session / obj
            d.mkdir(parents=True)
            for i in range(5):
                Image.new("RGB", (350, 350)).save(d / f"{i:03d}.png")
    return str(root)


def test_core50_dataset(core50_tree, tmp_path):
    from homan_tpu.core.meshes import bumpy_potato, save_obj
    v, f = bumpy_potato(1, 1.0, seed=0)
    mesh_path = tmp_path / "exemplar.obj"
    save_obj(str(mesh_path), v, f)
    registry = {"plug_adapter": str(mesh_path), "ball": str(mesh_path)}
    ds, image_size = get_dataset(
        "core50", frame_nb=3, chunk_step=1,
        root=core50_tree, model_registry=registry,
        cache_folder=str(tmp_path / "cache"), load_img=False)
    assert image_size == 350
    assert len(ds) > 0
    sample = ds[0]
    assert "objects" in sample and sample["objects"][0]["canverts3d"] is not None
    # exemplar normalized to category scale
    verts = sample["objects"][0]["canverts3d"][0]
    radius = np.linalg.norm(verts, axis=1).max()
    from homan_tpu.data.core50 import CATEGORY_SCALES
    cls = sample["objects"][0]["name"]
    assert abs(radius - CATEGORY_SCALES[cls] / 2) < 1e-3
    # session map decides the hand side
    side = list(sample["setup"].keys())[0]
    assert side in ("left_hand", "right_hand")


def test_hoa_roundtrip_and_dataframe(tmp_path):
    dets = [
        hoa_lib.FrameDetections(
            video_id="P01_01", frame_number=fi,
            hands=[hoa_lib.HandDetection(
                bbox=hoa_lib.BBox(0.1, 0.2, 0.3, 0.4), score=0.9,
                state=hoa_lib.HandState.PORTABLE_OBJECT,
                side=hoa_lib.HandSide.RIGHT,
                object_offset=hoa_lib.FloatVector(0.01, 0.02))],
            objects=[hoa_lib.ObjectDetection(
                bbox=hoa_lib.BBox(0.15, 0.25, 0.35, 0.45), score=0.8)],
        ) for fi in range(4)
    ]
    p = tmp_path / "P01_01.pkl"
    with open(p, "wb") as f:
        pickle.dump(dets, f)
    loaded = hoa_lib.load_video_hoa(str(p))
    assert len(loaded) == 4
    df = hoa_lib.detections_to_dataframe(loaded, 256, 456)
    assert len(df) == 8
    hand_rows = df[df.det_type == "hand"]
    assert (hand_rows.side == "right").all()
    # scaled to pixels
    assert hand_rows.left.iloc[0] == pytest.approx(0.1 * 456)


def test_epic_track_clip_boxes(tmp_path):
    dets = []
    for fi in range(8):
        x = 0.1 + 0.01 * fi
        dets.append(hoa_lib.FrameDetections(
            video_id="P01_01", frame_number=fi,
            hands=[hoa_lib.HandDetection(
                bbox=hoa_lib.BBox(x, 0.2, x + 0.2, 0.5), score=0.9,
                state=hoa_lib.HandState.PORTABLE_OBJECT,
                side=hoa_lib.HandSide.RIGHT,
                object_offset=hoa_lib.FloatVector(0, 0))],
            objects=[] if fi == 3 else [hoa_lib.ObjectDetection(
                bbox=hoa_lib.BBox(x, 0.1, x + 0.1, 0.3), score=0.7)],
        ))
    df = hoa_lib.detections_to_dataframe(dets, 256, 456)
    from homan_tpu.data.epic import track_clip_boxes, square_roi_for_clip
    tracks = track_clip_boxes(df, 0, 8)
    assert tracks["right_hand"].shape == (8, 4)
    assert tracks["left_hand"] is None
    assert np.isfinite(tracks["objects"]).all()  # gap at frame 3 filled
    roi = square_roi_for_clip(tracks)
    assert roi[2] > 0


def test_ho3d_tracked_box_mode(ho3d_tree, tmp_path):
    """box_mode='track' replaces GT boxes with tracked ones."""
    import pickle as pk
    boxes_dir = tmp_path / "data" / "boxes"
    boxes_dir.mkdir(parents=True)
    T = 6
    tracked = {"ABF11": {
        "right_hand": np.tile([1.0, 2, 3, 4], (T, 1)),
        "objects": np.tile([5.0, 6, 7, 8], (T, 1)),
    }}
    import os as _os
    cwd = _os.getcwd()
    _os.chdir(tmp_path)
    try:
        with open("data/boxes/boxes_ho3d_val.pkl", "wb") as f:
            pk.dump(tracked, f)
        ds, _ = get_dataset(
            "ho3d", split="val", frame_nb=3, chunk_step=1, chunk_spacing=2,
            root=ho3d_tree, ycb_root=os.path.join(ho3d_tree, "ycbmodels"),
            mano_layer=ManoLayer.synthetic(0), box_mode="track",
            cache_folder=str(tmp_path / "cache_tb"), load_img=False)
        sample = ds[0]
        np.testing.assert_allclose(sample["hands"][0]["bbox"][0],
                                   [1, 2, 3, 4])
        np.testing.assert_allclose(sample["objects"][0]["bbox"][0],
                                   [5, 6, 7, 8])
    finally:
        _os.chdir(cwd)


def test_stage_timers():
    from homan_tpu.utils_profiling import StageTimers
    t = StageTimers()
    with t.time("a"):
        sum(range(1000))
    with t.time("a"):
        pass
    assert t.counts["a"] == 2
    assert "a" in t.report()


def test_core50_object_registry_without_user_registry(core50_tree, tmp_path):
    """OBJECT_MODELS ships usable exemplars with NO user registry: spheres
    are procedural, missing ShapeNet files fall back to spheres at the
    object's metric scale (the reference hard-requires the dump instead)."""
    ds, _ = get_dataset(
        "core50", frame_nb=3, chunk_step=1, root=core50_tree,
        cache_folder=str(tmp_path / "cache_noreg"), load_img=False)
    # find the chunk for object o23 (a can, OBJECT_MODELS entry)
    idx = next(i for i, c in enumerate(ds.chunks) if c["object"] == "o23")
    sample = ds[idx]
    verts = sample["objects"][0]["canverts3d"]
    assert verts is not None
    radius = np.linalg.norm(verts[0], axis=1).max()
    from homan_tpu.data.core50 import OBJECT_MODELS
    assert abs(radius - OBJECT_MODELS["o23"]["scale"] / 2) < 1e-3


def test_core50_mat_annotation_index(tmp_path):
    """.mat annotation tree drives bbox/side (core50utils.py:15-112)."""
    from PIL import Image
    from scipy.io import savemat

    root = tmp_path / "core50"
    img = root / "core50_350x350" / "s2" / "o23"
    annot = root / "core50_350x350_Annot" / "s2" / "o23"
    img.mkdir(parents=True)
    annot.mkdir(parents=True)
    for i in range(3):
        Image.new("RGB", (350, 350)).save(img / f"C_02_23_{i:03d}.png")
        savemat(str(annot / f"CropAnnot_02_23_{i:03d}.mat"), {"annot": {
            "hand": {"root2d": np.array([[10.0 + i, 20.0]]),
                     "root_depth_png": np.uint8(200), "side": "R"},
            "object": {"root2d": np.array([[30.0, 40.0]]),
                       "root_depth_png": np.uint8(180)},
            "crop": np.array([[5.0, 6.0, 100.0 + i, 110.0]]),
        }})
    ds, _ = get_dataset("core50", frame_nb=3, chunk_step=1, root=str(root),
                        cache_folder=str(tmp_path / "cache"), load_img=False)
    sample = ds[0]
    # .mat side overrides the session map (s2 maps to left, annot says R)
    assert sample["hands"][0]["label"] == "right_hand"
    assert sample["hands"][0]["bbox"].shape[-1] == 4
    np.testing.assert_allclose(sample["objects"][0]["bbox"][0],
                               [5.0, 6.0, 100.0, 110.0])


def test_epic_models_registry_defaults(tmp_path):
    """EPIC noun registry (epic.py:24-60 role) works with no ShapeNet dump
    (sphere fallback at metric scale) and honors explicit paths."""
    from homan_tpu.core.meshes import bumpy_potato, save_obj
    from homan_tpu.data.epic import EPIC_MODELS, load_epic_models

    models = load_epic_models()
    assert set(models) == set(EPIC_MODELS)
    r = np.linalg.norm(models["bottle"]["verts"], axis=1).max()
    assert abs(r - EPIC_MODELS["bottle"]["scale"] / 2) < 1e-3

    v, f = bumpy_potato(1, 1.0, seed=0)
    p = tmp_path / "cup.obj"
    save_obj(str(p), v, f)
    models = load_epic_models({"cup": str(p)})
    assert models["cup"]["verts"].shape[0] == v.shape[0]


def test_epic_tar_frame_reader(tmp_path):
    """Per-video tar archives with EPIC frame naming (tarutils.py role),
    both './'-prefixed and bare member names."""
    import io
    import tarfile

    from PIL import Image

    from homan_tpu.data.epic import TarFrameReader

    tar_path = tmp_path / "P01_01.tar"
    with tarfile.open(tar_path, "w") as tf:
        for fi, prefix in ((3, "./"), (4, "")):
            buf = io.BytesIO()
            Image.new("RGB", (8, 6), color=(fi, 0, 0)).save(buf,
                                                            format="JPEG")
            data = buf.getvalue()
            info = tarfile.TarInfo(f"{prefix}frame_{fi:010d}.jpg")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    reader = TarFrameReader(str(tmp_path))
    img3 = reader.read_frame("P01_01", 3)
    img4 = reader.read_frame("P01_01", 4)
    assert img3.shape == (6, 8, 3) and img4.shape == (6, 8, 3)
    assert abs(int(img3[0, 0, 0]) - 3) <= 2  # JPEG tolerance
    assert abs(int(img4[0, 0, 0]) - 4) <= 2


def test_ho3d_frame_mode(ho3d_tree, tmp_path):
    """mode='frame' returns the reference's per-frame obs dict
    (ho3d.py:212-223) — it previously crashed on self.chunks=None."""
    ds, _ = get_dataset(
        "ho3d", split="val", mode="frame",
        root=ho3d_tree, ycb_root=os.path.join(ho3d_tree, "ycbmodels"),
        mano_layer=ManoLayer.synthetic(0),
        cache_folder=str(tmp_path / "cache_frame"), load_img=False)
    assert len(ds) > 0
    obs = ds[0]
    assert set(obs) == {"img", "hands", "objects", "camera", "setup"}
    assert obs["hands"][0]["verts3d"].shape == (778, 3)
    assert obs["camera"]["K"].shape == (3, 3)
