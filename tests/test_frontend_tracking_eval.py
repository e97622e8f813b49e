import numpy as np
import jax.numpy as jnp

from homan_tpu.core.meshes import bumpy_potato, icosphere
from homan_tpu.data.chunking import chunk_vid_index, collate
from homan_tpu.eval import pointmetrics as pm
from homan_tpu.frontend import masks as mask_lib
from homan_tpu.tracking import kalman


# ---------------- masks ----------------
def test_crop_and_resize_identity():
    m = np.zeros((1, 32, 32), np.float32)
    m[0, 8:24, 8:24] = 1.0
    out = mask_lib.crop_and_resize(m, np.array([[0, 0, 32, 32]]), 32)
    np.testing.assert_allclose(out[0], m[0], atol=0.51)  # bilinear edges
    assert ((out[0] > 0.5) == (m[0] > 0.5)).mean() > 0.98


def test_crop_and_resize_zoom():
    m = np.zeros((1, 32, 32), np.float32)
    m[0, 8:24, 8:24] = 1.0
    out = mask_lib.crop_and_resize(m, np.array([[8, 8, 24, 24]]), 16)
    assert (out[0] > 0.5).mean() > 0.9  # crop covers exactly the square


def test_add_occlusions_convention():
    obj = np.zeros((16, 16), bool)
    obj[4:12, 4:12] = True
    occluder = np.zeros((1, 64, 64), np.float32)
    occluder[0, :, :32] = 1.0  # left half occluded in full image
    box = np.array([0.0, 0.0, 64.0, 64.0])  # xywh full image
    out = mask_lib.add_occlusions([obj.astype(np.float32)], occluder, [box])[0]
    assert set(np.unique(out)) <= {-1.0, 0.0, 1.0}
    # Object pixels stay 1 even when occluded (drawn back)
    assert out[8, 8] == 1.0
    # Left background occluded -> -1
    assert out[0, 0] == -1.0
    # Right background free -> 0
    assert out[0, 15] == 0.0


def test_add_target_hand_occlusions():
    person = {
        "bboxes": np.array([[10.0, 10.0, 40.0, 40.0]], np.float32),
        "masks": np.zeros((1, 64, 64), np.float32),
    }
    person["masks"][0, 15:35, 15:35] = 1.0
    obj = {"full_mask": np.zeros((64, 64), np.float32)}
    obj["full_mask"][25:45, 25:45] = 1.0
    K = np.array([[100.0, 0, 32], [0, 100, 32], [0, 0, 1]], np.float32)
    out = mask_lib.add_target_hand_occlusions(person, obj, K, rend_size=32)
    assert out["target_masks"].shape == (1, 32, 32)
    assert out["K_roi"].shape == (1, 3, 3)
    vals = set(np.unique(out["target_masks"]))
    assert vals <= {-1.0, 0.0, 1.0}
    assert (out["target_masks"] == -1).any()  # object occludes some pixels
    # normalized K: cx within [0,1]-ish
    assert 0 < out["K_roi"][0, 0, 2] < 2


# ---------------- tracking ----------------
def test_kalman_rts_smooths_noise():
    rng = np.random.RandomState(0)
    t = np.linspace(0, 4 * np.pi, 60)
    clean = np.sin(t) * 10 + 50
    noisy = clean + rng.randn(60) * 2.0
    smoothed = kalman.kalman_rts_1d(noisy, order=1, q=0.05, r=4.0)
    assert np.abs(smoothed - clean).mean() < np.abs(noisy - clean).mean() * 0.8


def test_kalman_handles_missing():
    boxes = np.tile(np.array([10.0, 10.0, 20.0, 20.0]), (10, 1))
    boxes += np.arange(10)[:, None]  # moving box
    boxes_nan = boxes.copy()
    boxes_nan[4] = np.nan
    out = kalman.track_boxes(boxes_nan, order=1)
    assert np.isfinite(out).all()
    assert np.abs(out[4] - boxes[4]).max() < 2.0


def test_track_sequence_boxes_fwd_bwd():
    boxes = np.tile(np.array([0.0, 0.0, 10.0, 10.0]), (8, 1))
    out = kalman.track_sequence_boxes(boxes)
    np.testing.assert_allclose(out, boxes, atol=0.5)


def test_interpolate_missing():
    b = np.full((5, 4), np.nan)
    b[0] = [0, 0, 10, 10]
    b[4] = [4, 4, 14, 14]
    out = kalman.interpolate_missing(b)
    np.testing.assert_allclose(out[2], [2, 2, 12, 12], atol=1e-9)


def test_check_setup():
    assert kalman.check_setup({"right_hand": [1], "objects": [1]},
                              {"right_hand": 1, "objects": 1})
    assert not kalman.check_setup({"right_hand": []},
                                  {"right_hand": 1, "objects": 1})


# ---------------- data ----------------
def test_chunk_vid_index():
    rows = [{"video_id": "v0", "frame_nb": 100}]
    chunks = chunk_vid_index(rows, chunk_size=10, chunk_step=2,
                             chunk_spacing=40)
    assert all(len(c["frame_idxs"]) == 10 for c in chunks)
    assert all(max(c["frame_idxs"]) < 100 for c in chunks)
    # end-of-video chunk covers the true last frame (reference schedule:
    # start = frame_nb - span + step - 1, chunkvids.py:33)
    assert any(c["frame_idxs"][-1] == 99 for c in chunks)


def test_collate():
    samples = [{"a": np.ones(3), "b": 1, "c": "x"},
               {"a": np.zeros(3), "b": 2, "c": "y"}]
    out = collate(samples)
    assert out["a"].shape == (2, 3)
    assert out["b"].tolist() == [1, 2]
    assert out["c"] == ["x", "y"]


# ---------------- eval ----------------
def test_chamfer_and_adds_zero_for_identical():
    v, _ = icosphere(2, 0.1)
    a = jnp.asarray(v)[None]
    assert float(pm.chamfer_distance(a, a)[0]) < 1e-8
    assert float(pm.add_s(a, a)[0]) < 1e-4  # f32 matmul cancellation floor


def test_adds_symmetric_invariance():
    """ADD-S must be small for a rotated sphere (symmetric object)."""
    import jax
    from homan_tpu.core import geometry as geo
    v, _ = icosphere(3, 0.1)
    R = geo.random_rotations(jax.random.PRNGKey(0), 1)[0]
    a = jnp.asarray(v)[None]
    b = (jnp.asarray(v) @ R)[None]
    assert float(pm.add_s(a, b)[0]) < 0.01
    # but verts_dists (correspondence) is large
    assert float(pm.verts_dists(a, b)[0]) > 0.02


def test_verts_dists_translation():
    v, _ = icosphere(2, 0.1)
    a = jnp.asarray(v)[None]
    b = a + 0.05
    d = float(pm.verts_dists(a, b)[0])
    assert abs(d - 0.05 * np.sqrt(3)) < 1e-5


def test_align_metrics_invariant_to_rigid_shift():
    """Shifting BOTH hand and object by the same offset must not change the
    aligned metrics (they are hand-centered)."""
    v, _ = icosphere(2, 0.1)
    hand = jnp.asarray(v)[None]
    obj = jnp.asarray(v)[None] + 0.2
    m1 = pm.get_align_metrics(hand, hand, obj, obj)
    m2 = pm.get_align_metrics(hand + 5.0, hand + 5.0, obj + 5.0, obj + 5.0)
    assert set(m1) == {"hand_mean_aligned", "obj_chamfer_aligned"}
    for k in m1:
        np.testing.assert_allclose(m1[k], m2[k], atol=1e-4)


def test_inter_metrics_contact_detection():
    v, f = bumpy_potato(2, 0.1, seed=0)
    f = jnp.asarray(f)
    hand = jnp.asarray(v)[None]
    obj_far = jnp.asarray(v)[None] + 1.0
    obj_pen = jnp.asarray(v)[None] + 0.05
    far = pm.get_inter_metrics(hand, obj_far, f, f)
    pen = pm.get_inter_metrics(hand, obj_pen, f, f)
    assert far["has_contact"] == [False]
    assert pen["has_contact"] == [True]
    assert pen["pen_depths"][0] > far["pen_depths"][0]


def test_interpolate_sequence():
    frames = [0, 10]
    vals = np.stack([np.zeros((2, 3)), np.ones((2, 3)) * 10])
    out = pm.interpolate_sequence(frames, vals, [0, 5, 10])
    np.testing.assert_allclose(out[1], np.full((2, 3), 5.0))


def test_crop_and_resize_zero_pads_outside_image():
    """Out-of-image samples contribute ZERO (detectron2 ROIAlign
    semantics) — border-clamping would replicate edge foreground across
    the out-of-image strip of a crop past the frame."""
    m = np.zeros((1, 16, 16), np.float32)
    m[0, :, 12:] = 1.0  # foreground touching the right edge
    # Crop extends 16px past the right image border.
    out = mask_lib.crop_and_resize(m, np.array([[8, 0, 32, 16]]), 24)
    # Left part of the crop sees the in-image foreground...
    assert out[0][:, :6].max() > 0.5
    # ...but the out-of-image right strip must be ~zero, not replicated fg.
    assert out[0][:, -8:].max() < 0.25


def test_chunk_vid_index_short_video_fallback():
    """Videos shorter than chunk_size*chunk_step still yield one fitted
    chunk (the reference would emit negative frame ids here,
    chunkvids.py:33); only sub-chunk_size videos are skipped."""
    rows = [{"seq_idx": "short", "frame_nb": 12}]
    chunks = chunk_vid_index(rows, chunk_size=10, chunk_step=4,
                             chunk_spacing=200)
    assert len(chunks) == 1
    idxs = chunks[0]["frame_idxs"]
    assert len(idxs) == 10 and idxs[0] == 0 and idxs[-1] < 12
    assert sorted(set(idxs)) == idxs  # strictly increasing, no repeats
    # Fewer frames than chunk_size: skipped (with a warning), not crashed.
    assert chunk_vid_index([{"seq_idx": "tiny", "frame_nb": 4}],
                           chunk_size=10, chunk_step=4) == []
