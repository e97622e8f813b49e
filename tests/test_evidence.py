"""Evidence providers: cached replay, frame assembly, object mask info."""
import numpy as np
import pytest

from homan_tpu.frontend import evidence as ev


def make_hand_estimate(seed=0):
    rng = np.random.RandomState(seed)
    return {
        "verts": rng.randn(778, 3).astype(np.float32),
        "verts2d": rng.rand(778, 2).astype(np.float32) * 640,
        "mano_pca_pose": rng.randn(16).astype(np.float32),
        "mano_rot": np.zeros(3, np.float32),
        "mano_betas": np.zeros(10, np.float32),
        "mano_trans": np.zeros(3, np.float32),
        "rotations": np.eye(3, dtype=np.float32),
        "translations": np.zeros((1, 3), np.float32),
        "cams": np.array([1.0, 0, 0], np.float32),
    }


def test_cached_evidence_roundtrip(tmp_path):
    masks = [{"full_mask": np.zeros((64, 64), bool), "score": 0.9}]
    hands = {"right_hand": make_hand_estimate()}
    ev.save_frame_evidence(str(tmp_path), "0", masks, hands)
    cache = ev.CachedEvidence(str(tmp_path))
    m = cache.masks_from_bboxes("0", None, None)
    h = cache.regress("0", None)
    assert m[0]["score"] == 0.9
    np.testing.assert_array_equal(h["right_hand"]["verts"],
                                  hands["right_hand"]["verts"])


def test_build_object_mask_info_conventions():
    full = np.zeros((128, 128), np.float32)
    full[40:80, 50:90] = 1.0
    occ = np.zeros((1, 128, 128), np.float32)
    occ[0, 40:60, 50:70] = 1.0  # hand over part of the object + outside
    occ[0, 0:20, 0:20] = 1.0
    info = ev.build_object_mask_info(full, np.array([50, 40, 90, 80]),
                                     occ, rend_size=64)
    assert set(info.keys()) >= {"bbox", "square_bbox", "full_mask",
                                "crop_mask", "target_crop_mask"}
    tm = info["target_crop_mask"]
    assert set(np.unique(tm)) <= {-1.0, 0.0, 1.0}
    assert (tm == 1).any()
    # square box larger than the tight box by the expansion factor
    assert info["square_bbox"][2] >= (90 - 50)


def test_get_frame_infos_with_cached_provider(tmp_path):
    # Record two frames of evidence, then assemble a clip from cache
    full = np.zeros((128, 128), bool)
    full[30:70, 30:70] = True
    hand_mask = np.zeros((128, 128), bool)
    hand_mask[50:90, 50:90] = True
    for t in range(2):
        ev.save_frame_evidence(
            str(tmp_path), str(t),
            # masks_from_bboxes returns hand masks then object mask queries
            # are separate calls; CachedEvidence replays the same list —
            # store the union for simplicity of this test
            [{"full_mask": hand_mask, "score": 0.8},
             {"full_mask": full, "score": 0.95}],
            {"right_hand": make_hand_estimate(t)})

    class SplitCache(ev.CachedEvidence):
        def masks_from_bboxes(self, key, boxes, class_ids):
            all_masks = super().masks_from_bboxes(key, boxes, class_ids)
            if class_ids and class_ids[0] == -1:  # object query
                return [all_masks[1]]
            return [all_masks[0]]

    cache = SplitCache(str(tmp_path))
    person_frames, obj_infos = ev.get_frame_infos(
        images=[None, None], hand_provider=cache, mask_provider=cache,
        hand_bboxes={"right_hand": np.array([50, 50, 40, 40]),
                     "left_hand": None},
        obj_bboxes=np.array([[30, 30, 70, 70], [30, 30, 70, 70]]),
        camintr=np.tile(np.eye(3), (2, 1, 1)), frame_keys=["0", "1"])
    assert len(person_frames) == 2 and len(obj_infos) == 2
    assert person_frames[0][0]["hand_side"] == "right"
    # occlusion-aware target: hand-covered object-free pixels are -1
    assert (obj_infos[0]["target_crop_mask"] == -1).any()

    stacked = ev.stack_person_parameters(person_frames)
    assert stacked["verts"].shape == (2, 778, 3)
    assert stacked["hand_sides"] == ["right"]


def test_square_bbox_expansion():
    sq = ev.square_bbox_with_expansion(np.array([0.0, 0.0, 100.0, 50.0]))
    assert sq[2] == sq[3]
    assert sq[2] == pytest.approx(100 * 1.3)


def test_two_hand_order_stable_across_frames(tmp_path):
    """Hand order is LEFT then RIGHT regardless of screen positions (the
    reference's fixed processing order, frameinfos.py:128-152): a per-frame
    bbox sort would corrupt the interleaved layout when hands cross."""
    full = np.zeros((64, 64), bool)
    full[20:40, 20:40] = True
    for t in range(2):
        ev.save_frame_evidence(
            str(tmp_path), str(t),
            [{"full_mask": full, "score": 0.9, "class_id": 0},
             {"full_mask": full, "score": 0.9, "class_id": 0},
             {"full_mask": full, "score": 0.95, "class_id": -1}],
            {"left_hand": make_hand_estimate(t),
             "right_hand": make_hand_estimate(10 + t)})
    cache = ev.CachedEvidence(str(tmp_path))
    # hands cross between frames: left hand at x=50 then x=5
    person_frames, _ = ev.get_frame_infos(
        images=[None, None], hand_provider=cache, mask_provider=cache,
        hand_bboxes={"left_hand": np.array([[50, 10, 20, 20],
                                            [5, 10, 20, 20]], np.float32),
                     "right_hand": np.array([[5, 10, 20, 20],
                                             [50, 10, 20, 20]], np.float32)},
        obj_bboxes=np.array([[20, 20, 40, 40]] * 2),
        camintr=np.tile(np.eye(3), (2, 1, 1)), frame_keys=["0", "1"])
    for frame in person_frames:
        assert [p["hand_side"] for p in frame] == ["left", "right"]
