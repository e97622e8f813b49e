import os

import numpy as np
import jax.numpy as jnp
import pytest

from homan_tpu.frontend.assign import COCO_CLASS_NAMES, assign_human_masks
from homan_tpu.viz import extras
from homan_tpu.viz.render_viz import (composite, make_video, render_scene,
                                      rotate_in_place, save_image_grid,
                                      visualize_hand_object)


def test_assign_human_masks_greedy():
    sil = np.zeros((2, 32, 32), bool)
    sil[0, 2:10, 2:10] = True
    sil[1, 20:30, 20:30] = True
    masks = np.zeros((3, 32, 32), bool)
    masks[0, 19:31, 19:31] = True  # matches hand 1
    masks[1, 1:11, 1:11] = True    # matches hand 0
    masks[2, 15:18, 15:18] = True  # matches nothing
    out = assign_human_masks(sil, masks, min_overlap=0.3)
    assert (out[0] == masks[1]).all()
    assert (out[1] == masks[0]).all()


def test_assign_human_masks_none():
    sil = np.ones((1, 8, 8), bool)
    out = assign_human_masks(sil, None)
    assert out.sum() == 0


def test_assign_below_threshold_empty():
    sil = np.zeros((1, 16, 16), bool)
    sil[0, :4, :4] = True
    masks = np.zeros((1, 16, 16), bool)
    masks[0, 10:, 10:] = True
    out = assign_human_masks(sil, masks, min_overlap=0.5)
    assert out.sum() == 0


def test_coco_names():
    assert COCO_CLASS_NAMES[0] == "BG"
    assert COCO_CLASS_NAMES[1] == "person"
    assert len(COCO_CLASS_NAMES) == 81


def test_mask_border_and_overlay():
    m = np.zeros((32, 32), bool)
    m[8:24, 8:24] = True
    border = extras.mask_border(m)
    assert border.any()
    assert not border[16, 16]  # interior not border
    img = np.zeros((32, 32, 3), np.uint8)
    out = extras.overlay_mask(img, m)
    assert out[16, 16, 0] > 0


def test_clip_text_and_bbox():
    frames = [np.zeros((64, 64, 3), np.uint8) for _ in range(2)]
    out = extras.add_clip_text(frames, "Pred")
    assert out.shape == (2, 64, 64, 3)
    assert out.sum() > 0  # text drawn
    img = extras.draw_bbox(np.zeros((64, 64, 3), np.uint8), [5, 5, 30, 30])
    assert img.sum() > 0


def test_frame_detection_panel():
    img = np.zeros((64, 64, 3), np.uint8)
    m = np.zeros((64, 64), bool)
    m[10:30, 10:30] = True
    out = extras.frame_detection_panel(
        img, hand_bboxes={"right_hand": [5, 5, 25, 25]},
        obj_bbox=[30, 30, 60, 60], hand_masks={"right_hand": m}, obj_mask=m)
    assert out.sum() > 0


def test_gtpred_point_grid(tmp_path):
    imgs = [np.zeros((32, 32, 3), np.uint8)]
    pred = [np.random.rand(10, 2) * 32]
    gt = [np.random.rand(10, 2) * 32]
    p = extras.gtpred_point_grid(imgs, pred, gt, str(tmp_path / "g.png"))
    assert os.path.exists(p)


def test_render_scene_and_video(tmp_path):
    from homan_tpu.core.meshes import bumpy_potato
    v, f = bumpy_potato(1, 0.1, seed=0)
    verts = jnp.asarray(v)[None] + jnp.asarray([0, 0, 0.5])
    K = jnp.asarray([[[1.0, 0, 0.5], [0, 1, 0.5], [0, 0, 1]]])
    frames = render_scene([np.asarray(verts)], [f], ["gold"], K,
                          image_size=64)
    assert frames[0].shape == (64, 64, 3)
    assert frames[0].min() < 250  # object rendered (not all background)
    # rotate for top-down
    frames_rot = render_scene([np.asarray(verts)], [f], ["gold"], K,
                              image_size=64, rotate=True)
    assert not np.array_equal(frames[0], frames_rot[0])
    p = make_video(frames * 3, str(tmp_path / "clip.gif"), fps=4)
    assert os.path.exists(p)
    p2 = make_video(frames * 3, str(tmp_path / "clip.mp4"), fps=4)
    assert os.path.exists(p2)


def test_visualize_hand_object_smoke():
    from homan_tpu.frontend.gtsynth import make_synthetic_scene
    scene = make_synthetic_scene(seed=0, frame_nb=2, image_size=64,
                                 rend_size=32)
    frontal, top_down = visualize_hand_object(
        scene.gt_state, scene.consts, scene.cfg, viz_len=2, image_size=64)
    assert len(frontal) == 2 and len(top_down) == 2
    assert frontal[0].shape == (64, 64, 3)


def test_ortho_hand_projection_mode():
    """hand_proj_mode='ortho' places the hand via the weak-persp camera."""
    import dataclasses
    from homan_tpu.fit import model as M
    from homan_tpu.frontend.gtsynth import make_synthetic_scene
    scene = make_synthetic_scene(seed=0, frame_nb=2, image_size=64,
                                 rend_size=32)
    cfg = dataclasses.replace(scene.cfg, hand_proj_mode="ortho")
    state = dataclasses.replace(
        scene.gt_state,
        cams_hand=jnp.tile(jnp.asarray([[2.0, 0.1, 0.0]]), (2, 1)))
    verts, verts_det = M.get_verts_hand(state, scene.consts, cfg)
    assert verts.shape == (2, 778, 3)
    assert np.isfinite(np.asarray(verts)).all()
    assert float(verts[..., 2].mean()) > 0  # placed in front of the camera


def test_turntable_frames():
    from homan_tpu.core.meshes import bumpy_potato
    from homan_tpu.viz.render_viz import turntable_frames
    import jax.numpy as jnp
    v, f = bumpy_potato(1, 0.1, seed=0)
    verts = np.asarray(v)[None] + np.asarray([0, 0, 0.5])
    K = jnp.asarray([[[1.0, 0, 0.5], [0, 1, 0.5], [0, 0, 1]]])
    frames = turntable_frames([verts], [f], ["gold"], K, n_steps=4,
                              image_size=64)
    assert len(frames) == 4
    # the view changes as it turns
    assert not np.array_equal(frames[0], frames[2])


def test_stage_timers_accumulate_and_sync():
    import jax.numpy as jnp
    from homan_tpu.utils_profiling import StageTimers

    timers = StageTimers()
    with timers.time("stage_a"):
        pass
    with timers.time("stage_a", sync=jnp.ones(4) * 2):
        x = jnp.ones(8).sum()
    with timers.time("stage_b") as holder:
        holder["sync"] = jnp.arange(3)
    assert timers.counts["stage_a"] == 2
    assert timers.counts["stage_b"] == 1
    rep = timers.report()
    assert "stage_a" in rep and "ms avg" in rep


def test_profile_trace_writes_dir(tmp_path):
    import jax.numpy as jnp
    from homan_tpu.utils_profiling import profile_trace

    with profile_trace(str(tmp_path / "trace")) as d:
        jnp.ones(16).sum().block_until_ready()
    import os
    assert os.path.isdir(d)
    assert any(os.scandir(d))  # trace artifacts written


def test_html_video_embed():
    from homan_tpu.viz import extras
    tag = extras.html_video_embed("clip.webm", height=120)
    assert "clip.webm" in tag and "video" in tag and "120" in tag
