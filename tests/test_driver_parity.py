"""Full-driver end-to-end parity vs the reference's `fit_vid_dataset.main()`.

The final rung of the parity ladder: execute the reference's ACTUAL driver
(/root/reference/fit_vid_dataset.py:174-533) — real `get_frame_infos`,
`render_gt_masks`, `add_occlusions`, `find_optimal_poses`,
`add_target_hand_occlusions`, `optimize_hand_object`, point/inter metrics,
checkpoint layout — against `homan_tpu.cli.fit_video.main()` on one
identical synthetic clip, and compare the artifacts both drivers leave on
disk: indep_fit contents (person + object evidence and stage-B selection),
the converged joint_fit state, the loss traces, and the final metrics.
This pins the stage A->B->C hand-off semantics (mask {-1,0,1} encodings,
square-box/K_roi conventions, interleaved layouts, init-state composition)
in ONE test instead of piecewise.

Replaced on the reference side (the legitimate external boundaries only):

  * the pretrained detector nets (PointRend / FrankMocap) -> stubs emitting
    GT-derived evidence in the recorded-output format both pipelines
    consume (the --gt_masks ablation path then REPLACES all masks with GT
    renders anyway, via the reference's real render_gt_masks);
  * the CUDA NMR rasterizer -> torch-autograd bridges over OUR
    rasterize_soft (silhouettes, both optimization stages) and
    rasterize_hard (the textured instance-color GT-mask render,
    homan/prepare/gtmasks.py:27-77), so both sides see identical pixels
    and gradients and the test isolates the driver chain itself;
  * the CUDA SDF voxelizer -> the grid-mode bridge over our scene SDF
    (inter metrics only; collision/contact are off in the default config);
  * `compute_random_rotations` -> a pinned set drawn from OUR
    `geo.random_rotations(PRNGKey(seed))`, which our stage B regenerates
    from the same seed — identical candidates on both sides;
  * matplotlib/video visualization -> inert stubs (optimization-neutral);
  * REND_SIZE (256) -> 64 on the reference side (homan/lib2d/maskutils.py
    module global + the hardcoded crop sizes in gtmasks.py via a BitMasks
    override) so the test runs at CPU-suite scale; the constant scales all
    crops uniformly and every K_roi is normalized, so semantics are
    unchanged.

Our driver runs with the exact reference stage-B schedule
(prune_to=None, refine_scale=1.0); the TPU-tuned schedule's selection
equivalence is covered by test_poseinit_parity.
"""
import argparse
import os
import pickle
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_reference_parity import ref  # noqa: F401  (module-scoped fixture)
from test_jointopt_parity import _torch_bridge, _make_sdf_stub

pytestmark = pytest.mark.slow

IMAGE_SIZE = 128   # full-image size (driver image_size)
R = 64             # ROI crop / render size (replaces the reference's 256)
T = 10             # >= 10: get_frame_infos slices super2d[::T//10]
C = 8              # pose candidates
OBJ_ITERS = 20     # enough to converge candidates (selection is stable)
JOINT_ITERS = 40
SEED = 0


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


def _rot_x(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)


# ---------------------------------------------------------------------------
# shared synthetic clip (dataset-format annots consumed by BOTH drivers)
# ---------------------------------------------------------------------------

def _project_bbox(verts, K):
    proj = verts @ K.T
    uv = proj[:, :2] / proj[:, 2:]
    return np.array([uv[:, 0].min(), uv[:, 1].min(),
                     uv[:, 0].max(), uv[:, 1].max()], np.float32)


@pytest.fixture(scope="module")
def clip():
    import jax.numpy as jnp

    from homan_tpu.core import mano as mano_lib
    from homan_tpu.core.mano import ManoLayer
    from homan_tpu.core.meshes import bumpy_potato
    from homan_tpu.frontend.gtevidence import render_instance_masks

    mano = ManoLayer.synthetic(0)
    rest = np.asarray(mano_lib.mano_forward_jit(
        mano.params["right"], jnp.zeros(10), jnp.zeros(3),
        jnp.zeros(45))["verts"], np.float32)
    hand_faces = np.asarray(mano.faces("right"))
    v_obj, f_obj = bumpy_potato(2, 0.085, seed=4)
    # Strongly scalene: distinct extents along every axis give distinct
    # silhouettes for distinct poses, so the best-mean-IoU ranking is
    # decisive — a near-symmetric blob lets two different candidates
    # converge to ~equal IoU and float chaos then flips the selection
    # (a benign degeneracy, but it would make this parity test flaky).
    v_obj = (v_obj * np.array([1.0, 0.7, 0.45])).astype(np.float32)
    K = np.array([[140.0, 0, 64.0], [0, 140.0, 64.0], [0, 0, 1]], np.float32)

    # Object drifts AWAY from the hand in x and stays mostly visible; the
    # hand sits beside it at a straddling depth so hand and object each
    # partially occlude the other in the overlap band (both {-1} target
    # encodings exercised) without ever hiding the object (an all-occluded
    # frame has an empty target and stage B degenerates on both sides).
    obj_v3d, hand_v3d, gt_obj_trans = [], [], []
    for t in range(T):
        R_o = (_rot_z(0.25 * t + 0.2) @ _rot_x(0.4 + 0.08 * t)).astype(
            np.float32)
        t_o = np.array([-0.02 - 0.004 * t, 0.012 * t - 0.02,
                        0.58 + 0.006 * t], np.float32)
        gt_obj_trans.append(t_o)
        obj_v3d.append(v_obj @ R_o + t_o)
        R_h = _rot_x(-0.3 + 0.06 * t).astype(np.float32)
        t_h = np.array([0.075 + 0.002 * t, 0.01 * t - 0.03, 0.62], np.float32)
        # frame-varying deformation: Procrustes is then non-trivial and the
        # local-vs-posed verts_hand_og convention is load-bearing
        bump = (0.004 * np.sin(rest * 37.0 + t)).astype(np.float32)
        hand_v3d.append((rest + bump) @ R_h + t_h)
    obj_v3d = np.stack(obj_v3d)
    hand_v3d = np.stack(hand_v3d)

    hand_bboxes = np.stack([_project_bbox(v, K) for v in hand_v3d])
    obj_bboxes = np.stack([_project_bbox(v, K) for v in obj_v3d])
    Ks = np.tile(K[None], (T, 1, 1))

    annots = {
        "frame_idxs": list(range(T)),
        "images": [np.zeros((IMAGE_SIZE, IMAGE_SIZE, 3), np.uint8)
                   for _ in range(T)],
        "hands": [{
            "label": "right_hand",
            "bbox": hand_bboxes,
            "verts3d": hand_v3d,
            "faces": np.tile(hand_faces[None], (T, 1, 1)),
        }],
        "objects": [{
            "bbox": obj_bboxes,
            "verts3d": obj_v3d,
            "canverts3d": np.tile(v_obj[None], (T, 1, 1)),
            "faces": np.tile(np.asarray(f_obj)[None], (T, 1, 1)),
        }],
        "camera": {"K": Ks},
        "setup": {"objects": 1, "right_hand": 1},
    }
    # GT visibility masks for the detector stubs (one z-buffered combined
    # scene — the same function our gtevidence uses, so the detector
    # boundary carries identical pixels into both pipelines).
    vis = render_instance_masks([hand_v3d, obj_v3d], [hand_faces, f_obj],
                                Ks, IMAGE_SIZE)
    return dict(annots=annots, mano=mano, rest=rest, hand_faces=hand_faces,
                v_obj=v_obj, f_obj=np.asarray(f_obj), K=K,
                hand_vis=np.asarray(vis[0]), obj_vis=np.asarray(vis[1]),
                hand_v3d=hand_v3d, obj_v3d=obj_v3d,
                gt_obj_trans=np.stack(gt_obj_trans))


class _ClipDataset:
    def __init__(self, annots):
        self.annots = annots

    def __len__(self):
        return 1

    def __getitem__(self, idx):
        assert idx == 0
        return self.annots


# ---------------------------------------------------------------------------
# reference-side detector stubs (the external-net boundary)
# ---------------------------------------------------------------------------

class _StubMaskExtractor:
    """PointRend output format (homan/pointrend.py:118-140) from GT
    visibility masks; detected boxes = tight mask boxes (the controlled
    input both pipelines derive their square crops from)."""
    clip = None

    def __init__(self):
        self._hand_t = 0
        self._obj_t = 0

    def masks_from_bboxes(self, im, boxes, pred_classes=None, class_idx=-1,
                          image_size=IMAGE_SIZE, **kw):
        from homan_tpu.core import bbox as bbox_ops
        from homan_tpu.frontend import masks as mask_lib
        from homan_tpu.frontend.evidence import square_bbox_with_expansion
        from homan_tpu.frontend.gtevidence import mask_to_bbox

        c = type(self).clip
        if class_idx == 0:  # hand call (frameinfos.py:23-27)
            t = self._hand_t
            self._hand_t += 1
            m = c["hand_vis"][t].astype(np.float32)
        else:               # object call (frameinfos.py:161-165)
            t = self._obj_t
            self._obj_t += 1
            m = c["obj_vis"][t].astype(np.float32)
        bb_xyxy = mask_to_bbox(m)
        square = square_bbox_with_expansion(bb_xyxy)  # xywh, 0.3 expansion
        sq_xyxy = bbox_ops.bbox_wh_to_xy(square)
        crop = mask_lib.crop_and_resize(m[None], sq_xyxy[None], R)[0] >= 0.5
        return [{
            "bbox": np.asarray(bbox_ops.bbox_xy_to_wh(bb_xyxy), np.float32),
            "class_id": 0 if class_idx == 0 else 41,
            "score": 1.0,
            "full_mask": torch.from_numpy(m),
            "square_bbox": np.asarray(square, np.float32),
            "crop_mask": crop.astype(np.float32),
        }]


class _StubHandMocap:
    """FrankMocap output format (homan/mocap.py:59-97) from GT: the global
    pose is the Procrustes alignment of the rest hand to the GT verts and
    the local verts its exact inverse — the same evidence our gtevidence
    synthesizes, so the regressor boundary is identical on both sides."""
    clip = None

    def __init__(self, *a, **k):
        self._t = 0

    def regress(self, image, hand_bboxes, add_margin=False, debug=False,
                K=None, viz_path=None):
        from homan_tpu.frontend.gtevidence import procrustes_rigid

        c = type(self).clip
        t = self._t
        self._t += 1
        hv = c["hand_v3d"][t]
        R_init, t_init = procrustes_rigid(c["rest"], hv)
        proj = hv @ c["K"].T
        uv = (proj[:, :2] / proj[:, 2:]).astype(np.float32)
        pred = {
            "pred_vertices_smpl": ((hv - t_init) @ R_init.T).astype(
                np.float32),
            "pred_vertices_img": uv,
            "perspective_trans": t_init.reshape(1, 3),
            "perspective_rot": R_init.T.astype(np.float32),
            "faces": c["hand_faces"].astype(np.int32),
            "pred_camera": np.zeros(3, np.float32),
            "pred_hand_pose": np.zeros((1, 48), np.float32),
            "pred_pca_pose": np.zeros((1, 16), np.float32),
            "pred_hand_betas": np.zeros((1, 10), np.float32),
            "mano_trans": np.zeros((1, 3), np.float32),
            "hand_side": "right",
        }
        return [{"right_hand": pred, "left_hand": None}]


# ---------------------------------------------------------------------------
# reference driver import (under the fixture's dependency stubs)
# ---------------------------------------------------------------------------

def _module(name, **attrs):
    mod = sys.modules.get(name) or types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


@pytest.fixture(scope="module")
def fvd(ref):
    """Import the reference's fit_vid_dataset with its external-net and
    plotting imports stubbed (all optimization-inert); the pipeline modules
    (frameinfos, gtmasks, maskutils, pose_optimization, jointopt,
    pointmetrics, saveresults, preprocess, bbox) stay REAL."""
    _module("libyana.exputils")
    _module("libyana.exputils.argutils", print_args=lambda *a, **k: None)
    _module("libyana.randomutils")
    _module("libyana.randomutils.setseeds", set_all_seeds=lambda s: None)
    _module("homan.getdataset", get_dataset=None)        # set per-test
    _module("homan.pointrend", MaskExtractor=None)       # set per-test
    _module("homan.viz")
    _module("homan.viz.vizframeinfo",
            viz_frame_info=lambda info, sample_folder=None, save=False:
            np.zeros((8, 8, 4), np.uint8))
    _module("homan.viz.viz_gtpred_points",
            viz_gtpred_points=lambda **kw: None)
    _module("homan.viz.cliputils", add_clip_text=lambda imgs, text: imgs)
    _module("homan.visualize", visualize_hand_object=None)  # set per-test
    _module("homan.eval.evalviz", make_video_np=lambda *a, **k: None)
    _module("handmocap")
    _module("handmocap.hand_mocap_api", HandMocap=None)  # set per-test

    import homan.prepare.frameinfos as ref_frameinfos
    import homan.prepare.gtmasks as ref_gtmasks
    import fit_vid_dataset as ref_driver
    return types.SimpleNamespace(driver=ref_driver,
                                 frameinfos=ref_frameinfos,
                                 gtmasks=ref_gtmasks)


def _ref_args(result_root):
    ns = argparse.Namespace(
        dataset="ho3d", chunk_step=1, frame_nb=T, data_step=100,
        data_offset=0, seed=SEED, split="val", box_mode="gt",
        output_dir="output", num_obj_iterations=OBJ_ITERS,
        num_joint_iterations=JOINT_ITERS, num_initializations=C,
        mesh_path=None, result_root=result_root, resume=None,
        resume_indep=False, debug=False, viz_step=10 ** 9,
        save_indep=False, only_missing=0, gt_masks=1,
        optimize_mano=0, optimize_mano_beta=0, optimize_object_scale=0,
        hand_proj_mode="persp", hand_checkpoint="", smpl_path="",
        lw_smooth=2000.0, lw_v2d_hand=50.0, lw_inter=1.0, lw_contact=0.0,
        lw_depth=0.0, lw_pca=0.004, lw_sil_obj=1.0, lw_sil_hand=0.0,
        lw_collision=0.0, lw_scale_obj=0.001, lw_scale_hand=0.001)
    ns.lw_smooth_obj = ns.lw_smooth
    ns.lw_smooth_hand = ns.lw_smooth
    return ns


def _install_render_bridges(ref, monkeypatch, clip):
    """Silhouette + textured-RGB bridges over OUR rasterizer, the shared
    IoU, and the pinned candidate rotations."""
    import jax.numpy as jnp

    from homan_tpu.render import rasterize_hard, rasterize_soft
    from homan_tpu.render.rasterizer import MeshTopology, RasterSettings

    topo_obj = MeshTopology.from_faces(clip["f_obj"])
    settings = RasterSettings(image_size=R)  # = our drivers' default at R

    def render(verts, K):
        Kb = jnp.broadcast_to(K, (verts.shape[0], 3, 3))
        return rasterize_soft(verts, topo_obj, Kb, settings)["sil"]

    renderer_cls = sys.modules["neural_renderer"].renderer.Renderer
    monkeypatch.setattr(renderer_cls, "default_render_fn",
                        staticmethod(_torch_bridge(render, n_grad_args=1)))

    # Textured instance-color GT render (gtmasks.py:27-77 contract):
    # EXACTLY the render_instance_masks configuration, so both pipelines'
    # GT evidence comes from the same pixels.
    gt_settings = RasterSettings(image_size=min(IMAGE_SIZE, 256),
                                 edges_per_tile=128)

    def rgb_render(verts, faces, textures, K, renderer):
        v = verts.detach().cpu().numpy().astype(np.float32)
        f = faces[0].detach().cpu().numpy().astype(np.int32)
        colors = textures.detach().cpu().numpy()[0][:, 0, 0, 0, :].astype(
            np.float32)
        Kn = K.detach().cpu().numpy().astype(np.float32)
        out = rasterize_hard(jnp.asarray(v), MeshTopology.from_faces(f),
                             jnp.asarray(Kn), jnp.asarray(colors),
                             gt_settings, background=0.0, ambient=1.0,
                             diffuse=0.0, specular=0.0, shading="flat")
        rgb = torch.from_numpy(np.asarray(out["rgb"]).transpose(0, 3, 1, 2))
        sil = torch.from_numpy(np.asarray(out["sil"]).astype(np.float32))
        depth = torch.from_numpy(np.asarray(out["depth"]))
        return rgb, sil, depth

    monkeypatch.setattr(renderer_cls, "default_rgb_render_fn",
                        staticmethod(rgb_render))

    def torch_iou(pred, tgt):
        p = pred > 0.5
        r_ = tgt > 0.5
        inter = (p & r_).sum(dim=(-2, -1)).float()
        union = (p | r_).sum(dim=(-2, -1)).float()
        return torch.where(union > 0, inter / union.clamp(min=1.0),
                           torch.zeros_like(inter))

    monkeypatch.setattr(ref.poseopt.ioumetrics, "batch_mask_iou", torch_iou)

    from test_poseinit_parity import _shared_rotations
    rots = _shared_rotations(C, seed=SEED)
    monkeypatch.setattr(
        ref.poseopt, "compute_random_rotations",
        lambda n, upright=False: torch.from_numpy(rots[:n].copy()))


def _run_reference_driver(ref, fvd, clip, result_root, monkeypatch):
    _StubMaskExtractor.clip = clip
    _StubHandMocap.clip = clip
    monkeypatch.setattr(fvd.driver, "MaskExtractor", _StubMaskExtractor)
    monkeypatch.setattr(fvd.driver, "HandMocap", _StubHandMocap)
    monkeypatch.setattr(
        sys.modules["homan.getdataset"], "get_dataset",
        lambda *a, **k: (_ClipDataset(clip["annots"]), IMAGE_SIZE))

    def fake_viz(model, images, dist=4, viz_len=7, image_size=IMAGE_SIZE,
                 **kw):
        n = len(images) if images is not None else viz_len
        z = np.zeros((n, IMAGE_SIZE, IMAGE_SIZE, 3), np.uint8)
        return z, z

    monkeypatch.setattr(fvd.driver, "visualize_hand_object", fake_viz)

    def fake_jointopt_viz(model, images, dist=1, viz_len=7):
        img = np.zeros((1, 8, 8, 3), np.uint8)
        return img, img

    monkeypatch.setattr(ref.jointopt, "visualize_hand_object",
                        fake_jointopt_viz)

    # REND_SIZE 256 -> R: module global in maskutils; hardcoded 256 crop
    # sizes in gtmasks routed through a size-overriding BitMasks.
    monkeypatch.setattr(ref.maskutils, "REND_SIZE", R)
    base_bitmasks = sys.modules["detectron2.structures"].BitMasks

    class _SizedBitMasks(base_bitmasks):
        def crop_and_resize(self, boxes, mask_size):
            return super().crop_and_resize(boxes, R)

    monkeypatch.setattr(fvd.gtmasks, "BitMasks", _SizedBitMasks)

    # Inter metrics SDF backend (pointmetrics.py:102-124) -> our grid SDF.
    sdf_stub = _make_sdf_stub(clip["hand_faces"], clip["f_obj"])
    monkeypatch.setattr(ref.lossutils.scenesdf, "SDFSceneLoss", sdf_stub)

    _install_render_bridges(ref, monkeypatch, clip)
    fvd.driver.main(_ref_args(result_root))


def _run_our_driver(clip, result_root, monkeypatch, tmp_path):
    import homan_tpu.data.factory as factory
    import homan_tpu.fit.poseinit as poseinit
    from homan_tpu.cli import fit_video

    monkeypatch.setattr(
        factory, "get_dataset",
        lambda *a, **k: (_ClipDataset(clip["annots"]), IMAGE_SIZE))

    # Exact reference stage-B schedule (the TPU-tuned schedule's selection
    # equivalence is test_poseinit_parity's business, not this test's).
    orig_fop = poseinit.find_optimal_poses

    def exact_fop(*a, **kw):
        kw["prune_to"] = None
        kw["refine_scale"] = 1.0
        kw["candidate_chunk"] = C
        return orig_fop(*a, **kw)

    monkeypatch.setattr(poseinit, "find_optimal_poses", exact_fop)

    args = fit_video.get_args([
        "--dataset", "ho3d", "--split", "val", "--gt_masks", "1",
        "--frame_nb", str(T), "--chunk_step", "1",
        "--num_initializations", str(C),
        "--num_obj_iterations", str(OBJ_ITERS),
        "--num_joint_iterations", str(JOINT_ITERS),
        "--viz_step", "0", "--rend_size", str(R),
        "--optimize_mano", "0", "--optimize_mano_beta", "0",
        "--seed", str(SEED), "--prewarm", "0",
        "--result_root", result_root,
        "--mano_root", str(tmp_path / "no_mano"),
    ])
    fit_video.main(args)


# ---------------------------------------------------------------------------
# the test
# ---------------------------------------------------------------------------

def _np(x):
    return (x.detach().cpu().numpy() if hasattr(x, "detach")
            else np.asarray(x))


def test_full_driver_end_to_end_parity(ref, fvd, clip, tmp_path, monkeypatch):
    ref_root = str(tmp_path / "ref")
    our_root = str(tmp_path / "ours")
    monkeypatch.chdir(tmp_path)

    _run_our_driver(clip, our_root, monkeypatch, tmp_path)
    _run_reference_driver(ref, fvd, clip, ref_root, monkeypatch)

    ref_dir = os.path.join(ref_root, "samples", "00000000")
    our_dir = os.path.join(our_root, "samples", "00000000")

    # ---- indep_fit: stage A evidence + stage B selection ------------------
    with open(os.path.join(ref_dir, "indep_fit.pkl"), "rb") as f:
        rif = pickle.load(f)
    with open(os.path.join(our_dir, "indep_fit.pkl"), "rb") as f:
        oif = pickle.load(f)

    rpp = rif["person_parameters"]   # per-frame list of dicts (H rows each)
    opp = oif["person_parameters"]   # stacked dict over T*H rows
    for key, atol in (("verts", 1e-5), ("verts2d", 1e-3),
                      ("rotations", 1e-5), ("translations", 1e-5),
                      ("K_roi", 1e-4)):
        theirs = np.concatenate([_np(p[key]) for p in rpp])
        np.testing.assert_allclose(np.asarray(opp[key]), theirs, atol=atol,
                                   err_msg=f"person {key}")
    # hand evidence masks and {-1,0,1} occlusion targets: same pixels
    for key in ("masks", "target_masks"):
        theirs = np.concatenate([_np(p[key]) for p in rpp])
        ours = np.asarray(opp[key], np.float32)
        agree = float((ours == theirs.astype(np.float32)).mean())
        assert agree >= 0.999, f"person {key} agreement {agree:.4f}"

    rop = rif["object_parameters"]
    oop = oif["object_parameters"]
    assert len(rop) == len(oop) == T
    for t in range(T):
        # stage-B selected motion: a different winning candidate is a
        # random SO(3) draw away (~90deg+ relative rotation); the SAME
        # candidate differs only by torch-vs-XLA float chaos accumulated
        # through T chained refinements (measured 0.035 max entry drift by
        # frame 2 at T=10). Assert the relative rotation angle sits in the
        # same-candidate regime, two orders below the alternative.
        Rr = _np(rop[t]["rotations"]).reshape(3, 3)
        Ro = np.asarray(oop[t]["rotations"]).reshape(3, 3)
        cosang = (np.trace(Ro.T @ Rr) - 1.0) / 2.0
        ang = float(np.arccos(np.clip(cosang, -1.0, 1.0)))
        assert ang < 0.15, f"frame {t} selected rotation differs by " \
            f"{np.degrees(ang):.1f} deg (different candidate?)"
        # Translation: xy is pixel-anchored (chaos-bounded); z is the
        # silhouette's weakly-observable direction, where float chaos
        # random-walks along the basin valley — assert BOTH sides stay in
        # a GT band instead of agreeing with each other.
        to = np.asarray(oop[t]["translations"]).reshape(3)
        tr = _np(rop[t]["translations"]).reshape(3)
        tg = clip["gt_obj_trans"][t]
        np.testing.assert_allclose(to[:2], tr[:2], atol=2e-2,
                                   err_msg=f"frame {t} selected xy")
        assert abs(to[2] - tg[2]) < 0.1, f"frame {t} our z {to[2]:.3f} " \
            f"vs GT {tg[2]:.3f}"
        assert abs(tr[2] - tg[2]) < 0.1, f"frame {t} ref z {tr[2]:.3f} " \
            f"vs GT {tg[2]:.3f}"
        np.testing.assert_allclose(
            np.asarray(oop[t]["K_roi"]).reshape(3, 3),
            _np(rop[t]["K_roi"]).reshape(3, 3),
            atol=1e-4, err_msg=f"frame {t} object K_roi")
        ours_tm = np.asarray(oop[t]["target_masks"]).reshape(R, R)
        theirs_tm = _np(rop[t]["target_masks"]).reshape(R, R)
        agree = float((ours_tm == theirs_tm).mean())
        assert agree >= 0.999, f"frame {t} object target mask {agree:.4f}"

    # ---- joint_fit: converged stage-C state --------------------------------
    # The hand is fully observable (GT keypoints + Procrustes init): tight.
    # The object inherits the stage-B z chaos; its converged xy/rotation
    # must agree, its z must stay in the shared GT band.
    sd = torch.load(os.path.join(ref_dir, "joint_fit.pt"))["state_dict"]
    ck = np.load(os.path.join(our_dir, "joint_fit.npz"))
    np.testing.assert_allclose(
        np.asarray(ck["translations_hand"]).reshape(-1),
        _np(sd["translations_hand"]).reshape(-1), atol=2e-2,
        err_msg="converged translations_hand")

    # rot6d PARAMETERS are compared as the rotations they produce: the 6d
    # parametrization has a 3-dim null space (any pre-Gram-Schmidt coords
    # give the same matrix), and Adam's walk along it decorrelates between
    # frameworks once the inits differ by stage-B chaos.
    def _rot_angles(ours6, theirs6):
        import jax.numpy as jnp
        from homan_tpu.core import geometry as geo
        a = np.asarray(geo.rot6d_to_matrix(
            jnp.asarray(np.asarray(ours6).reshape(-1, 3, 2))))
        b = np.asarray(geo.rot6d_to_matrix(
            jnp.asarray(_np(theirs6).reshape(-1, 3, 2))))
        tr = np.einsum("bij,bij->b", a, b)  # trace(a^T b)
        return np.degrees(np.arccos(np.clip((tr - 1.0) / 2.0, -1.0, 1.0)))

    ang_h = _rot_angles(ck["rotations_hand"], sd["rotations_hand"])
    assert ang_h.max() < 6.0, f"converged hand rotations differ by up to " \
        f"{ang_h.max():.1f} deg"
    ang_o = _rot_angles(ck["rotations_object"], sd["rotations_object"])
    assert ang_o.max() < 10.0, f"converged object rotations differ by up " \
        f"to {ang_o.max():.1f} deg"
    to = np.asarray(ck["translations_object"]).reshape(T, 3)
    tr = _np(sd["translations_object"]).reshape(T, 3)
    tg = clip["gt_obj_trans"]
    np.testing.assert_allclose(to[:, :2], tr[:, :2], atol=3e-2,
                               err_msg="converged object xy")
    assert np.abs(to[:, 2] - tg[:, 2]).max() < 0.1, "our converged z band"
    assert np.abs(tr[:, 2] - tg[:, 2]).max() < 0.1, "ref converged z band"

    # ---- loss traces --------------------------------------------------------
    with open(os.path.join(ref_dir, "results.pkl"), "rb") as f:
        rres = pickle.load(f)
    with open(os.path.join(our_dir, "results.pkl"), "rb") as f:
        ores = pickle.load(f)
    loss_keys = ["loss_sil_obj", "loss_v2d_hand", "loss_smooth_obj",
                 "loss_smooth_hand", "loss_inter", "loss_pca",
                 "loss_scale_obj", "loss_scale_hand", "loss"]
    for k in loss_keys:
        ours = np.asarray(ores["losses"][k], np.float64)
        theirs = np.asarray(rres["losses"][k], np.float64)
        assert ours.shape == theirs.shape == (JOINT_ITERS,), k
        # The inits differ by the stage-B z chaos, so exact loss-trace
        # parity is NOT expected here (that is test_jointopt_parity's
        # claim, on identical inits); same order of magnitude throughout
        # plus converged-state agreement above is the end-to-end claim.
        np.testing.assert_allclose(ours[0], theirs[0], rtol=0.35, atol=1e-5,
                                   err_msg=f"iter0 {k}")
        np.testing.assert_allclose(ours[-1], theirs[-1], rtol=0.35,
                                   atol=1e-5, err_msg=f"converged {k}")
    assert float(rres["losses"]["loss"][-1]) < \
        0.7 * float(rres["losses"]["loss"][0]), "reference run vacuous"

    # ---- final metrics ------------------------------------------------------
    rmet = rres["metrics"]
    omet = ores["metrics"]
    # Hand metrics tight (fully observable); object metrics banded by the
    # z chaos (|z_ours - z_ref| up to ~0.06 -> verts_dists_obj differs by
    # up to that amount); pen_depths by the same geometry band.
    for k, rtol, atol in (("verts_dists_obj", 0.2, 6e-2),
                          ("verts_dists_hand", 0.12, 2e-3),
                          ("chamfer_dists_obj", 0.3, 6e-3),
                          ("verts_dists_obj_init", 0.3, 6e-2),
                          ("verts_dists_hand_init", 0.2, 4e-3),
                          ("pen_depths", 0.3, 1e-2)):
        assert k in rmet, f"reference metrics missing {k}"
        assert k in omet, f"our metrics missing {k}"
        np.testing.assert_allclose(
            np.asarray(omet[k], np.float64),
            np.asarray(rmet[k], np.float64), rtol=rtol, atol=atol,
            err_msg=f"metric {k}")
    # both fits actually reconstruct the clip (non-vacuous end state; the
    # object's residual is depth-dominated — silhouette scale is the only
    # z cue at C=8 candidates, same limitation as the reference)
    assert float(np.mean(omet["verts_dists_obj"])) < 0.1
    assert float(np.mean(omet["verts_dists_hand"])) < 0.02
