"""Numeric parity against the PyTorch reference implementation itself.

BASELINE.md requires reference values to be produced by RUNNING the
reference (or replaying recorded fixtures). The reference's pure-math
modules run on CPU torch here, with its external dependencies stubbed:

  * libyana.verify.checkshape / conversions.npt / camutils.project — tiny
    utility shims with the documented, unambiguous semantics (no-op shape
    check, as_tensor/asarray, pinhole projection);
  * `.cuda()` / torch.cuda tensor constructors — patched to CPU no-ops;
  * sdf / trimesh / detectron2 / imagify — never exercised by the functions
    under test, stubbed so module import succeeds.

Covered: rot6d<->matrix, persp transformation (incl. detach split values),
both translation auto-depth initializers, smooth/PCA losses, pairwise
distances + masked mean, video chunking schedule.
"""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference"


def _module(name, **attrs):
    mod = sys.modules.get(name) or types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


@pytest.fixture(scope="module")
def ref(tmp_path_factory):
    """Import the reference's pure-math modules under dependency stubs."""
    sys.path.insert(0, REF_ROOT)
    _module("libyana")
    _module("libyana.verify")
    _module("libyana.verify.checkshape",
            check_shape=lambda *a, **k: None)
    _module("libyana.conversions")
    _module("libyana.conversions.npt",
            tensorify=lambda x, *a, **k: torch.as_tensor(
                np.asarray(x, np.float32)),
            numpify=lambda x: np.asarray(
                x.detach().cpu() if hasattr(x, "detach") else x))

    def batch_proj2d(pts, K):
        proj = torch.bmm(pts, K.transpose(1, 2))
        return proj[..., :2] / proj[..., 2:]

    _module("libyana.camutils")
    _module("libyana.camutils.project", batch_proj2d=batch_proj2d)
    _module("libyana.camutils.camconvs")
    _module("libyana.visutils")
    _module("libyana.visutils.imagify", viz_imgrow=lambda *a, **k: None)
    _module("sdf", SDF=object)
    _module("trimesh", Trimesh=object, load=lambda *a, **k: None)

    # neural_renderer stub: `projection` implements the multiperson-fork NMR
    # formula (neural_renderer/projection.py — pinhole divide, K, y-flip,
    # [0, orig_size] -> [-1, 1]; distortion omitted: every call site here
    # passes zero dist_coeffs), and `renderer.Renderer` records K/R/t and
    # returns an injected silhouette so the loss normalization downstream of
    # the CUDA rasterizer is comparable on identical renders.
    def _nr_projection(vertices, K=None, R=None, t=None, dist_coeffs=None,
                       orig_size=256):
        verts = torch.matmul(vertices, R.transpose(2, 1)) + t
        z = verts[..., 2]
        x_ = verts[..., 0] / (z + 1e-9)
        y_ = verts[..., 1] / (z + 1e-9)
        v3 = torch.stack([x_, y_, torch.ones_like(z)], dim=-1)
        v3 = torch.matmul(v3, K.transpose(1, 2))
        u, v = v3[..., 0], v3[..., 1]
        v = orig_size - v
        u = 2 * (u - orig_size / 2.0) / orig_size
        v = 2 * (v - orig_size / 2.0) / orig_size
        return torch.stack([u, v, z], dim=-1)

    class _NrRenderer:
        def __init__(self, image_size=None, K=None, R=None, t=None,
                     orig_size=1, **kw):
            self.image_size = image_size
            self.K, self.R, self.t = K, R, t
            self.dist_coeffs = torch.zeros(
                (K.shape[0] if K is not None else 1, 5))
            self.near, self.far = 0.1, 100.0  # NMR Renderer defaults
            self.fixed_sil = None
            # Live differentiable backend (torch-autograd bridge into our
            # JAX rasterizer) for the converged-optimization parity tests;
            # when unset, the static injected-silhouette path is used.
            # Class-level default so renderers constructed INSIDE the code
            # under test (HOMan.__init__ -> Losses.__init__) pick it up.
            self.render_fn = None

        default_render_fn = None
        # Full textured render contract `renderer(verts, faces, textures,
        # K=...) -> (rgb, sil, depth)` (homan/prepare/gtmasks.py:79): set by
        # the driver-parity test to a bridge over our rasterize_hard.
        default_rgb_render_fn = None

        def __call__(self, verts, faces, textures=None, K=None, mode=None):
            if textures is not None and mode is None:
                fn = type(self).default_rgb_render_fn
                assert fn is not None, "rgb render not bridged"
                return fn(verts, faces, textures,
                          self.K if K is None else K, self)
            fn = self.render_fn or type(self).default_render_fn
            if fn is not None:
                return fn(verts, self.K if K is None else K)
            assert self.fixed_sil is not None, "inject fixed_sil first"
            return self.fixed_sil

    _module("neural_renderer", projection=_nr_projection,
            renderer=types.SimpleNamespace(Renderer=_NrRenderer),
            Renderer=_NrRenderer)

    class _BoxMode:
        """detectron2 BoxMode with its two absolute modes; `convert`
        implements the documented standard formulas (XYXY<->XYWH) so the
        reference's bbox/camera helpers are runnable. Like the real
        detectron2, tensor inputs stay tensors (maskutils.py:27 calls
        `.to(device)` on the result)."""
        XYXY_ABS, XYWH_ABS = 0, 1

        @staticmethod
        def convert(box, from_mode, to_mode):
            is_torch = isinstance(box, torch.Tensor)
            box = (box.clone().double() if is_torch
                   else np.asarray(box, np.float64).copy())
            if from_mode != to_mode:
                if from_mode == _BoxMode.XYXY_ABS:  # -> XYWH
                    box[..., 2] -= box[..., 0]
                    box[..., 3] -= box[..., 1]
                else:  # XYWH -> XYXY
                    box[..., 2] += box[..., 0]
                    box[..., 3] += box[..., 1]
            return box

    _module("detectron2")
    _module("detectron2.structures")
    _module("detectron2.structures.boxes", BoxMode=_BoxMode)

    # CPU no-ops for the reference's unconditional .cuda() calls. Override
    # unconditionally: CPU torch builds still EXPOSE torch.cuda.LongTensor,
    # but .type(torch.cuda.LongTensor) raises at use
    # (contactloss.py:66-70 batch_pairwise_dist use_cuda=True default).
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.cuda.FloatTensor = torch.FloatTensor
    torch.cuda.LongTensor = torch.LongTensor

    # lossutils loads local_data/closed_fmano.npy at import with a relative
    # path; fabricate it in a temp cwd for the imports only.
    import os
    tmp = tmp_path_factory.mktemp("refdata")
    (tmp / "local_data").mkdir()
    np.save(tmp / "local_data" / "closed_fmano.npy",
            np.zeros((1538, 3), np.int64))
    old_cwd = os.getcwd()
    os.chdir(tmp)
    try:
        import homan.utils.geometry as ref_geometry
        import homan.utils.camera as ref_camera
        import homan.lib3d.optitrans as ref_optitrans
        import homan.datasets.chunkvids as ref_chunkvids
        import homan.interactions.contactloss as ref_contactloss
        import homan.lossutils as ref_lossutils

        # homan/losses.py additionally needs pairwise distances (alias the
        # reference's own contactloss implementation — sqrt'd NOWHERE by the
        # min-type interaction term, matching libyana's squared convention)
        # and a mask-IoU metric (zeroed: the iou_object metric is not under
        # loss-parity test and must not affect loss values).
        _module("libyana.distutils",
                batch_pairwise_dist=ref_contactloss.batch_pairwise_dist)
        _module("libyana.metrics")
        _module("libyana.metrics.iou",
                batch_mask_iou=lambda a, b: torch.zeros(a.shape[0]))
        import homan.losses as ref_losses

        # homan/mocap.py: external nets stubbed (only the pure cam/sort
        # math of process_mocap_predictions is under test); BitMasks with
        # detectron2's documented crop_and_resize contract (ROIAlign crop
        # to mask_size, threshold 0.5) via bilinear resize for the
        # full-image boxes used at mocap.py:173-177.
        class _BitMasks:
            def __init__(self, t):
                self.t = torch.as_tensor(np.asarray(t, np.float32))

            def crop_and_resize(self, boxes, mask_size):
                out = torch.nn.functional.interpolate(
                    self.t[:, None], size=(mask_size, mask_size),
                    mode="bilinear", align_corners=False)[:, 0]
                return out > 0.5

        _module("detectron2.structures.masks", BitMasks=_BitMasks)
        _module("handmocap")
        _module("handmocap.hand_mocap_api", HandMocap=object)
        _module("handmocap.hand_bbox_detector", HandBboxDetector=object)
        import homan.mocap as ref_mocap

        # homan/lib2d/maskutils.py: BitMasks with detectron2's ROIAlign crop
        # semantics, implemented via OUR frontend.masks.crop_and_resize — the
        # crop op is shared on purpose, so the parity test targets the
        # reference's occlusion/square-box/K_roi logic, not the (already
        # contract-tested) crop kernel.
        from homan_tpu.frontend import masks as our_masks

        class _RoiBitMasks:
            def __init__(self, t):
                self.t = np.asarray(torch.as_tensor(t).float())

            def crop_and_resize(self, boxes, mask_size):
                out = our_masks.crop_and_resize(
                    self.t, np.asarray(torch.as_tensor(boxes).float()),
                    mask_size)
                return torch.as_tensor(out) >= 0.5

        import sys as _sys
        setattr(_sys.modules["detectron2.structures"], "BitMasks",
                _RoiBitMasks)

        # libyana kcrop contract (crop+resize intrinsics update), numpy.
        def _kcrop(K, boxes, out_sizes):
            Kn = np.asarray(torch.as_tensor(K).float()).copy()
            bx = np.asarray(torch.as_tensor(boxes).float())
            for i in range(Kn.shape[0]):
                x1, y1, x2, y2 = bx[i]
                sx = out_sizes[i] / max(x2 - x1, 1e-9)
                sy = out_sizes[i] / max(y2 - y1, 1e-9)
                Kn[i, 0, 0] *= sx
                Kn[i, 0, 1] *= sx
                Kn[i, 0, 2] = (Kn[i, 0, 2] - x1) * sx
                Kn[i, 1, 1] *= sy
                Kn[i, 1, 2] = (Kn[i, 1, 2] - y1) * sy
            return torch.as_tensor(Kn)

        _module("libyana.lib3d")
        _module("libyana.lib3d.kcrop", get_K_crop_resize=_kcrop)
        import homan.lib2d.maskutils as ref_maskutils

        # homan/homan.py + homan/jointopt.py (the real HOMan forward and the
        # reference's actual Adam optimization chain, used by the converged
        # -fit parity tests in test_jointopt_parity.py): trans3d.rot_points
        # is viz-only (rotated top-down renders), np2vid writes videos,
        # `mano.model.load` supplies the external MANO LBS layers — with
        # optimize_mano=False (homan/homan.py:98-106, 341-358) the loaded
        # layers are never forwarded, so an attribute-only stub suffices.
        _module("libyana.lib3d.trans3d", rot_points=lambda x, *a, **k: x)
        _module("libyana.vidutils")
        _module("libyana.vidutils.np2vid",
                make_video=lambda *a, **k: None)
        _module("mano")
        _module("mano.model",
                load=lambda *a, **k: types.SimpleNamespace(
                    hand_mean=torch.zeros(45)))
        import homan.homan as ref_homan
        import homan.jointopt as ref_jointopt

        # homan/eval/: py3drendutils never exercised; chamfer_distance
        # stubbed with its mathematical definition (the reference's own
        # comment at pointmetrics.py:20-28 documents the equivalence).
        _module("libyana.renderutils")
        _module("libyana.renderutils.py3drendutils",
                batch_render=lambda *a, **k: None)

        def _chamfer_distance(a, b, batch_reduction="mean"):
            d2 = (a[:, :, None] - b[:, None]).pow(2).sum(-1)
            loss = d2.min(2)[0].mean(1) + d2.min(1)[0].mean(1)
            if batch_reduction == "mean":
                loss = loss.mean()
            return loss, None

        _module("pytorch3d")
        _module("pytorch3d.loss")
        _module("pytorch3d.loss.chamfer", chamfer_distance=_chamfer_distance)
        import homan.eval.ho3devalutils as ref_ho3devalutils
        import homan.eval.pointmetrics as ref_pointmetrics
        import homan.pose_optimization as ref_poseopt
    finally:
        os.chdir(old_cwd)
    return types.SimpleNamespace(
        geometry=ref_geometry, camera=ref_camera, optitrans=ref_optitrans,
        chunkvids=ref_chunkvids, contactloss=ref_contactloss,
        lossutils=ref_lossutils, losses=ref_losses, mocap=ref_mocap,
        maskutils=ref_maskutils, ho3devalutils=ref_ho3devalutils,
        pointmetrics=ref_pointmetrics, poseopt=ref_poseopt,
        homan=ref_homan, jointopt=ref_jointopt)


def test_rot6d_matrix_parity(ref):
    import jax.numpy as jnp
    from homan_tpu.core import geometry as geo
    rng = np.random.RandomState(0)
    r6 = rng.randn(16, 3, 2).astype(np.float32)
    ours = np.asarray(geo.rot6d_to_matrix(jnp.asarray(r6)))
    theirs = ref.geometry.rot6d_to_matrix(
        torch.from_numpy(r6.reshape(16, 6))).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)
    # and back
    back_ours = np.asarray(geo.matrix_to_rot6d(jnp.asarray(theirs)))
    back_theirs = ref.geometry.matrix_to_rot6d(
        torch.from_numpy(theirs)).numpy()
    np.testing.assert_allclose(back_ours, back_theirs, atol=1e-6)


def test_compute_transformation_persp_parity(ref):
    import jax.numpy as jnp
    from homan_tpu.core import camera as cam
    from homan_tpu.core import geometry as geo
    rng = np.random.RandomState(1)
    B, V = 4, 50
    mesh = rng.randn(V, 3).astype(np.float32) * 0.1
    trans = rng.randn(B, 1, 3).astype(np.float32)
    rot = np.asarray(geo.rot6d_to_matrix(
        jnp.asarray(rng.randn(B, 3, 2).astype(np.float32))))
    scales = (1 + 0.1 * rng.randn(B)).astype(np.float32)

    theirs, theirs_det = ref.camera.compute_transformation_persp(
        torch.from_numpy(mesh), torch.from_numpy(trans),
        torch.from_numpy(rot), torch.from_numpy(scales))
    ours, ours_det = cam.compute_transformation_persp(
        jnp.asarray(mesh), jnp.asarray(trans), jnp.asarray(rot),
        jnp.asarray(scales))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours_det), theirs_det.numpy(),
                               atol=1e-5)


def test_tco_autodepth_parity(ref):
    from homan_tpu.fit import poseinit
    rng = np.random.RandomState(2)
    B, V = 6, 80
    pts = rng.randn(B, V, 3).astype(np.float32) * 0.08
    K = np.array([[600.0, 0, 320], [0, 610.0, 240], [0, 0, 1]], np.float32)
    bbox_xywh = np.array([100.0, 120.0, 80.0, 60.0], np.float32)

    theirs = ref.optitrans.TCO_init_from_boxes_zup_autodepth(
        bbox_xywh, torch.from_numpy(pts), torch.from_numpy(K)).numpy()
    ours = np.asarray(poseinit.tco_init_from_boxes_autodepth(
        bbox_xywh, pts, K))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_compute_optimal_translation_parity(ref):
    from homan_tpu.fit import poseinit
    rng = np.random.RandomState(3)
    B, V = 5, 60
    pts = rng.randn(B, V, 3).astype(np.float32) * 0.1
    bbox = np.array([90.0, 100.0, 60.0, 50.0], np.float32)
    theirs = ref.optitrans.compute_optimal_translation(
        bbox, torch.from_numpy(pts), f=1.0, img_size=256).numpy()
    ours = np.asarray(poseinit.compute_optimal_translation(
        bbox, pts, f=1.0, img_size=256))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_smooth_and_pca_loss_parity(ref):
    import jax.numpy as jnp
    from homan_tpu.fit import losses as L
    rng = np.random.RandomState(4)
    T, H = 5, 2
    verts_hand = rng.randn(T * H, 778, 3).astype(np.float32) * 0.1
    verts_obj = rng.randn(T, 300, 3).astype(np.float32) * 0.1
    theirs = ref.lossutils.compute_smooth_loss(
        torch.from_numpy(verts_hand), torch.from_numpy(verts_obj))
    ours = L.compute_smooth_loss(jnp.asarray(verts_hand),
                                 jnp.asarray(verts_obj), hand_nb=H)
    for k in ("loss_smooth_obj", "loss_smooth_hand"):
        np.testing.assert_allclose(float(ours[k]), float(theirs[k]),
                                   rtol=1e-5)
    pca = rng.randn(T * H, 16).astype(np.float32)
    theirs_pca = ref.lossutils.compute_pca_loss(torch.from_numpy(pca))
    ours_pca = L.compute_pca_loss(jnp.asarray(pca))
    np.testing.assert_allclose(float(ours_pca["loss_pca"]),
                               float(theirs_pca["pca_mean"])
                               if "pca_mean" in theirs_pca
                               else float(list(theirs_pca.values())[0]),
                               rtol=1e-5)


def test_pairwise_dist_and_masked_mean_parity(ref):
    import jax.numpy as jnp
    from homan_tpu.interactions import contact as contact_lib
    rng = np.random.RandomState(5)
    x = rng.randn(3, 40, 3).astype(np.float32)
    y = rng.randn(3, 70, 3).astype(np.float32)
    theirs = ref.contactloss.batch_pairwise_dist(
        torch.from_numpy(x), torch.from_numpy(y), use_cuda=False).numpy()
    ours = np.asarray(contact_lib.batch_pairwise_dist2(
        jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)

    d = rng.rand(4, 30).astype(np.float32)
    m = rng.rand(4, 30) > 0.5
    theirs_m = float(ref.contactloss.masked_mean_loss(
        torch.from_numpy(d), torch.from_numpy(m)))
    ours_m = float(contact_lib.masked_mean_loss(jnp.asarray(d),
                                                jnp.asarray(m)))
    np.testing.assert_allclose(ours_m, theirs_m, rtol=1e-5)


def test_chunk_vid_index_parity(ref):
    import pandas as pd
    from homan_tpu.data.chunking import chunk_vid_index
    rows = [{"seq_idx": "A", "frame_nb": 900},
            {"seq_idx": "B", "frame_nb": 57},
            {"seq_idx": "C", "frame_nb": 41}]
    for size, step, spacing in ((10, 4, 200), (10, 2, 100), (3, 1, 50)):
        theirs = ref.chunkvids.chunk_vid_index(
            pd.DataFrame(rows), chunk_size=size, chunk_step=step,
            chunk_spacing=spacing)
        ours = chunk_vid_index(rows, chunk_size=size, chunk_step=step,
                               chunk_spacing=spacing)
        theirs_chunks = [(r["seq_idx"], tuple(r["frame_idxs"]))
                         for _, r in theirs.iterrows()]
        ours_chunks = [(c["seq_idx"], tuple(c["frame_idxs"]))
                       for c in ours]
        # drop reference chunks with out-of-range frames (its end-of-video
        # start can emit negative/overflowing ids on short videos — a bug we
        # guard against)
        theirs_valid = [(s, f) for s, f in theirs_chunks
                        if min(f) >= 0
                        and max(f) < {"A": 900, "B": 57, "C": 41}[s]]
        assert ours_chunks == theirs_valid


def test_bbox_ops_parity(ref):
    import homan.utils.bbox as ref_bbox
    from homan_tpu.core import bbox as our_bbox
    rng = np.random.RandomState(6)
    xyxy = np.sort(rng.rand(5, 4).astype(np.float64) * 100, axis=-1)
    np.testing.assert_allclose(our_bbox.bbox_xy_to_wh(xyxy),
                               ref_bbox.bbox_xy_to_wh(xyxy), atol=1e-9)
    wh = our_bbox.bbox_xy_to_wh(xyxy)
    np.testing.assert_allclose(our_bbox.bbox_wh_to_xy(wh),
                               ref_bbox.bbox_wh_to_xy(wh), atol=1e-9)
    for exp in (0.0, 0.3):
        np.testing.assert_allclose(
            our_bbox.make_bbox_square(wh, bbox_expansion=exp),
            ref_bbox.make_bbox_square(wh, bbox_expansion=exp), atol=1e-9)


def test_local_to_global_cam_parity(ref):
    import jax.numpy as jnp
    from homan_tpu.core import camera as cam
    rng = np.random.RandomState(7)
    bboxes = np.sort(rng.rand(4, 4).astype(np.float64) * 400, axis=-1)
    cams = np.stack([rng.rand(4) * 2 + 0.5, rng.randn(4) * 0.1,
                     rng.randn(4) * 0.1], axis=1)
    theirs = ref.camera.local_to_global_cam(bboxes, cams, 640)
    ours = np.asarray(cam.local_to_global_cam(
        jnp.asarray(bboxes, jnp.float32), jnp.asarray(cams, jnp.float32),
        640.0))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_bbox_overlap_iou_parity(ref):
    import homan.utils.bbox as ref_bbox
    from homan_tpu.core import bbox as our_bbox
    # (the docstring's 2-element z-interval form indexes [2] in BOTH
    # implementations and is therefore dead; only 4-boxes are comparable)
    cases = [([0, 0, 10, 10], [5, 5, 15, 15]),
             ([0, 0, 10, 10], [11, 11, 20, 20]),
             ([0, 0, 4, 4], [0, 0, 4, 4])]
    for b1, b2 in cases:
        assert (our_bbox.check_overlap(b1, b2)
                == ref_bbox.check_overlap(b1, b2)), (b1, b2)
    iou_cases = [([0, 0, 10, 10], [5, 5, 15, 15]),
                 ([0, 0, 4, 4], [0, 0, 4, 4])]
    for b1, b2 in iou_cases:
        a1, a2 = np.asarray(b1, np.float64), np.asarray(b2, np.float64)
        np.testing.assert_allclose(our_bbox.compute_iou(a1, a2),
                                   ref_bbox.compute_iou(a1, a2), atol=1e-9)


def test_closed_fmano_derivation_matches_shipped():
    """close_boundary_fan reproduces the reference's shipped closed-fist
    topology (local_data/closed_fmano.npy, homan/lossutils.py:15): same
    number of cap faces over the identical 16-vertex wrist ring, and both
    meshes watertight with consistent orientation."""
    import os

    from homan_tpu.core.meshes import close_boundary_fan

    path = os.path.join(REF_ROOT, "local_data", "closed_fmano.npy")
    if not os.path.exists(path):
        pytest.skip("reference closed_fmano.npy not present")
    shipped = np.load(path)
    open_faces = shipped[:1538]
    ours = close_boundary_fan(open_faces)
    assert ours.shape == shipped.shape

    def directed_edges(f):
        return {(int(u), int(v))
                for tri in f
                for u, v in ((tri[0], tri[1]), (tri[1], tri[2]),
                             (tri[2], tri[0]))}

    for closed in (shipped, ours):
        es = directed_edges(closed)
        assert len(es) == 3 * closed.shape[0]  # each directed edge once
        assert all((v, u) in es for (u, v) in es)  # watertight + oriented
    assert (set(shipped[1538:].ravel().tolist())
            == set(ours[1538:].ravel().tolist()))  # identical wrist ring


def _make_ref_losses(ref, camintr, ref_mask_obj, keep_mask_obj,
                     ref_verts2d_hand=None, ref_mask_hand=None,
                     keep_mask_hand=None, K_rois_obj=None, K_rois_hand=None,
                     inter_type="min", hand_nb=1):
    """Construct the reference Losses with the stub NMR renderer."""
    B = camintr.shape[0]
    renderer = types.SimpleNamespace(
        K=camintr, R=torch.eye(3).expand(B, 3, 3).contiguous(),
        t=torch.zeros(B, 1, 3))
    V2 = (torch.zeros(B, 778, 2) if ref_verts2d_hand is None
          else ref_verts2d_hand)
    return ref.losses.Losses(
        renderer=renderer,
        ref_mask_object=ref_mask_obj,
        ref_verts2d_hand=V2,
        keep_mask_object=keep_mask_obj,
        ref_mask_hand=(ref_mask_obj if ref_mask_hand is None
                       else ref_mask_hand),
        keep_mask_hand=(keep_mask_obj if keep_mask_hand is None
                        else keep_mask_hand),
        camintr_rois_object=(camintr if K_rois_obj is None else K_rois_obj),
        camintr_rois_hand=(camintr if K_rois_hand is None else K_rois_hand),
        camintr=camintr,
        class_name="default",
        inter_type=inter_type,
        hand_nb=hand_nb,
    )


def test_sil_loss_normalization_parity(ref):
    """compute_sil_loss_object normalization (homan/losses.py:185-197) and
    the B=1 hand variant (:167-181): identical renders through both loss
    normalizations must give identical values (keep-mask division, /B)."""
    import jax.numpy as jnp
    from homan_tpu.fit import losses as L
    from homan_tpu.render import RasterSettings, rasterize_soft
    from homan_tpu.render.rasterizer import MeshTopology
    from homan_tpu.core.meshes import bumpy_potato

    rng = np.random.RandomState(11)
    S, B = 48, 3
    v, f = bumpy_potato(1, 0.2, seed=4)
    topo = MeshTopology.from_faces(f)
    verts = (jnp.asarray(v)[None] + jnp.asarray([0.0, 0.0, 0.9]))
    verts = jnp.concatenate(
        [verts + jnp.asarray(rng.randn(1, 3) * 0.03, jnp.float32)
         for _ in range(B)])
    K = jnp.asarray(
        np.repeat(np.array([[[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]]],
                           np.float32), B, axis=0))
    settings = RasterSettings(image_size=S, tile_px=16, faces_per_tile=192,
                              edges_per_tile=192)
    rend = rasterize_soft(verts, topo, K, settings)["sil"]  # (B, S, S)

    # {-1, 0, 1}-style evidence: ref = shifted render, keep knocks out a band
    ref_mask = np.zeros((B, S, S), np.float32)
    ref_mask[:, : S - 4, :] = np.asarray(rend)[:, 4:, :]
    keep = np.ones((B, S, S), np.float32)
    keep[:, :, :6] = 0.0

    ours, _ = L.compute_sil_loss_object(
        verts, topo, K, jnp.asarray(ref_mask), jnp.asarray(keep), settings)

    Lref = _make_ref_losses(ref, torch.as_tensor(np.asarray(K)),
                            torch.as_tensor(ref_mask),
                            torch.as_tensor(keep))
    Lref.renderer.fixed_sil = torch.as_tensor(np.asarray(rend))
    theirs, _ = Lref.compute_sil_loss_object(
        torch.as_tensor(np.asarray(verts)), torch.zeros(B, 1, 3))
    np.testing.assert_allclose(float(ours["loss_sil_obj"]),
                               float(theirs["loss_sil_obj"]), rtol=1e-5)

    # hand variant (B=1: the reference's loop reassigns `verts` and only
    # supports a single hand per call)
    ours_h = L.compute_sil_loss_hand(
        verts[:1], topo, K[:1], jnp.asarray(ref_mask[:1]),
        jnp.asarray(keep[:1]), settings)
    Lref1 = _make_ref_losses(ref, torch.as_tensor(np.asarray(K[:1])),
                             torch.as_tensor(ref_mask[:1]),
                             torch.as_tensor(keep[:1]))
    Lref1.renderer.fixed_sil = torch.as_tensor(np.asarray(rend[:1]))
    theirs_h = Lref1.compute_sil_loss_hand(
        torch.as_tensor(np.asarray(verts[:1])), torch.zeros(1, 1, 3))
    np.testing.assert_allclose(float(ours_h["loss_sil_hand"]),
                               float(theirs_h["loss_sil_hand"]), rtol=1e-5)


def test_v2d_loss_parity(ref):
    """compute_verts2d_loss_hand value + pixel-distance metric
    (homan/losses.py:141-164)."""
    import jax.numpy as jnp
    from homan_tpu.fit import losses as L

    rng = np.random.RandomState(5)
    B, img = 4, 640
    verts = rng.randn(B, 778, 3).astype(np.float32) * 0.05
    verts[..., 2] += 0.6
    camintr = np.repeat(np.array([[[1.05, 0, 0.5], [0, 1.05, 0.5],
                                   [0, 0, 1]]], np.float32), B, axis=0)
    ref2d = (rng.rand(B, 778, 2).astype(np.float32) * 0.5 + 0.25) * img

    ours_l, ours_m = L.compute_v2d_loss_hand(
        jnp.asarray(verts), jnp.asarray(camintr), jnp.asarray(ref2d),
        img, hand_nb=1)
    Lref = _make_ref_losses(ref, torch.as_tensor(camintr),
                            torch.zeros(B, 8, 8), torch.ones(B, 8, 8),
                            ref_verts2d_hand=torch.as_tensor(ref2d))
    theirs_l, theirs_m = Lref.compute_verts2d_loss_hand(
        torch.as_tensor(verts), image_size=img)
    np.testing.assert_allclose(float(ours_l["loss_v2d_hand"]),
                               float(theirs_l["loss_v2d_hand"]), rtol=1e-4)
    np.testing.assert_allclose(float(ours_m["v2d_hand"]),
                               float(theirs_m["v2d_hand"]), rtol=1e-4)


@pytest.mark.parametrize("inter_type", ["min", "centroid"])
def test_interaction_loss_gating_parity(ref, inter_type):
    """project_bbox overlap + z-distance gating and the interaction error
    (homan/losses.py:98-139, 199-242). Geometry spans interacting,
    bbox-disjoint, and z-separated frames; the reference's per-interaction
    normalization is dead code (losses.py:231-234 assigns `loss_inter_`),
    so the UN-normalized sum is the parity target."""
    import jax.numpy as jnp
    from homan_tpu.fit import losses as L
    from homan_tpu.fit import model as M

    rng = np.random.RandomState(9)
    B = 4
    hand = rng.randn(B, 778, 3).astype(np.float32) * 0.03
    obj = rng.randn(B, 300, 3).astype(np.float32) * 0.04
    hand[..., 2] += 0.6
    obj[..., 2] += 0.6
    # frame 1: push object out of the hand's bbox in x; frame 2: z-separate
    # beyond thresh=3; frame 3: interacting but offset slightly
    obj[1, :, 0] += 0.9
    obj[2, :, 2] += 4.0
    obj[3, :, :2] += 0.02
    camintr = np.repeat(np.array([[[1.0, 0, 0.5], [0, 1.0, 0.45],
                                   [0, 0, 1]]], np.float32), B, axis=0)

    cfg = M.HomanConfig(hand_sides=("right",), inter_type=inter_type)
    ours_l, ours_m = L.compute_interaction_loss(
        jnp.asarray(hand), jnp.asarray(obj), jnp.asarray(camintr), cfg)

    Lref = _make_ref_losses(ref, torch.as_tensor(camintr),
                            torch.zeros(B, 8, 8), torch.ones(B, 8, 8),
                            inter_type=inter_type)
    # gating decisions
    gates = Lref.assign_interaction_pairs(torch.as_tensor(hand),
                                          torch.as_tensor(obj))
    assert gates == [1, 0, 0, 1]
    theirs_l, theirs_m = Lref.compute_interaction_loss(
        torch.as_tensor(hand)[:, None], torch.as_tensor(obj)[:, None])
    np.testing.assert_allclose(float(ours_l["loss_inter"]),
                               float(theirs_l["loss_inter"]), rtol=1e-4)
    np.testing.assert_allclose(float(ours_m["handobj_maxdist"]),
                               float(theirs_m["handobj_maxdist"]), rtol=1e-4)


def test_contact_loss_parity_stubbed_sdf(ref, monkeypatch):
    """compute_contact_loss on stubbed SDF values
    (homan/interactions/contactloss.py:149-309): identical signed SDF
    samples drive both implementations' masks, tanh saturations,
    masked means and penetration metrics."""
    import jax.numpy as jnp
    from homan_tpu.interactions import contact

    rng = np.random.RandomState(3)
    B, Vo = 2, 120
    hand = rng.randn(B, 778, 3).astype(np.float32) * 0.03
    obj = (rng.randn(B, Vo, 3).astype(np.float32) * 0.02
           + np.array([0.01, 0, 0], np.float32))
    # signed stub: ~30% of hand verts "penetrating" (>= 0 in our convention
    # mirrors the reference's clamped grids; signed values exercise the
    # mask logic in both directions)
    sdf_vals = (rng.rand(B, 778).astype(np.float32) - 0.3)

    class _StubSDFL:
        def __init__(self, faces_list):
            pass

        def __call__(self, verts_list):
            return None, {"dist_values": {
                (1, 0): torch.as_tensor(sdf_vals),
                (0, 1): torch.zeros(B, Vo)}}

    monkeypatch.setattr(ref.contactloss.scenesdf, "SDFSceneLoss", _StubSDFL)

    # Zone mode: fabricate the reference's data/contact_zones.pkl in a temp
    # cwd (contactloss.py:301-309 loads the hardcoded relative path).
    import os
    import pickle
    import tempfile
    zones = {0: [745, 12, 300], 1: [317, 44], 2: [444, 555, 90, 91],
             3: [556], 4: [673, 700]}
    tmpdir = tempfile.mkdtemp()
    os.makedirs(os.path.join(tmpdir, "data"))
    with open(os.path.join(tmpdir, "data", "contact_zones.pkl"), "wb") as f:
        pickle.dump({"verts": None, "contact_zones": zones}, f)
    monkeypatch.chdir(tmpdir)
    # Latent reference bug: contactloss.py never imports pickle, so its
    # load_contacts (line 314-319) raises NameError as shipped. Inject it
    # so the intended zones semantics are runnable for parity.
    monkeypatch.setattr(ref.contactloss, "pickle", pickle, raising=False)

    for c_mode, z in [("dist_tanh", "all"), ("dist", "all"),
                      ("dist_sq", "all"), ("dist_tanh", "tips"),
                      ("dist_tanh", "zones")]:
        theirs = ref.contactloss.compute_contact_loss(
            torch.as_tensor(hand), [torch.zeros(10, 3).long()],
            torch.as_tensor(obj), [torch.zeros(10, 3).long()],
            contact_mode=c_mode, collision_mode=c_mode, contact_zones=z)
        t_missed, t_penetr, t_info, t_metrics = theirs
        ours = contact.compute_contact_loss(
            jnp.asarray(hand), None, jnp.asarray(obj), None,
            contact_mode=c_mode, collision_mode=c_mode,
            contact_zones=zones if z == "zones" else z,
            obj_sdf_at_hand=jnp.asarray(sdf_vals))
        o_missed, o_penetr, o_info, o_metrics = ours
        np.testing.assert_allclose(float(o_missed), float(t_missed),
                                   rtol=1e-4, atol=1e-7, err_msg=c_mode)
        np.testing.assert_allclose(float(o_penetr), float(t_penetr),
                                   rtol=1e-4, atol=1e-7, err_msg=c_mode)
        np.testing.assert_array_equal(
            np.asarray(o_info["attraction_masks"]),
            np.asarray(t_info["attraction_masks"].bool()))
        np.testing.assert_array_equal(
            np.asarray(o_info["repulsion_masks"]),
            np.asarray(t_info["repulsion_masks"].bool()))
        for k in ("max_penetr", "mean_penetr"):
            np.testing.assert_allclose(float(o_metrics[k]),
                                       float(t_metrics[k]), rtol=1e-4)


def test_ordinal_depth_loss_parity(ref, monkeypatch):
    """compute_ordinal_depth_loss vs homan/lossutils.py:133-169.

    The reference function is unreachable in its own driver (the no-arg
    call at homan/homan.py:507 and `torch.Tensor(0.0)` at lossutils.py:140
    both raise), so we patch that one dead expression and compare the
    pair-term SUMS: the per-(i,j) log(1+exp)/|mask| terms must match
    exactly; the denominators differ by design (ours counts only i != j
    pairs — documented at homan_tpu/fit/losses.py:309-314 — while the
    reference's loop also counts the zero-contribution i == j pairs)."""
    rng = np.random.RandomState(3)
    B, N, S = 3, 3, 24
    masks = rng.rand(B, N, S, S) > 0.55
    sils = [rng.rand(B, S, S) > 0.45 for _ in range(N)]
    sils[2][1] = False  # one (frame, entity) with zero rendered coverage
    depths = [(rng.rand(B, S, S) * 3.0).astype(np.float32)
              for _ in range(N)]

    class _TorchShim:
        """Proxy for the module-global `torch` that fixes Tensor(0.0)."""
        Tensor = staticmethod(lambda x: torch.tensor(x))

        def __getattr__(self, name):
            return getattr(torch, name)

    monkeypatch.setattr(ref.lossutils, "torch", _TorchShim())
    ref_out = ref.lossutils.compute_ordinal_depth_loss(
        torch.from_numpy(masks),
        [torch.from_numpy(s) for s in sils],
        [torch.from_numpy(d) for d in depths])
    ref_loss = float(ref_out["loss_depth"])

    import jax.numpy as jnp

    from homan_tpu.fit import losses as L
    our_out = L.compute_ordinal_depth_loss(
        jnp.asarray(masks), [jnp.asarray(s) for s in sils],
        [jnp.asarray(d) for d in depths])
    our_loss = float(our_out["loss_depth"])

    def coverage(i, j):
        return int(((sils[i] & sils[j]).sum(axis=(1, 2)) > 0).sum())

    ref_pairs = sum(coverage(i, j) for i in range(N) for j in range(N))
    our_pairs = sum(coverage(i, j) for i in range(N) for j in range(N)
                    if i != j)
    assert ref_pairs > our_pairs > 0
    np.testing.assert_allclose(our_loss * our_pairs, ref_loss * ref_pairs,
                               rtol=1e-5)


def test_stage_b_loss_terms_parity(ref):
    """Stage-B candidate loss vs PoseOptimizer.forward
    (homan/pose_optimization.py:105-151): identical silhouettes through both
    loss stacks must give identical mask L2 and edge-EDT chamfer terms, the
    same EDT buffer, and offscreen penalties equal up to the documented
    coordinate-unit factor (reference [-1,1] coords = 2x our [0,1] coords
    for the xy excess; z terms identical)."""
    import jax.numpy as jnp

    from homan_tpu.core.meshes import bumpy_potato
    from homan_tpu.fit import poseinit
    from homan_tpu.render import RasterSettings, rasterize_soft
    from homan_tpu.render.rasterizer import MeshTopology

    rng = np.random.RandomState(7)
    S, C = 48, 4
    v, f = bumpy_potato(1, 0.2, seed=4)
    topo = MeshTopology.from_faces(f)
    r6 = rng.randn(C, 3, 2).astype(np.float32)
    trans = np.tile(np.array([[[0.0, 0.0, 0.9]]], np.float32), (C, 1, 1))
    trans += rng.randn(C, 1, 3).astype(np.float32) * 0.05
    trans[0, 0, 0] += 1.2  # partially offscreen candidate
    K = np.array([[[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]]], np.float32)
    Kc = jnp.asarray(np.repeat(K, C, axis=0))

    from homan_tpu.core import geometry as geo
    R = geo.rot6d_to_matrix(jnp.asarray(r6))
    verts = jnp.einsum("vj,cjk->cvk", jnp.asarray(v), R) + jnp.asarray(trans)
    settings = RasterSettings(image_size=S, tile_px=16, faces_per_tile=192,
                              edges_per_tile=192)
    sil = rasterize_soft(verts, topo, Kc, settings)["sil"]  # (C, S, S)

    # {-1, 0, 1} evidence: shifted render of candidate 1 + occlusion band.
    ref_image = np.zeros((S, S), np.float32)
    ref_image[: S - 4, :] = (np.asarray(sil)[1, 4:, :] > 0.5)
    ref_image[:, :6] = -1.0
    target = jnp.asarray(np.tile((ref_image > 0).astype(np.float32),
                                 (C, 1, 1)))
    keep = jnp.asarray(np.tile((ref_image >= 0).astype(np.float32),
                               (C, 1, 1)))
    edt = jnp.asarray(np.tile(poseinit.reference_edge_edt(ref_image),
                              (C, 1, 1)))
    lw_chamfer = 0.5
    ours = poseinit.candidate_loss_terms(
        verts, topo, target, keep, edt, Kc, settings, lw_chamfer=lw_chamfer)

    model = ref.poseopt.PoseOptimizer(
        ref_image=ref_image,
        vertices=torch.from_numpy(v[None].astype(np.float32)),
        faces=torch.from_numpy(f[None].astype(np.int64)),
        textures=torch.ones(1, len(f), 1, 1, 1, 3),
        rotation_init=torch.from_numpy(r6.reshape(C, 3, 2)),
        translation_init=torch.from_numpy(trans),
        num_initializations=C,
        K=torch.from_numpy(K),
        lw_chamfer=lw_chamfer)
    model.renderer.fixed_sil = torch.as_tensor(np.asarray(sil))
    np.testing.assert_allclose(np.asarray(edt[0]),
                               model.edt_ref_edge[0].numpy(), rtol=1e-5)
    loss_dict, _, _ = model.forward()

    np.testing.assert_allclose(np.asarray(ours["mask"]),
                               loss_dict["mask"].detach().numpy(), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ours["chamfer"]),
                               loss_dict["chamfer"].detach().numpy(),
                               rtol=1e-4, atol=1e-6)
    ref_off = loss_dict["offscreen"].detach().numpy()
    our_off = 1e5 * (2.0 * np.asarray(ours["off_xy"])
                     + np.asarray(ours["off_z"]))
    np.testing.assert_allclose(our_off, ref_off, rtol=1e-4, atol=1e-3)
    assert ref_off[0] > 0  # the shifted candidate is actually offscreen


def test_body_mocap_processing_parity(ref):
    """process_mocap_predictions (homan/mocap.py:116-179): weak-persp cam
    rescale to the detection box + left-to-right sort, vs our
    frontend.evidence.process_body_estimates."""
    from homan_tpu.frontend.evidence import process_body_estimates

    rng = np.random.RandomState(2)
    N, V = 3, 40
    preds = []
    for i in range(N):
        preds.append({
            "pred_vertices_smpl": rng.randn(V, 3).astype(np.float32),
            "faces": rng.randint(0, V, (50, 3)).astype(np.int64),
            "pred_camera": (rng.rand(3).astype(np.float32) + 0.5),
            "bbox_scale_ratio": float(rng.rand() + 0.5),
            "global_cams": rng.randn(3).astype(np.float32),
        })
    # Unsorted boxes so the left-to-right argsort actually permutes
    bboxes = np.array([[300, 50, 420, 260], [20, 40, 180, 300],
                       [150, 60, 280, 290]], np.float64)

    theirs = ref.mocap.process_mocap_predictions(
        [dict(p, pred_camera=p["pred_camera"].copy()) for p in preds],
        bboxes.copy(), image_size=640)
    ours = process_body_estimates(preds, bboxes, image_size=640)

    for k in ("cams", "local_cams", "verts", "bboxes"):
        np.testing.assert_allclose(
            np.asarray(ours[k]), np.asarray(theirs[k].cpu()), rtol=1e-5,
            atol=1e-6, err_msg=k)
    np.testing.assert_array_equal(np.asarray(ours["faces"]),
                                  np.asarray(theirs["faces"].cpu()))

    # boxes-only path
    theirs_b = ref.mocap.process_mocap_predictions(None, bboxes.copy(),
                                                   image_size=640)
    ours_b = process_body_estimates(None, bboxes, image_size=640)
    np.testing.assert_allclose(np.asarray(ours_b["bboxes"]),
                               np.asarray(theirs_b["bboxes"].cpu()))


def test_interpolate_res_parity(ref):
    """Chunk->full-rate interpolation matches homan/eval/ho3devalutils.py:
    53-96 (linspace between sorted chunk frames + clamped end padding) on a
    3-chunk, 10-frame sequence."""
    from homan_tpu.eval.pointmetrics import interpolate_sequence

    rng = np.random.RandomState(0)
    frames = [0, 3, 7]
    frame_nb = 10
    keys = ["hand_verts3d", "obj_verts3d"]
    seq_res = {
        f: {k: rng.randn(5, 3).astype(np.float32) for k in keys}
        for f in frames
    }
    for f in frames:
        seq_res[f]["img_path"] = f"/data/seq/{f:04d}.png"
    theirs = ref.ho3devalutils.interpolate_res(seq_res, frame_nb, keys=keys)
    for k in keys:
        ours = interpolate_sequence(
            frames, np.stack([seq_res[f][k] for f in frames]),
            np.arange(frame_nb, dtype=np.float64))
        np.testing.assert_allclose(np.stack(theirs[k]), ours, atol=1e-6)


def test_point_metrics_parity(ref):
    """get_point_metrics values (chamfer / ADD-S / verts_dists) match the
    reference's aggregation (homan/eval/pointmetrics.py:17-45); the chamfer
    backend is the definitional pairwise form on both sides."""
    from homan_tpu.eval import pointmetrics as pm
    import jax.numpy as jnp

    rng = np.random.RandomState(1)
    gt = rng.randn(3, 40, 3).astype(np.float32)
    pred = (gt + 0.1 * rng.randn(3, 40, 3)).astype(np.float32)
    theirs = ref.pointmetrics.get_point_metrics(torch.as_tensor(gt),
                                                torch.as_tensor(pred))
    ours = pm.get_point_metrics(jnp.asarray(gt), jnp.asarray(pred))
    for k in ("chamfer_dists", "add-s", "verts_dists"):
        np.testing.assert_allclose(ours[k], theirs[k], rtol=1e-4, atol=1e-6)

    # Mismatched point counts: verts_dists falls back to ADD-S values in the
    # reference (pointmetrics.py:41-45); we keep the correspondence metric
    # only for matched shapes, so compare the shared keys.
    pred2 = rng.randn(3, 55, 3).astype(np.float32)
    theirs2 = ref.pointmetrics.get_point_metrics(torch.as_tensor(gt),
                                                 torch.as_tensor(pred2))
    np.testing.assert_allclose(
        [float(x) for x in pm.chamfer_distance(jnp.asarray(gt),
                                               jnp.asarray(pred2))],
        theirs2["chamfer_dists"], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        [float(x) for x in pm.add_s(jnp.asarray(gt), jnp.asarray(pred2))],
        theirs2["add-s"], rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("hand_nb", [1, 2])
def test_align_metrics_parity(ref, hand_nb):
    """get_align_metrics matches homan/eval/pointmetrics.py:61-99 exactly,
    including the RMS hand scale and the pred-centered-by-GT-centroid quirk
    (pointmetrics.py:69), for 1- and 2-hand layouts."""
    from homan_tpu.eval import pointmetrics as pm
    import jax.numpy as jnp

    rng = np.random.RandomState(2)
    B = 3
    gt_hand = rng.randn(B * hand_nb, 30, 3).astype(np.float32)
    pred_hand = (gt_hand + 0.2 * rng.randn(*gt_hand.shape) + 0.5).astype(
        np.float32) * 1.3
    gt_obj = rng.randn(B, 25, 3).astype(np.float32)
    pred_obj = (gt_obj * 0.8 + 0.3).astype(np.float32)

    theirs = ref.pointmetrics.get_align_metrics(
        torch.as_tensor(gt_hand), torch.as_tensor(pred_hand),
        torch.as_tensor(gt_obj), torch.as_tensor(pred_obj))
    ours = pm.get_align_metrics(jnp.asarray(gt_hand), jnp.asarray(pred_hand),
                                jnp.asarray(gt_obj), jnp.asarray(pred_obj))
    assert set(ours) == set(theirs)
    for k in theirs:
        np.testing.assert_allclose(ours[k], theirs[k], rtol=1e-4, atol=1e-6)


def test_add_occlusions_parity(ref):
    """Occlusion-aware ROI object masks match homan/lib2d/maskutils.py:16-38
    (-1 where the occluder covers, original mask drawn back)."""
    from homan_tpu.frontend import masks as our_masks

    rng = np.random.RandomState(3)
    R = our_masks.REND_SIZE
    img = 96
    # Two ROI object masks + square xywh boxes inside the image.
    masks = [np.zeros((R, R), bool) for _ in range(2)]
    masks[0][60:160, 40:120] = True
    masks[1][10:80, 100:220] = True
    boxes = [np.array([12.0, 20.0, 48.0, 48.0], np.float32),
             np.array([30.0, 8.0, 56.0, 56.0], np.float32)]
    occluder = np.zeros((2, img, img), np.float32)
    occluder[0, 25:60, 18:44] = 1.0
    occluder[1, 5:30, 40:80] = 1.0

    theirs = ref.maskutils.add_occlusions(
        [m.copy() for m in masks], torch.as_tensor(occluder),
        [b.copy() for b in boxes])
    ours = our_masks.add_occlusions(masks, occluder, boxes)
    for t, o in zip(theirs, ours):
        np.testing.assert_array_equal(np.asarray(t), o)
    assert any((np.asarray(t) == -1).any() for t in theirs), \
        "test scene produced no occluded pixels"


def test_add_target_hand_occlusions_parity(ref):
    """Hand target masks + ROI intrinsics match homan/lib2d/maskutils.py:
    41-81: square/expanded person boxes, object pixels marked -1, K_roi
    scaled to the normalized rendering space."""
    from homan_tpu.frontend import masks as our_masks

    rng = np.random.RandomState(4)
    img = 120
    B = 2
    person_masks = np.zeros((B, img, img), np.float32)
    person_masks[0, 30:90, 20:70] = 1.0
    person_masks[1, 40:110, 55:100] = 1.0
    tight = np.array([[20.0, 30.0, 70.0, 90.0],
                      [55.0, 40.0, 100.0, 110.0]], np.float32)
    full_mask = np.zeros((img, img), np.float32)
    full_mask[50:80, 45:95] = 1.0
    K = np.array([[150.0, 0.0, 60.0], [0.0, 150.0, 60.0], [0.0, 0.0, 1.0]],
                 np.float32)

    theirs = ref.maskutils.add_target_hand_occlusions(
        {"bboxes": torch.as_tensor(tight.copy()),
         "masks": torch.as_tensor(person_masks.copy())},
        {"full_mask": torch.as_tensor(full_mask.copy())},
        torch.as_tensor(K.copy()), square_expand=0.1, debug=False)
    ours = our_masks.add_target_hand_occlusions(
        {"bboxes": tight.copy(), "masks": person_masks.copy()},
        {"full_mask": full_mask.copy()}, K.copy(), square_expand=0.1,
        rend_size=256)

    np.testing.assert_allclose(np.asarray(theirs["square_bboxes"]),
                               ours["square_bboxes"], atol=1e-4)
    np.testing.assert_array_equal(np.asarray(theirs["target_masks"]),
                                  ours["target_masks"])
    assert (ours["target_masks"] == -1).any(), "no object-occluded pixels"
    np.testing.assert_allclose(np.asarray(theirs["K_roi"]), ours["K_roi"],
                               rtol=1e-5, atol=1e-6)
