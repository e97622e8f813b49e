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

    class _BoxMode:
        """detectron2 BoxMode with its two absolute modes; `convert`
        implements the documented standard formulas (XYXY<->XYWH) so the
        reference's bbox/camera helpers are runnable."""
        XYXY_ABS, XYWH_ABS = 0, 1

        @staticmethod
        def convert(box, from_mode, to_mode):
            box = np.asarray(box, np.float64).copy()
            if from_mode == to_mode:
                return box
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

    # CPU no-ops for the reference's unconditional .cuda() calls
    torch.Tensor.cuda = lambda self, *a, **k: self
    if not hasattr(torch.cuda, "FloatTensor"):
        torch.cuda.FloatTensor = torch.FloatTensor
    if not hasattr(torch.cuda, "LongTensor"):
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
    finally:
        os.chdir(old_cwd)
    return types.SimpleNamespace(
        geometry=ref_geometry, camera=ref_camera, optitrans=ref_optitrans,
        chunkvids=ref_chunkvids, contactloss=ref_contactloss,
        lossutils=ref_lossutils)


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
