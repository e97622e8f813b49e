"""Stage-B converged-search parity against the reference's ACTUAL search.

The last runnable rung of the parity ladder (BASELINE.json "bit-comparable
converged fits"): execute the reference's real `find_optimal_pose` /
`find_optimal_poses` (/root/reference/homan/pose_optimization.py:219-488 —
the 50-iteration batched Adam over pose candidates, the frame-to-frame
rotation chaining, and the best-mean-IoU motion selection) with our JAX
rasterizer bridged in as the (only) renderer backend, against
`fit/poseinit.py` with the exact reference schedule
(`prune_to=None, refine_scale=1.0, parallel_frames=False`), and assert the
same winning motion and matching converged candidates.

Only three reference dependencies are replaced, all by the SAME math both
sides see:
  * the CUDA NMR rasterizer -> a torch.autograd bridge over our
    `rasterize_soft` (forward jitted, backward via jax.vjp), so gradient
    signal is identical on both sides and the test isolates the search
    chain itself (candidate init, Adam trajectory, chaining, selection);
  * `compute_random_rotations` -> a fixed rotation set drawn from OUR
    `geo.random_rotations` (which reproduces the reference's Arvo'92
    construction) so both sides start from identical candidates;
  * libyana's `batch_mask_iou` (external, absent here) -> our
    parity-consistent implementation bridged to torch, so the selection
    metric is the same function on both sides.

A second test confirms the TPU-tuned schedule (successive halving +
half-resolution refinement) selects the same motion — or one of equal
IoU — as the exact reference schedule, on the same scene and on
adversarial meshes (thin box / cup analog / near-symmetric prism) where
early pruning is most likely to drop the true basin (round-4 verdict
weak #5).
"""
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_reference_parity import ref  # noqa: F401  (module-scoped fixture)
from test_jointopt_parity import _torch_bridge


# ---------------------------------------------------------------------------
# shared synthetic scene
# ---------------------------------------------------------------------------

def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


def _rot_x(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)


def _build_scene(T, R, image_size=240, mesh=None, seed=11):
    """Synthetic clip for stage B: a rotating, drifting object with
    {-1, 0, 1} crop-mask evidence rendered from the GT poses, plus the bbox /
    square_bbox the reference's evidence pipeline would supply."""
    import jax.numpy as jnp

    from homan_tpu.core import camera as cam
    from homan_tpu.core.meshes import bumpy_potato
    from homan_tpu.render import RasterSettings, rasterize_soft
    from homan_tpu.render.rasterizer import MeshTopology

    if mesh is None:
        v_obj, f_obj = bumpy_potato(2, 0.09, seed=5)
    else:
        v_obj, f_obj = mesh
    topo = MeshTopology.from_faces(f_obj)
    settings = RasterSettings(image_size=R, tile_px=16, faces_per_tile=192,
                              edges_per_tile=192)

    K = np.array([[300.0, 0, image_size / 2],
                  [0, 300.0, image_size / 2],
                  [0, 0, 1]], np.float32)
    Ks = np.tile(K[None], (T, 1, 1))

    annotations = []
    for t in range(T):
        R_gt = _rot_z(0.35 * t + 0.3) @ _rot_x(0.5 + 0.15 * t)
        t_gt = np.array([0.02 * t - 0.01, 0.015 * t, 0.62 + 0.02 * t],
                        np.float32)
        gt_verts = (v_obj @ R_gt.astype(np.float32)) + t_gt
        proj = gt_verts @ K.T
        uv = proj[:, :2] / proj[:, 2:]
        x1, y1 = uv.min(0)
        x2, y2 = uv.max(0)
        bbox = np.array([x1, y1, x2 - x1, y2 - y1], np.float32)  # xywh px
        # Square crop box around the object (evidence pipeline convention).
        side = 1.3 * max(x2 - x1, y2 - y1)
        cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
        square_bbox = np.array([cx - side / 2, cy - side / 2, side, side],
                               np.float32)
        # Target crop mask: GT render with the normalized crop intrinsics.
        K_roi = cam.get_K_crop_resize_np(
            K[None], np.array([[square_bbox[0], square_bbox[1],
                                square_bbox[0] + side,
                                square_bbox[1] + side]], np.float32), R)[0]
        K_roi[:2] /= R
        sil = np.asarray(rasterize_soft(
            jnp.asarray(gt_verts[None]), topo, jnp.asarray(K_roi[None]),
            settings)["sil"][0])
        mask = (sil > 0.5).astype(np.float32)
        mask[:3, :] = -1.0  # occlusion band exercises the keep mask
        assert mask.max() > 0, "GT object rendered off-crop"
        annotations.append({
            "target_crop_mask": mask,
            "bbox": bbox,
            "square_bbox": square_bbox,
            "full_mask": torch.zeros(8, 8),
        })
    return dict(T=T, R=R, image_size=image_size, K=K, Ks=Ks,
                v_obj=v_obj.astype(np.float32), f_obj=f_obj, topo=topo,
                settings=settings, annotations=annotations)


def _install_bridges(ref, monkeypatch, scene, rotations_np):
    """Bridge our rasterizer + IoU into the reference modules, and pin the
    candidate rotations to a shared set."""
    import sys

    import jax.numpy as jnp

    from homan_tpu.render import rasterize_soft

    topo, settings = scene["topo"], scene["settings"]

    def render(verts, K):
        Kb = jnp.broadcast_to(K, (verts.shape[0], 3, 3))
        return rasterize_soft(verts, topo, Kb, settings)["sil"]

    bridge = _torch_bridge(render, n_grad_args=1)
    renderer_cls = sys.modules["neural_renderer"].renderer.Renderer
    monkeypatch.setattr(renderer_cls, "default_render_fn",
                        staticmethod(bridge))

    def torch_iou(pred, tgt):
        p = pred > 0.5
        r = tgt > 0.5
        inter = (p & r).sum(dim=(-2, -1)).float()
        union = (p | r).sum(dim=(-2, -1)).float()
        return torch.where(union > 0, inter / union.clamp(min=1.0),
                           torch.zeros_like(inter))

    monkeypatch.setattr(ref.poseopt.ioumetrics, "batch_mask_iou", torch_iou)
    monkeypatch.setattr(
        ref.poseopt, "compute_random_rotations",
        lambda n, upright=False: torch.from_numpy(rotations_np[:n].copy()))


def _shared_rotations(C, seed=0):
    import jax

    from homan_tpu.core import geometry as geo
    return np.asarray(geo.random_rotations(jax.random.PRNGKey(seed), C),
                      np.float32)


# ---------------------------------------------------------------------------
# per-candidate refinement parity (single frame, every candidate compared)
# ---------------------------------------------------------------------------

def _run_ref_pose(ref, scene, rots, iters, tmp_path):
    annot = scene["annotations"][0]
    model = ref.poseopt.find_optimal_pose(
        vertices=torch.from_numpy(scene["v_obj"]),
        faces=torch.from_numpy(scene["f_obj"]).float(),
        mask=annot["target_crop_mask"],
        bbox=annot["bbox"],
        square_bbox=annot["square_bbox"],
        image_size=(scene["image_size"], scene["image_size"]),
        K=scene["K"],
        num_iterations=iters,
        num_initializations=rots.shape[0],
        debug=False,
        viz=False,
        sort_best=False,
        viz_folder=str(tmp_path),
        rotations_init=torch.from_numpy(rots.copy()),
    )
    loss_dict, iou, _ = model()
    return (ref.geometry.rot6d_to_matrix(model.rotations).detach().numpy(),
            model.translations.detach().numpy(),
            sum(loss_dict.values()).detach().numpy(), iou.numpy())


def _run_our_pose(scene, rots, iters):
    import jax.numpy as jnp

    from homan_tpu.core import camera as cam
    from homan_tpu.core import geometry as geo
    from homan_tpu.fit import poseinit

    R = scene["R"]
    annot = scene["annotations"][0]
    # Same evidence derivation as find_optimal_poses' frame loop.
    mask = annot["target_crop_mask"]
    ref_mask = jnp.asarray((mask > 0).astype(np.float32))
    keep_mask = jnp.asarray((mask >= 0).astype(np.float32))
    x, y, b = (float(v) for v in annot["square_bbox"][:3])
    K_roi = cam.get_K_crop_resize_np(
        scene["K"][None], np.array([[x, y, x + b, y + b]], np.float32), R)[0]
    K_roi[:2] /= R
    rot6d, trans = poseinit._chain_init(
        jnp.asarray(scene["v_obj"]), jnp.asarray(rots),
        np.asarray(annot["bbox"], np.float32), jnp.asarray(scene["K"]))
    params, losses, ious, _ = poseinit._fit_candidates(
        jnp.asarray(scene["v_obj"]), scene["topo"], ref_mask, keep_mask,
        jnp.zeros_like(ref_mask), jnp.asarray(K_roi), rot6d, trans,
        scene["settings"], num_iterations=iters,
        candidate_chunk=rots.shape[0])
    return (np.asarray(geo.rot6d_to_matrix(params["rot6d"])),
            np.asarray(params["trans"]), np.asarray(losses),
            np.asarray(ious))


def test_find_optimal_pose_candidate_parity(ref, tmp_path, monkeypatch):
    """The reference's real batched Adam refinement
    (pose_optimization.py:219-377) vs our `_fit_candidates` on identical
    inits, two rungs:

      * after ONE Adam step, EVERY candidate's parameters must match
        tightly — any drift in the loss formulas (keep-mask silhouette L2,
        offscreen barrier), the gradients, or the Adam update shows here
        at 1e-4 before float chaos can amplify;
      * after 20 steps, every candidate's loss/IoU must still agree, and
        the well-converged (selection-relevant, IoU > 0.85) candidates'
        parameters must match — out-of-basin stragglers are allowed
        float-chaos divergence (measured up to 4e-2 after 20 steps from
        bit-level arithmetic-order differences, torch vs XLA).
    """
    C, R, iters = 12, 64, 20
    scene = _build_scene(T=1, R=R)
    rots = _shared_rotations(C, seed=3)
    _install_bridges(ref, monkeypatch, scene, rots)

    # Rung 1: single-step parity, all candidates, tight.
    ref_R1, ref_t1, _, _ = _run_ref_pose(ref, scene, rots, 1, tmp_path)
    our_R1, our_t1, _, _ = _run_our_pose(scene, rots, 1)
    np.testing.assert_allclose(our_R1, ref_R1, atol=1e-4,
                               err_msg="1-step candidate rotations")
    np.testing.assert_allclose(our_t1, ref_t1, atol=1e-4,
                               err_msg="1-step candidate translations")

    # Rung 2: converged parity.
    ref_R, ref_t, ref_losses, ref_iou = _run_ref_pose(ref, scene, rots,
                                                      iters, tmp_path)
    our_R, our_t, losses, ious = _run_our_pose(scene, rots, iters)
    # Stragglers' trajectories are chaotic; they must still land in the same
    # loss range (a formula drift would move them far more than 25%).
    np.testing.assert_allclose(losses, ref_losses, rtol=2.5e-1, atol=5e-2,
                               err_msg="converged candidate losses (coarse)")
    np.testing.assert_allclose(ious, ref_iou, atol=3e-2,
                               err_msg="converged candidate IoUs")
    # In-basin = decisively converged on BOTH sides (basin-edge candidates
    # like ref 0.914 / ours 0.899 are still chaotic after 20 steps).
    good = (ref_iou > 0.9) & (ious > 0.9)
    assert good.sum() >= 3, "scene too hard: no selection-relevant candidates"
    np.testing.assert_allclose(losses[good], ref_losses[good], rtol=2e-2,
                               err_msg="converged in-basin losses")
    np.testing.assert_allclose(our_R[good], ref_R[good], atol=5e-3,
                               err_msg="converged in-basin rotations")
    np.testing.assert_allclose(our_t[good], ref_t[good], atol=5e-3,
                               err_msg="converged in-basin translations")
    # Non-vacuous: refinement actually improved at least one candidate into
    # real mask overlap.
    assert float(ious.max()) > 0.5


# ---------------------------------------------------------------------------
# full search parity: chaining + best-mean-IoU selection
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_find_optimal_poses_converged_search_parity(ref, tmp_path,
                                                    monkeypatch):
    """The reference's real `find_optimal_poses` (rotation chaining across
    frames + best-mean-IoU motion selection, pose_optimization.py:386-488)
    vs ours with the exact schedule: the SAME winning motion."""
    from homan_tpu.fit import poseinit

    C, R, T, iters = 12, 64, 3, 20
    scene = _build_scene(T=T, R=R)
    rots = _shared_rotations(C, seed=7)
    _install_bridges(ref, monkeypatch, scene, rots)

    ref_params = ref.poseopt.find_optimal_poses(
        image_size=(scene["image_size"], scene["image_size"], 3),
        faces=scene["f_obj"].astype(np.float32),
        vertices=scene["v_obj"],
        annotations=scene["annotations"],
        images=[None] * T,
        Ks=list(scene["Ks"]),
        num_iterations=iters,
        num_initializations=C,
        viz_path=str(tmp_path / "pose.png"),
        debug=False,
    )

    # Ours, exact reference schedule; seed must regenerate the same
    # rotation set (geo.random_rotations(PRNGKey(7), C) == rots).
    our_params = poseinit.find_optimal_poses(
        scene["v_obj"], scene["f_obj"], scene["annotations"],
        list(scene["Ks"]), (scene["image_size"], scene["image_size"], 3),
        num_initializations=C, num_iterations=iters, rend_size=R,
        settings=scene["settings"], seed=7, prune_to=None,
        refine_scale=1.0, parallel_frames=False, candidate_chunk=C)

    assert len(ref_params) == len(our_params) == T
    # Tolerances: a DIFFERENT winning candidate differs by O(1) in rotation
    # entries (random SO(3) starts); the measured torch-vs-XLA float chaos
    # through 3 chained 20-iter refinements peaks at 7.4e-3 on the last
    # frame (every candidate's frame-t init carries frame-(t-1) drift).
    # 2e-2 separates the two regimes by ~2 orders of magnitude.
    for t in range(T):
        theirs_R = ref_params[t]["rotations"].detach().numpy()
        theirs_t = ref_params[t]["translations"].detach().numpy()
        np.testing.assert_allclose(
            np.asarray(our_params[t]["rotations"]), theirs_R, atol=2e-2,
            err_msg=f"frame {t} selected rotation")
        np.testing.assert_allclose(
            np.asarray(our_params[t]["translations"]), theirs_t, atol=1e-2,
            err_msg=f"frame {t} selected translation")
        np.testing.assert_allclose(
            np.asarray(our_params[t]["verts_trans"]),
            ref_params[t]["verts_trans"].detach().numpy(), atol=2.5e-2,
            err_msg=f"frame {t} selected verts_trans")
    # Non-vacuous: the winning motion overlaps the evidence decisively.
    assert our_params[0]["best_iou"] > 0.6


# ---------------------------------------------------------------------------
# TPU-tuned schedule: same (or equal-IoU) selection as the exact schedule
# ---------------------------------------------------------------------------

def _adversarial_meshes():
    """Shapes where early candidate pruning is most likely to drop the true
    basin: thin box (flat silhouettes from many views), cup-with-handle
    analog (concavity + handle breaks symmetry weakly), near-symmetric
    prism (rotational ambiguity)."""
    from homan_tpu.core.meshes import box_mesh, cylinder_mesh, merge_meshes

    thin_box = box_mesh(half_extents=(0.09, 0.055, 0.012))

    body_v, body_f = cylinder_mesh(radius=0.045, height=0.11, n_seg=14)
    handle_v, handle_f = box_mesh(half_extents=(0.028, 0.008, 0.032))
    handle_v = handle_v + np.array([0.066, 0.0, 0.0], np.float32)
    cup = merge_meshes([(body_v, body_f), (handle_v, handle_f)])

    prism_v, prism_f = cylinder_mesh(radius=0.055, height=0.13, n_seg=6)
    # Slight taper so the prism is only NEAR-symmetric (a pure symmetry
    # would make every selection IoU-equal by construction).
    prism_v = prism_v.copy()
    prism_v[:, :2] *= (1.0 + 0.15 * (prism_v[:, 2:3] > 0))
    return {"thin_box": thin_box, "cup_analog": cup,
            "prism": (prism_v, prism_f)}


@pytest.mark.slow
@pytest.mark.parametrize("mesh_name", ["potato", "thin_box", "cup_analog",
                                       "prism"])
def test_halving_schedule_selection_quality(mesh_name):
    """The TPU-tuned schedule (successive halving + half-res refinement)
    must select the same motion as the exact reference schedule, or one of
    equal-or-better full-res IoU, including on adversarial shapes."""
    from homan_tpu.fit import poseinit

    if mesh_name == "potato":
        mesh = None
    else:
        mesh = _adversarial_meshes()[mesh_name]
    C, R, T, iters = 64, 128, 2, 25
    scene = _build_scene(T=T, R=R, mesh=mesh, seed=13)

    kwargs = dict(
        num_initializations=C, num_iterations=iters, rend_size=R,
        settings=scene["settings"], seed=13, parallel_frames=False)
    exact = poseinit.find_optimal_poses(
        scene["v_obj"], scene["f_obj"], scene["annotations"],
        list(scene["Ks"]), (scene["image_size"],) * 2,
        prune_to=None, refine_scale=1.0, **kwargs)
    tuned = poseinit.find_optimal_poses(
        scene["v_obj"], scene["f_obj"], scene["annotations"],
        list(scene["Ks"]), (scene["image_size"],) * 2,
        prune_to=16, refine_scale=0.5, coarse_iterations=15, **kwargs)

    exact_iou = exact[0]["best_iou"]
    tuned_iou = tuned[0]["best_iou"]
    same_motion = np.allclose(np.asarray(exact[0]["rotations"]),
                              np.asarray(tuned[0]["rotations"]), atol=5e-2)
    assert same_motion or tuned_iou >= exact_iou - 0.02, (
        f"{mesh_name}: halving selected a worse motion "
        f"(tuned {tuned_iou:.4f} vs exact {exact_iou:.4f})")
    # Both schedules must actually find the object.
    assert exact_iou > 0.5 and tuned_iou > 0.5, (
        f"{mesh_name}: search failed (exact {exact_iou:.3f}, "
        f"tuned {tuned_iou:.3f})")
