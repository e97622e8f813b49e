"""Triangle-intersection collision (the BVH-branch equivalent)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from homan_tpu.core.meshes import icosphere
from homan_tpu.interactions.intersect import (compute_collision_loss_tritri,
                                              pair_penetration_loss,
                                              tri_tri_intersect)


def test_tri_tri_intersect_basic():
    # Two triangles crossing through each other
    a = jnp.asarray([[[0.0, 0, 0], [1, 0, 0], [0, 1, 0]]])
    b_cross = jnp.asarray([[[0.2, 0.2, -0.5], [0.2, 0.2, 0.5],
                            [0.8, 0.8, 0.1]]])
    b_above = jnp.asarray([[[0.2, 0.2, 0.5], [0.2, 0.2, 1.5],
                            [0.8, 0.8, 1.1]]])  # entirely above the plane
    b_far = jnp.asarray([[[5.0, 5, -0.5], [5, 5, 0.5], [6, 6, 0.1]]])
    assert bool(tri_tri_intersect(a, b_cross)[0, 0])
    assert not bool(tri_tri_intersect(a, b_above)[0, 0])
    # straddles the plane but the intervals on the intersection line miss
    assert not bool(tri_tri_intersect(a, b_far)[0, 0])


def test_penetration_loss_spheres():
    v, f = icosphere(2, 0.1)
    tri = jnp.asarray(v)[jnp.asarray(f)]

    def tris_at(offset):
        return tri + jnp.asarray(offset)

    loss_overlap = pair_penetration_loss(tris_at([0, 0, 0]),
                                         tris_at([0.12, 0, 0]))
    loss_apart = pair_penetration_loss(tris_at([0, 0, 0]),
                                       tris_at([0.5, 0, 0]))
    assert float(loss_overlap) > 0
    assert float(loss_apart) == 0.0

    # Gradient should push the spheres apart (d loss / d +x offset < 0
    # when the second sphere sits at +x).
    def loss_of(dx):
        return pair_penetration_loss(tris_at([0, 0, 0]),
                                     tris_at([0.0, 0, 0])
                                     + jnp.asarray([dx, 0.0, 0.0]) * 1.0)

    g = jax.grad(lambda dx: loss_of(dx))(0.12)
    assert float(g) < 0, g
    # deeper overlap -> larger penalty
    assert float(loss_of(0.08)) > float(loss_of(0.16))


def test_collision_tritri_in_joint_losses():
    """cfg.collision_mode='tritri' produces a finite, optimizable
    loss_collision through compute_all_losses and the joint fit."""
    from homan_tpu.fit import joint
    from homan_tpu.fit import losses as L
    from homan_tpu.frontend.gtsynth import make_synthetic_scene

    scene = make_synthetic_scene(seed=0, frame_nb=2, image_size=64,
                                 rend_size=32)
    cfg = dataclasses.replace(scene.cfg, collision_mode="tritri")
    lw = dict(L.DEFAULT_LW)
    lw.update(lw_collision=1e-3, lw_contact=1.0, lw_sil_obj=0.0)
    loss_dict, _ = L.compute_all_losses(
        scene.init_state, scene.consts, cfg, lw,
        closed_hand_faces=scene.closed_hand_faces,
        roi_settings=scene.roi_settings)
    assert "loss_collision" in loss_dict and "loss_contact" in loss_dict
    assert np.isfinite(float(loss_dict["loss_collision"]))

    final, hist = joint.optimize_hand_object(
        scene.init_state, scene.consts, cfg, loss_weights=lw,
        num_iterations=3, closed_hand_faces=scene.closed_hand_faces,
        roi_settings=scene.roi_settings)
    assert np.isfinite(np.asarray(hist["loss"])).all()


def test_tritri_collision_gradient_never_pushes_object():
    """Collision gradients must only move the hand: the reference passes
    verts_object.detach() into the collision term (homan/homan.py:445-447),
    so with ONLY lw_collision active the object parameters' gradient is
    exactly zero in tritri mode (the sdf branch already stop-gradients via
    obj_det)."""
    import jax

    from homan_tpu.fit import losses as L
    from homan_tpu.frontend.gtsynth import make_synthetic_scene

    scene = make_synthetic_scene(seed=0, frame_nb=2, image_size=64,
                                 rend_size=32)
    lw = {k: 0.0 for k in L.DEFAULT_LW}
    lw["lw_collision"] = 1.0

    def collision_only(state, mode):
        cfg = dataclasses.replace(scene.cfg, collision_mode=mode)
        loss_dict, _ = L.compute_all_losses(
            state, scene.consts, cfg, lw,
            closed_hand_faces=scene.closed_hand_faces,
            roi_settings=scene.roi_settings)
        return L.weighted_sum(loss_dict, lw)

    for mode in ("tritri", "sdf"):
        grads = jax.grad(lambda s: collision_only(s, mode))(scene.init_state)
        assert float(np.abs(np.asarray(
            grads.translations_object)).max()) == 0.0, mode
        assert float(np.abs(np.asarray(
            grads.rotations_object)).max()) == 0.0, mode
        assert float(np.abs(np.asarray(
            grads.int_scales_object)).max()) == 0.0, mode
        # ... while the hand translation DOES receive gradient signal
        # whenever there is any penetration; at minimum the field exists
        # and is finite.
        assert np.isfinite(np.asarray(grads.translations_hand)).all(), mode
