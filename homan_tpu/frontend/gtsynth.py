"""Synthetic ground-truth evidence: a full fitting problem with no detectors.

The equivalent of the reference's `--gt_masks` ablation path
(homan/prepare/gtmasks.py:14-123 + fit_vid_dataset.py:267-279), which renders
known meshes to synthesize every piece of 2D evidence the pipeline consumes.
Used for end-to-end tests and benchmarks without pretrained networks or
license-gated MANO data.
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from homan_tpu.core import camera as cam
from homan_tpu.core import geometry as geo
from homan_tpu.core.mano import ManoLayer
from homan_tpu.core.meshes import bumpy_potato
from homan_tpu.fit import model as M
from homan_tpu.render import RasterSettings, rasterize_soft
from homan_tpu.render.rasterizer import MeshTopology


@dataclasses.dataclass
class SyntheticScene:
    consts: M.HomanConsts
    cfg: M.HomanConfig
    gt_state: M.HomanState
    init_state: M.HomanState
    gt_verts_object: jnp.ndarray  # (B, Vo, 3)
    gt_verts_hand: jnp.ndarray    # (B*H, 778, 3)
    closed_hand_faces: jnp.ndarray
    roi_settings: RasterSettings


def _smooth_trajectory(rng, frame_nb, scale):
    """Per-frame small offsets that vary smoothly over time."""
    t = np.linspace(0, 1, frame_nb)[:, None]
    freq = rng.uniform(0.5, 1.5, (1, 3))
    phase = rng.uniform(0, 2 * np.pi, (1, 3))
    return scale * np.sin(2 * np.pi * freq * t + phase)


def make_synthetic_scene(
    seed: int = 0,
    frame_nb: int = 5,
    hand_sides=("right",),
    image_size: int = 128,
    rend_size: int = 64,
    obj_subdiv: int = 2,
    obj_radius: float = 0.08,
    perturb: float = 0.04,
    mano_layer: ManoLayer | None = None,
    obj_mesh=None,
    with_full_masks: bool = False,
) -> SyntheticScene:
    """Build a synthetic clip: object + hand(s) moving smoothly in front of a
    camera, evidence rendered from the GT, and an initial state perturbed away
    from the GT for the optimizer to recover."""
    rng = np.random.RandomState(seed)
    cfg = M.HomanConfig(hand_sides=tuple(hand_sides), image_size=image_size,
                        rend_size=rend_size)
    H = cfg.hand_nb
    B = frame_nb

    layer = mano_layer if mano_layer is not None else ManoLayer.synthetic(seed)
    if obj_mesh is None:
        overts, ofaces = bumpy_potato(obj_subdiv, obj_radius, seed=seed)
    else:
        overts, ofaces = obj_mesh
    overts = jnp.asarray(overts)
    obj_topo = MeshTopology.from_faces(ofaces)
    ofaces = obj_topo.faces

    # --- Ground-truth trajectories ---------------------------------------
    base_depth = 0.6
    obj_trans = np.tile([0.0, 0.0, base_depth], (B, 1)) + _smooth_trajectory(
        rng, B, 0.03)
    obj_rot0 = np.asarray(geo.random_rotations(jax.random.PRNGKey(seed), 1))[0]
    obj_rots = []
    for t in range(B):
        delta = geo.rodrigues(jnp.asarray(0.1 * t * np.array([0.0, 1.0, 0.0]),
                                          jnp.float32))
        obj_rots.append(np.asarray(delta) @ obj_rot0)
    obj_rots = np.stack(obj_rots)

    hand_trans = np.zeros((B * H, 1, 3), np.float32)
    hand_rots = np.zeros((B * H, 3, 3), np.float32)
    mano_pca = np.zeros((B * H, cfg.pca_comps), np.float32)
    mano_rot = np.zeros((B * H, 3), np.float32)
    mano_trans = np.zeros((B * H, 3), np.float32)
    for h in range(H):
        side_off = 0.18 if h == 0 else -0.18
        traj = _smooth_trajectory(rng, B, 0.02)
        for t in range(B):
            i = t * H + h
            hand_trans[i, 0] = [side_off * 0.5, 0.0, base_depth] + traj[t]
            hand_rots[i] = np.eye(3)
            mano_pca[i] = 0.25 * rng.randn(cfg.pca_comps) * 0 + \
                0.25 * np.sin(np.arange(cfg.pca_comps) + t * 0.3)
            mano_trans[i] = [side_off * 0.2, 0.0, 0.0]

    gt_state = M.init_state(
        cfg,
        translations_object=obj_trans[:, None, :],
        rotations_object=obj_rots,
        translations_hand=hand_trans,
        rotations_hand=hand_rots,
        mano_pca_pose=mano_pca,
        mano_rot=mano_rot,
        mano_trans=mano_trans,
        mano_betas=np.zeros((B * H, 10), np.float32),
    )

    # --- Camera ------------------------------------------------------------
    K_px = np.array([[image_size * 0.9, 0, image_size / 2],
                     [0, image_size * 0.9, image_size / 2],
                     [0, 0, 1]], np.float32)
    camintr = jnp.tile(jnp.asarray(cam.normalize_K(jnp.asarray(K_px),
                                                   image_size))[None],
                       (B, 1, 1))
    # Evidence rendered over the full image re-scaled to rend_size (identity
    # ROI): normalized intrinsics are resolution-free, so ROI K == full K.
    rois_object = camintr
    rois_hand = jnp.repeat(camintr, H, axis=0)

    mano_params_by_side = {s: layer.params[s] for s in cfg.hand_sides}
    hand_topo = MeshTopology.from_faces(layer.faces("right"))
    faces_hand = hand_topo.faces

    consts_partial = M.HomanConsts(
        verts_object_og=overts,
        faces_object=obj_topo,
        verts_hand_og=jnp.zeros((B * H, 778, 3)),
        faces_hand=hand_topo,
        ref_verts2d_hand=jnp.zeros((B * H, 778, 2)),
        ref_mask_object=jnp.zeros((B, rend_size, rend_size)),
        keep_mask_object=jnp.ones((B, rend_size, rend_size)),
        ref_mask_hand=jnp.zeros((B * H, rend_size, rend_size)),
        keep_mask_hand=jnp.ones((B * H, rend_size, rend_size)),
        camintr_rois_object=rois_object,
        camintr_rois_hand=rois_hand,
        camintr=camintr,
        mano_params_by_side=mano_params_by_side,
        masks_object=jnp.zeros((B, image_size, image_size)),
        masks_hand=jnp.zeros((B * H, image_size, image_size)),
    )

    # --- Render GT evidence -------------------------------------------------
    roi_settings = RasterSettings(image_size=rend_size, tile_px=16,
                                  faces_per_tile=min(
                                      512, int(ofaces.shape[0]) + 64))
    gt_verts_object, _ = M.get_verts_object_jit(gt_state, consts_partial)
    gt_verts_hand, _ = M.get_verts_hand_jit(gt_state, consts_partial, cfg,
                                            False)

    obj_sil = rasterize_soft(gt_verts_object, obj_topo, rois_object,
                             roi_settings)["sil"] > 0.5
    hand_settings = RasterSettings(image_size=rend_size, tile_px=16,
                                   faces_per_tile=min(
                                       1024, int(faces_hand.shape[0]) + 64))
    hand_sil = rasterize_soft(gt_verts_hand, hand_topo, rois_hand,
                              hand_settings)["sil"] > 0.5
    # Occlusion-aware targets: -1 where the other entity covers the pixel.
    hand_sil_per_frame = hand_sil.reshape(B, H, rend_size, rend_size).any(1)
    obj_target = jnp.where(hand_sil_per_frame & ~obj_sil, -1.0,
                           obj_sil.astype(jnp.float32))
    obj_occl = jnp.repeat(obj_sil, H, axis=0)
    hand_target = jnp.where(obj_occl & ~hand_sil, -1.0,
                            hand_sil.astype(jnp.float32))

    ref_verts2d = cam.batch_proj2d(gt_verts_hand, rois_hand) * image_size

    # Full-image entity masks feed only the ordinal-depth loss (reference
    # semantics: homan.py's `masks` buffers are image-sized, unlike the
    # rend_size ROI targets above). Rendered on demand to keep the common
    # path cheap.
    if with_full_masks:
        full_obj = RasterSettings(image_size=image_size, tile_px=16,
                                  faces_per_tile=min(
                                      512, int(ofaces.shape[0]) + 64))
        full_hand = RasterSettings(image_size=image_size, tile_px=16,
                                   faces_per_tile=min(
                                       1024, int(faces_hand.shape[0]) + 64))
        masks_object = rasterize_soft(gt_verts_object, obj_topo, camintr,
                                      full_obj)["sil"] > 0.5
        masks_hand = rasterize_soft(gt_verts_hand, hand_topo, rois_hand,
                                    full_hand)["sil"] > 0.5
        masks_object = masks_object.astype(jnp.float32)
        masks_hand = masks_hand.astype(jnp.float32)
    else:
        masks_object = consts_partial.masks_object
        masks_hand = consts_partial.masks_hand

    consts = dataclasses.replace(
        consts_partial,
        verts_hand_og=gt_verts_hand,
        ref_verts2d_hand=ref_verts2d,
        ref_mask_object=(obj_target > 0).astype(jnp.float32),
        keep_mask_object=(obj_target >= 0).astype(jnp.float32),
        ref_mask_hand=(hand_target > 0).astype(jnp.float32),
        keep_mask_hand=(hand_target >= 0).astype(jnp.float32),
        masks_object=masks_object,
        masks_hand=masks_hand,
    )

    # --- Perturbed init ------------------------------------------------------
    def jitter(x, s):
        return x + jnp.asarray(rng.randn(*x.shape).astype(np.float32)) * s

    init_state = M.HomanState(
        translations_object=jitter(gt_state.translations_object, perturb),
        rotations_object=jitter(gt_state.rotations_object, perturb),
        translations_hand=jitter(gt_state.translations_hand, perturb),
        rotations_hand=jitter(gt_state.rotations_hand, perturb),
        mano_pca_pose=jitter(gt_state.mano_pca_pose, perturb * 5),
        mano_rot=gt_state.mano_rot,
        mano_trans=gt_state.mano_trans,
        mano_betas=gt_state.mano_betas,
        int_scales_object=gt_state.int_scales_object,
        int_scales_hand=gt_state.int_scales_hand,
        cams_hand=gt_state.cams_hand,
    )

    # Closed-fist topology stand-in: the synthetic faces already form the
    # "closed" hand for SDF purposes.
    return SyntheticScene(
        consts=consts, cfg=cfg, gt_state=gt_state, init_state=init_state,
        gt_verts_object=gt_verts_object, gt_verts_hand=gt_verts_hand,
        closed_hand_faces=faces_hand, roi_settings=roi_settings)
