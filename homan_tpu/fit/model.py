"""The joint hand+object scene model as parameter pytrees + pure functions.

TPU-native re-design of the reference's stateful `HOMan(nn.Module)`
(homan/homan.py:26-237): all optimizable quantities live in `HomanState`
(a pytree the optimizer updates functionally), all fixed evidence in
`HomanConsts`. The getters reproduce the reference's forward kinematics and
detach topology:

  * get_verts_object: scale.abs -> rot6d -> translate (homan/homan.py:298-307)
  * get_verts_hand: MANO PCA forward per hand side on the interleaved
    [h1_t1, h2_t1, h1_t2, ...] batch layout (homan/homan.py:61-64,341-382),
    plus the (verts, verts_det) split where verts_det carries no articulation
    gradient so interaction terms only steer the rigid transform
    (homan/utils/camera.py:134-139)
  * get_joints_hand: fingertip augmentation + 21-joint reorder
    (homan/homan.py:309-339)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from homan_tpu.core import camera as cam
from homan_tpu.core import geometry as geo
from homan_tpu.core import mano as mano_lib


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HomanState:
    """Optimizable parameters. Batch B = frame_nb; hands use B*hand_nb rows
    in the interleaved layout."""
    translations_object: jnp.ndarray  # (B, 1, 3)
    rotations_object: jnp.ndarray     # (B, 3, 2) rot6d
    translations_hand: jnp.ndarray    # (B*H, 1, 3)
    rotations_hand: jnp.ndarray       # (B*H, 3, 2) rot6d
    mano_pca_pose: jnp.ndarray        # (B*H, P)
    mano_rot: jnp.ndarray             # (B*H, 3)   frozen in the reference optim
    mano_trans: jnp.ndarray           # (B*H, 3)   frozen in the reference optim
    mano_betas: jnp.ndarray           # (B*H, 10)
    int_scales_object: jnp.ndarray    # (1,)
    int_scales_hand: jnp.ndarray      # (1,)
    # Weak-perspective cameras for hand_proj_mode="ortho" (homan/homan.py:91
    # -94); unused (zeros) in the default "persp" mode.
    cams_hand: jnp.ndarray = None     # (B*H, 3)


@dataclasses.dataclass(frozen=True)
class HomanConfig:
    """Static model configuration (trace-time constants)."""
    hand_sides: Tuple[str, ...] = ("right",)
    image_size: int = 640
    rend_size: int = 256
    optimize_mano: bool = True
    optimize_mano_beta: bool = True
    optimize_object_scale: bool = False
    optimize_ortho_cam: bool = True
    hand_proj_mode: str = "persp"  # or "ortho" (homan/homan.py:364-382)
    inter_type: str = "centroid"  # or "min"
    pca_comps: int = 16
    # "direct" = exact interior SDF evaluated only at the sampled mesh
    # vertices (default: ~3x faster config-3 steps at identical converged
    # IoU, exact gradients); "grid" = strict reference semantics
    # (voxelize 32^3 + trilinear, scenesdf.py). The default contact loss is
    # mode-invariant (its reference-quirk exterior mask never reads the
    # values), so the modes differ only in the collision term's smoothing.
    sdf_mode: str = "direct"
    # Collision term backend: "sdf" (the reference default branch,
    # homan/lossutils.py:49-64) or "tritri" — the TPU-native equivalent of
    # the reference's optional BVH mesh_intersection branch
    # (lossutils.py:66-104): exact triangle-triangle intersection pairs
    # penalized by point-to-plane penetration (interactions/intersect.py).
    collision_mode: str = "sdf"

    @property
    def hand_nb(self) -> int:
        return len(self.hand_sides)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HomanConsts:
    """Fixed evidence and model data (device-resident, not optimized)."""
    verts_object_og: jnp.ndarray      # (Vo, 3) canonical object
    faces_object: Any                 # MeshTopology (faces + contour edges)
    verts_hand_og: jnp.ndarray        # (B*H, 778, 3) regressed MANO verts
    faces_hand: Any                   # MeshTopology, right-hand winding
    ref_verts2d_hand: jnp.ndarray     # (B*H, 778, 2) pixel coords
    ref_mask_object: jnp.ndarray      # (B, R, R) in {0,1}
    keep_mask_object: jnp.ndarray     # (B, R, R)
    ref_mask_hand: jnp.ndarray        # (B*H, R, R)
    keep_mask_hand: jnp.ndarray       # (B*H, R, R)
    camintr_rois_object: jnp.ndarray  # (B, 3, 3) normalized ROI intrinsics
    camintr_rois_hand: jnp.ndarray    # (B*H, 3, 3)
    camintr: jnp.ndarray              # (B, 3, 3) normalized full-image K
    mano_params_by_side: Dict[str, Any]  # side -> MANO param pytree
    masks_object: jnp.ndarray         # (B, S, S) full-image masks (depth loss)
    masks_hand: jnp.ndarray           # (B*H, S, S)


def init_state(cfg: HomanConfig,
               translations_object, rotations_object,
               translations_hand, rotations_hand,
               mano_pca_pose, mano_rot, mano_trans, mano_betas,
               cams_hand=None,
               int_scale_init: float = 1.0) -> HomanState:
    """Build the state pytree, converting 3x3 rotations to rot6d and zeroing
    betas like the reference constructor (homan/homan.py:66-131)."""
    rot_o = jnp.asarray(rotations_object, jnp.float32)
    if rot_o.shape[-1] == 3:
        rot_o = geo.matrix_to_rot6d(rot_o)
    rot_h = jnp.asarray(rotations_hand, jnp.float32)
    if rot_h.shape[-1] == 3:
        rot_h = geo.matrix_to_rot6d(rot_h)
    return HomanState(
        translations_object=jnp.asarray(translations_object, jnp.float32),
        rotations_object=rot_o,
        translations_hand=jnp.asarray(translations_hand, jnp.float32),
        rotations_hand=rot_h,
        mano_pca_pose=jnp.asarray(mano_pca_pose, jnp.float32),
        mano_rot=jnp.asarray(mano_rot, jnp.float32),
        mano_trans=jnp.asarray(mano_trans, jnp.float32),
        mano_betas=jnp.zeros_like(jnp.asarray(mano_betas, jnp.float32)),
        int_scales_object=jnp.ones((1,), jnp.float32) * int_scale_init,
        int_scales_hand=jnp.ones((1,), jnp.float32) * int_scale_init,
        cams_hand=(jnp.asarray(cams_hand, jnp.float32) if cams_hand is not None
                   else jnp.zeros((rot_h.shape[0], 3), jnp.float32)),
    )


def get_verts_object_parts(rot6d, trans, scale, verts_og):
    """get_verts_object from its four leaves — lets host-side diagnostics
    fetch only these arrays instead of device_get-ing whole pytrees (the
    consts pytree carries every evidence mask: tens of MB per clip)."""
    R = geo.rot6d_to_matrix(rot6d)
    return cam.compute_transformation_persp(verts_og, trans, R,
                                            jnp.abs(scale))


def get_verts_object(state: HomanState, consts: HomanConsts):
    """(B, Vo, 3) posed object vertices (+ mesh-detached twin)."""
    return get_verts_object_parts(state.rotations_object,
                                  state.translations_object,
                                  state.int_scales_object,
                                  consts.verts_object_og)


def _mano_verts_all_sides(state: HomanState, consts: HomanConsts,
                          cfg: HomanConfig, want_joints: bool = False):
    """Run MANO per hand side on the strided slices and re-interleave.

    Returns verts (B*H, 778, 3) [+ joints (B*H, 16, 3)] in MANO-local frame
    shifted by mano_trans — the reference's `verts_hand_og` when
    optimize_mano=True (homan/homan.py:341-356).
    """
    h = cfg.hand_nb
    per_side_verts: List[jnp.ndarray] = []
    per_side_joints: List[jnp.ndarray] = []
    for idx, side in enumerate(cfg.hand_sides):
        p = consts.mano_params_by_side[side]
        pca = state.mano_pca_pose[idx::h][..., : cfg.pca_comps]
        rot = state.mano_rot[idx::h]
        betas = state.mano_betas[idx::h]
        aa = mano_lib.pca_to_axis_angle(p, pca, is_left=(side == "left"))
        out = jax.vmap(lambda r, a, b: mano_lib.mano_forward(p, b, r, a))(
            rot, aa, betas)
        per_side_verts.append(out["verts"])
        per_side_joints.append(out["joints"])
    # Interleave back to [h1_t1, h2_t1, h1_t2, ...]
    verts = jnp.stack(per_side_verts, axis=1).reshape(-1, 778, 3)
    verts = verts + state.mano_trans[:, None, :]
    if not want_joints:
        return verts, None
    joints = jnp.stack(per_side_joints, axis=1).reshape(
        -1, per_side_joints[0].shape[1], 3)
    return verts, joints


def get_verts_hand(state: HomanState, consts: HomanConsts, cfg: HomanConfig,
                   detach_scale: bool = False):
    """(B*H, 778, 3) posed hand vertices (+ articulation-detached twin).

    hand_proj_mode="ortho" places the hand through a weak-perspective camera
    converted to a perspective translation (homan/homan.py:364-371), used
    when FrankMocap's camera is trusted over an explicit translation.
    """
    if cfg.optimize_mano:
        verts_og, _ = _mano_verts_all_sides(state, consts, cfg)
    else:
        verts_og = consts.verts_hand_og
    scale = state.int_scales_hand
    if detach_scale:
        scale = jax.lax.stop_gradient(scale)
    if cfg.hand_proj_mode == "ortho":
        K = jnp.repeat(consts.camintr, cfg.hand_nb, axis=0)
        return cam.compute_transformation_ortho(
            verts_og, state.cams_hand, intrinsic_scales=scale, K=K,
            image_size=cfg.image_size)
    R = geo.rot6d_to_matrix(state.rotations_hand)
    return cam.compute_transformation_persp(
        verts_og, state.translations_hand, R, scale)


def get_joints_hand(state: HomanState, consts: HomanConsts, cfg: HomanConfig):
    """(B*H, 21, 3) posed 21-joint skeletons (homan/homan.py:309-339)."""
    verts_og, joints16 = _mano_verts_all_sides(state, consts, cfg,
                                               want_joints=True)
    joints21 = mano_lib.add_tips_and_reorder(verts_og - state.mano_trans[:, None],
                                             joints16)
    joints21 = joints21 + state.mano_trans[:, None, :]
    R = geo.rot6d_to_matrix(state.rotations_hand)
    out, _ = cam.compute_transformation_persp(
        joints21, state.translations_hand, R, state.int_scales_hand)
    return out


# Jitted getters for host-side (eager) callers — per-op dispatch to a remote
# accelerator is pathologically slow; cfg is static (frozen dataclass).
get_verts_object_jit = jax.jit(get_verts_object)
get_verts_object_parts_jit = jax.jit(get_verts_object_parts)
get_verts_hand_jit = jax.jit(get_verts_hand, static_argnums=(2, 3))
get_joints_hand_jit = jax.jit(get_joints_hand, static_argnums=(2,))


def optimizer_param_labels(cfg: HomanConfig) -> HomanState:
    """Three-group Adam structure of the reference (homan/jointopt.py:128-151):
    'rigid' (lr), 'mano' (lr*10), 'rot' (lr*10), 'frozen' (never updated —
    the reference simply omits mano_rot/mano_trans and any non-Parameter
    scale from the optimizer)."""
    scale_obj = "rigid" if cfg.optimize_object_scale else "frozen"
    scale_hand = "frozen" if cfg.optimize_mano_beta else "rigid"
    mano = "mano" if cfg.optimize_mano else "frozen"
    # Betas gate on optimize_mano_beta ALONE: the reference makes them a
    # Parameter iff optimize_mano_beta (homan/homan.py:107-117) and the
    # mano Adam group always lists them (jointopt.py:142-146), so betas
    # refine even when the pca pose is frozen (optimize_mano=False).
    betas = "mano" if cfg.optimize_mano_beta else "frozen"
    cams = ("rigid" if (cfg.hand_proj_mode == "ortho"
                        and cfg.optimize_ortho_cam) else "frozen")
    return HomanState(
        translations_object="rigid",
        rotations_object="rot",
        translations_hand="rigid",
        rotations_hand="rot",
        mano_pca_pose=mano,
        mano_rot="frozen",
        mano_trans="frozen",
        mano_betas=betas,
        int_scales_object=scale_obj,
        int_scales_hand=scale_hand,
        cams_hand=cams,
    )
