"""Rebuild final hand/object geometry from a saved fit state.

Equivalent of homan/postprocess.py:16-136: re-run MANO and the perspective
transforms from checkpointed parameters to recover verts/joints without the
full consts (used by offline evaluation).
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from homan_tpu.core import camera as cam
from homan_tpu.core import geometry as geo
from homan_tpu.core import mano as mano_lib
from homan_tpu.fit import model as M


def state_to_dict(state: M.HomanState) -> Dict[str, np.ndarray]:
    """Checkpoint payload: every optimizable array, host-side
    (the joint_fit.pt equivalent, fit_vid_dataset.py:365-372)."""
    return {k: np.asarray(v) for k, v in vars(state).items()}


def state_from_dict(d: Dict[str, np.ndarray]) -> M.HomanState:
    d = dict(d)
    if "cams_hand" not in d:  # checkpoints predating the ortho mode
        d["cams_hand"] = np.zeros((np.asarray(d["rotations_hand"]).shape[0], 3),
                                  np.float32)
    return M.HomanState(**{k: jnp.asarray(v) for k, v in d.items()})


def post_process(state: M.HomanState, mano_params_by_side: Dict,
                 verts_object_og: jnp.ndarray, cfg: M.HomanConfig,
                 verts_hand_og: jnp.ndarray | None = None) -> Dict:
    """Final geometry from fit parameters (homan/postprocess.py:16-136).

    Args:
      verts_hand_og: (B*H, 778, 3) local-frame hand verts — required when
        cfg.optimize_mano is False (the rigid path poses the STORED verts,
        homan/homan.py:341-358, instead of running MANO).
    Returns dict: verts_object (B, Vo, 3), verts_hand (B*H, 778, 3),
    joints_hand (B*H, 21, 3).
    """
    consts_min = M.HomanConsts(
        verts_object_og=jnp.asarray(verts_object_og),
        faces_object=None,
        verts_hand_og=(None if verts_hand_og is None
                       else jnp.asarray(verts_hand_og)),
        faces_hand=None,
        ref_verts2d_hand=None, ref_mask_object=None, keep_mask_object=None,
        ref_mask_hand=None, keep_mask_hand=None, camintr_rois_object=None,
        camintr_rois_hand=None, camintr=None,
        mano_params_by_side=mano_params_by_side,
        masks_object=None, masks_hand=None)
    verts_object, _ = M.get_verts_object_jit(state, consts_min)
    verts_hand, _ = M.get_verts_hand_jit(state, consts_min, cfg, False)
    joints_hand = M.get_joints_hand_jit(state, consts_min, cfg)
    return {
        "verts_object": verts_object,
        "verts_hand": verts_hand,
        "joints_hand": joints_hand,
    }
