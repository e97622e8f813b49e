"""Sequence-parallel fitting: ONE clip's frame axis sharded over the mesh.

Clip data-parallelism (parallel/clips.py) needs many independent clips to
fill a mesh; a single LONG video scales along its own time axis instead.
Every per-frame tensor — the optimizable state rows, the evidence masks,
the per-frame intrinsics — is sharded along axis 0 (frames; hands use the
frame-major interleaved B*H layout, so contiguous frame shards keep whole
frames), and the SAME jitted joint-fit program as the single-chip path
(fit/joint.py::_run_phase) runs under GSPMD. XLA inserts the only
cross-chip traffic the math actually needs:

  * halo collective-permutes for the temporal smoothness differences
    (losses.compute_smooth_loss's frame-shifted subtraction),
  * all-reduces for the scalar loss/metrics and for the gradients of the
    GLOBAL parameters (int_scales_object/int_scales_hand couple all frames),

so the hot loop's per-frame work (MANO forward, rasterization, silhouette
losses) stays chip-local. No shard_map or manual collectives: the sharding
prefix trees below are the entire parallel implementation.

Reference anchor: the reference treats frames as the optimization batch axis
(homan/jointopt.py:92-124 builds one model over all-frame [B, ...] tensors;
homan/homan.py:61-64 lays hands out as B*H rows) and scales across
videos only by launching separate jobs (fit_vid_dataset.py:54-55);
frame-axis SPMD is the TPU-native answer for one long video.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from homan_tpu.fit import joint as joint_lib
from homan_tpu.fit import model as M


def make_frame_mesh(n_devices: int | None = None, axis: str = "frames") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def state_shardings(mesh: Mesh, axis: str = "frames") -> M.HomanState:
    """Prefix tree of shardings for HomanState: per-frame rows split on the
    mesh, global scales replicated."""
    frame = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    return M.HomanState(
        translations_object=frame,
        rotations_object=frame,
        translations_hand=frame,
        rotations_hand=frame,
        mano_pca_pose=frame,
        mano_rot=frame,
        mano_trans=frame,
        mano_betas=frame,
        int_scales_object=rep,
        int_scales_hand=rep,
        cams_hand=frame,
    )


def consts_shardings(mesh: Mesh, axis: str = "frames") -> M.HomanConsts:
    """Prefix tree of shardings for HomanConsts: evidence split by frame,
    canonical geometry / topology / MANO model data replicated."""
    frame = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    return M.HomanConsts(
        verts_object_og=rep,
        faces_object=rep,            # MeshTopology subtree, replicated
        verts_hand_og=frame,
        faces_hand=rep,
        ref_verts2d_hand=frame,
        ref_mask_object=frame,
        keep_mask_object=frame,
        ref_mask_hand=frame,
        keep_mask_hand=frame,
        camintr_rois_object=frame,
        camintr_rois_hand=frame,
        camintr=frame,
        mano_params_by_side=rep,     # dict subtree, replicated
        masks_object=frame,
        masks_hand=frame,
    )


def shard_frames(state: M.HomanState, consts: M.HomanConsts, mesh: Mesh,
                 axis: str = "frames") -> Tuple[M.HomanState, M.HomanConsts]:
    """Place one clip's state/consts with their frame axes split over the
    mesh. Requires frame_nb % mesh.size == 0 (whole frames per device; the
    interleaved B*H hand rows then split on frame boundaries too)."""
    n = mesh.devices.size
    frame_nb = state.translations_object.shape[0]
    if frame_nb % n:
        raise ValueError(
            f"frame_nb={frame_nb} must be divisible by the mesh size {n}"
            " (pad the clip or drop devices)")
    state = jax.device_put(state, state_shardings(mesh, axis))
    consts = jax.device_put(consts, consts_shardings(mesh, axis))
    return state, consts


def fit_frames_sharded(
    state: M.HomanState,
    consts: M.HomanConsts,
    cfg: M.HomanConfig,
    mesh: Mesh,
    axis: str = "frames",
    **optimize_kwargs,
) -> Tuple[M.HomanState, Dict[str, jnp.ndarray]]:
    """Joint fit of ONE clip with its frame axis sharded over `mesh`.

    Accepts the same keyword surface as fit.joint.optimize_hand_object
    (loss_weights, num_iterations, lr, roi_settings, raster_schedule, ...).
    The compiled program is identical to the single-chip one; only the input
    shardings differ, so results match the unsharded fit to float tolerance
    (reduction order inside frame-mean terms changes).
    """
    state, consts = shard_frames(state, consts, mesh, axis)
    return joint_lib.optimize_hand_object(state, consts, cfg,
                                          **optimize_kwargs)
