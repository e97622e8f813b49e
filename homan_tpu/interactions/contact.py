"""Hand-object contact attraction / collision repulsion.

Functional equivalent of homan/interactions/contactloss.py:149-309 with the
pairwise distances expressed as batched matmuls (MXU work) instead of
torch.bmm + index_select.

Reference-quirk note (documented, reproduced by default): the reference
computes `exterior = dist_values[(1, 0)] < 0` (contactloss.py:173) on SDF
values that are clamped to >= 0 at scenesdf.py:121 — so `exterior` is always
False: the attraction ("missed") term vanishes and the repulsion mask covers
*every* hand vertex, making the shipped contact loss a saturating tanh
attraction of all hand vertices toward the object. `strict_exterior=True`
enables the evidently intended semantics (exterior <=> sampled SDF == 0).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def load_contact_zones(path: str):
    """Read the reference's contact-zones pickle
    (`data/contact_zones.pkl`, contactloss.py:301-309): returns the
    zone-id -> vertex-index-list mapping consumed by
    compute_contact_loss(contact_zones=<dict>)."""
    import pickle
    with open(path, "rb") as f:
        data = pickle.load(f)
    return data["contact_zones"]


def batch_pairwise_dist2(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Squared pairwise distances (B, N, M) via the matmul expansion.

    Matches contactloss.py:60-79 batch_pairwise_dist (which returns squared
    distances).
    """
    xx = jnp.einsum("bnd,bnd->bn", x, x)
    yy = jnp.einsum("bmd,bmd->bm", y, y)
    # f32 accumulation: the TPU MXU's default single-pass bf16 (~0.5% rel
    # error) can flip the argmin / contact-threshold selections downstream;
    # the reference computes these distances in full f32.
    xy = jnp.einsum("bnd,bmd->bnm", x, y,
                    precision=jax.lax.Precision.HIGHEST)
    return xx[:, :, None] + yy[:, None, :] - 2.0 * xy


def masked_mean_loss(dists: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """sum(mask * dists) / sum(mask), 0 when the mask is empty
    (contactloss.py:50-57)."""
    mask = mask.astype(dists.dtype)
    valid = mask.sum()
    return jnp.where(valid > 0, (mask * dists).sum() / jnp.maximum(valid, 1.0),
                     0.0)


def compute_contact_loss(
    hand_verts: jnp.ndarray,
    hand_faces: jnp.ndarray,
    obj_verts: jnp.ndarray,
    obj_faces: jnp.ndarray,
    contact_thresh: float = 0.010,
    contact_mode: str = "dist_tanh",
    collision_thresh: float = 0.020,
    collision_mode: str = "dist_tanh",
    contact_target: str = "all",
    contact_zones="all",  # "all" | "tips" | dict zone->vertex ids
                          # (load_contact_zones reads the reference's pkl)
    strict_exterior: bool = False,
    sdf_grid: int = 32,
    obj_sdf_at_hand: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict, Dict]:
    """Attraction of near-surface hand verts + repulsion of penetrating ones.

    Args:
      hand_verts: (B, 778, 3); hand_faces: (Fh, 3) closed-fist topology.
      obj_verts: (B, Vo, 3); obj_faces: (Fo, 3).
      obj_sdf_at_hand: optional precomputed (B, 778) object interior SDF at
        the hand verts (from sdf.build_scene_sdfs + sample_scene_sdf) — pass
        it to share voxel grids with the collision term instead of
        re-voxelizing here.
    Returns:
      (missed_loss, penetr_loss, contact_info, metrics) — the contract of
      contactloss.compute_contact_loss (contactloss.py:149-309).
    """
    d2 = batch_pairwise_dist2(hand_verts, obj_verts)  # (B, 778, Vo)
    mins21 = d2.min(axis=2)  # per hand vert
    min21_idx = d2.argmin(axis=2)

    if obj_sdf_at_hand is None:
        # Only the object grid is consumed (pair (1, 0): object SDF at hand
        # verts) — voxelize just the object.
        from homan_tpu.interactions.sdf import (build_scene_sdfs,
                                                sample_scene_sdf)
        grids = build_scene_sdfs([obj_verts], [obj_faces], grid_size=sdf_grid)
        obj_sdf_at_hand = sample_scene_sdf(grids, 0, hand_verts)  # (B,778)>=0
    if strict_exterior:
        exterior = obj_sdf_at_hand <= 0.0
    else:
        # Literal reference behavior (see module docstring).
        exterior = obj_sdf_at_hand < 0.0
    penetr_mask = ~exterior

    # Closest object point per hand vertex
    results_close = jnp.take_along_axis(
        obj_verts, min21_idx[..., None], axis=1)  # (B, 778, 3)

    if contact_target == "all":
        diff = results_close - hand_verts
    elif contact_target == "obj":
        diff = results_close - jax.lax.stop_gradient(hand_verts)
    elif contact_target == "hand":
        diff = jax.lax.stop_gradient(results_close) - hand_verts
    else:
        raise ValueError(f"contact_target {contact_target}")
    anchor_dists = jnp.sqrt(jnp.maximum((diff**2).sum(-1), 1e-18))

    if contact_mode == "dist_sq":
        contact_vals = (diff**2).sum(-1)
        below_dist = mins21 < contact_thresh**2
    elif contact_mode == "dist":
        contact_vals = anchor_dists
        below_dist = mins21 < contact_thresh
    elif contact_mode == "dist_tanh":
        contact_vals = contact_thresh * jnp.tanh(anchor_dists / contact_thresh)
        below_dist = jnp.ones_like(mins21, bool)
    else:
        raise ValueError(f"contact_mode {contact_mode}")

    if collision_mode == "dist_sq":
        collision_vals = (diff**2).sum(-1)
    elif collision_mode == "dist":
        collision_vals = anchor_dists
    elif collision_mode == "dist_tanh":
        collision_vals = collision_thresh * jnp.tanh(
            anchor_dists / collision_thresh)
    else:
        raise ValueError(f"collision_mode {collision_mode}")

    missed_mask = below_dist & exterior
    if contact_zones == "tips":
        from homan_tpu.core.mano import TIP_VERTEX_IDS
        tips = jnp.zeros(hand_verts.shape[1], bool).at[
            jnp.asarray(TIP_VERTEX_IDS)].set(True)
        missed_mask = missed_mask & tips[None, :]
    elif isinstance(contact_zones, dict):
        # Zone mode (contactloss.py:264-275 with data/contact_zones.pkl):
        # per zone, only the zone vertex currently closest to the object
        # participates in the attraction term. Zone index arrays are static
        # (host-provided), so the gather compiles to fixed-shape selects.
        B = hand_verts.shape[0]
        matching = jnp.zeros(missed_mask.shape, bool)
        for zone_idxs in contact_zones.values():
            zi = jnp.asarray(np.asarray(zone_idxs, np.int64), jnp.int32)
            zmin = jnp.argmin(mins21[:, zi], axis=1)      # (B,)
            cont = zi[zmin]                                # (B,)
            matching = matching.at[jnp.arange(B), cont].set(True)
        missed_mask = missed_mask & matching
    elif contact_zones != "all":
        raise ValueError(f"contact_zones {contact_zones}")

    missed_loss = masked_mean_loss(contact_vals, missed_mask)
    penetr_loss = masked_mean_loss(collision_vals, penetr_mask)

    anchor_det = jax.lax.stop_gradient(anchor_dists)
    pen = penetr_mask.astype(anchor_det.dtype)
    metrics = {
        "max_penetr": (anchor_det * pen).max(axis=1).mean(),
        "mean_penetr": (anchor_det * pen).mean(axis=1).mean(),
    }
    contact_info = {
        "attraction_masks": missed_mask,
        "repulsion_masks": penetr_mask,
        "contact_points": results_close,
        "min_dists": mins21,
    }
    return missed_loss, penetr_loss, contact_info, metrics


def thresh_contact_iou(gt_dists: jnp.ndarray, pred_dists: jnp.ndarray,
                       threshs=(1, 2, 3, 4, 5, 6, 7, 8, 9, 10)):
    """Contact IoU averaged over thresholds + AUC (contactloss.py:22-47)."""
    all_ious = []
    for thresh in threshs:
        gt_c = gt_dists <= thresh
        pr_c = pred_dists <= thresh
        inter = (gt_c & pr_c).sum(axis=1).astype(jnp.float32)
        union = (gt_c | pr_c).sum(axis=1).astype(jnp.float32)
        all_ious.append(jnp.where(union > 0, inter / jnp.maximum(union, 1), 0.0))
    ious = jnp.stack(all_ious)  # (T, B)
    auc = jnp.trapezoid(ious, x=jnp.asarray(threshs, jnp.float32), axis=0).mean()
    return ious.mean(axis=1), auc
