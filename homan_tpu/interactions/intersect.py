"""Triangle-intersection collision loss (TPU-native BVH-branch equivalent).

The reference's optional collision branch (homan/lossutils.py:66-104,
`collision_mode != "sdf"`) finds interpenetrating triangle pairs with an
external CUDA BVH (`mesh_intersection.bvh_search_tree.BVH`, detection under
`torch.no_grad()`) and penalizes them with a conical distance-field loss
(`DistanceFieldPenetrationLoss(sigma=0.5, point2plane=1)`).

TPU-native formulation (original, not a port):

  * detection: brute-force vectorized Moller-style triangle-triangle
    intersection over cross-entity pairs, AABB-prefiltered arithmetically
    (no tree — a BVH's pointer chasing is hostile to the VPU, while the
    dense (Fa, Fb) pair test is regular elementwise work; 1.5k x 2k pairs
    is ~3M lanes, well within one fused kernel's budget). Detection is
    wrapped in stop_gradient, matching the reference's no_grad BVH pass.
  * penalty: for each intersecting pair, each vertex of one triangle that
    lies behind the other triangle's plane contributes its squared
    point-to-plane penetration depth (the `point2plane=1` variant of the
    reference's conic field), scaled by `sigma`; symmetric in the pair.

Differences kept deliberate and documented: pairs are cross-entity only
(hand x object, and hand x hand when two hands are present); a rigid
object's self-intersections are constant in its pose and the reference's
same-mesh neighbor pairs are filtered by its BVH anyway.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _tri_planes(tris: jnp.ndarray):
    """Unit normals + plane offsets for (..., 3, 3) triangles."""
    n = jnp.cross(tris[..., 1, :] - tris[..., 0, :],
                  tris[..., 2, :] - tris[..., 0, :])
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    d = -(n * tris[..., 0, :]).sum(-1)
    return n, d


def tri_tri_intersect(tri_a: jnp.ndarray, tri_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise triangle-triangle intersection mask.

    Args:
      tri_a: (Na, 3, 3); tri_b: (Nb, 3, 3).
    Returns:
      (Na, Nb) bool — True where the (open) triangles intersect.

    Moller's interval test: each triangle's vertices must straddle the
    other's plane, and the projections of both onto the plane-intersection
    line must overlap.
    """
    na, da = _tri_planes(tri_a)          # (Na, 3), (Na,)
    nb, db = _tri_planes(tri_b)          # (Nb, 3), (Nb,)

    # Signed distances of each triangle's vertices to the other's plane.
    # dist_b_on_a: (Na, Nb, 3) = n_a . v_b + d_a
    dist_b = jnp.einsum("ak,bjk->abj", na, tri_b) + da[:, None, None]
    dist_a = jnp.einsum("bk,ajk->abj", nb, tri_a) + db[None, :, None]

    eps = 1e-10
    straddle_b = (dist_b.max(-1) > eps) & (dist_b.min(-1) < -eps)
    straddle_a = (dist_a.max(-1) > eps) & (dist_a.min(-1) < -eps)
    candidate = straddle_a & straddle_b  # both straddle -> line test

    # Intersection-line direction and the scalar projections (Moller's
    # optimized form: project onto the dominant axis of the line direction).
    ldir = jnp.cross(na[:, None, :], nb[None, :, :])         # (Na, Nb, 3)
    axis = jnp.argmax(jnp.abs(ldir), axis=-1)                # (Na, Nb)
    proj_a = jnp.take_along_axis(
        jnp.broadcast_to(tri_a[:, None].transpose(0, 1, 3, 2),
                         ldir.shape[:2] + (3, 3)),
        axis[..., None, None], axis=2)[..., 0, :]            # (Na, Nb, 3)
    proj_b = jnp.take_along_axis(
        jnp.broadcast_to(tri_b[None, :].transpose(0, 1, 3, 2),
                         ldir.shape[:2] + (3, 3)),
        axis[..., None, None], axis=2)[..., 0, :]

    def interval(proj, dist):
        """Parameter interval where the triangle crosses the line.

        Moller: with vertices reordered so vertex `o` is alone on its side,
        t_i = p_o + (p_i - p_o) * d_o / (d_o - d_i) for the two edges
        crossing the plane. Branchless: compute t for all three edge pairs
        and keep the two whose endpoints straddle.
        """
        ts = []
        for i in range(3):
            for j in range(i + 1, 3):
                di, dj = dist[..., i], dist[..., j]
                pi, pj = proj[..., i], proj[..., j]
                denom = di - dj
                t = pi + (pj - pi) * di / jnp.where(
                    jnp.abs(denom) > 1e-12, denom, 1.0)
                cross = (di > 0) != (dj > 0)
                ts.append((t, cross))
        big = 1e30
        lo = jnp.minimum(
            jnp.minimum(jnp.where(ts[0][1], ts[0][0], big),
                        jnp.where(ts[1][1], ts[1][0], big)),
            jnp.where(ts[2][1], ts[2][0], big))
        hi = jnp.maximum(
            jnp.maximum(jnp.where(ts[0][1], ts[0][0], -big),
                        jnp.where(ts[1][1], ts[1][0], -big)),
            jnp.where(ts[2][1], ts[2][0], -big))
        return lo, hi

    lo_a, hi_a = interval(proj_a, dist_a)
    lo_b, hi_b = interval(proj_b, dist_b)
    overlap = (jnp.minimum(hi_a, hi_b) - jnp.maximum(lo_a, lo_b)) > 0
    return candidate & overlap


def _aabb_overlap(tri_a, tri_b, margin=0.0):
    lo_a, hi_a = tri_a.min(1), tri_a.max(1)  # (Na, 3)
    lo_b, hi_b = tri_b.min(1), tri_b.max(1)
    return ((lo_a[:, None] <= hi_b[None] + margin)
            & (lo_b[None] <= hi_a[:, None] + margin)).all(-1)


def pair_penetration_loss(tri_a: jnp.ndarray, tri_b: jnp.ndarray,
                          sigma: float = 0.5,
                          face_chunk: int = 512) -> jnp.ndarray:
    """Penetration penalty between two triangle soups (single frame).

    Args:
      tri_a: (Fa, 3, 3); tri_b: (Fb, 3, 3) camera-space triangles.
    Returns:
      scalar loss: sum over intersecting pairs of the squared point-to-
      plane penetration depths of each triangle's vertices behind the
      other's plane, scaled by sigma.
    """
    def chunk_loss(tb):
        inter = _aabb_overlap(tri_a, tb)
        inter = inter & tri_tri_intersect(tri_a, tb)
        inter = jax.lax.stop_gradient(inter)          # reference: no_grad BVH
        na, da = _tri_planes(tri_a)
        nb, db = _tri_planes(tb)
        dist_b = jnp.einsum("ak,bjk->abj", na, tb) + da[:, None, None]
        dist_a = jnp.einsum("bk,ajk->abj", nb, tri_a) + db[None, :, None]
        pen = (jnp.square(jnp.minimum(dist_b, 0.0)).sum(-1)
               + jnp.square(jnp.minimum(dist_a, 0.0)).sum(-1))
        return (pen * inter).sum() * sigma

    Fb = tri_b.shape[0]
    if Fb <= face_chunk:
        return chunk_loss(tri_b)
    pad = (-Fb) % face_chunk
    if pad:
        # Degenerate padding triangles (zero area) never intersect.
        tri_b = jnp.concatenate(
            [tri_b, jnp.zeros((pad, 3, 3), tri_b.dtype)])
    chunks = tri_b.reshape(-1, face_chunk, 3, 3)
    return jax.lax.map(chunk_loss, chunks).sum()


def compute_collision_loss_tritri(verts_hand: jnp.ndarray,
                                  hand_faces: jnp.ndarray,
                                  verts_obj: jnp.ndarray,
                                  obj_faces: jnp.ndarray,
                                  hand_nb: int,
                                  sigma: float = 0.5) -> jnp.ndarray:
    """Clip-level triangle-intersection collision loss.

    Args:
      verts_hand: (B*H, 778, 3) interleaved; hand_faces: (Fh, 3) closed fist.
      verts_obj: (B, Vo, 3); obj_faces: (Fo, 3).
    Returns:
      scalar (mean over frames), the `loss_collision` contract of
      homan/lossutils.py:104.
    """
    B = verts_obj.shape[0]
    hand_faces = jnp.asarray(hand_faces, jnp.int32)
    obj_faces = jnp.asarray(obj_faces, jnp.int32)

    def frame_loss(args):
        vh, vo = args  # (H, 778, 3), (Vo, 3)
        tri_o = vo[obj_faces]                      # (Fo, 3, 3)
        total = 0.0
        for h in range(hand_nb):
            tri_h = vh[h][hand_faces]              # (Fh, 3, 3)
            total = total + pair_penetration_loss(tri_h, tri_o, sigma)
        if hand_nb == 2:
            total = total + pair_penetration_loss(
                vh[0][hand_faces], vh[1][hand_faces], sigma)
        return total

    vh_frames = verts_hand.reshape(B, hand_nb, verts_hand.shape[1], 3)
    losses = jax.lax.map(frame_loss, (vh_frames, verts_obj))
    return losses.mean()
