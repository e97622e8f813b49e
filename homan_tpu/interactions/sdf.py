"""Mesh -> interior SDF voxelization + trilinear sampling, pure XLA.

Replaces the external CUDA `sdf` extension and torch `grid_sample` used by the
reference's SDFSceneLoss (homan/interactions/scenesdf.py:9,119-121,139-141):
  * `voxelize_interior_sdf`: a G^3 grid of phi(x) = dist(x, surface) if x is
    inside the mesh else 0 ("interior-clamped" — the reference clamps the CUDA
    kernel's output to >= 0 at scenesdf.py:121).
  * `grid_sample_3d`: differentiable trilinear lookup with align_corners=False
    + zero padding semantics (torch grid_sample defaults).
  * `sdf_scene_loss`: per-object voxelization (no gradient, like the
    reference's no_grad block) + pairwise penetration lookup (gradient flows
    to the sampled vertices through the trilinear weights — exactly the
    gradient path the reference relies on).

TPU mapping: the irregular per-triangle work of the CUDA kernel becomes a
dense (grid-point x face) distance computation — 32^3 x F pairs of fused
multiply-adds chunked over grid slabs, a shape XLA tiles well. Inside/outside
uses +z ray-crossing parity (meshes here are closed: closed-fist MANO and
watertight exemplar objects).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _point_triangle_dist2(p: jnp.ndarray, a, b, c, eps=1e-12):
    """Squared distance from points to triangles.

    p: (N, 1, 3); a, b, c: (1, F, 3) -> (N, F).
    Closest point is either the projection onto the triangle plane (when its
    barycentrics are all nonnegative) or the closest point of the three edges.
    """
    def seg_d2(s, e):
        se = e - s
        t = jnp.clip(((p - s) * se).sum(-1)
                     / jnp.maximum((se * se).sum(-1), eps), 0.0, 1.0)
        d = p - (s + t[..., None] * se)
        return (d * d).sum(-1)

    edge_d2 = jnp.minimum(seg_d2(a, b), jnp.minimum(seg_d2(b, c), seg_d2(c, a)))

    n = jnp.cross(b - a, c - a)  # (1, F, 3)
    nn_raw = (n * n).sum(-1)
    nn = jnp.maximum(nn_raw, eps)
    dist_plane = ((p - a) * n).sum(-1)  # signed * |n|
    proj = p - dist_plane[..., None] * n / nn[..., None]
    # Barycentric test of the projection; degenerate (zero-area) triangles
    # (e.g. pad_mesh's (0,0,0) padding faces) must take the edge branch —
    # their plane distance is identically 0 and would corrupt the min.
    w0 = (jnp.cross(b - proj, c - proj) * n).sum(-1)
    w1 = (jnp.cross(c - proj, a - proj) * n).sum(-1)
    w2 = (jnp.cross(a - proj, b - proj) * n).sum(-1)
    inside_face = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & (nn_raw > eps)
    plane_d2 = dist_plane * dist_plane / nn
    return jnp.where(inside_face, plane_d2, edge_d2)


def _ray_z_crossings(p: jnp.ndarray, a, b, c, eps=1e-12):
    """Parity of +z ray crossings: p (N, 1, 3); a,b,c (1, F, 3) -> (N,) bool."""
    # 2D (xy) containment with consistent handling via signed edge functions
    def edge(p0, p1):
        return ((p1[..., 0] - p0[..., 0]) * (p[..., 1] - p0[..., 1])
                - (p1[..., 1] - p0[..., 1]) * (p[..., 0] - p0[..., 0]))

    e0, e1, e2 = edge(a, b), edge(b, c), edge(c, a)
    inside_xy = (((e0 >= 0) & (e1 >= 0) & (e2 >= 0))
                 | ((e0 <= 0) & (e1 <= 0) & (e2 <= 0)))
    area2 = edge(a, b) + edge(b, c) + edge(c, a)  # = 2 * signed area, (N,F)
    nondegen = jnp.abs(area2) > eps
    # z of the triangle at (px, py) via 2D barycentrics
    denom = jnp.where(nondegen, area2, 1.0)
    b0 = e1 / denom  # weight of vertex a (opposite edge bc)
    b1 = e2 / denom
    b2 = e0 / denom
    z_tri = b0 * a[..., 2] + b1 * b[..., 2] + b2 * c[..., 2]
    crossing = inside_xy & nondegen & (z_tri > p[..., 2])
    return (crossing.sum(-1) % 2) == 1


@partial(jax.jit, static_argnames=("grid_size", "chunk"))
def voxelize_interior_sdf(verts: jnp.ndarray, faces: jnp.ndarray,
                          grid_size: int = 32, chunk: int = 4096):
    """Interior-clamped SDF on a G^3 grid over [-1, 1]^3.

    Args:
      verts: (B, V, 3), already normalized into [-1, 1]^3.
      faces: (F, 3) int32.
    Returns:
      phi: (B, G, G, G) with phi[i, j, k] the interior distance at grid point
      (x_i, y_j, z_k), cell centers x_i = -1 + (2i + 1)/G (align_corners=False
      convention, consistent with grid_sample_3d).
    """
    g = grid_size
    chunk = min(chunk, g ** 3)
    assert (g ** 3) % chunk == 0, (
        f"grid_size^3 ({g}^3={g ** 3}) must be a multiple of the slab "
        f"chunk ({chunk}) — pick a power-of-two grid_size")
    axis = -1.0 + (2.0 * jnp.arange(g) + 1.0) / g
    gx, gy, gz = jnp.meshgrid(axis, axis, axis, indexing="ij")
    points = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)  # (G^3, 3)

    def one_mesh(v):
        tri = v[faces]  # (F, 3, 3)
        a = tri[None, :, 0]
        b = tri[None, :, 1]
        c = tri[None, :, 2]

        def slab(pts):
            p = pts[:, None, :]
            d2 = _point_triangle_dist2(p, a, b, c).min(-1)
            inside = _ray_z_crossings(p, a, b, c)
            return jnp.where(inside, jnp.sqrt(jnp.maximum(d2, 1e-20)), 0.0)

        n_slabs = points.shape[0] // chunk
        out = jax.lax.map(slab, points.reshape(n_slabs, chunk, 3))
        return out.reshape(g, g, g)

    return jax.vmap(one_mesh)(verts)


def grid_sample_3d(phi: jnp.ndarray, coords: jnp.ndarray):
    """Trilinear sampling, torch grid_sample semantics (align_corners=False,
    zero padding).

    Args:
      phi: (B, G, G, G) indexed [i, j, k] <-> (x, y, z) — note this is the
        transpose of torch's [D, H, W] layout; the pair (voxelize, sample)
        here is self-consistent.
      coords: (B, N, 3) in [-1, 1], (x, y, z).
    Returns:
      (B, N) sampled values; 0 outside the box. Differentiable w.r.t. coords.
    """
    g = phi.shape[-1]

    def sample_one(vol, xyz):
        pix = ((xyz + 1.0) * g - 1.0) / 2.0  # (N, 3) in [−0.5, G−0.5]
        lo = jnp.floor(pix)
        frac = pix - lo
        lo = lo.astype(jnp.int32)

        def gather(offset):
            idx = lo + jnp.asarray(offset, jnp.int32)
            ok = ((idx >= 0) & (idx < g)).all(-1)
            idx = jnp.clip(idx, 0, g - 1)
            vals = vol[idx[:, 0], idx[:, 1], idx[:, 2]]
            return jnp.where(ok, vals, 0.0)

        out = 0.0
        for dx in (0, 1):
            wx = (1 - frac[:, 0]) if dx == 0 else frac[:, 0]
            for dy in (0, 1):
                wy = (1 - frac[:, 1]) if dy == 0 else frac[:, 1]
                for dz in (0, 1):
                    wz = (1 - frac[:, 2]) if dz == 0 else frac[:, 2]
                    out = out + wx * wy * wz * gather((dx, dy, dz))
        return out

    return jax.vmap(sample_one)(phi, coords)


def normalize_to_unit_box(verts: jnp.ndarray, scale_factor: float = 0.2):
    """Per-sample bbox center + padded half-extent (no gradient).

    Matches scenesdf.py:96-117: scale = max half-extent * (1 + scale_factor).
    Returns (center (B, 1, 3), scale (B, 1, 1)).
    """
    v = jax.lax.stop_gradient(verts)
    lo = v.min(axis=1, keepdims=True)
    hi = v.max(axis=1, keepdims=True)
    center = (lo + hi) / 2
    scale = ((hi - lo) * (1 + scale_factor) * 0.5).max(axis=-1, keepdims=True)
    return center, scale


@jax.jit
def interior_sdf_at_points(query: jnp.ndarray, verts: jnp.ndarray,
                           faces: jnp.ndarray) -> jnp.ndarray:
    """EXACT interior SDF evaluated directly at query points (no grid).

    phi(q) = dist(q, surface) if q inside the mesh else 0 — the same
    interior-clamped field the voxelizer discretizes, but computed only at
    the N query points instead of G^3 grid cells (the loss samples the field
    at mesh vertices only, so this is ~40x less work than voxelize+trilinear
    at G=32 and has no interpolation blur). The mesh carries no gradient
    (matching the reference's no_grad voxelization, scenesdf.py:119-121);
    the query points do: d phi / d q is the exact unit vector toward the
    closest surface point, where trilinear sampling gives a staircase
    approximation of the same direction.

    Args:
      query: (B, N, 3) world-space points (differentiable).
      verts: (B, V, 3) mesh vertices (stop-gradient inside).
      faces: (F, 3) int32.
    Returns:
      (B, N) interior depths, 0 outside.
    """
    verts = jax.lax.stop_gradient(verts)

    def one(q, v):
        tri = v[faces]  # (F, 3, 3)
        a, b, c = tri[None, :, 0], tri[None, :, 1], tri[None, :, 2]
        p = q[:, None, :]
        pd = jax.lax.stop_gradient(p)
        # Dense (N, F) sweep under stop_gradient: only the argmin face and
        # the inside bit survive it. The distance is then recomputed
        # differentiably on that single face per query — same value (same
        # arithmetic on the winning face), same gradient (the argmin is
        # locally constant, so d phi/d q through the dense min equals the
        # single-face derivative) — and the O(N*F) backward pass vanishes.
        d2_all = _point_triangle_dist2(pd, a, b, c)  # (N, F), no grad
        idx = jnp.argmin(d2_all, axis=-1)  # (N,)
        inside = _ray_z_crossings(pd, a, b, c)
        tb = tri[idx]  # (N, 3, 3)
        d2 = _point_triangle_dist2(p, tb[:, None, 0], tb[:, None, 1],
                                   tb[:, None, 2])[:, 0]  # (N,)
        return jnp.where(inside, jnp.sqrt(jnp.maximum(d2, 1e-20)), 0.0)

    return jax.vmap(one)(query, verts)


def sdf_scene_loss_direct(verts_list, faces_list, scale_factor: float = 0.2):
    """Grid-free variant of sdf_scene_loss: pairwise penetration via
    interior_sdf_at_points. Loss normalization matches the grid mode (each
    pair's depths divided by mesh i's box scale) so weights transfer.

    Returns (loss, {"dist_values": {(i, j): (B, V_j)} in world units}).
    """
    n = len(verts_list)
    assert n == len(faces_list)
    if n == 1:
        return jnp.asarray(0.0), {"sdfs": [], "dist_values": {}}
    scales = [normalize_to_unit_box(v, scale_factor)[1] for v in verts_list]
    loss = jnp.asarray(0.0)
    dist_values = {}
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            vals = interior_sdf_at_points(verts_list[j], verts_list[i],
                                          faces_list[i])  # (B, V_j) world
            dist_values[(i, j)] = vals
            loss = loss + (vals / scales[i][..., 0]).sum()
    return loss, {"sdfs": [], "dist_values": dist_values}


def build_scene_sdfs(verts_list, faces_list, grid_size: int = 32,
                     scale_factor: float = 0.2):
    """Voxelize each mesh ONCE into a normalized interior SDF grid.

    Grids carry no gradient (the reference voxelizes under no_grad,
    scenesdf.py:119-121), so the same grids can be shared by every term that
    samples them in one optimization step (collision + contact + metrics).
    Face winding does not matter: the parity inside-test and the unsigned
    point-triangle distances are winding-invariant, so the reference's
    flipped-closed-fist faces for two hands (lossutils.py:54) produce the
    same grid.

    Returns dict {"centers": [(B,1,3)], "scales": [(B,1,1)],
                  "phis": [(B,G,G,G)]}.
    """
    from homan_tpu.render.pallas_shade import is_tpu_backend
    if is_tpu_backend():
        # Fused Pallas voxelizer on TPU (~10x the XLA slab formulation);
        # grids are stop-gradient so the forward-only kernel suffices.
        # cpu AND gpu take the XLA path (Mosaic-TPU lowering is
        # unavailable there; interpreter mode would crawl).
        from homan_tpu.interactions.pallas_sdf import (
            voxelize_interior_sdf_pallas as _voxelize)
    else:
        def _voxelize(v, f, g):
            return voxelize_interior_sdf(v, f, g)

    centers, scales, phis = [], [], []
    for verts, faces in zip(verts_list, faces_list):
        center, scale = normalize_to_unit_box(verts, scale_factor)
        local = jax.lax.stop_gradient((verts - center) / scale)
        phi = _voxelize(local, faces, grid_size)
        centers.append(center)
        scales.append(scale)
        phis.append(jax.lax.stop_gradient(jnp.maximum(phi, 0.0)))
    return {"centers": centers, "scales": scales, "phis": phis}


def sample_scene_sdf(grids, i: int, verts: jnp.ndarray) -> jnp.ndarray:
    """Sample mesh i's interior SDF at world-space `verts` (B, N, 3).

    Returns (B, N) world-unit penetration depths (0 outside). Differentiable
    w.r.t. `verts` through the trilinear weights — the gradient path the
    reference relies on (scenesdf.py:139-141).
    """
    local = (verts - grids["centers"][i]) / grids["scales"][i]
    vals = grid_sample_3d(grids["phis"][i], local)
    return vals * grids["scales"][i][..., 0]


def sdf_penetration_from_grids(verts_list, grids):
    """Pairwise penetration loss given prebuilt grids (scenesdf.py:125-148):
    for every ordered pair (i, j), sample mesh i's SDF at mesh j's verts."""
    n = len(verts_list)
    loss = jnp.asarray(0.0)
    dist_values = {}
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            vals = sample_scene_sdf(grids, i, verts_list[j])  # world units
            dist_values[(i, j)] = vals
            loss = loss + (vals / grids["scales"][i][..., 0]).sum()
    return loss, dist_values


def sdf_scene_loss(verts_list, faces_list, grid_size: int = 32,
                   scale_factor: float = 0.2):
    """Pairwise SDF penetration loss over a list of objects.

    Functional equivalent of SDFSceneLoss.forward (scenesdf.py:77-148):
    build_scene_sdfs + sdf_penetration_from_grids. Voxel grids carry no
    gradient; vertices of the sampled object do.

    Args:
      verts_list: list of (B, V_i, 3).
      faces_list: list of (F_i, 3).
    Returns:
      loss (scalar), meta dict with "sdfs" (list of (B,G,G,G)) and
      "dist_values" {(i, j): (B, V_j)} rescaled to world units.
    """
    n = len(verts_list)
    assert n == len(faces_list)
    if n == 1:
        return jnp.asarray(0.0), {"sdfs": [], "dist_values": {}}
    grids = build_scene_sdfs(verts_list, faces_list, grid_size, scale_factor)
    loss, dist_values = sdf_penetration_from_grids(verts_list, grids)
    return loss, {"sdfs": grids["phis"], "dist_values": dist_values}
