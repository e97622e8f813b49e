"""Tiled differentiable rasterizer, designed for TPU/XLA from scratch.

Replaces the external CUDA `neural_renderer` used by the reference for all
gradient-bearing rendering (homan/losses.py:73,183-197;
homan/pose_optimization.py:94-151; homan/homan.py:168-176). The contract kept:

  * silhouette(verts, faces, K) -> (B, S, S) coverage in [0, 1], differentiable
    w.r.t. vertices (NMR `mode="silhouettes"`);
  * depth + silhouette for the ordinal-depth loss (NMR `.render()`);
  * intrinsics are normalized (`orig_size=1`): a unit focal length maps the
    image to [0, 1]^2; pixel (i, j) has center ((j+.5)/S, (i+.5)/S).

The *algorithm* is not a port: instead of CUDA scanline rasterization with
hand-written edge gradients, coverage is a closed-form soft function of
signed pixel-to-triangle distance (SoftRas-style), so XLA autodiff provides
exact gradients of the forward — no custom backward kernel to maintain.

TPU mapping:
  * Stage 1 (binning): project vertices, test face bboxes against image tiles,
    `lax.top_k` selects up to `faces_per_tile` candidate faces per tile.
    All shapes static; ties resolve deterministically.
  * Stage 2 (shading): a dense (pixels_per_tile x faces_per_tile) block per
    tile — large regular elementwise work that vectorizes onto the VPU, with
    the barycentric/edge terms expressed as fused multiply-adds.
  * vmap over batch (frames or pose candidates), vmap over tiles.

Assumption (documented): rendering happens in object-centered ROI crops
(REND_SIZE convention of the reference), so faces are never concentrated in
a single tile beyond `faces_per_tile`; the evidence pipeline guarantees this
by construction. Exceeding it degrades coverage gracefully (dropped faces).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RasterSettings:
    image_size: int = 256
    # Softness of the silhouette edge, in (normalized distance)^2 units.
    # sigma = 1e-5 puts the 50% level on the edge and ~1px falloff at S=256.
    sigma: float = 1e-5
    tile_px: int = 32
    faces_per_tile: int = 256
    znear: float = 1e-4
    # Extra margin (pixels) around face bboxes when binning, covering the
    # soft falloff band.
    bin_margin_px: float = 3.0
    # Temperature for soft-z aggregation of depth (normalized z units).
    depth_beta: float = 1e-2


def project_ndc(verts: jnp.ndarray, K: jnp.ndarray, eps: float = 1e-9):
    """Camera-space verts -> normalized image coords + depth.

    Args:
      verts: (B, V, 3); K: (B, 3, 3) normalized intrinsics.
    Returns:
      uv (B, V, 2) in image fraction units, z (B, V).
    """
    proj = jnp.einsum("bvj,bkj->bvk", verts, K)
    z = verts[..., 2]
    uv = proj[..., :2] / jnp.maximum(proj[..., 2:3], eps)
    return uv, z


def _point_segment_dist2(p, a, b, eps=1e-12):
    """Squared distance from pixels p to segments (a, b).

    p: (..., P, 1, 2); a, b: (..., 1, F, 2) -> (..., P, F)
    """
    ab = b - a
    ap = p - a
    denom = jnp.maximum((ab * ab).sum(-1), eps)
    t = jnp.clip((ap * ab).sum(-1) / denom, 0.0, 1.0)
    closest = a + t[..., None] * ab
    d = p - closest
    return (d * d).sum(-1)


def _edge_fn(p, a, b):
    """Signed parallelogram area of (b - a) x (p - a): (..., P, F)."""
    return ((b[..., 0] - a[..., 0]) * (p[..., 1] - a[..., 1])
            - (b[..., 1] - a[..., 1]) * (p[..., 0] - a[..., 0]))


def _tile_pixel_centers(image_size: int, tile_px: int) -> jnp.ndarray:
    """(T, P, 2) pixel centers for each tile, normalized [0,1] coords."""
    g = image_size // tile_px
    ys = (jnp.arange(image_size) + 0.5) / image_size
    xs = (jnp.arange(image_size) + 0.5) / image_size
    # Tiles scan row-major over the image; pixels row-major within a tile.
    ty, tx = jnp.meshgrid(jnp.arange(g), jnp.arange(g), indexing="ij")
    py, px = jnp.meshgrid(jnp.arange(tile_px), jnp.arange(tile_px), indexing="ij")
    rows = ty.reshape(-1, 1) * tile_px + py.reshape(1, -1)  # (T, P)
    cols = tx.reshape(-1, 1) * tile_px + px.reshape(1, -1)
    return jnp.stack([xs[cols], ys[rows]], axis=-1)  # (T, P, 2) as (u, v)


def _bin_faces(tri_uv: jnp.ndarray, valid: jnp.ndarray, s: RasterSettings):
    """Select up to faces_per_tile candidate faces per tile.

    Args:
      tri_uv: (F, 3, 2) projected triangle corners (single batch element).
      valid: (F,) face validity.
    Returns:
      idx (T, Kf) face indices, hit (T, Kf) validity of each slot.
    """
    S, tp = s.image_size, s.tile_px
    g = S // tp
    margin = s.bin_margin_px / S
    lo = tri_uv.min(axis=1) - margin  # (F, 2)
    hi = tri_uv.max(axis=1) + margin
    # Tile extents in normalized coords (T, 2)
    t_idx = jnp.arange(g * g)
    t_xy = jnp.stack([t_idx % g, t_idx // g], axis=-1).astype(jnp.float32)
    t_lo = t_xy * tp / S
    t_hi = (t_xy + 1) * tp / S
    overlap = (
        (lo[None, :, 0] <= t_hi[:, None, 0]) & (hi[None, :, 0] >= t_lo[:, None, 0])
        & (lo[None, :, 1] <= t_hi[:, None, 1]) & (hi[None, :, 1] >= t_lo[:, None, 1])
        & valid[None, :]
    )  # (T, F)
    kf = min(s.faces_per_tile, tri_uv.shape[0])
    score, idx = jax.lax.top_k(overlap.astype(jnp.float32), kf)
    return idx, score > 0.5


def _shade_tile(pix, tri_uv, tri_z, hit, s: RasterSettings, with_depth: bool):
    """Dense coverage of one tile: (P, 2) pixels x (Kf, 3, 2) faces.

    Returns sil (P,), and depth (P,) when with_depth (else None).
    """
    p = pix[:, None, :]  # (P, 1, 2)
    a = tri_uv[None, :, 0, :]
    b = tri_uv[None, :, 1, :]
    c = tri_uv[None, :, 2, :]
    # Edge functions / barycentric numerators (P, Kf)
    e0 = _edge_fn(p, b, c)
    e1 = _edge_fn(p, c, a)
    e2 = _edge_fn(p, a, b)
    area = _edge_fn(a, b, c)  # signed area of the triangle itself, (1, Kf)
    inside = (
        ((e0 >= 0) & (e1 >= 0) & (e2 >= 0))
        | ((e0 <= 0) & (e1 <= 0) & (e2 <= 0))
    )
    d2 = jnp.minimum(
        _point_segment_dist2(p, a, b),
        jnp.minimum(_point_segment_dist2(p, b, c),
                    _point_segment_dist2(p, c, a)),
    )  # (P, Kf)
    signed = jnp.where(inside, d2, -d2)
    prob = jax.nn.sigmoid(signed / s.sigma)
    prob = jnp.where(hit[None, :], prob, 0.0)
    # Union of per-face coverage, stable in log space.
    sil = 1.0 - jnp.exp(jnp.sum(jnp.log1p(-jnp.minimum(prob, 1.0 - 1e-7)),
                                axis=-1))
    if not with_depth:
        return sil, None
    # Perspective-correct depth: interpolate 1/z with 2D barycentrics.
    denom = jnp.where(jnp.abs(area) > 1e-12, area, 1.0)
    b0 = e0 / denom
    b1 = e1 / denom
    b2 = e2 / denom
    inv_z = (b0 / jnp.maximum(tri_z[None, :, 0], 1e-6)
             + b1 / jnp.maximum(tri_z[None, :, 1], 1e-6)
             + b2 / jnp.maximum(tri_z[None, :, 2], 1e-6))
    z_pix = 1.0 / jnp.maximum(inv_z, 1e-6)  # (P, Kf)
    covered = inside & hit[None, :]
    z_masked = jnp.where(covered, z_pix, 1e6)
    # Soft-min over faces keeps gradients flowing to the front surface.
    w = jax.nn.softmax(-z_masked / s.depth_beta, axis=-1)
    depth = jnp.sum(w * z_masked, axis=-1)
    depth = jnp.where(covered.any(-1), depth, 0.0)
    return sil, depth


@partial(jax.jit, static_argnames=("settings", "with_depth"))
def rasterize_soft(verts: jnp.ndarray,
                   faces: jnp.ndarray,
                   K: jnp.ndarray,
                   settings: RasterSettings = RasterSettings(),
                   with_depth: bool = False):
    """Differentiable soft silhouette (and optional depth).

    Args:
      verts: (B, V, 3) camera-space vertices.
      faces: (F, 3) int32 shared topology.
      K: (B, 3, 3) normalized intrinsics.
    Returns:
      dict: sil (B, S, S) float in [0,1]; depth (B, S, S) if with_depth
      (0 where empty).
    """
    s = settings
    S, tp = s.image_size, s.tile_px
    assert S % tp == 0, "image_size must be a multiple of tile_px"
    g = S // tp
    pix = _tile_pixel_centers(S, tp)  # (T, P, 2)

    def render_one(v, k):
        uv, z = project_ndc(v[None], k[None])
        uv, z = uv[0], z[0]
        tri_uv = uv[faces]  # (F, 3, 2)
        tri_z = z[faces]
        area = _edge_fn(tri_uv[None, :, 0, :], tri_uv[None, :, 1, :],
                        tri_uv[None, :, 2, :])[0]
        valid = (tri_z > s.znear).all(-1) & (jnp.abs(area) > 1e-12)
        idx, hit = _bin_faces(tri_uv, valid, s)  # (T, Kf)
        tri_uv_t = tri_uv[idx]  # (T, Kf, 3, 2)
        tri_z_t = tri_z[idx]

        sil_t, depth_t = jax.vmap(
            lambda px_, tuv, tz, h: _shade_tile(px_, tuv, tz, h, s, with_depth)
        )(pix, tri_uv_t, tri_z_t, hit)

        def untile(x):  # (T, P) -> (S, S)
            x = x.reshape(g, g, tp, tp)
            return x.transpose(0, 2, 1, 3).reshape(S, S)

        out = {"sil": untile(sil_t)}
        if with_depth:
            out["depth"] = untile(depth_t)
        return out

    return jax.vmap(render_one)(verts, K)


@partial(jax.jit, static_argnames=("settings",))
def rasterize_hard(verts: jnp.ndarray,
                   faces: jnp.ndarray,
                   K: jnp.ndarray,
                   face_colors: jnp.ndarray | None = None,
                   settings: RasterSettings = RasterSettings(),
                   background: float = 1.0,
                   light_dir=(0.57735, 0.57735, -0.57735),
                   ambient: float = 0.55,
                   diffuse: float = 0.45):
    """Hard z-buffer rasterization for visualization (non-differentiable).

    Args:
      verts: (B, V, 3); faces: (F, 3); K: (B, 3, 3) normalized.
      face_colors: (F, 3) flat colors; white if None.
    Returns:
      dict rgb (B, S, S, 3), depth (B, S, S), sil (B, S, S) bool.
    """
    s = settings
    S, tp = s.image_size, s.tile_px
    g = S // tp
    pix = _tile_pixel_centers(S, tp)
    if face_colors is None:
        face_colors = jnp.ones((faces.shape[0], 3), jnp.float32)
    light = jnp.asarray(light_dir, jnp.float32)
    light = light / jnp.linalg.norm(light)

    def render_one(v, k, fcol):
        uv, z = project_ndc(v[None], k[None])
        uv, z = uv[0], z[0]
        tri_uv = uv[faces]
        tri_z = z[faces]
        tri_3d = v[faces]  # (F, 3, 3)
        normals = jnp.cross(tri_3d[:, 1] - tri_3d[:, 0],
                            tri_3d[:, 2] - tri_3d[:, 0])
        normals = normals / jnp.maximum(
            jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-9)
        shade = ambient + diffuse * jnp.abs(normals @ light)  # two-sided
        area = _edge_fn(tri_uv[None, :, 0, :], tri_uv[None, :, 1, :],
                        tri_uv[None, :, 2, :])[0]
        valid = (tri_z > s.znear).all(-1) & (jnp.abs(area) > 1e-12)
        idx, hit = _bin_faces(tri_uv, valid, s)

        def shade_tile(px_, fidx, h):
            tuv = tri_uv[fidx]
            tz = tri_z[fidx]
            p = px_[:, None, :]
            a, b, c = tuv[None, :, 0, :], tuv[None, :, 1, :], tuv[None, :, 2, :]
            e0, e1, e2 = _edge_fn(p, b, c), _edge_fn(p, c, a), _edge_fn(p, a, b)
            inside = (((e0 >= 0) & (e1 >= 0) & (e2 >= 0))
                      | ((e0 <= 0) & (e1 <= 0) & (e2 <= 0))) & h[None, :]
            ar = _edge_fn(a, b, c)
            denom = jnp.where(jnp.abs(ar) > 1e-12, ar, 1.0)
            inv_z = (e0 / denom / jnp.maximum(tz[None, :, 0], 1e-6)
                     + e1 / denom / jnp.maximum(tz[None, :, 1], 1e-6)
                     + e2 / denom / jnp.maximum(tz[None, :, 2], 1e-6))
            z_pix = 1.0 / jnp.maximum(inv_z, 1e-6)
            z_buf = jnp.where(inside, z_pix, 1e6)
            best = jnp.argmin(z_buf, axis=-1)  # (P,)
            covered = jnp.take_along_axis(inside, best[:, None], -1)[:, 0]
            zsel = jnp.take_along_axis(z_buf, best[:, None], -1)[:, 0]
            face_sel = fidx[best]
            rgb = fcol[face_sel] * shade[face_sel][:, None]
            rgb = jnp.where(covered[:, None], rgb, background)
            return rgb, jnp.where(covered, zsel, 0.0), covered

        rgb_t, depth_t, cov_t = jax.vmap(shade_tile)(pix, idx, hit)

        def untile(x):
            lead = x.shape[2:]
            x = x.reshape(g, g, tp, tp, *lead)
            return x.transpose(0, 2, 1, 3, *range(4, 4 + len(lead))).reshape(
                S, S, *lead)

        return {"rgb": untile(rgb_t), "depth": untile(depth_t),
                "sil": untile(cov_t)}

    return jax.vmap(lambda v, k: render_one(v, k, face_colors))(verts, K)
