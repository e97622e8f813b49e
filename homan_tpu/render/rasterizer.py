"""Tiled differentiable rasterizer, designed for TPU/XLA from scratch.

Replaces the external CUDA `neural_renderer` used by the reference for all
gradient-bearing rendering (homan/losses.py:73,183-197;
homan/pose_optimization.py:94-151; homan/homan.py:168-176). The contract kept:

  * silhouette(verts, topology, K) -> (B, S, S) coverage in [0, 1],
    differentiable w.r.t. vertices (NMR `mode="silhouettes"`);
  * depth + silhouette for the ordinal-depth loss (NMR `.render()`);
  * intrinsics are normalized (`orig_size=1`): a unit focal length maps the
    image to [0, 1]^2; pixel (i, j) has center ((j+.5)/S, (i+.5)/S).

The *algorithm* is not a port of the CUDA scanline rasterizer. Soft coverage
is built from CONTOUR EDGES:

    sil(p) = sigmoid( sign(p) * d^2(p, silhouette edges) / sigma )

where sign(p) is +1 iff any face covers p (exact, hard) and the distance runs
over mesh edges whose two adjacent faces have opposite projected orientation
(the occluding contour), recomputed each call from the current projection.
Compared to per-face soft coverage (SoftRas-style probabilistic union), this
profile is symmetric about the true boundary at ANY sigma — a per-face union
accumulates an outward halo whose area bias corrupts depth/scale fits, and a
per-face max caps interior coverage at the face size, biasing fits small
(both measured in tests/test_rasterizer.py::test_depth_recovery_unbiased).
Gradients flow through the projected endpoints of contour edges, the same
gradient path CUDA rasterizers hand-implement; here XLA autodiff derives it
from the closed form.

TPU mapping:
  * Stage 1 (binning): project vertices, test face/edge bboxes against image
    tiles, `lax.top_k` selects up to faces_per_tile / edges_per_tile
    candidates per tile. All shapes static; ties resolve deterministically.
  * Stage 2 (shading): dense (pixels_per_tile x candidates) blocks per tile —
    large regular elementwise work that vectorizes onto the VPU.
  * vmap over batch (frames or pose candidates), vmap over tiles.

Assumption (documented): rendering happens in object-centered ROI crops
(REND_SIZE convention of the reference), so candidates per tile stay within
capacity; the evidence pipeline guarantees this by construction. Exceeding it
degrades coverage gracefully (dropped faces/edges).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class RasterSettings:
    image_size: int = 256
    # Softness of the silhouette band, in (normalized distance)^2 units.
    # The transition spans |d| <~ 2*sqrt(sigma): sigma = 1e-5 is a ~1.6px band
    # at S=256. Unbiased at any sigma (see module docstring), so large values
    # buy long-range gradients without corrupting converged fits.
    sigma: float = 1e-5
    # tile=64 measured fastest on v5e at 256^2 (large regular blocks; fewer
    # top_k rows); ept=64 is exact for ~1.3k-face ROI-filling objects.
    tile_px: int = 64
    faces_per_tile: int = 256  # depth / hard passes only
    edges_per_tile: int = 64
    znear: float = 1e-4
    # Margin (pixels) around edge bboxes when binning; also the saturation
    # cap of the distance term. Must exceed the sigmoid band (2*sqrt(sigma)*S
    # pixels) for gradients to reach.
    bin_margin_px: float = 8.0
    # Tile shading backend: True = fused Pallas TPU kernel with an analytic
    # VJP (render/pallas_shade.py; measured ~3x faster than the XLA
    # formulation, bit-identical output), False = pure XLA, None = auto
    # (Pallas on TPU, XLA elsewhere).
    use_pallas: bool | None = None


from collections import OrderedDict

# (shape, content-hash) -> MeshTopology; LRU (move-to-end on hit) so a
# dataset pass cycling the 21 YCB objects + hand topologies keeps every one
# resident (FIFO at 16 evicted the hand mesh every cycle on mixed-object
# runs — bench_throughput_hetero's cache-hit-rate block is the regression
# evidence). Each entry holds a few MB of int32 device arrays.
_TOPOLOGY_CACHE: "OrderedDict" = OrderedDict()
_TOPOLOGY_CACHE_CAP = 64
_TOPOLOGY_CACHE_STATS = {"hits": 0, "misses": 0}


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MeshTopology:
    """Static mesh connectivity: faces + unique edges with adjacent faces.

    Build ONCE per mesh on host with `from_faces` (needs concrete values, not
    traced arrays); flows through jit as a pytree afterwards.
    """
    faces: jnp.ndarray       # (F, 3) int32
    edges: jnp.ndarray       # (E, 2) int32 vertex ids
    edge_faces: jnp.ndarray  # (E, 2) int32 adjacent face ids, -1 = boundary
    # True where edges[e] = (u, v) appears as u->v in faces[edge_faces[e, 0]]'s
    # cyclic order; orients contour edges for winding-number coverage.
    edge_dir_f1: jnp.ndarray  # (E,) bool
    # Transposed edge incidence: for each vertex, the positions of its
    # occurrences in edges.reshape(-1), padded with 2E (a sentinel zero row
    # in the cotangent). Lets the uv[edges] gather run its backward as a
    # (V, deg) gather + sum instead of XLA's transpose scatter-add, which
    # serializes on TPU (~0.1 ms/iter at headline shapes, ab_prep.py).
    # None (hand-built topologies, e.g. edge-bucket padding in tests) falls
    # back to the plain gather with the scatter-add backward.
    vert_edge_slots: jnp.ndarray | None = None  # (Vmax, max_degree) int32
    # Same transposed incidence for faces.reshape(-1) (the uv[faces] /
    # z[faces] gathers of the depth prep).
    vert_face_slots: jnp.ndarray | None = None  # (Vmax, max_face_deg) int32

    @classmethod
    def from_faces(cls, faces) -> "MeshTopology":
        f = np.asarray(faces, np.int64)
        # Pure in the face values and ~30-120 ms of host python per build
        # (edge maps are per-face loops): memoize by content. The hand
        # topology repeats across every sample of a dataset run and the
        # object topology across every frame chunk of a video.
        key = (f.shape, hash(np.ascontiguousarray(f).tobytes()))
        hit = _TOPOLOGY_CACHE.get(key)
        if hit is not None:
            _TOPOLOGY_CACHE.move_to_end(key)
            _TOPOLOGY_CACHE_STATS["hits"] += 1
            return hit
        _TOPOLOGY_CACHE_STATS["misses"] += 1
        topo = cls._build_from_faces(f)
        if len(_TOPOLOGY_CACHE) >= _TOPOLOGY_CACHE_CAP:
            _TOPOLOGY_CACHE.popitem(last=False)  # evict least-recently-used
        _TOPOLOGY_CACHE[key] = topo
        return topo

    @classmethod
    def _build_from_faces(cls, f: np.ndarray) -> "MeshTopology":
        # Vectorized edge extraction (a per-face python loop costs
        # 0.2-0.8 s on 1k-5k-face meshes). Semantics proven equal to the
        # loop formulation by tests/test_rasterizer.py's oracle test:
        # unique undirected edges sorted by (u, v); per edge the FIRST two
        # faces in face-major (a,b),(b,c),(c,a) generation order; dir_f1 =
        # whether the edge appears as u->v in the slot-0 face's cycle.
        #
        # Degenerate (padding) faces have repeated vertices; keep them in
        # `faces` (they rasterize to nothing) but omit their edges.
        good = ((f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2])
                & (f[:, 0] != f[:, 2]))
        fg = f[good]
        if fg.size:
            gid = np.nonzero(good)[0]
            # (Fg, 3, 2) directed edges in cycle order, face-major.
            dir_edges = np.stack(
                [fg[:, [0, 1]], fg[:, [1, 2]], fg[:, [2, 0]]],
                axis=1).reshape(-1, 2)
            face_of = np.repeat(gid, 3)
            canon = np.sort(dir_edges, axis=1)  # (3Fg, 2) as (min, max)
            edges, inverse = np.unique(canon, axis=0, return_inverse=True)
            # Stable sort by edge id keeps generation order within groups,
            # so group starts give each edge's first (and second) faces.
            order = np.argsort(inverse, kind="stable")
            counts = np.bincount(inverse, minlength=len(edges))
            starts = np.searchsorted(inverse[order], np.arange(len(edges)))
            adj = np.full((len(edges), 2), -1, np.int64)
            adj[:, 0] = face_of[order[starts]]
            second = np.minimum(starts + 1, len(order) - 1)
            adj[:, 1] = np.where(counts > 1, face_of[order[second]], -1)
            # Orientation of (u, v) within the slot-0 face's cycle: the
            # first occurrence's directed pair is ascending iff u->v.
            first_dir = dir_edges[order[starts]]
            dir_f1 = first_dir[:, 0] < first_dir[:, 1]
        else:
            edges = np.zeros((1, 2), np.int64)
            adj = np.full((1, 2), -1, np.int64)
            dir_f1 = np.zeros(1, bool)
        return cls(
            faces=jnp.asarray(f, jnp.int32),
            edges=jnp.asarray(edges, jnp.int32),
            edge_faces=jnp.asarray(adj, jnp.int32),
            edge_dir_f1=jnp.asarray(dir_f1),
            vert_edge_slots=jnp.asarray(_inverse_slots(edges.reshape(-1)),
                                        jnp.int32),
            vert_face_slots=jnp.asarray(_inverse_slots(f.reshape(-1)),
                                        jnp.int32),
        )


def _inverse_slots(flat: np.ndarray) -> np.ndarray:
    """Transposed incidence of an int index vector (vectorized host build).

    Returns (max(flat)+1, max_multiplicity) positions of each value's
    occurrences in `flat`, padded with len(flat) — the sentinel row index
    of a zero-padded cotangent (see _gather_rows)."""
    n_vt = int(flat.max()) + 1 if flat.size else 1
    order = np.argsort(flat, kind="stable")
    counts = np.bincount(flat, minlength=n_vt)
    deg = max(1, int(counts.max()))
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    rank = np.arange(len(flat)) - starts[flat[order]]
    slots = np.full((n_vt, deg), len(flat), np.int64)
    slots[flat[order], rank] = order
    return slots


@jax.custom_vjp
def _gather_rows(u, edges, slots):
    """u[edges] with a transpose-gather backward.

    XLA transposes a gather into scatter-add, which serializes on TPU. The
    topology is static, so the inverse map is precomputable
    (MeshTopology.vert_edge_slots) and the backward becomes gather + sum —
    measured ~0.1 ms/iter cheaper at headline shapes (scripts/ab_prep.py).
    Forward is bit-identical to u[edges]; the backward's summation order
    within a vertex differs from the scatter's, so cotangents agree to
    float roundoff (exactly, for the common degree-disjoint case).
    """
    return u[edges]


def _gather_rows_fwd(u, edges, slots):
    return u[edges], (u, edges, slots)


def _gather_rows_bwd(res, ct):
    u, edges, slots = res
    c = ct.shape[-1]
    flat = ct.reshape(-1, c)  # row-major (E*2, C) matches edges.reshape(-1)
    flat = jnp.concatenate([flat, jnp.zeros((1, c), ct.dtype)], axis=0)
    gu = flat[slots].sum(axis=1)  # (n_vt, C)
    pad = u.shape[0] - gu.shape[0]
    if pad:
        gu = jnp.concatenate([gu, jnp.zeros((pad, c), ct.dtype)], axis=0)
    f0 = jax.dtypes.float0
    return gu, np.zeros(edges.shape, f0), np.zeros(slots.shape, f0)


_gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def as_topology(faces_or_topo) -> MeshTopology:
    if isinstance(faces_or_topo, MeshTopology):
        return faces_or_topo
    return MeshTopology.from_faces(faces_or_topo)


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
    """Squared distance from pixels p (..., P, 1, 2) to segments (..., 1, N, 2)."""
    ab = b - a
    ap = p - a
    denom = jnp.maximum((ab * ab).sum(-1), eps)
    t = jnp.clip((ap * ab).sum(-1) / denom, 0.0, 1.0)
    closest = a + t[..., None] * ab
    d = p - closest
    return (d * d).sum(-1)


def _edge_fn(p, a, b):
    """Signed parallelogram area of (b - a) x (p - a)."""
    return ((b[..., 0] - a[..., 0]) * (p[..., 1] - a[..., 1])
            - (b[..., 1] - a[..., 1]) * (p[..., 0] - a[..., 0]))


def _tile_pixel_centers(image_size: int, tile_px: int) -> jnp.ndarray:
    """(T, P, 2) pixel centers for each tile, normalized [0,1] coords."""
    g = image_size // tile_px
    ys = (jnp.arange(image_size) + 0.5) / image_size
    xs = (jnp.arange(image_size) + 0.5) / image_size
    ty, tx = jnp.meshgrid(jnp.arange(g), jnp.arange(g), indexing="ij")
    py, px = jnp.meshgrid(jnp.arange(tile_px), jnp.arange(tile_px), indexing="ij")
    rows = ty.reshape(-1, 1) * tile_px + py.reshape(1, -1)  # (T, P)
    cols = tx.reshape(-1, 1) * tile_px + px.reshape(1, -1)
    return jnp.stack([xs[cols], ys[rows]], axis=-1)  # (T, P, 2) as (u, v)


def _tile_overlap(lo: jnp.ndarray, hi: jnp.ndarray, valid: jnp.ndarray,
                  s: RasterSettings, margin: float) -> jnp.ndarray:
    """(T, N) bbox-tile overlap mask — the renderer's binning predicate.

    Shared by _bin_boxes (candidate selection) and check_edge_budget so the
    diagnostic measures the EXACT binning the renderer performs.
    """
    S, tp = s.image_size, s.tile_px
    g = S // tp
    lo = lo - margin
    hi = hi + margin
    t_idx = jnp.arange(g * g)
    t_xy = jnp.stack([t_idx % g, t_idx // g], axis=-1).astype(jnp.float32)
    t_lo = t_xy * tp / S
    t_hi = (t_xy + 1) * tp / S
    return (
        (lo[None, :, 0] <= t_hi[:, None, 0]) & (hi[None, :, 0] >= t_lo[:, None, 0])
        & (lo[None, :, 1] <= t_hi[:, None, 1]) & (hi[None, :, 1] >= t_lo[:, None, 1])
        & valid[None, :]
    )  # (T, N)


def _bin_boxes(lo: jnp.ndarray, hi: jnp.ndarray, valid: jnp.ndarray,
               s: RasterSettings, capacity: int, margin: float,
               with_demand: bool = False):
    """Select up to `capacity` candidates per tile by bbox-tile overlap.

    lo, hi: (N, 2) candidate bboxes (normalized coords); valid: (N,).
    Returns idx (T, C) candidate indices, hit (T, C) slot validity; with
    with_demand, also the max per-tile candidate count BEFORE the top-k
    truncation — demand > capacity means candidates were dropped (for
    contour edges that corrupts the winding region, not just the soft
    band, so it must be surfaced, never silent). The overlap matrix is
    already materialized for the top-k; the row-sum is free.
    """
    overlap = _tile_overlap(lo, hi, valid, s, margin)
    c = min(capacity, lo.shape[0])
    score, idx = jax.lax.top_k(overlap.astype(jnp.float32), c)
    if with_demand:
        demand = overlap.sum(axis=1).max().astype(jnp.int32)
        return idx, score > 0.5, demand
    return idx, score > 0.5


def _face_inside(pix, tri_uv, hit):
    """(P,) bool: any valid candidate face covers the pixel."""
    p = pix[:, None, :]
    a = tri_uv[None, :, 0, :]
    b = tri_uv[None, :, 1, :]
    c = tri_uv[None, :, 2, :]
    e0 = _edge_fn(p, b, c)
    e1 = _edge_fn(p, c, a)
    e2 = _edge_fn(p, a, b)
    inside = (((e0 >= 0) & (e1 >= 0) & (e2 >= 0))
              | ((e0 <= 0) & (e1 <= 0) & (e2 <= 0)))
    return (inside & hit[None, :]).any(-1)


def _face_depth(pix, tri_uv, tri_z, hit, s: RasterSettings):
    """(P,) hard z-buffer depth over covering faces; 0 where uncovered.

    Inverse depth is linear over a triangle in screen space, so the nearest
    face is the argmax of interpolated 1/z over the covering set — one
    compare chain instead of a softmax. Gradients flow through the winning
    face's interpolation only (the hard inside test gets none: envelope),
    which is exactly a CUDA z-buffer's depth backward.
    """
    p = pix[:, None, :]
    a = tri_uv[None, :, 0, :]
    b = tri_uv[None, :, 1, :]
    c = tri_uv[None, :, 2, :]
    e0 = _edge_fn(p, b, c)
    e1 = _edge_fn(p, c, a)
    e2 = _edge_fn(p, a, b)
    inside = (((e0 >= 0) & (e1 >= 0) & (e2 >= 0))
              | ((e0 <= 0) & (e1 <= 0) & (e2 <= 0)))
    area = _edge_fn(a, b, c)
    denom = jnp.where(jnp.abs(area) > 1e-12, area, 1.0)
    inv_z = (e0 / denom / jnp.maximum(tri_z[None, :, 0], 1e-6)
             + e1 / denom / jnp.maximum(tri_z[None, :, 1], 1e-6)
             + e2 / denom / jnp.maximum(tri_z[None, :, 2], 1e-6))
    covered = inside & hit[None, :]
    inv_masked = jnp.where(covered, inv_z, 0.0)
    best = jnp.argmax(inv_masked, axis=-1)
    inv_sel = jnp.take_along_axis(inv_masked, best[:, None], -1)[:, 0]
    return jnp.where(inv_sel > 0.0, 1.0 / jnp.maximum(inv_sel, 1e-9), 0.0)


def rasterize_soft(verts: jnp.ndarray,
                   topology,
                   K: jnp.ndarray,
                   settings: RasterSettings = RasterSettings(),
                   with_depth: bool = False):
    """Differentiable soft silhouette (and optional depth).

    Args:
      verts: (B, V, 3) camera-space vertices.
      topology: MeshTopology (or a concrete (F, 3) array — only allowed
        outside jit; build the MeshTopology up front in traced code).
      K: (B, 3, 3) normalized intrinsics.
    Returns:
      dict: sil (B, S, S) in [0,1]; depth (B, S, S) if with_depth.
    """
    topo = as_topology(topology)
    use_pallas = settings.use_pallas
    if use_pallas is None:
        # Pallas only where Mosaic-TPU lowering exists (tpu / tpu-like
        # plugins); cpu AND gpu fall back to the equivalent XLA path.
        from homan_tpu.render.pallas_shade import is_tpu_backend
        use_pallas = is_tpu_backend()
    if use_pallas and not with_depth:
        return _rasterize_soft_pallas(verts, topo, K, settings)
    return _rasterize_soft(verts, topo, K, settings, with_depth)


def _contour_data(uv, z, topo: MeshTopology, s: RasterSettings):
    """Shared per-frame contour extraction: oriented segments + flags.

    Contour edges of the CURRENT projection: adjacent faces have opposite
    orientation (or the edge is a mesh boundary). Each edge is oriented
    along its front face's traversal so oriented +x ray crossings sum to
    the front-layer count (winding) at a pixel. Which face is "front" only
    flips the global winding sign (coverage uses winding != 0), so orient
    by f1's cycle and flip when f1 is back-facing (o1 > 0 is arbitrary but
    consistent per mesh). Single source of truth for the XLA path, the
    Pallas prep, and check_edge_budget — they must stay bit-identical.

    Returns p0, p1 (E, 2), cross_sign (E,) (0 for non-contour), is_contour,
    flip (winding jump across the directed edge), tri_uv, tri_z, f_valid.
    """
    tri_uv = uv[topo.faces]
    tri_z = z[topo.faces]
    area = _edge_fn(tri_uv[:, 0, :], tri_uv[:, 1, :], tri_uv[:, 2, :])
    f_valid = (tri_z > s.znear).all(-1) & (jnp.abs(area) > 1e-12)
    front = jnp.where(f_valid, jnp.sign(area), 0.0)
    front_pad = jnp.concatenate([front, jnp.zeros((1,), front.dtype)])
    ef = topo.edge_faces
    o1 = front_pad[jnp.where(ef[:, 0] >= 0, ef[:, 0], front.shape[0])]
    o2 = front_pad[jnp.where(ef[:, 1] >= 0, ef[:, 1], front.shape[0])]
    e_z_ok = (z[topo.edges] > s.znear).all(-1)
    is_contour = (o1 != o2) & e_z_ok & ((o1 != 0) | (o2 != 0))
    if topo.vert_edge_slots is None:
        seg = uv[topo.edges]
    else:
        seg = _gather_rows(uv, topo.edges, topo.vert_edge_slots)
    flip = jnp.where(topo.edge_dir_f1, 1.0, -1.0) * jnp.where(o1 > 0, 1.0,
                                                              -1.0)
    p0 = seg[:, 0]
    p1 = seg[:, 1]
    cross_sign = jnp.sign(p1[:, 1] - p0[:, 1]) * flip * is_contour
    return p0, p1, cross_sign, is_contour, flip, tri_uv, tri_z, f_valid


def _pallas_prep(verts, topo: MeshTopology, K, settings: RasterSettings):
    """Packed per-tile kernel inputs for the Pallas shade path.

    Returns (seg_pack (B,T,8,Ke), anchor_px (B,T,tp,tp), e_demand (B,T),
    static tuple) — exposed so scripts/ab_shade.py can benchmark kernel
    variants on exactly the inputs the fit produces.
    """
    s = settings
    S, tp = s.image_size, s.tile_px
    assert S % tp == 0, "image_size must be a multiple of tile_px"
    g = S // tp
    ke = min(s.edges_per_tile, topo.edges.shape[0])
    margin = s.bin_margin_px / S
    cap2 = margin * margin
    ys_all = (jnp.arange(S) + 0.5) / S

    def prep(v, k):
        uv, z = project_ndc(v[None], k[None])
        uv, z = uv[0], z[0]
        p0, p1, cross_sign, is_contour, flip, _, _, _ = _contour_data(
            uv, z, topo, s)

        # Anchors at tile-column right boundaries, all contour edges. One
        # fused (S, E) -> (S,) reduction per tile column (g is tiny, the
        # static loop unrolls); an einsum over a broadcast (g, S, E) mask
        # materializes ~4 (S, E) f32 intermediates per frame and was
        # bandwidth-bound (scripts/ab_prep.py P2, 2026-08-19).
        y0 = p0[:, 1][None, :]
        y1 = p1[:, 1][None, :]
        py = ys_all[:, None]
        spans = (y0 <= py) != (y1 <= py)
        t = (py - y0) / jnp.where(jnp.abs(y1 - y0) > 1e-12, y1 - y0, 1.0)
        x_int = p0[:, 0][None, :] + t * (p1[:, 0] - p0[:, 0])[None, :]
        contrib = jnp.where(spans, cross_sign[None, :], 0.0)
        anchors = jnp.stack([
            jnp.sum(jnp.where(x_int > (gc + 1.0) * tp / S, contrib, 0.0),
                    axis=1) for gc in range(g)])  # (g, S)

        overlap = _tile_overlap(jnp.minimum(p0, p1), jnp.maximum(p0, p1),
                                is_contour, s, margin)  # (T, E) bool
        e_demand = overlap.sum(axis=1).max().astype(jnp.int32)
        # Select + gather as ONE one-hot MXU matmul. The binning scores are
        # binary, so lax.top_k (lowest-index tie order) == "the first ke
        # overlapping edges per tile"; that selection is a cumsum-ranked
        # one-hot (T, ke, E), and contracting it against the per-edge value
        # columns IS the gather — bit-exact (one-hot f32 dot adds exact 0s)
        # and its transpose-matmul backward replaces the serialized TPU
        # scatter-adds that made the old top_k+gather prep cost as much as
        # the shade kernel itself (scripts/ab_prep.py, 2026-08-19).
        csum = jnp.cumsum(overlap.astype(jnp.int32), axis=-1)
        ranks = jnp.arange(1, ke + 1, dtype=jnp.int32)
        sel = (overlap[:, None, :]
               & (csum[:, None, :] == ranks[None, :, None])).astype(
                   jnp.float32)  # (T, ke, E)
        hitf = sel.sum(-1)  # (T, ke) — 1.0 where the slot is filled
        # row 6 source: true edge orientation (winding jump across the
        # directed edge) — sign(dy)-free so exactly-horizontal contour
        # edges resolve too
        cols = jnp.stack([p0[:, 0], p0[:, 1], p1[:, 0], p1[:, 1],
                          cross_sign, flip * is_contour], axis=-1)  # (E, 6)
        packed = jnp.einsum("tke,ec->tck", sel, cols,
                            precision=jax.lax.Precision.HIGHEST)  # (T,6,ke)
        far = 99.0 * (1.0 - hitf)  # empty slots sit far outside the image
        seg_pack = jnp.stack(
            [packed[:, 0] + far, packed[:, 1] + far, packed[:, 2] + far,
             packed[:, 3] + far, packed[:, 4], hitf, packed[:, 5],
             jnp.zeros_like(hitf)], axis=-2)  # (T, 8, Ke)

        tile_gx = jnp.arange(g * g) % g
        rows = (jnp.arange(g * g) // g)[:, None] * tp + jnp.arange(tp)[None]
        anchor_rows = anchors[tile_gx[:, None], rows]  # (T, tp)
        anchor_px = jnp.broadcast_to(anchor_rows[:, :, None],
                                     (g * g, tp, tp))
        return seg_pack, anchor_px, e_demand

    seg_pack, anchor_px, e_demand = jax.vmap(prep)(verts, K)
    static = (tp, S, g, s.sigma, cap2, ke)
    return seg_pack, anchor_px, e_demand, static


@partial(jax.jit, static_argnames=("settings",))
def _rasterize_soft_pallas(verts, topo: MeshTopology, K,
                           settings: RasterSettings):
    # Module-level jit: standalone callers (evidence mask renders, viz) would
    # otherwise run the prep eagerly op-by-op — seconds per call on a
    # remote/tunneled TPU. Inside an outer jit this inlines as before.
    from homan_tpu.render.pallas_shade import shade_tiles_pallas

    s = settings
    S, tp = s.image_size, s.tile_px
    g = S // tp
    seg_pack, anchor_px, e_demand, static = _pallas_prep(verts, topo, K, s)
    sil_tiles = shade_tiles_pallas(seg_pack, anchor_px, static)  # (B,T,tp,tp)
    B = verts.shape[0]
    sil = sil_tiles.reshape(B, g, g, tp, tp).transpose(0, 1, 3, 2, 4).reshape(
        B, S, S)
    return {"sil": sil, "edge_demand": e_demand, "edge_capacity": static[5]}


@partial(jax.jit, static_argnames=("settings", "with_depth"))
def _rasterize_soft(verts, topo: MeshTopology, K,
                    settings: RasterSettings, with_depth: bool):
    s = settings
    S, tp = s.image_size, s.tile_px
    assert S % tp == 0, "image_size must be a multiple of tile_px"
    g = S // tp
    pix = _tile_pixel_centers(S, tp)  # (T, P, 2)
    margin = s.bin_margin_px / S
    cap2 = margin * margin  # distance saturation for missing candidates
    ys_all = (jnp.arange(S) + 0.5) / S  # pixel-row centers

    def render_one(v, k):
        uv, z = project_ndc(v[None], k[None])
        uv, z = uv[0], z[0]
        p0, p1, cross_sign, is_contour, flip, tri_uv, tri_z, f_valid = \
            _contour_data(uv, z, topo, s)
        seg = uv[topo.edges]  # (E, 2, 2) endpoints (u, v)

        # ---- Stage A: per-(tile-column, pixel-row) winding anchors over ALL
        # contour edges: crossings of the +x ray at x = tile right boundary.
        x_right = (jnp.arange(g, dtype=jnp.float32) + 1.0) * tp / S  # (g,)

        y0 = p0[:, 1][None, :]  # (1, E)
        y1 = p1[:, 1][None, :]
        py = ys_all[:, None]  # (S, 1)
        spans = (y0 <= py) != (y1 <= py)  # (S, E)
        t = (py - y0) / jnp.where(jnp.abs(y1 - y0) > 1e-12, y1 - y0, 1.0)
        x_int = p0[:, 0][None, :] + t * (p1[:, 0] - p0[:, 0])[None, :]  # (S, E)
        # anchors: (g, S) = sum over E of sign where x_int > x_right
        contrib = jnp.where(spans, cross_sign[None, :], 0.0)  # (S, E)
        anchors = jnp.einsum(
            "se,gse->gs", contrib,
            (x_int[None] > x_right[:, None, None]).astype(jnp.float32))

        e_idx, e_hit, e_demand = _bin_boxes(seg.min(1), seg.max(1),
                                            is_contour, s, s.edges_per_tile,
                                            margin=margin, with_demand=True)

        tile_gx = (jnp.arange(g * g) % g)  # tile -> column index

        def shade_tile(px_, ei, eh, anchor_col, x1):
            # Local oriented crossings in (px, x1]:
            q0 = p0[ei]  # (Ke, 2)
            q1 = p1[ei]
            pyv = px_[:, 1][:, None]  # (P, 1)
            sp = (q0[:, 1][None] <= pyv) != (q1[:, 1][None] <= pyv)  # (P, Ke)
            tt = (pyv - q0[:, 1][None]) / jnp.where(
                jnp.abs(q1[:, 1] - q0[:, 1])[None] > 1e-12,
                (q1[:, 1] - q0[:, 1])[None], 1.0)
            xi = q0[:, 0][None] + tt * (q1[:, 0] - q0[:, 0])[None]
            sgn = (cross_sign[ei] * eh)[None]
            local = jnp.where(
                sp & (xi > px_[:, 0][:, None]) & (xi <= x1), sgn, 0.0)
            winding = anchor_col + local.sum(-1)  # (P,)
            covered = jnp.abs(winding) > 0.5

            d2 = _point_segment_dist2(px_[:, None, :], q0[None], q1[None])
            # Interior-dimming fix: a covered pixel's distance only counts
            # edges across which the winding would drop to 0 (the OUTER
            # silhouette boundary). Internal contour edges (winding w <-> w±1,
            # both covered) must not pull interior coverage below 1.
            # w_other = w - flip*sign(cross2d): flip is the winding jump
            # across the directed edge (front-face traversal orientation).
            cross2d = ((q1[:, 0] - q0[:, 0])[None] * (pyv - q0[:, 1][None])
                       - (q1[:, 1] - q0[:, 1])[None]
                       * (px_[:, 0][:, None] - q0[:, 0][None]))
            flip_e = (flip[ei] * is_contour[ei] * eh)[None]
            w_other = winding[:, None] - flip_e * jnp.sign(cross2d)
            # pixel exactly on the edge line: keep the edge (pre-fix behavior)
            rel = (jnp.abs(w_other) < 0.5) | (cross2d == 0)
            rel = rel | ~covered[:, None]
            d2 = jnp.where(eh[None, :] & rel, d2, cap2)
            d2 = jnp.minimum(d2.min(-1), cap2)
            signed = jnp.where(covered, d2, -d2)
            return jax.nn.sigmoid(signed / s.sigma)

        # anchor per tile: anchors[gx, row] for each pixel row of the tile
        rows = (jnp.arange(g * g) // g)[:, None] * tp + jnp.arange(tp)[None]
        anchor_tiles = anchors[tile_gx[:, None], rows]  # (T, tp)
        anchor_pix = jnp.repeat(anchor_tiles, tp, axis=1)  # (T, P) row-major
        x1_tiles = x_right[tile_gx][:, None]  # (T, 1)

        sil_t = jax.vmap(shade_tile)(pix, e_idx, e_hit, anchor_pix, x1_tiles)

        def untile(x):  # (T, P) -> (S, S)
            x = x.reshape(g, g, tp, tp)
            return x.transpose(0, 2, 1, 3).reshape(S, S)

        out = {"sil": untile(sil_t), "edge_demand": e_demand}
        if with_depth:
            f_idx, f_hit = _bin_boxes(tri_uv.min(1), tri_uv.max(1), f_valid,
                                      s, s.faces_per_tile, margin=0.5 / S)
            depth_t = jax.vmap(
                lambda px_, fi, fh: _face_depth(px_, tri_uv[fi], tri_z[fi],
                                                fh, s))(pix, f_idx, f_hit)
            out["depth"] = untile(depth_t)
        return out

    out = jax.vmap(render_one)(verts, K)
    out["edge_capacity"] = min(s.edges_per_tile, topo.edges.shape[0])
    return out


def rasterize_depth(verts: jnp.ndarray,
                    topology,
                    K: jnp.ndarray,
                    settings: RasterSettings = RasterSettings()):
    """Differentiable depth + hard coverage, skipping silhouette shading.

    The ordinal-depth loss (homan/lossutils.py:133-169) consumes the
    rendered depth (with gradients) and a HARD sil>0.5 gate; the soft
    silhouette's winding + edge-distance work is pure overhead there. This
    entry runs only the face-binning depth pass of `_rasterize_soft` —
    a hard z-buffer (matching NMR's depth render), and `covered`
    (= depth > 0) matches its sil > 0.5 up to the one-pixel soft band at
    the boundary. On TPU the shading runs as a fused Pallas kernel with a
    one-hot-matmul backward (render/pallas_depth.py); on CPU the pure-XLA
    formulation (same values to fp rounding).

    Returns dict: depth (B, S, S), covered (B, S, S) bool.
    """
    topo = as_topology(topology)
    use_pallas = settings.use_pallas
    if use_pallas is None:
        # Pallas only where Mosaic-TPU lowering exists (tpu / tpu-like
        # plugins); cpu AND gpu fall back to the equivalent XLA path.
        from homan_tpu.render.pallas_shade import is_tpu_backend
        use_pallas = is_tpu_backend()
    if use_pallas:
        return _rasterize_depth_pallas(verts, topo, K, settings)
    return _rasterize_depth(verts, topo, K, settings)


@partial(jax.jit, static_argnames=("settings",))
def _rasterize_depth_pallas(verts, topo: MeshTopology, K,
                            settings: RasterSettings):
    from homan_tpu.render.pallas_depth import depth_tiles_pallas

    s = settings
    S, tp = s.image_size, s.tile_px
    assert S % tp == 0, "image_size must be a multiple of tile_px"
    g = S // tp
    kf = min(s.faces_per_tile, topo.faces.shape[0])

    def prep(v, k):
        uv, z = project_ndc(v[None], k[None])
        uv, z = uv[0], z[0]
        if topo.vert_face_slots is None:
            tri_uv = uv[topo.faces]  # (F, 3, 2)
            tri_z = z[topo.faces]
        else:  # transpose-gather backward (no TPU scatter), see _gather_rows
            tri_uv = _gather_rows(uv, topo.faces, topo.vert_face_slots)
            tri_z = _gather_rows(z[:, None], topo.faces,
                                 topo.vert_face_slots)[..., 0]
        area = _edge_fn(tri_uv[:, 0, :], tri_uv[:, 1, :], tri_uv[:, 2, :])
        f_valid = (tri_z > s.znear).all(-1) & (jnp.abs(area) > 1e-12)
        f_idx, f_hit = _bin_boxes(tri_uv.min(1), tri_uv.max(1), f_valid,
                                  s, kf, margin=0.5 / S)

        # Line coefficients: e(p) = cross(b - a, p - a) = A px + B py + C.
        def line(a, b):
            A = -(b[:, 1] - a[:, 1])
            Bc = b[:, 0] - a[:, 0]
            C = (b[:, 1] - a[:, 1]) * a[:, 0] - (b[:, 0] - a[:, 0]) * a[:, 1]
            return A, Bc, C

        sgn = jnp.sign(area)
        rows, bary = [], []
        # e0 opposite v0 (edge v1->v2), e1 (v2->v0), e2 (v0->v1): matches
        # _face_depth's barycentric convention. Sign-folded for inside tests.
        for i, j in ((1, 2), (2, 0), (0, 1)):
            A, Bc, C = line(tri_uv[:, i], tri_uv[:, j])
            rows += [A * sgn, Bc * sgn, C * sgn]
            bary.append((A, Bc, C))
        inv_area = 1.0 / jnp.where(jnp.abs(area) > 1e-12, area, 1.0)
        zi = jnp.maximum(tri_z, 1e-6)  # (F, 3)
        # invz(p) = sum_i e_i(p)/area / z_i is linear: Az px + Bz py + Cz.
        for c in range(3):
            rows.append(sum(bary[i][c] / zi[:, i] for i in range(3))
                        * inv_area)
        feat = jnp.stack(rows, axis=0)  # (12, F)
        per_tile = feat[:, f_idx]  # (12, T, Kf)
        per_tile = jnp.moveaxis(per_tile, 0, 1)  # (T, 12, Kf)
        valid = f_hit.astype(jnp.float32)[:, None, :]  # (T, 1, Kf)
        zeros = jnp.zeros((g * g, 3, kf), jnp.float32)
        return jnp.concatenate([per_tile, valid, zeros], axis=1)  # (T,16,Kf)

    face_pack = jax.vmap(prep)(verts, K)
    static = (tp, S, g, kf)
    depth_t = depth_tiles_pallas(face_pack, static)  # (B, T, tp, tp)
    B = verts.shape[0]
    depth = depth_t.reshape(B, g, g, tp, tp).transpose(0, 1, 3, 2, 4) \
        .reshape(B, S, S)
    return {"depth": depth, "covered": depth > 0}


@partial(jax.jit, static_argnames=("settings",))
def _rasterize_depth(verts, topo: MeshTopology, K, settings: RasterSettings):
    s = settings
    S, tp = s.image_size, s.tile_px
    assert S % tp == 0, "image_size must be a multiple of tile_px"
    g = S // tp
    pix = _tile_pixel_centers(S, tp)  # (T, P, 2)

    def render_one(v, k):
        uv, z = project_ndc(v[None], k[None])
        uv, z = uv[0], z[0]
        tri_uv = uv[topo.faces]
        tri_z = z[topo.faces]
        area = _edge_fn(tri_uv[:, 0, :], tri_uv[:, 1, :], tri_uv[:, 2, :])
        f_valid = (tri_z > s.znear).all(-1) & (jnp.abs(area) > 1e-12)
        f_idx, f_hit = _bin_boxes(tri_uv.min(1), tri_uv.max(1), f_valid,
                                  s, s.faces_per_tile, margin=0.5 / S)
        depth_t = jax.vmap(
            lambda px_, fi, fh: _face_depth(px_, tri_uv[fi], tri_z[fi],
                                            fh, s))(pix, f_idx, f_hit)
        depth = depth_t.reshape(g, g, tp, tp).transpose(0, 2, 1, 3) \
            .reshape(S, S)
        return depth

    depth = jax.vmap(render_one)(verts, K)
    return {"depth": depth, "covered": depth > 0}


def rasterize_hard(verts: jnp.ndarray,
                   topology,
                   K: jnp.ndarray,
                   face_colors: jnp.ndarray | None = None,
                   settings: RasterSettings = RasterSettings(),
                   background: float = 1.0,
                   light_dir=(0.57735, 0.57735, -0.57735),
                   ambient: float = 0.55,
                   diffuse: float = 0.45,
                   shading: str = "phong",
                   specular: float = 0.2,
                   shininess: float = 32.0):
    """Hard z-buffer rasterization for visualization (non-differentiable).

    shading="phong" interpolates vertex normals per pixel (perspective
    -correct barycentrics) and adds a Blinn-Phong specular highlight — the
    look of the reference's pytorch3d eval renders (homan/viz/renderot.py:
    71-106 HardPhongShader path); "flat" keeps per-face Lambertian shading.

    Args:
      verts: (B, V, 3); topology: MeshTopology or (F, 3); K normalized.
      face_colors: (F, 3) flat colors; white if None.
    Returns:
      dict rgb (B, S, S, 3), depth (B, S, S), sil (B, S, S) bool.
    """
    return _rasterize_hard(verts, as_topology(topology).faces, K, face_colors,
                           settings, background, tuple(light_dir), ambient,
                           diffuse, shading, specular, shininess)


@partial(jax.jit, static_argnames=("settings", "background", "light_dir",
                                   "ambient", "diffuse", "shading",
                                   "specular", "shininess"))
def _rasterize_hard(verts, faces, K, face_colors, settings: RasterSettings,
                    background, light_dir, ambient, diffuse, shading,
                    specular, shininess):
    s = settings
    S, tp = s.image_size, s.tile_px
    assert S % tp == 0, "image_size must be a multiple of tile_px"
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
        raw_normals = jnp.cross(tri_3d[:, 1] - tri_3d[:, 0],
                                tri_3d[:, 2] - tri_3d[:, 0])
        normals = raw_normals / jnp.maximum(
            jnp.linalg.norm(raw_normals, axis=-1, keepdims=True), 1e-9)
        shade = ambient + diffuse * jnp.abs(normals @ light)  # two-sided
        # Area-weighted vertex normals for smooth (Phong) shading: the raw
        # cross product's magnitude (2x face area) IS the weight — the
        # pytorch3d convention the eval renders are matched against.
        vnorm = jnp.zeros_like(v)
        for ci in range(3):
            vnorm = vnorm.at[faces[:, ci]].add(raw_normals)
        vnorm = vnorm / jnp.maximum(
            jnp.linalg.norm(vnorm, axis=-1, keepdims=True), 1e-9)
        area = _edge_fn(tri_uv[:, 0, :], tri_uv[:, 1, :], tri_uv[:, 2, :])
        valid = (tri_z > s.znear).all(-1) & (jnp.abs(area) > 1e-12)
        idx, hit = _bin_boxes(tri_uv.min(1), tri_uv.max(1), valid, s,
                              s.faces_per_tile, margin=0.5 / S)

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
            w0, w1, w2 = e0 / denom, e1 / denom, e2 / denom  # screen bary
            inv_z = (w0 / jnp.maximum(tz[None, :, 0], 1e-6)
                     + w1 / jnp.maximum(tz[None, :, 1], 1e-6)
                     + w2 / jnp.maximum(tz[None, :, 2], 1e-6))
            z_pix = 1.0 / jnp.maximum(inv_z, 1e-6)
            z_buf = jnp.where(inside, z_pix, 1e6)
            best = jnp.argmin(z_buf, axis=-1)  # (P,)
            covered = jnp.take_along_axis(inside, best[:, None], -1)[:, 0]
            zsel = jnp.take_along_axis(z_buf, best[:, None], -1)[:, 0]
            face_sel = fidx[best]
            if shading == "phong":
                # Perspective-correct barycentrics of the winning face.
                def sel(w):
                    return jnp.take_along_axis(w, best[:, None], -1)[:, 0]
                tz_b = tz[best]  # (P, 3)
                bar = jnp.stack([sel(w0), sel(w1), sel(w2)], -1)
                bar = bar / jnp.maximum(tz_b, 1e-6)
                bar = bar / jnp.maximum(bar.sum(-1, keepdims=True), 1e-9)
                f_v = faces[face_sel]            # (P, 3) vertex ids
                n_pix = jnp.einsum("pc,pcd->pd", bar, vnorm[f_v])
                n_pix = n_pix / jnp.maximum(
                    jnp.linalg.norm(n_pix, axis=-1, keepdims=True), 1e-9)
                p3d = jnp.einsum("pc,pcd->pd", bar, v[f_v])
                view = -p3d / jnp.maximum(
                    jnp.linalg.norm(p3d, axis=-1, keepdims=True), 1e-9)
                half = light[None, :] + view
                half = half / jnp.maximum(
                    jnp.linalg.norm(half, axis=-1, keepdims=True), 1e-9)
                lam = ambient + diffuse * jnp.abs(n_pix @ light)
                spec = specular * jnp.abs(
                    jnp.einsum("pd,pd->p", n_pix, half)) ** shininess
                rgb = fcol[face_sel] * lam[:, None] + spec[:, None]
                rgb = jnp.clip(rgb, 0.0, 1.0)
            else:
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


def check_edge_budget(verts, topology, K,
                      settings: RasterSettings = RasterSettings()):
    """Host-side diagnostic: contour-edge demand vs edges_per_tile capacity.

    Edge-budget undersizing is CATASTROPHIC, not graceful: a contour edge
    dropped by the per-tile top-k corrupts the winding REGION behind it
    (whole areas of the silhouette flip), not just the soft distance band.
    Call this once at fit setup with representative poses; if max_demand
    approaches capacity, raise `edges_per_tile` (VMEM bounds it at ~96 for
    tile_px=128 at 256²).

    Args:
      verts: (B, V, 3) camera-space vertices (e.g. initial poses).
    Returns:
      dict: max_demand (max contour-edge candidates in any tile, over the
      batch), capacity, overflow (bool), utilization (max_demand/capacity).
    """
    s = settings
    topo = as_topology(topology)
    margin = s.bin_margin_px / s.image_size

    def demand_one(v, k):
        uv, z = project_ndc(v[None], k[None])
        uv, z = uv[0], z[0]
        _, _, _, is_contour, _, _, _, _ = _contour_data(uv, z, topo, s)
        seg = uv[topo.edges]
        overlap = _tile_overlap(seg.min(1), seg.max(1), is_contour, s,
                                margin)
        return overlap.sum(axis=1).max()

    demand = int(np.asarray(
        jax.vmap(demand_one)(jnp.asarray(verts), jnp.asarray(K))).max())
    capacity = min(s.edges_per_tile, int(topo.edges.shape[0]))
    return {
        "max_demand": demand,
        "capacity": capacity,
        "overflow": demand > capacity,
        "utilization": demand / max(capacity, 1),
    }


# Largest edges_per_tile whose fused Pallas shade kernel (fwd + analytic
# VJP) compiles on v5e at 256^2, per tile_px — measured by
# scripts/probe_edge_budget_ceiling.py (1280-face mesh, B=10, fwd+bwd):
#   tile128: ke 96 ok / 128 FAIL (the 16.32M > 16M VMEM case, NOTES_ROUND4)
#   tile64:  ke 192 ok / 256 FAIL
#   tile32:  ke 512 ok (largest probed; per-step cost grows ~linearly in ke)
# The kernel working set scales with tile_px^2 * ke (per-instance), so the
# envelope is image-size-free.
EDGE_BUDGET_VMEM_CEILING = {128: 96, 64: 192, 32: 512, 16: 512}

EDGE_BUCKETS = (48, 64, 96, 128, 192, 256, 384, 512)


def auto_edge_settings(verts, topology, K,
                       settings: RasterSettings = RasterSettings(),
                       safety: float = 1.3,
                       buckets=EDGE_BUCKETS) -> RasterSettings:
    """Size edges_per_tile (and, if needed, tile_px) to the measured demand.

    Measures per-tile contour-edge demand at the given poses
    (check_edge_budget — the exact binning predicate the renderer runs) and
    returns `settings` with edges_per_tile = the smallest bucket covering
    demand * safety. If even the largest VMEM-feasible bucket for this
    tile_px cannot cover it, halves tile_px (smaller tiles intersect fewer
    contour edges each) and re-measures; raises RuntimeError when tile_px=16
    still overflows — proceeding would converge to garbage (a dropped
    contour edge corrupts the winding REGION: measured 94% wrong silhouette
    pixels on the 1552-face hand at ke=32), so this must never be a warning.

    The safety factor covers pose motion during the fit: demand is measured
    at the INITIAL poses, and optimization brings the object closer /
    rotates denser contour regions into view. compute_sil_loss_object
    additionally reports the live per-iteration excess as the
    `edge_budget_excess` history metric — the backstop for fits whose
    motion exceeds the headroom.

    NMR parity note: the reference's CUDA rasterizer (homan/losses.py:73)
    has no such cliff — it loops all faces per pixel — so this auto-sizing
    is what keeps the TPU tiling an implementation detail rather than a
    semantic difference.
    """
    import dataclasses

    s = settings
    topo = as_topology(topology)
    n_edges = int(topo.edges.shape[0])
    while True:
        demand = check_edge_budget(verts, topo, K, s)["max_demand"]
        need = min(int(np.ceil(demand * safety)), n_edges)
        if min(s.edges_per_tile, n_edges) >= need:
            # Current settings already cover demand+headroom: keep them
            # unchanged so prewarmed executables (keyed on the settings
            # static) stay valid — never shrink below the configured value.
            return s
        ceiling = EDGE_BUDGET_VMEM_CEILING.get(s.tile_px, buckets[0])
        feasible = [b for b in buckets if b >= need and b <= ceiling]
        if feasible:
            return dataclasses.replace(s, edges_per_tile=feasible[0])
        if s.tile_px <= 16 or s.tile_px // 2 > s.image_size:
            raise RuntimeError(
                f"edge budget unsatisfiable: demand {demand} (need {need} "
                f"with {safety}x headroom) exceeds the VMEM ceiling "
                f"{ceiling} at tile_px={s.tile_px}; the mesh is too dense "
                f"for exact contour binning at image_size={s.image_size} — "
                f"decimate the mesh (cli/process_meshes) or lower rend_size")
        s = dataclasses.replace(s, tile_px=s.tile_px // 2)


def bump_edge_settings(settings: RasterSettings, demand: int,
                       safety: float = 1.3,
                       buckets=EDGE_BUCKETS) -> RasterSettings:
    """Next feasible settings covering a MEASURED mid-fit demand.

    Recovery path for the runtime backstop: auto_edge_settings sizes the
    budget at the initial poses with 1.3x headroom, but a fit whose motion
    exceeds that headroom reports a positive `edge_budget_excess` — the
    demand here is excess + old capacity, i.e. exact, so the re-run's
    budget is sized to what the fit actually needed (plus fresh headroom
    for its own motion). Unlike auto_edge_settings this never re-measures
    (the overflowing poses are gone with the discarded fit); the measured
    per-tile demand is a valid upper bound for smaller tiles too (a
    smaller tile intersects a subset of the edges). Raises the same
    RuntimeError when tile_px=16 cannot cover it — that case is genuinely
    unsatisfiable and must stay a hard failure.
    """
    import dataclasses

    s = settings
    need = int(np.ceil(demand * safety))
    while True:
        ceiling = EDGE_BUDGET_VMEM_CEILING.get(s.tile_px, buckets[0])
        feasible = [b for b in buckets
                    if b >= need and b <= ceiling and b > s.edges_per_tile]
        if feasible:
            return dataclasses.replace(s, edges_per_tile=feasible[0])
        if s.tile_px <= 16 or s.tile_px // 2 > s.image_size:
            raise RuntimeError(
                f"edge budget unsatisfiable mid-fit: measured demand "
                f"{demand} (need {need} with {safety}x headroom) exceeds "
                f"the VMEM ceiling {ceiling} at tile_px={s.tile_px}; "
                f"decimate the mesh (cli/process_meshes) or lower rend_size")
        s = dataclasses.replace(s, tile_px=s.tile_px // 2)
