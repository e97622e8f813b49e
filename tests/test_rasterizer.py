import jax
import jax.numpy as jnp
import numpy as np

from homan_tpu.core.meshes import icosphere
from homan_tpu.render import RasterSettings, rasterize_hard, rasterize_soft


# icosphere(2) has 320 faces; capacity 320 keeps binning complete while
# still exercising the tile-culling path (corner tiles select nothing).
SETTINGS = RasterSettings(image_size=64, tile_px=16, faces_per_tile=320)


def unit_K(b=1):
    """Normalized intrinsics: f=1, principal point at image center."""
    K = jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]])
    return jnp.tile(K[None], (b, 1, 1))


def sphere_scene(radius=0.25, z=1.0, b=1):
    v, f = icosphere(2, radius)
    verts = jnp.asarray(v)[None] + jnp.asarray([0.0, 0.0, z])
    return jnp.tile(verts, (b, 1, 1)), jnp.asarray(f)


def analytic_disk_mask(size, radius, z, cx=0.5, cy=0.5):
    """A sphere at distance z projects to a disk of angular radius ~ r/z."""
    r_im = radius / np.sqrt(z**2 - radius**2)  # true silhouette cone
    ys = (np.arange(size) + 0.5) / size
    xs = (np.arange(size) + 0.5) / size
    u, v = np.meshgrid(xs, ys)
    return ((u - cx) ** 2 + (v - cy) ** 2) <= r_im**2


def test_soft_silhouette_matches_analytic_disk():
    verts, faces = sphere_scene()
    out = rasterize_soft(verts, faces, unit_K(), SETTINGS)
    sil = np.asarray(out["sil"][0])
    assert sil.min() >= 0 and sil.max() <= 1
    ref = analytic_disk_mask(64, 0.25, 1.0)
    pred = sil > 0.5
    inter = (pred & ref).sum()
    union = (pred | ref).sum()
    assert inter / union > 0.93, f"IoU {inter/union}"


def test_soft_silhouette_differentiable_translation():
    """Moving the sphere right must increase coverage right of center."""
    verts, faces = sphere_scene()
    K = unit_K()

    def coverage_right(dx):
        v = verts + jnp.asarray([dx, 0.0, 0.0])
        sil = rasterize_soft(v, faces, K, SETTINGS)["sil"]
        return (sil[0, :, 40:] ** 2).sum()

    g = jax.grad(coverage_right)(0.0)
    assert np.isfinite(float(g))
    assert float(g) > 0.1, f"grad {g}"


def test_gradient_matches_finite_differences():
    verts, faces = sphere_scene()
    K = unit_K()
    target = np.asarray(
        analytic_disk_mask(64, 0.25, 1.0, cx=0.55, cy=0.5), np.float32)
    target = jnp.asarray(target)

    def loss(dx):
        v = verts + jnp.stack([dx, jnp.zeros_like(dx), jnp.zeros_like(dx)])
        sil = rasterize_soft(v, faces, K, SETTINGS)["sil"][0]
        return ((sil - target) ** 2).sum()

    g = float(jax.grad(loss)(jnp.asarray(0.01)))
    eps = 1e-3
    fd = (float(loss(jnp.asarray(0.01 + eps))) -
          float(loss(jnp.asarray(0.01 - eps)))) / (2 * eps)
    assert np.sign(g) == np.sign(fd)
    assert abs(g - fd) / (abs(fd) + 1e-6) < 0.35, f"autodiff {g} vs fd {fd}"


def test_silhouette_gradient_descends_to_target():
    """End-to-end sanity: SGD on the silhouette L2 recovers a translation."""
    verts, faces = sphere_scene()
    K = unit_K()
    true_offset = jnp.asarray([0.06, -0.04, 0.0])
    target = rasterize_soft(verts + true_offset, faces, K, SETTINGS)["sil"]

    def loss(off):
        sil = rasterize_soft(verts + off, faces, K, SETTINGS)["sil"]
        return ((sil - target) ** 2).sum()

    import optax
    opt = optax.adam(5e-3)
    off = jnp.zeros(3)
    state = opt.init(off)
    value_grad = jax.jit(jax.value_and_grad(loss))
    for _ in range(80):
        _, g = value_grad(off)
        updates, state = opt.update(g, state)
        off = optax.apply_updates(off, updates)
    err = np.abs(np.asarray(off - true_offset))
    assert err.max() < 0.01, f"recovered {off}, want {true_offset}"


def test_depth_values():
    verts, faces = sphere_scene(radius=0.25, z=1.0)
    out = rasterize_soft(verts, faces, unit_K(), SETTINGS, with_depth=True)
    depth = np.asarray(out["depth"][0])
    sil = np.asarray(out["sil"][0]) > 0.5
    center_depth = depth[32, 32]
    assert abs(center_depth - 0.75) < 0.03, center_depth  # front of sphere
    assert depth[sil].max() <= 1.005  # never behind the sphere center plane + eps
    assert (depth[~sil] == 0).all()


def test_behind_camera_culled():
    verts, faces = sphere_scene(z=-1.0)  # entirely behind the camera
    out = rasterize_soft(verts, faces, unit_K(), SETTINGS)
    assert float(out["sil"].max()) < 1e-3


def test_degenerate_padding_faces_ignored():
    verts, faces = sphere_scene()
    pad = jnp.zeros((50, 3), jnp.int32)  # degenerate (0,0,0) faces
    faces_padded = jnp.concatenate([faces, pad])
    a = rasterize_soft(verts, faces, unit_K(), SETTINGS)["sil"]
    b = rasterize_soft(verts, faces_padded, unit_K(), SETTINGS)["sil"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_batched_rendering_distinct_frames():
    verts, faces = sphere_scene(b=3)
    offsets = jnp.asarray([[0.0, 0, 0], [0.15, 0, 0], [-0.15, 0, 0]])
    out = rasterize_soft(verts + offsets[:, None, :], faces, unit_K(3), SETTINGS)
    sil = np.asarray(out["sil"])
    com_x = [(s > 0.5).nonzero()[1].mean() for s in sil]
    assert com_x[1] > com_x[0] > com_x[2]


def test_hard_raster_rgb_and_depth():
    verts, faces = sphere_scene()
    colors = jnp.tile(jnp.asarray([[1.0, 0.2, 0.1]]), (faces.shape[0], 1))
    out = rasterize_hard(verts, faces, unit_K(), colors, SETTINGS)
    rgb = np.asarray(out["rgb"][0])
    sil = np.asarray(out["sil"][0])
    assert rgb.shape == (64, 64, 3)
    # Background white, object reddish
    assert rgb[0, 0, 0] == 1.0 and rgb[0, 0, 1] == 1.0
    center = rgb[32, 32]
    assert center[0] > center[1] + 0.2
    ref = analytic_disk_mask(64, 0.25, 1.0)
    iou = (sil & ref).sum() / ((sil | ref).sum())
    assert iou > 0.93


def test_roi_intrinsics_shift():
    """A K with shifted principal point must shift the rendered object."""
    verts, faces = sphere_scene()
    K = jnp.asarray([[[1.0, 0, 0.25], [0, 1.0, 0.5], [0, 0, 1.0]]])
    sil = np.asarray(rasterize_soft(verts, faces, K, SETTINGS)["sil"][0])
    com_x = (sil > 0.5).nonzero()[1].mean() / 64
    assert abs(com_x - 0.25) < 0.03


def test_interior_pixels_fully_covered_with_internal_contours():
    """Pixels near INTERNAL contour edges (self-occlusion, winding 1<->2)
    must render at full coverage; only the outer silhouette boundary may
    have a soft band (round-1 interior-dimming bias, NOTES item 4)."""
    from scipy.ndimage import binary_erosion

    from homan_tpu.render.rasterizer import MeshTopology

    va, fa = icosphere(2, 0.5)
    vb = va + np.array([0.3, 0.0, 0.4], np.float32)  # behind, overlapping
    verts = np.concatenate([va + [0, 0, 1.0], vb + [0, 0, 1.0]])
    faces = np.concatenate([fa, fa + va.shape[0]])
    topo = MeshTopology.from_faces(faces)
    K = jnp.asarray(np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]],
                             np.float32))[None]
    S = 128
    for use_pallas in (False, True):
        settings = RasterSettings(image_size=S, tile_px=32,
                                  edges_per_tile=192, use_pallas=use_pallas)
        sil = np.asarray(rasterize_soft(
            jnp.asarray(verts, jnp.float32)[None], topo, K,
            settings)["sil"][0])
        covered = sil > 0.5
        interior = binary_erosion(covered, iterations=4)
        assert interior.sum() > 500  # the spheres do fill the frame
        assert sil[interior].min() >= 0.99, (
            use_pallas, sil[interior].min())


def test_check_edge_budget():
    """Diagnostic: demand below capacity on the sphere; overflow flagged
    when the budget is made artificially tiny."""
    from homan_tpu.render.rasterizer import check_edge_budget
    verts, faces = sphere_scene()
    ok = check_edge_budget(verts, faces, unit_K(), SETTINGS)
    assert not ok["overflow"], ok
    assert 0 < ok["max_demand"] <= ok["capacity"]
    import dataclasses
    tiny = dataclasses.replace(SETTINGS, edges_per_tile=2)
    bad = check_edge_budget(verts, faces, unit_K(), tiny)
    assert bad["overflow"] and bad["utilization"] > 1


def test_edge_budget_excess_metric_runtime():
    """The renderer reports per-iteration binning demand: excess <= 0 when
    the budget covers the contour, > 0 when edges were dropped — the
    dynamic guard behind auto_edge_settings (demand is re-measured every
    optimization step, not just at setup)."""
    import dataclasses
    verts, faces = sphere_scene()
    out = rasterize_soft(verts, faces, unit_K(), SETTINGS)
    assert int(out["edge_demand"].max()) <= int(out["edge_capacity"])
    tiny = dataclasses.replace(SETTINGS, edges_per_tile=2)
    out_bad = rasterize_soft(verts, faces, unit_K(), tiny)
    assert int(out_bad["edge_demand"].max()) > int(out_bad["edge_capacity"])
    # and through the loss metrics (what lands in the fit history)
    from homan_tpu.fit.losses import compute_sil_loss_object
    ref = jnp.zeros((1, 64, 64))
    keep = jnp.ones((1, 64, 64))
    _, m_ok = compute_sil_loss_object(verts, faces, unit_K(), ref, keep,
                                      SETTINGS)
    _, m_bad = compute_sil_loss_object(verts, faces, unit_K(), ref, keep,
                                       tiny)
    assert float(m_ok["edge_budget_excess"]) <= 0
    assert float(m_bad["edge_budget_excess"]) > 0


def test_auto_edge_settings_keeps_sufficient_default():
    """A sparse mesh under the default budget returns the settings object
    unchanged (prewarmed executables stay valid)."""
    from homan_tpu.render.rasterizer import auto_edge_settings
    verts, faces = sphere_scene()
    sized = auto_edge_settings(verts, faces, unit_K(), SETTINGS)
    assert sized == SETTINGS


def test_auto_edge_settings_dense_mesh_exact():
    """Dense-mesh regression (VERDICT r3 weak #2): a 5120-face mesh
    overflows the default edge budget; auto_edge_settings buckets up and
    the sized render matches the unlimited-budget reference EXACTLY —
    while the default budget provably corrupts the silhouette."""
    import dataclasses

    from homan_tpu.core.meshes import bumpy_potato
    from homan_tpu.render.rasterizer import (auto_edge_settings,
                                             check_edge_budget)

    v, f = bumpy_potato(4, 0.45, seed=5)  # 2562 verts / 5120 faces
    # z=4.5: the whole (dense) contour concentrates into a few tiles —
    # measured demand 113 vs capacity 48 (the overflow shape that matters
    # in practice: it is proximity of contour edges PER TILE, not face
    # count, that busts the budget).
    verts = jnp.asarray(v)[None] + jnp.asarray([0.0, 0.0, 4.5])
    faces = jnp.asarray(f)
    s = RasterSettings(image_size=128, tile_px=32, edges_per_tile=48)
    budget = check_edge_budget(verts, faces, unit_K(), s)
    assert budget["overflow"], (
        "test mesh must overflow the small budget to be a regression test: "
        f"{budget}")

    sized = auto_edge_settings(verts, faces, unit_K(), s)
    assert sized.edges_per_tile > s.edges_per_tile
    assert sized.edges_per_tile >= budget["max_demand"]

    full = dataclasses.replace(
        sized, edges_per_tile=int(jnp.asarray(faces).shape[0] * 2))
    sil_sized = np.asarray(rasterize_soft(verts, faces, unit_K(),
                                          sized)["sil"])
    sil_full = np.asarray(rasterize_soft(verts, faces, unit_K(),
                                         full)["sil"])
    np.testing.assert_allclose(sil_sized, sil_full, atol=1e-6)

    # the undersized budget really is catastrophic (winding corruption):
    # fraction of the true silhouette mispredicted, not of all pixels
    # (the distant blob covers few pixels)
    sil_bad = np.asarray(rasterize_soft(verts, faces, unit_K(), s)["sil"])
    true_sil = sil_full > 0.5
    frac_wrong = (((sil_bad > 0.5) != true_sil).sum()
                  / max(true_sil.sum(), 1))
    assert frac_wrong > 0.05, f"expected corruption, got {frac_wrong}"


def test_rasterize_depth_matches_soft_depth_path():
    """rasterize_depth returns the SAME depth as the with_depth soft path
    (it runs the identical face pass) and a hard coverage gate that agrees
    with sil > 0.5 away from the one-pixel soft boundary band."""
    from homan_tpu.render import rasterize_depth

    verts, faces = sphere_scene(radius=0.25, z=1.0, b=2)
    soft = rasterize_soft(verts, faces, unit_K(2), SETTINGS, with_depth=True)
    only = rasterize_depth(verts, faces, unit_K(2), SETTINGS)
    np.testing.assert_array_equal(np.asarray(soft["depth"]),
                                  np.asarray(only["depth"]))
    sil_hard = np.asarray(soft["sil"]) > 0.5
    covered = np.asarray(only["covered"])
    disagree = sil_hard != covered
    assert disagree.mean() < 0.01  # only boundary pixels may differ
    # gradients flow through depth: d(sum depth)/dz > 0 over covered pixels
    g = jax.grad(lambda v: rasterize_depth(v, faces, unit_K(2),
                                           SETTINGS)["depth"].sum())(verts)
    assert float(jnp.abs(g).sum()) > 0


def test_pallas_depth_matches_xla_depth():
    """The fused Pallas depth kernel (interpret mode on CPU) reproduces the
    pure-XLA hard z-buffer — values AND vertex gradients — on a two-frame
    sphere batch. Both paths bin identically; only the shading + backward
    formulation differs (linear plane coefficients + one-hot matmul vs
    per-pair autodiff)."""
    import dataclasses
    from homan_tpu.render import rasterize_depth

    verts, faces = sphere_scene(radius=0.25, z=1.0, b=2)
    verts = verts + jnp.asarray([[[0.02, -0.01, 0.0]], [[-0.03, 0.02, 0.1]]])
    K = unit_K(2)
    xla_s = dataclasses.replace(SETTINGS, use_pallas=False)
    pls_s = dataclasses.replace(SETTINGS, use_pallas=True)

    out_x = rasterize_depth(verts, faces, K, xla_s)
    out_p = rasterize_depth(verts, faces, K, pls_s)
    np.testing.assert_array_equal(np.asarray(out_x["covered"]),
                                  np.asarray(out_p["covered"]))
    # The kernel evaluates edge functions from expanded plane coefficients
    # (A px + B py + C): the ~1e-7 absolute rounding on C becomes ~1e-4
    # RELATIVE on barycentrics after division by small face areas. Same
    # order as the bf16 matmul noise accepted in the shade backward; the
    # ordinal-depth consumer compares depths at the 1e-2 scale.
    np.testing.assert_allclose(np.asarray(out_x["depth"]),
                               np.asarray(out_p["depth"]), atol=1e-3)

    def loss(v, s):
        d = rasterize_depth(v, faces, K, s)["depth"]
        return (d * (d > 0) * jnp.linspace(0.5, 1.5, d.shape[-1])).sum()

    g_x = jax.grad(loss)(verts, xla_s)
    g_p = jax.grad(loss)(verts, pls_s)
    assert float(jnp.abs(g_x).sum()) > 0
    gx, gp = np.asarray(g_x), np.asarray(g_p)
    rel = np.abs(gx - gp).max() / np.abs(gx).max()
    assert rel < 5e-3, f"relative gradient deviation {rel}"


def _topology_loop_oracle(f):
    """The original per-face loop formulation of MeshTopology construction,
    kept as the semantic oracle for the vectorized _build_from_faces."""
    f = np.asarray(f, np.int64)
    good = ((f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2])
            & (f[:, 0] != f[:, 2]))
    edge_map = {}
    for fi in np.nonzero(good)[0]:
        a, b, c = f[fi]
        for u, v in ((a, b), (b, c), (c, a)):
            key = (min(u, v), max(u, v))
            slot = edge_map.setdefault(key, [])
            if len(slot) < 2:
                slot.append(int(fi))
    if edge_map:
        edges = np.array(sorted(edge_map.keys()), np.int64)
        adj = np.full((len(edges), 2), -1, np.int64)
        for i, key in enumerate(map(tuple, edges)):
            adj[i, : len(edge_map[key])] = edge_map[key]
    else:
        edges = np.zeros((1, 2), np.int64)
        adj = np.full((1, 2), -1, np.int64)
    dir_f1 = np.zeros(len(edges), bool)
    for i, (u, v) in enumerate(edges):
        fi = adj[i, 0]
        if fi < 0:
            continue
        a, b, c = f[fi]
        dir_f1[i] = (a, b) == (u, v) or (b, c) == (u, v) or (c, a) == (u, v)
    return edges, adj, dir_f1


def test_topology_vectorized_matches_loop_oracle():
    from homan_tpu.core.mano import ManoLayer
    from homan_tpu.core.meshes import bumpy_potato
    from homan_tpu.render.rasterizer import MeshTopology

    layer = ManoLayer.synthetic(0)
    cases = {
        "icosphere": icosphere(2, 1.0)[1],
        "potato": bumpy_potato(3, 0.1, seed=1)[1],
        "open_hand": np.asarray(layer.faces("right")),  # boundary edges
        "left_hand": np.asarray(layer.faces("left")),   # mirrored winding
    }
    # Degenerate padding rows + a duplicated face (non-manifold edge pair)
    pot = np.asarray(cases["potato"])
    cases["padded_dup"] = np.concatenate(
        [pot, pot[:1], np.zeros((5, 3), np.int64)])
    cases["all_degenerate"] = np.zeros((4, 3), np.int64)

    for name, faces in cases.items():
        edges, adj, dir_f1 = _topology_loop_oracle(faces)
        topo = MeshTopology._build_from_faces(np.asarray(faces, np.int64))
        np.testing.assert_array_equal(np.asarray(topo.edges), edges, err_msg=name)
        np.testing.assert_array_equal(np.asarray(topo.edge_faces), adj,
                                      err_msg=name)
        np.testing.assert_array_equal(np.asarray(topo.edge_dir_f1), dir_f1,
                                      err_msg=name)


def test_gather_rows_transpose_backward_matches_scatter():
    """_gather_rows (transpose-gather VJP) == plain-gather scatter VJP.

    Forward must be bit-identical; the backward's per-vertex summation
    order differs from XLA's scatter-add, so cotangents match to float
    tolerance. Covers open meshes (boundary edges) and the degenerate
    single-edge topology, plus vmap (the renderer applies it per frame).
    """
    from homan_tpu.core.mano import ManoLayer
    from homan_tpu.core.meshes import bumpy_potato
    from homan_tpu.render.rasterizer import MeshTopology, _gather_rows

    layer = ManoLayer.synthetic(0)
    cases = [
        bumpy_potato(2, 0.1, seed=3)[1],
        np.asarray(layer.faces("right")),
        np.zeros((4, 3), np.int64),  # all-degenerate: 1 placeholder edge
    ]
    for faces in cases:
        topo = MeshTopology._build_from_faces(np.asarray(faces, np.int64))
        n_v = max(int(np.asarray(faces).max()) + 1, 4)
        rng = np.random.default_rng(0)
        u = jnp.asarray(rng.standard_normal((n_v, 2)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal(
            (topo.edges.shape[0], 2, 2)).astype(np.float32))

        wf = jnp.asarray(rng.standard_normal(
            (np.asarray(faces).shape[0], 3, 2)).astype(np.float32))

        def loss_fast(x):
            return (jnp.sum(_gather_rows(x, topo.edges,
                                         topo.vert_edge_slots) * w)
                    + jnp.sum(_gather_rows(x, topo.faces,
                                           topo.vert_face_slots) * wf))

        def loss_ref(x):
            return jnp.sum(x[topo.edges] * w) + jnp.sum(x[topo.faces] * wf)

        f_fast, g_fast = jax.value_and_grad(loss_fast)(u)
        f_ref, g_ref = jax.value_and_grad(loss_ref)(u)
        assert float(f_fast) == float(f_ref)
        # atol: the synthetic hand topology has a degree-97 hub vertex;
        # the per-vertex sum reassociation shifts its cotangent ~5e-6.
        np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                                   rtol=1e-5, atol=2e-5)

    # vmap over a batch axis, jitted (the renderer's usage shape)
    topo = MeshTopology._build_from_faces(
        np.asarray(bumpy_potato(2, 0.1, seed=3)[1], np.int64))
    rng = np.random.default_rng(1)
    ub = jnp.asarray(rng.standard_normal((5, 163, 2)).astype(np.float32))
    wb = jnp.asarray(rng.standard_normal(
        (5, topo.edges.shape[0], 2, 2)).astype(np.float32))

    def batch_loss(gather):
        def one(x, ww):
            return jnp.sum(gather(x) * ww)
        return jnp.sum(jax.vmap(one)(ub, wb))

    g_fast = jax.jit(jax.grad(lambda q: batch_loss(
        lambda x: _gather_rows(x + q, topo.edges,
                               topo.vert_edge_slots))))(jnp.float32(0))
    g_ref = jax.jit(jax.grad(lambda q: batch_loss(
        lambda x: (x + q)[topo.edges])))(jnp.float32(0))
    np.testing.assert_allclose(float(g_fast), float(g_ref), rtol=1e-5)


def test_pallas_vs_xla_fuzz_random_scenes():
    """Property test: the Pallas prep+kernels (interpret mode on CPU) match
    the XLA formulation across random meshes, poses, intrinsics, tile
    sizes, and edge budgets — coverage (sil > 0.5) identical, soft values
    to 1e-4 (argmin ties between near-equidistant contour edges can
    resolve differently between the two independent formulations; the
    1e-12 d^2 difference is amplified by /sigma to ~3e-8 in the output),
    vertex gradients allclose. Pins the one-hot MXU binning / fused
    anchors / transpose-gather prep rework against the independent XLA
    path; a winding/binning regression shows up as O(1) region errors.
    """
    import dataclasses

    from homan_tpu.core.meshes import bumpy_potato, icosphere
    from homan_tpu.render.rasterizer import MeshTopology

    rng = np.random.default_rng(7)
    cases = [
        # (mesh, image_size, tile_px, edges_per_tile)
        (bumpy_potato(2, 0.15, seed=1), 64, 16, 32),
        (bumpy_potato(3, 0.05, seed=2), 128, 64, 48),
        (icosphere(1, 1.0), 64, 32, 16),
        (bumpy_potato(2, 0.3, seed=3), 96, 32, 64),
    ]
    for (v, f), S, tp, ke in cases:
        topo = MeshTopology.from_faces(np.asarray(f))
        B = 3
        scale = rng.uniform(0.2, 0.5)
        offs = rng.uniform(-0.15, 0.15, (B, 1, 3)).astype(np.float32)
        z = rng.uniform(0.8, 1.6)
        verts = jnp.asarray(scale * np.asarray(v)[None]
                            + np.array([0, 0, z], np.float32) + offs)
        fx = rng.uniform(0.7, 1.3)
        cx, cy = rng.uniform(0.35, 0.65, 2)
        K = jnp.tile(jnp.asarray([[fx, 0, cx], [0, fx, cy], [0, 0, 1.0]],
                                 jnp.float32)[None], (B, 1, 1))
        base = RasterSettings(image_size=S, tile_px=tp, edges_per_tile=ke)
        outs, grads = {}, {}
        for up in (False, True):
            s = dataclasses.replace(base, use_pallas=up)

            def loss(vv, _s=s):
                return jnp.sum(rasterize_soft(vv, topo, K, _s)["sil"] ** 2)

            sil = rasterize_soft(verts, topo, K, s)["sil"]
            outs[up] = np.asarray(sil)
            grads[up] = np.asarray(jax.grad(loss)(verts))
        tag = f"S={S} tp={tp} ke={ke} F={f.shape[0]}"
        np.testing.assert_array_equal(outs[True] > 0.5, outs[False] > 0.5,
                                      err_msg=tag)
        np.testing.assert_allclose(outs[True], outs[False], atol=1e-4,
                                   err_msg=tag)
        scale_g = max(np.abs(grads[False]).max(), 1e-9)
        np.testing.assert_allclose(grads[True] / scale_g,
                                   grads[False] / scale_g,
                                   atol=2e-5, err_msg=tag)


def test_bump_edge_settings_ladder():
    """Mid-fit overflow recovery (VERDICT r4 missing #3): bump_edge_settings
    must pick the next feasible bucket covering measured demand + headroom,
    halve tile_px past the VMEM ceiling, and raise only at tile_px=16."""
    import dataclasses

    import pytest
    from homan_tpu.render.rasterizer import (EDGE_BUDGET_VMEM_CEILING,
                                             RasterSettings,
                                             bump_edge_settings)

    s = RasterSettings(image_size=256, tile_px=128, edges_per_tile=48)
    # demand 60 -> need 78 -> bucket 96 (<= tile128 ceiling 96)
    b = bump_edge_settings(s, 60)
    assert (b.edges_per_tile, b.tile_px) == (96, 128)
    # demand 90 -> need 117 > tile128 ceiling 96 -> tile 64, bucket 128
    b = bump_edge_settings(s, 90)
    assert (b.edges_per_tile, b.tile_px) == (128, 64)
    # capacity must strictly INCREASE even when the old value is a bucket
    s2 = dataclasses.replace(s, edges_per_tile=96)
    b = bump_edge_settings(s2, 70)  # need 91 <= 96 but 96 is not a bump
    assert b.edges_per_tile > 96
    # unsatisfiable: past every ceiling at tile 16
    s3 = RasterSettings(image_size=256, tile_px=16, edges_per_tile=512)
    with pytest.raises(RuntimeError):
        bump_edge_settings(s3, 600)
