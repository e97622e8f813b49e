import jax
import jax.numpy as jnp
import numpy as np

from homan_tpu.core.meshes import icosphere
from homan_tpu.interactions import (
    batch_pairwise_dist2,
    compute_contact_loss,
    grid_sample_3d,
    masked_mean_loss,
    sdf_scene_loss,
    voxelize_interior_sdf,
)


def test_sphere_sdf_values():
    """Interior SDF of a unit-ish sphere: phi ~ r_sphere - |x| inside, 0 outside."""
    v, f = icosphere(3, 0.8)
    phi = np.asarray(voxelize_interior_sdf(
        jnp.asarray(v)[None], jnp.asarray(f), grid_size=32)[0])
    g = 32
    axis = -1.0 + (2.0 * np.arange(g) + 1.0) / g
    gx, gy, gz = np.meshgrid(axis, axis, axis, indexing="ij")
    r = np.sqrt(gx**2 + gy**2 + gz**2)
    expected = np.maximum(0.8 - r, 0.0)
    # Ignore the shell near the surface where discretization dominates
    core = r < 0.6
    outside = r > 0.95
    assert np.abs(phi[core] - expected[core]).max() < 0.05
    assert phi[outside].max() == 0.0
    assert phi.min() >= 0.0


def test_grid_sample_matches_manual_trilinear():
    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.rand(1, 8, 8, 8).astype(np.float32))
    # At exact cell centers, sampling returns the cell value
    g = 8
    idx = np.array([[2, 3, 4], [5, 1, 6]])
    coords = (2.0 * idx + 1.0) / g - 1.0
    out = np.asarray(grid_sample_3d(vol, jnp.asarray(coords[None], jnp.float32)))
    expected = np.asarray(vol[0])[idx[:, 0], idx[:, 1], idx[:, 2]]
    np.testing.assert_allclose(out[0], expected, atol=1e-6)


def test_grid_sample_zero_outside():
    vol = jnp.ones((1, 8, 8, 8))
    coords = jnp.asarray([[[1.5, 0.0, 0.0], [0.0, -1.6, 0.0]]])
    out = np.asarray(grid_sample_3d(vol, coords))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_grid_sample_gradient_wrt_coords():
    g = 8
    axis = -1.0 + (2.0 * np.arange(g) + 1.0) / g
    gx = np.meshgrid(axis, axis, axis, indexing="ij")[0]
    vol = jnp.asarray(gx[None].astype(np.float32))  # value = x coordinate

    def f(c):
        return grid_sample_3d(vol, c[None, None])[0, 0]

    grad = np.asarray(jax.grad(f)(jnp.asarray([0.1, 0.2, -0.3])))
    # d(value)/dx should be ~1 (the volume IS x), others ~0
    assert abs(grad[0] - 1.0) < 1e-4
    assert abs(grad[1]) < 1e-4 and abs(grad[2]) < 1e-4


def test_sdf_scene_loss_detects_penetration():
    v, f = icosphere(2, 0.5)
    f = jnp.asarray(f)
    a = jnp.asarray(v)[None]
    b_far = a + jnp.asarray([2.0, 0.0, 0.0])
    b_pen = a + jnp.asarray([0.3, 0.0, 0.0])
    loss_far, _ = sdf_scene_loss([a, b_far], [f, f])
    loss_pen, meta = sdf_scene_loss([a, b_pen], [f, f])
    assert float(loss_far) < 1e-4
    assert float(loss_pen) > 0.1
    assert meta["dist_values"][(0, 1)].shape == (1, v.shape[0])


def test_sdf_loss_gradient_pushes_apart():
    v, f = icosphere(2, 0.5)
    f = jnp.asarray(f)
    a = jnp.asarray(v)[None]

    def loss(dx):
        b = a + jnp.stack([dx, jnp.zeros_like(dx), jnp.zeros_like(dx)])
        val, _ = sdf_scene_loss([a, b], [f, f])
        return val

    # Shallow overlap: sum-of-SDF is only monotone once vertices are past the
    # penetrated object's center (same shape as the reference loss).
    g = float(jax.grad(loss)(jnp.asarray(0.55)))
    assert g < -1e-3, f"gradient should push the spheres apart, got {g}"


def test_pairwise_dist2():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 5, 3).astype(np.float32)
    y = rng.randn(2, 7, 3).astype(np.float32)
    d2 = np.asarray(batch_pairwise_dist2(jnp.asarray(x), jnp.asarray(y)))
    ref = ((x[:, :, None] - y[:, None]) ** 2).sum(-1)
    np.testing.assert_allclose(d2, ref, atol=1e-4)


def test_masked_mean_loss_empty_mask():
    d = jnp.ones((2, 4))
    assert float(masked_mean_loss(d, jnp.zeros((2, 4), bool))) == 0.0
    assert float(masked_mean_loss(d, jnp.ones((2, 4), bool))) == 1.0


def test_contact_loss_reference_quirk_and_strict():
    """Default mode reproduces the reference (attraction term = 0, repulsion
    over all verts); strict mode separates exterior/interior."""
    v, f = icosphere(2, 0.1)
    f = jnp.asarray(f)
    hand = jnp.asarray(v)[None] + jnp.asarray([0.25, 0.0, 0.0])
    obj = jnp.asarray(v)[None]

    missed, penetr, info, metrics = compute_contact_loss(hand, f, obj, f)
    assert float(missed) == 0.0  # exterior always empty in reference mode
    assert bool(info["repulsion_masks"].all())
    assert float(penetr) > 0.0

    missed_s, penetr_s, info_s, _ = compute_contact_loss(
        hand, f, obj, f, strict_exterior=True)
    # Separated spheres: all exterior -> attraction active, repulsion empty
    assert bool(info_s["attraction_masks"].any())
    assert float(penetr_s) == 0.0


def test_contact_loss_strict_detects_penetration():
    v, f = icosphere(2, 0.2)
    f = jnp.asarray(f)
    hand = jnp.asarray(v)[None] + jnp.asarray([0.1, 0.0, 0.0])  # overlapping
    obj = jnp.asarray(v)[None]
    _, penetr, info, metrics = compute_contact_loss(
        hand, f, obj, f, strict_exterior=True)
    assert bool(info["repulsion_masks"].any())
    assert float(penetr) > 0.0
    assert float(metrics["max_penetr"]) > 0.0


def test_pallas_voxelizer_matches_xla():
    """Pallas SDF voxelizer (interpret mode on CPU) vs the XLA formulation."""
    from homan_tpu.interactions.pallas_sdf import voxelize_interior_sdf_pallas
    v, f = icosphere(2, 0.7)
    verts = jnp.asarray(v)[None]
    faces = jnp.asarray(f)
    phi_xla = voxelize_interior_sdf(verts, faces, grid_size=16)
    phi_pal = voxelize_interior_sdf_pallas(verts, faces, grid_size=16)
    np.testing.assert_allclose(np.asarray(phi_pal), np.asarray(phi_xla),
                               atol=1e-5)


def test_hoisted_grids_match_standalone_terms():
    """compute_all_losses' shared-grid collision/contact equal the standalone
    per-term computations (voxelize-once hoist is exact)."""
    import jax.numpy as jnp

    from homan_tpu.fit import losses as L
    from homan_tpu.core.meshes import icosphere

    v, f = icosphere(2, 0.2)
    f = jnp.asarray(f)
    B = 3
    rng = np.random.RandomState(0)
    hand = jnp.asarray(v)[None] + jnp.asarray(
        rng.randn(B, 1, 3).astype(np.float32) * 0.05 + [[[0.1, 0, 0]]])
    obj = jnp.asarray(v)[None] + jnp.zeros((B, 1, 3), np.float32)

    grids, hand_list = L.build_interaction_grids(hand, obj, f, f, hand_nb=1)
    col_shared = L.compute_collision_loss(
        hand, jax.lax.stop_gradient(obj), f, f, hand_nb=1,
        grids=grids, hand_verts=hand_list)
    con_shared = L.compute_contact_loss_term(
        hand, obj, f, f, hand_nb=1, grids=grids, hand_verts=hand_list)

    col_solo = L.compute_collision_loss(
        hand, jax.lax.stop_gradient(obj), f, f, hand_nb=1)
    con_solo = L.compute_contact_loss_term(hand, obj, f, f, hand_nb=1)

    np.testing.assert_allclose(float(col_shared["loss_collision"]),
                               float(col_solo["loss_collision"]), rtol=1e-6)
    np.testing.assert_allclose(float(con_shared["loss_contact"]),
                               float(con_solo["loss_contact"]), rtol=1e-6)


def test_interior_sdf_at_points_matches_analytic():
    """Direct interior SDF on a sphere: r_sphere - |q| inside, 0 outside."""
    from homan_tpu.interactions.sdf import interior_sdf_at_points
    v, f = icosphere(3, 0.8)
    rng = np.random.RandomState(0)
    q = rng.uniform(-1, 1, (1, 256, 3)).astype(np.float32)
    phi = np.asarray(interior_sdf_at_points(
        jnp.asarray(q), jnp.asarray(v)[None], jnp.asarray(f)))[0]
    r = np.linalg.norm(q[0], axis=-1)
    expected = np.maximum(0.8 - r, 0.0)
    # exact everywhere except the icosphere-vs-sphere discretization shell
    sel = np.abs(r - 0.8) > 0.05
    assert np.abs(phi[sel] - expected[sel]).max() < 0.02
    assert (phi[r > 0.85] == 0).all()


def test_interior_sdf_gradient_is_unit_direction():
    from homan_tpu.interactions.sdf import interior_sdf_at_points
    v, f = icosphere(3, 0.8)
    vj, fj = jnp.asarray(v)[None], jnp.asarray(f)

    def phi(q):
        return interior_sdf_at_points(q[None, None], vj, fj)[0, 0]

    g = np.asarray(jax.grad(phi)(jnp.asarray([0.3, 0.1, -0.2])))
    q = np.array([0.3, 0.1, -0.2])
    # For a sphere, grad of (R - |q|) = -q/|q|
    np.testing.assert_allclose(g, -q / np.linalg.norm(q), atol=0.03)


def test_interior_sdf_argmin_gather_equals_dense():
    """The argmin-gather form (dense sweep under stop_gradient + one
    differentiable face per query) must reproduce the dense min exactly in
    value and to fp tolerance in gradient — the backward shortcut must not
    change semantics."""
    from homan_tpu.interactions.sdf import (interior_sdf_at_points,
                                            _point_triangle_dist2,
                                            _ray_z_crossings)

    @jax.jit
    def dense_direct(query, verts, faces):
        verts = jax.lax.stop_gradient(verts)

        def one(q, v):
            tri = v[faces]
            a, b, c = tri[None, :, 0], tri[None, :, 1], tri[None, :, 2]
            p = q[:, None, :]
            d2 = _point_triangle_dist2(p, a, b, c).min(-1)
            inside = _ray_z_crossings(jax.lax.stop_gradient(p), a, b, c)
            return jnp.where(inside, jnp.sqrt(jnp.maximum(d2, 1e-20)), 0.0)

        return jax.vmap(one)(query, verts)

    v, f = icosphere(2, 0.5)
    rng = np.random.RandomState(1)
    verts = jnp.asarray(v[None] + 0.02 * rng.randn(2, v.shape[0], 3),
                        jnp.float32)
    faces = jnp.asarray(f)
    query = jnp.asarray(rng.uniform(-0.7, 0.7, (2, 128, 3)), jnp.float32)

    phi_dense = dense_direct(query, verts, faces)
    phi = interior_sdf_at_points(query, verts, faces)
    assert bool(jnp.all(phi_dense == phi))  # same face -> same arithmetic

    g_dense = jax.grad(lambda q: dense_direct(q, verts, faces).sum())(query)
    g = jax.grad(
        lambda q: interior_sdf_at_points(q, verts, faces).sum())(query)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_dense), atol=1e-6)


def test_sdf_direct_matches_grid_loss_shape():
    """Direct scene loss agrees with the grid version within grid resolution
    and produces the same dist_values structure."""
    from homan_tpu.interactions.sdf import sdf_scene_loss_direct
    v, f = icosphere(2, 0.5)
    f = jnp.asarray(f)
    a = jnp.asarray(v)[None]
    b_pen = a + jnp.asarray([0.3, 0.0, 0.0])
    b_far = a + jnp.asarray([2.0, 0.0, 0.0])
    loss_g, meta_g = sdf_scene_loss([a, b_pen], [f, f])
    loss_d, meta_d = sdf_scene_loss_direct([a, b_pen], [f, f])
    assert meta_d["dist_values"][(0, 1)].shape == (1, v.shape[0])
    # same order of magnitude; grid blurs near the surface
    assert 0.5 < float(loss_d) / float(loss_g) < 2.0
    np.testing.assert_allclose(
        np.asarray(meta_d["dist_values"][(0, 1)]),
        np.asarray(meta_g["dist_values"][(0, 1)]), atol=0.06)
    loss_d_far, _ = sdf_scene_loss_direct([a, b_far], [f, f])
    assert float(loss_d_far) == 0.0


def test_interaction_terms_direct_mode():
    """compute_interaction_sdf_terms in direct mode: penetrating scene gives
    positive collision + contact; gradient pushes the hand out."""
    from homan_tpu.fit import losses as L

    v, f = icosphere(2, 0.2)
    f = jnp.asarray(f)
    B = 2
    obj = jnp.asarray(v)[None] + jnp.zeros((B, 1, 3), np.float32)

    def terms(dx):
        hand = jnp.asarray(v)[None] + jnp.stack(
            [dx, jnp.zeros_like(dx), jnp.zeros_like(dx)])[None, None]
        hand = jnp.tile(hand[0][None], (B, 1, 1))
        return L.compute_interaction_sdf_terms(
            hand, obj, f, f, hand_nb=1, with_collision=True,
            with_contact=True, sdf_mode="direct")

    out = terms(jnp.asarray(0.25))
    assert float(out["loss_collision"]) > 0.0
    assert float(out["loss_contact"]) > 0.0

    g = float(jax.grad(lambda dx: terms(dx)["loss_collision"])(
        jnp.asarray(0.25)))
    assert g < 0  # moving apart (larger dx) reduces penetration


def test_sdf_mode_default_and_grid_equivalence_of_contact():
    """Default sdf_mode is 'direct'; the default (reference-quirk) contact
    term is mode-invariant because its exterior mask never reads the SDF
    values' sign."""
    from homan_tpu.fit import losses as L, model as M

    assert M.HomanConfig().sdf_mode == "direct"
    v, f = icosphere(2, 0.2)
    f = jnp.asarray(f)
    B = 2
    hand = jnp.asarray(v)[None] + jnp.asarray([[[0.15, 0, 0]]]) \
        + jnp.zeros((B, 1, 3))
    obj = jnp.asarray(v)[None] + jnp.zeros((B, 1, 3))
    out_d = L.compute_interaction_sdf_terms(
        hand, obj, f, f, hand_nb=1, with_collision=False, with_contact=True,
        sdf_mode="direct")
    out_g = L.compute_interaction_sdf_terms(
        hand, obj, f, f, hand_nb=1, with_collision=False, with_contact=True,
        sdf_mode="grid")
    np.testing.assert_allclose(float(out_d["loss_contact"]),
                               float(out_g["loss_contact"]), rtol=1e-5)
