"""Multi-device clip sharding on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from homan_tpu.frontend.gtsynth import make_synthetic_scene
from homan_tpu.parallel import clips as par


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_fit_clips_batched_sharded_matches_single():
    """The sharded batched fit must produce the same result as fitting each
    clip alone (clip independence = zero cross-chip math)."""
    # Clips share hand-model and object topology (stacked leaves must have
    # equal shapes; heterogeneous objects would use pad_mesh bucketing).
    from homan_tpu.core.mano import ManoLayer
    from homan_tpu.core.meshes import bumpy_potato
    layer = ManoLayer.synthetic(0)
    mesh_obj = bumpy_potato(2, 0.08, seed=0)
    scenes = [make_synthetic_scene(seed=i, frame_nb=2, image_size=64,
                                   rend_size=32, mano_layer=layer,
                                   obj_mesh=mesh_obj) for i in range(4)]
    states = par.stack_clips([s.init_state for s in scenes])
    consts = par.stack_clips([s.consts for s in scenes])
    cfg = scenes[0].cfg
    lw = {"lw_smooth_obj": 1.0, "lw_smooth_hand": 1.0}

    mesh = par.make_clip_mesh(4)
    final, history = par.fit_clips_batched(
        states, consts, cfg, loss_weights=lw, num_iterations=5,
        roi_settings=scenes[0].roi_settings, mesh=mesh)
    assert history["loss"].shape == (4, 5)
    assert np.isfinite(np.asarray(history["loss"])).all()

    # Per-clip reference (unsharded, one clip at a time)
    from homan_tpu.fit import joint
    single, hist1 = joint.optimize_hand_object(
        scenes[0].init_state, scenes[0].consts, cfg, loss_weights=lw,
        num_iterations=5, roi_settings=scenes[0].roi_settings)
    np.testing.assert_allclose(np.asarray(history["loss"][0]),
                               np.asarray(hist1["loss"]), rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(final.translations_object[0]),
        np.asarray(single.translations_object), atol=1e-5)


@pytest.mark.slow
def test_fit_frames_sharded_matches_single():
    """Sequence parallelism: ONE clip's frame axis sharded over all 8
    devices must reproduce the unsharded fit (the smoothness halo exchange
    and the global-scale gradient all-reduce are the only cross-chip math).
    Two hands exercise the interleaved B*H row split."""
    from homan_tpu.fit import joint
    from homan_tpu.parallel import frames as fpar

    scene = make_synthetic_scene(seed=3, frame_nb=8, hand_sides=("left",
                                                                 "right"),
                                 image_size=64, rend_size=32)
    lw = {"lw_sil_obj": 1.0, "lw_v2d_hand": 50.0, "lw_smooth_obj": 1.0,
          "lw_smooth_hand": 1.0, "lw_pca": 0.004, "lw_scale_obj": 0.001,
          "lw_scale_hand": 0.001, "lw_inter": 1.0}

    mesh = fpar.make_frame_mesh(8)
    sharded, hist_s = fpar.fit_frames_sharded(
        scene.init_state, scene.consts, scene.cfg, mesh,
        loss_weights=lw, num_iterations=5,
        roi_settings=scene.roi_settings)
    single, hist_1 = joint.optimize_hand_object(
        scene.init_state, scene.consts, scene.cfg, loss_weights=lw,
        num_iterations=5, roi_settings=scene.roi_settings)

    np.testing.assert_allclose(np.asarray(hist_s["loss"]),
                               np.asarray(hist_1["loss"]), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(sharded.translations_object),
                               np.asarray(single.translations_object),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(sharded.mano_pca_pose),
                               np.asarray(single.mano_pca_pose), atol=1e-4)
    np.testing.assert_allclose(np.asarray(sharded.int_scales_object),
                               np.asarray(single.int_scales_object),
                               atol=1e-5)
    # The frame shards must actually live on distinct devices.
    placed = sharded.translations_object
    assert len(placed.sharding.device_set) == 8


def test_frame_shard_requires_divisibility():
    from homan_tpu.parallel import frames as fpar

    scene = make_synthetic_scene(seed=0, frame_nb=3, image_size=64,
                                 rend_size=32)
    mesh = fpar.make_frame_mesh(8)
    try:
        fpar.shard_frames(scene.init_state, scene.consts, mesh)
    except ValueError as e:
        assert "divisible" in str(e)
    else:
        raise AssertionError("expected ValueError on frame_nb=3 over 8")


def test_dryrun_multichip_contract():
    """Reproduce the driver's exact invocation: the AMBIENT environment
    (including any sitecustomize dirs on PYTHONPATH that force-register a
    TPU plugin — the round-2 failure mode), only the test-harness JAX
    overrides removed. dryrun_multichip must self-provision the CPU mesh by
    re-exec'ing itself with the env forced and the plugin vectors scrubbed."""
    import os
    import subprocess
    import sys

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # Keep PYTHONPATH and every other ambient var; drop only the JAX
    # platform settings the pytest conftest itself injected, since the
    # driver environment does not set them.
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS",
                        "_HOMAN_TPU_DRYRUN_CHILD")}
    env["PYTHONPATH"] = (repo_root + os.pathsep +
                         env.get("PYTHONPATH", "")).rstrip(os.pathsep)
    subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        env=env, cwd=repo_root, check=True)


def test_entry_contract_compiles():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    loss = out[0]
    assert np.isfinite(float(loss))


def test_pad_mesh_render_and_sdf_invariant():
    """pad_mesh bucketing is exact: padded meshes render identical soft
    silhouettes and voxelize to identical interior SDFs (degenerate faces
    contribute nothing; collapsed verts sit on the surface)."""
    import jax.numpy as jnp
    from homan_tpu.core.meshes import bumpy_potato, pad_mesh
    from homan_tpu.interactions.sdf import voxelize_interior_sdf
    from homan_tpu.render import RasterSettings, rasterize_soft
    from homan_tpu.render.rasterizer import MeshTopology

    v, f = bumpy_potato(2, 0.3, seed=2)
    vp, fp = pad_mesh(v, f, v.shape[0] + 37, f.shape[0] + 53)
    K = jnp.asarray([[[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]],
                    jnp.float32)
    settings = RasterSettings(image_size=64, tile_px=16, faces_per_tile=384,
                              edges_per_tile=384)
    sil = rasterize_soft(jnp.asarray(v)[None] + jnp.asarray([0, 0, 1.0]),
                         MeshTopology.from_faces(f), K, settings)["sil"]
    sil_p = rasterize_soft(jnp.asarray(vp)[None] + jnp.asarray([0, 0, 1.0]),
                           MeshTopology.from_faces(fp), K, settings)["sil"]
    np.testing.assert_allclose(np.asarray(sil_p), np.asarray(sil), atol=1e-5)

    phi = voxelize_interior_sdf(jnp.asarray(v)[None], jnp.asarray(f),
                                grid_size=16)
    phi_p = voxelize_interior_sdf(jnp.asarray(vp)[None], jnp.asarray(fp),
                                  grid_size=16)
    np.testing.assert_allclose(np.asarray(phi_p), np.asarray(phi), atol=1e-6)


def test_heterogeneous_objects_multiclip_via_buckets():
    """Clips with DIFFERENT object meshes batch into one sharded program by
    padding to a common shape bucket (SURVEY hard-part #4)."""
    import dataclasses

    import jax.numpy as jnp
    from homan_tpu.core.mano import ManoLayer
    from homan_tpu.core.meshes import bumpy_potato, pad_mesh
    from homan_tpu.frontend.gtsynth import make_synthetic_scene
    from homan_tpu.parallel import clips as par
    from homan_tpu.render.rasterizer import MeshTopology

    layer = ManoLayer.synthetic(0)
    meshes = [bumpy_potato(2, 0.08, seed=1),   # 162 verts / 320 faces
              bumpy_potato(1, 0.07, seed=2)]   # 42 verts / 80 faces
    v_bucket = max(m[0].shape[0] for m in meshes)
    f_bucket = max(m[1].shape[0] for m in meshes)
    padded = [pad_mesh(v, f, v_bucket, f_bucket) for v, f in meshes]
    # Topologies differ per clip, but MeshTopology is a pytree of static
    # -shaped arrays once bucketed: edges also need a shared bucket.
    topos = [MeshTopology.from_faces(f) for _, f in padded]
    e_bucket = max(t.edges.shape[0] for t in topos)

    def pad_topo(t):
        pad = e_bucket - t.edges.shape[0]
        return MeshTopology(
            faces=t.faces,
            edges=jnp.concatenate([t.edges, jnp.zeros((pad, 2), jnp.int32)]),
            edge_faces=jnp.concatenate(
                [t.edge_faces, jnp.full((pad, 2), -1, jnp.int32)]),
            edge_dir_f1=jnp.concatenate(
                [t.edge_dir_f1, jnp.zeros(pad, bool)]))

    scenes = []
    for (vp, fp), topo in zip(padded, topos):
        scenes.append(make_synthetic_scene(
            seed=7, frame_nb=2, image_size=64, rend_size=32,
            mano_layer=layer, obj_mesh=(vp, fp)))
        scenes[-1] = dataclasses.replace(
            scenes[-1],
            consts=dataclasses.replace(scenes[-1].consts,
                                       faces_object=pad_topo(topo)))
    states = par.stack_clips([s.init_state for s in scenes])
    consts = par.stack_clips([s.consts for s in scenes])
    mesh = par.make_clip_mesh(2)
    final, history = par.fit_clips_batched(
        states, consts, scenes[0].cfg,
        loss_weights={"lw_sil_obj": 1.0, "lw_smooth_obj": 1.0,
                      "lw_smooth_hand": 1.0},
        num_iterations=2, roi_settings=scenes[0].roi_settings, mesh=mesh)
    loss = np.asarray(history["loss"])
    assert loss.shape == (2, 2)
    assert np.isfinite(loss).all()
