"""Multi-device clip sharding on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np

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


def test_dryrun_multichip_contract():
    """The driver runs this with NO ambient JAX env vars, possibly on a host
    whose TPU runtime is broken; dryrun_multichip must self-provision the
    CPU mesh (it re-execs itself in a subprocess with the env forced)."""
    import os
    import subprocess
    import sys

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PYTHONPATH",
                        "_HOMAN_TPU_DRYRUN_CHILD")}
    env["PYTHONPATH"] = repo_root
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
