import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from homan_tpu.core import mano
from homan_tpu.core.geometry import rodrigues


def numpy_mano_reference(params, betas, global_orient, hand_pose):
    """Independent numpy implementation of SMPL-style LBS as ground truth."""
    p = {k: np.asarray(v, np.float64) for k, v in params.items()}
    betas = np.asarray(betas, np.float64)
    full_pose = np.concatenate([global_orient, hand_pose]).reshape(16, 3)

    v_shaped = p["v_template"] + np.einsum("vck,k->vc", p["shapedirs"], betas)
    J = p["J_regressor"] @ v_shaped

    def rodrigues_np(aa):
        theta = np.linalg.norm(aa)
        if theta < 1e-12:
            return np.eye(3)
        k = aa / theta
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * K @ K

    rots = np.stack([rodrigues_np(full_pose[i]) for i in range(16)])
    pose_feature = (rots[1:] - np.eye(3)).reshape(-1)
    v_posed = v_shaped + np.einsum("vcf,f->vc", p["posedirs"], pose_feature)

    parents = np.asarray(params["parents"])
    world = [None] * 16
    for j in range(16):
        T = np.eye(4)
        T[:3, :3] = rots[j]
        T[:3, 3] = J[j] - (J[parents[j]] if parents[j] >= 0 else 0)
        world[j] = T if parents[j] < 0 else world[parents[j]] @ T
    world = np.stack(world)
    posed_joints = world[:, :3, 3].copy()
    rel = world.copy()
    rel[:, :3, 3] -= np.einsum("jab,jb->ja", world[:, :3, :3], J)
    T = np.einsum("vj,jab->vab", p["weights"], rel)
    verts = np.einsum("vab,vb->va", T[:, :3, :3], v_posed) + T[:, :3, 3]
    return verts, posed_joints


def test_forward_matches_numpy_reference():
    params = mano.synthetic_mano_params(0)
    rng = np.random.RandomState(7)
    betas = rng.randn(10).astype(np.float32) * 0.5
    rot = rng.randn(3).astype(np.float32) * 0.5
    pose = rng.randn(45).astype(np.float32) * 0.3
    out = mano.mano_forward(params, jnp.asarray(betas), jnp.asarray(rot),
                            jnp.asarray(pose))
    ref_verts, ref_joints = numpy_mano_reference(params, betas, rot, pose)
    np.testing.assert_allclose(np.asarray(out["verts"]), ref_verts, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["joints"]), ref_joints, atol=2e-5)


def test_zero_pose_is_shaped_template():
    params = mano.synthetic_mano_params(1)
    out = mano.mano_forward(params, jnp.zeros(10), jnp.zeros(3), jnp.zeros(45))
    np.testing.assert_allclose(np.asarray(out["verts"]),
                               np.asarray(params["v_template"]), atol=1e-5)


def test_global_orient_is_rigid():
    """Global orient must rotate the hand rigidly about the wrist joint."""
    params = mano.synthetic_mano_params(2)
    aa = jnp.asarray([0.4, -0.3, 0.8])
    out0 = mano.mano_forward(params, jnp.zeros(10), jnp.zeros(3), jnp.zeros(45))
    out1 = mano.mano_forward(params, jnp.zeros(10), aa, jnp.zeros(45))
    R = np.asarray(rodrigues(aa))
    wrist = np.asarray(out0["joints"])[0]
    expected = (np.asarray(out0["verts"]) - wrist) @ R.T + wrist
    np.testing.assert_allclose(np.asarray(out1["verts"]), expected, atol=1e-5)


def test_pca_roundtrip():
    params = mano.synthetic_mano_params(3)
    rng = np.random.RandomState(3)
    pca = jnp.asarray(rng.randn(16).astype(np.float32))
    aa = mano.pca_to_axis_angle(params, pca)
    pca2 = mano.axis_angle_to_pca(params, aa, ncomps=16)
    np.testing.assert_allclose(np.asarray(pca2), np.asarray(pca), atol=1e-4)


def test_pca_left_sign_flip():
    params = mano.synthetic_mano_params(4)
    pca = jnp.ones(16)
    aa_r = mano.pca_to_axis_angle(params, pca, is_left=False, flat_hand_mean=True)
    aa_l = mano.pca_to_axis_angle(params, pca, is_left=True, flat_hand_mean=True)
    np.testing.assert_allclose(np.asarray(aa_l[0::3]), np.asarray(aa_r[0::3]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(aa_l[1::3]), -np.asarray(aa_r[1::3]),
                               atol=1e-6)


def test_mirror_is_exact_reflection():
    """The mirrored model posed with mirrored pose must be the exact x-mirror
    of the right model for any pose/shape: geometry check, no real data needed."""
    params = mano.synthetic_mano_params(5)
    left = mano.mirror_mano_params(params)
    rng = np.random.RandomState(5)
    betas = jnp.asarray(rng.randn(10).astype(np.float32) * 0.5)
    rot = rng.randn(3).astype(np.float32)
    pose = rng.randn(45).astype(np.float32) * 0.4
    sign = np.tile([1.0, -1.0, -1.0], 15).astype(np.float32)
    rot_m = rot * np.array([1.0, -1.0, -1.0], np.float32)
    out_r = mano.mano_forward(params, betas, jnp.asarray(rot), jnp.asarray(pose))
    out_l = mano.mano_forward(left, betas, jnp.asarray(rot_m),
                              jnp.asarray(pose * sign))
    mirror = np.array([-1.0, 1.0, 1.0])
    np.testing.assert_allclose(np.asarray(out_l["verts"]),
                               np.asarray(out_r["verts"]) * mirror, atol=2e-5)


def test_layer_batched_forward_and_tips():
    layer = mano.ManoLayer.synthetic(0)
    rng = np.random.RandomState(9)
    B = 4
    pca = jnp.asarray(rng.randn(B, 16).astype(np.float32))
    rot = jnp.asarray(rng.randn(B, 3).astype(np.float32) * 0.3)
    betas = jnp.zeros((B, 10))
    out = layer.forward_pca(pca, rot, betas, side="right")
    assert out["verts"].shape == (B, 778, 3)
    assert out["joints"].shape == (B, 16, 3)
    joints21 = mano.add_tips_and_reorder(out["verts"], out["joints"])
    assert joints21.shape == (B, 21, 3)
    # Joint 0 must stay the wrist
    np.testing.assert_allclose(np.asarray(joints21[:, 0]),
                               np.asarray(out["joints"][:, 0]), atol=1e-6)
    # Tips land at the designated vertices
    np.testing.assert_allclose(np.asarray(joints21[:, 4]),
                               np.asarray(out["verts"][:, 745]), atol=1e-6)


def test_forward_jits_and_grads():
    layer = mano.ManoLayer.synthetic(0)

    @jax.jit
    def loss_fn(pca):
        out = layer.forward_pca(pca, jnp.zeros((2, 3)), jnp.zeros((2, 10)))
        return (out["verts"] ** 2).sum()

    g = jax.grad(loss_fn)(jnp.ones((2, 16)) * 0.1)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0


MANO_ROOT = os.environ.get("MANO_ROOT", "extra_data/mano")


@pytest.mark.skipif(
    not os.path.exists(os.path.join(MANO_ROOT, "MANO_RIGHT.pkl")),
    reason="license-gated MANO data not present (set MANO_ROOT)")
def test_real_mano_pkl_loads_and_runs():
    """Chumpy-pickle loader + forward on the real MANO_RIGHT.pkl: shapes,
    scale (hand ~18 cm), finite outputs, PCA entry point."""
    from homan_tpu.core.mano import ManoLayer, load_mano_params

    params = load_mano_params(os.path.join(MANO_ROOT, "MANO_RIGHT.pkl"))
    assert params["v_template"].shape == (778, 3)
    assert params["posedirs"].shape == (778, 3, 135)
    assert params["J_regressor"].shape == (16, 778)
    assert params["faces"].shape[1] == 3

    layer = ManoLayer.from_folder(MANO_ROOT)
    out = layer.forward_pca(jnp.zeros((1, 16)), jnp.zeros((1, 3)),
                            jnp.zeros((1, 10)), side="right")
    verts = np.asarray(out["verts"][0])
    assert np.isfinite(verts).all()
    extent = verts.max(0) - verts.min(0)
    assert 0.10 < extent.max() < 0.30  # meters: a real hand


@pytest.mark.skipif(
    not os.path.exists(os.path.join(MANO_ROOT, "MANO_LEFT.pkl"))
    or not os.path.exists(os.path.join(MANO_ROOT, "MANO_RIGHT.pkl")),
    reason="license-gated MANO data not present (set MANO_ROOT)")
def test_mirror_matches_shipped_left_model():
    """mirror_mano_params(RIGHT) must reproduce the shipped MANO_LEFT.pkl
    geometry (the reference builds LEFT from RIGHT with sign masks,
    homan/manoconv.py:10-55; ours derives the signs from first principles).
    """
    from homan_tpu.core.mano import (load_mano_params, mano_forward_jit,
                                     mirror_mano_params)

    right = load_mano_params(os.path.join(MANO_ROOT, "MANO_RIGHT.pkl"))
    left = load_mano_params(os.path.join(MANO_ROOT, "MANO_LEFT.pkl"))
    mirrored = mirror_mano_params(right)
    np.testing.assert_allclose(np.asarray(mirrored["v_template"]),
                               np.asarray(left["v_template"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mirrored["hands_mean"]),
                               np.asarray(left["hands_mean"]), atol=1e-6)
    # Posed geometry parity on a random articulation
    rng = np.random.RandomState(0)
    pose = jnp.asarray(rng.randn(45).astype(np.float32) * 0.2)
    betas = jnp.asarray(rng.randn(10).astype(np.float32) * 0.5)
    out_m = mano_forward_jit(mirrored, betas, jnp.zeros(3), pose)
    out_l = mano_forward_jit(left, betas, jnp.zeros(3), pose)
    np.testing.assert_allclose(np.asarray(out_m["verts"]),
                               np.asarray(out_l["verts"]), atol=1e-5)


def test_fabricated_real_format_pkl_roundtrip(tmp_path):
    """load_mano_params / from_folder on a pkl in the REAL MANO format:
    chumpy-wrapped arrays (restored through the chumpy-free unpickler),
    scipy-sparse J_regressor, latin1 py2 pickling, 'f' faces key, and a
    (778, 3, 45) wide shapedirs truncated to 10 betas — so the parsing path
    is covered without the license-gated download."""
    import pickle
    import sys
    import types

    import scipy.sparse as sp

    from homan_tpu.core.mano import (ManoLayer, load_mano_params,
                                     synthetic_mano_params)

    src = {k: np.asarray(v) for k, v in synthetic_mano_params(3).items()}

    # Fake chumpy so pickled objects carry module path "chumpy.ch".
    ch_mod = types.ModuleType("chumpy")
    ch_ch = types.ModuleType("chumpy.ch")

    class Ch:  # noqa: D401 — minimal stand-in
        def __init__(self, x):
            self.x = x

    ch_ch.Ch = Ch
    Ch.__module__ = "chumpy.ch"
    Ch.__qualname__ = "Ch"
    ch_mod.ch = ch_ch
    sys.modules["chumpy"] = ch_mod
    sys.modules["chumpy.ch"] = ch_ch
    try:
        kintree = np.stack([
            np.concatenate([[4294967295], src["parents"][1:]]).astype(
                np.uint32),
            np.arange(16, dtype=np.uint32)])
        wide_shapedirs = np.concatenate(
            [src["shapedirs"], np.zeros((778, 3, 35))], axis=-1)
        raw = {
            "v_template": Ch(src["v_template"].astype(np.float64)),
            "f": src["faces"].astype(np.uint32),
            "shapedirs": Ch(wide_shapedirs),
            "posedirs": Ch(src["posedirs"].astype(np.float64)),
            "J_regressor": sp.csc_matrix(src["J_regressor"]),
            "weights": src["weights"].astype(np.float64),
            "kintree_table": kintree,
            "hands_components": src["hands_components"].astype(np.float64),
            "hands_mean": src["hands_mean"].astype(np.float64),
        }
        with open(tmp_path / "MANO_RIGHT.pkl", "wb") as f:
            pickle.dump(raw, f, protocol=2)
    finally:
        del sys.modules["chumpy"], sys.modules["chumpy.ch"]

    loaded = load_mano_params(str(tmp_path / "MANO_RIGHT.pkl"))
    for k in ("v_template", "shapedirs", "posedirs", "J_regressor",
              "weights", "hands_components", "hands_mean"):
        np.testing.assert_allclose(np.asarray(loaded[k]),
                                   src[k].astype(np.float32), atol=1e-6,
                                   err_msg=k)
    np.testing.assert_array_equal(np.asarray(loaded["faces"]), src["faces"])
    np.testing.assert_array_equal(np.asarray(loaded["parents"]),
                                  src["parents"])

    # from_folder mirrors the left model when MANO_LEFT.pkl is absent, and
    # the loaded layer runs the forward.
    layer = ManoLayer.from_folder(str(tmp_path))
    out = layer.forward_pca(jnp.zeros((1, 16)), jnp.zeros((1, 3)),
                            jnp.zeros((1, 10)), side="right")
    assert np.isfinite(np.asarray(out["verts"])).all()
    out_l = layer.forward_pca(jnp.zeros((1, 16)), jnp.zeros((1, 3)),
                              jnp.zeros((1, 10)), side="left")
    np.testing.assert_allclose(
        np.asarray(out_l["verts"]) * np.array([-1, 1, 1]),
        np.asarray(out["verts"]), atol=1e-5)
