"""MANO parametric hand model as pure JAX.

Re-implements the forward used by the reference through the external
`mano`/`smplx` packages (homan/manomodel.py:84-151,153-214): shape blendshapes,
pose-dependent corrective blendshapes, linear blend skinning over 16 joints,
and the PCA pose parameterization (16 coeffs -> 45 axis-angle, left-hand sign
quirks at homan/manomodel.py:130-131). Fingertip augmentation + 21-joint
reordering follows homan/homan.py:322-327.

Model data (MANO_RIGHT.pkl / MANO_LEFT.pkl) is a license-gated user download;
`load_mano_params` reads the original pickle format without requiring chumpy.
`mirror_mano_params` generates the left model from the right one (the
equivalent of homan/manoconv.py:10-55, derived from first principles: mirror
across the x=0 plane). `synthetic_mano_params` builds a structurally identical
random model for tests.

Everything operates on a parameter pytree (dict of jnp arrays) so models vmap
and shard like any other data.
"""
from __future__ import annotations

import io
import pickle
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from homan_tpu.core.geometry import rodrigues

# MANO constants
NUM_VERTS = 778
NUM_JOINTS = 16  # wrist + 15 articulated
NUM_POSE_DIMS = 45  # 15 joints x 3 axis-angle
# Vertex indices serving as fingertips: thumb, index, middle, ring, pinky
# (homan/homan.py:322).
TIP_VERTEX_IDS = (745, 317, 444, 556, 673)
# Map (16 MANO joints + 5 tips appended) -> standard 21-joint order
# (homan/homan.py:324-327).
JOINT_REORDER = (0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18, 10, 11, 12, 19,
                 7, 8, 9, 20)
# Fixed MANO kinematic chain (wrist + 3 joints per finger). Static so the FK
# unrolls at trace time even when model params are vmapped/stacked.
MANO_PARENTS = (-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14)


# ---------------------------------------------------------------------------
# Loading
# ---------------------------------------------------------------------------
class _ChumpyStub:
    """Stand-in for chumpy.Ch so MANO pickles load without chumpy installed."""

    def __setstate__(self, state):
        self.__dict__.update(state)


class _ManoUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module.startswith("chumpy"):
            return _ChumpyStub
        return super().find_class(module, name)


def _to_array(value) -> np.ndarray:
    if isinstance(value, np.ndarray):
        return np.asarray(value)
    if isinstance(value, _ChumpyStub):
        for attr in ("x", "a", "v"):
            if attr in value.__dict__:
                return _to_array(value.__dict__[attr])
        raise ValueError("Unrecognized chumpy payload in MANO pickle")
    if hasattr(value, "toarray"):  # scipy sparse J_regressor
        return np.asarray(value.toarray())
    return np.asarray(value)


def load_mano_params(path: str, dtype=jnp.float32) -> Dict[str, Any]:
    """Load a MANO_{RIGHT,LEFT}.pkl into a JAX parameter pytree.

    Returns dict with:
      v_template (778,3), shapedirs (778,3,10), posedirs (778,3,135),
      J_regressor (16,778), weights (778,16), parents (16,) int32,
      hands_components (45,45), hands_mean (45,), faces (1538,3) int32.
    """
    with open(path, "rb") as f:
        raw = _ManoUnpickler(io.BytesIO(f.read()), encoding="latin1").load()
    kintree = _to_array(raw["kintree_table"]).astype(np.int64)
    parents = kintree[0].copy()
    parents[0] = -1
    shapedirs = _to_array(raw["shapedirs"]).astype(np.float64)
    return {
        "v_template": jnp.asarray(_to_array(raw["v_template"]), dtype),
        "shapedirs": jnp.asarray(shapedirs[..., :10], dtype),
        "posedirs": jnp.asarray(_to_array(raw["posedirs"]), dtype),
        "J_regressor": jnp.asarray(_to_array(raw["J_regressor"]), dtype),
        "weights": jnp.asarray(_to_array(raw["weights"]), dtype),
        "parents": jnp.asarray(parents, jnp.int32),
        "hands_components": jnp.asarray(_to_array(raw["hands_components"]), dtype),
        "hands_mean": jnp.asarray(_to_array(raw["hands_mean"]), dtype),
        "faces": jnp.asarray(_to_array(raw["f"]).astype(np.int64), jnp.int32),
    }


def mirror_mano_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Right-hand MANO params -> left-hand params (mirror across x = 0).

    Derivation: with M = diag(-1, 1, 1), mirrored geometry is v' = M v, so all
    x components of v_template and shapedirs flip. A mirrored joint rotation is
    R' = M R M, i.e. axis-angle (ax, ay, az) -> (ax, -ay, -az); therefore the
    PCA basis and mean flip their y/z entries, and pose blendshape features
    (R - I)_{ij} flip sign when exactly one of i, j is the x axis. Face winding
    reverses to keep outward normals. (Functional equivalent of
    homan/manoconv.py:10-55, which ships precomputed sign masks.)
    """
    flip_x = jnp.array([-1.0, 1.0, 1.0], params["v_template"].dtype)

    # Pose-space sign per axis-angle coordinate: + - - per joint triple.
    aa_signs = jnp.tile(jnp.array([1.0, -1.0, -1.0]), NUM_POSE_DIMS // 3)

    # Pose-feature sign: feature f = joint*9 + i*3 + j of (R - I);
    # sign = (-1 if i==0) * (-1 if j==0).
    i_idx = (np.arange(9) // 3)
    j_idx = (np.arange(9) % 3)
    feat_signs9 = np.where(i_idx == 0, -1.0, 1.0) * np.where(j_idx == 0, -1.0, 1.0)
    feat_signs = jnp.asarray(np.tile(feat_signs9, NUM_POSE_DIMS // 3))

    # Displacement x components also mirror: total posedirs sign =
    # flip_x[coord] * feat_signs[feature].
    posedirs = params["posedirs"] * flip_x[None, :, None] * feat_signs[None, None, :]

    return {
        "v_template": params["v_template"] * flip_x,
        "shapedirs": params["shapedirs"] * flip_x[None, :, None],
        "posedirs": posedirs,
        "J_regressor": params["J_regressor"],
        "weights": params["weights"],
        "parents": params["parents"],
        "hands_components": params["hands_components"] * aa_signs[None, :],
        "hands_mean": params["hands_mean"] * aa_signs,
        "faces": params["faces"][:, ::-1],
    }


def synthetic_mano_params(seed: int = 0, dtype=jnp.float32) -> Dict[str, Any]:
    """Structurally faithful random MANO-like model for tests and benchmarks.

    Geometry is a smooth random blob with a plausible kinematic chain; all
    array shapes, orderings and conventions match the real model so every code
    path (PCA, LBS, tips, reordering) is exercised without license-gated data.
    """
    rng = np.random.RandomState(seed)
    # Closed manifold template: a UV-sphere with exactly 778 vertices
    # (8 rings x 97 columns + 2 poles), flattened into a hand-ish ellipsoid.
    # Manifold topology with consistent winding matters: the rasterizer's
    # contour/winding coverage assumes it (like real MANO provides).
    rings, cols = 8, 97
    theta = np.pi * (np.arange(1, rings + 1)) / (rings + 1)
    phi = 2 * np.pi * np.arange(cols) / cols
    tt, pp = np.meshgrid(theta, phi, indexing="ij")
    ring_pts = np.stack([np.sin(tt) * np.cos(pp),
                         0.4 * np.sin(tt) * np.sin(pp),
                         np.cos(tt)], axis=-1).reshape(-1, 3)
    v_template = np.concatenate(
        [np.array([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]]), ring_pts])
    # smooth random bumps (keeps the surface generic but manifold)
    w = rng.randn(3, 3)
    bump = 1.0 + 0.15 * np.sin(v_template @ w[0]) \
        + 0.1 * np.cos(2.0 * v_template @ w[1])
    v_template = v_template * bump[:, None] * np.array([0.04, 0.04, 0.09])

    def vid(r, c):
        return 2 + r * cols + (c % cols)

    tris = []
    for c in range(cols):  # pole caps
        tris.append((0, vid(0, c), vid(0, c + 1)))
        tris.append((1, vid(rings - 1, c + 1), vid(rings - 1, c)))
    for r in range(rings - 1):
        for c in range(cols):
            a, b = vid(r, c), vid(r, c + 1)
            d, e = vid(r + 1, c), vid(r + 1, c + 1)
            tris.append((a, d, b))
            tris.append((b, d, e))
    faces_manifold = np.asarray(tris, np.int64)
    shapedirs = 0.01 * rng.randn(NUM_VERTS, 3, 10)
    posedirs = 0.001 * rng.randn(NUM_VERTS, 3, 135)
    # Joint regressor: soft assignment of verts to 16 cluster centers
    centers = rng.randn(NUM_JOINTS, 3) * 0.05
    d2 = ((v_template[None] - centers[:, None]) ** 2).sum(-1)
    J_regressor = np.exp(-d2 / 0.002)
    J_regressor /= J_regressor.sum(axis=1, keepdims=True)
    weights = np.exp(-d2.T / 0.004)
    weights /= weights.sum(axis=1, keepdims=True)
    parents = np.array([-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14])
    comps = rng.randn(45, 45)
    comps, _ = np.linalg.qr(comps)
    hands_mean = 0.1 * rng.randn(45)
    faces = faces_manifold
    return {
        "v_template": jnp.asarray(v_template, dtype),
        "shapedirs": jnp.asarray(shapedirs, dtype),
        "posedirs": jnp.asarray(posedirs, dtype),
        "J_regressor": jnp.asarray(J_regressor, dtype),
        "weights": jnp.asarray(weights, dtype),
        "parents": jnp.asarray(parents, jnp.int32),
        "hands_components": jnp.asarray(comps, dtype),
        "hands_mean": jnp.asarray(hands_mean, dtype),
        "faces": jnp.asarray(faces, jnp.int32),
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------
def _rigid_transforms(rot_mats: jnp.ndarray, joints: jnp.ndarray,
                      parents=MANO_PARENTS) -> jnp.ndarray:
    """Forward-kinematic chain -> per-joint relative world transforms.

    Args:
      rot_mats: (J, 3, 3) local joint rotations (column convention).
      joints: (J, 3) rest-pose joint locations.
      parents: STATIC (J,) parent indices, parents[0] == -1 (the fixed MANO
        kintree; kept static so FK unrolls under vmap over model params).
    Returns:
      (J, 4, 4) transforms mapping rest-pose-relative coordinates, i.e. the
      usual A_k' = A_k - pack(A_k @ [j_k; 0]) of SMPL-style LBS.
    """
    parents_np = np.asarray(parents)
    rel = joints - jnp.where(
        (parents_np >= 0)[:, None], joints[np.maximum(parents_np, 0)], 0.0)

    def make_T(R, t):
        T = jnp.zeros((4, 4), R.dtype)
        T = T.at[:3, :3].set(R)
        T = T.at[:3, 3].set(t)
        return T.at[3, 3].set(1.0)

    local_T = jax.vmap(make_T)(rot_mats, rel)
    # The kinematic chain is short (depth <= 4) and static: unrolled python
    # loop over joints compiles to a tiny fixed DAG, no scan needed.
    world = [local_T[0]]
    for j in range(1, rot_mats.shape[0]):
        world.append(world[parents_np[j]] @ local_T[j])
    world_T = jnp.stack(world)  # (J, 4, 4)
    posed_joints = world_T[:, :3, 3]
    # Subtract the skinned rest-joint contribution.
    correction = jnp.einsum("jab,jb->ja", world_T[:, :3, :3], joints)
    rel_T = world_T.at[:, :3, 3].set(world_T[:, :3, 3] - correction)
    return rel_T, posed_joints


def mano_forward(params: Dict[str, Any],
                 betas: jnp.ndarray,
                 global_orient: jnp.ndarray,
                 hand_pose: jnp.ndarray,
                 transl: jnp.ndarray | None = None):
    """Single-sample MANO forward (vmap for batches).

    Args:
      params: model pytree from load_mano_params / synthetic_mano_params.
      betas: (10,) shape coefficients.
      global_orient: (3,) wrist axis-angle.
      hand_pose: (45,) articulation axis-angle (flat-mean space).
      transl: optional (3,) translation added to outputs.
    Returns:
      dict verts (778,3), joints (16,3).
    """
    dtype = params["v_template"].dtype
    betas = jnp.asarray(betas, dtype)
    full_pose = jnp.concatenate([global_orient, hand_pose]).reshape(NUM_JOINTS, 3)

    v_shaped = params["v_template"] + jnp.einsum(
        "vck,k->vc", params["shapedirs"], betas)
    joints_rest = params["J_regressor"] @ v_shaped  # (16, 3)

    rot_mats = rodrigues(full_pose)  # (16, 3, 3)
    pose_feature = (rot_mats[1:] - jnp.eye(3, dtype=dtype)).reshape(-1)  # (135,)
    v_posed = v_shaped + jnp.einsum("vcf,f->vc", params["posedirs"], pose_feature)

    rel_T, posed_joints = _rigid_transforms(rot_mats, joints_rest)
    T = jnp.einsum("vj,jab->vab", params["weights"], rel_T)  # (778, 4, 4)
    verts = jnp.einsum("vab,vb->va", T[:, :3, :3], v_posed) + T[:, :3, 3]

    if transl is not None:
        verts = verts + transl
        posed_joints = posed_joints + transl
    return {"verts": verts, "joints": posed_joints}


# Jitted single-sample forward for host-side data/evidence preparation:
# eager op-by-op dispatch is pathologically slow on remote accelerators.
mano_forward_jit = jax.jit(mano_forward)


def pca_to_axis_angle(params: Dict[str, Any],
                      pca_pose: jnp.ndarray,
                      is_left: bool = False,
                      flat_hand_mean: bool = False) -> jnp.ndarray:
    """PCA coefficients -> 45-dim axis-angle pose.

    Reproduces homan/manomodel.py:110-135: project through the model's own PCA
    basis; for the LEFT hand, flip y/z of the result (FrankMocap convention)
    BEFORE adding the hand mean.
    """
    ncomps = pca_pose.shape[-1]
    aa = pca_pose @ params["hands_components"][:ncomps]
    if is_left:
        sign = jnp.tile(jnp.array([1.0, -1.0, -1.0], aa.dtype), NUM_POSE_DIMS // 3)
        aa = aa * sign
    if not flat_hand_mean:
        aa = aa + params["hands_mean"]
    return aa


def axis_angle_to_pca(params: Dict[str, Any],
                      aa_pose: jnp.ndarray,
                      ncomps: int = 45,
                      is_left: bool = False,
                      flat_hand_mean: bool = False) -> jnp.ndarray:
    """Inverse of pca_to_axis_angle (homan/datasets/manoutils.py:41-58)."""
    if not flat_hand_mean:
        aa_pose = aa_pose - params["hands_mean"]
    if is_left:
        sign = jnp.tile(jnp.array([1.0, -1.0, -1.0], aa_pose.dtype),
                        NUM_POSE_DIMS // 3)
        aa_pose = aa_pose * sign
    basis = params["hands_components"]  # orthogonal (45, 45)
    return (aa_pose @ basis.T)[..., :ncomps]


def add_tips_and_reorder(verts: jnp.ndarray, joints: jnp.ndarray) -> jnp.ndarray:
    """16 MANO joints + 5 fingertip vertices -> standard 21-joint skeleton."""
    tips = verts[..., TIP_VERTEX_IDS, :]
    full = jnp.concatenate([joints, tips], axis=-2)
    return full[..., JOINT_REORDER, :]


class ManoLayer:
    """Convenience wrapper bundling left+right params with batched entry points.

    Functional analogue of homan/manomodel.py ManoModel: stateless apart from
    the parameter pytrees; every method is jit/vmap-safe.
    """

    def __init__(self, right_params: Dict[str, Any],
                 left_params: Dict[str, Any] | None = None,
                 pca_comps: int = 16):
        self.pca_comps = pca_comps
        self.params = {
            "right": right_params,
            "left": left_params if left_params is not None
                    else mirror_mano_params(right_params),
        }

    @classmethod
    def from_folder(cls, mano_root: str, pca_comps: int = 16) -> "ManoLayer":
        import os
        right = load_mano_params(os.path.join(mano_root, "MANO_RIGHT.pkl"))
        left_path = os.path.join(mano_root, "MANO_LEFT.pkl")
        left = load_mano_params(left_path) if os.path.exists(left_path) else None
        return cls(right, left, pca_comps)

    @classmethod
    def synthetic(cls, seed: int = 0, pca_comps: int = 16) -> "ManoLayer":
        return cls(synthetic_mano_params(seed), pca_comps=pca_comps)

    def faces(self, side: str) -> jnp.ndarray:
        return self.params[side]["faces"]

    def forward_pca(self, pca_pose: jnp.ndarray, rot: jnp.ndarray,
                    betas: jnp.ndarray, side: str = "right",
                    flat_hand_mean: bool = False):
        """Batched PCA-pose forward (homan/manomodel.py:84-151 contract).

        Args: pca_pose (B, <=45), rot (B, 3), betas (B, 10).
        Returns: dict verts (B, 778, 3), joints (B, 16, 3), hand_aa_pose (B, 45).
        """
        p = self.params[side]
        pca_pose = pca_pose[..., : self.pca_comps]
        aa = pca_to_axis_angle(p, pca_pose, is_left=(side == "left"),
                               flat_hand_mean=flat_hand_mean)
        out = jax.vmap(lambda r, a, b: mano_forward(p, b, r, a))(rot, aa, betas)
        out["hand_aa_pose"] = aa
        return out

    def forward(self, mano_pose: jnp.ndarray, rot: jnp.ndarray,
                betas: jnp.ndarray, side: str = "right",
                flat_hand_mean: bool = True):
        """Batched axis-angle forward. mano_pose (B, 45)."""
        p = self.params[side]
        if not flat_hand_mean:
            mano_pose = mano_pose + p["hands_mean"]
        out = jax.vmap(lambda r, a, b: mano_forward(p, b, r, a))(
            rot, mano_pose, betas)
        out["hand_aa_pose"] = mano_pose
        return out

    def get_mano_trans(self, mano_pose, rot, ref_verts, betas=None,
                       side: str = "right"):
        """Translation aligning the MANO output mean to reference vertices
        (homan/manomodel.py:216-235)."""
        if betas is None:
            betas = jnp.zeros((10,), jnp.float32)
        res = mano_forward(self.params[side], betas, jnp.asarray(rot),
                           jnp.asarray(mano_pose))
        return (jnp.asarray(ref_verts).mean(0) - res["verts"].mean(0))[None]
