"""Scene visualization built on the hard rasterizer.

Equivalent of homan/visualize.py:44-128 + homan/homan.py:546-613 (frontal and
top-down overlay renders, optionally with GT meshes) and the NMR wrapper
compositing (homan/utils/nmr_renderer.py:116-250), using homan_tpu's own flat
-shaded z-buffer renderer instead of the CUDA NMR.
"""
from __future__ import annotations

import contextlib
import os
from typing import Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from homan_tpu.core import meshes as mesh_lib
from homan_tpu.fit import model as M
from homan_tpu.render import RasterSettings, rasterize_hard
from homan_tpu.render.rasterizer import MeshTopology

# Cosmetic renders run on the CPU backend by default: the hard rasterizer is
# pure XLA (no Pallas), CPU compiles are local and take seconds, while every
# distinct viz shape compiled for a remote TPU pays tens of seconds of relay
# round-trip — measured as the dominant first-sample cost in the CLI driver.
# The frames are consumed host-side (numpy compositing + video writers)
# anyway. Override with HOMAN_TPU_VIZ_DEVICE=tpu to keep viz on the
# accelerator (e.g. local non-relay runtimes rendering long clips).
VIZ_DEVICE = os.environ.get("HOMAN_TPU_VIZ_DEVICE", "cpu")


def _viz_device_ctx():
    try:
        return jax.default_device(jax.devices(VIZ_DEVICE)[0])
    except RuntimeError:  # backend not present: keep the session default
        return contextlib.nullcontext()


def rotate_in_place(verts: np.ndarray, axis=(1.0, 0.0, 0.0),
                    angle_deg: float = 90.0) -> np.ndarray:
    """Rotate a scene about its centroid (libyana trans3d.rot_points role:
    top-down views, homan/visualize.py:92-104)."""
    from scipy.spatial.transform import Rotation
    R = Rotation.from_rotvec(np.deg2rad(angle_deg) * np.asarray(axis))
    R = R.as_matrix().astype(np.float32)
    center = verts.reshape(-1, 3).mean(0)
    return (verts - center) @ R.T + center


def composite(render_rgb: np.ndarray, render_sil: np.ndarray,
              image: Optional[np.ndarray]) -> np.ndarray:
    """Overlay a render onto an image via its silhouette
    (homan/utils/nmr_renderer.py:220-244 role)."""
    if image is None:
        return (np.clip(render_rgb, 0, 1) * 255).astype(np.uint8)
    img = np.asarray(image, np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    if img.shape[:2] != render_rgb.shape[:2]:
        img = resize_image(img, render_rgb.shape[0])
    mask = render_sil[..., None].astype(np.float32)
    out = render_rgb * mask + img * (1 - mask)
    return (np.clip(out, 0, 1) * 255).astype(np.uint8)


def resize_image(img: np.ndarray, size: int) -> np.ndarray:
    from PIL import Image
    pil = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
    return np.asarray(pil.resize((size, size))) / 255.0


def render_scene(verts_list: Sequence[np.ndarray],
                 faces_list: Sequence[np.ndarray],
                 color_names: Sequence[str],
                 K: jnp.ndarray,
                 image_size: int = 256,
                 images: Optional[Sequence[np.ndarray]] = None,
                 rotate: bool = False,
                 max_in_batch: int = 10) -> List[np.ndarray]:
    """Flat-colored scene render over a clip, composited onto frames.

    Args:
      verts_list: per part (B, V_i, 3); faces_list: per part (F_i, 3).
      K: (B, 3, 3) normalized intrinsics.
    Returns list of (S, S, 3) uint8 frames.
    """
    B = verts_list[0].shape[0]
    verts_np = [np.asarray(v, np.float32) for v in verts_list]
    scene_verts = np.concatenate(verts_np, axis=1)
    if rotate:
        scene_verts = np.stack([rotate_in_place(v) for v in scene_verts])
    faces_packed, colors = mesh_lib.get_faces_and_textures(
        [v[:1] for v in verts_np], faces_list, color_names)
    # faces are per-part offsets into a per-frame concatenated vertex buffer
    K_np = np.asarray(K, np.float32)
    colors_np = np.asarray(colors[0], np.float32)
    faces_np = np.asarray(faces_packed[0])

    from homan_tpu import native as native_lib
    if native_lib.raster_available() and VIZ_DEVICE == "cpu":
        # Pure host path: ~1 ms/frame, no compile at all (bit-identical to
        # rasterize_hard; see tests/test_native.py).
        frames = []
        for i in range(B):
            out = native_lib.raster_phong(scene_verts[i], faces_np, K_np[i],
                                          colors_np, image_size=image_size)
            img = images[i] if images is not None else None
            frames.append(composite(out["rgb"],
                                    out["sil"].astype(np.float32), img))
        return frames

    topo = MeshTopology.from_faces(faces_np)
    settings = RasterSettings(
        image_size=image_size,
        faces_per_tile=min(2048, faces_packed.shape[1] + 64),
        edges_per_tile=256)
    frames = []
    for start in range(0, B, max_in_batch):
        sl = slice(start, min(start + max_in_batch, B))
        with _viz_device_ctx():
            out = rasterize_hard(jnp.asarray(scene_verts[sl]), topo,
                                 jnp.asarray(K_np[sl]),
                                 jnp.asarray(colors_np), settings)
            rgb = np.asarray(out["rgb"])
            sil = np.asarray(out["sil"])
        for i in range(rgb.shape[0]):
            img = images[start + i] if images is not None else None
            frames.append(composite(rgb[i], sil[i], img))
    return frames


def visualize_hand_object(state: M.HomanState, consts: M.HomanConsts,
                          cfg: M.HomanConfig,
                          images: Optional[Sequence[np.ndarray]] = None,
                          viz_len: int = 10,
                          image_size: int = 256,
                          verts_hand_gt=None,
                          verts_object_gt=None,
                          gt_only: bool = False):
    """(frontal, top_down) overlay renders (homan/visualize.py:44-128)."""
    # Pose the meshes on the viz device too: the getters are tiny programs,
    # but each distinct shape would otherwise pay a remote-TPU compile.
    state_h = jax.device_get(state)
    consts_h = jax.device_get(consts)
    with _viz_device_ctx():
        verts_object, _ = M.get_verts_object_jit(state_h, consts_h)
        verts_hand, _ = M.get_verts_hand_jit(state_h, consts_h, cfg)
    B = min(viz_len, verts_object.shape[0])
    obj_faces = np.asarray(consts.faces_object.faces)
    hand_faces = np.asarray(consts.faces_hand.faces)

    parts, faces, colors = [], [], []
    if not gt_only:
        parts.append(np.asarray(verts_object[:B]))
        faces.append(obj_faces)
        colors.append("gold")
        for h in range(cfg.hand_nb):
            parts.append(np.asarray(verts_hand[h::cfg.hand_nb][:B]))
            faces.append(hand_faces)
            colors.append("grey")
    if verts_object_gt is not None:
        parts.append(np.asarray(verts_object_gt[:B]))
        faces.append(obj_faces)
        colors.append("green")
    if verts_hand_gt is not None:
        gt = np.asarray(verts_hand_gt).reshape(-1, 778, 3)
        for h in range(cfg.hand_nb):
            parts.append(gt[h::cfg.hand_nb][:B])
            faces.append(hand_faces)
            colors.append("blue")

    K = consts.camintr[:B]
    frontal = render_scene(parts, faces, colors, K, image_size,
                           images=images[:B] if images is not None else None)
    top_down = render_scene(parts, faces, colors, K, image_size, rotate=True)
    return frontal, top_down


def turntable_frames(verts_list: Sequence[np.ndarray],
                     faces_list: Sequence[np.ndarray],
                     color_names: Sequence[str],
                     K: jnp.ndarray,
                     n_steps: int = 24,
                     image_size: int = 256,
                     axis=(0.0, 1.0, 0.0)) -> List[np.ndarray]:
    """360-degree turntable of one frame's scene (homan/viz/renderot.py
    rot_render role)."""
    frames = []
    for i in range(n_steps):
        angle = 360.0 * i / n_steps
        rotated = [np.stack([rotate_in_place(v, axis=axis, angle_deg=angle)
                             for v in np.asarray(part[:1])])
                   for part in verts_list]
        frames += render_scene(rotated, faces_list, color_names, K[:1],
                               image_size)
    return frames


def make_video(frames: Sequence[np.ndarray], path: str, fps: int = 24):
    """mp4/webm/gif writer (libyana np2vid + homan/eval/evalviz.py:7-47)."""
    frames = [np.asarray(f) for f in frames]
    if path.endswith(".gif"):
        from PIL import Image
        imgs = [Image.fromarray(f) for f in frames]
        imgs[0].save(path, save_all=True, append_images=imgs[1:],
                     duration=int(1000 / fps), loop=0)
        return path
    import cv2
    h, w = frames[0].shape[:2]
    fourcc = cv2.VideoWriter_fourcc(*("vp80" if path.endswith(".webm")
                                      else "mp4v"))
    writer = cv2.VideoWriter(path, fourcc, fps, (w, h))
    for f in frames:
        writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    writer.release()
    return path


def save_image_grid(rows: Dict[str, Sequence[np.ndarray]], path: str):
    """Labelled grid of image rows (homan/viz/viz_gtpred_points.py role)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    nrows = len(rows)
    ncols = max(len(v) for v in rows.values())
    fig, axes = plt.subplots(nrows, ncols,
                             figsize=(2.2 * ncols, 2.4 * nrows), squeeze=False)
    for r, (name, imgs) in enumerate(rows.items()):
        for c in range(ncols):
            ax = axes[r][c]
            ax.axis("off")
            if c < len(imgs) and imgs[c] is not None:
                ax.imshow(imgs[c])
            if c == 0:
                ax.set_title(name, fontsize=8)
    fig.tight_layout()
    fig.savefig(path, dpi=80)
    plt.close(fig)
    return path
