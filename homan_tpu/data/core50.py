"""Core50 in-the-wild hand-object videos (no 3D GT).

Re-implementation of homan/datasets/core50.py + core50utils.py +
core50constants.py: sessions of a hand manipulating one of 50 objects
(10 categories x 5 instances), fit against ShapeNet exemplar meshes
normalized to an inscribed sphere and scaled per category
(core50.py:18-45). No 3D ground truth exists: hand verts are placeholders
(core50.py:205,218) and evaluation is qualitative/silhouette-based.

Category registry: Core50's 10 categories in order o1-o50; exemplar scale =
typical graspable size in meters. The exemplar mesh per class comes from the
`models` registry (paths into local_data ShapeNet dumps) and can be overridden.
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional

import numpy as np

from homan_tpu.core.meshes import load_obj, normalize_to_inscribed_sphere
from homan_tpu.data.chunking import chunk_vid_index, collate

# Core50 category layout: objects o1..o50, category i covers o(5i+1)..o(5i+5)
CATEGORIES = ["plug_adapter", "mobile_phone", "scissors", "light_bulb",
              "can", "glasses", "ball", "marker", "cup", "remote_control"]
# Typical object diameter in meters (exemplar normalization scale,
# core50constants registry role)
CATEGORY_SCALES = {
    "plug_adapter": 0.07, "mobile_phone": 0.15, "scissors": 0.18,
    "light_bulb": 0.11, "can": 0.12, "glasses": 0.16, "ball": 0.07,
    "marker": 0.14, "cup": 0.10, "remote_control": 0.17,
}
# Sessions s1..s11; hand side per session (the recordings alternate hands —
# core50constants.py session map role). Overridable at construction.
DEFAULT_SESSION_HANDS = {f"s{i}": ("left" if i % 2 == 0 else "right")
                         for i in range(1, 12)}
FOCAL_PX = 480.0  # fixed intrinsics (core50.py:253-260)


def object_category(obj_name: str) -> str:
    idx = int(obj_name.lstrip("o")) - 1
    return CATEGORIES[idx // 5]


def load_models(model_registry: Dict[str, str],
                scales: Optional[Dict[str, float]] = None) -> Dict[str, Dict]:
    """Load + normalize exemplar meshes (core50.py:18-45): center, scale so
    the mesh fits a sphere with the category's diameter."""
    scales = scales or CATEGORY_SCALES
    models = {}
    for cls, path in model_registry.items():
        if not os.path.exists(path):
            continue
        verts, faces = load_obj(path)
        verts = normalize_to_inscribed_sphere(verts, scale=scales.get(cls, 0.1))
        models[cls] = {"verts": verts, "faces": faces, "path": path}
    return models


class Core50:
    def __init__(self,
                 root: str = "local_data/datasets/core50",
                 model_registry: Optional[Dict[str, str]] = None,
                 split: str = "all",
                 mode: str = "chunk",
                 frame_nb: int = 10,
                 chunk_step: int = 4,
                 chunk_spacing: int = 100,
                 track: bool = True,
                 boxes_path: str = "data/boxes/boxes_core50_all.pkl",
                 session_hands: Optional[Dict[str, str]] = None,
                 use_cache: bool = True,
                 cache_folder: str = "data/cache",
                 load_img: bool = True):
        self.name = "core50"
        self.image_size = 350
        self.full_image_size = (350, 350)
        self.mode = mode
        self.track = track
        self.load_img = load_img
        self.root = root
        self.session_hands = session_hands or DEFAULT_SESSION_HANDS
        self.models = load_models(model_registry or {})

        # Tracked boxes are required when not re-tracking (core50.py:121-129)
        self.tracked_boxes = None
        if not track and os.path.exists(boxes_path):
            with open(boxes_path, "rb") as f:
                self.tracked_boxes = pickle.load(f)

        cache_path = os.path.join(cache_folder, f"{self.name}_{split}.pkl")
        if use_cache and os.path.exists(cache_path):
            with open(cache_path, "rb") as f:
                self.vid_rows = pickle.load(f)
        else:
            self.vid_rows = self._build_index()
            if use_cache and self.vid_rows:
                os.makedirs(cache_folder, exist_ok=True)
                with open(cache_path, "wb") as f:
                    pickle.dump(self.vid_rows, f)

        if mode == "vid":
            self.chunks = [dict(r, frame_idxs=list(range(r["frame_nb"])))
                           for r in self.vid_rows]
        else:
            self.chunks = chunk_vid_index(self.vid_rows, chunk_size=frame_nb,
                                          chunk_step=chunk_step,
                                          chunk_spacing=chunk_spacing)

    def _build_index(self) -> List[Dict]:
        """Walk {root}/{session}/{object}/ image folders
        (core50utils.py:15-112 role)."""
        rows = []
        if not os.path.isdir(self.root):
            return rows
        for session in sorted(os.listdir(self.root)):
            spath = os.path.join(self.root, session)
            if not os.path.isdir(spath) or session not in self.session_hands:
                continue
            for obj in sorted(os.listdir(spath)):
                opath = os.path.join(spath, obj)
                if not os.path.isdir(opath):
                    continue
                frames = sorted(f for f in os.listdir(opath)
                                if f.endswith((".png", ".jpg")))
                if frames:
                    rows.append({
                        "session": session, "object": obj,
                        "frame_nb": len(frames),
                        "frames": [os.path.join(opath, f) for f in frames],
                        "hand_side": self.session_hands[session],
                        "class": object_category(obj),
                    })
        return rows

    def __len__(self):
        return len(self.chunks)

    def get_camintr(self):
        c = self.image_size / 2
        return np.array([[FOCAL_PX, 0, c], [0, FOCAL_PX, c], [0, 0, 1]],
                        np.float64)

    def __getitem__(self, idx):
        chunk = self.chunks[idx]
        frame_idxs = chunk["frame_idxs"]
        images = []
        for fi in frame_idxs:
            if self.load_img:
                from PIL import Image
                images.append(np.asarray(
                    Image.open(chunk["frames"][fi]).convert("RGB")))
            else:
                images.append(None)
        side = chunk["hand_side"] + "_hand"
        setup = {side: 1, "objects": 1}
        model = self.models.get(chunk["class"])
        T = len(frame_idxs)
        hands = [{
            "label": side,
            # No GT: placeholder verts, like the reference (core50.py:205,218)
            "verts3d": np.zeros((T, 778, 3), np.float32),
        }]
        objects = [{
            "canverts3d": (np.tile(model["verts"][None], (T, 1, 1))
                           if model else None),
            "faces": (np.tile(model["faces"][None], (T, 1, 1))
                      if model else None),
            "name": chunk["class"],
        }]
        boxes = None
        if self.tracked_boxes is not None:
            key = (chunk["session"], chunk["object"])
            boxes = self.tracked_boxes.get(key)
        if boxes is not None:
            hands[0]["bbox"] = np.stack(
                [boxes[side][fi] for fi in frame_idxs]).astype(np.float32)
            objects[0]["bbox"] = np.stack(
                [boxes["objects"][fi] for fi in frame_idxs]).astype(np.float32)
        return {
            "images": images,
            "hands": hands,
            "objects": objects,
            "camera": {"K": np.tile(self.get_camintr()[None], (T, 1, 1))},
            "setup": setup,
            "frame_idxs": frame_idxs,
            "seq_idx": f"{chunk['session']}_{chunk['object']}",
        }
