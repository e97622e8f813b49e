"""Convert a reference (hassony2/homan) results tree into homan_tpu layout.

Walks {src}/samples/*/ and writes {dst}/samples/*/ with:
  * indep_fit.pkl   — the stage-1 payload converted via
                      frontend.adapters.convert_indep_fit (person/object
                      parameters in homan_tpu's stacked layout);
  * joint_fit.npz   — the joint-fit checkpoint converted from the torch
                      state_dict in joint_fit.pt (parameter names match
                      one to one, homan/homan.py:66-131).

The converted tree is directly consumable by `fit_video --resume` (continue
optimizing a reference fit on TPU) and `eval_ho3d` (score reference fits
with this framework's evaluation protocol).
"""
from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True, help="reference results root")
    p.add_argument("--dst", required=True, help="output root")
    return p.parse_args(argv)


def convert_tree(src: str, dst: str):
    from homan_tpu.frontend.adapters import (convert_indep_fit,
                                             convert_joint_fit_state)
    samples = os.path.join(src, "samples")
    converted = []
    for name in sorted(os.listdir(samples)) if os.path.isdir(samples) else []:
        sdir = os.path.join(samples, name)
        out_dir = os.path.join(dst, "samples", name)
        os.makedirs(out_dir, exist_ok=True)
        indep_path = os.path.join(sdir, "indep_fit.pkl")
        if os.path.exists(indep_path):
            with open(indep_path, "rb") as f:
                ref_indep = pickle.load(f)
            indep = convert_indep_fit(ref_indep)
            with open(os.path.join(out_dir, "indep_fit.pkl"), "wb") as f:
                pickle.dump(indep, f)
        joint_path = os.path.join(sdir, "joint_fit.pt")
        if os.path.exists(joint_path):
            import torch
            payload = torch.load(joint_path, map_location="cpu",
                                 weights_only=False)
            state_dict = payload.get("state_dict", payload)
            state = convert_joint_fit_state(state_dict)
            np.savez(os.path.join(out_dir, "joint_fit.npz"), **state)
        converted.append(name)
    print(f"Converted {len(converted)} samples from {src} to {dst}")
    return converted


def main(args):
    convert_tree(args.src, args.dst)


if __name__ == "__main__":
    main(get_args())
