"""Dataset factory (homan/getdataset.py:8-45): name -> (dataset, image_size)."""
from __future__ import annotations


def get_dataset(name: str, split: str = "val", frame_nb: int = 10,
                box_mode: str = "gt", chunk_step: int = 4, **kwargs):
    if name == "ho3d":
        from homan_tpu.data.ho3d import HO3D
        ds = HO3D(split=split, frame_nb=frame_nb, box_mode=box_mode,
                  chunk_step=chunk_step, **kwargs)
        return ds, 640
    if name == "core50":
        from homan_tpu.data.core50 import Core50
        ds = Core50(split=split, frame_nb=frame_nb, chunk_step=chunk_step,
                    **kwargs)
        return ds, 350
    if name == "epic":
        from homan_tpu.data.epic import Epic
        ds = Epic(frame_nb=frame_nb, **kwargs)
        return ds, 640
    raise ValueError(f"unknown dataset {name}; choose ho3d|core50|epic")
