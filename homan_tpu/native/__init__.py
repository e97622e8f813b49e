"""Native host-side mesh/image ops (C++ via ctypes) with python fallbacks.

Build once with `python -m homan_tpu.native.build`; until then every entry
point transparently falls back to the pure-python implementations in
homan_tpu.core.meshes / scipy.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_LIB_PATH = os.path.join(os.path.dirname(__file__), "libmeshops.so")


def load_library():
    global _LIB
    if _LIB is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.edt2d_squared.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int]
        lib.decimate_qem.restype = ctypes.c_int
        lib.decimate_qem.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int)]
        lib.obj_count.restype = ctypes.c_int
        lib.obj_count.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_int)]
        lib.obj_parse.restype = ctypes.c_int
        lib.obj_parse.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_float),
                                  ctypes.POINTER(ctypes.c_int32)]
        if hasattr(lib, "raster_phong"):  # older prebuilt .so without it
            lib.raster_phong.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.c_float, ctypes.POINTER(ctypes.c_float),
                ctypes.c_float, ctypes.c_float, ctypes.c_float,
                ctypes.c_float, ctypes.c_float, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_uint8)]
        _LIB = lib
    return _LIB


def available() -> bool:
    return load_library() is not None


def edt2d_squared(mask: np.ndarray) -> np.ndarray:
    """Exact squared EDT to the nearest nonzero pixel."""
    lib = load_library()
    m = np.ascontiguousarray(np.asarray(mask) != 0, np.uint8)
    if lib is None:
        from scipy.ndimage import distance_transform_edt
        return distance_transform_edt(~m.astype(bool)).astype(np.float64) ** 2
    h, w = m.shape
    out = np.empty((h, w), np.float32)
    lib.edt2d_squared(m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                      out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                      h, w)
    return out.astype(np.float64)


def decimate(verts: np.ndarray, faces: np.ndarray, target_faces: int):
    """Quadric edge-collapse decimation; vertex-clustering fallback."""
    lib = load_library()
    if lib is None:
        from homan_tpu.core.meshes import decimate as py_decimate
        return py_decimate(verts, faces, target_faces)
    v = np.ascontiguousarray(verts, np.float32)
    f = np.ascontiguousarray(faces, np.int32)
    nv, nf = v.shape[0], f.shape[0]
    if nf <= target_faces:
        return v, f
    v_out = np.empty_like(v)
    f_out = np.empty_like(f)
    out_nv = ctypes.c_int(0)
    nf_out = lib.decimate_qem(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nv,
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), nf,
        int(target_faces),
        v_out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        f_out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(out_nv))
    return (v_out[: out_nv.value].copy(), f_out[:nf_out].copy())


def raster_available() -> bool:
    lib = load_library()
    return lib is not None and hasattr(lib, "raster_phong")


def raster_phong(verts: np.ndarray, faces: np.ndarray, K: np.ndarray,
                 face_colors: np.ndarray | None = None, image_size: int = 256,
                 znear: float = 1e-4,
                 light_dir=(0.57735, 0.57735, -0.57735),
                 ambient: float = 0.55, diffuse: float = 0.45,
                 specular: float = 0.2, shininess: float = 32.0,
                 background: float = 1.0, shading: str = "phong"):
    """Host-side hard z-buffer render of ONE frame; no jax involved.

    Same conventions/outputs as render.rasterizer.rasterize_hard (normalized
    K, (i+0.5)/S pixel centers, two-sided Blinn-Phong); returns a dict with
    rgb (S, S, 3) float32, depth (S, S) float32, sil (S, S) bool. Raises
    RuntimeError when the native library lacks the kernel — callers fall
    back to the XLA path.
    """
    lib = load_library()
    if lib is None or not hasattr(lib, "raster_phong"):
        raise RuntimeError("libmeshops.so without raster_phong; rebuild with "
                           "python -m homan_tpu.native.build")
    v = np.ascontiguousarray(verts, np.float32)
    f = np.ascontiguousarray(faces, np.int32)
    k = np.ascontiguousarray(K, np.float32)
    fc = (np.ascontiguousarray(face_colors, np.float32)
          if face_colors is not None else None)
    light = np.ascontiguousarray(light_dir, np.float32)
    S = int(image_size)
    rgb = np.empty((S, S, 3), np.float32)
    depth = np.empty((S, S), np.float32)
    sil = np.empty((S, S), np.uint8)
    fptr = ctypes.POINTER(ctypes.c_float)
    lib.raster_phong(
        v.ctypes.data_as(fptr), v.shape[0],
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), f.shape[0],
        k.ctypes.data_as(fptr),
        fc.ctypes.data_as(fptr) if fc is not None else fptr(),
        S, ctypes.c_float(znear), light.ctypes.data_as(fptr),
        ctypes.c_float(ambient), ctypes.c_float(diffuse),
        ctypes.c_float(specular), ctypes.c_float(shininess),
        ctypes.c_float(background), 1 if shading == "phong" else 0,
        rgb.ctypes.data_as(fptr), depth.ctypes.data_as(fptr),
        sil.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return {"rgb": rgb, "depth": depth, "sil": sil.astype(bool)}


def load_obj(path: str):
    """Fast OBJ vertex/face load; python fallback."""
    lib = load_library()
    if lib is None:
        from homan_tpu.core.meshes import load_obj as py_load
        return py_load(path)
    nv = ctypes.c_int(0)
    nf = ctypes.c_int(0)
    if lib.obj_count(path.encode(), ctypes.byref(nv), ctypes.byref(nf)):
        raise FileNotFoundError(path)
    verts = np.empty((nv.value, 3), np.float32)
    faces = np.empty((nf.value, 3), np.int32)
    lib.obj_parse(path.encode(),
                  verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                  faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return verts, faces
