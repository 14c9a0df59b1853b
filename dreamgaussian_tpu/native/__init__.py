"""ctypes loader for the native mesh toolchain (builds lazily with g++).

The .so is compiled on first use into this directory; the build is a
single translation unit with no external dependencies.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "mesh_tools.cpp")
_SO = os.path.join(_DIR, "libmesh_tools.so")
_LOCK = threading.Lock()
_LIB = None


def _build() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _SO,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _lib() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is None:
            if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            ):
                _build()
            lib = ctypes.CDLL(_SO)
            dp = ctypes.POINTER(ctypes.c_double)
            ip = ctypes.POINTER(ctypes.c_int32)
            lib.clean_mesh.argtypes = [
                dp, ctypes.c_int, ip, ctypes.c_int,
                ctypes.c_double, ctypes.c_double, dp, ip, ip, ip,
            ]
            lib.decimate_mesh.argtypes = [
                dp, ctypes.c_int, ip, ctypes.c_int, ctypes.c_int,
                dp, ip, ip, ip,
            ]
            lib.laplacian_smooth.argtypes = [
                dp, ctypes.c_int, ip, ctypes.c_int,
                ctypes.c_int, ctypes.c_double,
            ]
            lib.isotropic_remesh.argtypes = [
                dp, ctypes.c_int, ip, ctypes.c_int,
                ctypes.c_double, ctypes.c_int,
                dp, ctypes.c_int32, ip, ip, ctypes.c_int32, ip,
            ]
            _LIB = lib
    return _LIB


def _as_c(verts: np.ndarray, faces: np.ndarray):
    v = np.ascontiguousarray(verts, dtype=np.float64)
    f = np.ascontiguousarray(faces, dtype=np.int32)
    return v, f


def clean_mesh(
    verts: np.ndarray,
    faces: np.ndarray,
    weld_eps: float = 1e-6,
    min_comp_frac: float = 0.1,
) -> tuple[np.ndarray, np.ndarray]:
    """Weld near-duplicate vertices, drop degenerate faces, unreferenced
    vertices, and connected components smaller than ``min_comp_frac`` of
    the largest (reference clean_mesh, /root/reference/mesh_utils.py:88-147)."""
    v, f = _as_c(verts, faces)
    out_v = np.empty_like(v)
    out_f = np.empty_like(f)
    nv = np.zeros(1, np.int32)
    nf = np.zeros(1, np.int32)
    lib = _lib()
    ret = lib.clean_mesh(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(v),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(f),
        weld_eps, min_comp_frac,
        out_v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        nv.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        nf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    assert ret == 0
    return out_v[: nv[0]].copy(), out_f[: nf[0]].copy()


def decimate_mesh(
    verts: np.ndarray, faces: np.ndarray, target_faces: int
) -> tuple[np.ndarray, np.ndarray]:
    """Quadric edge-collapse to ~``target_faces`` faces
    (reference decimate_mesh, /root/reference/mesh_utils.py:44-85)."""
    v, f = _as_c(verts, faces)
    out_v = np.empty_like(v)
    out_f = np.empty_like(f)
    nv = np.zeros(1, np.int32)
    nf = np.zeros(1, np.int32)
    ret = _lib().decimate_mesh(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(v),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(f),
        int(target_faces),
        out_v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        nv.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        nf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    assert ret == 0
    return out_v[: nv[0]].copy(), out_f[: nf[0]].copy()


def isotropic_remesh(
    verts: np.ndarray, faces: np.ndarray, target_len: float,
    n_iter: int = 5,
) -> tuple[np.ndarray, np.ndarray]:
    """Botsch-Kobbelt isotropic explicit remeshing toward a uniform
    target edge length (the reference's pymeshlab remesh pass,
    /root/reference/mesh_utils.py:104-141; targetlen 0.015 at
    /root/reference/gs_renderer.py:309)."""
    v, f = _as_c(verts, faces)
    # Capacity: expected face count at the target length (equilateral
    # tiling of the surface area) with generous headroom.
    p0, p1, p2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(p1 - p0, p2 - p0), axis=1).sum()
    est_f = int(area / (np.sqrt(3) / 4.0 * target_len ** 2 + 1e-18))
    cap_f = max(len(f), est_f) * 3 + 1024
    cap_v = cap_f // 2 + 1024
    out_v = np.empty((cap_v, 3), np.float64)
    out_f = np.empty((cap_f, 3), np.int32)
    nv = np.zeros(1, np.int32)
    nf = np.zeros(1, np.int32)
    ret = _lib().isotropic_remesh(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(v),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(f),
        float(target_len), int(n_iter),
        out_v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), cap_v,
        nv.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap_f,
        nf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    assert ret == 0
    return out_v[: nv[0]].copy(), out_f[: nf[0]].copy()


def laplacian_smooth(
    verts: np.ndarray, faces: np.ndarray, n_iter: int = 2, lam: float = 0.5
) -> np.ndarray:
    """Uniform Laplacian smoothing (stand-in for isotropic remeshing)."""
    v, f = _as_c(verts, faces)
    ret = _lib().laplacian_smooth(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(v),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(f),
        int(n_iter), float(lam),
    )
    assert ret == 0
    return v
