"""ctypes bindings for the native geometry core (native/qedcore.cpp).

Loads ``native/libqedcore.so`` when present (build with
``native/build.sh``); every entry point has a pure numpy/JAX fallback so the
package works without a toolchain. The native paths back the host-side
pieces the reference delegated to Open3D: voxel downsampling, point-cloud
NN distances (PDMetrics), and depth backprojection.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False


def _find_lib() -> Optional[Path]:
    env = os.environ.get("QEDCORE_LIB")
    if env and Path(env).exists():
        return Path(env)
    here = Path(__file__).resolve().parent
    for cand in (
        here.parent / "native" / "libqedcore.so",
        here / "libqedcore.so",
    ):
        if cand.exists():
            return cand
    return None


def load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(str(path))
    except OSError:
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.qed_voxel_downsample.restype = ctypes.c_int64
    lib.qed_voxel_downsample.argtypes = [
        f32p, f32p, ctypes.c_int64, ctypes.c_float, f32p, f32p,
    ]
    lib.qed_nn_distances.restype = None
    lib.qed_nn_distances.argtypes = [
        f32p, ctypes.c_int64, f32p, ctypes.c_int64, ctypes.c_float, f32p,
    ]
    lib.qed_backproject.restype = None
    lib.qed_backproject.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int64, f32p, f32p,
        ctypes.c_float, ctypes.c_int64, f32p,
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return load() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def voxel_downsample_native(
    positions: np.ndarray, voxel_size: float,
    colors: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    lib = load()
    if lib is None:
        from qed_splatter_tpu.ops.voxel import voxel_downsample

        return voxel_downsample(positions, voxel_size, colors)
    pos = np.ascontiguousarray(positions, dtype=np.float32)
    n = len(pos)
    col = (
        np.ascontiguousarray(colors, dtype=np.float32)
        if colors is not None else None
    )
    out_p = np.empty_like(pos)
    out_c = np.empty((n, 3), np.float32) if col is not None else None
    m = lib.qed_voxel_downsample(
        _fp(pos), _fp(col) if col is not None else None, n,
        ctypes.c_float(voxel_size), _fp(out_p),
        _fp(out_c) if out_c is not None else None,
    )
    out_colors = None
    if col is not None:
        out_colors = out_c[:m].astype(colors.dtype)
    return out_p[:m], out_colors


def nn_distances_native(queries: np.ndarray, refs: np.ndarray,
                        cell_size: float = 0.0) -> np.ndarray:
    lib = load()
    if lib is None:
        import jax.numpy as jnp

        from qed_splatter_tpu.ops.knn import nn_distances

        return np.asarray(
            nn_distances(jnp.asarray(queries), jnp.asarray(refs))
        )
    q = np.ascontiguousarray(queries, dtype=np.float32)
    r = np.ascontiguousarray(refs, dtype=np.float32)
    out = np.empty((len(q),), np.float32)
    lib.qed_nn_distances(
        _fp(q), len(q), _fp(r), len(r), ctypes.c_float(cell_size), _fp(out)
    )
    return out


def backproject_native(
    depth: np.ndarray, K: np.ndarray, c2w_cv: np.ndarray,
    depth_max: float, stride: int = 1,
) -> np.ndarray:
    """World points [P, 3] with NaN rows for invalid pixels."""
    lib = load()
    if lib is None:
        import jax.numpy as jnp

        from qed_splatter_tpu.ops.backproject import backproject_depth

        pts, valid = backproject_depth(
            jnp.asarray(depth, jnp.float32), jnp.asarray(K, jnp.float32),
            jnp.asarray(c2w_cv, jnp.float32), depth_max, stride=stride,
        )
        pts = np.asarray(pts).copy()
        pts[~np.asarray(valid)] = np.nan
        return pts
    d = np.ascontiguousarray(depth, dtype=np.float32)
    h, w = d.shape
    Kc = np.ascontiguousarray(K, dtype=np.float32)
    c = np.ascontiguousarray(c2w_cv, dtype=np.float32)
    oh, ow = -(-h // stride), -(-w // stride)
    out = np.empty((oh * ow, 3), np.float32)
    lib.qed_backproject(
        _fp(d), h, w, _fp(Kc), _fp(c), ctypes.c_float(depth_max), stride,
        _fp(out),
    )
    return out
