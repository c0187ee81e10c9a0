"""Voxel-grid downsampling (Open3D ``voxel_down_sample`` replacement).

Used by the init-pointcloud pipeline (reference create_init_pointcloud.py:
89, 193-194, 260) — points falling in the same voxel are averaged (positions
and, when present, colors), matching Open3D's averaging semantics.

Host-side numpy (the tool is offline / disk-bound); the hashing is a single
``np.unique`` over quantized coordinates.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def voxel_downsample(
    positions: np.ndarray,                  # [N, 3]
    voxel_size: float,
    colors: Optional[np.ndarray] = None,    # [N, 3] any dtype
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Average points (and colors) per voxel. Returns (pos, colors|None)."""
    if len(positions) == 0 or voxel_size <= 0:
        return positions, colors
    keys = np.floor(positions / voxel_size).astype(np.int64)
    # row-wise unique via structured view
    uniq, inverse = np.unique(keys, axis=0, return_inverse=True)
    m = len(uniq)
    counts = np.bincount(inverse, minlength=m).astype(np.float64)
    out_pos = np.zeros((m, 3), dtype=np.float64)
    for c in range(3):
        out_pos[:, c] = np.bincount(
            inverse, weights=positions[:, c], minlength=m
        )
    out_pos /= counts[:, None]
    out_colors = None
    if colors is not None:
        cf = colors.astype(np.float64)
        out_c = np.zeros((m, 3), dtype=np.float64)
        for c in range(3):
            out_c[:, c] = np.bincount(inverse, weights=cf[:, c], minlength=m)
        out_c /= counts[:, None]
        out_colors = out_c.astype(colors.dtype)
    return out_pos.astype(positions.dtype), out_colors
