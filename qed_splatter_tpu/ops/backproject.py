"""Batched depth-map unprojection and point projection (XLA).

TPU-native replacement for the reference init tool's per-frame Open3D
``create_from_depth_image`` loop and numpy ``_project_points``
(reference create_init_pointcloud.py:148-196, 264-281; SURVEY §3 stack C
"TPU build: batched XLA unproject"). One fused jit per image size.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("stride",))
def backproject_depth(
    depth: jnp.ndarray,      # [H, W] metric depth (0/neg = invalid)
    K: jnp.ndarray,          # [3, 3] intrinsics
    c2w_cv: jnp.ndarray,     # [4, 4] OpenCV camera-to-world (inv of w2c)
    depth_max: float,
    stride: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unproject a depth map to world points.

    Returns (points [P, 3], valid [P]) with P = ceil(H/stride)*ceil(W/stride);
    invalid entries carry zeros. Pixel centers at (u + 0.5, v + 0.5) match
    the rasterizer's pixel-center convention.
    """
    d = depth[::stride, ::stride]
    h, w = d.shape
    vs = (jnp.arange(h, dtype=jnp.float32) * stride + 0.5)
    us = (jnp.arange(w, dtype=jnp.float32) * stride + 0.5)
    uu, vv = jnp.meshgrid(us, vs)                     # [h, w]
    z = d.reshape(-1)
    valid = jnp.isfinite(z) & (z > 0.0) & (z <= depth_max)
    z = jnp.where(valid, z, 0.0)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    x = (uu.reshape(-1) - cx) / fx * z
    y = (vv.reshape(-1) - cy) / fy * z
    p_cam = jnp.stack([x, y, z], axis=-1)             # [P, 3]
    R = c2w_cv[:3, :3]
    t = c2w_cv[:3, 3]
    p_world = jnp.matmul(p_cam, R.T,
                         precision=jax.lax.Precision.HIGHEST) + t
    p_world = jnp.where(valid[:, None], p_world, 0.0)
    return p_world, valid


@jax.jit
def colorize_points(
    positions: jnp.ndarray,  # [N, 3] world
    images: jnp.ndarray,     # [B, H, W, 3] float in [0, 1]
    depths: jnp.ndarray,     # [B, H, W] metric depth (0/neg = invalid)
    w2c: jnp.ndarray,        # [B, 4, 4] OpenCV world-to-camera
    Ks: jnp.ndarray,         # [B, 3, 3]
    depth_max: jnp.ndarray,  # scalar
    abs_tol: jnp.ndarray,    # scalar: depth consistency |measured - z| gate
    rel_tol: jnp.ndarray,    # scalar: relative part, tol = max(abs, rel*z)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Project a pointcloud into a batch of RGB-D frames and accumulate
    depth-consistent color samples — the whole frame batch in one fused
    device program (replaces a per-frame host loop; reference semantics:
    create_init_pointcloud.py:340-389, tol = max(abs_tol, rel_tol * z)).

    Returns (color_sum [N, 3] float32, count [N] float32); callers divide
    to get mean colors and chunk the frame dim to bound memory.
    """
    _, h, w, _ = images.shape

    def one_frame(img, depth, w2c_f, K):
        p_cam = jnp.matmul(positions, w2c_f[:3, :3].T,
                           precision=jax.lax.Precision.HIGHEST
                           ) + w2c_f[:3, 3]
        z = p_cam[:, 2]
        zok = jnp.isfinite(z) & (z > 1e-6) & (z <= depth_max)
        z_safe = jnp.where(zok, z, 1.0)
        u = K[0, 0] * (p_cam[:, 0] / z_safe) + K[0, 2]
        v = K[1, 1] * (p_cam[:, 1] / z_safe) + K[1, 2]
        inside = (
            jnp.isfinite(u) & jnp.isfinite(v)
            & (u >= -0.5) & (u < w - 0.5) & (v >= -0.5) & (v < h - 0.5)
        )
        ui = jnp.clip(jnp.rint(u).astype(jnp.int32), 0, w - 1)
        vi = jnp.clip(jnp.rint(v).astype(jnp.int32), 0, h - 1)
        measured = depth[vi, ui]
        tol = jnp.maximum(abs_tol, rel_tol * z_safe)
        ok = (
            zok & inside & (measured > 0.0)
            & (jnp.abs(measured - z_safe) <= tol)
        )
        col = img[vi, ui]                                  # [N, 3]
        return jnp.where(ok[:, None], col, 0.0), ok.astype(jnp.float32)

    sums, counts = jax.vmap(one_frame)(images, depths, w2c, Ks)
    return jnp.sum(sums, axis=0), jnp.sum(counts, axis=0)


@jax.jit
def project_points(
    positions: jnp.ndarray,  # [N, 3] world
    w2c: jnp.ndarray,        # [4, 4] OpenCV world-to-camera
    K: jnp.ndarray,          # [3, 3]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """World points -> pixel (u, v) + camera z; matches the semantics of
    reference create_init_pointcloud.py:264-281 (invalid -> nan u/v)."""
    p_cam = jnp.matmul(positions, w2c[:3, :3].T,
                       precision=jax.lax.Precision.HIGHEST) + w2c[:3, 3]
    z = p_cam[:, 2]
    valid = jnp.isfinite(z) & (z > 1e-6)
    z_safe = jnp.where(valid, z, 1.0)
    u = K[0, 0] * (p_cam[:, 0] / z_safe) + K[0, 2]
    v = K[1, 1] * (p_cam[:, 1] / z_safe) + K[1, 2]
    nan = jnp.float32(jnp.nan)
    u = jnp.where(valid & jnp.isfinite(u), u, nan)
    v = jnp.where(valid & jnp.isfinite(v), v, nan)
    return u, v, z
