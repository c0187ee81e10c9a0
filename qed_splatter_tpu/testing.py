"""Synthetic scenes and helpers shared by tests and benchmarks."""

from __future__ import annotations

from typing import Tuple

import numpy as np


def random_scene(
    n: int = 256,
    seed: int = 0,
    spread: float = 1.0,
    scale_range: Tuple[float, float] = (0.02, 0.12),
) -> dict:
    """Random 3D gaussians in front of the origin, numpy host-side."""
    rng = np.random.default_rng(seed)
    means = rng.uniform(-spread, spread, size=(n, 3)).astype(np.float32)
    means[:, 2] += 3.0  # push in front of a camera looking down +z (OpenCV)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    scales = rng.uniform(*scale_range, size=(n, 3)).astype(np.float32)
    opacities = rng.uniform(0.3, 0.95, size=(n,)).astype(np.float32)
    colors = rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32)
    return dict(
        means=means, quats=quats, scales=scales,
        opacities=opacities, colors=colors,
    )


def simple_camera(width: int = 64, height: int = 48, f: float = 60.0):
    """Identity-pose OpenCV camera (world == camera, +z forward).

    Returns (viewmat [1,4,4], K [1,3,3]) as numpy float32.
    """
    viewmat = np.eye(4, dtype=np.float32)[None]
    K = np.array(
        [[f, 0.0, width / 2.0], [0.0, f, height / 2.0], [0.0, 0.0, 1.0]],
        dtype=np.float32,
    )[None]
    return viewmat, K


def orbit_c2w_opengl(
    radius: float, azimuth: float, elevation: float, target=(0.0, 0.0, 3.0)
) -> np.ndarray:
    """OpenGL camera-to-world orbiting ``target``, looking at it. [4, 4]."""
    target = np.asarray(target, dtype=np.float64)
    eye = target + radius * np.array(
        [
            np.cos(elevation) * np.sin(azimuth),
            np.sin(elevation),
            -np.cos(elevation) * np.cos(azimuth),
        ]
    )
    forward = target - eye
    forward /= np.linalg.norm(forward)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(forward, up)
    right /= np.linalg.norm(right)
    up = np.cross(right, forward)
    # OpenGL convention: camera looks down -z, y up.
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = up
    c2w[:3, 2] = -forward
    c2w[:3, 3] = eye
    return c2w.astype(np.float32)
