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


def write_synthetic_dataset(
    root,
    num_frames: int = 6,
    width: int = 64,
    height: int = 48,
    depth_format: str = "npy",
    with_ply: bool = False,
    depth_unit: float = 1000.0,
    seed: int = 0,
) -> None:
    """Write a nerfstudio-style RGB-D dataset (transforms.json + images +
    depths) rendered from a simple analytic scene: a textured plane at
    z = 4 in front of orbiting cameras."""
    import json
    from pathlib import Path

    from PIL import Image

    root = Path(root)
    (root / "images").mkdir(parents=True, exist_ok=True)
    (root / "depth").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    f = 60.0
    frames = []
    for i in range(num_frames):
        az = 0.25 * (i / max(num_frames - 1, 1) - 0.5)
        c2w = orbit_c2w_opengl(2.0, az, 0.05, target=(0.0, 0.0, 3.0))
        # simple image: smooth gradient + noise blocks
        yy, xx = np.meshgrid(
            np.linspace(0, 1, height), np.linspace(0, 1, width), indexing="ij"
        )
        img = np.stack(
            [xx, yy, np.full_like(xx, 0.3 + 0.1 * i / num_frames)], axis=-1
        )
        img = (img * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "images" / f"frame_{i:04d}.png")
        depth_m = 2.0 + 0.5 * xx + 0.25 * yy  # metric depth in meters
        depth_raw = (depth_m * depth_unit).astype(np.float32)
        if depth_format == "npy":
            np.save(root / "depth" / f"frame_{i:04d}.npy", depth_raw)
            depth_name = f"depth/frame_{i:04d}.npy"
        else:
            Image.fromarray(depth_raw.astype(np.uint16)).save(
                root / "depth" / f"frame_{i:04d}.png"
            )
            depth_name = f"depth/frame_{i:04d}.png"
        frames.append(
            {
                "file_path": f"images/frame_{i:04d}.png",
                "depth_file_path": depth_name,
                "transform_matrix": c2w.tolist(),
            }
        )
    meta = {
        "fl_x": f, "fl_y": f,
        "cx": width / 2.0, "cy": height / 2.0,
        "w": width, "h": height,
        "frames": frames,
    }
    if with_ply:
        from qed_splatter_tpu.data.ply import write_ply

        pts = rng.uniform(-1, 1, size=(256, 3)).astype(np.float32)
        pts[:, 2] += 3.0
        cols = rng.uniform(0, 1, size=(256, 3)).astype(np.float32)
        write_ply(root / "sparse_pc.ply", pts, cols)
        meta["ply_file_path"] = "sparse_pc.ply"
    with open(root / "transforms.json", "w") as fh:
        json.dump(meta, fh, indent=2)


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
