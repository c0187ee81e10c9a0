"""``qed-init-pc`` equivalent: depth-backprojected initialization pointcloud.

Re-implements the reference's offline tool (reference
create_init_pointcloud.py, registered at pyproject.toml:9) without Open3D:

Mode 1 (default): per-frame depth backprojection (batched XLA,
ops.backproject) with OpenGL->OpenCV extrinsics (create_init_pointcloud.py:
59-68), per-frame voxel downsample + PLY cache on disk (:193-194, 223-246),
pairwise tree-merge on disk with level directories, resume-by-existence and
downsampling past ``max_points`` (:101-145), then a final voxel downsample
(:260). Mode 2 (``colorize=True``): project an existing cloud into every
RGB-D frame with a depth-consistency gate |measured - z| <= max(abs_tol,
rel_tol * z) (:353-354), average accepted samples into uint8 colors,
unobserved points stay black (:373-386). Writes the PLY and points
``transforms.json``'s ``ply_file_path`` at it (:393-400, 509-510).
"""

from __future__ import annotations

import dataclasses
import json
import shutil
from pathlib import Path
from typing import List, Optional

import numpy as np

from qed_splatter_tpu.data.dataset import load_depth
from qed_splatter_tpu.data.ply import PlyData, read_ply, write_ply
from qed_splatter_tpu.ops.backproject import backproject_depth, project_points
from qed_splatter_tpu.ops.camera import opengl_c2w_to_opencv_w2c
from qed_splatter_tpu.native import voxel_downsample_native as voxel_downsample


@dataclasses.dataclass
class InitPcArgs:
    """CLI arguments — mirrors the reference Args dataclass
    (create_init_pointcloud.py:403-440)."""

    data: str = ""
    colorize: bool = False
    input_name: str = "sparse_pc.ply"
    output_name: str = "sparse_pc.ply"
    depth_unit_scale_factor: float = 0.001
    cache_dir: Optional[str] = None
    keep_cache: bool = True
    voxel_size: float = 0.05
    merge_voxel_size: float = 0.03
    frame_voxel_size: Optional[float] = 0.05
    max_points: int = 2_000_000
    depth_max: float = 100.0
    stride: int = 4
    depth_tolerance: float = 0.05
    depth_tolerance_rel: float = 0.02
    update_transforms: bool = True


def _resolve_dataset_path(data: str) -> Path:
    path = Path(data).expanduser().resolve()
    if path.is_file() and path.name == "transforms.json":
        return path.parent
    if path.is_dir():
        return path
    raise ValueError(f"Expected a dataset directory or transforms.json: {data}")


def _load_transforms(dataset_path: Path) -> dict:
    p = dataset_path / "transforms.json"
    if not p.exists():
        raise FileNotFoundError(f"No transforms.json found at {p}")
    with open(p, encoding="utf-8") as f:
        return json.load(f)


def _frame_intrinsics(contents: dict, frame: dict) -> np.ndarray:
    fl_x = float(frame.get("fl_x", contents["fl_x"]))
    fl_y = float(frame.get("fl_y", contents.get("fl_y", fl_x)))
    cx = float(frame.get("cx", contents["cx"]))
    cy = float(frame.get("cy", contents["cy"]))
    return np.array(
        [[fl_x, 0.0, cx], [0.0, fl_y, cy], [0.0, 0.0, 1.0]], dtype=np.float32
    )


def backproject_frame_np(
    dataset_path: Path,
    contents: dict,
    frame: dict,
    depth_unit_scale_factor: float,
    depth_max: float,
    stride: int,
    frame_voxel_size: Optional[float],
) -> Optional[np.ndarray]:
    """One frame -> world points [P, 3] (None when no valid depth)."""
    if "depth_file_path" not in frame:
        return None
    depth_path = dataset_path / frame["depth_file_path"]
    depth = load_depth(depth_path) * depth_unit_scale_factor
    depth[~np.isfinite(depth)] = 0.0
    depth[depth <= 0.0] = 0.0
    if not np.any(depth > 0.0):
        return None

    c2w = np.array(frame["transform_matrix"], dtype=np.float64)
    if c2w.shape == (3, 4):
        c2w = np.concatenate([c2w, [[0, 0, 0, 1]]], axis=0)
    w2c = opengl_c2w_to_opencv_w2c(c2w)
    c2w_cv = np.linalg.inv(w2c.astype(np.float64)).astype(np.float32)
    K = _frame_intrinsics(contents, frame)

    pts, valid = backproject_depth(
        depth.astype(np.float32), K, c2w_cv, depth_max, stride=stride
    )
    pts = np.asarray(pts)[np.asarray(valid)]
    if len(pts) == 0:
        return None
    if frame_voxel_size is not None and frame_voxel_size > 0:
        pts, _ = voxel_downsample(pts, frame_voxel_size)
    return pts


def tree_merge_on_disk(
    ply_paths: List[Path],
    merge_dir: Path,
    voxel_size: float = 0.03,
    max_points: int = 2_000_000,
    log=print,
) -> Path:
    """Pairwise disk merge with resumable levels
    (create_init_pointcloud.py:101-145)."""
    merge_dir.mkdir(parents=True, exist_ok=True)
    current = list(ply_paths)
    level = 0
    while len(current) > 1:
        level_dir = merge_dir / f"level_{level:03d}"
        level_dir.mkdir(parents=True, exist_ok=True)
        next_level: List[Path] = []
        log(f"Tree-merge level {level}: {len(current)} clouds")
        for i in range(0, len(current), 2):
            out_path = level_dir / f"merged_{i // 2:06d}.ply"
            if out_path.exists():
                next_level.append(out_path)
                continue
            if i + 1 < len(current):
                left = read_ply(current[i])
                right = read_ply(current[i + 1])
                pos = np.concatenate([left.positions, right.positions])
                if len(pos) > max_points:
                    pos, _ = voxel_downsample(pos, voxel_size)
                write_ply(out_path, pos)
            else:
                shutil.copy2(current[i], out_path)
            next_level.append(out_path)
        current = next_level
        level += 1
    return current[0]


def create_pointcloud_from_transforms(args: InitPcArgs, log=print) -> PlyData:
    dataset_path = _resolve_dataset_path(args.data)
    contents = _load_transforms(dataset_path)
    cache_dir = (
        Path(args.cache_dir).expanduser().resolve()
        if args.cache_dir else dataset_path / "init_pc_cache"
    )
    frames_dir = cache_dir / "frames"
    frames_dir.mkdir(parents=True, exist_ok=True)

    frame_paths: List[Path] = []
    for idx, frame in enumerate(contents["frames"]):
        if "depth_file_path" not in frame:
            continue
        out_path = frames_dir / f"frame_{idx:06d}.ply"
        if out_path.exists():  # resume-by-existence (:224-227)
            frame_paths.append(out_path)
            continue
        pts = backproject_frame_np(
            dataset_path, contents, frame,
            args.depth_unit_scale_factor, args.depth_max,
            args.stride, args.frame_voxel_size,
        )
        if pts is None:
            log(f"  Skipping frame {idx} (no valid depth)")
            continue
        write_ply(out_path, pts)
        log(f"  Backprojected frame {idx}: {len(pts)} points")
        frame_paths.append(out_path)

    if not frame_paths:
        raise RuntimeError(
            "No valid point clouds could be generated from the dataset."
        )
    merged_path = tree_merge_on_disk(
        frame_paths, cache_dir / "merge",
        voxel_size=args.merge_voxel_size, max_points=args.max_points, log=log,
    )
    merged = read_ply(merged_path)
    pos, _ = voxel_downsample(merged.positions, args.voxel_size)
    return PlyData(pos)


def colorize_pointcloud(args: InitPcArgs, pcd: PlyData, log=print) -> PlyData:
    dataset_path = _resolve_dataset_path(args.data)
    contents = _load_transforms(dataset_path)
    positions = pcd.positions.astype(np.float32)
    n = len(positions)
    color_sum = np.zeros((n, 3), dtype=np.float64)
    color_count = np.zeros((n,), dtype=np.int64)

    frames = [
        f for f in contents["frames"]
        if "depth_file_path" in f and "file_path" in f
    ]
    log(f"Colorizing {n} points using {len(frames)} RGB-D frames...")
    from PIL import Image

    for fi, frame in enumerate(frames):
        image_path = dataset_path / frame["file_path"]
        if not image_path.exists():
            continue
        color = np.asarray(
            Image.open(image_path).convert("RGB"), dtype=np.float32
        ) / 255.0
        depth = load_depth(dataset_path / frame["depth_file_path"])
        depth = depth * args.depth_unit_scale_factor
        depth[~np.isfinite(depth)] = 0.0
        depth[depth <= 0.0] = 0.0
        h, w = depth.shape[:2]
        if color.shape[:2] != (h, w):
            log(f"  Skipping size mismatch at frame {fi}")
            continue

        c2w = np.array(frame["transform_matrix"], dtype=np.float64)
        if c2w.shape == (3, 4):
            c2w = np.concatenate([c2w, [[0, 0, 0, 1]]], axis=0)
        w2c44 = np.eye(4, dtype=np.float32)
        w2c44[:3] = opengl_c2w_to_opencv_w2c(c2w)[:3]
        K = _frame_intrinsics(contents, frame)
        u, v, z = (np.asarray(a) for a in project_points(positions, w2c44, K))

        candidate = (
            np.isfinite(u) & np.isfinite(v) & np.isfinite(z)
            & (z > 0.0) & (z <= args.depth_max)
            & (u >= -0.5) & (u < (w - 0.5))
            & (v >= -0.5) & (v < (h - 0.5))
        )
        if not candidate.any():
            continue
        idx = np.flatnonzero(candidate)
        ui = np.rint(u[idx]).astype(np.int32).clip(0, w - 1)
        vi = np.rint(v[idx]).astype(np.int32).clip(0, h - 1)
        zv = z[idx]
        measured = depth[vi, ui]
        tol = np.maximum(args.depth_tolerance, args.depth_tolerance_rel * zv)
        ok = (measured > 0.0) & (np.abs(measured - zv) <= tol)
        hit = idx[ok]
        color_sum[hit] += color[vi[ok], ui[ok]]
        color_count[hit] += 1

    colored = color_count > 0
    if not colored.any():
        raise RuntimeError("No points received color from any RGB frame.")
    colors = np.zeros((n, 3), dtype=np.uint8)
    colors[colored] = (
        (color_sum[colored] / color_count[colored, None] * 255.0)
        .clip(0.0, 255.0).astype(np.uint8)
    )
    log(
        f"Colored {int(colored.sum())}/{n} points "
        f"({100.0 * colored.sum() / n:.1f}%)"
    )
    return PlyData(positions, colors)


def _update_transforms_ply_path(dataset_path: Path, output_name: str) -> None:
    p = dataset_path / "transforms.json"
    with open(p, encoding="utf-8") as f:
        contents = json.load(f)
    contents["ply_file_path"] = output_name
    with open(p, "w", encoding="utf-8") as f:
        json.dump(contents, f, indent=4)


def main(args: InitPcArgs, log=print) -> Path:
    dataset_path = _resolve_dataset_path(args.data)
    output_path = dataset_path / args.output_name

    if args.colorize:
        input_path = dataset_path / args.input_name
        if not input_path.exists():
            raise FileNotFoundError(
                f"Input point cloud not found: {input_path}. "
                "Run without colorize first to backproject depth."
            )
        pcd = colorize_pointcloud(args, read_ply(input_path), log=log)
    else:
        pcd = create_pointcloud_from_transforms(args, log=log)
        cache_dir = (
            Path(args.cache_dir).expanduser().resolve()
            if args.cache_dir else dataset_path / "init_pc_cache"
        )
        if not args.keep_cache and cache_dir.exists():
            shutil.rmtree(cache_dir)

    log(f"Writing {len(pcd)} points to {output_path}")
    write_ply(output_path, pcd.positions, pcd.colors)
    if args.update_transforms:
        _update_transforms_ply_path(dataset_path, args.output_name)
    return output_path
