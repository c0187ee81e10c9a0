"""``qed-init-pc`` equivalent: depth-backprojected initialization pointcloud.

Re-implements the reference's offline tool (reference
create_init_pointcloud.py, registered at pyproject.toml:9) without Open3D:

Mode 1 (default): per-frame depth backprojection (batched XLA,
ops.backproject) with OpenGL->OpenCV extrinsics (create_init_pointcloud.py:
59-68), per-frame voxel downsample + PLY cache on disk for resume
(:193-194, 223-246), then a single-pass bounded-memory streaming merge
(this repo's replacement for the reference's pairwise disk tree, :101-145)
and a final voxel downsample (:260). Mode 2 (``colorize=True``): project
the cloud into all RGB-D frames as batched device programs with a
depth-consistency gate |measured - z| <= max(abs_tol, rel_tol * z)
(:353-354), average accepted samples into uint8 colors, unobserved points
stay black (:373-386). Writes the PLY and points ``transforms.json``'s
``ply_file_path`` at it (:393-400, 509-510).
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
from qed_splatter_tpu.ops.backproject import backproject_depth
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


def streaming_merge(
    ply_paths: List[Path],
    voxel_size: float = 0.03,
    max_points: int = 2_000_000,
    log=print,
) -> np.ndarray:
    """Single-pass bounded-memory merge of the cached per-frame clouds.

    Voxel downsampling is associative, so no pairwise disk tree is needed:
    fold frame clouds into one accumulator and re-voxelize whenever it
    exceeds ``max_points``. Memory stays O(max_points + largest frame);
    nothing intermediate touches disk (the per-frame PLY cache alone
    carries resume, since backprojection is the expensive phase). The
    reference's disk-based merge serves the same budgeted-merge contract
    (create_init_pointcloud.py:101-145) around Open3D clouds too big to
    hold in memory at once.
    """
    acc = np.empty((0, 3), np.float32)
    for i, p in enumerate(ply_paths):
        acc = np.concatenate([acc, read_ply(p).positions.astype(np.float32)])
        if len(acc) > max_points:
            before = len(acc)
            acc, _ = voxel_downsample(acc, voxel_size)
            log(f"  merge: re-voxelized {before} -> {len(acc)} points "
                f"after {i + 1}/{len(ply_paths)} frames")
    return acc


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
    merged = streaming_merge(
        frame_paths,
        voxel_size=args.merge_voxel_size, max_points=args.max_points, log=log,
    )
    pos, _ = voxel_downsample(merged, args.voxel_size)
    return PlyData(pos)


def _frame_w2c_opencv(frame: dict) -> np.ndarray:
    c2w = np.array(frame["transform_matrix"], dtype=np.float64)
    if c2w.shape == (3, 4):
        c2w = np.concatenate([c2w, [[0, 0, 0, 1]]], axis=0)
    w2c44 = np.eye(4, dtype=np.float32)
    w2c44[:3] = opengl_c2w_to_opencv_w2c(c2w)[:3]
    return w2c44


def colorize_pointcloud(args: InitPcArgs, pcd: PlyData, log=print,
                        frames_per_batch: int = 8) -> PlyData:
    """Average depth-consistent RGB samples into point colors.

    The projection + gather + consistency gate for a whole batch of frames
    runs as ONE device program (ops.backproject.colorize_points) — the
    host only decodes images and stacks them by resolution. Reference
    contract: create_init_pointcloud.py:340-389 (tol = max(abs, rel*z),
    mean of accepted samples, unobserved points stay black).
    """
    import jax.numpy as jnp
    from PIL import Image

    from qed_splatter_tpu.ops.backproject import colorize_points

    dataset_path = _resolve_dataset_path(args.data)
    contents = _load_transforms(dataset_path)
    positions = pcd.positions.astype(np.float32)
    n = len(positions)

    frames = [
        f for f in contents["frames"]
        if "depth_file_path" in f and "file_path" in f
        and (dataset_path / f["file_path"]).exists()
    ]
    log(f"Colorizing {n} points using {len(frames)} RGB-D frames...")

    def load_frame(frame):
        color = np.asarray(
            Image.open(dataset_path / frame["file_path"]).convert("RGB"),
            dtype=np.float32,
        ) / 255.0
        depth = load_depth(dataset_path / frame["depth_file_path"])
        depth = depth * args.depth_unit_scale_factor
        depth[~np.isfinite(depth) | (depth <= 0.0)] = 0.0
        if color.shape[:2] != depth.shape[:2]:
            return None
        return color, depth.astype(np.float32)

    # group homogeneous-resolution frames so each device call is a dense
    # [B, H, W] batch; one compiled program per distinct (B, H, W)
    pos_dev = jnp.asarray(positions)
    color_sum = np.zeros((n, 3), np.float64)
    color_count = np.zeros((n,), np.float64)
    by_size: dict = {}
    for frame in frames:
        loaded = load_frame(frame)
        if loaded is None:
            log("  Skipping frame with RGB/depth size mismatch")
            continue
        color, depth = loaded
        by_size.setdefault(depth.shape, []).append(
            (color, depth, _frame_w2c_opencv(frame),
             _frame_intrinsics(contents, frame))
        )
        for shape, batch in list(by_size.items()):
            if len(batch) >= frames_per_batch:
                s, c = _colorize_batch(pos_dev, batch, args, colorize_points)
                color_sum += s
                color_count += c
                by_size[shape] = []
    for batch in by_size.values():
        if batch:
            s, c = _colorize_batch(pos_dev, batch, args, colorize_points)
            color_sum += s
            color_count += c

    colored = color_count > 0
    if not colored.any():
        raise RuntimeError(
            "Colorize failed: no point passed the depth-consistency gate "
            "in any frame (check depth_unit_scale_factor / tolerances)."
        )
    colors = np.zeros((n, 3), dtype=np.uint8)
    mean = color_sum[colored] / color_count[colored, None]
    colors[colored] = np.clip(mean * 255.0, 0.0, 255.0).astype(np.uint8)
    log(
        f"Colored {int(colored.sum())}/{n} points "
        f"({100.0 * colored.sum() / n:.1f}%)"
    )
    return PlyData(positions, colors)


def _colorize_batch(pos_dev, batch, args: InitPcArgs, colorize_points):
    import jax.numpy as jnp

    colors, depths, w2cs, Ks = (np.stack(x) for x in zip(*batch))
    s, c = colorize_points(
        pos_dev, jnp.asarray(colors), jnp.asarray(depths),
        jnp.asarray(w2cs), jnp.asarray(Ks),
        jnp.float32(args.depth_max), jnp.float32(args.depth_tolerance),
        jnp.float32(args.depth_tolerance_rel),
    )
    return np.asarray(s, np.float64), np.asarray(c, np.float64)


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
