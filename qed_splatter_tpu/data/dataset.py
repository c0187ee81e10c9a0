"""Full-image RGB-D datamanager.

Rebuilds SURVEY D7 (nerfstudio ``FullImageDatamanager[DepthDataset]``,
selected at reference config.py:34-38): whole-image training — one random
full camera + image per step (reference model.py:211 asserts one camera) —
with images cached as uint8 (config.py:37 ``cache_images_type="uint8"``),
depth maps loaded from ``depth_file_path`` scaled by
``depth_unit_scale_factor * pose_scale_factor`` into ``batch["depth_image"]``
(config.py:9,35; dataparser.py:15), and optional ``batch["mask"]``
(model.py:93).

Depth files may be ``.npy`` / ``.npz`` or 16-bit PNG images; 3-channel depth
collapses to the first channel (reference create_init_pointcloud.py:30-40).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from qed_splatter_tpu.configs import DataConfig
from qed_splatter_tpu.data.transforms_json import Frame, ParsedScene, parse_transforms


def load_depth(path: Path) -> np.ndarray:
    """Raw depth map as float32 [H, W] (reference create_init_pointcloud.py:30-40)."""
    suffix = path.suffix.lower()
    if suffix in {".npy", ".npz"}:
        depth = np.load(path)
        if isinstance(depth, np.lib.npyio.NpzFile):
            depth = depth[list(depth.keys())[0]]
        depth = depth.astype(np.float32)
    else:
        from PIL import Image

        depth = np.array(Image.open(path), dtype=np.float32)
    if depth.ndim == 3:
        depth = depth[..., 0]
    return depth


def load_image_uint8(path: Path, downscale: int = 1) -> np.ndarray:
    """RGB image as uint8 [H, W, 3]."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    if downscale > 1:
        img = img.resize(
            (img.width // downscale, img.height // downscale), Image.BILINEAR
        )
    return np.asarray(img, dtype=np.uint8)


def _resize_nearest(arr: np.ndarray, h: int, w: int) -> np.ndarray:
    ys = (np.arange(h) * arr.shape[0] / h).astype(int)
    xs = (np.arange(w) * arr.shape[1] / w).astype(int)
    return arr[ys][:, xs]


class FullImageDatamanager:
    """Caches every train/eval image host-side; serves one camera per step.

    ``next_train(step)`` mirrors nerfstudio's random-without-replacement
    epoch permutation over training cameras.
    """

    def __init__(self, cfg: DataConfig, scene: Optional[ParsedScene] = None,
                 seed: int = 0, process_index: int = 0,
                 process_count: int = 1):
        self.cfg = cfg
        self.scene = scene if scene is not None else parse_transforms(cfg)
        self.rng = np.random.default_rng(seed + process_index)
        self._cache: Dict[int, Dict] = {}
        self._perm: List[int] = []
        self.depth_scale = (
            self.scene.depth_unit_scale_factor * self.scene.scale_factor
        )
        # multi-host view sharding (SURVEY §2c): each host caches and
        # samples only its camera subset; gradients meet via collectives
        self.train_indices = self.scene.train_indices
        if process_count > 1:
            self.train_indices = self.train_indices[
                process_index::process_count
            ]
            if len(self.train_indices) == 0:
                self.train_indices = self.scene.train_indices[:1]

    @property
    def num_train(self) -> int:
        return len(self.train_indices)

    @property
    def num_eval(self) -> int:
        return len(self.scene.eval_indices)

    def _load(self, idx: int) -> Dict:
        if idx in self._cache:
            return self._cache[idx]
        frame: Frame = self.scene.frames[idx]
        d = self.cfg.downscale_factor or 1
        image = load_image_uint8(frame.image_path, downscale=d)
        cam = frame.camera.rescaled(1.0 / d) if d > 1 else frame.camera
        # undistort at cache time (nerfstudio D12 semantics): downstream
        # rendering assumes an ideal pinhole
        dist = cam.distortion
        if dist is not None:
            from qed_splatter_tpu.data.undistort import undistort_image

            image = undistort_image(image, cam.intrinsics_matrix(), dist,
                                    camera_model=cam.camera_model)
            cam = dataclasses.replace(cam, distortion=None)
        item: Dict = {
            "image": image,  # uint8 cache (reference config.py:37)
            "camera": cam,
            "cam_idx": idx,
        }
        if frame.depth_path is not None:
            depth = load_depth(frame.depth_path) * self.depth_scale
            depth[~np.isfinite(depth)] = 0.0
            if depth.shape[:2] != image.shape[:2]:
                depth = _resize_nearest(depth, image.shape[0], image.shape[1])
            if dist is not None:
                from qed_splatter_tpu.data.undistort import undistort_image

                depth = undistort_image(
                    depth, cam.intrinsics_matrix(), dist, nearest=True,
                    camera_model=cam.camera_model,
                )
            item["depth_image"] = depth[..., None].astype(np.float32)
        if frame.mask_path is not None:
            from PIL import Image

            m = np.asarray(
                Image.open(frame.mask_path).convert("L"), dtype=np.float32
            )
            if m.shape[:2] != image.shape[:2]:
                m = _resize_nearest(m, image.shape[0], image.shape[1])
            if dist is not None:
                from qed_splatter_tpu.data.undistort import undistort_image

                m = undistort_image(
                    m, cam.intrinsics_matrix(), dist, nearest=True,
                    camera_model=cam.camera_model,
                )
            item["mask"] = (m[..., None] > 127).astype(np.float32)
        self._cache[idx] = item
        return item

    def next_train(self, step: int) -> Dict:
        if not self._perm:
            self._perm = list(self.rng.permutation(self.train_indices))
        idx = int(self._perm.pop())
        return self._load(idx)

    def next_train_batch(self, step: int, n: int) -> List[Dict]:
        """n cameras for data-parallel steps (SURVEY §2c view-DP)."""
        return [self.next_train(step) for _ in range(n)]

    def eval_items(self):
        for idx in self.scene.eval_indices:
            yield self._load(int(idx))

    def get_item(self, idx: int) -> Dict:
        return self._load(int(idx))
