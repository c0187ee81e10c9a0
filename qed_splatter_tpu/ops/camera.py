"""Camera math: OpenGL <-> OpenCV conventions, view matrices, intrinsics.

Behavior contracts (reference = /root/reference/qed_splatter):
- ``get_viewmat``: model.py:22-38 — convert an OpenGL/Nerfstudio camera-to-world
  matrix into the rasterizer's world-to-camera (OpenCV-style, +z forward) by
  flipping the local y/z axes and taking the analytic rigid inverse.
- ``opengl_c2w_to_opencv_w2c``: create_init_pointcloud.py:59-68 — same flip
  expressed on a 4x4 numpy pose, used by the init-pointcloud tool.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

# Column flip that maps OpenGL (y-up, z-back) camera axes to OpenCV
# (y-down, z-forward). Multiplying R by this on the right negates the
# y and z basis vectors (reference model.py:20,29-30).
_FLIP_YZ = np.array([1.0, -1.0, -1.0], dtype=np.float32)


def get_viewmat(c2w: jnp.ndarray) -> jnp.ndarray:
    """OpenGL camera-to-world [..., 3or4, 4] -> OpenCV world-to-camera [..., 4, 4].

    Mirrors reference model.py:22-38: flip y/z columns of R, then analytic
    inverse (R^T, -R^T t). Accepts [..., 3, 4] or [..., 4, 4] poses.
    """
    R = c2w[..., :3, :3] * jnp.asarray(_FLIP_YZ, dtype=c2w.dtype)  # flip columns
    t = c2w[..., :3, 3:4]
    R_inv = jnp.swapaxes(R, -1, -2)
    t_inv = -R_inv @ t
    top = jnp.concatenate([R_inv, t_inv], axis=-1)  # [..., 3, 4]
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=c2w.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def opengl_c2w_to_opencv_w2c(c2w_opengl: np.ndarray) -> np.ndarray:
    """Numpy 4x4 version used offline (reference create_init_pointcloud.py:59-68)."""
    c2w = np.array(c2w_opengl, dtype=np.float64, copy=True)
    c2w[:3, 1:3] *= -1.0
    return np.linalg.inv(c2w).astype(np.float32)


def camera_position_from_c2w(c2w: jnp.ndarray) -> jnp.ndarray:
    """World-space camera center from a c2w pose [..., 3or4, 4]."""
    return c2w[..., :3, 3]


@dataclasses.dataclass(frozen=True)
class Camera:
    """A pinhole camera bundle (host-side container; fields are arrays).

    Equivalent of the nerfstudio ``Cameras`` row consumed at reference
    model.py:199-250: intrinsics, image size, OpenGL c2w pose, and an
    optional per-camera index used for camera-opt / bilateral-grid lookup.
    """

    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int
    c2w: np.ndarray  # [3or4, 4] OpenGL camera-to-world
    cam_idx: Optional[int] = None
    # OpenCV distortion (k1 k2 k3 k4 p1 p2); images are undistorted at load
    # time (nerfstudio D12 behavior), so downstream render path assumes 0.
    distortion: Optional[np.ndarray] = None
    # nerfstudio camera_model: "OPENCV" (pinhole radial/tangential) or
    # "OPENCV_FISHEYE" (equidistant, k1..k4) — selects the undistort model
    camera_model: str = "OPENCV"
    metadata: Optional[dict] = None

    def intrinsics_matrix(self) -> np.ndarray:
        return np.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=np.float32,
        )

    def rescaled(self, scale: float) -> "Camera":
        """Return a camera with output resolution rescaled by ``scale``.

        Mirrors nerfstudio's ``rescale_output_resolution`` used for the
        coarse-to-fine schedule (reference model.py:244-250). Dimensions
        FLOOR (int(w * scale)) to match the image downscalers, which drop
        trailing rows/cols of odd-sized images (``round`` desynced the
        camera from the image by one pixel at e.g. 135/2 -> 68 vs 67).
        """
        return dataclasses.replace(
            self,
            fx=self.fx * scale,
            fy=self.fy * scale,
            cx=self.cx * scale,
            cy=self.cy * scale,
            width=int(self.width * scale),
            height=int(self.height * scale),
        )


def downscaled_size(size: Tuple[int, int], d: int) -> Tuple[int, int]:
    """Integer-divide an (H, W) size by downscale factor d (model.py:132)."""
    return (size[0] // d, size[1] // d)
