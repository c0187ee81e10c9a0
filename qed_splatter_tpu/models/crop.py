"""Eval-time crop box (SURVEY D8; reference model.py:217-239).

nerfstudio's viewer crop is an oriented box: gaussians outside are excluded
from eval renders. The reference drops rows (dynamic shapes); the
fixed-capacity design just ANDs the alive mask — when nothing survives the
render degenerates to the background image, which IS ``get_empty_outputs``
(model.py:220) without a host branch.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CropBox:
    """Oriented box: world point p is inside iff |R (p - center)| <= size/2
    componentwise. R rows are the box axes (R @ (p - c) maps to box frame).
    """

    center: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    size: Tuple[float, float, float] = (2.0, 2.0, 2.0)
    rotation: Optional[Tuple[float, ...]] = None  # row-major 3x3; None = I

    def rotation_matrix(self) -> np.ndarray:
        if self.rotation is None:
            return np.eye(3, dtype=np.float32)
        return np.asarray(self.rotation, dtype=np.float32).reshape(3, 3)

    def within(self, points: jnp.ndarray) -> jnp.ndarray:
        """[N, 3] world points -> [N] bool (reference crop_box.within)."""
        R = jnp.asarray(self.rotation_matrix())
        c = jnp.asarray(self.center, dtype=jnp.float32)
        half = jnp.asarray(self.size, dtype=jnp.float32) / 2.0
        local = (points - c) @ R.T
        return jnp.all(jnp.abs(local) <= half, axis=-1)


def get_empty_outputs(width: int, height: int, background: jnp.ndarray):
    """Background-only outputs (reference model.py:220 / splatfacto).

    Returns a dict shaped like RenderOutputs' user-facing fields."""
    rgb = jnp.broadcast_to(background, (height, width, 3))
    return {
        "rgb": rgb,
        "depth": jnp.zeros((height, width, 1)),
        "accumulation": jnp.zeros((height, width, 1)),
        "background": background,
    }
