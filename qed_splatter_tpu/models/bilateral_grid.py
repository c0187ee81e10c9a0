"""Per-camera learned bilateral grid color correction (SURVEY D11).

Re-implements nerfstudio's ``lib_bilagrid`` (applied at reference
model.py:300-302 during training keyed by ``cam_idx``; its own Adam group at
config.py:75-80): each training camera owns a [gh, gw, gd, 12] grid of
affine color transforms; a rendered pixel samples the grid trilinearly at
(y, x, guidance) where guidance is the pixel's luminance, and applies the
resulting 3x4 affine to its RGB.

TPU-native formulation — **gather-free slicing**: the data-dependent
guidance axis is expanded as a sum over the gd depth levels weighted by hat
functions (each level's [gh, gw, 12] slab is resized bilinearly to the image
— structured interpolation XLA lowers well — and accumulated with per-pixel
level weights). An [H*W] trilinear gather would run on the TPU's scalar
core; this form is pure VPU math.

Regularized by total variation over grid axes (nerfstudio's tv_loss).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# identity 3x4 affine, row-major [3, 4] -> 12
_IDENTITY = jnp.asarray(
    [1.0, 0, 0, 0, 0, 1.0, 0, 0, 0, 0, 1.0, 0], dtype=jnp.float32
)

_LUMA = jnp.asarray([0.299, 0.587, 0.114], dtype=jnp.float32)


def init_bilateral_grids(num_cameras: int, shape=(16, 16, 8)) -> jnp.ndarray:
    """[num_cameras, gh, gw, gd, 12] identity-initialized grids."""
    gh, gw, gd = shape
    return jnp.broadcast_to(
        _IDENTITY, (num_cameras, gh, gw, gd, 12)
    ).astype(jnp.float32)


def apply_bilateral_grid(grid: jnp.ndarray, rgb: jnp.ndarray) -> jnp.ndarray:
    """Slice one camera's grid with the rendered image and apply the affine.

    grid: [gh, gw, gd, 12]; rgb: [H, W, 3] in [0, 1]. Returns [H, W, 3].
    """
    gh, gw, gd, _ = grid.shape
    h, w, _ = rgb.shape
    guidance = jnp.clip(rgb @ _LUMA, 0.0, 1.0)              # [H, W]
    z = guidance * (gd - 1)                                 # [H, W]

    out = jnp.zeros((h, w, 12), dtype=jnp.float32)
    for level in range(gd):  # static, small
        wgt = jnp.maximum(1.0 - jnp.abs(z - level), 0.0)    # hat
        slab = jax.image.resize(
            grid[:, :, level, :], (h, w, 12), method="bilinear"
        )
        out = out + wgt[..., None] * slab

    m = out.reshape(h, w, 3, 4)
    return jnp.einsum("hwij,hwj->hwi", m[..., :3], rgb) + m[..., 3]


def total_variation_loss(grids: jnp.ndarray) -> jnp.ndarray:
    """Mean squared difference along each grid axis (nerfstudio tv_loss).
    grids: [..., gh, gw, gd, 12] -> scalar."""
    tv = 0.0
    for axis in (-4, -3, -2):
        d = jnp.diff(grids, axis=axis)
        tv = tv + jnp.mean(d * d)
    return tv
