"""Learned per-camera SE(3) pose refinement (SO3xR3 parameterization).

TPU-native equivalent of nerfstudio's ``CameraOptimizer`` (SURVEY D10;
configured at reference config.py:69-74, applied at model.py:212 during
training only). State is a single [num_cameras, 6] tensor (translation xyz,
rotation so(3) tangent) optimized by its own Adam group ``camera_opt``.
"""

from __future__ import annotations

import jax.numpy as jnp


def exp_so3(omega: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues exponential map so(3) -> SO(3). omega: [..., 3] -> [..., 3, 3].

    Gradient-safe at omega = 0 (where every camera delta starts): the
    non-Taylor branch is evaluated at a clamped-safe theta so the untaken
    0/0 never poisons the vjp (the where-NaN-grad trap).
    """
    wx, wy, wz = omega[..., 0], omega[..., 1], omega[..., 2]
    zeros = jnp.zeros_like(wx)
    K = jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), K.shape)
    theta_sq = jnp.sum(omega * omega, axis=-1)[..., None, None]
    small = theta_sq < 1e-12
    safe_sq = jnp.where(small, 1.0, theta_sq)  # keeps untaken branch finite
    theta = jnp.sqrt(safe_sq)
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / safe_sq)
    return eye + a * K + b * (K @ K)


def apply_camera_opt(c2w: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Compose an OpenGL c2w [..., 3or4, 4] with an SO3xR3 delta [..., 6].

    Matches nerfstudio semantics: the adjustment [R|t] from the exp map is
    right-multiplied onto the camera-to-world transform, so the delta acts in
    the camera's local frame.
    """
    R_adj = exp_so3(delta[..., 3:])                       # [..., 3, 3]
    t_adj = delta[..., :3][..., :, None]                  # [..., 3, 1]
    R = c2w[..., :3, :3]
    t = c2w[..., :3, 3:4]
    R_new = R @ R_adj
    t_new = R @ t_adj + t
    top = jnp.concatenate([R_new, t_new], axis=-1)        # [..., 3, 4]
    if c2w.shape[-2] == 4:
        return jnp.concatenate([top, c2w[..., 3:4, :]], axis=-2)
    return top


def camera_opt_regularizer(delta: jnp.ndarray,
                           trans_penalty: float = 1e-2,
                           rot_penalty: float = 1e-3) -> jnp.ndarray:
    """Mean-norm penalty keeping pose deltas small (nerfstudio's
    ``camera_opt_regularizer``); scalar."""
    # sqrt(x^2 + eps): plain norm has a NaN gradient at the zero deltas
    # every camera starts from
    t = jnp.sqrt(jnp.sum(delta[..., :3] ** 2, axis=-1) + 1e-12).mean()
    r = jnp.sqrt(jnp.sum(delta[..., 3:] ** 2, axis=-1) + 1e-12).mean()
    return trans_penalty * t + rot_penalty * r
