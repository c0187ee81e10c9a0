"""Spherical-harmonics color evaluation (degrees 0..3), batched XLA.

TPU-native equivalent of the gsplat SH CUDA kernels (reference SURVEY D3;
invoked through ``rasterization(..., sh_degree=...)`` at reference
model.py:261-282). Semantics reproduced:

- coefficient layout ``[N, K, 3]`` with ``K = (deg+1)**2`` (dc first, matching
  ``colors = cat(features_dc[:, None, :], features_rest)`` at model.py:241);
- view direction = normalize(mean - camera_position), world frame;
- active degree ``min(step // sh_degree_interval, sh_degree)`` is a *traced*
  integer — handled by masking coefficient bands so the train step stays
  jit-stable (model.py:261-262);
- output color = SH dot + 0.5, clamped to >= 0 (gsplat front-end behavior);
- ``sh_degree == 0`` path uses sigmoid colors instead (model.py:263-265) —
  that branch lives in the model, not here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Real SH basis constants (same basis as the 3DGS/gsplat kernels).
_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396)
_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435)


def num_sh_bases(degree: int) -> int:
    return (degree + 1) ** 2


def eval_sh_basis(dirs: jnp.ndarray, max_degree: int) -> jnp.ndarray:
    """Evaluate the real SH basis for unit directions.

    Args:
        dirs: [..., 3] unit view directions (x, y, z).
        max_degree: static max degree (0..3); returns (max_degree+1)^2 bases.

    Returns:
        [..., K] basis values.
    """
    if not 0 <= max_degree <= 3:
        raise ValueError(f"SH degree must be in [0, 3], got {max_degree}")
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    out = [jnp.full(x.shape, _C0, dtype=dirs.dtype)]
    if max_degree >= 1:
        out += [-_C1 * y, _C1 * z, -_C1 * x]
    if max_degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            _C2[0] * xy,
            _C2[1] * yz,
            _C2[2] * (2.0 * zz - xx - yy),
            _C2[3] * xz,
            _C2[4] * (xx - yy),
        ]
    if max_degree >= 3:
        out += [
            _C3[0] * y * (3.0 * xx - yy),
            _C3[1] * xy * z,
            _C3[2] * y * (4.0 * zz - xx - yy),
            _C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            _C3[4] * x * (4.0 * zz - xx - yy),
            _C3[5] * z * (xx - yy),
            _C3[6] * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(out, axis=-1)


def degree_band_mask(active_degree: jnp.ndarray, max_degree: int,
                     dtype=jnp.float32) -> jnp.ndarray:
    """[K] mask that is 1 for bases with degree <= active_degree.

    ``active_degree`` may be a traced scalar; ``max_degree`` is static. This
    makes the SH degree schedule (model.py:262) jit-stable.
    """
    k = num_sh_bases(max_degree)
    # band of basis index i is floor(sqrt(i))
    idx = jnp.arange(k)
    band = jnp.floor(jnp.sqrt(idx.astype(jnp.float32))).astype(jnp.int32)
    return (band <= active_degree).astype(dtype)


def eval_sh_colors(
    coeffs: jnp.ndarray,
    means: jnp.ndarray,
    campos: jnp.ndarray,
    active_degree: jnp.ndarray,
    max_degree: int,
) -> jnp.ndarray:
    """SH -> RGB for every gaussian for one camera position.

    Args:
        coeffs: [N, K, 3] SH coefficients (K = (max_degree+1)^2).
        means: [N, 3] gaussian world means.
        campos: [3] camera world position.
        active_degree: scalar int (may be traced) in [0, max_degree].
        max_degree: static degree the coeffs were allocated for.

    Returns:
        [N, 3] colors, = clamp(SH + 0.5, min=0).
    """
    d = means - campos[None, :]
    # sqrt(max(|d|^2, eps)): NaN-safe backward at d == 0 (a gaussian sitting
    # exactly at the camera position — e.g. a dead zero-padded slot).
    sq = jnp.sum(d * d, axis=-1, keepdims=True)
    d = d / jnp.sqrt(jnp.maximum(sq, 1e-24))
    basis = eval_sh_basis(d, max_degree)  # [N, K]
    mask = degree_band_mask(active_degree, max_degree, dtype=basis.dtype)
    basis = basis * mask[None, :]
    colors = jnp.einsum("nk,nkc->nc", basis, coeffs,
                        precision=jax.lax.Precision.HIGHEST) + 0.5
    return jnp.maximum(colors, 0.0)
