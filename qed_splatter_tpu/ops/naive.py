"""Brute-force O(N*P) reference renderer — parity oracle for the tile path.

Composites *every* gaussian for *every* pixel in global depth order with the
exact alpha/transmittance formulas of ``ops.rasterize``. No tile capping, so
it is ground truth for the fixed-K tile rasterizer (and later the Pallas
kernels) on small scenes (SURVEY §4 test strategy: kernel parity vs. a pure
jnp reference rasterizer).
"""

from __future__ import annotations

import jax.numpy as jnp

from qed_splatter_tpu.ops.rasterize import ALPHA_EPS, ALPHA_MAX, RasterizeResult


def rasterize_naive(
    means2d: jnp.ndarray,     # [N, 2]
    conics: jnp.ndarray,      # [N, 3]
    colors: jnp.ndarray,      # [N, D]
    opacities: jnp.ndarray,   # [N]
    depths: jnp.ndarray,      # [N]
    radii: jnp.ndarray,       # [N] int32, 0 = culled
    width: int,
    height: int,
) -> RasterizeResult:
    order = jnp.argsort(jnp.where(radii > 0, depths, jnp.inf))
    mg = means2d[order]
    cg = conics[order]
    colg = colors[order]
    og = jnp.where(radii[order] > 0, opacities[order], 0.0)

    ys = jnp.arange(height, dtype=means2d.dtype) + 0.5
    xs = jnp.arange(width, dtype=means2d.dtype) + 0.5
    px, py = jnp.meshgrid(xs, ys)              # [H, W]
    px = px.reshape(-1)                        # [P]
    py = py.reshape(-1)

    dx = mg[None, :, 0] - px[:, None]          # [P, N]
    dy = mg[None, :, 1] - py[:, None]
    sigma = (
        0.5 * (cg[None, :, 0] * dx * dx + cg[None, :, 2] * dy * dy)
        + cg[None, :, 1] * dx * dy
    )
    alpha = og[None, :] * jnp.exp(-sigma)
    ok = (sigma >= 0.0) & (alpha > ALPHA_EPS)
    alpha = jnp.where(ok, jnp.minimum(alpha, ALPHA_MAX), 0.0)

    t_incl = jnp.cumprod(1.0 - alpha, axis=-1)
    t_excl = jnp.concatenate(
        [jnp.ones_like(t_incl[..., :1]), t_incl[..., :-1]], axis=-1
    )
    w = alpha * t_excl                         # [P, N]
    img = w @ colg                             # [P, D]
    acc = jnp.sum(w, axis=-1)
    return RasterizeResult(
        render=img.reshape(height, width, -1),
        alpha=acc.reshape(height, width, 1),
    )
