"""SSIM with an 11x11 gaussian window — torchmetrics-compatible.

Matches ``StructuralSimilarityIndexMeasure(data_range=1.0, kernel_size=11)``
used for both the eval metric (reference metrics.py:94) and splatfacto's
``1 - SSIM`` term in the photometric loss (SURVEY D8): gaussian kernel with
sigma = 1.5, *valid* convolution (no padding), per-channel, averaged.

Implemented as two separable depthwise convs — XLA maps these onto fused
convolution kernels; gradients are exact via autodiff.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
from jax import lax


@functools.lru_cache(maxsize=8)
def _gaussian_kernel_np(kernel_size: int, sigma: float):
    import numpy as np

    half = (kernel_size - 1) / 2.0
    x = np.arange(kernel_size, dtype=np.float64) - half
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    g /= g.sum()
    return g.astype(np.float32)


def _blur_batch(imgs: jnp.ndarray, kernel_size: int, sigma: float
                ) -> jnp.ndarray:
    """Separable valid-mode gaussian blur of a stack.

    imgs: [B, H, W, C] -> [B, H-k+1, W-k+1, C]. All B*C planes go through
    ONE pair of depthwise convs (batch folded into channels) — one-tenth the
    kernel launches of blurring the five SSIM moment images separately.
    """
    b, h, w, c = imgs.shape
    g = jnp.asarray(_gaussian_kernel_np(kernel_size, sigma))
    x = imgs.transpose(1, 2, 0, 3).reshape(1, h, w, b * c)  # NHWC, C=b*c
    kh = jnp.tile(g.reshape(kernel_size, 1, 1, 1), (1, 1, 1, b * c))
    kw = jnp.tile(g.reshape(1, kernel_size, 1, 1), (1, 1, 1, b * c))
    dn = lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    # HIGHEST precision: TPU convs default to bf16, whose ~0.8% relative
    # error breaks the E[x^2] - E[x]^2 variance cancellation (var sums go
    # below -c2 and SSIM explodes; observed as negative photometric loss
    # spikes -> NaN training)
    x = lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=dn,
        feature_group_count=b * c, precision=lax.Precision.HIGHEST,
    )
    x = lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", dimension_numbers=dn,
        feature_group_count=b * c, precision=lax.Precision.HIGHEST,
    )
    hh, ww = x.shape[1], x.shape[2]
    return x.reshape(hh, ww, b, c).transpose(2, 0, 1, 3)


def _blur(img: jnp.ndarray, kernel_size: int, sigma: float) -> jnp.ndarray:
    """Separable valid-mode gaussian blur. img: [H, W, C] -> [H-k+1, W-k+1, C]."""
    return _blur_batch(img[None], kernel_size, sigma)[0]


def ssim(
    pred: jnp.ndarray,   # [H, W, C] in [0, data_range]
    target: jnp.ndarray,
    kernel_size: int = 11,
    sigma: float = 1.5,
    data_range: float = 1.0,
) -> jnp.ndarray:
    """Scalar mean SSIM (higher is better)."""
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    stack = jnp.stack(
        [pred, target, pred * pred, target * target, pred * target]
    )
    mu_p, mu_t, mu_pp, mu_tt, mu_pt = _blur_batch(stack, kernel_size, sigma)
    var_p = mu_pp - mu_p * mu_p
    var_t = mu_tt - mu_t * mu_t
    cov = mu_pt - mu_p * mu_t
    num = (2.0 * mu_p * mu_t + c1) * (2.0 * cov + c2)
    den = (mu_p * mu_p + mu_t * mu_t + c1) * (var_p + var_t + c2)
    return jnp.mean(num / den)
