"""Golden-value tests for loss semantics (reference model.py:73-118)."""

import numpy as np
import jax.numpy as jnp

from qed_splatter_tpu.configs import ModelConfig
from qed_splatter_tpu.models.gaussians import init_random
from qed_splatter_tpu.models.splatfacto import (
    depth_l1_loss,
    photometric_loss,
    scale_regularization,
)


def test_depth_loss_masks_invalid_gt():
    """Zeros / non-finite GT depth pixels are excluded (model.py:99-105)."""
    pred = jnp.ones((4, 4, 1)) * 2.0
    gt = jnp.zeros((4, 4, 1))
    gt = gt.at[0, 0, 0].set(3.0)   # only valid pixel: |2-3| = 1
    gt = gt.at[1, 1, 0].set(jnp.inf)
    loss = depth_l1_loss(pred, gt)
    np.testing.assert_allclose(float(loss), 1.0, atol=1e-6)


def test_depth_loss_empty_mask_is_zero():
    """No valid pixels -> 0.0, not NaN (model.py:111-114)."""
    pred = jnp.ones((4, 4, 1))
    gt = jnp.zeros((4, 4, 1))
    assert float(depth_l1_loss(pred, gt)) == 0.0


def test_depth_loss_applies_pixel_mask():
    """batch mask multiplies both pred and gt (model.py:93-97)."""
    pred = jnp.full((2, 2, 1), 5.0)
    gt = jnp.full((2, 2, 1), 1.0)
    mask = jnp.zeros((2, 2, 1)).at[0, 0, 0].set(1.0)
    # masked-out gt pixels become 0 -> invalid -> excluded
    loss = depth_l1_loss(pred, gt, mask)
    np.testing.assert_allclose(float(loss), 4.0, atol=1e-6)


def test_photometric_loss_perfect_is_zero():
    img = jnp.asarray(np.random.default_rng(0).uniform(size=(32, 32, 3)),
                      jnp.float32)
    loss = photometric_loss(img, img, ssim_lambda=0.2)
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-5)


def test_photometric_loss_mix():
    a = jnp.zeros((32, 32, 3))
    b = jnp.ones((32, 32, 3))
    # L1 = 1; SSIM(0,1) ~ small -> loss ~ 0.8*1 + 0.2*(1-ssim)
    loss = float(photometric_loss(a, b, ssim_lambda=0.2))
    assert 0.8 < loss <= 1.01


def test_ssim_band_matches_depthwise_oracle():
    """Band-matmul SSIM == depthwise-conv SSIM (fwd and grad)."""
    import jax
    from qed_splatter_tpu.ops.ssim import ssim, _ssim_depthwise

    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.uniform(size=(41, 57, 3)), jnp.float32)
    b = jnp.clip(a + 0.1 * jnp.asarray(
        rng.normal(size=(41, 57, 3)), jnp.float32), 0.0, 1.0)
    v_band, g_band = jax.value_and_grad(lambda x: ssim(x, b))(a)
    v_dw, g_dw = jax.value_and_grad(lambda x: _ssim_depthwise(x, b))(a)
    np.testing.assert_allclose(float(v_band), float(v_dw), atol=2e-5)
    np.testing.assert_allclose(np.asarray(g_band), np.asarray(g_dw),
                               atol=2e-5)


def test_scale_reg_zero_for_isotropic():
    gp = init_random(num_points=64, capacity=256, seed=0)
    # isotropic scales -> ratio 1 -> no penalty
    gp = gp.replace(scales=jnp.zeros_like(gp.scales))
    assert float(scale_regularization(gp, max_gauss_ratio=10.0)) == 0.0


def test_scale_reg_penalizes_anisotropy():
    gp = init_random(num_points=64, capacity=256, seed=0)
    s = jnp.zeros_like(gp.scales).at[:, 0].set(5.0)  # ratio e^5 >> 10
    gp = gp.replace(scales=s)
    assert float(scale_regularization(gp, max_gauss_ratio=10.0)) > 1.0
