"""Metric golden-value tests vs. literal numpy transcriptions of the
reference formulas (metrics.py:35-156) and scipy cross-checks."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial import cKDTree

from qed_splatter_tpu.metrics import (
    PDMetrics,
    RGBMetrics,
    avg_min_scale,
    calculate_accuracy,
    calculate_completeness,
    depth_metrics,
    full_eval_metrics,
    mean_angular_error,
    psnr,
)


def _ref_depth_metrics(pred, gt, tolerance=0.1):
    """Literal transcription of reference metrics.py:126-156 in numpy."""
    valid = np.isfinite(pred) & np.isfinite(gt) & (gt > tolerance)
    if valid.sum() == 0:
        return (np.nan,) * 7
    p, g = pred[valid], gt[valid]
    thresh = np.maximum(g / p, p / g)
    a1 = (thresh < 1.25).mean()
    a2 = (thresh < 1.25**2).mean()
    a3 = (thresh < 1.25**3).mean()
    rmse = np.sqrt(((g - p) ** 2).mean())
    logs = (np.log(g) - np.log(p)) ** 2
    rmse_log = np.sqrt(np.nanmean(logs))
    abs_rel = (np.abs(g - p) / g).mean()
    sq_rel = ((g - p) ** 2 / g).mean()
    return abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3


def test_depth_metrics_match_reference_formula():
    rng = np.random.default_rng(0)
    gt = rng.uniform(0.0, 5.0, size=(32, 32)).astype(np.float32)
    pred = (gt * rng.uniform(0.7, 1.4, size=gt.shape)).astype(np.float32)
    gt[::7, ::5] = 0.0        # invalid
    gt[0, 0] = np.inf
    got = depth_metrics(jnp.asarray(pred), jnp.asarray(gt))
    want = _ref_depth_metrics(pred, gt)
    for g, w in zip(got, want):
        np.testing.assert_allclose(float(g), w, rtol=1e-4)


def test_depth_metrics_empty_nan():
    got = depth_metrics(jnp.ones((4, 4)), jnp.zeros((4, 4)))
    assert all(np.isnan(float(v)) for v in got)


def test_pd_metrics_match_scipy():
    rng = np.random.default_rng(1)
    recon = rng.normal(size=(500, 3)).astype(np.float32)
    ref = (recon + rng.normal(scale=0.03, size=recon.shape)).astype(np.float32)

    acc = calculate_accuracy(recon, ref)
    d_scipy, _ = cKDTree(ref).query(recon)
    np.testing.assert_allclose(acc, np.percentile(d_scipy, 90), rtol=1e-4)

    cmp_ = calculate_completeness(recon, ref)
    d2, _ = cKDTree(recon).query(ref)
    np.testing.assert_allclose(
        cmp_, np.sum(d2 < 0.05) / len(d2) * 100.0, rtol=1e-5
    )

    a, c = PDMetrics()(recon, ref)
    assert a == acc and c == cmp_


def test_mean_angular_error():
    a = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    b = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    mae = np.asarray(mean_angular_error(a, b))
    np.testing.assert_allclose(mae, [0.0, np.pi / 2], atol=1e-6)


def test_psnr_and_uint8_normalization():
    img = (np.random.default_rng(2).uniform(size=(16, 16, 3)) * 255).astype(
        np.uint8
    )
    p = float(psnr(jnp.asarray(img), jnp.asarray(img)))
    assert p > 100  # identical images
    m = RGBMetrics()
    ps, ss, lp = m(jnp.asarray(img), jnp.asarray(img))
    assert float(ps) > 100 and abs(float(ss) - 1.0) < 1e-5
    assert np.isnan(float(lp))  # no weights in this environment


def test_full_eval_metrics_keys():
    rgb = jnp.zeros((32, 32, 3))
    d = jnp.ones((32, 32, 1))
    out = full_eval_metrics(rgb, rgb, d, d, gaussian_count=7,
                            avg_min_scale=0.5)
    for k in ("rgb_mse", "rgb_psnr", "rgb_ssim", "rgb_lpips",
              "gaussian_count", "depth_abs_rel", "depth_a3", "avg_min_scale"):
        assert k in out
    assert out["gaussian_count"] == 7
    assert out["depth_abs_rel"] == 0.0


def test_avg_min_scale():
    scales = jnp.log(jnp.asarray([[1.0, 1.0, 2.0], [1.0, 1.0, 4.0]]))
    alive = jnp.asarray([True, True])
    np.testing.assert_allclose(float(avg_min_scale(scales, alive)), 3.0)
    alive = jnp.asarray([True, False])
    np.testing.assert_allclose(float(avg_min_scale(scales, alive)), 2.0)
