"""End-to-end training slice: optimize gaussians to fit rendered targets.

SURVEY §7.3 v0 milestone: jitted train step + optax groups reach a PSNR
improvement on a tiny synthetic scene within a few hundred steps.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from qed_splatter_tpu.configs import ModelConfig, default_optimizers
from qed_splatter_tpu.engine.optim import GroupOptimizers
from qed_splatter_tpu.engine.train_step import init_train_state, make_train_step
from qed_splatter_tpu.models.gaussians import GaussianParams, init_from_points
from qed_splatter_tpu.models.splatfacto import render
from qed_splatter_tpu.testing import orbit_c2w_opengl

W, H = 64, 48
NUM_CAMS = 4


def _cameras():
    cams = []
    K = np.array(
        [[50.0, 0.0, W / 2], [0.0, 50.0, H / 2], [0.0, 0.0, 1.0]], np.float32
    )
    for i in range(NUM_CAMS):
        az = 2 * np.pi * i / NUM_CAMS * 0.15
        cams.append((orbit_c2w_opengl(3.0, az, 0.1, target=(0, 0, 3.0)), K))
    return cams


def _teacher_params(cfg) -> GaussianParams:
    rng = np.random.default_rng(3)
    n = 48
    pts = rng.uniform(-0.8, 0.8, size=(n, 3)).astype(np.float32)
    pts[:, 2] = pts[:, 2] * 0.5 + 3.0
    rgb = (rng.uniform(0.2, 1.0, size=(n, 3)) * 255).astype(np.uint8)
    gp = init_from_points(pts, rgb, sh_degree=cfg.sh_degree, capacity=64)
    # make teacher blobs chunky and opaque so targets have structure
    gp = gp.replace(
        scales=jnp.full_like(gp.scales, jnp.log(0.15)),
        opacities=jnp.full_like(gp.opacities, 2.0),
    )
    return gp


@pytest.fixture(scope="module")
def scene():
    cfg = ModelConfig(
        background_color="black",
        camera_opt_mode="off",
        max_per_tile=128,
        sh_degree_interval=100,
    )
    teacher = _teacher_params(cfg)
    cams = _cameras()
    targets = []
    for c2w, K in cams:
        out = render(
            teacher, jnp.asarray(c2w), jnp.asarray(K), W, H, cfg,
            step=jnp.asarray(10_000), train=False,
        )
        targets.append(
            (np.asarray(out.rgb), np.asarray(out.depth), c2w, K)
        )
    return cfg, targets


def test_training_improves_psnr_and_depth(scene):
    cfg, targets = scene
    rng0 = np.random.default_rng(7)
    n = 96
    pts = rng0.uniform(-0.8, 0.8, size=(n, 3)).astype(np.float32)
    pts[:, 2] = pts[:, 2] * 0.5 + 3.0
    student = init_from_points(
        pts, np.full((n, 3), 128, np.uint8), sh_degree=cfg.sh_degree,
        capacity=128,
    )
    optims = GroupOptimizers(default_optimizers())
    state = init_train_state(student, optims, num_cameras=NUM_CAMS)
    step_fn = make_train_step(cfg, optims, W, H, has_depth=True)

    def psnr_now(params):
        vals = []
        for rgb_t, _, c2w, K in targets:
            out = render(
                params, jnp.asarray(c2w), jnp.asarray(K), W, H, cfg,
                step=jnp.asarray(10_000), train=False,
            )
            mse = float(jnp.mean((out.rgb - jnp.asarray(rgb_t)) ** 2))
            vals.append(-10.0 * np.log10(mse + 1e-12))
        return float(np.mean(vals))

    psnr_start = psnr_now(state.params)
    key = jax.random.PRNGKey(0)
    metrics = {}
    for it in range(200):
        rgb_t, depth_t, c2w, K = targets[it % NUM_CAMS]
        key, sub = jax.random.split(key)
        batch = dict(
            c2w=jnp.asarray(c2w),
            K=jnp.asarray(K),
            cam_idx=jnp.asarray(it % NUM_CAMS, jnp.int32),
            rgb=jnp.asarray(rgb_t),
            depth=jnp.asarray(depth_t),
        )
        state, metrics = step_fn(state, batch, sub)

    psnr_end = psnr_now(state.params)
    assert np.isfinite(float(metrics["loss"]))
    assert psnr_end > psnr_start + 3.0, (psnr_start, psnr_end)
    assert float(metrics["depth_loss"]) < 0.5
    # densify stats accumulated
    assert float(jnp.sum(state.stats.vis_count)) > 0
    assert float(jnp.sum(state.stats.grad_norm_sum)) > 0
    assert int(state.step) == 200


def test_eval_render_shapes(scene):
    cfg, targets = scene
    teacher = _teacher_params(cfg)
    _, _, c2w, K = targets[0]
    out = render(
        teacher, jnp.asarray(c2w), jnp.asarray(K), W, H, cfg,
        step=jnp.asarray(0), train=False,
    )
    assert out.rgb.shape == (H, W, 3)
    assert out.depth.shape == (H, W, 1)
    assert out.accumulation.shape == (H, W, 1)
    assert float(out.accumulation.max()) <= 1.0 + 1e-5
    assert np.isfinite(np.asarray(out.rgb)).all()
