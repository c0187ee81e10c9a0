"""NaN containment: projection gradient guards, poisoned-row rendering,
gradient sanitization, and trainer-level divergence rollback/halt.

Round-2 post-mortem (VERDICT r2): the 30k room run died because a handful
of numerically degenerate (needle) splats hit the ``-1/det^2`` f32 overflow
in the projection backward — ``0 cotangent x inf partial = NaN`` — which
poisoned the summed camera-opt gradient and, one Adam step later, every
gaussian's means/scales/quats (opacities/features_dc stayed clean: their
gradient chains bypass the 2D-covariance determinant). These tests pin the
fix at every layer of the defense.
"""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qed_splatter_tpu.configs import (
    DataConfig,
    ModelConfig,
    TrainerConfig,
    default_optimizers,
)
from qed_splatter_tpu.engine.optim import GroupOptimizers
from qed_splatter_tpu.engine.train_step import init_train_state, make_train_step
from qed_splatter_tpu.engine.trainer import Trainer, TrainingDiverged
from qed_splatter_tpu.models.splatfacto import render
from qed_splatter_tpu.ops.projection import project_gaussians
from qed_splatter_tpu.testing import write_synthetic_dataset


# --------------------------------------------------------------- projection


@pytest.mark.slow
def test_degenerate_needle_splats_have_finite_grads():
    """The round-2 killer: invalid needle splats (f32-cancelled det_blur)
    must not emit NaN through the conic backward even with zero cotangents."""
    rng = np.random.default_rng(0)
    n = 1024
    ang = rng.uniform(0, np.pi, n)
    quats = jnp.asarray(
        np.stack([np.cos(ang / 2), np.zeros(n), np.zeros(n),
                  np.sin(ang / 2)], -1)
    )
    means = jnp.asarray(
        np.stack([rng.uniform(-0.01, 0.01, n), rng.uniform(-0.01, 0.01, n),
                  rng.uniform(0.011, 0.1, n)], -1)
    )
    scales = jnp.asarray(
        np.stack([rng.uniform(0.5, 4.0, n), np.full(n, 1e-6),
                  np.full(n, 1e-6)], -1)
    )
    viewmat = jnp.eye(4)[None]
    K = jnp.array([[[1037.0, 0, 648.0], [0, 1037.0, 420.0], [0, 0, 1]]])

    for antialiased in (False, True):
        def f(means, quats, scales):
            p = project_gaussians(
                means, quats, scales, viewmat, K, 1296, 840,
                antialiased=antialiased,
            )
            # zero cotangents everywhere: any NaN that appears is produced
            # by the backward itself (0 x inf), not by the loss
            return (
                jnp.sum(p.conics * 0.0)
                + jnp.sum(p.means2d * 0.0)
                + jnp.sum(p.compensations * 0.0)
            )

        g = jax.grad(f, argnums=(0, 1, 2))(means, quats, scales)
        for leaf in g:
            assert bool(jnp.all(jnp.isfinite(leaf))), antialiased
        # sanity: many of these ARE degenerate (the guard is exercised)
        p = project_gaussians(means, quats, scales, viewmat, K, 1296, 840)
        assert int(jnp.sum(~p.valid)) > 0


def test_projection_masks_nonfinite_rows():
    """A gaussian whose params went non-finite must be invalid, render
    nothing, and emit zero (not NaN) gradients — including into the camera
    path (viewmats grad is a sum over all gaussians)."""
    means = jnp.array([[0.0, 0.0, 2.0], [jnp.nan, 0.0, 2.0]])
    quats = jnp.array([[1.0, 0, 0, 0], [1.0, 0, 0, 0]])
    scales = jnp.array([[0.05, 0.05, 0.05], [0.05, 0.05, 0.05]])
    viewmat = jnp.eye(4)[None]
    K = jnp.array([[[100.0, 0, 32.0], [0, 100.0, 24.0], [0, 0, 1]]])

    def f(means, viewmat):
        p = project_gaussians(means, quats, scales, viewmat, K, 64, 48)
        return jnp.sum(jnp.where(p.valid[..., None], p.means2d, 0.0))

    p = project_gaussians(means, quats, scales, viewmat, K, 64, 48)
    assert bool(p.valid[0, 0]) and not bool(p.valid[0, 1])
    g_means, g_view = jax.grad(f, argnums=(0, 1))(means, viewmat)
    assert bool(jnp.all(jnp.isfinite(g_means)))
    assert bool(jnp.all(jnp.isfinite(g_view)))
    assert bool(jnp.all(g_means[1] == 0.0))


# ----------------------------------------------------------------- render


def _poisoned_params(sh_degree=3):
    from qed_splatter_tpu.models.gaussians import init_random

    params = init_random(num_points=64, capacity=128, sh_degree=sh_degree,
                         random_scale=2.0, seed=0)
    # poison a few ALIVE rows the way the round-2 collapse did: geometry
    # NaN, opacities/features_dc finite
    means = params.means.at[3].set(jnp.nan).at[7, 1].set(jnp.inf)
    scales = params.scales.at[5].set(jnp.nan)
    quats = params.quats.at[9].set(jnp.nan)
    rest = params.features_rest
    if rest.size:
        rest = rest.at[11].set(jnp.nan)
    return params.replace(means=means, scales=scales, quats=quats,
                          features_rest=rest)


@pytest.mark.slow
def test_render_with_poisoned_rows_is_finite():
    """Eval-NaN-leak regression (VERDICT r2 weak #6): rendering a state
    with NaN alive rows must produce finite rgb/depth/accumulation."""
    from qed_splatter_tpu.testing import orbit_c2w_opengl

    params = _poisoned_params()
    cfg = ModelConfig(max_per_tile=64, output_depth_during_training=True)
    c2w = jnp.asarray(orbit_c2w_opengl(3.0, 0.3, 0.1)[:3])
    K = jnp.array([[60.0, 0, 32.0], [0, 60.0, 24.0], [0, 0, 1.0]])
    out = render(params, c2w, K, 64, 48, cfg, step=jnp.int32(100),
                 train=False)
    assert bool(jnp.all(jnp.isfinite(out.rgb)))
    assert bool(jnp.all(jnp.isfinite(out.depth)))
    assert bool(jnp.all(jnp.isfinite(out.accumulation)))
    # poisoned rows never rasterize
    for i in (3, 5, 7, 9):
        assert int(out.radii[i]) == 0


def test_train_step_with_poisoned_rows_keeps_healthy_rows_finite():
    """One poisoned gaussian must not poison the others (or the camera
    deltas) through the shared gradient sums; ``nonfinite_grads`` reports
    anything the sanitizer had to zero."""
    params = _poisoned_params()
    optims = GroupOptimizers(default_optimizers())
    state = init_train_state(params, optims, num_cameras=2)
    cfg = ModelConfig(max_per_tile=64, camera_opt_mode="SO3xR3")
    from qed_splatter_tpu.testing import orbit_c2w_opengl

    step_fn = make_train_step(cfg, optims, 64, 48, has_depth=False)
    batch = dict(
        c2w=jnp.asarray(orbit_c2w_opengl(3.0, 0.3, 0.1)[:3]),
        K=jnp.array([[60.0, 0, 32.0], [0, 60.0, 24.0], [0, 0, 1.0]]),
        cam_idx=jnp.int32(0),
        rgb=jnp.zeros((48, 64, 3)) + 0.5,
    )
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
    assert bool(jnp.isfinite(metrics["loss"]))
    assert "nonfinite_grads" in metrics
    # every healthy row stays finite after the update
    ok = np.ones(128, bool)
    ok[[3, 5, 7, 9, 11]] = False
    for name, arr in new_state.params.trainable_dict().items():
        healthy = np.asarray(arr)[ok]
        assert np.isfinite(healthy).all(), name
    assert bool(jnp.all(jnp.isfinite(new_state.camera_opt)))


# ---------------------------------------------------------------- trainer


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("scene_div")
    write_synthetic_dataset(root, num_frames=4, width=64, height=48,
                            with_ply=True)
    return root


def _cfg(dataset, tmp_path, **kw) -> TrainerConfig:
    model = ModelConfig(
        camera_opt_mode="off",
        max_per_tile=64,
        num_downscales=0,
        warmup_length=10,
        refine_every=10,
        init_capacity_headroom=1.2,
        **kw.pop("model_kw", {}),
    )
    return TrainerConfig(
        max_num_iterations=40,
        steps_per_eval_image=0,
        steps_per_eval_all_images=0,
        steps_per_save=10,
        log_every=10,
        output_dir=str(tmp_path),
        data=DataConfig(data=str(dataset)),
        model=model,
        **kw,
    )


def _poison_state(trainer):
    trainer.state = trainer.state.replace(
        params=trainer.state.params.replace(
            means=trainer.state.params.means * jnp.nan
        )
    )


@pytest.mark.slow
def test_trainer_rolls_back_on_divergence(dataset, tmp_path):
    """Poisoning the whole model mid-run must trigger detection within one
    dispatch and roll back to the last finite checkpoint."""
    cfg = _cfg(dataset, tmp_path, on_divergence="rollback",
               divergence_freeze_steps=20)
    trainer = Trainer(cfg)
    trainer.train(max_steps=20)  # writes finite ckpts at 10 and 20
    assert trainer._good_ckpt is not None
    _poison_state(trainer)
    # all-NaN means render pure background with a FINITE loss (the rows are
    # radii-0-masked), so this exercises the params-canary detection path
    trainer.train(max_steps=40)
    assert trainer._rollbacks >= 1
    assert int(trainer.state.step) == 40
    # the post-divergence params are finite again
    assert bool(jnp.all(jnp.isfinite(trainer.state.params.means)))
    pm = trainer.run_dir / "postmortem"
    assert pm.exists()


@pytest.mark.slow
def test_trainer_halts_on_divergence(dataset, tmp_path):
    cfg = _cfg(dataset, tmp_path, on_divergence="halt")
    trainer = Trainer(cfg)
    trainer.train(max_steps=10)
    _poison_state(trainer)
    with pytest.raises(TrainingDiverged):
        trainer.train(max_steps=30)


def test_k_bucket_seeding_carries_coarse_k(dataset, tmp_path):
    """A new resolution bucket seeds its K from the coarser buckets (the
    round-2 truncation shock re-entered full-res at the 512 default with
    153k dropped intersections per step)."""
    cfg = _cfg(dataset, tmp_path)
    trainer = Trainer(cfg)
    trainer._k_by_d[4] = 256
    trainer._k_by_d[2] = 128
    assert trainer._k_for(1) == 256
    # already-visited buckets are untouched
    assert trainer._k_for(2) == 128


def test_k_shrinks_when_oversized(dataset, tmp_path):
    cfg = _cfg(dataset, tmp_path)
    trainer = Trainer(cfg)
    trainer._k_by_d[1] = 2048
    # max per-tile count far below K -> shrink to pow2 covering 1.25x
    trainer._maybe_adapt_k(overflow=0.0, max_count=300.0,
                           width=640, height=480, d=1)
    assert trainer._k_by_d[1] == 512
    # but never below min(512, configured default)
    trainer._maybe_adapt_k(overflow=0.0, max_count=10.0,
                           width=640, height=480, d=1)
    assert trainer._k_by_d[1] >= min(512, trainer.cfg.max_per_tile)


def test_sharded_step_cache_key_includes_k(dataset, tmp_path):
    """Round-2 weak #5: the sharded-step cache ignored max_per_tile, so a
    multi-chip run silently kept the stale K after adaptive growth."""
    import dataclasses as _dc

    from qed_splatter_tpu.parallel.mesh import make_mesh

    cfg = _cfg(dataset, tmp_path)
    trainer = Trainer(cfg)
    trainer.mesh = make_mesh(1, 1)
    trainer.cfg = _dc.replace(trainer.cfg, max_per_tile=64)
    trainer._get_sharded_step_fn(64, 48, True, False, 128)
    trainer.cfg = _dc.replace(trainer.cfg, max_per_tile=128)
    trainer._get_sharded_step_fn(64, 48, True, False, 128)
    assert len(trainer._sharded_fns) == 2
