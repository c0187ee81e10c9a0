"""Per-parameter-group Adam with exponential-decay schedules (optax).

Rebuilds SURVEY D9 (nerfstudio ``engine.optimizers`` / ``schedulers``) with
the exact table from reference config.py:44-81: one Adam (eps=1e-15) per
group, optional exponential decay with cosine warmup. State is a plain dict
{group: optax state} so densification can zero the Adam moments of re-seeded
gaussian slots (optimizer-state surgery, SURVEY §7.5).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp
import optax

from qed_splatter_tpu.configs import AdamConfig


def make_schedule(cfg: AdamConfig) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """nerfstudio ExponentialDecayScheduler semantics:

    - cosine(sin) ramp from ``lr_pre_warmup`` to ``lr`` over ``warmup_steps``;
    - then log-linear decay from ``lr`` to ``lr_final`` by ``max_steps``;
    - constant ``lr`` when ``lr_final`` is None.
    """
    lr_init = cfg.lr
    lr_final = cfg.lr_final if cfg.lr_final is not None else cfg.lr

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if cfg.warmup_steps > 0:
            frac = jnp.clip(step / cfg.warmup_steps, 0.0, 1.0)
            warm = cfg.lr_pre_warmup + (lr_init - cfg.lr_pre_warmup) * jnp.sin(
                0.5 * jnp.pi * frac
            )
        else:
            warm = jnp.asarray(lr_init, jnp.float32)
        if lr_final == lr_init:
            decayed = jnp.asarray(lr_init, jnp.float32)
        else:
            t = jnp.clip(
                (step - cfg.warmup_steps)
                / max(cfg.max_steps - cfg.warmup_steps, 1),
                0.0,
                1.0,
            )
            decayed = jnp.exp(
                (1.0 - t) * jnp.log(lr_init) + t * jnp.log(lr_final)
            )
        return jnp.where(step < cfg.warmup_steps, warm, decayed)

    return schedule


def make_optimizer(cfg: AdamConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=cfg.eps),
        optax.scale_by_learning_rate(make_schedule(cfg)),
    )


class GroupOptimizers:
    """A dict of independent optax optimizers keyed by parameter-group name."""

    def __init__(self, configs: Dict[str, AdamConfig]):
        self.configs = dict(configs)
        self.txs = {k: make_optimizer(v) for k, v in self.configs.items()}

    def init(self, params: Dict[str, jnp.ndarray]) -> Dict:
        return {k: self.txs[k].init(v) for k, v in params.items()}

    def update(self, grads: Dict, state: Dict, params: Dict):
        new_params, new_state = {}, {}
        for k, g in grads.items():
            updates, s = self.txs[k].update(g, state[k], params[k])
            new_params[k] = optax.apply_updates(params[k], updates)
            new_state[k] = s
        return new_params, new_state


def adam_moments(group_state):
    """(mu, nu) leaves of one group's optax chain state."""
    return group_state[0].mu, group_state[0].nu


def replace_adam_moments(group_state, mu, nu):
    return (group_state[0]._replace(mu=mu, nu=nu),) + tuple(group_state[1:])
