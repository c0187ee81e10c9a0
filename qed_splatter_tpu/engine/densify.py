"""Densification / culling as jittable fixed-capacity ops.

Rebuilds splatfacto's refinement engine (SURVEY D8: dup/split/cull/opacity-
reset with thresholds overridden at reference config.py:40-41) without any
dynamic tensor growth: gaussians live in capacity-C buffers with an ``alive``
mask (BASELINE.json north star: "densify/split/prune rewritten as jittable
capped-capacity ops instead of dynamic tensor growth").

Semantics reproduced from nerfstudio splatfacto's ``refinement_after``:
- every ``refine_every`` steps after ``warmup_length``;
- densify while step < stop_split_at and not right after an opacity reset
  (step % reset_interval > num_train_data + refine_every);
- high-grad = (accumulated absgrad norm / vis count) * 0.5 * max(H, W)
  > densify_grad_thresh;
- split when world scale > densify_size_thresh (or screen size >
  split_screen_size while step < stop_screen_size_at): n_split_samples
  gaussians sampled from the parent, scales / 1.6, parent culled;
- dup when small: one identical copy;
- cull when opacity < cull_alpha_thresh; after the first reset window also
  cull world scale > cull_scale_thresh and screen frac > cull_screen_size;
- opacity reset every reset_alpha_every * refine_every steps: clamp logits to
  logit(2 * cull_alpha_thresh), zero the opacity Adam moments;
- new slots get zeroed Adam moments (dup_in_all_optim equivalent).

New gaussians are written into dead slots: candidates are packed by a
cumulative-sum rank and matched to free slots by rank — all static shapes.
When candidates exceed free slots (or ``max_new_per_refine``) the tail is
dropped and reported; the trainer grows capacity host-side (a bounded
recompile) when occupancy crosses a threshold.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from qed_splatter_tpu.configs import ModelConfig
from qed_splatter_tpu.engine.optim import adam_moments, replace_adam_moments
from qed_splatter_tpu.models.gaussians import GaussianParams
from qed_splatter_tpu.ops.projection import quat_to_rotmat


@flax.struct.dataclass
class DensifyStats:
    """Per-gaussian screen-space gradient statistics accumulated between
    refines (splatfacto's xys_grad_norm / vis_counts / max_2Dsize)."""

    grad_norm_sum: jnp.ndarray   # [C] sum of absgrad 2-norms
    vis_count: jnp.ndarray       # [C] steps visible (radius > 0)
    max_radii_frac: jnp.ndarray  # [C] max radius / max(H, W)

    @classmethod
    def zeros(cls, capacity: int) -> "DensifyStats":
        # distinct buffers: shared ones break jit donation (same buffer
        # donated twice when the whole TrainState is donated)
        return cls(
            grad_norm_sum=jnp.zeros((capacity,), jnp.float32),
            vis_count=jnp.zeros((capacity,), jnp.float32),
            max_radii_frac=jnp.zeros((capacity,), jnp.float32),
        )


def accumulate_stats(
    stats: DensifyStats,
    absgrad: jnp.ndarray,   # [C, 2] summed |d loss / d means2d| this step
    radii: jnp.ndarray,     # [C] int32
    max_hw: int,
) -> DensifyStats:
    vis = radii > 0
    g = jnp.linalg.norm(absgrad, axis=-1)
    return DensifyStats(
        grad_norm_sum=stats.grad_norm_sum + jnp.where(vis, g, 0.0),
        vis_count=stats.vis_count + vis.astype(jnp.float32),
        max_radii_frac=jnp.maximum(
            stats.max_radii_frac,
            jnp.where(vis, radii.astype(jnp.float32) / float(max_hw), 0.0),
        ),
    )


class RefineInfo(NamedTuple):
    n_alive: jnp.ndarray
    n_culled: jnp.ndarray
    n_split: jnp.ndarray
    n_dup: jnp.ndarray
    n_added: jnp.ndarray
    n_dropped: jnp.ndarray  # candidates that found no free slot


def _inverse_sigmoid(x: float) -> float:
    import math

    return math.log(x / (1.0 - x))


def refine(
    params: GaussianParams,
    opt_state: Dict,
    stats: DensifyStats,
    step: jnp.ndarray,
    rng: jax.Array,
    cfg: ModelConfig,
    num_train_data: int,
    max_hw: int,
    max_new_per_refine: int = 65536,
) -> Tuple[GaussianParams, Dict, DensifyStats, RefineInfo]:
    """One refinement pass (densify + cull). Fully jittable, static shapes."""
    c = params.capacity
    n_samp = cfg.n_split_samples
    max_new = min(max_new_per_refine, c)
    alive = params.alive

    reset_interval = cfg.reset_alpha_every * cfg.refine_every
    do_densify = (
        (step < cfg.stop_split_at)
        & ((step % reset_interval) > (num_train_data + cfg.refine_every))
    )
    # post-split culling continues only if configured
    do_cull = do_densify | (
        (step >= cfg.stop_split_at) & cfg.continue_cull_post_densification
    )

    avg_grad = (
        stats.grad_norm_sum / jnp.maximum(stats.vis_count, 1.0)
    ) * 0.5 * float(max_hw)
    high = (avg_grad > cfg.densify_grad_thresh) & alive & (stats.vis_count > 0)

    scale_max = jnp.exp(params.scales).max(axis=-1)
    big_world = scale_max > cfg.densify_size_thresh
    big_screen = (stats.max_radii_frac > cfg.split_screen_size) & (
        step < cfg.stop_screen_size_at
    )
    splits = (big_world | big_screen) & high & do_densify
    dups = (~big_world) & high & do_densify

    # ---- capacity-aware priority capping ----------------------------------
    # A split recycles the parent slot and needs n_samp slots (net n_samp-1);
    # a dup needs 1. When the free-slot budget can't fund every candidate,
    # keep the highest-absgrad ones and leave the rest untouched — never kill
    # a parent whose children would be dropped (saturation must degrade to
    # "no densification", not to net gaussian loss).
    opac_pre = jax.nn.sigmoid(params.opacities)
    base_culls = (opac_pre < cfg.cull_alpha_thresh) & alive
    budget = c - jnp.sum((alive & ~base_culls).astype(jnp.int32))
    per_split = max(n_samp - 1, 1)
    order = jnp.argsort(jnp.where(splits, -avg_grad, jnp.inf))
    split_prio = jnp.zeros((c,), jnp.int32).at[order].set(
        jnp.arange(c, dtype=jnp.int32)
    )
    max_splits = budget // per_split
    splits = splits & (split_prio < max_splits)
    n_split_now = jnp.sum(splits.astype(jnp.int32))
    dup_budget = budget - n_split_now * per_split
    order_d = jnp.argsort(jnp.where(dups, -avg_grad, jnp.inf))
    dup_prio = jnp.zeros((c,), jnp.int32).at[order_d].set(
        jnp.arange(c, dtype=jnp.int32)
    )
    dups = dups & (dup_prio < dup_budget)

    # ---- candidate packing ------------------------------------------------
    split_rank = jnp.cumsum(splits.astype(jnp.int32)) - 1      # [C]
    n_splits = split_rank[-1] + 1
    dup_rank = jnp.cumsum(dups.astype(jnp.int32)) - 1
    n_dups = dup_rank[-1] + 1
    split_slots = n_splits * n_samp

    cand_src = jnp.full((max_new,), -1, jnp.int32)
    cand_split = jnp.zeros((max_new,), bool)
    idx = jnp.arange(c, dtype=jnp.int32)
    for copy in range(n_samp):  # static, tiny
        pos = jnp.where(splits, split_rank * n_samp + copy, max_new)
        cand_src = cand_src.at[pos].set(idx, mode="drop")
        cand_split = cand_split.at[pos].set(True, mode="drop")
    pos = jnp.where(dups, split_slots + dup_rank, max_new)
    cand_src = cand_src.at[pos].set(idx, mode="drop")

    n_total_new = split_slots + n_dups
    n_eff = jnp.minimum(n_total_new, max_new)

    src = jnp.maximum(cand_src, 0)
    # split sampling: mean + R(q) (exp(scale) * eps)   (splatfacto split_gaussians)
    eps = jax.random.normal(rng, (max_new, 3))
    R = quat_to_rotmat(params.quats[src])
    offset = jnp.einsum("nij,nj->ni", R, jnp.exp(params.scales[src]) * eps)
    cand = {
        "means": params.means[src] + jnp.where(cand_split[:, None], offset, 0.0),
        "quats": params.quats[src],
        "scales": jnp.where(
            cand_split[:, None],
            params.scales[src] - jnp.log(1.6),
            params.scales[src],
        ),
        "opacities": params.opacities[src],
        "features_dc": params.features_dc[src],
        "features_rest": params.features_rest[src],
    }

    # ---- culling ----------------------------------------------------------
    opac = jax.nn.sigmoid(params.opacities)
    culls = (opac < cfg.cull_alpha_thresh) & alive & do_cull
    culls = culls | splits  # split parents die
    after_first_reset = step > (cfg.refine_every * cfg.reset_alpha_every)
    toobig_world = scale_max > cfg.cull_scale_thresh
    toobig_screen = (stats.max_radii_frac > cfg.cull_screen_size) & (
        step < cfg.stop_screen_size_at
    )
    culls = culls | (
        (toobig_world | toobig_screen) & alive & after_first_reset & do_cull
    )
    alive_after_cull = alive & ~culls

    # ---- slot assignment --------------------------------------------------
    free = ~alive_after_cull
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    take = free & (free_rank < n_eff)

    # Scatter the [max_new] candidate rows into their slots rather than
    # gathering a full-capacity candidate array: the gather form
    # (cand[name][clip(free_rank)]) materializes a [C, 15, 3] temp that
    # XLA lays out with 11x tile padding — 2 x 6.8 GB at 3.58M capacity,
    # an HBM OOM the scatter form avoids entirely (candidates are only
    # max_new (<=65k) rows).
    slot_of_rank = jnp.full((max_new,), c, jnp.int32).at[
        jnp.where(take, free_rank, max_new)
    ].set(idx, mode="drop")

    old = params.trainable_dict()
    new = {}
    for name, arr in old.items():
        new[name] = arr.at[slot_of_rank].set(cand[name], mode="drop")
    new_alive = alive_after_cull | take

    # ---- optimizer-state surgery: zero moments of culled + reseeded slots -
    touched = take | culls
    new_opt = {}
    for name, gstate in opt_state.items():
        if name not in old:
            new_opt[name] = gstate
            continue
        mu, nu = adam_moments(gstate)
        sel = touched.reshape((c,) + (1,) * (mu.ndim - 1))
        new_opt[name] = replace_adam_moments(
            gstate, jnp.where(sel, 0.0, mu), jnp.where(sel, 0.0, nu)
        )

    new_params = params.replace_trainable(new).replace(alive=new_alive)
    info = RefineInfo(
        n_alive=jnp.sum(new_alive.astype(jnp.int32)),
        n_culled=jnp.sum(culls.astype(jnp.int32)),
        n_split=n_splits,
        n_dup=n_dups,
        n_added=jnp.minimum(n_eff, jnp.sum(take.astype(jnp.int32))),
        n_dropped=jnp.maximum(n_total_new - jnp.sum(take.astype(jnp.int32)), 0),
    )
    return new_params, new_opt, DensifyStats.zeros(c), info


def maybe_reset_opacities(
    params: GaussianParams,
    opt_state: Dict,
    step: jnp.ndarray,
    cfg: ModelConfig,
) -> Tuple[GaussianParams, Dict]:
    """Opacity reset (splatfacto): at step % reset_interval == refine_every,
    while densification is still active (step < stop_split_at), clamp opacity
    logits to logit(2 * cull_alpha_thresh) and zero the opacities Adam
    moments. jit-stable via where."""
    reset_interval = cfg.reset_alpha_every * cfg.refine_every
    do = (step < cfg.stop_split_at) & ((step % reset_interval) == cfg.refine_every)
    cap = _inverse_sigmoid(min(2.0 * cfg.cull_alpha_thresh, 0.99))
    new_op = jnp.where(do, jnp.minimum(params.opacities, cap), params.opacities)
    gstate = opt_state["opacities"]
    mu, nu = adam_moments(gstate)
    new_opt = dict(opt_state)
    new_opt["opacities"] = replace_adam_moments(
        gstate, jnp.where(do, 0.0, mu), jnp.where(do, 0.0, nu)
    )
    return params.replace(opacities=new_op), new_opt
