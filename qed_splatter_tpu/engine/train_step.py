"""The jitted training step: render -> loss -> adjoint -> Adam -> stats.

This is the per-iteration "solve" of BASELINE.json's north star. One call
does what the reference's Trainer step does across
``pipeline.get_train_loss_dict`` + ``loss.backward()`` + ``optimizer.step()``
(SURVEY §3 stack A), as a single compiled XLA program:

- forward render of one camera (reference model.py:199-321),
- photometric + depth-L1 + regularization losses (model.py:73-118),
- gradients to all six gaussian groups and the camera-opt deltas,
- the absgrad side-channel for densification (model.py:284, 289-292),
- per-group Adam updates (config.py:44-81),
- densify-stat accumulation.

Static configuration (image size, capacity, flags) is closed over via
``make_train_step`` so XLA compiles one program per resolution bucket.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp

from qed_splatter_tpu.configs import ModelConfig
from qed_splatter_tpu.engine.densify import DensifyStats, accumulate_stats
from qed_splatter_tpu.engine.optim import GroupOptimizers
from qed_splatter_tpu.models.camera_opt import (
    apply_camera_opt,
    camera_opt_regularizer,
)
from qed_splatter_tpu.models.bilateral_grid import (
    apply_bilateral_grid,
    init_bilateral_grids,
    total_variation_loss,
)
from qed_splatter_tpu.models.gaussians import GaussianParams
from qed_splatter_tpu.models.splatfacto import render, total_loss
from qed_splatter_tpu.ops.segment import absgrad_scatter_sorted as absgrad_scatter


@flax.struct.dataclass
class TrainState:
    """Everything the jitted step mutates."""

    params: GaussianParams
    opt_state: Dict
    camera_opt: jnp.ndarray        # [num_cameras, 6] SO3xR3 deltas
    camera_opt_state: Dict         # optax state for the camera_opt group
    stats: DensifyStats
    step: jnp.ndarray              # int32 scalar
    # per-camera bilateral color grids (SURVEY D11); None when disabled
    bilateral_grids: Optional[jnp.ndarray] = None
    bilateral_grid_state: Optional[Dict] = None


def init_train_state(
    params: GaussianParams,
    optims: GroupOptimizers,
    num_cameras: int,
    use_bilateral_grid: bool = False,
    bilateral_grid_shape=(16, 16, 8),
) -> TrainState:
    cam = jnp.zeros((max(num_cameras, 1), 6), jnp.float32)
    bgrids = bstate = None
    if use_bilateral_grid:
        bgrids = init_bilateral_grids(
            max(num_cameras, 1), bilateral_grid_shape
        )
        bstate = optims.txs["bilateral_grid"].init(bgrids)
    return TrainState(
        params=params,
        opt_state=optims.init(params.trainable_dict()),
        camera_opt=cam,
        camera_opt_state=optims.txs["camera_opt"].init(cam),
        stats=DensifyStats.zeros(params.capacity),
        step=jnp.zeros((), jnp.int32),
        bilateral_grids=bgrids,
        bilateral_grid_state=bstate,
    )


def make_train_step(
    cfg: ModelConfig,
    optims: GroupOptimizers,
    width: int,
    height: int,
    has_depth: bool,
    has_mask: bool = False,
    camera_opt_on: Optional[bool] = None,
    need_absgrad: bool = True,
):
    """Build a jit-ready step for one (width, height) bucket.

    ``need_absgrad=False`` drops the tile_eps gradient channel and the
    absgrad scatter (~20 ms/step at 1296x840) — only lawful after
    densification ends (step >= stop_split_at), when the stats are unused.
    """
    if camera_opt_on is None:
        camera_opt_on = cfg.camera_opt_mode != "off"
    ts = cfg.tile_size
    num_tiles = (-(-width // ts)) * (-(-height // ts))
    k = cfg.max_per_tile
    max_hw = max(width, height)
    # On the Pallas hot path absgrad comes out of the gather VJP's seed
    # input (one shared row gather); the XLA oracle path uses the tile_eps
    # side-channel + a standalone reduction.
    pallas_on = cfg.use_pallas and (
        jax.default_backend() == "tpu" or cfg.pallas_interpret
    )

    def step_fn(state: TrainState, batch: Dict, rng: jax.Array):
        """batch: c2w [3or4,4], K [3,3], cam_idx int32, rgb [H,W,3],
        depth [H,W,1] (if has_depth), mask [H,W,1] (if has_mask)."""
        rng_bg, _ = jax.random.split(rng)
        gt_rgb = batch["rgb"]
        gt_depth = batch["depth"] if has_depth else None
        mask = batch["mask"] if has_mask else None

        def loss_fn(gdict, cam_delta, side, bgrids):
            # ``side`` is the absgrad side-channel: a zeros [N, 2] seed on
            # the Pallas path, a zeros [T, K, 2] tile_eps on the XLA path.
            p = state.params.replace_trainable(gdict)
            c2w = batch["c2w"]
            if camera_opt_on:
                c2w = apply_camera_opt(c2w, cam_delta[batch["cam_idx"]])
            out = render(
                p, c2w, batch["K"], width, height, cfg,
                step=state.step, train=True, bg_rng=rng_bg,
                tile_eps=None if pallas_on else side,
                absgrad_seed=side if pallas_on else None,
            )
            if cfg.use_bilateral_grid:
                # per-camera color correction on the rendered image during
                # training (reference model.py:300-302)
                rgb = apply_bilateral_grid(
                    bgrids[batch["cam_idx"]], out.rgb
                )
                out = out._replace(rgb=jnp.clip(rgb, 0.0, 1.0))
            loss, losses = total_loss(
                out, gt_rgb, gt_depth, p, cfg, state.step, mask
            )
            if camera_opt_on:
                reg = camera_opt_regularizer(cam_delta[batch["cam_idx"]])
                losses = dict(losses, camera_opt_regularizer=reg)
                loss = loss + reg
            if cfg.use_bilateral_grid:
                tv = 10.0 * total_variation_loss(bgrids)
                losses = dict(losses, tv_loss=tv)
                loss = loss + tv
            return loss, (losses, out)

        bgrids = state.bilateral_grids
        if need_absgrad:
            if pallas_on:
                side = jnp.zeros((state.params.capacity, 2), jnp.float32)
            else:
                side = jnp.zeros((num_tiles, k, 2), jnp.float32)
            grad_fn = jax.value_and_grad(
                loss_fn, argnums=(0, 1, 2, 3) if cfg.use_bilateral_grid
                else (0, 1, 2), has_aux=True
            )
            if cfg.use_bilateral_grid:
                (loss, (losses, out)), (g_params, g_cam, g_side, g_bgrid) = (
                    grad_fn(state.params.trainable_dict(), state.camera_opt,
                            side, bgrids)
                )
            else:
                (loss, (losses, out)), (g_params, g_cam, g_side) = grad_fn(
                    state.params.trainable_dict(), state.camera_opt,
                    side, None,
                )
                g_bgrid = None
            # absgrad densification statistics (reference model.py:289-292)
            if pallas_on:
                absg = g_side        # already the per-gaussian |grad| sums
            else:
                absg = absgrad_scatter(
                    g_side, out.tile_lists, state.params.capacity,
                    slab_perm=out.slab_perm, slab_bounds=out.slab_bounds,
                    inv_order=out.inv_order,
                )
            stats = accumulate_stats(state.stats, absg, out.radii, max_hw)
        else:
            grad_fn = jax.value_and_grad(
                lambda g, c, b: loss_fn(g, c, None, b),
                argnums=(0, 1, 2) if cfg.use_bilateral_grid else (0, 1),
                has_aux=True,
            )
            if cfg.use_bilateral_grid:
                (loss, (losses, out)), (g_params, g_cam, g_bgrid) = grad_fn(
                    state.params.trainable_dict(), state.camera_opt, bgrids
                )
            else:
                (loss, (losses, out)), (g_params, g_cam) = grad_fn(
                    state.params.trainable_dict(), state.camera_opt, None
                )
                g_bgrid = None
            stats = state.stats

        # gradient hygiene: count + zero non-finite elements, then the
        # optional global-norm clip, BEFORE any optimizer state is touched
        nonfinite = jnp.zeros((), jnp.float32)
        if cfg.sanitize_grads:
            def _count(g):
                return jnp.sum((~jnp.isfinite(g)).astype(jnp.float32))

            def _clean(g):
                return jnp.where(jnp.isfinite(g), g, 0.0)

            all_grads = [g_params, g_cam]
            if g_bgrid is not None:
                all_grads.append(g_bgrid)
            nonfinite = sum(
                jax.tree.reduce(lambda a, l: a + _count(l), g, 0.0)
                for g in all_grads
            )
            g_params = jax.tree.map(_clean, g_params)
            g_cam = _clean(g_cam)
            if g_bgrid is not None:
                g_bgrid = jax.tree.map(_clean, g_bgrid)
        if cfg.grad_clip_norm > 0.0:
            def _clip(g):
                n = jnp.sqrt(jnp.sum(g * g) + 1e-20)
                return g * jnp.minimum(1.0, cfg.grad_clip_norm / n)

            g_params = jax.tree.map(_clip, g_params)
            g_cam = _clip(g_cam)

        # per-group Adam (reference config.py:44-81)
        new_gparams, new_opt = optims.update(
            g_params, state.opt_state, state.params.trainable_dict()
        )
        params = state.params.replace_trainable(new_gparams)

        if camera_opt_on:
            upd, cam_state = optims.txs["camera_opt"].update(
                g_cam, state.camera_opt_state, state.camera_opt
            )
            camera_opt = state.camera_opt + upd
        else:
            camera_opt, cam_state = state.camera_opt, state.camera_opt_state

        if cfg.use_bilateral_grid and g_bgrid is not None:
            bupd, bstate = optims.txs["bilateral_grid"].update(
                g_bgrid, state.bilateral_grid_state, bgrids
            )
            bgrids = bgrids + bupd
        else:
            bstate = state.bilateral_grid_state

        metrics = dict(losses)
        metrics["loss"] = loss
        if cfg.sanitize_grads:
            metrics["nonfinite_grads"] = nonfinite
        metrics["gaussian_count"] = params.num_alive()
        metrics["psnr"] = -10.0 * jnp.log10(
            jnp.mean((out.rgb - gt_rgb) ** 2) + 1e-12
        )
        if out.tile_overflow is not None:
            metrics["tile_overflow"] = out.tile_overflow
        if out.bbox_truncated is not None:
            metrics["bbox_truncated"] = out.bbox_truncated
        if out.tile_max_count is not None:
            metrics["tile_max_count"] = out.tile_max_count

        new_state = TrainState(
            params=params,
            opt_state=new_opt,
            camera_opt=camera_opt,
            camera_opt_state=cam_state,
            stats=stats,
            step=state.step + 1,
            bilateral_grids=bgrids,
            bilateral_grid_state=bstate,
        )
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def make_eval_render(cfg: ModelConfig, width: int, height: int):
    """Jitted eval-mode render (no camera-opt, fixed background)."""

    @functools.partial(jax.jit, static_argnames=())
    def eval_fn(params: GaussianParams, c2w, K, step):
        out = render(
            params, c2w, K, width, height, cfg,
            step=step, train=False, bg_rng=None,
        )
        return out.rgb, out.depth, out.accumulation

    return eval_fn
