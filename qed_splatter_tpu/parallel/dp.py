"""Sharded multi-camera train step: view-DP x gaussian sharding (GSPMD).

The TPU-native scaling design (SURVEY §2c, BASELINE.json north star):

- **view/data parallelism**: B cameras per step, batch leading dim sharded
  over the mesh 'data' axis — each device renders its own cameras. The mean
  loss makes gaussian gradients an all-reduce over 'data' (the DDP analog),
  inserted automatically by GSPMD from the sharding annotations.
- **gaussian sharding**: parameter/optimizer-state rows (capacity dim)
  sharded over 'model'. Per-gaussian math (projection, SH, Adam) runs
  sharded; the rasterizer needs the full projected-splat arrays
  (~11 floats/gaussian — small), so XLA all-gathers those and
  reduce-scatters the gradient blocks back. 3D params + Adam moments never
  materialize unsharded.

No NCCL/MPI translation — shardings in, XLA collectives out, ICI underneath.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qed_splatter_tpu.configs import ModelConfig
from qed_splatter_tpu.engine.densify import DensifyStats
from qed_splatter_tpu.engine.optim import GroupOptimizers
from qed_splatter_tpu.engine.train_step import TrainState
from qed_splatter_tpu.models.camera_opt import (
    apply_camera_opt,
    camera_opt_regularizer,
)
from qed_splatter_tpu.models.splatfacto import render, total_loss
from qed_splatter_tpu.ops.segment import absgrad_scatter_sorted as absgrad_scatter
from qed_splatter_tpu.parallel.mesh import shard_leading_capacity


def state_shardings(state: TrainState, mesh: Mesh):
    """TrainState sharding tree: capacity-leading arrays over 'model',
    everything else replicated."""
    return shard_leading_capacity(state, mesh, state.params.capacity)


def batch_shardings(batch: Dict, mesh: Mesh):
    return {
        k: NamedSharding(mesh, P(*(("data",) + (None,) * (v.ndim - 1))))
        for k, v in batch.items()
    }


def make_sharded_train_step(
    cfg: ModelConfig,
    optims: GroupOptimizers,
    width: int,
    height: int,
    mesh: Mesh,
    has_depth: bool,
    has_mask: bool = False,
    camera_opt_on: Optional[bool] = None,
):
    """Build the jitted B-camera step.

    batch: c2w [B,3or4,4], K [B,3,3], cam_idx [B], rgb [B,H,W,3],
    depth [B,H,W,1] (if has_depth), mask [B,H,W,1] (if has_mask).
    B should be a multiple of the mesh 'data' axis.
    """
    if camera_opt_on is None:
        camera_opt_on = cfg.camera_opt_mode != "off"
    ts = cfg.tile_size
    num_tiles = (-(-width // ts)) * (-(-height // ts))
    k = cfg.max_per_tile
    max_hw = max(width, height)

    def step_fn(state: TrainState, batch: Dict, rng: jax.Array):
        b = batch["rgb"].shape[0]
        bg_keys = jax.random.split(rng, b)

        def one_camera(gdict, cam_delta, teps, c2w, K, cam_idx, rgb,
                       depth, mask, bg_key):
            p = state.params.replace_trainable(gdict)
            if camera_opt_on:
                c2w = apply_camera_opt(c2w, cam_delta[cam_idx])
            out = render(
                p, c2w, K, width, height, cfg,
                step=state.step, train=True, bg_rng=bg_key, tile_eps=teps,
            )
            loss, losses = total_loss(
                out, rgb, depth, p, cfg, state.step, mask
            )
            if camera_opt_on:
                reg = camera_opt_regularizer(cam_delta[cam_idx])
                losses = dict(losses, camera_opt_regularizer=reg)
                loss = loss + reg
            return loss, (losses, out.radii, out.tile_lists, out.rgb)

        def loss_fn(gdict, cam_delta, tile_eps):
            in_axes = (None, None, 0, 0, 0, 0, 0,
                       0 if has_depth else None,
                       0 if has_mask else None, 0)
            losses_all, aux = jax.vmap(
                one_camera, in_axes=in_axes, out_axes=(0, 0)
            )(
                gdict, cam_delta, tile_eps,
                batch["c2w"], batch["K"], batch["cam_idx"], batch["rgb"],
                batch["depth"] if has_depth else None,
                batch["mask"] if has_mask else None,
                bg_keys,
            )
            return jnp.mean(losses_all), aux

        tile_eps = jnp.zeros((b, num_tiles, k, 2), jnp.float32)
        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)
        (loss, (losses, radii_b, tile_lists_b, rgb_b)), (
            g_params, g_cam, g_eps
        ) = grad_fn(
            state.params.trainable_dict(), state.camera_opt, tile_eps
        )

        cap = state.params.capacity
        absg = jax.vmap(
            lambda g, tl: absgrad_scatter(g, tl, cap)
        )(g_eps, tile_lists_b).sum(axis=0)
        vis_b = radii_b > 0
        vis_count = jnp.sum(vis_b.astype(jnp.float32), axis=0)
        gnorm = jnp.linalg.norm(absg, axis=-1)
        max_frac = jnp.max(
            jnp.where(vis_b, radii_b.astype(jnp.float32) / max_hw, 0.0),
            axis=0,
        )
        stats = DensifyStats(
            grad_norm_sum=state.stats.grad_norm_sum
            + jnp.where(vis_count > 0, gnorm, 0.0),
            vis_count=state.stats.vis_count + vis_count,
            max_radii_frac=jnp.maximum(state.stats.max_radii_frac, max_frac),
        )

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

        metrics = {k: jnp.mean(v) for k, v in losses.items()}
        metrics["loss"] = loss
        metrics["gaussian_count"] = params.num_alive()
        metrics["psnr"] = -10.0 * jnp.log10(
            jnp.mean((rgb_b - batch["rgb"]) ** 2) + 1e-12
        )
        new_state = TrainState(
            params=params,
            opt_state=new_opt,
            camera_opt=camera_opt,
            camera_opt_state=cam_state,
            stats=stats,
            step=state.step + 1,
        )
        return new_state, metrics

    dummy_state_shardings = None  # resolved lazily at first call

    def jitted(state: TrainState, batch: Dict, rng: jax.Array):
        nonlocal dummy_state_shardings
        if dummy_state_shardings is None:
            dummy_state_shardings = state_shardings(state, mesh)
        fn = jax.jit(
            step_fn,
            in_shardings=(
                dummy_state_shardings,
                batch_shardings(batch, mesh),
                NamedSharding(mesh, P()),
            ),
            out_shardings=(
                dummy_state_shardings,
                NamedSharding(mesh, P()),
            ),
            donate_argnums=(0,),
        )
        return fn(state, batch, rng)

    return jitted
