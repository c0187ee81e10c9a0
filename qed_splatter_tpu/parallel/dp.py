"""Sharded multi-camera train step: view-DP x gaussian sharding (shard_map).

The TPU-native scaling design (SURVEY §2c, BASELINE.json north star),
written as **explicit SPMD** with `jax.shard_map` rather than GSPMD
auto-partitioning — the Pallas rasterizer is a custom call XLA cannot
auto-partition, so every device runs the exact single-chip hot path on its
local shard and the collectives are placed by hand:

- **view/data parallelism**: B cameras per step, batch leading dim sharded
  over the mesh 'data' axis — each data slice renders its own cameras; the
  per-parameter gradients are summed across slices with `psum('data')`
  (the DDP analog, riding ICI).
- **gaussian sharding**: parameter/optimizer-state/densify-stat rows
  (capacity dim) live sharded over 'model'. Each step `all_gather('model')`
  reconstructs the full parameter rows (~60 floats/gaussian) for rendering;
  its transpose is a `psum_scatter('model')` of the gradient blocks — the
  "gaussian-gradient blocks reduce-scattered" north star. Adam moments and
  stats never materialize unsharded.

Feature parity with the single-device step: Pallas kernels (interpret mode
off-TPU via ``cfg.pallas_interpret``), absgrad via the gather-VJP seed on
the Pallas path / tile_eps on the XLA oracle path, bilateral grids,
camera-opt, ``need_absgrad=False`` for the post-densification phase.

No NCCL/MPI translation — collectives in, XLA lowers them onto ICI.
"""

from __future__ import annotations


from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qed_splatter_tpu.configs import ModelConfig
from qed_splatter_tpu.engine.densify import DensifyStats
from qed_splatter_tpu.engine.optim import GroupOptimizers
from qed_splatter_tpu.engine.train_step import TrainState
from qed_splatter_tpu.models.bilateral_grid import (
    apply_bilateral_grid,
    total_variation_loss,
)
from qed_splatter_tpu.models.camera_opt import (
    apply_camera_opt,
    camera_opt_regularizer,
)
from qed_splatter_tpu.models.splatfacto import render, total_loss
from qed_splatter_tpu.ops.segment import absgrad_scatter_sorted as absgrad_scatter


def state_partition_specs(state: TrainState, capacity: int):
    """PartitionSpec tree: capacity-leading arrays over 'model', everything
    else replicated."""

    def spec(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == capacity:
            return P(*(("model",) + (None,) * (x.ndim - 1)))
        return P()

    return jax.tree.map(spec, state)


def state_shardings(state: TrainState, mesh: Mesh):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        state_partition_specs(state, state.params.capacity),
    )


def batch_partition_specs(batch: Dict):
    return {
        k: P(*(("data",) + (None,) * (v.ndim - 1))) for k, v in batch.items()
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
    need_absgrad: bool = True,
):
    """Build the jitted B-camera SPMD step (jitted once, cached).

    batch: c2w [B,3or4,4], K [B,3,3], cam_idx [B], rgb [B,H,W,3],
    depth [B,H,W,1] (if has_depth), mask [B,H,W,1] (if has_mask).
    B must be a multiple of the mesh 'data' axis size.
    """
    if camera_opt_on is None:
        camera_opt_on = cfg.camera_opt_mode != "off"
    ts = cfg.tile_size
    num_tiles = (-(-width // ts)) * (-(-height // ts))
    k = cfg.max_per_tile
    max_hw = max(width, height)
    num_data = mesh.shape["data"]
    num_model = mesh.shape["model"]
    pallas_on = cfg.use_pallas and (
        jax.default_backend() == "tpu" or cfg.pallas_interpret
    )

    def spmd_body(state: TrainState, batch: Dict, rng: jax.Array):
        # state holds the LOCAL 'model' shard rows; batch the LOCAL 'data'
        # slice of cameras (replicated across 'model' peers).
        b_local = batch["rgb"].shape[0]
        b_total = b_local * num_data
        cap = state.params.capacity * num_model       # global capacity
        cap_local = state.params.capacity
        all_keys = jax.random.split(rng, b_total)
        bg_keys = lax.dynamic_slice_in_dim(
            all_keys, lax.axis_index("data") * b_local, b_local, 0
        )

        def gather_model(x):
            return lax.all_gather(x, "model", axis=0, tiled=True)

        def local_loss(gdict_local, alive_local, cam_delta, side, bgrids):
            # reconstruct full parameter rows; the transpose of this
            # all_gather is the psum_scatter of gradient blocks
            gdict = jax.tree.map(gather_model, gdict_local)
            alive = gather_model(alive_local)
            p = state.params.replace_trainable(gdict).replace(alive=alive)

            def one_camera(c2w, K, cam_idx, rgb, depth, mask, bg_key):
                if camera_opt_on:
                    c2w = apply_camera_opt(c2w, cam_delta[cam_idx])
                out = render(
                    p, c2w, K, width, height, cfg,
                    step=state.step, train=True, bg_rng=bg_key,
                    tile_eps=None if (pallas_on or side is None) else side,
                    absgrad_seed=side if (pallas_on and side is not None)
                    else None,
                )
                if cfg.use_bilateral_grid:
                    rgb_c = apply_bilateral_grid(bgrids[cam_idx], out.rgb)
                    out = out._replace(rgb=jnp.clip(rgb_c, 0.0, 1.0))
                loss, losses = total_loss(
                    out, rgb, depth, p, cfg, state.step, mask
                )
                if camera_opt_on:
                    reg = camera_opt_regularizer(cam_delta[cam_idx])
                    losses = dict(losses, camera_opt_regularizer=reg)
                    loss = loss + reg
                mse = jnp.mean((out.rgb - rgb) ** 2)
                return loss, (losses, out.radii, out.tile_lists, mse,
                              out.tile_overflow,
                              out.tile_max_count)

            in_axes = (0, 0, 0, 0,
                       0 if has_depth else None,
                       0 if has_mask else None, 0)
            losses_all, aux = jax.vmap(
                one_camera, in_axes=in_axes, out_axes=(0, 0)
            )(
                batch["c2w"], batch["K"], batch["cam_idx"], batch["rgb"],
                batch["depth"] if has_depth else None,
                batch["mask"] if has_mask else None,
                bg_keys,
            )
            loss_local_sum = jnp.sum(losses_all)
            if cfg.use_bilateral_grid:
                tv = 10.0 * total_variation_loss(bgrids)
                aux[0]["tv_loss"] = jnp.broadcast_to(tv, (b_local,))
                # tv applies once per step, not per camera
                loss_local_sum = loss_local_sum + tv * b_local / b_total
            return loss_local_sum / b_total, aux

        gdict_local = state.params.trainable_dict()
        if need_absgrad:
            if pallas_on:
                side = jnp.zeros((cap, 2), jnp.float32)
            else:
                side = jnp.zeros((b_local, num_tiles, k, 2), jnp.float32)
                # tile_eps is per-camera on the XLA path
        else:
            side = None

        if not pallas_on and side is not None:
            # vmap needs the per-camera tile_eps batched through one_camera;
            # reshape by closing over it per-camera via vmap of loss is
            # messy — use the seedless loss and a per-camera eps pytree.
            def local_loss_eps(gdict_local, alive_local, cam_delta, eps_b,
                               bgrids):
                gdict = jax.tree.map(gather_model, gdict_local)
                alive = gather_model(alive_local)
                p = state.params.replace_trainable(gdict).replace(alive=alive)

                def one_camera(eps, c2w, K, cam_idx, rgb, depth, mask,
                               bg_key):
                    if camera_opt_on:
                        c2w = apply_camera_opt(c2w, cam_delta[cam_idx])
                    out = render(
                        p, c2w, K, width, height, cfg,
                        step=state.step, train=True, bg_rng=bg_key,
                        tile_eps=eps,
                    )
                    if cfg.use_bilateral_grid:
                        rgb_c = apply_bilateral_grid(bgrids[cam_idx], out.rgb)
                        out = out._replace(rgb=jnp.clip(rgb_c, 0.0, 1.0))
                    loss, losses = total_loss(
                        out, rgb, depth, p, cfg, state.step, mask
                    )
                    if camera_opt_on:
                        reg = camera_opt_regularizer(cam_delta[cam_idx])
                        losses = dict(losses, camera_opt_regularizer=reg)
                        loss = loss + reg
                    mse = jnp.mean((out.rgb - rgb) ** 2)
                    return loss, (losses, out.radii, out.tile_lists, mse,
                              out.tile_overflow,
                              out.tile_max_count)

                in_axes = (0, 0, 0, 0, 0,
                           0 if has_depth else None,
                           0 if has_mask else None, 0)
                losses_all, aux = jax.vmap(
                    one_camera, in_axes=in_axes, out_axes=(0, 0)
                )(
                    eps_b, batch["c2w"], batch["K"], batch["cam_idx"],
                    batch["rgb"],
                    batch["depth"] if has_depth else None,
                    batch["mask"] if has_mask else None,
                    bg_keys,
                )
                loss_local_sum = jnp.sum(losses_all)
                if cfg.use_bilateral_grid:
                    tv = 10.0 * total_variation_loss(bgrids)
                    aux[0]["tv_loss"] = jnp.broadcast_to(tv, (b_local,))
                    loss_local_sum = loss_local_sum + tv * b_local / b_total
                return loss_local_sum / b_total, aux

            loss_fn = local_loss_eps
        else:
            loss_fn = local_loss

        bgrids = state.bilateral_grids
        loss_local, vjp_fn, aux = jax.vjp(
            loss_fn,
            gdict_local, state.params.alive, state.camera_opt, side, bgrids,
            has_aux=True,
        )
        losses, radii_b, tile_lists_b, mse_b, overflow_b, tmc_b = aux
        g_gdict, _, g_cam, g_side, g_bgrid = vjp_fn(jnp.float32(1.0))

        # cross-'data' gradient sums. The all_gather transpose already
        # psum_scattered gradient blocks over 'model' — but every 'model'
        # peer rendered the same cameras, so those blocks carry num_model
        # duplicate contributions.
        g_gdict = jax.tree.map(
            lambda x: lax.psum(x, "data") / num_model, g_gdict
        )
        if camera_opt_on:
            g_cam = lax.psum(g_cam, "data")
        if cfg.use_bilateral_grid and g_bgrid is not None:
            g_bgrid = lax.psum(g_bgrid, "data")
        loss = lax.psum(loss_local, "data")

        # gradient hygiene (mirrors engine.train_step): count + zero
        # non-finite elements before they reach Adam; count is psum'd over
        # 'model' (each peer holds distinct capacity rows) and NOT over
        # 'data' (grads are already data-summed, every peer sees the same
        # values).
        nonfinite = jnp.zeros((), jnp.float32)
        if cfg.sanitize_grads:
            def _count(g):
                return jnp.sum((~jnp.isfinite(g)).astype(jnp.float32))

            def _clean(g):
                return jnp.where(jnp.isfinite(g), g, 0.0)

            nonfinite = lax.psum(
                jax.tree.reduce(lambda a, l: a + _count(l), g_gdict, 0.0),
                "model",
            ) + _count(g_cam)
            g_gdict = jax.tree.map(_clean, g_gdict)
            g_cam = _clean(g_cam)
            if g_bgrid is not None:
                nonfinite = nonfinite + _count(g_bgrid)
                g_bgrid = jax.tree.map(_clean, g_bgrid)
        if cfg.grad_clip_norm > 0.0:
            def _clip_sharded(g):
                sq = lax.psum(jnp.sum(g * g), "model")
                n = jnp.sqrt(sq + 1e-20)
                return g * jnp.minimum(1.0, cfg.grad_clip_norm / n)

            def _clip_rep(g):
                n = jnp.sqrt(jnp.sum(g * g) + 1e-20)
                return g * jnp.minimum(1.0, cfg.grad_clip_norm / n)

            g_gdict = jax.tree.map(_clip_sharded, g_gdict)
            g_cam = _clip_rep(g_cam)

        # densify statistics on the local stat rows
        if need_absgrad:
            if pallas_on:
                absg = lax.psum(g_side, "data")          # [cap_global, 2]
            else:
                absg = lax.psum(
                    jax.vmap(
                        lambda g, tl: absgrad_scatter(g, tl, cap)
                    )(g_side, tile_lists_b).sum(axis=0),
                    "data",
                )
            shard0 = lax.axis_index("model") * cap_local
            absg_local = lax.dynamic_slice(absg, (shard0, 0), (cap_local, 2))
            vis_b = radii_b > 0                          # [b_local, cap]
            vis_count = lax.psum(
                jnp.sum(vis_b.astype(jnp.float32), axis=0), "data"
            )
            max_frac = lax.pmax(
                jnp.max(
                    jnp.where(vis_b, radii_b.astype(jnp.float32) / max_hw,
                              0.0),
                    axis=0,
                ),
                "data",
            )
            vis_local = lax.dynamic_slice(vis_count, (shard0,), (cap_local,))
            frac_local = lax.dynamic_slice(max_frac, (shard0,), (cap_local,))
            gnorm = jnp.linalg.norm(absg_local, axis=-1)
            stats = DensifyStats(
                grad_norm_sum=state.stats.grad_norm_sum
                + jnp.where(vis_local > 0, gnorm, 0.0),
                vis_count=state.stats.vis_count + vis_local,
                max_radii_frac=jnp.maximum(
                    state.stats.max_radii_frac, frac_local
                ),
            )
        else:
            stats = state.stats

        # per-group Adam on the LOCAL parameter/moment rows
        new_gparams, new_opt = optims.update(
            g_gdict, state.opt_state, gdict_local
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

        metrics = {
            kk: lax.psum(jnp.sum(v), "data") / b_total
            for kk, v in losses.items()
        }
        metrics["loss"] = loss
        if cfg.sanitize_grads:
            metrics["nonfinite_grads"] = nonfinite
        metrics["tile_overflow"] = (
            lax.psum(jnp.sum(overflow_b), "data") / b_total
        )
        metrics["tile_max_count"] = lax.pmax(jnp.max(tmc_b), "data")
        metrics["gaussian_count"] = lax.psum(
            params.num_alive(), "model"
        )
        metrics["psnr"] = -10.0 * jnp.log10(
            lax.psum(jnp.sum(mse_b), "data") / b_total + 1e-12
        )

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

    cache = {}

    def jitted(state: TrainState, batch: Dict, rng: jax.Array):
        key = (
            jax.tree.structure((state, batch)),
            state.params.capacity,
            batch["rgb"].shape,
        )
        if key not in cache:
            st_specs = state_partition_specs(state, state.params.capacity)
            b_specs = batch_partition_specs(batch)
            metric_specs = P()
            mapped = jax.shard_map(
                spmd_body,
                mesh=mesh,
                in_specs=(st_specs, b_specs, P()),
                out_specs=(st_specs, metric_specs),
                check_vma=False,
            )
            cache[key] = jax.jit(mapped, donate_argnums=(0,))
        return cache[key](state, batch, rng)

    return jitted
