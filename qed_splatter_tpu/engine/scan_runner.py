"""Device-resident dataset + multi-step scan dispatch.

The reference's per-step Python loop (SURVEY D6/D7) costs a host round-trip
every iteration; through a tunneled TPU that is ~1 s/step, and even on local
hardware dispatch overhead bounds small-resolution throughput. TPU-native
fix: cache the (bucketed) training images *on device* — uint8, like the
reference's host cache (config.py:37) — and run ``refine_every`` training
steps inside ONE jitted ``lax.scan``, sampling cameras by a prefetched
permutation. One dispatch per densification interval instead of one per
step; the scan carries the TrainState, so XLA pipelines the whole interval.

Camera sampling stays identical to the reference (random without
replacement per epoch) — the permutation is drawn host-side and passed in.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qed_splatter_tpu.configs import ModelConfig
from qed_splatter_tpu.engine.optim import GroupOptimizers
from qed_splatter_tpu.engine.train_step import TrainState, make_train_step


class DeviceDataset:
    """Stacked per-bucket training data living in HBM."""

    def __init__(self, items, d: int, downscale_image, downscale_depth):
        cams = []
        rgbs, depths, masks, c2ws, Ks, idxs = [], [], [], [], [], []
        for item in items:
            cam = item["camera"].rescaled(1.0 / d) if d > 1 else item["camera"]
            cams.append(cam)
            rgbs.append(
                np.asarray(downscale_image(item["image"], d), np.uint8)
                if d > 1 else item["image"]
            )
            c2ws.append(cam.c2w)
            Ks.append(cam.intrinsics_matrix())
            idxs.append(item["cam_idx"])
            if "depth_image" in item:
                depths.append(downscale_depth(item["depth_image"], d))
            if "mask" in item:
                masks.append(downscale_depth(item["mask"], d))
        self.width, self.height = cams[0].width, cams[0].height
        self.has_depth = len(depths) == len(items)
        self.has_mask = len(masks) == len(items)
        self.data: Dict[str, jnp.ndarray] = {
            "rgb_u8": jnp.asarray(np.stack(rgbs)),
            "c2w": jnp.asarray(np.stack(c2ws)),
            "K": jnp.asarray(np.stack(Ks)),
            "cam_idx": jnp.asarray(np.asarray(idxs, np.int32)),
        }
        if self.has_depth:
            self.data["depth"] = jnp.asarray(np.stack(depths))
        if self.has_mask:
            self.data["mask"] = jnp.asarray(np.stack(masks))

    def nbytes(self) -> int:
        return sum(int(np.prod(v.shape)) * v.dtype.itemsize
                   for v in self.data.values())


# The jitted scan runner is dataset-INDEPENDENT (the image cache enters as
# an argument; only its shapes matter), so it is memoized here on the
# static configuration: N same-shaped scenes trained in one process
# (engine.multi_scene) share ONE compiled program instead of recompiling
# the hot path per scene. Keyed by the optimizer OBJECT identity (configs
# hash; optax transforms don't) — the cache keeps a strong reference so a
# recycled id() can never alias a dead optimizer — and LRU-bounded.
_RUNNER_CACHE: "OrderedDict[tuple, tuple]" = OrderedDict()
_RUNNER_CACHE_MAX = 32


def make_scan_steps(
    cfg: ModelConfig,
    optims: GroupOptimizers,
    dataset: DeviceDataset,
    num_steps: int,
    need_absgrad: bool = True,
    camera_opt_on: Optional[bool] = None,
):
    """Runner: (state, perm [num_steps], rng) -> (state, metrics).

    metrics leaves are [num_steps]-stacked scalars.
    """
    jitted = _scan_runner(
        cfg, optims, dataset.width, dataset.height, dataset.has_depth,
        dataset.has_mask, num_steps, need_absgrad, camera_opt_on,
    )

    def call(state: TrainState, perm: jnp.ndarray, rng: jax.Array):
        return jitted(state, perm, rng, dataset.data)

    call._jitted = jitted  # exposed for payload-regression tests
    return call


def _scan_runner(
    cfg: ModelConfig,
    optims: GroupOptimizers,
    width: int,
    height: int,
    has_depth: bool,
    has_mask: bool,
    num_steps: int,
    need_absgrad: bool,
    camera_opt_on: Optional[bool],
):
    key = (id(optims), cfg, width, height, has_depth, has_mask,
           num_steps, need_absgrad, camera_opt_on)
    hit = _RUNNER_CACHE.get(key)
    if hit is not None and hit[0] is optims:
        _RUNNER_CACHE.move_to_end(key)
        return hit[1]
    inner = make_train_step(
        cfg, optims, width, height,
        has_depth=has_depth, has_mask=has_mask,
        camera_opt_on=camera_opt_on, need_absgrad=need_absgrad,
    ).__wrapped__

    # ``data`` is an explicit jit argument, NOT a closure: jit's call path
    # inlines closed-over arrays as stablehlo literal constants, so a
    # closure would embed the whole image cache in the program (measured
    # 335 MB at 1296x840x44 frames — breaking any compile-payload limit
    # and bloating every recompile); as an argument it is a zero-copy
    # device buffer reference.
    def run(state: TrainState, perm: jnp.ndarray, rng: jax.Array,
            data: Dict[str, jnp.ndarray]):
        def body(carry, sel):
            st, key = carry
            key, sub = jax.random.split(key)
            batch = {
                "c2w": data["c2w"][sel],
                "K": data["K"][sel],
                "cam_idx": data["cam_idx"][sel],
                "rgb": data["rgb_u8"][sel].astype(jnp.float32) / 255.0,
            }
            if has_depth:
                batch["depth"] = data["depth"][sel]
            if has_mask:
                batch["mask"] = data["mask"][sel]
            st, metrics = inner(st, batch, sub)
            light = {
                k: metrics[k]
                for k in ("loss", "psnr", "main_loss", "depth_loss",
                          "tile_overflow", "bbox_truncated",
                          "tile_max_count", "nonfinite_grads")
                if k in metrics
            }
            return (st, key), light

        (state, _), metrics = jax.lax.scan(
            body, (state, rng), perm[:num_steps]
        )
        return state, metrics

    jitted = jax.jit(run, donate_argnums=(0,))
    _RUNNER_CACHE[key] = (optims, jitted)
    while len(_RUNNER_CACHE) > _RUNNER_CACHE_MAX:
        _RUNNER_CACHE.popitem(last=False)
    return jitted
