"""Probe: actual peak tile count at the canonical bench scene, and step
time at smaller (still lossless) K. Also surfaces the pallas slab-DMA
error verbatim."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from qed_splatter_tpu.configs import ModelConfig, default_optimizers
    from qed_splatter_tpu.engine.optim import GroupOptimizers
    from qed_splatter_tpu.engine.train_step import (
        init_train_state, make_train_step)
    from qed_splatter_tpu.models.gaussians import init_from_points
    from qed_splatter_tpu.ops.camera import get_viewmat
    from qed_splatter_tpu.ops.projection import project_gaussians
    from qed_splatter_tpu.ops.tiles import bin_gaussians
    from qed_splatter_tpu.testing import orbit_c2w_opengl
    from qed_splatter_tpu.utils.microbench import device_time_per_call

    width, height = 1296, 840
    capacity, n_alive = 131_072, 80_000
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.2, 1.2, (n_alive, 3)).astype(np.float32)
    pts[:, 2] = pts[:, 2] * 0.7 + 3.0
    rgb = (rng.uniform(0, 1, (n_alive, 3)) * 255).astype(np.uint8)
    params = init_from_points(pts, rgb, capacity=capacity)
    cfg = ModelConfig(max_per_tile=256)
    f = 0.85 * max(width, height)
    K = jnp.asarray(np.array(
        [[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]], np.float32))
    c2w = jnp.asarray(orbit_c2w_opengl(3.0, 0.15, 0.1, (0, 0, 3.0)))
    viewmat = get_viewmat(c2w[None])
    proj = project_gaussians(
        params.means, params.quats, jnp.exp(params.scales), viewmat, K[None],
        width, height, near_plane=cfg.near_plane, far_plane=cfg.far_plane,
        antialiased=False)
    radii = jnp.where(params.alive, proj.radii[0], 0)
    b = bin_gaussians(proj.means2d[0], radii, proj.depths[0], width, height,
                      max_per_tile=256)
    print("max_tile_count", int(jnp.max(b.tile_counts)),
          "mean", float(jnp.mean(b.tile_counts)), flush=True)

    gt_rgb = jnp.asarray(rng.uniform(0, 1, (height, width, 3)).astype(np.float32))
    gt_depth = jnp.asarray(rng.uniform(0.5, 4.0, (height, width, 1)).astype(np.float32))
    batch = dict(c2w=c2w, K=K, cam_idx=jnp.asarray(0, jnp.int32),
                 rgb=gt_rgb, depth=gt_depth)
    optims = GroupOptimizers(default_optimizers())
    for k_cap in (256, 192, 128):
        cfg_i = ModelConfig(camera_opt_mode="SO3xR3", max_per_tile=k_cap,
                            background_color="random")
        state = init_train_state(params, optims, num_cameras=4)
        inner = make_train_step(cfg_i, optims, width, height,
                                has_depth=True).__wrapped__
        key0 = jax.random.PRNGKey(0)

        def step_op(st, key):
            key, sub = jax.random.split(key)
            st, _ = inner(st, batch, sub)
            return st, key

        ms = device_time_per_call(step_op, (state, key0), n=20) * 1e3
        print(f"step_f32_k{k_cap}", round(ms, 3), "ms", flush=True)


if __name__ == "__main__":
    main()
