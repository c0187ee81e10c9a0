"""Per-component device-time breakdown of the training step.

Times each stage of the per-iteration solve at the canonical bench
workload (1296x840, 80k alive / 131k capacity, K=256) with the same
fori-loop device-truth methodology as bench.py. Prints one JSON dict.

Run on the real TPU with the chip otherwise idle.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import json
import sys

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from qed_splatter_tpu.configs import ModelConfig, default_optimizers
    from qed_splatter_tpu.engine.optim import GroupOptimizers
    from qed_splatter_tpu.engine.train_step import (
        init_train_state,
        make_train_step,
    )
    from qed_splatter_tpu.models.gaussians import init_from_points
    from qed_splatter_tpu.models.splatfacto import render
    from qed_splatter_tpu.ops.camera import get_viewmat
    from qed_splatter_tpu.ops.projection import project_gaussians
    from qed_splatter_tpu.ops.segment import tile_gather_ranked
    from qed_splatter_tpu.ops.sh import eval_sh_colors
    from qed_splatter_tpu.ops.ssim import ssim
    from qed_splatter_tpu.ops.tiles import bin_gaussians
    from qed_splatter_tpu.ops.rasterize_pallas import composite_tiles_chunked
    from qed_splatter_tpu.testing import orbit_c2w_opengl
    from qed_splatter_tpu.utils.microbench import device_time_per_call

    width, height = 1296, 840
    capacity, n_alive = 131_072, 80_000
    ts = 16
    k_cap = 256
    if len(sys.argv) > 1:  # tiny smoke config: bench_breakdown.py tiny
        width, height = 160, 112
        capacity, n_alive = 2048, 1500
        k_cap = 128

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.2, 1.2, (n_alive, 3)).astype(np.float32)
    pts[:, 2] = pts[:, 2] * 0.7 + 3.0
    rgb = (rng.uniform(0, 1, (n_alive, 3)) * 255).astype(np.uint8)
    params = init_from_points(pts, rgb, capacity=capacity)

    cfg = ModelConfig(
        camera_opt_mode="SO3xR3", max_per_tile=k_cap,
        background_color="random",
    )
    f = 0.85 * max(width, height)
    K = jnp.asarray(np.array(
        [[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]], np.float32))
    c2w = jnp.asarray(orbit_c2w_opengl(3.0, 0.15, 0.1, (0, 0, 3.0)))
    gt_rgb = jnp.asarray(rng.uniform(0, 1, (height, width, 3)).astype(np.float32))
    gt_depth = jnp.asarray(rng.uniform(0.5, 4.0, (height, width, 1)).astype(np.float32))

    times = {}

    def t(name, op, args, n=10):
        times[name] = round(device_time_per_call(op, args, n=n) * 1e3, 3)
        print(name, times[name], "ms", flush=True)

    # --- full train step (f32 and bf16-mixed) ---
    optims = GroupOptimizers(default_optimizers())
    batch = dict(c2w=c2w, K=K, cam_idx=jnp.asarray(0, jnp.int32),
                 rgb=gt_rgb, depth=gt_depth)
    for label, mp in (("step_f32", False), ("step_bf16", True)):
        cfg_i = ModelConfig(camera_opt_mode="SO3xR3", max_per_tile=k_cap,
                            background_color="random", mixed_precision=mp)
        state = init_train_state(params, optims, num_cameras=4)
        inner = make_train_step(cfg_i, optims, width, height,
                                has_depth=True).__wrapped__
        key0 = jax.random.PRNGKey(0)

        def step_op(st, key):
            key, sub = jax.random.split(key)
            st, _ = inner(st, batch, sub)
            return st, key

        t(label, step_op, (state, key0), n=20)

    # also: absgrad-off step (post-densification regime)
    state = init_train_state(params, optims, num_cameras=4)
    inner_noabs = make_train_step(cfg, optims, width, height, has_depth=True,
                                  need_absgrad=False).__wrapped__

    def step_op2(st, key):
        key, sub = jax.random.split(key)
        st, _ = inner_noabs(st, batch, sub)
        return st, key

    t("step_f32_noabsgrad", step_op2, (state, jax.random.PRNGKey(0)), n=20)

    # --- stages ---
    viewmat = get_viewmat(c2w[None])
    scales = jnp.exp(params.scales)

    def proj_op(means, quats, scales):
        return project_gaussians(means, quats, scales, viewmat, K[None],
                                 width, height, near_plane=cfg.near_plane,
                                 far_plane=cfg.far_plane, antialiased=False)

    t("projection_fwd", proj_op, (params.means, params.quats, scales))

    def proj_grad_op(means, quats, scales):
        def lo(m, q, s):
            p = project_gaussians(m, q, s, viewmat, K[None], width, height,
                                  near_plane=cfg.near_plane,
                                  far_plane=cfg.far_plane, antialiased=False)
            return (jnp.sum(p.means2d) + jnp.sum(p.conics) + jnp.sum(p.depths)
                    + jnp.sum(p.compensations))
        return jax.grad(lo, argnums=(0, 1, 2))(means, quats, scales)

    t("projection_fwd_bwd", proj_grad_op, (params.means, params.quats, scales))

    proj = proj_op(params.means, params.quats, scales)
    radii = jnp.where(params.alive, proj.radii[0], 0)
    coeffs = jnp.concatenate(
        [params.features_dc[:, None, :], params.features_rest], axis=1)
    campos = c2w[:3, 3]

    def sh_op(coeffs, means):
        return eval_sh_colors(coeffs, means, campos,
                              jnp.asarray(3, jnp.int32), 3)

    t("sh_fwd", sh_op, (coeffs, params.means))

    def bin_op(m2d, depths):
        return bin_gaussians(m2d, radii, depths, width, height,
                             tile_size=ts, max_per_tile=k_cap,
                             with_slab_plan=True, with_id_lists=False)

    t("binning", bin_op, (proj.means2d[0], proj.depths[0]))

    # --- binning internals (what of the ~19 ms is sort vs slab plan?) ---
    def bin_op_noslab(m2d, depths):
        return bin_gaussians(m2d, radii, depths, width, height,
                             tile_size=ts, max_per_tile=k_cap,
                             with_slab_plan=False, with_id_lists=False)

    t("binning_noslab", bin_op_noslab, (proj.means2d[0], proj.depths[0]))

    tpg_small, tpg = 8, 64
    n_over = max(1024, capacity // 16)
    total_pairs = capacity * tpg_small + n_over * (tpg - tpg_small)
    skeys = jnp.asarray(
        rng.integers(0, 2**31, total_pairs).astype(np.uint32))
    t("sort_pairs_u32", lambda k: jax.lax.sort(k, is_stable=False), (skeys,))
    payload = jnp.arange(total_pairs, dtype=jnp.int32)
    t("sort_pairs_kv",
      lambda k, v: jax.lax.sort((k, v), num_keys=1, is_stable=False),
      (skeys, payload))
    dvals = jnp.asarray(rng.uniform(0, 1, capacity).astype(np.float32))
    t("argsort_capacity", jnp.argsort, (dvals,))

    binning = bin_op(proj.means2d[0], proj.depths[0])
    rgb_g = sh_op(coeffs, params.means)
    opac = jax.nn.sigmoid(params.opacities) * proj.compensations[0]
    channels = jnp.concatenate([rgb_g, proj.depths[0][:, None]], axis=-1)
    packed = jnp.concatenate(
        [proj.means2d[0], proj.conics[0], channels, opac[:, None]], axis=-1)

    def gather_op(packed):
        return tile_gather_ranked(packed, binning.order, binning.inv_order,
                                  binning.tile_ranks, binning.slab_perm,
                                  binning.slab_bounds)

    t("gather_fwd", gather_op, (packed,))

    def gather_grad_op(packed):
        def lo(p):
            return jnp.sum(gather_op(p))
        return jax.grad(lo)(packed)

    t("gather_fwd_bwd", gather_grad_op, (packed,))

    g = gather_op(packed)
    d = channels.shape[-1]
    g_means, g_conics = g[:, 0:2], g[:, 2:5]
    g_colors, g_opac = g[:, 5:5 + d], g[:, 5 + d:6 + d]

    def comp_op(gm, gc, gcol, gop):
        return composite_tiles_chunked(gm, gc, gcol, gop,
                                       binning.num_tiles_x, ts, None, False)

    t("composite_fwd", comp_op, (g_means, g_conics, g_colors, g_opac))

    def comp_grad_op(gm, gc, gcol, gop):
        def lo(*a):
            o, acc = comp_op(*a)
            return jnp.sum(o) + jnp.sum(acc)
        return jax.grad(lo, argnums=(0, 1, 2, 3))(gm, gc, gcol, gop)

    t("composite_fwd_bwd", comp_grad_op, (g_means, g_conics, g_colors, g_opac))

    # --- image assembly (tile-major -> image-major transpose) ---
    out_t, acc_t = comp_op(g_means, g_conics, g_colors, g_opac)
    nty = -(-height // ts)
    ntx = binning.num_tiles_x

    def assemble_op(out, acc):
        img = out.reshape(nty, ntx, d, ts, ts)
        img = img.transpose(0, 3, 1, 4, 2).reshape(nty * ts, ntx * ts, d)
        a = acc.reshape(nty, ntx, ts, ts).transpose(0, 2, 1, 3).reshape(
            nty * ts, ntx * ts)
        return img[:height, :width], a[:height, :width]

    t("assembly_fwd", assemble_op, (out_t, acc_t))

    def assemble_grad_op(out, acc):
        def lo(o, a):
            i, aa = assemble_op(o, a)
            return jnp.sum(i) + jnp.sum(aa)
        return jax.grad(lo, argnums=(0, 1))(out, acc)

    t("assembly_fwd_bwd", assemble_grad_op, (out_t, acc_t))

    # --- SSIM ---
    pred = jnp.asarray(rng.uniform(0, 1, (height, width, 3)).astype(np.float32))

    def ssim_grad_op(pred):
        return jax.grad(lambda p: 1.0 - ssim(p, gt_rgb))(pred)

    t("ssim_fwd_bwd", ssim_grad_op, (pred,))

    # --- full render fwd (eval path) ---
    def render_op(p_means):
        p = params.replace(means=p_means)
        out = render(p, c2w, K, width, height, cfg,
                     step=jnp.asarray(1000, jnp.int32), train=False)
        return out.rgb

    t("render_fwd_eval", render_op, (params.means,))

    # --- Adam ---
    state = init_train_state(params, optims, num_cameras=4)
    gd = {k2: jnp.ones_like(v) * 1e-6
          for k2, v in params.trainable_dict().items()}

    def adam_op(gd, opt_state):
        return optims.update(gd, opt_state, params.trainable_dict())

    t("adam", adam_op, (gd, state.opt_state))

    print(json.dumps(times))


if __name__ == "__main__":
    main()
