"""Composite chunk-size experiment at the canonical bench shape.

At K=256 the compositor runs one plain pallas call over all K for every
tile, but the per-tile intersection counts are long-tailed (most tiles
hold far fewer than K): count-gated sub-chunks of 128 could skip ~half
the [P, K] VPU alpha math. Measures fwd and fwd+bwd for chunk sizes
{256 plain, 128, 64} with real binning counts.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import json

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from qed_splatter_tpu.configs import ModelConfig
    from qed_splatter_tpu.models.gaussians import init_from_points
    from qed_splatter_tpu.ops.camera import get_viewmat
    from qed_splatter_tpu.ops.projection import project_gaussians
    from qed_splatter_tpu.ops.segment import tile_gather_ranked
    from qed_splatter_tpu.ops.sh import eval_sh_colors
    from qed_splatter_tpu.ops.tiles import bin_gaussians
    from qed_splatter_tpu.ops import rasterize_pallas as rp
    from qed_splatter_tpu.testing import orbit_c2w_opengl
    from qed_splatter_tpu.utils.microbench import device_time_per_call

    width, height = 1296, 840
    capacity, n_alive = 131_072, 80_000
    ts, k_cap = 16, 256

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.2, 1.2, (n_alive, 3)).astype(np.float32)
    pts[:, 2] = pts[:, 2] * 0.7 + 3.0
    rgb = (rng.uniform(0, 1, (n_alive, 3)) * 255).astype(np.uint8)
    params = init_from_points(pts, rgb, capacity=capacity)
    cfg = ModelConfig(camera_opt_mode="SO3xR3", max_per_tile=k_cap)
    f = 0.85 * max(width, height)
    K = jnp.asarray(np.array(
        [[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]], np.float32))
    c2w = jnp.asarray(orbit_c2w_opengl(3.0, 0.15, 0.1, (0, 0, 3.0)))
    viewmat = get_viewmat(c2w[None])
    scales = jnp.exp(params.scales)
    proj = project_gaussians(params.means, params.quats, scales, viewmat,
                             K[None], width, height)
    radii = jnp.where(params.alive, proj.radii[0], 0)
    coeffs = jnp.concatenate(
        [params.features_dc[:, None, :], params.features_rest], axis=1)
    binning = bin_gaussians(proj.means2d[0], radii, proj.depths[0],
                            width, height, tile_size=ts, max_per_tile=k_cap,
                            with_slab_plan=True, with_id_lists=False)
    counts = binning.tile_counts
    cnp = np.asarray(counts)
    print("count quantiles:",
          {q: int(np.quantile(cnp, q)) for q in (0.25, 0.5, 0.75, 0.9, 1.0)},
          "mean", float(cnp.mean()), flush=True)

    rgb_g = eval_sh_colors(coeffs, params.means, c2w[:3, 3],
                           jnp.asarray(3, jnp.int32), 3)
    opac = jax.nn.sigmoid(params.opacities) * proj.compensations[0]
    channels = jnp.concatenate([rgb_g, proj.depths[0][:, None]], axis=-1)
    packed = jnp.concatenate(
        [proj.means2d[0], proj.conics[0], channels, opac[:, None]], axis=-1)
    g = tile_gather_ranked(packed, binning.order, binning.inv_order,
                           binning.tile_ranks, binning.slab_perm,
                           binning.slab_bounds)
    d = channels.shape[-1]
    g_means, g_conics = g[:, 0:2], g[:, 2:5]
    g_colors, g_opac = g[:, 5:5 + d], g[:, 5 + d:6 + d]
    ntx = binning.num_tiles_x

    times = {}

    def t(name, op, args, n=15):
        times[name] = round(device_time_per_call(op, args, n=n) * 1e3, 3)
        print(name, times[name], "ms", flush=True)

    def chunked(gm, gc, gcol, gop, chunk):
        out = acc = None
        k = gcol.shape[-1]
        for s in range(0, k, chunk):
            e = min(s + chunk, k)
            parts = (gm[..., s:e], gc[..., s:e], gcol[..., s:e],
                     gop[..., s:e])
            if out is None:
                out, acc = rp.composite_tiles_pallas(
                    *parts, ntx, ts, None, False)
            else:
                o, a = rp.composite_tiles_pallas_skip(
                    *parts, jax.lax.stop_gradient(acc),
                    jax.lax.stop_gradient(counts), ntx, s, ts, None, False)
                trans = 1.0 - acc
                out = out + trans * o
                acc = acc + trans * a
        return out, acc

    for chunk in (256, 128, 64):
        name = f"comp_fwd_c{chunk}"
        t(name, lambda gm, gc, gcol, gop, _c=chunk: chunked(
            gm, gc, gcol, gop, _c), (g_means, g_conics, g_colors, g_opac))
        name = f"comp_fwdbwd_c{chunk}"

        def gradop(gm, gc, gcol, gop, _c=chunk):
            def lo(*a):
                o, acc2 = chunked(*a, _c)
                return jnp.sum(o) + jnp.sum(acc2)
            return jax.grad(lo, argnums=(0, 1, 2, 3))(gm, gc, gcol, gop)

        t(name, gradop, (g_means, g_conics, g_colors, g_opac))

    print(json.dumps(times))


if __name__ == "__main__":
    main()
