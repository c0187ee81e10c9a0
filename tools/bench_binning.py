"""Sub-stage device-time breakdown of ops.tiles.bin_gaussians.

Times each internal stage of the binning pipeline at the canonical bench
workload (1296x840, 80k alive / 131k capacity, K=256) so optimization
effort lands on the actual hot sub-stage (VERDICT r3 #3: binning is 40%
of the step). Prints one JSON dict.
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
    from qed_splatter_tpu.ops.tiles import bin_gaussians
    from qed_splatter_tpu.testing import orbit_c2w_opengl
    from qed_splatter_tpu.utils.microbench import device_time_per_call

    width, height = 1296, 840
    capacity, n_alive = 131_072, 80_000
    ts = 16
    k_cap = 256
    if len(sys.argv) > 1:
        width, height = 160, 112
        capacity, n_alive = 2048, 1500
        k_cap = 128

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.2, 1.2, (n_alive, 3)).astype(np.float32)
    pts[:, 2] = pts[:, 2] * 0.7 + 3.0
    rgb = (rng.uniform(0, 1, (n_alive, 3)) * 255).astype(np.uint8)
    params = init_from_points(pts, rgb, capacity=capacity)
    cfg = ModelConfig(max_per_tile=k_cap)
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
    means2d, depths = proj.means2d[0], proj.depths[0]

    n = capacity
    tpg, tpg_small = 64, 8
    overflow_slots = max(1024, n // 16)
    n_big = overflow_slots
    tpg_big = tpg - tpg_small
    num_tiles_x = -(-width // ts)
    num_tiles_y = -(-height // ts)
    num_tiles = num_tiles_x * num_tiles_y
    idx_bits = max((n - 1).bit_length(), 1)
    rank_bits = idx_bits
    max_per_tile = k_cap

    times = {}

    def t(name, op, args, n_calls=20):
        times[name] = round(device_time_per_call(op, args, n=n_calls) * 1e3, 3)
        print(name, times[name], "ms", flush=True)

    # stage 1: depth order (quantized u32 sort)
    def depth_order(depths, radii):
        culled = radii <= 0
        dq_bits = 32 - idx_bits
        valid = ~culled
        finite_d = jnp.where(valid, depths, jnp.nan)
        lo = jnp.log(jnp.maximum(jnp.nanmin(finite_d), 1e-6))
        hi = jnp.log(jnp.maximum(jnp.nanmax(finite_d), 1e-6))
        levels = (1 << dq_bits) - 2
        tt = (jnp.log(jnp.maximum(depths, 1e-6)) - lo) / jnp.maximum(
            hi - lo, 1e-9)
        q = jnp.clip((tt * levels).astype(jnp.int32), 0, levels - 1)
        q = jnp.where(valid, q, levels + 1).astype(jnp.uint32)
        packed_key = (q << idx_bits) | jnp.arange(n, dtype=jnp.uint32)
        return (jax.lax.sort(packed_key, dimension=0, is_stable=False)
                & ((jnp.uint32(1) << idx_bits) - 1)).astype(jnp.int32)

    t("depth_order", depth_order, (depths, radii))
    order = depth_order(depths, radii)

    # stage 2: packed row gather + bbox
    def bbox(order):
        packed_cols = jnp.concatenate(
            [means2d, radii[:, None].astype(means2d.dtype)], axis=-1)[order]
        mx, my, r = packed_cols[:, 0], packed_cols[:, 1], packed_cols[:, 2]
        alive = r > 0
        x0 = jnp.clip(jnp.floor((mx - r) / ts), 0, num_tiles_x - 1).astype(jnp.int32)
        x1 = jnp.clip(jnp.floor((mx + r) / ts), 0, num_tiles_x - 1).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor((my - r) / ts), 0, num_tiles_y - 1).astype(jnp.int32)
        y1 = jnp.clip(jnp.floor((my + r) / ts), 0, num_tiles_y - 1).astype(jnp.int32)
        bw = jnp.where(alive, x1 - x0 + 1, 0)
        area = bw * jnp.where(alive, y1 - y0 + 1, 0)
        return mx, my, r, x0, y0, bw, area

    t("bbox_gather", bbox, (order,))
    mx, my, r, x0, y0, bw, area = bbox(order)

    def expand(rows, j0, tpg_rows):
        j = j0 + jnp.arange(tpg_rows, dtype=jnp.int32)[:, None]
        mxr, myr, rr = mx[rows][None], my[rows][None], r[rows][None]
        bw_safe = jnp.maximum(bw[rows], 1)[None]
        tx = x0[rows][None] + j % bw_safe
        ty = y0[rows][None] + j // bw_safe
        pair_valid = j < area[rows][None]
        cx = jnp.clip(mxr, tx.astype(means2d.dtype) * ts,
                      (tx + 1).astype(means2d.dtype) * ts)
        cy = jnp.clip(myr, ty.astype(means2d.dtype) * ts,
                      (ty + 1).astype(means2d.dtype) * ts)
        dx = mxr - cx
        dy = myr - cy
        pair_valid &= (dx * dx + dy * dy) <= rr * rr
        return jnp.where(pair_valid, ty * num_tiles_x + tx,
                         num_tiles).astype(jnp.int32)

    all_rows = jnp.arange(n, dtype=jnp.int32)

    # stage 3: pair expansion (small + big) and key packing
    def make_keys(_):
        keys_small = expand(all_rows, 0, tpg_small)
        big = area > tpg_small
        pos = jnp.cumsum(big.astype(jnp.int32)) - 1
        runmax = jax.lax.cummax(jnp.where(big, pos, -1))
        big_sel = jnp.searchsorted(
            runmax, jnp.arange(n_big, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        n_bigs_total = jnp.where(n > 0, pos[-1] + 1, 0)
        sel_valid = jnp.arange(n_big, dtype=jnp.int32) < n_bigs_total
        big_sel = jnp.minimum(big_sel, n - 1)
        keys_big = expand(big_sel, tpg_small, tpg_big)
        keys_big = jnp.where(sel_valid[None, :], keys_big, num_tiles)
        keys = jnp.concatenate([keys_small.reshape(-1), keys_big.reshape(-1)])
        rank_rows = jnp.concatenate([
            jnp.broadcast_to(all_rows[None], (tpg_small, n)).reshape(-1),
            jnp.broadcast_to(big_sel[None], (tpg_big, n_big)).reshape(-1),
        ])
        packed = ((keys.astype(jnp.uint32) << rank_bits)
                  | rank_rows.astype(jnp.uint32))
        return packed

    t("expand_pack", make_keys, (jnp.zeros(()),))
    packed = make_keys(jnp.zeros(()))

    # stage 4: the main pair sort
    t("pair_sort", lambda p: jax.lax.sort(p, dimension=0, is_stable=False),
      (packed,))
    packed_sorted = jax.lax.sort(packed, dimension=0, is_stable=False)

    # stage 5: boundaries searchsorted
    def bounds_op(ps):
        return jnp.searchsorted(
            ps, jnp.arange(num_tiles + 1, dtype=jnp.uint32) << rank_bits,
            side="left").astype(jnp.int32)

    t("boundaries", bounds_op, (packed_sorted,))
    boundaries = bounds_op(packed_sorted)

    # stage 6: slab gather + rank mask
    def slab_op(ps, boundaries):
        counts = boundaries[1:] - boundaries[:-1]
        k_idx = jnp.arange(max_per_tile, dtype=jnp.int32)[None, :]
        padded = jnp.concatenate(
            [ps, jnp.full((max_per_tile,), jnp.iinfo(jnp.uint32).max,
                          jnp.uint32)])
        slabs = jax.lax.gather(
            padded, boundaries[:-1, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(),
                start_index_map=(0,)),
            slice_sizes=(max_per_tile,),
            mode=jax.lax.GatherScatterMode.CLIP)
        in_range = k_idx < jnp.minimum(counts[:, None], max_per_tile)
        ranks = jnp.where(
            in_range, (slabs & ((1 << rank_bits) - 1)).astype(jnp.int32), -1)
        return ranks

    t("slab_gather", slab_op, (packed_sorted, boundaries))
    ranks = slab_op(packed_sorted, boundaries)

    # stage 6b: the PRODUCTION slab formulation (Pallas
    # slab_gather_unaligned when K % 128 == 0 on TPU) — benching only the
    # XLA fallback misdirected round-4 optimization (ADVICE r4 low #4)
    if max_per_tile % 128 == 0:
        from qed_splatter_tpu.ops.tiles import slab_gather_unaligned

        def slab_pallas_op(ps, boundaries):
            return slab_gather_unaligned(
                ps, boundaries[:-1], max_per_tile, fill=-1)

        t("slab_gather_pallas", slab_pallas_op, (packed_sorted, boundaries))

    # stage 7: slab plan (marker merge sort + marker extraction)
    def plan_op(ranks):
        flat = ranks.reshape(-1)
        m_slots = flat.shape[0]
        slot_key = 2 * jnp.where(flat >= 0, flat, n).astype(jnp.int32) + 1
        marker_key = 2 * jnp.arange(n + 1, dtype=jnp.int32)
        payload = jnp.concatenate([
            jnp.arange(m_slots, dtype=jnp.int32),
            jnp.full((n + 1,), m_slots, jnp.int32)])
        merged_keys, slab_perm = jax.lax.sort(
            (jnp.concatenate([slot_key, marker_key]), payload),
            dimension=0, is_stable=False, num_keys=1)
        pos_if_marker = jnp.where(
            (merged_keys & 1) == 0,
            jnp.arange(merged_keys.shape[0], dtype=jnp.int32),
            jnp.iinfo(jnp.int32).max)
        slab_bounds = jax.lax.sort(pos_if_marker)[:n + 1]
        return slab_perm, slab_bounds

    t("slab_plan", plan_op, (ranks,))

    # stage 8: inv_order
    t("inv_order_argsort", lambda o: jnp.argsort(o).astype(jnp.int32),
      (order,))

    def inv_pack(o):
        p = (o.astype(jnp.uint32) << idx_bits) | jnp.arange(
            n, dtype=jnp.uint32)
        return (jax.lax.sort(p, dimension=0, is_stable=False)
                & ((jnp.uint32(1) << idx_bits) - 1)).astype(jnp.int32)

    t("inv_order_packsort", inv_pack, (order,))

    # whole thing for reference
    def bin_op(m2d, depths):
        return bin_gaussians(m2d, radii, depths, width, height,
                             tile_size=ts, max_per_tile=k_cap,
                             with_slab_plan=True, with_id_lists=False)

    t("binning_total", bin_op, (means2d, depths))

    print(json.dumps(times))


if __name__ == "__main__":
    main()
