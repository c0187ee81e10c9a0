"""Gather-formulation shoot-out for the binning/slab hot path.

XLA's TPU gather lowering dominates the binning + tile-gather stages
(bbox row gather 2.5 ms, slab slice gather 4.8 ms, param row gather
~7 ms at the canonical workload). This times alternative formulations to
pick replacements. Prints one JSON dict.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import functools
import json

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from qed_splatter_tpu.utils.microbench import device_time_per_call

    n = 131_072          # capacity
    t_tiles = 4293       # 81 x 53 tiles at 1296x840
    k_cap = 256
    m_pairs = 1_507_328  # 131072*8 + 8192*56
    c = 11

    rng = np.random.default_rng(0)
    times = {}

    def t(name, op, args, n_calls=20):
        times[name] = round(device_time_per_call(op, args, n=n_calls) * 1e3, 3)
        print(name, times[name], "ms", flush=True)

    params = jnp.asarray(rng.uniform(-1, 1, (n, c)).astype(np.float32))
    params16 = jnp.asarray(
        rng.uniform(-1, 1, (n, 16)).astype(np.float32))
    idx_big = jnp.asarray(
        rng.integers(0, n, t_tiles * k_cap).astype(np.int32))
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))

    # --- row gathers ---
    t("row_gather_perm_c11", lambda p, i: p[i], (params, perm))
    t("row_gather_1p1M_c11", lambda p, i: p[i], (params, idx_big))
    t("row_gather_1p1M_c11_bf16", lambda p, i: p[i],
      (params.astype(jnp.bfloat16), idx_big))
    t("row_gather_1p1M_c16", lambda p, i: p[i], (params16, idx_big))
    t("row_gather_1p1M_c11_2d", lambda p, i: p[i.reshape(t_tiles, k_cap)],
      (params, idx_big))

    # gather as take with clip
    t("take_1p1M_c11",
      lambda p, i: jnp.take(p, i, axis=0, mode="clip"), (params, idx_big))

    # one 1-D gather per channel, operand [C, N], idx along lanes
    params_T = params.T.copy()

    def chan_gather(pt, i):
        return jnp.stack([pt[ch][i] for ch in range(c)], axis=0)

    t("chan_gather_1p1M", chan_gather, (params_T, idx_big))

    # --- slab slice gather (contiguous K-slices at dynamic starts) ---
    pairs = jnp.asarray(
        np.sort(rng.integers(0, 2**31, m_pairs).astype(np.uint32)))
    starts = jnp.asarray(
        np.sort(rng.integers(0, m_pairs - k_cap, t_tiles)).astype(np.int32))

    def slab_xla(ps, st):
        return jax.lax.gather(
            ps, st[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(),
                start_index_map=(0,)),
            slice_sizes=(k_cap,),
            mode=jax.lax.GatherScatterMode.CLIP)

    t("slab_xla", slab_xla, (pairs, starts))

    # slab via aligned 2-block gather + lane select
    def slab_aligned(ps, st):
        ps2 = ps.reshape(-1, 128)                      # [M/128, 128]
        blk = st // 128                                # [T]
        within = st % 128
        rows = jnp.arange(3, dtype=jnp.int32)[None, :] + blk[:, None]
        wide = ps2[rows].reshape(t_tiles, 3 * 128)     # [T, 384]
        lane = within[:, None] + jnp.arange(k_cap, dtype=jnp.int32)[None, :]
        return jnp.take_along_axis(wide, lane, axis=1)

    t("slab_aligned_take", slab_aligned, (pairs, starts))

    # slab via pallas DMA kernel: boundaries scalar-prefetched, operand in
    # HBM (ANY), per-tile sliced DMA into the output block
    tb = 8  # tiles per grid instance

    def slab_kernel(st_ref, hbm_ref, out_ref, scratch, sems):
        g = pl.program_id(0)
        for j in range(tb):
            i = g * tb + j
            dma = pltpu.make_async_copy(
                hbm_ref.at[pl.ds(st_ref[i], k_cap)],
                scratch.at[j], sems.at[j])
            dma.start()
        for j in range(tb):
            pltpu.make_async_copy(
                hbm_ref.at[pl.ds(st_ref[j], k_cap)],
                scratch.at[j], sems.at[j]).wait()
        out_ref[:] = scratch[:]

    t_pad = -(-t_tiles // tb) * tb

    @jax.jit
    def slab_pallas(ps, st):
        st_p = jnp.concatenate(
            [st, jnp.zeros((t_pad - t_tiles,), jnp.int32)])
        out = pl.pallas_call(
            slab_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(t_pad // tb,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(
                    (tb, k_cap), lambda g, *_: (g, 0),
                    memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((tb, k_cap), jnp.int32),
                    pltpu.SemaphoreType.DMA((tb,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((t_pad, k_cap), jnp.int32),
        )(st_p, ps.astype(jnp.int32))
        return out[:t_tiles]

    try:
        t("slab_pallas_dma", slab_pallas, (pairs, starts))
    except Exception as e:  # pragma: no cover
        print("slab_pallas_dma FAILED:", repr(e))
        times["slab_pallas_dma"] = -1.0

    # --- searchsorted boundaries vs two-level ---
    queries = jnp.asarray(
        (np.arange(t_tiles + 1) * (2**31 // t_tiles)).astype(np.uint32))
    t("searchsorted_4k_of_1p5M",
      lambda ps, q: jnp.searchsorted(ps, q, side="left"), (pairs, queries))

    def two_level(ps, q):
        s = ps[::128]                               # [M/128] coarse
        blk = jnp.searchsorted(s, q, side="left")   # ~14 passes over 12k
        blk = jnp.maximum(blk - 1, 0)
        base = blk * 128
        wide = ps.reshape(-1, 128)[blk]             # [Q, 128] aligned gather
        within = jnp.sum((wide < q[:, None]).astype(jnp.int32), axis=1)
        return base + within

    t("boundaries_two_level", two_level, (pairs, queries))

    # --- sort cost scaling: extra value operands ---
    keys = jnp.asarray(rng.integers(0, 2**31, m_pairs).astype(np.uint32))
    vals = [jnp.asarray(rng.uniform(0, 1, m_pairs).astype(np.float32))
            for _ in range(4)]
    t("sort_1op", lambda k: jax.lax.sort(k, is_stable=False), (keys,))
    t("sort_2op", lambda k, a: jax.lax.sort((k, a), num_keys=1,
                                            is_stable=False), (keys, vals[0]))
    t("sort_5op",
      lambda k, a, b, c2, d: jax.lax.sort((k, a, b, c2, d), num_keys=1,
                                          is_stable=False),
      (keys, *vals))

    # --- scatter-add baseline for the 1.1M->131k reduction (context) ---
    rows_g = jnp.asarray(
        rng.uniform(-1, 1, (t_tiles * k_cap, c)).astype(np.float32))

    def scatter_add(rows, i):
        return jnp.zeros((n, c), jnp.float32).at[i].add(rows, mode="drop")

    t("scatter_add_1p1M_c11", scatter_add, (rows_g, idx_big), n_calls=5)

    print(json.dumps(times))


if __name__ == "__main__":
    main()
