"""Microbench of the primitives behind binning + gather (round-5 perf push).

Questions answered on-chip:
  1. How does jax.lax.sort cost scale: one long 1-D sort vs batched 2-D
     sorts of the same element count?  (batched sorts parallelize across
     sublanes; a bitonic network over M elements costs O(M log^2 M) depth)
  2. Row-gather strategies for the [T*K]-slot param gather:
     [N, 11] rows vs [N, 16]-padded rows vs two [N, 8] gathers vs
     take-along-lanes from a [C, N] table, f32 vs bf16.
  3. kv-sort with wider payloads (carry the original pair index).

Prints one JSON dict of ms/call.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import json

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from qed_splatter_tpu.utils.microbench import device_time_per_call

    rng = np.random.default_rng(0)
    times = {}

    def t(name, op, args, n=20):
        times[name] = round(device_time_per_call(op, args, n=n) * 1e3, 3)
        print(name, times[name], "ms", flush=True)

    m = 1_572_864  # ~1.5M, the canonical pair count (131k*8 + 8192*56 pad)
    keys = jnp.asarray(rng.integers(0, 2**31, m).astype(np.uint32))

    t("sort_1d_1p5M_u32", lambda k: jax.lax.sort(k, is_stable=False), (keys,))

    for rows in (8, 16, 32, 64, 128, 256):
        cols = m // rows
        k2 = keys.reshape(rows, cols)
        t(f"sort_2d_{rows}x{cols}_u32",
          lambda k: jax.lax.sort(k, dimension=1, is_stable=False), (k2,))

    # kv sort: u32 key + i32 payload
    payload = jnp.arange(m, dtype=jnp.int32)
    t("sort_kv_1d_1p5M", lambda k, v: jax.lax.sort(
        (k, v), num_keys=1, is_stable=False), (keys, payload))
    for rows in (32, 128):
        cols = m // rows
        t(f"sort_kv_2d_{rows}x{cols}", lambda k, v: jax.lax.sort(
            (k.reshape(rows, cols), v.reshape(rows, cols)),
            dimension=1, num_keys=1, is_stable=False), (keys, payload))

    # small sorts (the N-sized depth sort)
    nsm = 131_072
    ksm = keys[:nsm]
    t("sort_1d_131k_u32", lambda k: jax.lax.sort(k, is_stable=False), (ksm,))
    t("sort_2d_16x8k_u32", lambda k: jax.lax.sort(
        k.reshape(16, 8192), dimension=1, is_stable=False), (ksm,))

    # --- row gathers: 1.1M slots from a 131k-row table ---
    n_tab, slots, c = 131_072, 4296 * 256, 11
    tab11 = jnp.asarray(rng.uniform(0, 1, (n_tab, c)).astype(np.float32))
    tab16 = jnp.pad(tab11, ((0, 0), (0, 16 - c)))
    tab8a, tab8b = tab16[:, :8], tab16[:, 8:]
    idx = jnp.asarray(rng.integers(0, n_tab, slots).astype(np.int32))
    idx2d = idx.reshape(-1, 256)

    t("rowgather_11_f32", lambda i: tab11[i], (idx,))
    t("rowgather_16_f32", lambda i: tab16[i], (idx,))
    t("rowgather_8x2_f32", lambda i: (tab8a[i], tab8b[i]), (idx,))
    tab11b = tab11.astype(jnp.bfloat16)
    t("rowgather_11_bf16", lambda i: tab11b[i], (idx,))
    # lane gather: out[c, s] = tabT[c, idx[s]]
    tabT = tab11.T  # [11, N]
    t("lanegather_cxn_f32", lambda i: jnp.take(tabT, i, axis=1), (idx,))
    # one column at a time (1-D gathers)
    t("colgather_1d_f32", lambda i: tab11[:, 0][i], (idx,))
    # gather already reshaped [T, K] (as the real call site does)
    t("rowgather_11_f32_TK", lambda i: tab11[i], (idx2d,))

    # cumsum comparison for the VJP reduction
    rows_v = jnp.asarray(
        rng.uniform(0, 1, (1_105_920, c)).astype(np.float32))
    t("cumsum_rows_axis0", lambda r: jnp.cumsum(r, axis=0), (rows_v,),
      n=5)

    print(json.dumps(times))


if __name__ == "__main__":
    main()
