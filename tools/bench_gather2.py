"""Round-5 gather dissection: transpose share, direct-layout gather,
zero-row padding vs where-mask, and the locality upper bound.
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

    def t(name, op, args, n=15):
        times[name] = round(device_time_per_call(op, args, n=n) * 1e3, 3)
        print(name, times[name], "ms", flush=True)

    n_tab, T, K, c = 131_072, 4296, 256, 11
    tab = jnp.asarray(rng.uniform(0, 1, (n_tab, c)).astype(np.float32))
    tabz = jnp.concatenate([tab, jnp.zeros((1, c), jnp.float32)])
    # tile-realistic ranks: ascending within each tile row, -1 pad tail
    base = np.sort(rng.integers(0, n_tab, (T, K)).astype(np.int32), axis=1)
    npad = rng.integers(0, K, T)
    for i in range(T):
        base[i, K - npad[i]:] = -1
    ranks = jnp.asarray(base)

    def g_baseline(r):
        safe = jnp.maximum(r, 0)
        ok = (r >= 0)[:, None, :]
        return jnp.where(ok, tab[safe].transpose(0, 2, 1), 0.0)

    t("gather_baseline_where_T", g_baseline, (ranks,))

    def g_notranspose(r):
        safe = jnp.maximum(r, 0)
        return tab[safe]

    t("gather_no_transpose", g_notranspose, (ranks,))

    def g_zero_pad(r):
        safe = jnp.where(r >= 0, r, n_tab)
        return tabz[safe].transpose(0, 2, 1)

    t("gather_zeropad_T", g_zero_pad, (ranks,))

    def g_direct_tck(r):
        safe = jnp.where(r >= 0, r, n_tab)
        return jax.lax.gather(
            tabz, safe[..., None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0,),
                operand_batching_dims=(), start_indices_batching_dims=(),
            ),
            slice_sizes=(1, c),
            mode=jax.lax.GatherScatterMode.CLIP,
        )  # -> [T, C, K]? offset dim at position 1

    try:
        out = jax.jit(g_direct_tck)(ranks)
        print("direct shape", out.shape, flush=True)
        t("gather_direct_TCK", g_direct_tck, (ranks,))
    except Exception as e:
        print("direct gather failed:", e, flush=True)

    # locality bound: fully sorted flat indices
    flat_sorted = jnp.sort(jnp.maximum(ranks.reshape(-1), 0)).reshape(T, K)
    t("gather_sorted_bound", g_notranspose, (flat_sorted,))

    # bwd-shaped: 1.23M-row permutation gather (rank-grouped order)
    m = T * K + n_tab + 1
    perm = jnp.asarray(rng.permutation(m).astype(np.int32))
    rows = jnp.asarray(rng.uniform(0, 1, (m, c)).astype(np.float32))
    t("bwd_perm_rowgather", lambda p: rows[p], (perm,))

    print(json.dumps(times))


if __name__ == "__main__":
    main()
