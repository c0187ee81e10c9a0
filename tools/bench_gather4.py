"""Round-5 gather formulation shoot-out #2: beat the (8,128) lane padding.

bench_gather3 finding: [M, 10] f32 row gathers run at a fixed ~6.6 ns/row
regardless of index locality — consistent with the TPU's tiled HBM layout
padding every 10-lane row to 128 lanes (512 B moved per 40 B row, ~77 GB/s
of mostly-padding traffic). These variants avoid the padding.
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

    times = {}

    def t(name, op, args, n=15):
        times[name] = round(device_time_per_call(op, args, n=n) * 1e3, 3)
        print(name, times[name], "ms", flush=True)

    rng = np.random.default_rng(0)
    n_tab, m_idx, c = 327_680, 4_396_032, 10
    tab = jnp.asarray(rng.uniform(0, 1, (n_tab, c)).astype(np.float32))
    tab_t = jnp.asarray(np.asarray(tab).T.copy())          # [C, N]
    tab_cols = [jnp.asarray(np.asarray(tab)[:, i].copy()) for i in range(c)]
    idx = jnp.asarray(rng.integers(0, n_tab, m_idx).astype(np.int32))

    def consume(rows):
        return jnp.sum(rows, axis=-1) if rows.ndim == 1 else (
            jnp.sum(rows, axis=tuple(range(rows.ndim - 1))))

    # single 1-D gather (T(1024) layout: no lane padding)
    t("g1d_single", lambda i: jnp.sum(tab_cols[0][i]), (idx,))

    # 10 channels as 10 separate 1-D gathers
    def g1d_all(i):
        return sum(jnp.sum(col[i]) for col in tab_cols)

    t("g1d_x10", g1d_all, (idx,))

    # one [C, N] operand, gather along the minor (lane) dim
    def g_t(i):
        return jnp.sum(tab_t[:, i])

    t("gT_lanes", g_t, (idx,))

    # vmapped 1-D gather over the C leading axis of [C, N]
    def g_vmap(i):
        return jnp.sum(jax.vmap(lambda col: col[i])(tab_t))

    t("gT_vmap", g_vmap, (idx,))

    # bf16 rows (halved padding traffic)
    tab_bf = tab.astype(jnp.bfloat16)
    t("grow_bf16", lambda i: jnp.sum(tab_bf[i].astype(jnp.float32)), (idx,))

    # f32 rows padded to 128 lanes: does cost stay at 512 B/row?
    tab128 = jnp.pad(tab, ((0, 0), (0, 118)))
    t("grow_c128", lambda i: jnp.sum(tab128[i]), (idx,))

    # interleaved: pack C=10 into a [N*16] flat array, one 1-D gather per
    # channel at flat offsets (same T(1024) no-pad layout, strided base)
    flat16 = jnp.pad(tab, ((0, 0), (0, 6))).reshape(-1)

    def g_flat16(i):
        base = i * 16
        return sum(jnp.sum(flat16[base + j]) for j in range(c))

    t("g1d_flat16", g_flat16, (idx,))

    print(json.dumps(times))


if __name__ == "__main__":
    main()
