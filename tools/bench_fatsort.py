"""Measure variadic-sort payload scaling for the round-5 binning redesign.

The candidate design sorts pair keys WITH the 11 gaussian attribute
channels (+1 origin index) as payloads, replacing the separate param row
gather (7.5 ms) and both grouping-plan sorts (~5 ms). Viability = cost of
a 1.5M-element sort with 12 payload columns.
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

    def t(name, op, args, n=10):
        times[name] = round(device_time_per_call(op, args, n=n) * 1e3, 3)
        print(name, times[name], "ms", flush=True)

    m = 1_572_864
    keys = jnp.asarray(rng.integers(0, 2**31, m).astype(np.uint32))
    cols = [jnp.asarray(rng.uniform(0, 1, m).astype(np.float32))
            for _ in range(12)]

    for ncols in (2, 4, 8, 12):
        ops = tuple([keys] + cols[:ncols])

        def op(*a):
            return jax.lax.sort(a, num_keys=1, is_stable=False)

        t(f"sort_1p5M_{ncols}payloads", op, ops)

    # same but unsort-shaped: key = i32 origin (a permutation), 11 payloads
    origin = jnp.asarray(rng.permutation(m).astype(np.int32))
    ops = tuple([origin] + cols[:11])

    def op2(*a):
        return jax.lax.sort(a, num_keys=1, is_stable=False)

    t("unsort_1p5M_11payloads", op2, ops)

    # 2-D batched fat sort (would need band partitioning, but bounds the win)
    for rows in (32,):
        ops = tuple([a.reshape(rows, -1) for a in [keys] + cols[:12]])

        def op3(*a):
            return jax.lax.sort(a, dimension=1, num_keys=1, is_stable=False)

        t(f"sort2d_{rows}x_12payloads", op3, ops)

    # key-only + payload packed as 3 interleaved u32-pair... (not applicable)
    # smaller pair count: tpg_small=6
    m2 = 131_072 * 6 + 8192 * 58
    ops = tuple([keys[:m2]] + [c[:m2] for c in cols[:12]])
    t("sort_1p0M_12payloads",
      lambda *a: jax.lax.sort(a, num_keys=1, is_stable=False), ops)

    print(json.dumps(times))


if __name__ == "__main__":
    main()
