"""Round-5 dense-gather layout experiments.

The dense-step profile (outputs/profile_dense_r5.txt) shows the two big
row gathers running on column-major ({0,1}) layouts at 5-14 GB/s:
the VJP perm gather (segment.py permuted_segment_sum) at 78 ms and the
forward slab gather at 27 ms — 105 ms of a 202 ms step. Pallas custom
calls carry operand_layout_constraints (row-major), so inserting an
identity Pallas copy before/after a gather forces XLA's layout
assignment. This measures which placement actually fixes the gather.
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

    times = {}

    def t(name, op, args, n=15):
        times[name] = round(device_time_per_call(op, args, n=n) * 1e3, 3)
        print(name, times[name], "ms", flush=True)

    rng = np.random.default_rng(0)

    def pallas_copy(x, block=2048):
        """Identity copy via a Pallas kernel — constrains both operand and
        result to row-major, breaking XLA's column-major gather fusions."""
        m, c = x.shape
        pad = (-m) % block
        xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x

        def kern(i_ref, o_ref):
            o_ref[...] = i_ref[...]

        out = pl.pallas_call(
            kern,
            grid=((m + pad) // block,),
            in_specs=[pl.BlockSpec((block, c), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((block, c), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m + pad, c), x.dtype),
        )(xp)
        return out[:m]

    # dense-step shapes: table 327k x 10, 4.4M gather rows
    n_tab, m_idx, c = 327_680, 4_396_032, 10
    tab = jnp.asarray(rng.uniform(0, 1, (n_tab, c)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n_tab, m_idx).astype(np.int32))
    big = jnp.asarray(
        rng.uniform(0, 1, (m_idx, c)).astype(np.float32))
    perm = jnp.asarray(rng.permutation(m_idx).astype(np.int32))

    # consumer that mimics the reduction (prefix-sum style sum)
    def consume(rows):
        return jnp.sum(rows, axis=0)

    t("gather_plain", lambda i: consume(tab[i]), (idx,))
    t("gather_pallas_out", lambda i: consume(pallas_copy(tab[i])), (idx,))
    t("gather_pallas_in", lambda i: consume(pallas_copy(tab)[i]), (idx,))
    t("gather_pallas_both",
      lambda i: consume(pallas_copy(pallas_copy(tab)[i])), (idx,))

    # perm-gather of a big row array (the VJP shape)
    t("perm_plain", lambda p: consume(big[p]), (perm,))
    t("perm_pallas_in", lambda p: consume(pallas_copy(big)[p]), (perm,))
    t("perm_pallas_both",
      lambda p: consume(pallas_copy(pallas_copy(big)[p])), (perm,))

    # sorted indices: locality upper bound
    idx_sorted = jnp.sort(idx)
    t("gather_sorted_plain", lambda i: consume(tab[i]), (idx_sorted,))
    t("gather_sorted_pallas_both",
      lambda i: consume(pallas_copy(pallas_copy(tab)[i])), (idx_sorted,))

    print(json.dumps(times))


if __name__ == "__main__":
    main()
