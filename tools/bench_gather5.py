"""Round-5 gather shoot-out #3: narrow-dtype gathers + exact u16 bitcast.

bench_gather4: the row gather is per-index bound (1 channel costs the same
33 ms as 10), but a bf16 gather runs 2.6x faster — the per-index cost
scales with ELEMENT WIDTH. An f32 row can be carried EXACTLY as two u16
halves (bitcast hi/lo), gathered at 2-byte speed, and reconstructed with
shifts — if u16/i8 gathers follow the bf16 rate this makes every hot
gather ~2.5x cheaper with zero precision loss.
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
    idx = jnp.asarray(rng.integers(0, n_tab, m_idx).astype(np.int32))

    def split_u16(x):
        u = jax.lax.bitcast_convert_type(x, jnp.uint32)
        hi = (u >> 16).astype(jnp.uint16)
        lo = (u & 0xFFFF).astype(jnp.uint16)
        return jnp.concatenate([hi, lo], axis=-1)   # [N, 2C] u16

    def join_u16(h):
        c2 = h.shape[-1] // 2
        hi = h[..., :c2].astype(jnp.uint32) << 16
        lo = h[..., c2:].astype(jnp.uint32)
        return jax.lax.bitcast_convert_type(hi | lo, jnp.float32)

    tab_u16 = jax.jit(split_u16)(tab)
    tab_i8 = jax.lax.bitcast_convert_type(
        tab[:, :, None], jnp.int8).reshape(n_tab, 4 * c)
    tab_bf20 = jnp.concatenate(
        [tab.astype(jnp.bfloat16)] * 2, axis=-1)

    t("u16_20c", lambda i: jnp.sum(tab_u16[i].astype(jnp.float32)), (idx,))
    t("u16_roundtrip", lambda i: jnp.sum(join_u16(tab_u16[i])), (idx,))
    t("bf16_20c",
      lambda i: jnp.sum(tab_bf20[i].astype(jnp.float32)), (idx,))
    t("i8_40c", lambda i: jnp.sum(tab_i8[i].astype(jnp.float32)), (idx,))

    def i8_roundtrip(i):
        g = tab_i8[i]
        return jnp.sum(jax.lax.bitcast_convert_type(
            g.reshape(m_idx, c, 4), jnp.float32))

    t("i8_roundtrip", i8_roundtrip, (idx,))

    # canonical-size twin (1.1M indices, 131k table)
    n2, m2 = 131_072, 1_099_008
    tab2 = jnp.asarray(rng.uniform(0, 1, (n2, c)).astype(np.float32))
    idx2 = jnp.asarray(rng.integers(0, n2, m2).astype(np.int32))
    tab2_u16 = jax.jit(split_u16)(tab2)
    t("canon_f32", lambda i: jnp.sum(tab2[i]), (idx2,))
    t("canon_u16_roundtrip", lambda i: jnp.sum(join_u16(tab2_u16[i])),
      (idx2,))

    # VJP shape: permutation gather of 4.7M rows incl. split+join overhead
    mp = 4_723_713
    rows = jnp.asarray(rng.uniform(0, 1, (m_idx + 1, c)).astype(np.float32))
    perm = jnp.asarray(rng.integers(0, m_idx + 1, mp).astype(np.int32))
    t("vjp_f32", lambda p: jnp.sum(rows[p]), (perm,))
    t("vjp_u16_full",
      lambda p: jnp.sum(join_u16(split_u16(rows)[p])), (perm,))

    print(json.dumps(times))


if __name__ == "__main__":
    main()
