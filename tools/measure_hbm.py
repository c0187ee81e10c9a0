"""Measure the usable device memory of device 0 empirically.

Some backends (the tunneled 'axon' TPU platform) expose no
``memory_stats``, leaving the trainer's growth memory gate without a
limit. This tool allocates device buffers in fixed increments until
allocation fails, prints the usable total, and the QED_HBM_BYTES value
to export for training runs on this device.

Round-3 lesson (VERDICT r3 weak #1): the first version allocated
``jnp.zeros`` chunks and measured **64.42 GB "usable" on a 16 GB v5e** —
through a tunneled backend, zero-filled buffers evidently do not commit
real HBM (dedup / compression / lazy materialization), so the growth gate
ran every decision against ~4x fiction. This version therefore:

- fills each chunk with **incompressible device-side random bits**
  (unique PRNG key per chunk — no two buffers can dedupe);
- **verifies readback** of a slice of every chunk against a recomputed
  host value, so a buffer that was never truly materialized fails loudly;
- re-verifies the FIRST chunk at the end (a backend silently evicting
  early buffers to fit later ones would show here).

Run ONLY on an idle chip (the chip lock enforces it). Two outcomes are
informative:
- allocation raises cleanly (RESOURCE_EXHAUSTED): OOM is recoverable on
  this backend and the printed total is the usable HBM;
- the worker process dies at some total: over-allocation on this backend
  is fatal (the failure mode that killed two round-3 training runs at
  capacity growth), and the last successful total bounds the usable HBM.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk-mb", type=int, default=512)
    ap.add_argument("--max-gb", type=float, default=64.0)
    ns = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from qed_splatter_tpu.utils.chiplock import acquire_chip_lock

    acquire_chip_lock("tools.measure_hbm")

    dev = jax.local_devices()[0]
    print(f"device: {dev} kind={getattr(dev, 'device_kind', '?')} "
          f"memory_stats={dev.memory_stats() if hasattr(dev, 'memory_stats') else None}",
          flush=True)
    n_elems = ns.chunk_mb * (1 << 20) // 4
    chunk = n_elems * 4

    @jax.jit
    def fill(key):
        # uniform f32 bits: incompressible, unique per key
        return jax.random.uniform(key, (n_elems,), jnp.float32)

    def probe(i, buf):
        """Readback check: 8 elements at a deterministic offset must be
        finite, in range, and non-constant — a lazily-faked buffer fails."""
        off = (i * 997) % (n_elems - 8)
        vals = np.asarray(buf[off:off + 8])
        assert np.isfinite(vals).all() and (0 <= vals).all() and (
            vals <= 1
        ).all(), vals
        assert np.unique(vals).size > 1, f"chunk {i}: constant readback"
        return vals

    held = []
    first_probe = None
    total = 0
    try:
        i = 0
        while total < ns.max_gb * 1e9:
            a = jax.device_put(fill(jax.random.PRNGKey(i)), dev)
            probe(i, a)  # force + verify real materialization
            held.append(a)
            total += chunk
            if i == 0:
                first_probe = probe(0, held[0]).copy()
            print(f"allocated {total / 1e9:.1f} GB (verified readback)",
                  flush=True)
            i += 1
    except Exception as e:
        print(f"allocation failed at +{chunk / 1e9:.1f} GB: "
              f"{type(e).__name__}: {str(e)[:300]}", flush=True)
    # the first chunk must still hold its original bits (no silent
    # eviction/recompute of early buffers to make room for later ones).
    # Drop the newest chunk first: at a just-OOM'd device even the probe's
    # 8-element slice output has nowhere to live.
    if held and first_probe is not None:
        # Best-effort: the per-chunk readback above already proves every
        # chunk materialized; this re-verify additionally rules out silent
        # eviction of EARLY buffers. Measured round-4: a just-OOM'd
        # tunneled device refuses even an 8-element slice and freeing
        # multiple GB does not promptly reclaim space, so treat a
        # persistent OOM here as inconclusive, not a failure.
        final = None
        for _ in range(8):
            if len(held) > 1:
                held.pop()
            try:
                final = probe(0, held[0])
                break
            except Exception:
                continue
        if final is None:
            print("first-chunk re-verify INCONCLUSIVE (post-OOM device "
                  "refuses every readback; per-chunk verification above "
                  "still stands)", flush=True)
        else:
            assert np.array_equal(final, first_probe), (
                "first chunk changed contents - early buffers were "
                "evicted; the measured total overcounts"
            )
            print("first-chunk re-verify OK", flush=True)
    held.clear()
    print(f"USABLE_BYTES {total}")
    print(f"export QED_HBM_BYTES={total}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
