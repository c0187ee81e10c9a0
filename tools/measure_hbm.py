"""Measure the usable device memory of device 0 empirically.

Some backends (the tunneled 'axon' TPU platform) expose no
``memory_stats``, leaving the trainer's growth memory gate without a
limit. This tool allocates device buffers in fixed increments until
allocation fails, prints the usable total, and the QED_HBM_BYTES value
to export for training runs on this device.

Run ONLY on an idle chip. Two outcomes are informative:
- allocation raises cleanly (RESOURCE_EXHAUSTED): OOM is recoverable on
  this backend and the printed total is the usable HBM;
- the worker process dies at some total: over-allocation on this backend
  is fatal (the failure mode that killed two training runs at capacity
  growth), and the last successful total bounds the usable HBM.
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

    dev = jax.local_devices()[0]
    print(f"device: {dev} kind={getattr(dev, 'device_kind', '?')} "
          f"memory_stats={dev.memory_stats() if hasattr(dev, 'memory_stats') else None}",
          flush=True)
    chunk = ns.chunk_mb * (1 << 20)
    held = []
    total = 0
    try:
        while total < ns.max_gb * 1e9:
            a = jax.device_put(
                jnp.zeros((chunk // 4,), jnp.float32), dev
            )
            a.block_until_ready()
            held.append(a)
            total += chunk
            print(f"allocated {total / 1e9:.1f} GB", flush=True)
    except Exception as e:
        print(f"allocation failed at +{chunk / 1e9:.1f} GB: "
              f"{type(e).__name__}: {str(e)[:300]}", flush=True)
    finally:
        held.clear()
    print(f"USABLE_BYTES {total}")
    print(f"export QED_HBM_BYTES={total}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
