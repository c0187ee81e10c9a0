"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

SURVEY §4: distributed correctness is tested without a cluster via
``--xla_force_host_platform_device_count=8`` + shard_map on CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Force CPU: the ambient environment pins JAX_PLATFORMS to the tunneled TPU
# backend, which is slow (every compile is a remote round-trip) and
# non-deterministic for unit tests. Benchmarks (bench.py) run on the real
# chip instead. The env var alone is not enough — the container's
# sitecustomize registers the TPU plugin at interpreter boot — so also flip
# the config knob before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
os.environ.setdefault("JAX_ENABLE_X64", "0")
