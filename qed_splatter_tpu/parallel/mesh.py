"""Device-mesh construction (SURVEY §2c).

Two logical axes:
- ``data`` — view/data parallelism: each slice of devices renders different
  cameras (the analog of the reference stack's single-GPU step, widened);
- ``model`` — gaussian sharding: the capacity dimension of gaussian
  parameters and their Adam state is sharded here; projected 2D splats
  (~11 floats/gaussian) are all-gathered while 3D params + optimizer state
  stay sharded, and gradient blocks reduce-scatter back (BASELINE.json
  north star: "gaussian-gradient blocks reduce-scattered").

The reference has no distributed code at all (SURVEY §2c: no
torch.distributed/NCCL anywhere); this module is TPU-native by design:
shardings + XLA collectives over ICI, `jax.distributed` for multi-host.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_data: Optional[int] = None,
    num_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if num_data is None:
        num_data = n // num_model
    if num_data * num_model > n:
        raise ValueError(
            f"mesh {num_data}x{num_model} needs more than {n} devices"
        )
    devices = devices[: num_data * num_model]
    arr = np.asarray(devices).reshape(num_data, num_model)
    return Mesh(arr, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Leading axis over 'data', rest replicated."""
    return NamedSharding(mesh, P(*(("data",) + (None,) * (ndim - 1))))


def model_sharded(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Leading (capacity) axis over 'model', rest replicated."""
    return NamedSharding(mesh, P(*(("model",) + (None,) * (ndim - 1))))


def shard_leading_capacity(tree, mesh: Mesh, capacity: int):
    """Sharding tree: leaves with leading dim == capacity go over 'model',
    everything else is replicated."""

    def spec(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == capacity:
            return NamedSharding(mesh, P(*(("model",) + (None,) * (x.ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, tree)


def init_distributed() -> None:
    """Multi-host init (no-op on a single host). DCN coordinates hosts;
    collectives ride ICI within the slice."""
    try:
        jax.distributed.initialize()
    except (ValueError, RuntimeError):
        pass  # single-process
