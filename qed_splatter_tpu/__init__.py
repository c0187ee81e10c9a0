"""QED-Splatter-TPU: a TPU-native differentiable Gaussian-splatting framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
leggedrobotics/qed-splatter (depth-supervised Gaussian splatting on top of
nerfstudio + gsplat), built TPU-first:

- fixed-capacity gaussian state as a pytree (jit-stable densify/cull),
- batched XLA projection + spherical harmonics,
- tile-based rasterization (vectorized XLA oracle + Pallas kernels),
- optax per-parameter-group optimizers,
- `jax.sharding`-based data/gaussian parallelism over device meshes.

Reference behavior contracts are cited as /root/reference/<file>:<line> in
docstrings throughout the package.
"""

__version__ = "0.1.0"

# Convenience surface (heavier subsystems import lazily from their modules)
from qed_splatter_tpu.configs import (  # noqa: F401,E402
    DataConfig,
    ModelConfig,
    TrainerConfig,
    default_optimizers,
)
