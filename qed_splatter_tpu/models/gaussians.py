"""Fixed-capacity gaussian state as a JAX pytree.

The reference's gaussian parameters are six torch ``nn.Parameter`` groups that
*change size* at densify/cull steps (SURVEY D8; group names at reference
config.py:45-68). Dynamic sizes break XLA's static-shape compilation, so the
TPU-native design is a **capped-capacity buffer**: every field has capacity
``C`` rows plus an ``alive`` mask; densification writes into dead slots and
culling clears the mask — the jitted train step never changes shape (growth
doubles capacity host-side, a bounded number of recompiles).

Parameterizations match the reference call contract at model.py:267-288:
``scales`` are stored in log-space (exp before rasterizing, model.py:270),
``opacities`` as logits (sigmoid, model.py:271), ``quats`` unnormalized
(normalized at use, model.py:269), colors as SH with a separate dc band
(model.py:241).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from qed_splatter_tpu.ops.knn import mean_knn_distance
from qed_splatter_tpu.ops.sh import num_sh_bases

# SH degree-0 basis constant: rgb = SH_C0 * dc + 0.5  =>  dc = (rgb - 0.5)/SH_C0
SH_C0 = 0.28209479177387814


def rgb_to_sh_dc(rgb: jnp.ndarray) -> jnp.ndarray:
    """Invert the dc SH band: float RGB in [0,1] -> dc coefficient."""
    return (rgb - 0.5) / SH_C0


def sh_dc_to_rgb(dc: jnp.ndarray) -> jnp.ndarray:
    return dc * SH_C0 + 0.5


@flax.struct.dataclass
class GaussianParams:
    """Trainable gaussian parameters at fixed capacity C.

    Field names mirror the reference optimizer groups (config.py:45-68) so
    the per-group optimizer table transfers verbatim.
    """

    means: jnp.ndarray          # [C, 3] world positions
    quats: jnp.ndarray          # [C, 4] wxyz, unnormalized
    scales: jnp.ndarray         # [C, 3] log-scale
    opacities: jnp.ndarray      # [C] logit-opacity
    features_dc: jnp.ndarray    # [C, 3] SH dc band
    features_rest: jnp.ndarray  # [C, K-1, 3] higher SH bands
    alive: jnp.ndarray          # [C] bool — slot occupancy (non-trainable)

    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    @property
    def sh_degree(self) -> int:
        return int(round((self.features_rest.shape[1] + 1) ** 0.5)) - 1

    def num_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive.astype(jnp.int32))

    def trainable_dict(self) -> dict:
        """The six optimizer parameter groups (reference config.py:45-68)."""
        return {
            "means": self.means,
            "quats": self.quats,
            "scales": self.scales,
            "opacities": self.opacities,
            "features_dc": self.features_dc,
            "features_rest": self.features_rest,
        }

    def replace_trainable(self, d: dict) -> "GaussianParams":
        return self.replace(
            means=d["means"],
            quats=d["quats"],
            scales=d["scales"],
            opacities=d["opacities"],
            features_dc=d["features_dc"],
            features_rest=d["features_rest"],
        )


def _round_capacity(n: int, multiple: int = 256) -> int:
    return max(multiple, ((n + multiple - 1) // multiple) * multiple)


def random_quats(key: jax.Array, n: int) -> jnp.ndarray:
    """Uniform random unit quaternions (splatfacto's random_quat_tensor)."""
    u, v, w = jax.random.uniform(key, (3, n))
    return jnp.stack(
        [
            jnp.sqrt(1 - u) * jnp.sin(2 * jnp.pi * v),
            jnp.sqrt(1 - u) * jnp.cos(2 * jnp.pi * v),
            jnp.sqrt(u) * jnp.sin(2 * jnp.pi * w),
            jnp.sqrt(u) * jnp.cos(2 * jnp.pi * w),
        ],
        axis=-1,
    )


def init_from_points(
    points: np.ndarray,           # [N, 3] float world positions (seed PLY)
    rgb: Optional[np.ndarray],    # [N, 3] uint8 colors or None
    sh_degree: int = 3,
    capacity: Optional[int] = None,
    capacity_headroom: float = 4.0,
    seed: int = 42,
    init_opacity: float = 0.1,
) -> GaussianParams:
    """Seed-point initialization (SURVEY D8, load_3D_points=True path at
    reference config.py:36): means from points, dc SH from colors, log-scales
    from mean 3-NN distance, random quats, opacity logit(0.1)."""
    n = points.shape[0]
    if capacity is None:
        capacity = _round_capacity(int(n * capacity_headroom))
    if capacity < n:
        raise ValueError(f"capacity {capacity} < num points {n}")
    k = num_sh_bases(sh_degree)
    key = jax.random.PRNGKey(seed)

    means = jnp.zeros((capacity, 3), jnp.float32).at[:n].set(
        jnp.asarray(points, dtype=jnp.float32)
    )
    dist = mean_knn_distance(jnp.asarray(points, jnp.float32), k=3)
    dist = jnp.maximum(dist, 1e-7)
    scales = jnp.zeros((capacity, 3), jnp.float32).at[:n].set(
        jnp.log(dist)[:, None].repeat(3, axis=1)
    )
    quats = random_quats(key, capacity)
    opacities = jnp.full(
        (capacity,), float(np.log(init_opacity / (1 - init_opacity))), jnp.float32
    )
    if rgb is not None:
        col = jnp.asarray(rgb, jnp.float32) / 255.0
        dc = rgb_to_sh_dc(col)
    else:
        dc = jnp.zeros((n, 3), jnp.float32)
    features_dc = jnp.zeros((capacity, 3), jnp.float32).at[:n].set(dc)
    features_rest = jnp.zeros((capacity, k - 1, 3), jnp.float32)
    alive = jnp.zeros((capacity,), bool).at[:n].set(True)
    return GaussianParams(
        means=means,
        quats=quats,
        scales=scales,
        opacities=opacities,
        features_dc=features_dc,
        features_rest=features_rest,
        alive=alive,
    )


def init_random(
    num_points: int = 50_000,
    random_scale: float = 10.0,
    sh_degree: int = 3,
    capacity: Optional[int] = None,
    capacity_headroom: float = 4.0,
    seed: int = 42,
    init_opacity: float = 0.1,
) -> GaussianParams:
    """Random-cube initialization (SURVEY D8; ``random_scale`` knob surfaced at
    reference model.py:45 / README.md:27-28): means uniform in
    (rand - 0.5) * random_scale, random colors, 3-NN scales."""
    key = jax.random.PRNGKey(seed)
    km, kc = jax.random.split(key)
    pts = (jax.random.uniform(km, (num_points, 3)) - 0.5) * random_scale
    rgb = jax.random.uniform(kc, (num_points, 3))
    gp = init_from_points(
        np.asarray(pts),
        np.asarray(rgb * 255.0).astype(np.uint8),
        sh_degree=sh_degree,
        capacity=capacity,
        capacity_headroom=capacity_headroom,
        seed=seed,
        init_opacity=init_opacity,
    )
    return gp


def grow_capacity(params: GaussianParams, new_capacity: int) -> GaussianParams:
    """Host-side capacity growth (recompile boundary)."""
    if new_capacity <= params.capacity:
        return params

    def pad(x):
        pad_width = [(0, new_capacity - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad_width)

    return jax.tree.map(pad, params)


def compact_arrays(params: GaussianParams) -> Tuple[dict, np.ndarray]:
    """Extract alive rows as host numpy arrays (export / checkpoints / eval)."""
    alive = np.asarray(params.alive)
    idx = np.flatnonzero(alive)
    out = {
        name: np.asarray(arr)[idx]
        for name, arr in params.trainable_dict().items()
    }
    return out, idx
