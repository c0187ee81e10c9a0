"""Chunked brute-force k-nearest-neighbors in XLA.

Replaces the two KNN consumers of the reference stack:
- splatfacto's scale init "mean distance to 3 nearest neighbors"
  (SURVEY D8; nerfstudio uses a torch cdist / sklearn path);
- ``PDMetrics`` accuracy/completeness via scipy cKDTree
  (reference metrics.py:35-63) — for those, see metrics.py which calls
  :func:`nn_distances` between two clouds.

Brute force is the right call on TPU: distance matrices are big batched
matmuls (||a-b||^2 = |a|^2 + |b|^2 - 2 a.b) that land on the MXU, and
chunking bounds memory at [chunk, M].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _knn_chunk(q, refs, ref_sq, k, exclude_self):
    # q: [Q, 3]; refs: [M, 3]
    d2 = (
        jnp.sum(q * q, axis=-1, keepdims=True)
        - 2.0 * jnp.matmul(q, refs.T,
                           precision=jax.lax.Precision.HIGHEST)
        + ref_sq[None, :]
    )
    d2 = jnp.maximum(d2, 0.0)
    if exclude_self:
        # Self-distance is ~0; mask exact zeros to +inf (works for distinct
        # points; duplicated points fall back to their duplicate, which is
        # the same behavior as the reference's knn on duplicated clouds).
        d2 = jnp.where(d2 <= 1e-12, jnp.inf, d2)
    neg_d2, idx = jax.lax.top_k(-d2, k)
    return jnp.sqrt(jnp.where(jnp.isinf(neg_d2), jnp.inf, -neg_d2)), idx


def knn(
    queries: jnp.ndarray,   # [Q, 3]
    refs: jnp.ndarray,      # [M, 3]
    k: int,
    exclude_self: bool = False,
    chunk: int = 4096,
):
    """Return (distances [Q, k], indices [Q, k]) of k nearest refs per query."""
    q = queries.astype(jnp.float32)
    r = refs.astype(jnp.float32)
    nq = q.shape[0]
    ref_sq = jnp.sum(r * r, axis=-1)

    chunk = min(chunk, max(nq, 1))
    num_chunks = -(-nq // chunk)
    pad = num_chunks * chunk - nq
    qp = jnp.pad(q, ((0, pad), (0, 0)))
    fn = functools.partial(
        _knn_chunk, refs=r, ref_sq=ref_sq, k=k, exclude_self=exclude_self
    )
    d, i = jax.lax.map(fn, qp.reshape(num_chunks, chunk, 3))
    return d.reshape(-1, k)[:nq], i.reshape(-1, k)[:nq]


def nn_distances(queries: jnp.ndarray, refs: jnp.ndarray, chunk: int = 4096):
    """Distance from each query to its nearest ref ([Q]) — PDMetrics primitive."""
    d, _ = knn(queries, refs, k=1, chunk=chunk)
    return d[:, 0]


def mean_knn_distance(points: jnp.ndarray, k: int = 3, chunk: int = 4096):
    """Mean distance to the k nearest *other* points ([N]).

    Splatfacto's scale initializer (SURVEY D8): scales = log(mean 3-NN dist).
    """
    k = min(k, max(points.shape[0] - 1, 1))  # tiny clouds
    d, _ = knn(points, points, k=k, exclude_self=True, chunk=chunk)
    d = jnp.where(jnp.isfinite(d), d, 0.0)
    return jnp.mean(d, axis=-1)
