"""Tile intersection / binning: gaussians -> per-tile depth-ordered lists.

TPU-native replacement for gsplat's ``isect_tiles`` + radix sort +
``isect_offset_encode`` CUDA kernels (reference SURVEY D4). The CUDA design
builds variable-length per-tile lists; that is hostile to XLA's static-shape
model, so we build **fixed-capacity** per-tile lists with the same
sort-based algorithm re-expressed for XLA:

1. depth-sort the gaussians once (XLA sort);
2. expand each gaussian into its covered (tile, gaussian) pairs — bounded
   by a static ``max_tiles_per_gaussian`` (bbox cells beyond the cap are
   dropped and reported; the screen-size cull keeps real scenes far below
   it);
3. one *stable* sort of all pairs by tile id — stability preserves the
   depth order within each tile, replacing gsplat's (tile, depth) radix
   key;
4. per-tile offsets via searchsorted, then a [T, K] gather caps each tile
   at ``max_per_tile`` front-most gaussians (front-most K dominate
   compositing, so saturation degrades gracefully).

Cost is one O(N * TPG) elementwise pass + one sort of N * TPG int32 pairs —
~10-20 ms at 131k gaussians on a v5e — versus the O(T * N) mask/cumsum of a
naive tile-major design (~2.7 s measured; 87% of a training step).

Tile size 16 matches the reference (model.py:243 BLOCK_WIDTH = 16).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TileBinning(NamedTuple):
    """Fixed-capacity per-tile gaussian lists for one camera."""

    tile_lists: jnp.ndarray    # [T, K] int32 gaussian ids, front-to-back; -1 pad
    tile_counts: jnp.ndarray   # [T] int32 number of intersections (uncapped)
    num_tiles_x: int
    num_tiles_y: int
    order: jnp.ndarray         # [N] int32 depth order used (valid first)
    num_truncated: jnp.ndarray  # scalar: gaussians with bbox > TPG cells
    # Gradient-reduction plan: slab slots grouped by gaussian id. The
    # per-tile gather's VJP must reduce the [T, K] slab cotangents back to
    # [N] per-gaussian sums; XLA's scatter-add runs on the TPU scalar core
    # (~20 ms at 1.1M slots), so we precompute here (where the slab layout
    # is born) a stable grouping permutation + segment boundaries, turning
    # the VJP into gather -> cumsum -> boundary-diff (vector/MXU fast).
    slab_perm: jnp.ndarray     # [T*K] int32: slot indices sorted by gaussian
    slab_bounds: jnp.ndarray   # [N+1] int32: segment start of each gaussian


def bin_gaussians(
    means2d: jnp.ndarray,   # [N, 2]
    radii: jnp.ndarray,     # [N] int32 (0 = culled)
    depths: jnp.ndarray,    # [N]
    width: int,
    height: int,
    tile_size: int = 16,
    max_per_tile: int = 256,
    max_tiles_per_gaussian: int = 64,
) -> TileBinning:
    """Build per-tile front-to-back gaussian lists (single camera)."""
    n = means2d.shape[0]
    tpg = max_tiles_per_gaussian
    num_tiles_x = -(-width // tile_size)
    num_tiles_y = -(-height // tile_size)
    num_tiles = num_tiles_x * num_tiles_y

    culled = radii <= 0
    depth_key = jnp.where(culled, jnp.inf, depths)
    order = jnp.argsort(depth_key).astype(jnp.int32)  # front-to-back, valid first

    mx = means2d[order, 0]
    my = means2d[order, 1]
    r = radii[order].astype(means2d.dtype)
    alive = radii[order] > 0

    x0 = jnp.clip(jnp.floor((mx - r) / tile_size), 0, num_tiles_x - 1).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((mx + r) / tile_size), 0, num_tiles_x - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((my - r) / tile_size), 0, num_tiles_y - 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((my + r) / tile_size), 0, num_tiles_y - 1).astype(jnp.int32)
    bw = jnp.where(alive, x1 - x0 + 1, 0)          # bbox width in tiles
    area = bw * jnp.where(alive, y1 - y0 + 1, 0)   # bbox cells
    num_truncated = jnp.sum((area > tpg).astype(jnp.int32))

    # pair expansion: cell j of gaussian i -> tile (x0 + j % bw, y0 + j / bw)
    j = jnp.arange(tpg, dtype=jnp.int32)[None, :]          # [1, TPG]
    bw_safe = jnp.maximum(bw, 1)[:, None]
    tx = x0[:, None] + j % bw_safe
    ty = y0[:, None] + j // bw_safe
    pair_valid = (j < area[:, None])
    # exact circle-tile test: drop bbox cells farther from the mean than the
    # 3-sigma radius (every alpha in such a cell is below the compositing
    # cutoff). Roughly halves the pair count for large gaussians and keeps
    # the capped per-tile lists filled with real contributors.
    cx = jnp.clip(mx[:, None], tx.astype(means2d.dtype) * tile_size,
                  (tx + 1).astype(means2d.dtype) * tile_size)
    cy = jnp.clip(my[:, None], ty.astype(means2d.dtype) * tile_size,
                  (ty + 1).astype(means2d.dtype) * tile_size)
    dx = mx[:, None] - cx
    dy = my[:, None] - cy
    pair_valid &= (dx * dx + dy * dy) <= (r * r)[:, None]
    keys = jnp.where(
        pair_valid, ty * num_tiles_x + tx, num_tiles
    ).astype(jnp.int32)                                     # [N, TPG]
    vals = jnp.broadcast_to(order[:, None], (n, tpg)).astype(jnp.int32)

    # stable sort by tile id keeps depth order within each tile
    keys_sorted, vals_sorted = jax.lax.sort(
        (keys.reshape(-1), vals.reshape(-1)), dimension=0,
        is_stable=True, num_keys=1,
    )

    # per-tile ranges + capped gather
    boundaries = jnp.searchsorted(
        keys_sorted, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    counts = boundaries[1:] - boundaries[:-1]               # [T]
    k_idx = jnp.arange(max_per_tile, dtype=jnp.int32)[None, :]
    gather = boundaries[:-1, None] + k_idx                  # [T, K]
    total_pairs = n * tpg
    in_range = k_idx < jnp.minimum(counts[:, None], max_per_tile)
    lists = jnp.where(
        in_range,
        vals_sorted[jnp.clip(gather, 0, total_pairs - 1)],
        -1,
    )
    # group slab slots by gaussian id for the gradient-reduction VJP
    flat_ids = lists.reshape(-1)
    sort_key = jnp.where(flat_ids >= 0, flat_ids, n).astype(jnp.int32)
    slot_iota = jnp.arange(flat_ids.shape[0], dtype=jnp.int32)
    ids_sorted, slab_perm = jax.lax.sort(
        (sort_key, slot_iota), dimension=0, is_stable=False, num_keys=1
    )
    slab_bounds = jnp.searchsorted(
        ids_sorted, jnp.arange(n + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    return TileBinning(
        tile_lists=lists,
        tile_counts=counts,
        num_tiles_x=num_tiles_x,
        num_tiles_y=num_tiles_y,
        order=order,
        num_truncated=num_truncated,
        slab_perm=slab_perm,
        slab_bounds=slab_bounds,
    )
