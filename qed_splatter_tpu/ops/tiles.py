"""Tile intersection / binning: gaussians -> per-tile depth-ordered lists.

TPU-native replacement for gsplat's ``isect_tiles`` + radix sort +
``isect_offset_encode`` CUDA kernels (reference SURVEY D4). The CUDA design
builds variable-length per-tile lists; that is hostile to XLA's static-shape
model, so we instead build **fixed-capacity** per-tile lists:

- gaussians are globally sorted by camera depth once (XLA sort),
- each 16x16 tile keeps the first ``max_per_tile`` intersecting gaussians in
  front-to-back order (front-most K dominate compositing, so saturation
  degrades gracefully; overflow is reported for monitoring),
- everything is dense masked math: an [tiles_chunk, N] intersection mask,
  a cumulative-sum rank, and a scatter — no data-dependent shapes.

Tile size 16 matches the reference (model.py:243 BLOCK_WIDTH = 16).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class TileBinning(NamedTuple):
    """Fixed-capacity per-tile gaussian lists for one camera."""

    tile_lists: jnp.ndarray   # [T, K] int32 gaussian indices, front-to-back; -1 pad
    tile_counts: jnp.ndarray  # [T] int32 number of intersections (uncapped)
    num_tiles_x: int
    num_tiles_y: int
    order: jnp.ndarray        # [N] int32 depth order used (valid first)


def _tile_chunk(
    tile_idx: jnp.ndarray,    # [Tc] flat tile indices
    x0: jnp.ndarray, x1: jnp.ndarray, y0: jnp.ndarray, y1: jnp.ndarray,  # [N]
    sorted_ids: jnp.ndarray,  # [N] original gaussian index in depth order
    num_tiles_x: int,
    max_per_tile: int,
):
    tx = (tile_idx % num_tiles_x)[:, None]  # [Tc, 1]
    ty = (tile_idx // num_tiles_x)[:, None]
    hit = (x0[None, :] <= tx) & (tx <= x1[None, :]) & \
          (y0[None, :] <= ty) & (ty <= y1[None, :])   # [Tc, N]
    rank = jnp.cumsum(hit.astype(jnp.int32), axis=1) - 1
    counts = rank[:, -1] + 1
    tc = tile_idx.shape[0]
    keep = hit & (rank < max_per_tile)
    row = jnp.broadcast_to(jnp.arange(tc, dtype=jnp.int32)[:, None], rank.shape)
    flat = jnp.where(keep, row * max_per_tile + rank, tc * max_per_tile)
    lists = jnp.full((tc * max_per_tile,), -1, dtype=jnp.int32)
    lists = lists.at[flat.reshape(-1)].set(
        jnp.broadcast_to(sorted_ids[None, :], hit.shape).reshape(-1),
        mode="drop",
    )
    return lists.reshape(tc, max_per_tile), counts


def bin_gaussians(
    means2d: jnp.ndarray,   # [N, 2]
    radii: jnp.ndarray,     # [N] int32 (0 = culled)
    depths: jnp.ndarray,    # [N]
    width: int,
    height: int,
    tile_size: int = 16,
    max_per_tile: int = 256,
    tile_chunk: int = 0,
) -> TileBinning:
    """Build per-tile front-to-back gaussian lists (single camera).

    ``tile_chunk`` tiles are processed per sequential step (0 = auto from a
    ~32 MiB working-set budget) to bound the [Tc, N] mask memory.
    """
    n = means2d.shape[0]
    num_tiles_x = -(-width // tile_size)
    num_tiles_y = -(-height // tile_size)
    num_tiles = num_tiles_x * num_tiles_y

    culled = radii <= 0
    depth_key = jnp.where(culled, jnp.inf, depths)
    order = jnp.argsort(depth_key).astype(jnp.int32)  # valid front-to-back first

    mx = means2d[order, 0]
    my = means2d[order, 1]
    r = radii[order].astype(means2d.dtype)
    alive = radii[order] > 0

    # Inclusive tile bounds of each gaussian's bbox; dead gaussians get an
    # empty range so they never intersect anything.
    x0 = jnp.floor((mx - r) / tile_size).astype(jnp.int32)
    x1 = jnp.floor((mx + r) / tile_size).astype(jnp.int32)
    y0 = jnp.floor((my - r) / tile_size).astype(jnp.int32)
    y1 = jnp.floor((my + r) / tile_size).astype(jnp.int32)
    x0 = jnp.clip(x0, 0, num_tiles_x - 1)
    x1 = jnp.clip(x1, 0, num_tiles_x - 1)
    y0 = jnp.clip(y0, 0, num_tiles_y - 1)
    y1 = jnp.clip(y1, 0, num_tiles_y - 1)
    x0 = jnp.where(alive, x0, 1)
    x1 = jnp.where(alive, x1, 0)

    if tile_chunk <= 0:
        budget_elems = (32 << 20) // 4  # 32 MiB of int32
        tile_chunk = max(1, min(num_tiles, budget_elems // max(n, 1)))
    num_chunks = -(-num_tiles // tile_chunk)
    padded_tiles = num_chunks * tile_chunk
    tile_ids = jnp.arange(padded_tiles, dtype=jnp.int32).reshape(
        num_chunks, tile_chunk
    )
    # Padding tiles get coordinates outside every bbox -> empty lists.
    tile_ids = jnp.where(tile_ids < num_tiles, tile_ids, num_tiles_x * (2**15))

    chunk_fn = functools.partial(
        _tile_chunk,
        x0=x0, x1=x1, y0=y0, y1=y1,
        sorted_ids=order,
        num_tiles_x=num_tiles_x,
        max_per_tile=max_per_tile,
    )
    lists, counts = jax.lax.map(chunk_fn, tile_ids)
    lists = lists.reshape(padded_tiles, max_per_tile)[:num_tiles]
    counts = counts.reshape(padded_tiles)[:num_tiles]
    return TileBinning(
        tile_lists=lists,
        tile_counts=counts,
        num_tiles_x=num_tiles_x,
        num_tiles_y=num_tiles_y,
        order=order,
    )
