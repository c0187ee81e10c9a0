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

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class TileBinning(NamedTuple):
    """Fixed-capacity per-tile gaussian lists for one camera."""

    tile_lists: jnp.ndarray    # [T, K] int32 gaussian ids, front-to-back; -1 pad
    tile_counts: jnp.ndarray   # [T] int32 number of intersections (uncapped)
    num_tiles_x: int
    num_tiles_y: int
    order: jnp.ndarray         # [N] int32 depth order used (valid first)
    num_truncated: jnp.ndarray  # scalar: gaussians with bbox > TPG cells
    # Gradient-reduction plan: slab slots grouped by depth rank. The
    # per-tile gather's VJP must reduce the [T, K] slab cotangents back to
    # [N] per-gaussian sums; XLA's scatter-add runs on the TPU scalar core
    # (~20 ms at 1.1M slots), so we precompute here (where the slab layout
    # is born) a grouping permutation + segment boundaries, turning the
    # VJP into gather -> cumsum -> boundary-diff (vector/MXU fast).
    slab_perm: jnp.ndarray     # [T*K] int32: slot indices sorted by rank
    slab_bounds: jnp.ndarray   # [N+1] int32: segment start of each rank
    # Rank-space addressing: tile_ranks holds depth ranks (-1 pad); the
    # gaussian id of rank r is order[r]; inv_order maps id -> rank. The
    # hot path gathers params[order] once and then addresses by rank,
    # skipping the [T, K] rank->id decode gather (~7 ms at 1.1M slots).
    tile_ranks: jnp.ndarray    # [T, K] int32 depth ranks, -1 pad
    inv_order: jnp.ndarray     # [N] int32: rank of each gaussian id


_HBM_TILE = 1024  # Mosaic tiling granule of a 1-D HBM memref


def _slab_kernel(blk_ref, off_ref, *refs, tb, rows):
    """Extract ``tb`` K-wide windows at unaligned offsets from aligned
    1024-element HBM blocks. Window j spans HBM blocks blk[i] and
    blk[i]+1 (pipelined in as refs[2j], refs[2j+1], each a [1, 8, 128]
    VMEM view); the unaligned start is recovered in-register with ONE
    dynamic-lane rotate + sublane select per window."""
    out_ref, cat_ref = refs[-2], refs[-1]
    g = pl.program_id(0)
    for j in range(tb):
        i = g * tb + j
        o = off_ref[i]
        # dynamic sublane slicing needs a Ref: stage the two blocks into
        # a [16, 128] VMEM scratch first
        cat_ref[:8] = refs[2 * j][0]
        cat_ref[8:] = refs[2 * j + 1][0]
        w = cat_ref[pl.ds(o // 128, rows + 1), :]            # [rows+1, 128]
        # left-rotate every row by l: ra[r, i2] = w[r, (i2 + l) % 128];
        # row r of the output is ra[r] for lanes < 128-l and ra[r+1]
        # (whose rotated head is w[r+1, :l]) for the tail lanes
        l = o % 128
        ra = pltpu.roll(w, -l, axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
        out_ref[j] = jnp.where(lane < 128 - l, ra[:rows], ra[1:])


def slab_gather_unaligned(
    sorted_keys: jnp.ndarray,   # [M] u32/i32, ascending
    starts: jnp.ndarray,        # [T] i32 window starts, in [0, M]
    k: int,                     # window length, multiple of 128, <= 1024
    fill: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """[T, k] windows ``sorted_keys[starts[t] : starts[t]+k]`` via Pallas.

    Precondition: ``starts`` must lie in [0, M] (``bin_gaussians`` passes
    searchsorted boundaries, which always do). A start outside that range
    would make the scalar-prefetched block index map point past ``src`` —
    an out-of-bounds DMA with undefined contents — so starts are clamped
    here as defense in depth (ADVICE r4); out-of-range callers get
    in-bounds garbage windows, not UB. Elements past M read the ``fill``
    padding.

    XLA lowers this variable-offset slice gather to a per-slice loop
    (5.6 ms at T=4293/K=256 on a v5e — the most expensive sub-stage of
    binning, tools/bench_binning.py). Mosaic rejects unaligned 1-D HBM
    slices (tiling granule 1024), so each window is fetched as its two
    covering aligned 1024-blocks — block indices scalar-prefetched into
    the BlockSpec index maps (the block-sparse pattern) — and the
    unaligned start is recovered with a dynamic-lane rotate. ~34 MB of
    aligned DMA instead of 4293 serial slice descriptors.
    """
    t = starts.shape[0]
    rows = k // 128
    assert k % 128 == 0 and 1 <= rows <= 8
    tb = 8
    t_pad = -(-t // tb) * tb
    m = sorted_keys.shape[0]
    n_blocks = m // _HBM_TILE + 2
    keys_i32 = jax.lax.bitcast_convert_type(sorted_keys, jnp.int32) \
        if sorted_keys.dtype != jnp.int32 else sorted_keys
    src = jnp.pad(keys_i32, (0, n_blocks * _HBM_TILE - m),
                  constant_values=fill).reshape(n_blocks, 8, 128)
    starts_p = jnp.pad(
        jnp.clip(starts.astype(jnp.int32), 0, m), (0, t_pad - t)
    )
    blk = starts_p // _HBM_TILE
    off = starts_p % _HBM_TILE

    def mk_index(jj, plus):
        return lambda g, blk_ref, off_ref: (blk_ref[g * tb + jj] + plus, 0, 0)

    in_specs = []
    for j in range(tb):
        in_specs.append(pl.BlockSpec((1, 8, 128), mk_index(j, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((1, 8, 128), mk_index(j, 1),
                                     memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        functools.partial(_slab_kernel, tb=tb, rows=rows),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(t_pad // tb,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (tb, rows, 128), lambda g, *_: (g, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((16, 128), jnp.int32)],
        ),
        out_shape=jax.ShapeDtypeStruct((t_pad, rows, 128), jnp.int32),
        interpret=interpret,
    )(blk, off, *([src] * (2 * tb)))
    out = out.reshape(t_pad, k)[:t]
    if sorted_keys.dtype != jnp.int32:
        out = jax.lax.bitcast_convert_type(out, sorted_keys.dtype)
    return out


def _use_pallas_slab() -> bool:
    """A/B escape hatch for the Pallas slab gather.

    Read at TRACE time (ADVICE r4): setting ``QED_NO_PALLAS_SLAB`` after a
    caller has already been jit-compiled has no effect on that cached
    executable — set it before the first trace (bench tools do; the CLI
    reads the environment at process start). ``jax.default_backend()`` is
    likewise the trace-time default; under explicit non-default device
    placement pass ``use_pallas=False`` to ``bin_gaussians`` instead."""
    import os

    if os.environ.get("QED_NO_PALLAS_SLAB"):
        return False
    return jax.default_backend() == "tpu"


def bin_gaussians(
    means2d: jnp.ndarray,   # [N, 2]
    radii: jnp.ndarray,     # [N] int32 (0 = culled)
    depths: jnp.ndarray,    # [N]
    width: int,
    height: int,
    tile_size: int = 16,
    max_per_tile: int = 256,
    max_tiles_per_gaussian: int = 64,
    with_slab_plan: bool = True,
    small_tiles_per_gaussian: int = 8,
    overflow_slots: int = 0,
    with_id_lists: bool = True,
    use_pallas: Optional[bool] = None,
) -> TileBinning:
    """Build per-tile front-to-back gaussian lists (single camera).

    ``with_slab_plan=False`` skips the gradient-reduction grouping plan
    (slab_perm/slab_bounds are None) — for forward-only renders (eval,
    export, viewer) that never backprop through the tile gather.

    Pair expansion is **hierarchical**: every gaussian gets
    ``small_tiles_per_gaussian`` pair slots; the few gaussians whose tile
    bbox exceeds that ("big" splats — early-training monsters, close-ups)
    get a row in a fixed ``overflow_slots``-sized table carrying the
    remaining cells up to ``max_tiles_per_gaussian``. This cuts the sorted
    pair count ~5x vs a flat [N, 64] expansion (the flat sort was ~20 ms of
    a ~100 ms step at 1296x840/131k — the most expensive op of a training
    step). ``overflow_slots=0`` auto-sizes to ``max(1024, N // 16)``;
    front-most big gaussians win slots, the rest are truncated and counted.
    """
    n = means2d.shape[0]
    tpg = max_tiles_per_gaussian
    tpg_small = min(small_tiles_per_gaussian, tpg)
    tpg_big = tpg - tpg_small
    if overflow_slots <= 0:
        overflow_slots = max(1024, n // 16)
    n_big = min(overflow_slots, n) if tpg_big > 0 else 0
    num_tiles_x = -(-width // tile_size)
    num_tiles_y = -(-height // tile_size)
    num_tiles = num_tiles_x * num_tiles_y

    culled = radii <= 0
    # Depth ordering without an f32 argsort (measured ~2.5-3.5 ms at 131k —
    # as much as the 1.5M-pair main sort): quantize log-depth to the key
    # bits left over by the index and run ONE u32 single-operand sort whose
    # low bits ARE the order. Quantization granularity at >= 10 depth bits
    # is <= 0.4% of the scene's log-depth span per bucket; ordering of
    # splats within the same bucket falls back to index order — a
    # self-consistent compositing order (the same binning drives forward
    # and backward), differing from exact f32 depth order only for pairs
    # whose mutual occlusion is negligible. gsplat's radix sort is exact
    # here; this is a deliberate approximation for TPU sort economics.
    idx_bits = max((n - 1).bit_length(), 1)
    dq_bits = 32 - idx_bits
    if dq_bits >= 10:
        valid = ~culled
        finite_d = jnp.where(valid, depths, jnp.nan)
        lo = jnp.log(jnp.maximum(jnp.nanmin(finite_d), 1e-6))
        hi = jnp.log(jnp.maximum(jnp.nanmax(finite_d), 1e-6))
        levels = (1 << dq_bits) - 2   # top bucket reserved for culled
        t = (jnp.log(jnp.maximum(depths, 1e-6)) - lo) / jnp.maximum(
            hi - lo, 1e-9
        )
        q = jnp.clip((t * levels).astype(jnp.int32), 0, levels - 1)
        q = jnp.where(valid, q, levels + 1).astype(jnp.uint32)
        packed_key = (q << idx_bits) | jnp.arange(n, dtype=jnp.uint32)
        order = (
            jax.lax.sort(packed_key, dimension=0, is_stable=False)
            & ((jnp.uint32(1) << idx_bits) - 1)
        ).astype(jnp.int32)
    else:
        depth_key = jnp.where(culled, jnp.inf, depths)
        order = jnp.argsort(depth_key).astype(jnp.int32)

    # one packed row gather (four separate column gathers cost ~1 ms each)
    packed_cols = jnp.concatenate(
        [means2d, radii[:, None].astype(means2d.dtype)], axis=-1
    )[order]
    mx = packed_cols[:, 0]
    my = packed_cols[:, 1]
    r = packed_cols[:, 2]
    alive = r > 0

    x0 = jnp.clip(jnp.floor((mx - r) / tile_size), 0, num_tiles_x - 1).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((mx + r) / tile_size), 0, num_tiles_x - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((my - r) / tile_size), 0, num_tiles_y - 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((my + r) / tile_size), 0, num_tiles_y - 1).astype(jnp.int32)
    bw = jnp.where(alive, x1 - x0 + 1, 0)          # bbox width in tiles
    area = bw * jnp.where(alive, y1 - y0 + 1, 0)   # bbox cells

    def expand(rows, j0, tpg_rows):
        """Pair keys for cells [j0, j0 + tpg_rows) of depth-positions
        ``rows`` — cell j of gaussian i covers tile (x0 + j % bw,
        y0 + j / bw); cells outside the bbox area or failing the exact
        circle-tile test (center farther than the 3-sigma radius — every
        alpha there is below the compositing cutoff) get the sentinel key.

        Layout: [tpg_rows, n_rows] — the gaussian axis minor so all [j, i]
        intermediates are lane-aligned (a [N, 8] layout pads 8 lanes to 128
        and runs the whole expansion at 1/16 vector efficiency; measured
        12 ms -> ~1 ms at 131k x 8).

        ``rows=None`` means the identity (all N depth positions): XLA does
        NOT simplify ``x[arange(n)]`` and the seven per-column identity
        gathers it emitted cost 0.94 ms EACH on a v5e (6.5 ms of a 44 ms
        step, round-5 profiler finding) — index directly instead.
        """
        j = j0 + jnp.arange(tpg_rows, dtype=jnp.int32)[:, None]   # [J, 1]

        def sel(arr):
            return arr[None] if rows is None else arr[rows][None]

        mxr, myr, rr = sel(mx), sel(my), sel(r)
        bw_safe = jnp.maximum(sel(bw), 1)                         # [1, I]
        tx = sel(x0) + j % bw_safe
        ty = sel(y0) + j // bw_safe
        pair_valid = j < sel(area)
        cx = jnp.clip(mxr, tx.astype(means2d.dtype) * tile_size,
                      (tx + 1).astype(means2d.dtype) * tile_size)
        cy = jnp.clip(myr, ty.astype(means2d.dtype) * tile_size,
                      (ty + 1).astype(means2d.dtype) * tile_size)
        dx = mxr - cx
        dy = myr - cy
        pair_valid &= (dx * dx + dy * dy) <= rr * rr
        return jnp.where(pair_valid, ty * num_tiles_x + tx,
                         num_tiles).astype(jnp.int32)             # [J, I]

    all_rows = jnp.arange(n, dtype=jnp.int32)
    keys_small = expand(None, 0, tpg_small)                 # [tpg_small, N]
    if n_big > 0:
        big = area > tpg_small
        # Front-most big gaussians claim the overflow rows: "the j-th big
        # row in depth order" = the j-th entry of ONE compaction sort with
        # key (not-big, depth-position) — big rows sort to the front in
        # depth order. (The previous cumsum/cummax + 8k-query searchsorted
        # formulation cost 2.1 ms/step in XLA's vmapped binary-search
        # while loop, round-5 profiler; the N-element u32 sort is ~0.5 ms.)
        nb_bits = max((n - 1).bit_length(), 1)
        sel_key = (
            (jnp.where(big, jnp.uint32(0), jnp.uint32(1)) << nb_bits)
            | jnp.arange(n, dtype=jnp.uint32)
        )
        big_sel = (
            jax.lax.sort(sel_key, dimension=0, is_stable=False)[:n_big]
            & ((jnp.uint32(1) << nb_bits) - 1)
        ).astype(jnp.int32)
        n_bigs_total = jnp.sum(big).astype(jnp.int32)
        sel_valid = jnp.arange(n_big, dtype=jnp.int32) < n_bigs_total
        big_sel = jnp.minimum(big_sel, n - 1)  # tail rows: masked below
        keys_big = expand(big_sel, tpg_small, tpg_big)      # [tpg_big, n_big]
        # tail slots past the last real big row would re-expand a clamped
        # duplicate; the sentinel key drops them before the sort
        keys_big = jnp.where(sel_valid[None, :], keys_big, num_tiles)
        # truncated: big but unselected, or selected with area beyond budget
        unselected = jnp.maximum(n_bigs_total - n_big, 0)
        over_budget = jnp.sum(
            sel_valid & (area[big_sel] > tpg)
        ).astype(jnp.int32)
        num_truncated = unselected + over_budget
        keys = jnp.concatenate([keys_small.reshape(-1), keys_big.reshape(-1)])
        rank_rows = jnp.concatenate([
            jnp.broadcast_to(all_rows[None], (tpg_small, n)).reshape(-1),
            jnp.broadcast_to(big_sel[None], (tpg_big, n_big)).reshape(-1),
        ])
    else:
        num_truncated = jnp.sum(area > tpg_small).astype(jnp.int32)
        keys = keys_small.reshape(-1)
        rank_rows = jnp.broadcast_to(
            all_rows[None], (tpg_small, n)).reshape(-1)
    total_pairs = keys.shape[0]
    k_idx = jnp.arange(max_per_tile, dtype=jnp.int32)[None, :]

    # Sorting 8.4M (key, value) pairs is the single most expensive op of a
    # training step (~20 ms of a ~100 ms step at 1296x840/131k measured
    # in-context). When tile-id and depth-rank bits fit an int32 we pack
    # key = tile << rank_bits | depth_rank instead: keys become UNIQUE
    # (no stability needed — rank in the low bits IS the within-tile depth
    # order) and the sort moves half the bytes. Decode after the per-tile
    # cap, where only T*K elements remain.
    rank_bits = max((n - 1).bit_length(), 1)
    tile_bits = int(num_tiles).bit_length()
    if rank_bits + tile_bits <= 32:
        # key = tile << rank_bits | depth_rank: UNIQUE keys (no stability
        # needed — rank in the low bits IS the within-tile depth order) and
        # the sort moves half the bytes of a (key, value) pair sort.
        # uint32 buys capacities up to 2^(32 - tile_bits) before the
        # two-operand fallback.
        packed = (
            (keys.astype(jnp.uint32) << rank_bits)
            | rank_rows.astype(jnp.uint32)
        )
        packed_sorted = jax.lax.sort(packed, dimension=0, is_stable=False)
        boundaries = jnp.searchsorted(
            packed_sorted,
            jnp.arange(num_tiles + 1, dtype=jnp.uint32) << rank_bits,
            side="left",
        ).astype(jnp.int32)
        counts = boundaries[1:] - boundaries[:-1]           # [T]
        pallas_ok = use_pallas if use_pallas is not None \
            else _use_pallas_slab()
        if max_per_tile % 128 == 0 and max_per_tile <= 1024 and pallas_ok:
            # Pallas aligned-block window gather (see slab_gather_unaligned)
            slabs = slab_gather_unaligned(
                packed_sorted, boundaries[:-1], max_per_tile,
                fill=-1,  # i32 view of 0xFFFFFFFF = u32 sentinel
            )
        else:
            # contiguous per-tile K-wide slices as ONE gather op — a vmapped
            # dynamic_slice lowers to a 4293-iteration while loop (~4.7 ms)
            padded = jnp.concatenate(
                [packed_sorted,
                 jnp.full((max_per_tile,), jnp.iinfo(jnp.uint32).max,
                          jnp.uint32)]
            )
            slabs = jax.lax.gather(
                padded,
                boundaries[:-1, None],
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1,), collapsed_slice_dims=(),
                    start_index_map=(0,),
                ),
                slice_sizes=(max_per_tile,),
                mode=jax.lax.GatherScatterMode.CLIP,
            )                                               # [T, K]
        in_range = k_idx < jnp.minimum(counts[:, None], max_per_tile)
        ranks = jnp.where(
            in_range,
            (slabs & ((1 << rank_bits) - 1)).astype(jnp.int32),
            -1,
        )
    else:
        # fallback for shapes whose (tile, rank) bits exceed int32: two-key
        # sort by (tile, depth rank) — the concatenated hierarchical pair
        # list is not rank-ordered, so single-key stability is not enough
        keys_sorted, ranks_sorted = jax.lax.sort(
            (keys, rank_rows), dimension=0, is_stable=False, num_keys=2,
        )
        boundaries = jnp.searchsorted(
            keys_sorted, jnp.arange(num_tiles + 1, dtype=jnp.int32),
            side="left",
        ).astype(jnp.int32)
        counts = boundaries[1:] - boundaries[:-1]
        gather = boundaries[:-1, None] + k_idx              # [T, K]
        in_range = k_idx < jnp.minimum(counts[:, None], max_per_tile)
        ranks = jnp.where(
            in_range,
            ranks_sorted[jnp.clip(gather, 0, total_pairs - 1)],
            -1,
        )
    # id lists: only materialized when asked — the rank->id decode is a
    # [T, K] gather from the order table (~7 ms at 1.1M slots); the Pallas
    # hot path addresses by rank instead
    if with_id_lists:
        lists = jnp.where(ranks >= 0, order[jnp.maximum(ranks, 0)], -1)
    else:
        lists = None
    # group slab slots by depth rank for the gradient-reduction VJP
    slab_perm = slab_bounds = inv_order = None
    if with_slab_plan:
        from qed_splatter_tpu.ops.segment import BIG_SLAB_SLOTS

        # inv_order (id -> rank) without argsort: `order` is a
        # permutation, so ONE unstable (key, payload) sort of
        # (order, position) grouped by gaussian id yields each id's rank
        # as the payload (argsort costs 2.5 ms at 131k vs ~1 ms here).
        inv_order = jax.lax.sort(
            (order, jnp.arange(n, dtype=jnp.int32)),
            dimension=0, is_stable=False, num_keys=1,
        )[1]
        if num_tiles * max_per_tile < BIG_SLAB_SLOTS:
            # Grouping AND segment bounds from sorts alone (sorts are
            # ~1 ms at this size; a bounds searchsorted is a 21-pass
            # binary-search while loop (~18 ms) and a histogram scatter
            # runs on the scalar core (~9 ms)): merge one marker element
            # per rank into the grouping sort — key 2*rank for markers
            # sorts immediately BEFORE key 2*rank+1 slots — then extract
            # the n+1 marker positions (in rank order by construction)
            # with a second single-operand sort. Marker payloads index
            # one past the slot range; the reduction gathers them from a
            # zero pad row, contributing nothing.
            #
            # BIG slabs skip the plan entirely: the VJP reduces by a
            # marker-merged payload sort instead
            # (segment.tile_gather_ranked_sort) — the plan's permutation
            # gather degrades to 16.6 ns/row once its operand spills
            # cache (outputs/profile_dense_r5.txt fusion.11).
            flat = ranks.reshape(-1)
            m_slots = flat.shape[0]
            slot_key = 2 * jnp.where(flat >= 0, flat, n).astype(jnp.int32) + 1
            marker_key = 2 * jnp.arange(n + 1, dtype=jnp.int32)
            payload = jnp.concatenate([
                jnp.arange(m_slots, dtype=jnp.int32),
                jnp.full((n + 1,), m_slots, jnp.int32),
            ])
            merged_keys, slab_perm = jax.lax.sort(
                (jnp.concatenate([slot_key, marker_key]), payload),
                dimension=0, is_stable=False, num_keys=1,
            )
            pos_if_marker = jnp.where(
                (merged_keys & 1) == 0,
                jnp.arange(merged_keys.shape[0], dtype=jnp.int32),
                jnp.iinfo(jnp.int32).max,
            )
            slab_bounds = jax.lax.sort(pos_if_marker)[:n + 1]

    return TileBinning(
        tile_lists=lists,
        tile_counts=counts,
        num_tiles_x=num_tiles_x,
        num_tiles_y=num_tiles_y,
        order=order,
        num_truncated=num_truncated,
        slab_perm=slab_perm,
        slab_bounds=slab_bounds,
        tile_ranks=ranks,
        inv_order=inv_order,
    )
