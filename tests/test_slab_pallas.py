"""Parity of the Pallas unaligned-window slab gather vs the XLA slice
gather it replaces (ops.tiles.slab_gather_unaligned)."""

import numpy as np
import jax.numpy as jnp
import pytest

from qed_splatter_tpu.ops.tiles import slab_gather_unaligned


@pytest.mark.parametrize("k", [128, 256, 512, 1024])
def test_slab_gather_unaligned_matches_slices(k):
    rng = np.random.default_rng(0)
    m, t = 50_000, 333
    keys = np.sort(rng.integers(0, 2**32, m, dtype=np.uint64)).astype(
        np.uint32)
    starts = np.sort(rng.integers(0, m, t)).astype(np.int32)
    out = np.asarray(slab_gather_unaligned(
        jnp.asarray(keys), jnp.asarray(starts), k, fill=-1, interpret=True))
    sentinel = np.full(k, 0xFFFFFFFF, np.uint32)
    for row, s in zip(out, starts):
        ref = np.concatenate([keys[s:s + k], sentinel])[:k]
        np.testing.assert_array_equal(row, ref)


def test_slab_gather_unaligned_edge_offsets():
    # starts exercising every alignment class: block-aligned, lane-aligned,
    # and odd offsets, including a window that dangles past the end
    m, k = 4096, 256
    keys = np.arange(m, dtype=np.uint32)
    starts = np.array([0, 1, 127, 128, 1023, 1024, 2047, m - 10],
                      np.int32)
    out = np.asarray(slab_gather_unaligned(
        jnp.asarray(keys), jnp.asarray(starts), k, fill=-1, interpret=True))
    sentinel = np.full(k, 0xFFFFFFFF, np.uint32)
    for row, s in zip(out, starts):
        ref = np.concatenate([keys[s:s + k], sentinel])[:k]
        np.testing.assert_array_equal(row, ref)
