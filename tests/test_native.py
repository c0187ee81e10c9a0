"""Native geometry core vs. numpy/scipy references (parity + availability)."""

import numpy as np
import pytest
from scipy.spatial import cKDTree

from qed_splatter_tpu import native
from qed_splatter_tpu.ops.voxel import voxel_downsample

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libqedcore.so not built"
)


def test_voxel_downsample_matches_numpy():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(5000, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (5000, 3)).astype(np.float32)
    p_np, c_np = voxel_downsample(pts, 0.2, cols)
    p_na, c_na = native.voxel_downsample_native(pts, 0.2, cols)
    assert len(p_na) == len(p_np)
    # same cell averages (order differs): compare as sorted sets
    key_np = np.lexsort(p_np.T)
    key_na = np.lexsort(p_na.T)
    np.testing.assert_allclose(p_na[key_na], p_np[key_np], atol=1e-5)
    np.testing.assert_allclose(c_na[key_na], c_np[key_np], atol=1e-5)


def test_nn_distances_match_scipy():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(2000, 3)).astype(np.float32)
    r = rng.normal(size=(3000, 3)).astype(np.float32)
    got = native.nn_distances_native(q, r)
    want, _ = cKDTree(r).query(q)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_nn_distances_clustered():
    """Grid search must stay exact with very uneven densities."""
    rng = np.random.default_rng(2)
    r = np.concatenate([
        rng.normal(scale=0.01, size=(1000, 3)),
        rng.normal(loc=5.0, scale=2.0, size=(50, 3)),
    ]).astype(np.float32)
    q = rng.uniform(-3, 8, (500, 3)).astype(np.float32)
    got = native.nn_distances_native(q, r)
    want, _ = cKDTree(r).query(q)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_backproject_matches_jax():
    rng = np.random.default_rng(3)
    h, w = 33, 47
    depth = rng.uniform(0.5, 5.0, (h, w)).astype(np.float32)
    depth[::5, ::3] = 0.0
    K = np.array([[40.0, 0, w / 2], [0, 42.0, h / 2], [0, 0, 1]], np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.3, -0.2, 1.0]
    import jax.numpy as jnp

    from qed_splatter_tpu.ops.backproject import backproject_depth

    want_pts, want_valid = backproject_depth(
        jnp.asarray(depth), K, c2w, 4.0, stride=2
    )
    got = native.backproject_native(depth, K, c2w, 4.0, stride=2)
    wv = np.asarray(want_valid)
    np.testing.assert_allclose(
        got[wv], np.asarray(want_pts)[wv], atol=1e-4
    )
    assert np.isnan(got[~wv]).all()


def test_nn_distances_disjoint_clouds():
    """Far-apart clouds must terminate fast and stay exact (regression:
    unbounded ring sweep on disjoint clouds)."""
    import time

    rng = np.random.default_rng(4)
    r = rng.normal(size=(2000, 3)).astype(np.float32)
    q = (rng.normal(size=(500, 3)) + 500.0).astype(np.float32)
    t0 = time.time()
    got = native.nn_distances_native(q, r)
    assert time.time() - t0 < 5.0
    want, _ = cKDTree(r).query(q)
    np.testing.assert_allclose(got, want, rtol=1e-4)
