"""Tile rasterizer parity vs. brute-force oracle + gradient checks (SURVEY §4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qed_splatter_tpu.ops.naive import rasterize_naive
from qed_splatter_tpu.ops.projection import project_gaussians
from qed_splatter_tpu.ops.rasterize import (
    absgrad_scatter,
    rasterize_tiles,
)
from qed_splatter_tpu.ops.tiles import bin_gaussians
from qed_splatter_tpu.testing import random_scene, simple_camera

W, H = 64, 48


def _projected(n=192, seed=0):
    scene = random_scene(n=n, seed=seed)
    viewmat, K = simple_camera(width=W, height=H, f=60.0)
    res = project_gaussians(
        jnp.asarray(scene["means"]),
        jnp.asarray(scene["quats"]),
        jnp.asarray(scene["scales"]),
        jnp.asarray(viewmat),
        jnp.asarray(K),
        W,
        H,
    )
    colors = jnp.asarray(scene["colors"])
    opac = jnp.asarray(scene["opacities"])
    return res, colors, opac


def test_tile_matches_naive():
    res, colors, opac = _projected()
    binning = bin_gaussians(
        res.means2d[0], res.radii[0], res.depths[0], W, H, max_per_tile=256
    )
    tiled = rasterize_tiles(
        binning.tile_lists,
        res.means2d[0],
        res.conics[0],
        colors,
        opac,
        W,
        H,
        binning.num_tiles_x,
    )
    naive = rasterize_naive(
        res.means2d[0], res.conics[0], colors, opac,
        res.depths[0], res.radii[0], W, H,
    )
    np.testing.assert_allclose(
        np.asarray(tiled.render), np.asarray(naive.render), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(tiled.alpha), np.asarray(naive.alpha), atol=1e-4
    )


def test_tile_counts_and_overflow_report():
    res, _, _ = _projected()
    binning = bin_gaussians(
        res.means2d[0], res.radii[0], res.depths[0], W, H, max_per_tile=8
    )
    counts = np.asarray(binning.tile_counts)
    lists = np.asarray(binning.tile_lists)
    stored = (lists >= 0).sum(-1)
    np.testing.assert_array_equal(stored, np.minimum(counts, 8))


def test_front_to_back_order_in_lists():
    res, _, _ = _projected()
    binning = bin_gaussians(
        res.means2d[0], res.radii[0], res.depths[0], W, H, max_per_tile=64
    )
    depths = np.asarray(res.depths[0])
    lists = np.asarray(binning.tile_lists)
    for t in range(0, lists.shape[0], 3):
        ids = lists[t][lists[t] >= 0]
        if len(ids) > 1:
            d = depths[ids]
            assert (np.diff(d) >= -1e-6).all()


def test_single_gaussian_peak_color():
    """One opaque gaussian at the center pixel renders ~its color there."""
    # place exactly on a pixel center so peak alpha is exact
    means2d = jnp.asarray([[W / 2.0 + 0.5, H / 2.0 + 0.5]])
    conics = jnp.asarray([[0.5, 0.0, 0.5]])
    colors = jnp.asarray([[0.2, 0.5, 0.9]])
    opac = jnp.asarray([0.95])
    binning = bin_gaussians(
        means2d, jnp.asarray([5], jnp.int32), jnp.asarray([1.0]), W, H
    )
    out = rasterize_tiles(
        binning.tile_lists, means2d, conics, colors, opac, W, H,
        binning.num_tiles_x,
    )
    img = np.asarray(out.render)
    cy, cx = H // 2, W // 2
    peak = img[cy - 1 : cy + 1, cx - 1 : cx + 1].reshape(-1, 3).max(0)
    # alpha at the exact center ~0.95 * exp(-tiny)
    np.testing.assert_allclose(peak, 0.95 * np.array([0.2, 0.5, 0.9]), rtol=0.1)
    assert np.asarray(out.alpha).max() > 0.9


def test_occlusion_order():
    """A front opaque gaussian hides a rear one."""
    means2d = jnp.asarray([[32.5, 24.5], [32.5, 24.5]])
    conics = jnp.asarray([[0.8, 0.0, 0.8]] * 2)
    colors = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    opac = jnp.asarray([0.99, 0.99])
    depths = jnp.asarray([1.0, 2.0])
    radii = jnp.asarray([6, 6], jnp.int32)
    binning = bin_gaussians(means2d, radii, depths, W, H)
    out = rasterize_tiles(
        binning.tile_lists, means2d, conics, colors, opac, W, H,
        binning.num_tiles_x,
    )
    center = np.asarray(out.render)[24, 32]
    assert center[0] > 0.9 and center[1] < 0.1  # red in front wins


@pytest.mark.slow
def test_gradients_match_naive():
    res, colors, opac = _projected(n=96, seed=7)
    m2d, con, dep, rad = res.means2d[0], res.conics[0], res.depths[0], res.radii[0]
    binning = bin_gaussians(m2d, rad, dep, W, H, max_per_tile=128)
    target = jnp.zeros((H, W, 3))

    def loss_tiled(m2d, colors, opac):
        out = rasterize_tiles(
            binning.tile_lists, m2d, con, colors, opac, W, H,
            binning.num_tiles_x,
        )
        return jnp.mean((out.render - target) ** 2)

    def loss_naive(m2d, colors, opac):
        out = rasterize_naive(m2d, con, colors, opac, dep, rad, W, H)
        return jnp.mean((out.render - target) ** 2)

    gt = jax.grad(loss_tiled, argnums=(0, 1, 2))(m2d, colors, opac)
    gn = jax.grad(loss_naive, argnums=(0, 1, 2))(m2d, colors, opac)
    for a, b in zip(gt, gn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_absgrad_side_channel():
    res, colors, opac = _projected(n=64, seed=9)
    m2d, con, dep, rad = res.means2d[0], res.conics[0], res.depths[0], res.radii[0]
    binning = bin_gaussians(m2d, rad, dep, W, H, max_per_tile=64)
    t, k = binning.tile_lists.shape
    target = jnp.zeros((H, W, 3))

    def loss(eps):
        out = rasterize_tiles(
            binning.tile_lists, m2d, con, colors, opac, W, H,
            binning.num_tiles_x, tile_eps=eps,
        )
        return jnp.mean((out.render - target) ** 2)

    eps = jnp.zeros((t, k, 2))
    tile_g = jax.grad(loss)(eps)
    absg = absgrad_scatter(tile_g, binning.tile_lists, m2d.shape[0])
    assert absg.shape == (m2d.shape[0], 2)
    a = np.asarray(absg)
    assert np.isfinite(a).all()
    assert (a >= 0).all()
    assert a.sum() > 0
    # |sum over tiles| <= sum over tiles of abs  (triangle inequality vs direct grad)
    direct = jax.grad(
        lambda m: jnp.mean(
            (
                rasterize_tiles(
                    binning.tile_lists, m, con, colors, opac, W, H,
                    binning.num_tiles_x,
                ).render
                - target
            )
            ** 2
        )
    )(m2d)
    assert (np.abs(np.asarray(direct)) <= a + 1e-7).all()


def test_hierarchical_binning_matches_flat():
    """Hierarchical pair expansion (small slots + overflow table) produces
    identical tile lists to the flat [N, 64] expansion when the overflow
    table has room for every big gaussian."""
    res, colors, opac = _projected(n=96, seed=3)
    m2d, dep, rad = res.means2d[0], res.depths[0], res.radii[0]
    # inflate a few radii so several gaussians span > 8 tiles
    rad = rad.at[:5].set(40)
    hier = bin_gaussians(m2d, rad, dep, W, H, max_per_tile=64,
                         small_tiles_per_gaussian=8)
    flat = bin_gaussians(m2d, rad, dep, W, H, max_per_tile=64,
                         small_tiles_per_gaussian=64)
    np.testing.assert_array_equal(np.asarray(hier.tile_lists),
                                  np.asarray(flat.tile_lists))
    assert int(hier.num_truncated) == 0

    # starve the overflow table: truncation must be reported, lists stay valid
    starved = bin_gaussians(m2d, rad, dep, W, H, max_per_tile=64,
                            small_tiles_per_gaussian=8, overflow_slots=2)
    assert int(starved.num_truncated) > 0
    assert np.asarray(starved.tile_lists).max() < m2d.shape[0]
