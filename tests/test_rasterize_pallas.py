"""Pallas compositing kernels vs. the XLA rasterizer: forward parity and
analytic-backward vs. autodiff gradients (SURVEY §4.1 kernel parity)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qed_splatter_tpu.ops.projection import project_gaussians
from qed_splatter_tpu.ops.rasterize import rasterize_tiles
from qed_splatter_tpu.ops.rasterize_pallas import rasterize_tiles_pallas
from qed_splatter_tpu.ops.tiles import bin_gaussians
from qed_splatter_tpu.testing import random_scene, simple_camera

W, H = 64, 48
K = 128


def _projected(n=192, seed=0, with_depth=False):
    scene = random_scene(n=n, seed=seed)
    viewmat, Km = simple_camera(width=W, height=H, f=60.0)
    res = project_gaussians(
        jnp.asarray(scene["means"]),
        jnp.asarray(scene["quats"]),
        jnp.asarray(scene["scales"]),
        jnp.asarray(viewmat),
        jnp.asarray(Km),
        W,
        H,
    )
    colors = jnp.asarray(scene["colors"])
    if with_depth:
        colors = jnp.concatenate([colors, res.depths[0][:, None]], axis=-1)
    opac = jnp.asarray(scene["opacities"])
    binning = bin_gaussians(
        res.means2d[0], res.radii[0], res.depths[0], W, H, max_per_tile=K
    )
    return res, colors, opac, binning


def test_forward_parity():
    res, colors, opac, binning = _projected()
    args = (
        binning.tile_lists, res.means2d[0], res.conics[0], colors, opac,
        W, H, binning.num_tiles_x,
    )
    ref = rasterize_tiles(*args)
    pal = rasterize_tiles_pallas(*args)
    np.testing.assert_allclose(
        np.asarray(pal.render), np.asarray(ref.render), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(pal.alpha), np.asarray(ref.alpha), atol=2e-5
    )


def test_forward_parity_rgbd():
    res, colors, opac, binning = _projected(with_depth=True)
    args = (
        binning.tile_lists, res.means2d[0], res.conics[0], colors, opac,
        W, H, binning.num_tiles_x,
    )
    ref = rasterize_tiles(*args)
    pal = rasterize_tiles_pallas(*args)
    np.testing.assert_allclose(
        np.asarray(pal.render), np.asarray(ref.render), atol=1e-4
    )


@pytest.mark.slow
def test_backward_parity():
    res, colors, opac, binning = _projected(n=96, seed=3)
    m2d, con = res.means2d[0], res.conics[0]
    target = jnp.zeros((H, W, 3))

    def loss(fn, m2d, con, colors, opac):
        out = fn(
            binning.tile_lists, m2d, con, colors, opac, W, H,
            binning.num_tiles_x,
        )
        return (
            jnp.mean((out.render - target) ** 2)
            + 0.3 * jnp.mean(out.alpha**2)
        )

    g_ref = jax.grad(lambda *a: loss(rasterize_tiles, *a), argnums=(0, 1, 2, 3))(
        m2d, con, colors, opac
    )
    g_pal = jax.grad(
        lambda *a: loss(rasterize_tiles_pallas, *a), argnums=(0, 1, 2, 3)
    )(m2d, con, colors, opac)
    names = ("means2d", "conics", "colors", "opacities")
    for name, a, b in zip(names, g_pal, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3,
            err_msg=f"grad mismatch: {name}",
        )


@pytest.mark.slow
def test_backward_parity_with_tile_eps():
    """The absgrad side-channel must produce identical tile-level grads."""
    res, colors, opac, binning = _projected(n=64, seed=5)
    m2d, con = res.means2d[0], res.conics[0]
    t, k = binning.tile_lists.shape
    target = jnp.zeros((H, W, 3))

    def loss(fn, eps):
        out = fn(
            binning.tile_lists, m2d, con, colors, opac, W, H,
            binning.num_tiles_x, tile_eps=eps,
        )
        return jnp.mean((out.render - target) ** 2)

    eps = jnp.zeros((t, k, 2))
    g_ref = jax.grad(lambda e: loss(rasterize_tiles, e))(eps)
    g_pal = jax.grad(lambda e: loss(rasterize_tiles_pallas, e))(eps)
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), atol=5e-6
    )


def test_numerical_gradcheck_small():
    """Finite-difference check of the custom VJP on a tiny case."""
    from qed_splatter_tpu.ops.rasterize_pallas import composite_tiles_pallas

    rng = np.random.default_rng(0)
    t, k, d = 2, 8, 3  # channel-major layout: [T, C, K]
    g_means = jnp.asarray(
        rng.uniform(0, 32, (t, 2, k)).astype(np.float32)
    )
    g_conics = jnp.asarray(
        np.tile(np.array([0.05, 0.0, 0.05], np.float32)[None, :, None],
                (t, 1, k))
    )
    g_colors = jnp.asarray(rng.uniform(0, 1, (t, d, k)).astype(np.float32))
    g_opac = jnp.asarray(rng.uniform(0.3, 0.7, (t, 1, k)).astype(np.float32))

    def f(op):
        out, acc = composite_tiles_pallas(
            g_means, g_conics, g_colors, op, 2, 16
        )
        return jnp.sum(out**2) + jnp.sum(acc)

    g = np.asarray(jax.grad(f)(g_opac))
    epsv = 1e-3
    for idx in [(0, 0, 0), (1, 0, 3), (0, 0, 7)]:
        e = jnp.zeros_like(g_opac).at[idx].set(epsv)
        fd = (float(f(g_opac + e)) - float(f(g_opac - e))) / (2 * epsv)
        np.testing.assert_allclose(g[idx], fd, rtol=2e-2, atol=1e-4)


def test_antialiased_full_pipeline_parity():
    """classic vs antialiased modes through projection + both rasterizers."""
    import jax

    scene = random_scene(n=128, seed=11, scale_range=(0.002, 0.08))
    viewmat, Km = simple_camera(width=W, height=H, f=60.0)
    for antialiased in (False, True):
        res = project_gaussians(
            jnp.asarray(scene["means"]), jnp.asarray(scene["quats"]),
            jnp.asarray(scene["scales"]), jnp.asarray(viewmat),
            jnp.asarray(Km), W, H, antialiased=antialiased,
        )
        opac = jnp.asarray(scene["opacities"]) * res.compensations[0]
        binning = bin_gaussians(
            res.means2d[0], res.radii[0], res.depths[0], W, H,
            max_per_tile=K,
        )
        args = (binning.tile_lists, res.means2d[0], res.conics[0],
                jnp.asarray(scene["colors"]), opac, W, H,
                binning.num_tiles_x)
        a = rasterize_tiles(*args)
        b = rasterize_tiles_pallas(*args)
        np.testing.assert_allclose(
            np.asarray(b.render), np.asarray(a.render), atol=1e-4,
            err_msg=f"antialiased={antialiased}",
        )


def test_vmap_over_cameras():
    """The Pallas path composes with vmap (the sharded multi-camera step)."""
    import jax

    res, colors, opac, binning = _projected(n=64, seed=13)
    m2d = jnp.stack([res.means2d[0], res.means2d[0] + 0.5])
    con = jnp.stack([res.conics[0]] * 2)
    tl = jnp.stack([binning.tile_lists] * 2)

    def one(tl_i, m2d_i, con_i):
        out = rasterize_tiles_pallas(
            tl_i, m2d_i, con_i, colors, opac, W, H, binning.num_tiles_x
        )
        return out.render

    batched = jax.vmap(one)(tl, m2d, con)
    single = one(tl[0], m2d[0], con[0])
    np.testing.assert_allclose(
        np.asarray(batched[0]), np.asarray(single), atol=1e-5
    )
    assert batched.shape == (2, H, W, 3)


def test_ranked_vjp_matches_scatter():
    """tile_gather_ranked (rank-space gather + grouped-reduction VJP)
    produces the same forward values and gradients as the id-space gather
    with a scatter-add VJP; the rank-space absgrad reduction matches the
    exact scatter."""
    from qed_splatter_tpu.ops.segment import (
        absgrad_scatter_sorted, tile_gather_cm, tile_gather_ranked,
    )
    from qed_splatter_tpu.ops.rasterize import absgrad_scatter

    res, colors, opac, binning = _projected(n=192, seed=11)
    packed = jnp.concatenate(
        [res.means2d[0], res.conics[0], colors, opac[:, None]], axis=-1
    )
    tl = binning.tile_lists

    def loss_ranked(p):
        g = tile_gather_ranked(p, binning.order, binning.inv_order,
                               binning.tile_ranks, binning.slab_perm,
                               binning.slab_bounds)
        return jnp.sum(jnp.sin(g) * g)

    def loss_scatter(p):
        g = tile_gather_cm(p, tl)
        return jnp.sum(jnp.sin(g) * g)

    vr, gr = jax.value_and_grad(loss_ranked)(packed)
    vs, gs = jax.value_and_grad(loss_scatter)(packed)
    np.testing.assert_allclose(float(vr), float(vs), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(gs),
                               atol=1e-4, rtol=1e-4)

    # absgrad: rank-space grouped reduction vs exact id-space scatter
    t, k = tl.shape
    rng = np.random.default_rng(0)
    tile_g = jnp.asarray(rng.normal(size=(t, k, 2)), jnp.float32)
    a_perm = absgrad_scatter_sorted(
        tile_g, tl, packed.shape[0],
        slab_perm=binning.slab_perm, slab_bounds=binning.slab_bounds,
        inv_order=binning.inv_order,
    )
    a_exact = absgrad_scatter(tile_g, tl, packed.shape[0])
    np.testing.assert_allclose(np.asarray(a_perm), np.asarray(a_exact),
                               atol=1e-4, rtol=1e-4)


def test_absgrad_seed_matches_tile_eps():
    """The gather-VJP absgrad seed produces the same per-gaussian |grad|
    sums as the tile_eps side-channel + standalone reduction."""
    from qed_splatter_tpu.ops.segment import tile_gather_ranked
    from qed_splatter_tpu.ops.rasterize import absgrad_scatter

    res, colors, opac, binning = _projected(n=192, seed=13)
    packed = jnp.concatenate(
        [res.means2d[0], res.conics[0], colors, opac[:, None]], axis=-1
    )
    n = packed.shape[0]
    t, k = binning.tile_lists.shape
    cot = jnp.asarray(
        np.random.default_rng(1).normal(size=(t, packed.shape[1], k)),
        jnp.float32)

    def loss_seeded(p, seed):
        g = tile_gather_ranked(p, binning.order, binning.inv_order,
                               binning.tile_ranks, binning.slab_perm,
                               binning.slab_bounds, absgrad_seed=seed)
        return jnp.vdot(jnp.sin(g), cot)

    seed = jnp.zeros((n, 2), jnp.float32)
    gp, gseed = jax.grad(loss_seeded, argnums=(0, 1))(packed, seed)

    # reference: slab-level means cotangent -> abs scatter by gaussian id
    def loss_eps(p, eps):
        g = tile_gather_ranked(p, binning.order, binning.inv_order,
                               binning.tile_ranks, binning.slab_perm,
                               binning.slab_bounds)
        g = g.at[:, 0:2].add(eps.transpose(0, 2, 1))
        return jnp.vdot(jnp.sin(g), cot)

    eps = jnp.zeros((t, k, 2), jnp.float32)
    gp2, geps = jax.grad(loss_eps, argnums=(0, 1))(packed, eps)
    ref = absgrad_scatter(geps, binning.tile_lists, n)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gp2),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gseed), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_mixed_precision_close_to_f32():
    """bf16-operand kernels (ModelConfig.mixed_precision, reference
    config.py:32) must stay within the bf16 rounding envelope of the f32
    kernels — forward and analytic backward."""
    res, colors, opac, binning = _projected(with_depth=True)
    args = (
        binning.tile_lists, res.means2d[0], res.conics[0], colors, opac,
        W, H, binning.num_tiles_x,
    )
    f32 = rasterize_tiles_pallas(*args)
    mp = rasterize_tiles_pallas(*args, mixed_precision=True)
    assert np.allclose(np.asarray(f32.render), np.asarray(mp.render),
                       atol=5e-2)
    assert np.allclose(np.asarray(f32.alpha), np.asarray(mp.alpha),
                       atol=2e-2)
    # mean abs error should be well inside bf16 rounding, not just the max
    assert float(jnp.mean(jnp.abs(f32.render - mp.render))) < 5e-3

    def loss(mixed):
        out = rasterize_tiles_pallas(
            binning.tile_lists, res.means2d[0], res.conics[0], colors, opac,
            W, H, binning.num_tiles_x, mixed_precision=mixed,
        )
        return jnp.sum(out.render ** 2) + jnp.sum(out.alpha)

    g32 = jax.grad(lambda m, c, cl, o: jnp.sum(
        rasterize_tiles_pallas(binning.tile_lists, m, c, cl, o, W, H,
                               binning.num_tiles_x).render ** 2
    ), argnums=(0, 1, 2, 3))(res.means2d[0], res.conics[0], colors, opac)
    gmp = jax.grad(lambda m, c, cl, o: jnp.sum(
        rasterize_tiles_pallas(binning.tile_lists, m, c, cl, o, W, H,
                               binning.num_tiles_x,
                               mixed_precision=True).render ** 2
    ), argnums=(0, 1, 2, 3))(res.means2d[0], res.conics[0], colors, opac)
    for a, b in zip(g32, gmp):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(b))
        scale = np.abs(a).max() + 1e-6
        assert np.abs(a - b).max() / scale < 5e-2


@pytest.mark.slow
def test_k_chunked_composite_parity(monkeypatch):
    """K-axis chunking of the compositing kernel is exact (over-compositing
    factorizes across a front-to-back split): forward and gradients match
    the unchunked call. Guards the VMEM-bounding path adaptive max_per_tile
    relies on at K >= 2048 (K_CHUNK) on real chips."""
    from qed_splatter_tpu.ops import rasterize_pallas as rp

    res, colors, opac, binning = _projected(n=256, seed=3)

    def run(chunk):
        monkeypatch.setattr(rp, "K_CHUNK", chunk)

        def loss(means2d, conics, cols, op):
            out = rp.rasterize_tiles_pallas(
                binning.tile_lists, means2d, conics, cols, op,
                W, H, binning.num_tiles_x,
            )
            return (jnp.sum(out.render ** 2) + jnp.sum(out.alpha),
                    (out.render, out.alpha))

        (val, (img, alpha)), grads = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3), has_aux=True
        )(res.means2d[0], res.conics[0], colors, opac)
        return val, img, alpha, grads

    # K=128 lists; chunk=32 forces 4 chunks vs the single-call baseline
    v1, img1, a1, g1 = run(1 << 20)
    v2, img2, a2, g2 = run(32)
    np.testing.assert_allclose(np.asarray(img2), np.asarray(img1), atol=3e-5)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1), atol=3e-5)
    assert float(v2) == pytest.approx(float(v1), rel=1e-4)
    for ga, gb in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(gb), np.asarray(ga), atol=5e-4, rtol=1e-3
        )


def test_chunked_early_termination_skips_saturated_tiles():
    """Chunk 2+ must be skipped entirely for tiles whose pixels are all
    saturated by chunk 1 (gsplat's T < 1e-4 early stop). Observable: NaN
    payloads in the later chunk do NOT reach the output when every pixel
    saturates first, and DO when the tile stays transparent."""
    import numpy as np

    from qed_splatter_tpu.ops.rasterize_pallas import (
        K_CHUNK,
        composite_tiles_chunked,
    )

    t, d, k = 2, 3, 2 * K_CHUNK
    ts = 16
    # tile 0: a huge opaque gaussian in chunk 1 saturates every pixel;
    # tile 1: fully transparent chunk 1
    g_means = np.zeros((t, 2, k), np.float32)
    g_conics = np.zeros((t, 3, k), np.float32)
    g_colors = np.zeros((t, d, k), np.float32)
    g_opac = np.zeros((t, 1, k), np.float32)
    for i in range(8):  # stack of big opaque splats -> acc ~ 1 - 1e-3^8
        g_means[0, :, i] = (8.0, 8.0)
        g_conics[0, :, i] = (1e-6, 0.0, 1e-6)
        g_colors[0, :, i] = (0.5, 0.2, 0.1)
        g_opac[0, 0, i] = 0.999
    # poison the SECOND chunk of both tiles
    g_means[:, :, K_CHUNK] = (8.0, 8.0)
    g_conics[:, :, K_CHUNK] = (1e-6, 0.0, 1e-6)
    g_colors[:, :, K_CHUNK] = np.nan
    g_opac[:, 0, K_CHUNK] = 0.5

    out, acc = composite_tiles_chunked(
        jnp.asarray(g_means), jnp.asarray(g_conics), jnp.asarray(g_colors),
        jnp.asarray(g_opac), num_tiles_x=2, tile_size=ts, interpret=True,
        mixed_precision=False,
    )
    out = np.asarray(out)
    # saturated tile: skip fired, NaN never touched the output
    assert np.isfinite(out[0]).all()
    assert np.allclose(np.asarray(acc)[0], 1.0, atol=1e-2)
    # transparent tile: chunk 2 ran (NaN reaches the output)
    assert np.isnan(out[1]).any()

    # count gating: declaring tile 1's uncapped count < K_CHUNK marks its
    # second chunk as pure padding -> skipped even though unsaturated
    out2, _ = composite_tiles_chunked(
        jnp.asarray(g_means), jnp.asarray(g_conics), jnp.asarray(g_colors),
        jnp.asarray(g_opac), num_tiles_x=2, tile_size=ts, interpret=True,
        mixed_precision=False,
        tile_counts=jnp.asarray([k, K_CHUNK - 1], jnp.int32),
    )
    assert np.isfinite(np.asarray(out2)).all()


def test_needle_splat_gradient_parity():
    """High-anisotropy needle splats whose means lie many tile-widths
    outside the tiles they cross, at near-saturated opacity — the regime
    where the backward's pixel-moment MXU reduction expands
    sum(dsigma*(mxl-pxl)^2) into mxl^2*s0 - 2*mxl*sx + sxx with |mxl| in
    the hundreds (the same cancellation structure that forced the FORWARD
    sigma MXU formulation to be reverted, see _alphas). Guards the claim
    that the gradient rewrite stays exact-in-f32 where the sigma rewrite
    did not: parity vs the XLA rasterizer's autodiff."""
    rng = np.random.default_rng(0)
    n = 8
    means2d = np.stack([
        rng.uniform(W + 300, W + 700, n),   # 20-45 tile-widths outside
        rng.uniform(4, H - 4, n),
    ], axis=1).astype(np.float32)
    th = rng.uniform(-0.05, 0.05, n)        # near-axis-aligned needles
    conics, radii = [], []
    for i in range(n):
        c, s = np.cos(th[i]), np.sin(th[i])
        R = np.array([[c, -s], [s, c]])
        cov = R @ np.diag([900.0**2, 1.2**2]) @ R.T
        cin = np.linalg.inv(cov)
        conics.append([cin[0, 0], cin[0, 1], cin[1, 1]])
        radii.append(int(3 * np.sqrt(max(cov[0, 0], cov[1, 1]))))
    conics = jnp.asarray(np.asarray(conics, np.float32))
    m2d = jnp.asarray(means2d)
    colors = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.95, 0.999, n).astype(np.float32))
    binning = bin_gaussians(
        m2d, jnp.asarray(np.asarray(radii, np.int32)),
        jnp.asarray(rng.uniform(1, 4, n).astype(np.float32)),
        W, H, max_per_tile=64, max_tiles_per_gaussian=256,
    )
    target = jnp.zeros((H, W, 3))

    def loss(fn, m2d, con, cols, op):
        out = fn(binning.tile_lists, m2d, con, cols, op, W, H,
                 binning.num_tiles_x)
        return (
            jnp.mean((out.render - target) ** 2)
            + 0.3 * jnp.mean(out.alpha ** 2)
        )

    g_ref = jax.grad(
        lambda *a: loss(rasterize_tiles, *a), argnums=(0, 1, 2, 3)
    )(m2d, conics, colors, opac)
    g_pal = jax.grad(
        lambda *a: loss(rasterize_tiles_pallas, *a), argnums=(0, 1, 2, 3)
    )(m2d, conics, colors, opac)
    for name, a, b in zip(("means2d", "conics", "colors", "opac"),
                          g_pal, g_ref):
        a, b = np.asarray(a), np.asarray(b)
        denom = max(float(np.abs(b).max()), 1e-12)
        assert np.abs(a - b).max() / denom < 1e-4, (
            f"needle grad mismatch: {name}"
        )


def test_sort_vjp_matches_plan_and_scatter():
    """tile_gather_ranked_sort (big-slab path: no precomputed plan, VJP by
    marker-merged payload sort) matches the plan-gather path and the exact
    id-space scatter in forward values, gradients, and absgrad stats."""
    from qed_splatter_tpu.ops.segment import (
        tile_gather_cm,
        tile_gather_ranked,
        tile_gather_ranked_sort,
    )

    res, colors, opac, binning = _projected(n=192, seed=13)
    packed = jnp.concatenate(
        [res.means2d[0], res.conics[0], colors, opac[:, None]], axis=-1
    )
    tl = binning.tile_lists
    n = packed.shape[0]

    def loss(g):
        return jnp.sum(jnp.sin(g) * g)

    vs, gs = jax.value_and_grad(
        lambda p: loss(tile_gather_cm(p, tl)))(packed)
    vp, gp = jax.value_and_grad(lambda p: loss(tile_gather_ranked(
        p, binning.order, binning.inv_order, binning.tile_ranks,
        binning.slab_perm, binning.slab_bounds)))(packed)
    vo, go = jax.value_and_grad(lambda p: loss(tile_gather_ranked_sort(
        p, binning.order, binning.inv_order, binning.tile_ranks)))(packed)
    np.testing.assert_allclose(float(vo), float(vs), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(go), np.asarray(gs),
                               atol=1e-4, rtol=1e-4)

    # absgrad side-channel: sort path vs plan path
    seed = jnp.zeros((n, 2), jnp.float32)
    _, (gp2, ap) = jax.value_and_grad(
        lambda p, s: loss(tile_gather_ranked(
            p, binning.order, binning.inv_order, binning.tile_ranks,
            binning.slab_perm, binning.slab_bounds, absgrad_seed=s)),
        argnums=(0, 1))(packed, seed)
    _, (go2, ao) = jax.value_and_grad(
        lambda p, s: loss(tile_gather_ranked_sort(
            p, binning.order, binning.inv_order, binning.tile_ranks,
            absgrad_seed=s)), argnums=(0, 1))(packed, seed)
    np.testing.assert_allclose(np.asarray(go2), np.asarray(gp2),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ao), np.asarray(ap),
                               atol=1e-4, rtol=1e-4)


def test_u16_gather_bitexact():
    """The big-slab u16 bitcast gather is BIT-exact vs the f32 row gather
    (it moves the same bits in halves), including negatives, denormals,
    infs and NaN payloads."""
    from qed_splatter_tpu.ops import segment

    res, colors, opac, binning = _projected(n=192, seed=17)
    packed = jnp.concatenate(
        [res.means2d[0], res.conics[0], colors, opac[:, None]], axis=-1
    )
    # inject special values into culled rows to stress the bitcast
    packed = packed.at[0, 0].set(-0.0).at[1, 1].set(jnp.inf)
    packed = packed.at[2, 2].set(1e-42)

    want = segment._ranked_gather_fwd_impl(
        packed, binning.order, binning.tile_ranks)
    try:
        orig = segment.BIG_SLAB_SLOTS
        segment.BIG_SLAB_SLOTS = 1      # force the u16 path
        got = segment._ranked_gather_fwd_impl(
            packed, binning.order, binning.tile_ranks)
    finally:
        segment.BIG_SLAB_SLOTS = orig
    np.testing.assert_array_equal(
        np.asarray(got).view(np.uint32), np.asarray(want).view(np.uint32))
