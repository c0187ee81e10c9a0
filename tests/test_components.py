"""Bilateral grid, crop box, undistortion component tests (SURVEY D8/D11/D12)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qed_splatter_tpu.models.bilateral_grid import (
    apply_bilateral_grid,
    init_bilateral_grids,
    total_variation_loss,
)
from qed_splatter_tpu.models.crop import CropBox, get_empty_outputs
from qed_splatter_tpu.data.undistort import undistort_image, undistort_map


def test_bilateral_identity_is_noop():
    grids = init_bilateral_grids(2)
    rgb = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (24, 32, 3)).astype(np.float32)
    )
    out = apply_bilateral_grid(grids[0], rgb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(rgb), atol=1e-5)


def test_bilateral_tv_zero_for_identity():
    grids = init_bilateral_grids(2)
    assert float(total_variation_loss(grids)) == 0.0


@pytest.mark.slow
def test_bilateral_grad_flows():
    grids = init_bilateral_grids(1)
    rgb = jnp.full((16, 16, 3), 0.5)
    target = jnp.full((16, 16, 3), 0.8)

    def loss(g):
        return jnp.mean((apply_bilateral_grid(g[0], rgb) - target) ** 2)

    g = jax.grad(loss)(grids)
    assert float(jnp.abs(g).sum()) > 0
    # a few optimization steps reduce the loss
    cur = grids
    for _ in range(100):
        cur = cur - 5.0 * jax.grad(loss)(cur)
    assert float(loss(cur)) < float(loss(grids)) * 0.5


def test_crop_box_axis_aligned():
    box = CropBox(center=(0, 0, 0), size=(2, 2, 2))
    pts = jnp.asarray([[0.0, 0, 0], [0.99, 0, 0], [1.01, 0, 0], [0, 3, 0]])
    got = np.asarray(box.within(pts))
    np.testing.assert_array_equal(got, [True, True, False, False])


def test_crop_box_rotated():
    # box rotated 45 deg about z: point (1.2, 0, 0) is inside the rotated
    # box of half-diagonal sqrt(2) but outside the axis-aligned unit box
    c, s = np.cos(np.pi / 4), np.sin(np.pi / 4)
    R = (c, -s, 0.0, s, c, 0.0, 0.0, 0.0, 1.0)
    box = CropBox(center=(0, 0, 0), size=(2, 2, 2), rotation=R)
    pts = jnp.asarray([[1.2, 0.0, 0.0], [1.2, 1.2, 0.0]])
    got = np.asarray(box.within(pts))
    np.testing.assert_array_equal(got, [True, False])


def test_empty_outputs_shape():
    out = get_empty_outputs(32, 24, jnp.asarray([0.1, 0.2, 0.3]))
    assert out["rgb"].shape == (24, 32, 3)
    np.testing.assert_allclose(np.asarray(out["rgb"][0, 0]), [0.1, 0.2, 0.3])
    assert float(out["accumulation"].max()) == 0.0


def test_undistort_zero_coeffs_identity():
    img = (np.random.default_rng(1).uniform(0, 255, (24, 32, 3))).astype(
        np.uint8
    )
    K = np.array([[30.0, 0, 16], [0, 30.0, 12], [0, 0, 1]])
    out = undistort_image(img, K, np.zeros(6))
    np.testing.assert_array_equal(out, img)


def test_undistort_center_fixed_point():
    """The principal point maps to itself for radial distortion."""
    K = np.array([[40.0, 0, 16], [0, 40.0, 12], [0, 0, 1]])
    mx, my = undistort_map(32, 24, K, np.array([0.2, 0.05, 0, 0, 0, 0]))
    np.testing.assert_allclose(mx[12, 16], 16.0, atol=1e-6)
    np.testing.assert_allclose(my[12, 16], 12.0, atol=1e-6)
    # barrel distortion pushes border pixels outward in the source
    assert mx[12, 31] > 31.0


@pytest.mark.slow
def test_train_step_with_bilateral_grid():
    from qed_splatter_tpu.configs import ModelConfig, default_optimizers
    from qed_splatter_tpu.engine.optim import GroupOptimizers
    from qed_splatter_tpu.engine.train_step import (
        init_train_state,
        make_train_step,
    )
    from qed_splatter_tpu.models.gaussians import init_random
    from qed_splatter_tpu.testing import orbit_c2w_opengl

    W, H = 48, 32
    cfg = ModelConfig(
        use_bilateral_grid=True, background_color="black",
        max_per_tile=64, bilateral_grid_shape=(8, 8, 4),
    )
    gp = init_random(num_points=64, capacity=128, random_scale=2.0, seed=0)
    optims = GroupOptimizers(default_optimizers())
    state = init_train_state(gp, optims, num_cameras=2,
                             use_bilateral_grid=True,
                             bilateral_grid_shape=(8, 8, 4))
    assert state.bilateral_grids.shape == (2, 8, 8, 4, 12)
    fn = make_train_step(cfg, optims, W, H, has_depth=False)
    K = jnp.asarray(np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]],
                             np.float32))
    batch = dict(
        c2w=jnp.asarray(orbit_c2w_opengl(3.0, 0.1, 0.1, (0, 0, 0))),
        K=K, cam_idx=jnp.asarray(0, jnp.int32),
        rgb=jnp.full((H, W, 3), 0.4),
    )
    before = np.asarray(state.bilateral_grids)  # copy before donation
    s2, m = fn(state, batch, jax.random.PRNGKey(0))
    assert "tv_loss" in m
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(np.asarray(s2.bilateral_grids)).all()
    assert s2.bilateral_grids.shape == before.shape


@pytest.mark.slow
def test_render_with_crop_box():
    from qed_splatter_tpu.configs import ModelConfig
    from qed_splatter_tpu.models.gaussians import init_from_points
    from qed_splatter_tpu.models.splatfacto import render
    from qed_splatter_tpu.testing import orbit_c2w_opengl

    pts = np.array([[0.0, 0.0, 3.0], [0.8, 0.0, 3.0]], np.float32)
    gp = init_from_points(pts, None, capacity=64)
    gp = gp.replace(opacities=jnp.full_like(gp.opacities, 3.0),
                    scales=jnp.full_like(gp.scales, np.log(0.3)))
    cfg = ModelConfig(background_color="black", camera_opt_mode="off",
                      max_per_tile=32)
    c2w = jnp.asarray(orbit_c2w_opengl(3.0, 0.0, 0.0, (0, 0, 3.0)))
    K = jnp.asarray(np.array([[40.0, 0, 32], [0, 40.0, 24], [0, 0, 1]],
                             np.float32))
    box = CropBox(center=(0, 0, 3.0), size=(1, 1, 1))
    full = render(gp, c2w, K, 64, 48, cfg, step=jnp.asarray(0), train=False)
    crop = render(gp, c2w, K, 64, 48, cfg, step=jnp.asarray(0), train=False,
                  crop_box=box)
    # cropping removed at least the off-center gaussian's contribution
    assert float(crop.accumulation.sum()) <= float(full.accumulation.sum())
    assert int(crop.visible.sum()) < int(full.visible.sum())


def test_chip_lock_mutual_exclusion(tmp_path, monkeypatch):
    """Two clients must never share the accelerator (round-3: a worker
    crash in one silently hangs the other). flock-based: stale locks are
    impossible because the kernel releases on process death."""
    import qed_splatter_tpu.utils.chiplock as cl

    monkeypatch.setenv("QED_CHIP_LOCK", str(tmp_path / "chip.lock"))
    # pretend an accelerator is present so the lock engages on CPU
    monkeypatch.setattr(cl, "accelerator_present", lambda: True)
    assert cl.acquire_chip_lock("test-a")
    # a second process: simulate by clearing the module-level handle while
    # keeping the flock alive through a duplicate fd
    held = cl._LOCK
    cl._LOCK = None
    try:
        import pytest

        with pytest.raises(cl.ChipBusy, match="test-a"):
            cl.acquire_chip_lock("test-b")
        assert cl.acquire_chip_lock("test-b", required=False) is False
    finally:
        cl._LOCK = held
        cl.release_chip_lock()
    # after release: acquirable again
    assert cl.acquire_chip_lock("test-c")
    cl.release_chip_lock()
