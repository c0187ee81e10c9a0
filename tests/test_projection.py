"""Projection kernel tests: geometry sanity + gradient checks (SURVEY §4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qed_splatter_tpu.ops.projection import (
    ProjectionResult,
    project_gaussians,
    quat_to_rotmat,
)
from qed_splatter_tpu.testing import random_scene, simple_camera


def _project(scene, viewmat, K, w, h, **kw) -> ProjectionResult:
    return project_gaussians(
        jnp.asarray(scene["means"]),
        jnp.asarray(scene["quats"]),
        jnp.asarray(scene["scales"]),
        jnp.asarray(viewmat),
        jnp.asarray(K),
        w,
        h,
        **kw,
    )


def test_quat_to_rotmat_orthonormal():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(32, 4)).astype(np.float32)
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_quat_identity():
    R = np.asarray(quat_to_rotmat(jnp.asarray([1.0, 0.0, 0.0, 0.0])))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-6)


def test_pinhole_projection_of_means():
    scene = random_scene(n=64, seed=2)
    viewmat, K = simple_camera(width=128, height=96, f=100.0)
    res = _project(scene, viewmat, K, 128, 96)
    m = scene["means"]
    want_x = 100.0 * m[:, 0] / m[:, 2] + 64.0
    want_y = 100.0 * m[:, 1] / m[:, 2] + 48.0
    got = np.asarray(res.means2d[0])
    np.testing.assert_allclose(got[:, 0], want_x, atol=1e-3)
    np.testing.assert_allclose(got[:, 1], want_y, atol=1e-3)
    np.testing.assert_allclose(np.asarray(res.depths[0]), m[:, 2], atol=1e-5)


def test_behind_camera_is_culled():
    scene = random_scene(n=16, seed=3)
    scene["means"][:8, 2] = -2.0  # behind
    viewmat, K = simple_camera()
    res = _project(scene, viewmat, K, 64, 48)
    radii = np.asarray(res.radii[0])
    assert (radii[:8] == 0).all()
    assert (radii[8:] > 0).any()


def test_isotropic_gaussian_conic():
    """An isotropic gaussian's 2D covariance is (f*s/z)^2 I + 0.3 I."""
    s, z, f = 0.1, 4.0, 80.0
    scene = dict(
        means=np.array([[0.0, 0.0, z]], dtype=np.float32),
        quats=np.array([[1.0, 0.0, 0.0, 0.0]], dtype=np.float32),
        scales=np.full((1, 3), s, dtype=np.float32),
    )
    viewmat, K = simple_camera(width=64, height=64, f=f)
    res = _project(scene, viewmat, K, 64, 64)
    var = (f * s / z) ** 2 + 0.3
    conic = np.asarray(res.conics[0, 0])
    np.testing.assert_allclose(conic, [1.0 / var, 0.0, 1.0 / var], atol=1e-5)
    # radius = ceil(3 * sqrt(var))
    assert np.asarray(res.radii[0, 0]) == int(np.ceil(3.0 * np.sqrt(var)))


def test_antialiased_compensation_range():
    scene = random_scene(n=64, seed=4, scale_range=(0.001, 0.2))
    viewmat, K = simple_camera()
    res = _project(scene, viewmat, K, 64, 48, antialiased=True)
    comp = np.asarray(res.compensations[0])
    valid = np.asarray(res.valid[0])
    assert (comp[valid] > 0.0).all() and (comp[valid] <= 1.0 + 1e-6).all()
    # tiny gaussians are dominated by the blur -> strong compensation
    tiny = scene["scales"].max(-1) < 0.01
    if (tiny & valid).any():
        assert comp[tiny & valid].mean() < 0.6


@pytest.mark.slow
def test_projection_grads_finite():
    scene = random_scene(n=32, seed=5)
    viewmat, K = simple_camera()

    def loss(means, quats, scales):
        res = project_gaussians(
            means, quats, scales, jnp.asarray(viewmat), jnp.asarray(K), 64, 48
        )
        sel = res.valid[0][:, None]
        return jnp.sum(jnp.where(sel, res.means2d[0], 0.0)) + jnp.sum(
            jnp.where(sel, res.conics[0], 0.0)
        )

    g = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(scene["means"]),
        jnp.asarray(scene["quats"]),
        jnp.asarray(scene["scales"]),
    )
    for arr in g:
        assert np.isfinite(np.asarray(arr)).all()
        assert np.abs(np.asarray(arr)).sum() > 0


def test_zero_quat_gradients_finite():
    """A zero quaternion (e.g. a zero-padded dead capacity slot) must not
    produce NaN gradients: sqrt(max(|q|^2, eps)) keeps the backward finite
    where maximum(norm(q), eps) does not. Regression for the step-1600
    capacity-growth NaN blowup."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from qed_splatter_tpu.ops.projection import quat_to_rotmat

    quats = jnp.asarray([[1.0, 0, 0, 0], [0.0, 0, 0, 0]])

    def f(q):
        return jnp.sum(quat_to_rotmat(q) ** 2)

    g = jax.grad(f)(quats)
    assert np.isfinite(np.asarray(g)).all()
