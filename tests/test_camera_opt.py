"""SE(3) camera-optimizer math tests (SURVEY D10)."""

import numpy as np
import jax.numpy as jnp

from qed_splatter_tpu.models.camera_opt import (
    apply_camera_opt,
    camera_opt_regularizer,
    exp_so3,
)
from qed_splatter_tpu.testing import orbit_c2w_opengl


def test_exp_so3_zero_is_identity():
    R = np.asarray(exp_so3(jnp.zeros(3)))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-6)


def test_exp_so3_axis_angle():
    # pi/2 about z
    R = np.asarray(exp_so3(jnp.asarray([0.0, 0.0, np.pi / 2])))
    want = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    np.testing.assert_allclose(R, want, atol=1e-6)


def test_exp_so3_orthonormal():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    R = np.asarray(exp_so3(w))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)


def test_apply_zero_delta_is_noop():
    c2w = orbit_c2w_opengl(3.0, 0.5, 0.2)
    out = np.asarray(apply_camera_opt(jnp.asarray(c2w), jnp.zeros(6)))
    np.testing.assert_allclose(out, c2w, atol=1e-6)


def test_apply_translation_in_camera_frame():
    c2w = orbit_c2w_opengl(3.0, 0.0, 0.0)
    delta = jnp.asarray([1.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    out = np.asarray(apply_camera_opt(jnp.asarray(c2w), delta))
    # translation delta acts along the camera's local x axis
    np.testing.assert_allclose(
        out[:3, 3] - c2w[:3, 3], c2w[:3, 0], atol=1e-5
    )
    np.testing.assert_allclose(out[:3, :3], c2w[:3, :3], atol=1e-6)


def test_regularizer_scales_with_delta():
    small = camera_opt_regularizer(jnp.full((1, 6), 1e-4))
    big = camera_opt_regularizer(jnp.full((1, 6), 1.0))
    assert float(big) > float(small) > 0.0
