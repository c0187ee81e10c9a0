"""Golden-value tests for the OpenGL->OpenCV view-matrix math.

Covers reference get_viewmat (model.py:22-38) and the init-tool pose
conversion (create_init_pointcloud.py:59-68), which must agree.
"""

import numpy as np
import jax.numpy as jnp

from qed_splatter_tpu.ops.camera import (
    get_viewmat,
    opengl_c2w_to_opencv_w2c,
)
from qed_splatter_tpu.testing import orbit_c2w_opengl


def _reference_viewmat(c2w: np.ndarray) -> np.ndarray:
    """Literal transcription of reference model.py:22-38 in numpy."""
    R = c2w[:3, :3] * np.array([1.0, -1.0, -1.0])
    T = c2w[:3, 3:4]
    R_inv = R.T
    T_inv = -R_inv @ T
    out = np.zeros((4, 4), dtype=np.float64)
    out[3, 3] = 1.0
    out[:3, :3] = R_inv
    out[:3, 3:4] = T_inv
    return out


def test_get_viewmat_matches_reference_formula():
    rng = np.random.default_rng(0)
    for _ in range(10):
        az, el = rng.uniform(-np.pi, np.pi), rng.uniform(-1.0, 1.0)
        c2w = orbit_c2w_opengl(4.0, az, el).astype(np.float64)
        got = np.asarray(get_viewmat(jnp.asarray(c2w[None, :3, :4]))[0])
        want = _reference_viewmat(c2w)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_get_viewmat_matches_init_tool_conversion():
    """model.py flip-inverse == create_init_pointcloud.py:59-68 inv(flip(c2w))."""
    c2w = orbit_c2w_opengl(2.0, 0.7, 0.2)
    a = np.asarray(get_viewmat(jnp.asarray(c2w[None]))[0])
    b = opengl_c2w_to_opencv_w2c(c2w)
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_viewmat_is_rigid_inverse():
    c2w = orbit_c2w_opengl(3.0, 1.1, -0.4)
    w2c = np.asarray(get_viewmat(jnp.asarray(c2w[None]))[0])
    # Flipped c2w @ w2c == identity
    flipped = c2w.copy().astype(np.float64)
    flipped[:3, 1:3] *= -1
    np.testing.assert_allclose(flipped @ w2c, np.eye(4), atol=1e-5)


def test_camera_looks_at_target():
    """A point at the orbit target must project to camera +z axis."""
    target = np.array([0.3, -0.2, 3.0])
    c2w = orbit_c2w_opengl(5.0, 0.9, 0.3, target=target)
    w2c = np.asarray(get_viewmat(jnp.asarray(c2w[None]))[0])
    p = w2c[:3, :3] @ target + w2c[:3, 3]
    assert p[2] > 4.9  # in front, ~radius away
    np.testing.assert_allclose(p[:2], 0.0, atol=1e-4)


def test_rescaled_floors_odd_dimensions():
    """Camera.rescaled must FLOOR dims like the image downscalers (round()
    desynced camera 68 vs image 67 at 135/2, crashing the loss)."""
    from qed_splatter_tpu.ops.camera import Camera

    cam = Camera(fx=100.0, fy=100.0, cx=67.5, cy=50.5, width=135, height=101,
                 c2w=np.eye(4, dtype=np.float32)[:3])
    half = cam.rescaled(0.5)
    assert (half.width, half.height) == (67, 50)
