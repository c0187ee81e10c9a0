"""OPENCV_FISHEYE camera support (SURVEY D12 / nerfstudio camera models).

The fisheye (equidistant) model: theta = atan(r), theta_d = theta (1 +
k1 th^2 + ... + k4 th^8), distorted point = x * theta_d / r — cv2.fisheye
semantics. Tested by model properties, a Newton-inverted round trip, and an
end-to-end dataparser load of a synthetic fisheye-captured dataset.
"""

import json
import os

import numpy as np
import pytest

from qed_splatter_tpu.data.undistort import (
    _distort_fisheye,
    undistort_image,
    undistort_map,
)


def _theta_d(theta, k):
    t2 = theta * theta
    return theta * (1 + t2 * (k[0] + t2 * (k[1] + t2 * (k[2] + t2 * k[3]))))


def _invert_fisheye(xd, yd, k, iters=20):
    """Invert the fisheye distortion by Newton iteration on theta."""
    rd = np.sqrt(xd * xd + yd * yd)
    theta = rd.copy()
    for _ in range(iters):
        t2 = theta * theta
        f = _theta_d(theta, k) - rd
        df = 1 + t2 * (3 * k[0] + t2 * (5 * k[1] + t2 * (7 * k[2]
                                                         + t2 * 9 * k[3])))
        theta = theta - f / np.maximum(df, 1e-9)
    r = np.tan(theta)
    scale = np.where(rd > 1e-9, r / np.maximum(rd, 1e-9), 1.0)
    return xd * scale, yd * scale


def test_fisheye_model_properties():
    k = np.zeros(4, np.float32)
    # zero coefficients: distorted radius = atan(r) (equidistant), NOT
    # identity — pure fisheye geometry
    x = np.array([0.5, 1.0, 2.0])
    y = np.zeros(3)
    xd, yd = _distort_fisheye(x, y, k)
    assert np.allclose(xd, np.arctan(x), atol=1e-7)
    assert np.allclose(yd, 0)
    # center fixed point
    xd0, yd0 = _distort_fisheye(np.zeros(1), np.zeros(1), k)
    assert xd0[0] == 0 and yd0[0] == 0
    # rotational symmetry
    ang = 0.7
    xr, yr = 0.8 * np.cos(ang), 0.8 * np.sin(ang)
    xd1, yd1 = _distort_fisheye(np.array([0.8]), np.array([0.0]), k)
    xd2, yd2 = _distort_fisheye(np.array([xr]), np.array([yr]), k)
    assert np.hypot(xd2, yd2)[0] == pytest.approx(xd1[0], rel=1e-6)


def test_fisheye_roundtrip_newton():
    k = np.array([-0.05, 0.01, -0.002, 0.0004], np.float32)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1.0, 1.0, 500)
    y = rng.uniform(-1.0, 1.0, 500)
    xd, yd = _distort_fisheye(x, y, k)
    xu, yu = _invert_fisheye(xd, yd, k)
    assert np.abs(xu - x).max() < 1e-6
    assert np.abs(yu - y).max() < 1e-6


def _make_fisheye_capture(ideal, K, k):
    """Simulate a fisheye camera photographing the scene whose ideal
    pinhole image is ``ideal``: distorted pixel v samples the ideal image
    at the *undistorted* (perspective) location of v."""
    h, w = ideal.shape[:2]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    u, v = np.meshgrid(np.arange(w, dtype=np.float64),
                       np.arange(h, dtype=np.float64))
    xd = (u - cx) / fx
    yd = (v - cy) / fy
    xu, yu = _invert_fisheye(xd, yd, k)
    mx = np.clip(xu * fx + cx, 0, w - 1)
    my = np.clip(yu * fy + cy, 0, h - 1)
    xi = np.rint(mx).astype(int)
    yi = np.rint(my).astype(int)
    return ideal[yi, xi]


def test_undistort_image_recovers_ideal():
    """Fisheye capture of a smooth pattern, undistorted, matches the ideal
    pinhole image away from the boundary."""
    h, w = 96, 128
    k = np.array([-0.02, 0.004, 0.0, 0.0], np.float32)
    K = np.array([[90.0, 0, w / 2], [0, 90.0, h / 2], [0, 0, 1]], np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    ideal = np.stack([
        127 + 100 * np.sin(xx / 9.0),
        127 + 100 * np.cos(yy / 7.0),
        127 + 100 * np.sin((xx + yy) / 11.0),
    ], axis=-1).astype(np.uint8)
    captured = _make_fisheye_capture(ideal, K, k)
    assert np.abs(captured.astype(int) - ideal.astype(int)).mean() > 2
    dist = np.array([*k, 0, 0], np.float32)
    rec = undistort_image(captured, K, dist, camera_model="OPENCV_FISHEYE")
    inner = (slice(16, -16), slice(16, -16))
    err = np.abs(rec[inner].astype(int) - ideal[inner].astype(int))
    assert err.mean() < 6  # bilinear + nearest resampling noise only


def test_fisheye_dataset_end_to_end(tmp_path):
    """transforms.json with camera_model OPENCV_FISHEYE loads through the
    dataparser and the cached image is undistorted toward the ideal."""
    from PIL import Image

    from qed_splatter_tpu.configs import DataConfig
    from qed_splatter_tpu.data.dataset import FullImageDatamanager

    h, w = 80, 112
    k = np.array([-0.03, 0.005, 0.0, 0.0], np.float32)
    f = 80.0
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    ideal = np.stack([
        127 + 100 * np.sin(xx / 8.0),
        127 + 100 * np.cos(yy / 6.0),
        np.full_like(xx, 80),
    ], axis=-1).astype(np.uint8)
    captured = _make_fisheye_capture(ideal, K, k)

    root = tmp_path / "scene"
    (root / "images").mkdir(parents=True)
    Image.fromarray(captured).save(root / "images" / "f0.png")
    meta = {
        "camera_model": "OPENCV_FISHEYE",
        "fl_x": f, "fl_y": f, "cx": w / 2, "cy": h / 2, "w": w, "h": h,
        "k1": float(k[0]), "k2": float(k[1]), "k3": 0.0, "k4": 0.0,
        "frames": [
            {"file_path": "images/f0.png",
             "transform_matrix": np.eye(4).tolist()},
        ],
    }
    (root / "transforms.json").write_text(json.dumps(meta))
    dm = FullImageDatamanager(DataConfig(
        data=str(root), auto_scale_poses=False, center_method="none",
        orientation_method="none", eval_interval=0,
    ))
    item = dm.get_item(0)
    assert item["camera"].distortion is None  # undistorted at cache time
    inner = (slice(14, -14), slice(14, -14))
    got = item["image"][inner].astype(int)
    want = ideal[inner].astype(int)
    raw = captured[inner].astype(int)
    assert np.abs(got - want).mean() < np.abs(raw - want).mean() / 3
