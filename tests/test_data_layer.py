"""Data layer tests: PLY IO/color semantics, transforms.json parsing,
datamanager, init-pointcloud tool (SURVEY §4 golden-value items 2-3)."""

import json

import numpy as np
import pytest

from qed_splatter_tpu.configs import DataConfig
from qed_splatter_tpu.data.dataset import FullImageDatamanager, load_depth
from qed_splatter_tpu.data.init_pc import InitPcArgs, main as init_pc_main
from qed_splatter_tpu.data.ply import PlyData, read_ply, write_ply
from qed_splatter_tpu.data.transforms_json import (
    auto_orient_and_center_poses,
    parse_transforms,
)
from qed_splatter_tpu.testing import orbit_c2w_opengl, write_synthetic_dataset


# ---------------------------------------------------------------- PLY


def test_ply_roundtrip_binary(tmp_path):
    pts = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
    cols = np.random.default_rng(1).integers(0, 255, (100, 3)).astype(np.uint8)
    write_ply(tmp_path / "a.ply", pts, cols)
    back = read_ply(tmp_path / "a.ply")
    np.testing.assert_allclose(back.positions, pts, atol=1e-6)
    np.testing.assert_array_equal(back.colors, cols)


def test_ply_float_colors_become_uint8(tmp_path):
    """Open3D tensor-API float colors in [0,1] -> uint8
    (reference dataparser.py:58-74 fix)."""
    pts = np.zeros((4, 3), np.float32)
    cols = np.array([[0.0, 0.5, 1.0]] * 4, np.float32)
    write_ply(tmp_path / "f.ply", pts, cols)
    back = read_ply(tmp_path / "f.ply")
    np.testing.assert_array_equal(back.colors[0], [0, 127, 255])


def test_ply_ascii_read(tmp_path):
    body = (
        "ply\nformat ascii 1.0\nelement vertex 2\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "end_header\n1 2 3 255 0 0\n4 5 6 0 255 0\n"
    )
    (tmp_path / "a.ply").write_text(body)
    p = read_ply(tmp_path / "a.ply")
    np.testing.assert_allclose(p.positions, [[1, 2, 3], [4, 5, 6]])
    np.testing.assert_array_equal(p.colors, [[255, 0, 0], [0, 255, 0]])


def test_ply_missing_colors_zero(tmp_path):
    write_ply(tmp_path / "n.ply", np.ones((5, 3), np.float32))
    p = read_ply(tmp_path / "n.ply")
    assert p.colors is None
    np.testing.assert_array_equal(p.colors_uint8(), np.zeros((5, 3), np.uint8))


# ------------------------------------------------- pose normalization


def test_orient_up_aligns_mean_up():
    poses = np.stack(
        [orbit_c2w_opengl(3.0, a, 0.3).astype(np.float64)
         for a in np.linspace(-0.5, 0.5, 8)]
    )
    t = auto_orient_and_center_poses(poses, "up", "poses")
    new = (np.concatenate([t, [[0, 0, 0, 1]]], 0)[None] @ poses)
    up = new[:, :3, 1].mean(0)
    up /= np.linalg.norm(up)
    np.testing.assert_allclose(up, [0, 0, 1], atol=1e-6)
    # centered
    np.testing.assert_allclose(new[:, :3, 3].mean(0), 0.0, atol=1e-8)


def test_orient_vertical_recovers_gravity():
    """"vertical" (reference README.md:20-25 knob list) must recover the
    true gravity axis from the camera RIGHT axes even when every camera
    pitches up/down (mean-up biased away from vertical), as long as the
    cameras do not roll — the hand-held regime the method exists for."""
    rng = np.random.default_rng(3)
    true_vertical = np.array([0.1, -0.2, 0.97])
    true_vertical /= np.linalg.norm(true_vertical)
    poses = []
    for _ in range(12):
        # a level camera frame w.r.t. true_vertical, then pitch it up by a
        # common positive angle (biases mean-up, keeps x horizontal)
        fwd = rng.normal(0, 1, 3)
        fwd -= true_vertical * (fwd @ true_vertical)
        fwd /= np.linalg.norm(fwd)
        right = np.cross(fwd, true_vertical)
        right /= np.linalg.norm(right)
        pitch = 0.5 + 0.2 * rng.uniform()  # all cameras look upward
        fwd_p = np.cos(pitch) * fwd + np.sin(pitch) * true_vertical
        up_p = np.cross(right, fwd_p)
        c2w = np.eye(4)
        c2w[:3, 0] = right
        c2w[:3, 1] = up_p
        c2w[:3, 2] = -fwd_p  # OpenGL: camera looks down -z
        c2w[:3, 3] = rng.normal(0, 1, 3)
        poses.append(c2w)
    poses = np.stack(poses)

    t_up = auto_orient_and_center_poses(poses, "up", "none")
    t_vert = auto_orient_and_center_poses(poses, "vertical", "none")
    # "up" is biased by the common pitch; "vertical" recovers gravity
    assert np.linalg.norm(t_up[:3, :3] @ true_vertical - [0, 0, 1]) > 0.3
    np.testing.assert_allclose(
        t_vert[:3, :3] @ true_vertical, [0, 0, 1], atol=1e-6
    )


def test_orient_vertical_degenerate_falls_back_to_up():
    """All-parallel x-axes (a pure camera sweep) leave gravity unobservable
    from the right axes; "vertical" must then behave like "up"."""
    poses = np.stack(
        [orbit_c2w_opengl(3.0, 0.0, 0.3).astype(np.float64)] * 6
    )
    t_up = auto_orient_and_center_poses(poses, "up", "none")
    t_vert = auto_orient_and_center_poses(poses, "vertical", "none")
    np.testing.assert_allclose(t_vert, t_up, atol=1e-9)


def test_orient_none_identity():
    poses = np.stack(
        [orbit_c2w_opengl(3.0, a, 0.1).astype(np.float64) for a in (0.0, 0.4)]
    )
    t = auto_orient_and_center_poses(poses, "none", "none")
    np.testing.assert_allclose(t, np.eye(4)[:3], atol=1e-12)


# ---------------------------------------------------- transforms.json


@pytest.fixture()
def dataset(tmp_path):
    write_synthetic_dataset(tmp_path, num_frames=6, with_ply=True)
    return tmp_path


def test_parse_transforms_basic(dataset):
    cfg = DataConfig(data=str(dataset))
    scene = parse_transforms(cfg)
    assert len(scene.frames) == 6
    assert scene.points is not None and scene.points_rgb is not None
    assert scene.points_rgb.dtype == np.uint8
    cam = scene.frames[0].camera
    assert (cam.width, cam.height) == (64, 48)
    # auto-scale pulls camera origins into the unit box
    origins = np.stack([f.camera.c2w[:3, 3] for f in scene.frames])
    assert np.abs(origins).max() <= 1.0 + 1e-5


def test_parse_transforms_unscaled_mode(dataset):
    """The reference's unscaled-scene switches (dataparser.py:16-18)."""
    cfg = DataConfig(
        data=str(dataset), auto_scale_poses=False,
        center_method="none", orientation_method="none",
    )
    scene = parse_transforms(cfg)
    assert scene.scale_factor == 1.0
    with open(dataset / "transforms.json") as f:
        raw = json.load(f)
    orig = np.array(raw["frames"][0]["transform_matrix"])[:3, 3]
    np.testing.assert_allclose(scene.frames[0].camera.c2w[:3, 3], orig,
                               atol=1e-6)


def test_applied_transform_composed_into_ply_points(dataset):
    """`applied_transform` (ns-process-data/COLMAP datasets) must be composed
    into the dataparser transform before seed-point loading and before the
    recorded transform_matrix (nerfstudio semantics; ADVICE r1, medium)."""
    with open(dataset / "transforms.json") as f:
        raw = json.load(f)
    # baseline: no applied_transform
    base = parse_transforms(DataConfig(data=str(dataset)))
    # add a COLMAP-style axis-swap applied_transform; poses stay identical
    # (they are already in the applied frame), but the PLY lives in the
    # ORIGINAL frame, so the parser must push its points through A first.
    A = np.array(
        [[0.0, 1.0, 0.0, 0.0],
         [1.0, 0.0, 0.0, 0.0],
         [0.0, 0.0, -1.0, 0.0]]
    )
    raw["applied_transform"] = A.tolist()
    with open(dataset / "transforms.json", "w") as f:
        json.dump(raw, f)
    scene = parse_transforms(DataConfig(data=str(dataset)))
    # poses: unchanged (applied_transform does not touch them)
    np.testing.assert_allclose(
        scene.frames[0].camera.c2w, base.frames[0].camera.c2w, atol=1e-6
    )
    # recorded transform: composed with A
    t44 = np.eye(4)
    t44[:3, :4] = base.transform_matrix
    a44 = np.eye(4)
    a44[:3, :4] = A
    expect = (t44 @ a44)[:3, :4]
    np.testing.assert_allclose(scene.transform_matrix, expect, atol=1e-6)
    # seed points: original-frame points mapped through A then the base
    # transform + scale equals the new parser output
    ply_base = base.points / base.scale_factor  # undo scale
    # base path applied only the base transform; recover raw ply points
    R, t = base.transform_matrix[:3, :3], base.transform_matrix[:3, 3]
    raw_pts = (ply_base - t) @ np.linalg.inv(R).T
    mapped = raw_pts @ A[:3, :3].T + A[:3, 3]
    expect_pts = (mapped @ R.T + t) * scene.scale_factor
    np.testing.assert_allclose(scene.points, expect_pts, atol=1e-4)


def test_split_fraction(dataset):
    cfg = DataConfig(data=str(dataset), train_split_fraction=0.5)
    scene = parse_transforms(cfg)
    assert len(scene.train_indices) == 3
    assert len(scene.eval_indices) == 3
    assert not set(scene.train_indices) & set(scene.eval_indices)


def test_split_interval(dataset):
    cfg = DataConfig(data=str(dataset), eval_mode="interval", eval_interval=3)
    scene = parse_transforms(cfg)
    assert list(scene.eval_indices) == [0, 3]
    assert len(scene.train_indices) == 4


# --------------------------------------------------------- datamanager


def test_datamanager_batches(dataset):
    cfg = DataConfig(data=str(dataset))
    dm = FullImageDatamanager(cfg)
    seen = set()
    for step in range(dm.num_train):
        item = dm.next_train(step)
        seen.add(item["cam_idx"])
        assert item["image"].dtype == np.uint8
        assert item["image"].shape == (48, 64, 3)
        d = item["depth_image"]
        assert d.shape == (48, 64, 1) and d.dtype == np.float32
        # depth scaled mm -> m then by pose scale factor
        raw = load_depth(
            dm.scene.frames[item["cam_idx"]].depth_path
        )
        np.testing.assert_allclose(
            d[..., 0], raw * 0.001 * dm.scene.scale_factor, rtol=1e-5
        )
    assert seen == set(dm.scene.train_indices)  # epoch covers all cameras


# ------------------------------------------------------------ init tool


def test_init_pc_backproject_and_colorize(tmp_path):
    write_synthetic_dataset(tmp_path, num_frames=4, with_ply=False)
    args = InitPcArgs(
        data=str(tmp_path), stride=2, frame_voxel_size=0.05, voxel_size=0.05
    )
    out = init_pc_main(args, log=lambda *a: None)
    assert out.exists()
    pc = read_ply(out)
    assert len(pc) > 100
    # points should live around the synthetic depth surface (z in [2, 2.8]
    # along each camera ray; world z near 3-ish region)
    assert np.isfinite(pc.positions).all()
    # transforms.json updated (reference :509-510)
    with open(tmp_path / "transforms.json") as f:
        meta = json.load(f)
    assert meta["ply_file_path"] == "sparse_pc.ply"

    # resume: rerun reuses cache without error
    out2 = init_pc_main(args, log=lambda *a: None)
    assert out2 == out

    # colorize mode
    args2 = InitPcArgs(data=str(tmp_path), colorize=True)
    out3 = init_pc_main(args2, log=lambda *a: None)
    pc3 = read_ply(out3)
    assert pc3.colors is not None
    assert (pc3.colors.sum(-1) > 0).mean() > 0.5  # most points got color


def test_backproject_geometry(tmp_path):
    """Backprojected points must reproject onto the depth surface."""
    import jax.numpy as jnp

    from qed_splatter_tpu.ops.backproject import backproject_depth

    h, w, f = 24, 32, 40.0
    depth = np.full((h, w), 2.0, np.float32)
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    c2w = np.eye(4, dtype=np.float32)
    pts, valid = backproject_depth(jnp.asarray(depth), K, c2w, 100.0, stride=1)
    pts = np.asarray(pts)[np.asarray(valid)]
    assert len(pts) == h * w
    np.testing.assert_allclose(pts[:, 2], 2.0, atol=1e-5)
    # central pixel maps near optical axis
    center = pts[(h // 2) * w + w // 2]
    assert abs(center[0]) < 0.1 and abs(center[1]) < 0.1


def test_gaussian_dataset_teacher_not_truncated(tmp_path):
    """write_gaussian_dataset must composite every teacher gaussian: per-tile
    K truncation prints 16-px tile-boundary banding into the GT (found as an
    unfittable-artifact densification explosion in a full-budget run)."""
    import numpy as np
    from PIL import Image

    from qed_splatter_tpu import testing

    testing.write_gaussian_dataset(tmp_path, num_frames=1, width=160,
                                   height=104, num_teacher=800, seed=7)
    img = np.asarray(Image.open(tmp_path / "images" / "frame_0000.png"))
    g = img.astype(np.float32).mean(-1)
    rd = np.abs(np.diff(g, axis=0))
    at_boundary = rd[15::16].mean()
    elsewhere = np.delete(rd, slice(15, None, 16), axis=0).mean()
    assert at_boundary < 2.0 * elsewhere + 0.5, (
        f"tile banding: boundary row-diff {at_boundary:.2f} vs "
        f"{elsewhere:.2f} elsewhere"
    )


@pytest.mark.slow
def test_chunked_exact_render_matches_naive_oracle():
    """The dataset writer's chunked over-operator compositing must equal the
    brute-force full-sort oracle — i.e., zero truncation artifacts by
    construction."""
    import jax.numpy as jnp
    import numpy as np

    from qed_splatter_tpu.configs import ModelConfig
    from qed_splatter_tpu.models.gaussians import init_from_points
    from qed_splatter_tpu.models.splatfacto import render
    from qed_splatter_tpu.ops.camera import get_viewmat
    from qed_splatter_tpu.ops.naive import rasterize_naive
    from qed_splatter_tpu.ops.projection import project_gaussians
    from qed_splatter_tpu.ops.sh import eval_sh_colors
    from qed_splatter_tpu.testing import orbit_c2w_opengl

    W, H, N, CH = 64, 48, 192, 48  # chunk smaller than N -> 4 chunks
    rng = np.random.default_rng(3)
    pts = rng.uniform(-0.8, 0.8, (N, 3)).astype(np.float32)
    pts[:, 2] = pts[:, 2] * 0.5 + 3.0
    cols = (rng.uniform(0, 1, (N, 3)) * 255).astype(np.uint8)
    teacher = init_from_points(pts, cols, capacity=N)
    teacher = teacher.replace(
        scales=jnp.minimum(teacher.scales + 0.7, np.log(0.3)),
        opacities=jnp.full_like(teacher.opacities, 3.0),
    )
    cfg = ModelConfig(background_color="black", camera_opt_mode="off",
                      max_per_tile=CH)
    f = 0.75 * max(W, H)
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    c2w = np.asarray(orbit_c2w_opengl(2.6, 0.2, 0.1, (0, 0, 3.0)),
                     np.float32)

    # chunked over-operator compositing, as in write_gaussian_dataset
    viewmat = np.asarray(get_viewmat(jnp.asarray(c2w)[None]))[0]
    z = (pts @ viewmat[:3, :3].T + viewmat[:3, 3])[:, 2]
    order = np.argsort(z)
    total_rgb = np.zeros((H, W, 3), np.float32)
    total_depth = np.zeros((H, W), np.float32)
    transmit = np.ones((H, W), np.float32)
    for s0 in range(0, N, CH):
        alive = np.zeros(N, bool)
        alive[order[s0:s0 + CH]] = True
        chunk = teacher.replace(alive=jnp.asarray(alive))
        out = render(chunk, jnp.asarray(c2w), jnp.asarray(K), W, H, cfg,
                     step=jnp.asarray(10_000), train=False)
        acc_c = np.asarray(out.accumulation[..., 0])
        total_rgb += transmit[..., None] * np.asarray(out.rgb)
        total_depth += transmit * np.where(
            acc_c > 0, np.asarray(out.depth[..., 0]), 0.0)
        transmit *= 1.0 - acc_c

    # oracle: every gaussian, global depth sort, no caps
    proj = project_gaussians(
        teacher.means, teacher.quats, jnp.exp(teacher.scales),
        jnp.asarray(get_viewmat(jnp.asarray(c2w)[None])),
        jnp.asarray(K)[None], W, H,
    )
    sh = eval_sh_colors(
        jnp.concatenate([teacher.features_dc[:, None, :],
                         teacher.features_rest], axis=1),
        teacher.means, jnp.asarray(c2w[:3, 3]),
        jnp.asarray(10, jnp.int32), 3,
    )
    channels = jnp.concatenate([sh, proj.depths[0][:, None]], axis=-1)
    opac = jax_sigmoid(teacher.opacities) * proj.compensations[0]
    oracle = rasterize_naive(
        proj.means2d[0], proj.conics[0], channels, opac, proj.depths[0],
        proj.radii[0], W, H,
    )
    # per-chunk rgb clipping (slightly negative SH colors) and depth-tie
    # ordering between chunks leave sub-quantization residue: bound by one
    # uint8 level (the GT is stored as uint8 anyway)
    np.testing.assert_allclose(total_rgb, np.asarray(oracle.render[..., :3]),
                               atol=1.0 / 255.0)
    np.testing.assert_allclose(total_depth,
                               np.asarray(oracle.render[..., 3]), atol=2e-2)
    np.testing.assert_allclose(1.0 - transmit,
                               np.asarray(oracle.alpha[..., 0]), atol=4e-3)


def jax_sigmoid(x):
    import jax

    return jax.nn.sigmoid(x)


def test_explicit_split_filenames(tmp_path):
    """nerfstudio's optional train_filenames/val_filenames lists override
    the eval_mode split heuristics."""
    import json

    from qed_splatter_tpu.configs import DataConfig
    from qed_splatter_tpu.data.transforms_json import parse_transforms

    from qed_splatter_tpu import testing

    testing.write_gaussian_dataset(tmp_path, num_frames=6, width=32,
                                   height=24, num_teacher=64, seed=0,
                                   eval_every=3)
    meta = json.loads((tmp_path / "transforms.json").read_text())
    assert len(meta["val_filenames"]) == 2      # frames 0, 3
    assert len(meta["train_filenames"]) == 4
    scene = parse_transforms(DataConfig(data=str(tmp_path)))
    assert sorted(scene.eval_indices.tolist()) == [0, 3]
    assert sorted(scene.train_indices.tolist()) == [1, 2, 4, 5]


def test_room_dataset_cross_view_consistency(tmp_path):
    """write_room_dataset: analytic depth must be multi-view consistent —
    backprojected points from one view reproject onto matching depth in
    another (occlusions excepted)."""
    import json

    import numpy as np

    from qed_splatter_tpu import testing

    testing.write_room_dataset(tmp_path, num_frames=6, width=128, height=84,
                               seed=1)
    meta = json.loads((tmp_path / "transforms.json").read_text())
    d1 = np.load(tmp_path / "depth" / "frame_0001.npy") / 1000.0
    d2 = np.load(tmp_path / "depth" / "frame_0002.npy") / 1000.0
    c1 = np.asarray(meta["frames"][1]["transform_matrix"])
    c2 = np.asarray(meta["frames"][2]["transform_matrix"])
    f, cx, cy = meta["fl_x"], meta["cx"], meta["cy"]
    H, W = d1.shape
    u, v = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    dirs = np.stack([(u - cx) / f, -(v - cy) / f, -np.ones_like(u)],
                    -1).reshape(-1, 3)
    pts = c1[:3, 3] + d1.reshape(-1, 1) * (dirs @ c1[:3, :3].T)
    pc = (pts - c2[:3, 3]) @ c2[:3, :3]
    z = -pc[:, 2]
    uu = f * (pc[:, 0] / z) + cx
    vv = f * (-pc[:, 1] / z) + cy
    ok = (z > 0.05) & (uu >= 0) & (uu < W - 1) & (vv >= 0) & (vv < H - 1)
    assert ok.sum() > 500
    samp = d2[np.round(vv[ok]).astype(int), np.round(uu[ok]).astype(int)]
    consistent = (np.abs(samp - z[ok]) < 0.05).mean()
    assert consistent > 0.6  # the rest are genuinely occluded
    assert (d1 > 0).all()    # closed room: every ray hits a surface


def test_colorize_points_oracle():
    """Batched device colorize == per-point numpy reasoning: depth-consistent
    points take the pixel color, occluded/out-of-frame points stay uncolored."""
    import jax.numpy as jnp

    from qed_splatter_tpu.ops.backproject import colorize_points

    h, w = 24, 32
    K = np.array([[20.0, 0, 16.0], [0, 20.0, 12.0], [0, 0, 1.0]], np.float32)
    # camera at origin looking +z (OpenCV w2c = identity)
    w2c = np.eye(4, dtype=np.float32)
    depth = np.full((h, w), 2.0, np.float32)
    img = np.zeros((h, w, 3), np.float32)
    img[:, :16] = (1.0, 0.0, 0.0)   # left half red
    img[:, 16:] = (0.0, 1.0, 0.0)   # right half green

    pts = np.array([
        [-0.5, 0.0, 2.0],   # projects left at consistent depth -> red
        [0.5, 0.0, 2.0],    # right -> green
        [0.0, 0.0, 3.0],    # behind the measured surface -> rejected
        [5.0, 0.0, 2.0],    # projects out of frame -> rejected
        [0.0, 0.0, -1.0],   # behind the camera -> rejected
    ], np.float32)
    s, c = colorize_points(
        jnp.asarray(pts), jnp.asarray(img[None]), jnp.asarray(depth[None]),
        jnp.asarray(w2c[None]), jnp.asarray(K[None]),
        jnp.float32(10.0), jnp.float32(0.05), jnp.float32(0.02),
    )
    s, c = np.asarray(s), np.asarray(c)
    assert c.tolist() == [1, 1, 0, 0, 0]
    assert np.allclose(s[0], (1, 0, 0))
    assert np.allclose(s[1], (0, 1, 0))


def test_streaming_merge_respects_budget(tmp_path):
    """The accumulator re-voxelizes whenever it exceeds max_points."""
    from qed_splatter_tpu.data.init_pc import streaming_merge
    from qed_splatter_tpu.data.ply import write_ply

    rng = np.random.default_rng(0)
    paths = []
    for i in range(4):
        pts = rng.uniform(0, 1.0, (500, 3)).astype(np.float32)
        p = tmp_path / f"c{i}.ply"
        write_ply(p, pts)
        paths.append(p)
    msgs = []
    merged = streaming_merge(paths, voxel_size=0.05, max_points=600,
                             log=msgs.append)
    # re-voxelization fired each time the accumulator crossed the budget
    # (best-effort: a fixed voxel size bounds density, not count — same
    # contract as the reference's over-budget downsample)
    assert len(msgs) >= 2 and all("re-voxelized" in m for m in msgs)
    assert len(merged) < 2000  # 2000 raw points, deduped by voxel passes
    assert merged.min() >= 0.0 and merged.max() <= 1.0


def test_forest_dataset_consistency_and_unscaled_frame(tmp_path):
    """write_forest_dataset (BASELINE config #4 class): depth must be
    multi-view consistent in the UNSCALED odometry frame (poses carry the
    world offset; depths are frame-local z along the ray), sky pixels get
    depth 0 (masked by the depth loss), and the scene must sit at real
    outdoor scale in meters, off-origin."""
    import json

    import numpy as np

    from qed_splatter_tpu import testing

    testing.write_forest_dataset(tmp_path, num_frames=6, width=128,
                                 height=72, seed=2, eval_every=3)
    meta = json.loads((tmp_path / "transforms.json").read_text())
    assert len(meta["val_filenames"]) == 2
    d1 = np.load(tmp_path / "depth" / "frame_0001.npy") / 1000.0
    d2 = np.load(tmp_path / "depth" / "frame_0002.npy") / 1000.0
    c1 = np.asarray(meta["frames"][1]["transform_matrix"])
    c2 = np.asarray(meta["frames"][2]["transform_matrix"])
    # unscaled odometry frame: camera positions off-origin, meters-scale
    assert np.linalg.norm(c1[:3, 3]) > 5.0
    f, cx, cy = meta["fl_x"], meta["cx"], meta["cy"]
    H, W = d1.shape
    assert (d1 == 0).any()            # sky present
    assert (d1[d1 > 0] > 1.0).all()   # outdoor distances in meters
    u, v = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    dirs = np.stack([(u - cx) / f, -(v - cy) / f, -np.ones_like(u)],
                    -1).reshape(-1, 3)
    hit = d1.reshape(-1) > 0
    pts = c1[:3, 3] + d1.reshape(-1, 1) * (dirs @ c1[:3, :3].T)
    pc = (pts[hit] - c2[:3, 3]) @ c2[:3, :3]
    z = -pc[:, 2]
    uu = f * (pc[:, 0] / z) + cx
    vv = f * (-pc[:, 1] / z) + cy
    # restrict to < 12 m: beyond that the ground is seen at grazing
    # incidence where depth changes by meters per pixel row and
    # pixel-quantized resampling cannot discriminate consistency
    ok = (z > 0.05) & (z < 12.0) & (uu >= 0) & (uu < W - 1) \
        & (vv >= 0) & (vv < H - 1)
    assert ok.sum() > 500
    # best-of-4 neighboring pixels (pixel-center quantization)
    u0 = np.floor(uu[ok]).astype(int)
    v0 = np.floor(vv[ok]).astype(int)
    diffs = np.stack([
        np.abs(d2[v0 + dv, u0 + du] - z[ok])
        for dv in (0, 1) for du in (0, 1)
    ])
    samp_any = np.stack([
        d2[v0 + dv, u0 + du] for dv in (0, 1) for du in (0, 1)
    ]).max(0)
    visible = samp_any > 0
    consistent = (diffs.min(0)[visible]
                  < 0.1 * z[ok][visible]).mean()
    assert consistent > 0.5  # rest occluded (trunks/canopies; 60-deg baselines)
