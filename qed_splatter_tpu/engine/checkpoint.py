"""Checkpoint / resume via Orbax (SURVEY D13 / §5 checkpoint-resume).

The reference writes ``step-XXXXXXXXX.ckpt`` torch pickles with
*variable-size* gaussian tensors every ``steps_per_save=2000`` steps
(reference config.py:29). The TPU design's fixed-capacity buffers make
checkpoints fixed-shape Orbax pytrees (SURVEY §5): the whole TrainState
(params + Adam moments + camera-opt + densify stats + step) round-trips
losslessly, and `export_ply` emits the alive gaussians for interchange.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from qed_splatter_tpu.engine.train_step import TrainState
from qed_splatter_tpu.models.gaussians import GaussianParams, sh_dc_to_rgb


def save_checkpoint(ckpt_dir, state: TrainState, step: int,
                    dataparser_transform=None,
                    dataparser_scale: float = 1.0,
                    model_config=None,
                    k_by_d=None,
                    tpg_by_d=None) -> Path:
    ckpt_dir = Path(ckpt_dir).absolute()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    path = ckpt_dir / f"step-{step:09d}"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _pack_zero_size(state), force=True)
    ckptr.wait_until_finished()
    meta = {
        "step": step,
        "path": path.name,
        # state-shape metadata so export/view/render can rebuild the
        # restore template without user-supplied flags
        "capacity": int(state.params.capacity),
        "num_cameras": int(state.camera_opt.shape[0]),
        "sh_degree": int(state.params.sh_degree),
        "use_bilateral_grid": state.bilateral_grids is not None,
        "bilateral_grid_shape": (
            list(state.bilateral_grids.shape[1:4])
            if state.bilateral_grids is not None else None
        ),
        # dataparser normalization (for inverse-transform on export, the
        # ns-export behavior): world = R^T ((p / scale) - t)
        "dataparser_transform": (
            np.asarray(dataparser_transform).tolist()
            if dataparser_transform is not None else None
        ),
        "dataparser_scale": float(dataparser_scale),
        # trained model configuration so render/view/export rebuild the
        # exact model (sh_degree, rasterize_mode, background, ...) without
        # user-supplied flags (ADVICE r1: default ModelConfig() crashed on
        # sh_degree-0 checkpoints)
        "model_config": (
            _jsonable_config(model_config) if model_config is not None
            else None
        ),
        # adaptive per-resolution-bucket K table: a resume must not
        # re-enter its bucket at the config default (truncation shock)
        "k_by_d": (
            {str(d): int(k) for d, k in k_by_d.items()}
            if k_by_d else None
        ),
        # adaptive pair-expansion budget table (same resume rationale)
        "tpg_by_d": (
            {str(d): int(k) for d, k in tpg_by_d.items()}
            if tpg_by_d else None
        ),
    }
    (ckpt_dir / "latest.json").write_text(json.dumps(meta))
    return path


def _jsonable_config(cfg) -> dict:
    import dataclasses

    out = {}
    for f in dataclasses.fields(cfg):
        v = getattr(cfg, f.name)
        if isinstance(v, tuple):
            v = list(v)
        out[f.name] = v
    return out


def model_config_from_meta(meta: Optional[dict]):
    """Rebuild the trained ModelConfig from checkpoint metadata; falls back
    to defaults (plus legacy top-level sh_degree) for old checkpoints."""
    import dataclasses

    from qed_splatter_tpu.configs import ModelConfig

    cfg = ModelConfig()
    if not meta:
        return cfg
    stored = meta.get("model_config")
    if stored:
        names = {f.name for f in dataclasses.fields(ModelConfig)}
        kw = {}
        for k, v in stored.items():
            if k not in names:
                continue
            if isinstance(getattr(cfg, k), tuple) and isinstance(v, list):
                v = tuple(v)
            kw[k] = v
        return dataclasses.replace(cfg, **kw)
    if "sh_degree" in meta:
        return dataclasses.replace(cfg, sh_degree=int(meta["sh_degree"]))
    return cfg


def checkpoint_meta(ckpt_dir) -> Optional[dict]:
    meta = Path(ckpt_dir) / "latest.json"
    if meta.exists():
        return json.loads(meta.read_text())
    return None


def load_state(ckpt_dir) -> TrainState:
    """Restore the latest checkpoint using its recorded shape metadata."""
    from qed_splatter_tpu.configs import default_optimizers
    from qed_splatter_tpu.engine.optim import GroupOptimizers
    from qed_splatter_tpu.engine.train_step import init_train_state
    from qed_splatter_tpu.models.gaussians import init_random

    latest = latest_checkpoint(ckpt_dir)
    if latest is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    meta = checkpoint_meta(ckpt_dir) or {}
    template = init_train_state(
        init_random(
            num_points=16,
            capacity=int(meta.get("capacity", 65536)),
            sh_degree=int(meta.get("sh_degree", 3)),
        ),
        GroupOptimizers(default_optimizers()),
        num_cameras=int(meta.get("num_cameras", 1)),
        use_bilateral_grid=bool(meta.get("use_bilateral_grid", False)),
        bilateral_grid_shape=tuple(
            meta.get("bilateral_grid_shape") or (16, 16, 8)
        ),
    )
    return restore_checkpoint(latest, template)


def latest_checkpoint(ckpt_dir) -> Optional[Path]:
    ckpt_dir = Path(ckpt_dir)
    meta = ckpt_dir / "latest.json"
    if meta.exists():
        info = json.loads(meta.read_text())
        p = ckpt_dir / info["path"]
        if p.exists():
            return p
    candidates = sorted(ckpt_dir.glob("step-*"))
    return candidates[-1] if candidates else None


def _pack_zero_size(tree):
    """Orbax cannot serialize zero-size arrays (e.g. features_rest with
    sh_degree=0); swap them for a 1-element placeholder symmetrically at
    save and restore time."""
    return jax.tree.map(
        lambda x: np.zeros((1,), np.asarray(x).dtype)
        if hasattr(x, "size") and getattr(x, "size", 1) == 0 else x,
        tree,
    )


def restore_checkpoint(path, template: TrainState) -> TrainState:
    """Restore into the shapes/dtypes of ``template`` (same capacity).

    The abstract target carries an explicit single-device sharding for the
    *current* default device: without it, orbax refuses to restore a
    checkpoint written on a different backend (e.g. TPU-trained checkpoint
    opened on CPU for export/render)."""
    from jax.sharding import SingleDeviceSharding

    dev = jax.devices()[0]
    ckptr = ocp.StandardCheckpointer()
    target = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=SingleDeviceSharding(dev)
        )
        if hasattr(x, "shape") else x,
        _pack_zero_size(template),
    )
    restored = ckptr.restore(Path(path).absolute(), target)
    # re-materialize the zero-size leaves from the template
    return jax.tree.map(
        lambda t, r: jnp_zeros_like(t)
        if hasattr(t, "size") and getattr(t, "size", 1) == 0 else r,
        template, restored,
    )


def jnp_zeros_like(x):
    import jax.numpy as jnp

    return jnp.zeros(x.shape, x.dtype)


def _inverse_transform(means: np.ndarray, scales_log: np.ndarray, meta):
    """Undo the dataparser's orient/center/scale normalization
    (nerfstudio ns-export behavior) so exports land in input-world coords."""
    if not meta or meta.get("dataparser_transform") is None:
        return means, scales_log
    t34 = np.asarray(meta["dataparser_transform"], np.float64)
    scale = float(meta.get("dataparser_scale", 1.0))
    R, t = t34[:3, :3], t34[:3, 3]
    out = (means.astype(np.float64) / scale - t) @ R  # R^-1 = R^T, rows
    return out.astype(np.float32), (
        scales_log - np.log(max(scale, 1e-12))
    ).astype(np.float32)


def export_ply(path, params: GaussianParams, meta=None) -> int:
    """Write alive gaussians as a 3DGS-interchange PLY (positions, normals=0,
    SH features, opacity, scales, quats) readable by standard splat viewers.
    ``meta`` (checkpoint_meta dict) enables the inverse dataparser
    transform back to input-world coordinates."""
    alive = np.asarray(params.alive)
    idx = np.flatnonzero(alive)
    n = len(idx)
    means = np.asarray(params.means)[idx]
    dc = np.asarray(params.features_dc)[idx]          # [n, 3]
    rest = np.asarray(params.features_rest)[idx]      # [n, K-1, 3]
    opac = np.asarray(params.opacities)[idx]
    scales = np.asarray(params.scales)[idx]
    quats = np.asarray(params.quats)[idx]
    means, scales = _inverse_transform(means, scales, meta)

    props = [("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
             ("nx", "<f4"), ("ny", "<f4"), ("nz", "<f4")]
    props += [(f"f_dc_{i}", "<f4") for i in range(3)]
    n_rest = rest.shape[1] * 3
    props += [(f"f_rest_{i}", "<f4") for i in range(n_rest)]
    props += [("opacity", "<f4")]
    props += [(f"scale_{i}", "<f4") for i in range(3)]
    props += [(f"rot_{i}", "<f4") for i in range(4)]

    rec = np.zeros(n, dtype=np.dtype(props))
    rec["x"], rec["y"], rec["z"] = means.T
    for i in range(3):
        rec[f"f_dc_{i}"] = dc[:, i]
    # 3DGS layout: channel-major (all coeffs of R, then G, then B)
    rest_cm = rest.transpose(0, 2, 1).reshape(n, -1)
    for i in range(n_rest):
        rec[f"f_rest_{i}"] = rest_cm[:, i]
    rec["opacity"] = opac
    for i in range(3):
        rec[f"scale_{i}"] = scales[:, i]
    for i in range(4):
        rec[f"rot_{i}"] = quats[:, i]

    header = "\n".join(
        ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
        + [f"property float {name}" for name, _ in props]
        + ["end_header", ""]
    )
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(rec.tobytes())
    return n


def export_pointcloud_ply(path, params: GaussianParams, meta=None) -> int:
    """Write alive gaussian centers + dc colors as a plain xyz/rgb PLY
    (for PDMetrics accuracy/completeness eval)."""
    from qed_splatter_tpu.data.ply import write_ply

    alive = np.asarray(params.alive)
    idx = np.flatnonzero(alive)
    means = np.asarray(params.means)[idx]
    means, _ = _inverse_transform(
        means, np.zeros((len(idx), 3), np.float32), meta
    )
    rgb = np.clip(np.asarray(sh_dc_to_rgb(params.features_dc))[idx], 0, 1)
    write_ply(path, means, rgb)
    return len(idx)


def pack_splat_buffer(params: GaussianParams, meta=None) -> bytes:
    """Pack alive gaussians as the 32-byte-per-splat interchange buffer used
    by web splat viewers (and our own ``/webgl`` viewer): position f32x3,
    world scale f32x3 (exp of log-scale), color rgba u8x4 (SH dc -> rgb,
    sigmoid opacity), rotation u8x4 (normalized quat wxyz, c*128+128).

    Splats are ordered by descending volume x opacity so a size-truncated
    prefix of the buffer is still a faithful preview (large structure
    first) — lets the live viewer cap payloads during training.
    """
    alive = np.asarray(params.alive)
    idx = np.flatnonzero(alive)
    n = len(idx)
    means = np.asarray(params.means, np.float32)[idx]
    scales_log = np.asarray(params.scales, np.float32)[idx]
    means, scales_log = _inverse_transform(means, scales_log, meta)
    scales = np.exp(scales_log)
    rgb = np.clip(np.asarray(sh_dc_to_rgb(params.features_dc))[idx], 0.0, 1.0)
    opac = 1.0 / (1.0 + np.exp(-np.asarray(params.opacities, np.float32)[idx]))
    quats = np.asarray(params.quats, np.float32)[idx]
    quats = quats / np.maximum(
        np.linalg.norm(quats, axis=-1, keepdims=True), 1e-12
    )

    order = np.argsort(
        -(scales[:, 0] * scales[:, 1] * scales[:, 2] * opac), kind="stable"
    )
    rec = np.zeros(
        n,
        dtype=np.dtype(
            [("pos", "<f4", 3), ("scale", "<f4", 3),
             ("rgba", "u1", 4), ("rot", "u1", 4)]
        ),
    )
    rec["pos"] = means[order]
    rec["scale"] = scales[order]
    rec["rgba"][:, :3] = np.clip(rgb[order] * 255.0 + 0.5, 0, 255)
    rec["rgba"][:, 3] = np.clip(opac[order] * 255.0 + 0.5, 0, 255)
    rec["rot"] = np.clip(quats[order] * 128.0 + 128.0, 0, 255)
    return rec.tobytes()


def export_splat(path, params: GaussianParams, meta=None) -> int:
    """Write the alive gaussians as a ``.splat`` file (the 32-byte packed
    layout of :func:`pack_splat_buffer`), loadable by common web viewers."""
    buf = pack_splat_buffer(params, meta)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(buf)
    return len(buf) // 32
