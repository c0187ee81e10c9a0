"""CLI: dataclass-driven flags + subcommands (tyro-equivalent).

Reference UX (SURVEY L5): ``ns-train qed-splatter --data PATH`` where every
config field is a CLI flag (pyproject.toml:14-19 entry points; tyro overlay
at config.py:25), plus the ``qed-init-pc`` console script
(create_init_pointcloud.py:513-515). Here:

    qed train --data PATH [--model.depth-lambda 0.2 ...]
    qed eval --data PATH --load-dir outputs/.../ckpts
    qed init-pc --data PATH [--stride 4 ...]
    qed export --load-dir ... --output splat.ply [--pointcloud]
    qed render --load-dir ... --mode orbit|eval [--depth]
    qed view --load-dir ... [--port 7007]
    qed eval-pc --pred recon.ply --gt scan.ply

Flags are generated from the config dataclasses: nested fields use dotted
prefixes (``--model.sh-degree``), booleans get ``--x / --no-x`` pairs,
Literal types become choices.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import typing
from typing import Any, Optional

from qed_splatter_tpu.configs import DataConfig, ModelConfig, TrainerConfig


def _unwrap_optional(tp):
    origin = typing.get_origin(tp)
    if origin is typing.Union:
        args = [a for a in typing.get_args(tp) if a is not type(None)]
        if len(args) == 1:
            return args[0], True
    return tp, False


def add_dataclass_args(parser: argparse.ArgumentParser, cls, prefix: str = ""):
    hints = typing.get_type_hints(cls)
    for f in dataclasses.fields(cls):
        tp = hints.get(f.name, f.type)
        name = f.name.replace("_", "-")
        flag = f"--{prefix}{name}"
        dest = f"{prefix}{name}".replace(".", "__").replace("-", "_")
        tp, _ = _unwrap_optional(tp)
        if dataclasses.is_dataclass(tp):
            add_dataclass_args(parser, tp, prefix=f"{prefix}{name}.")
            continue
        origin = typing.get_origin(tp)
        if tp is bool:
            group = parser.add_mutually_exclusive_group()
            group.add_argument(flag, dest=dest, action="store_true",
                               default=None)
            group.add_argument(f"--no-{prefix}{name}", dest=dest,
                               action="store_false", default=None)
        elif origin is typing.Literal:
            parser.add_argument(flag, dest=dest, type=str, default=None,
                                choices=list(typing.get_args(tp)))
        elif origin in (tuple, list):
            inner = typing.get_args(tp)[0] if typing.get_args(tp) else str
            parser.add_argument(flag, dest=dest, type=inner, nargs="+",
                                default=None)
        elif tp in (int, float, str):
            parser.add_argument(flag, dest=dest, type=tp, default=None)
        elif tp is dict:
            continue  # optimizer table: not exposed as flat flags
        else:
            parser.add_argument(flag, dest=dest, type=str, default=None)


def apply_overrides(cls_instance, args_ns, prefix: str = ""):
    """Rebuild a (frozen) dataclass with CLI overrides applied."""
    updates = {}
    hints = typing.get_type_hints(type(cls_instance))
    for f in dataclasses.fields(cls_instance):
        tp = hints.get(f.name, f.type)
        tp, _ = _unwrap_optional(tp)
        name = f.name.replace("_", "-")
        dest = f"{prefix}{name}".replace(".", "__").replace("-", "_")
        cur = getattr(cls_instance, f.name)
        if dataclasses.is_dataclass(tp) and not isinstance(cur, dict):
            updates[f.name] = apply_overrides(cur, args_ns, f"{prefix}{name}.")
            continue
        if hasattr(args_ns, dest):
            val = getattr(args_ns, dest)
            if val is not None:
                if typing.get_origin(tp) is tuple:
                    val = tuple(val)
                updates[f.name] = val
    return dataclasses.replace(cls_instance, **updates)


def build_trainer_config(argv) -> TrainerConfig:
    parser = argparse.ArgumentParser(
        prog="qed-train", description="Train qed-splatter on TPU"
    )
    add_dataclass_args(parser, TrainerConfig)
    # convenience alias matching `ns-train qed-splatter --data PATH`
    parser.add_argument("--data", dest="data__data_alias", type=str,
                        default=None)
    ns = parser.parse_args(argv)
    cfg = apply_overrides(TrainerConfig(), ns)
    if ns.data__data_alias:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, data=ns.data__data_alias)
        )
    return cfg


def cmd_train(argv) -> int:
    from qed_splatter_tpu.engine.trainer import Trainer
    from qed_splatter_tpu.utils.chiplock import acquire_chip_lock

    cfg = build_trainer_config(argv)
    if not cfg.data.data:
        print("error: --data PATH is required", file=sys.stderr)
        return 2
    if cfg.supervise:
        return _supervise_train(argv, cfg)
    acquire_chip_lock("qed train")
    trainer = Trainer(cfg)
    trainer.train()
    return 0


def _supervise_train(argv, cfg) -> int:
    """Crash-supervised training: run `qed train` as a child process; on a
    crash (TPU worker kill = hard child death), restart it resuming from
    the run's latest checkpoint. The child's attempt journal
    (engine.journal) witnesses which executable configuration was in
    flight, so the restart refuses exactly the killing configuration —
    growth/K escalation can fail, but the RUN cannot die. Restarts are
    bounded by --max-restarts; a child that makes no checkpoint progress
    between two consecutive crashes stops the loop (config errors must not
    spin)."""
    import subprocess
    from pathlib import Path

    from qed_splatter_tpu.engine import checkpoint as ckpt

    run_dir = Path(cfg.output_dir) / (cfg.experiment_name or "qed-splatter")
    ckpts = run_dir / "ckpts"
    restarts = 0
    last_ckpt = None
    # the child must not supervise itself (--supervise/--no-supervise are a
    # mutually exclusive pair, so strip rather than append)
    base = [a for a in argv if a not in ("--supervise", "--no-supervise")]
    while True:
        child_args = [
            sys.executable, "-m", "qed_splatter_tpu.cli", "train",
            *base, "--no-supervise",
        ]
        latest = ckpt.latest_checkpoint(ckpts) if ckpts.exists() else None
        if latest is not None:
            # appended last: argparse keeps the final occurrence, so this
            # supersedes any user-passed --load-dir once OUR run has ckpts
            child_args += ["--load-dir", str(ckpts)]
        rc = subprocess.call(child_args)
        if rc == 0:
            if restarts:
                print(f"SUPERVISOR: run completed after {restarts} "
                      f"restart(s)")
            return 0
        cur_ckpt = ckpt.latest_checkpoint(ckpts) if ckpts.exists() else None
        made_progress = cur_ckpt != last_ckpt
        last_ckpt = cur_ckpt
        restarts += 1
        if restarts > cfg.max_restarts:
            print(f"SUPERVISOR: giving up after {cfg.max_restarts} "
                  f"restarts (last rc={rc})", file=sys.stderr)
            return rc
        if not made_progress and restarts > 1:
            print("SUPERVISOR: two crashes with no checkpoint progress — "
                  f"not a transient failure, stopping (rc={rc})",
                  file=sys.stderr)
            return rc
        print(f"SUPERVISOR: training process exited rc={rc}; restart "
              f"{restarts}/{cfg.max_restarts}"
              + (f" resuming from {cur_ckpt}" if cur_ckpt else ""))


def cmd_train_multi(argv) -> int:
    """Train N scenes (BASELINE config #5): scenes are sharded across
    processes, round-robin chunk-scheduled on each chip, and same-shaped
    scenes share one compiled hot path. Usage:

        qed train-multi --data sceneA --data sceneB [trainer flags]
    """
    from qed_splatter_tpu.engine.multi_scene import MultiSceneTrainer

    scenes, rest = [], []
    it = iter(argv)
    for a in it:
        if a == "--data":
            scenes.append(next(it, None))
        elif a.startswith("--data="):
            scenes.append(a.split("=", 1)[1])
        else:
            rest.append(a)
    if not scenes or any(s is None for s in scenes):
        print("error: at least one --data PATH is required",
              file=sys.stderr)
        return 2
    cfg = build_trainer_config(rest)
    from qed_splatter_tpu.utils.chiplock import acquire_chip_lock

    acquire_chip_lock("qed train-multi")
    MultiSceneTrainer(cfg, scenes).train()
    return 0


def cmd_eval(argv) -> int:
    from qed_splatter_tpu.engine.trainer import Trainer

    cfg = build_trainer_config(argv)
    if not cfg.data.data or not cfg.load_dir:
        print("error: --data and --load-dir are required", file=sys.stderr)
        return 2
    # evaluate with the TRAINED model configuration (sh_degree, background,
    # rasterize mode, ...) recorded in checkpoint metadata — a default
    # ModelConfig would crash on e.g. an sh_degree=0 checkpoint. Explicit
    # --model.* flags still override.
    if not any(a.startswith("--model.") for a in argv):
        from qed_splatter_tpu.engine import checkpoint as ckpt

        meta = ckpt.checkpoint_meta(cfg.load_dir)
        if meta:
            cfg = dataclasses.replace(
                cfg, model=ckpt.model_config_from_meta(meta)
            )
    trainer = Trainer(cfg)
    metrics = trainer.eval_all(int(trainer.state.step))
    for k, v in metrics.items():
        print(f"{k}: {v}")
    return 0


def cmd_init_pc(argv) -> int:
    from qed_splatter_tpu.data.init_pc import InitPcArgs, main as init_main

    parser = argparse.ArgumentParser(
        prog="qed-init-pc",
        description="Create / colorize an init point cloud from RGB-D",
    )
    add_dataclass_args(parser, InitPcArgs)
    ns = parser.parse_args(argv)
    args = apply_overrides(InitPcArgs(), ns)
    if not args.data:
        print("error: --data PATH is required", file=sys.stderr)
        return 2
    init_main(args)
    return 0


def add_crop_args(parser) -> None:
    """Crop-box flags (reference model.py:217-239 / nerfstudio viewer
    crop): an oriented box in *scene space* (the model's coordinate frame,
    i.e. the space `qed view` navigates); gaussians outside are excluded."""
    parser.add_argument("--crop-center", type=float, nargs=3, default=None,
                        metavar=("X", "Y", "Z"))
    parser.add_argument("--crop-size", type=float, nargs=3, default=None,
                        metavar=("SX", "SY", "SZ"))
    parser.add_argument("--crop-rotation", type=float, nargs=9, default=None,
                        help="row-major 3x3 box rotation (default identity)")


def crop_from_args(ns):
    """CropBox from --crop-* flags; None when no crop requested."""
    if ns.crop_center is None and ns.crop_size is None:
        return None
    from qed_splatter_tpu.models.crop import CropBox

    return CropBox(
        center=tuple(ns.crop_center or (0.0, 0.0, 0.0)),
        size=tuple(ns.crop_size or (2.0, 2.0, 2.0)),
        rotation=tuple(ns.crop_rotation) if ns.crop_rotation else None,
    )


def cmd_export(argv) -> int:
    from qed_splatter_tpu.engine import checkpoint as ckpt

    parser = argparse.ArgumentParser(prog="qed-export")
    parser.add_argument("--load-dir", required=True)
    parser.add_argument("--output", default="splat.ply")
    parser.add_argument("--pointcloud", action="store_true",
                        help="write plain xyz/rgb instead of 3DGS layout")
    parser.add_argument("--format", choices=["ply", "splat"], default=None,
                        help="output format (default: from --output suffix; "
                             ".splat = packed 32B/gaussian web-viewer layout)")
    add_crop_args(parser)
    ns = parser.parse_args(argv)
    try:
        state = ckpt.load_state(ns.load_dir)
    except FileNotFoundError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    meta = ckpt.checkpoint_meta(ns.load_dir)
    crop = crop_from_args(ns)
    if crop is not None:
        import jax.numpy as jnp

        state = state.replace(params=state.params.replace(
            alive=state.params.alive & crop.within(state.params.means)
        ))
    fmt = ns.format or ("splat" if ns.output.endswith(".splat") else "ply")
    if ns.pointcloud:
        n = ckpt.export_pointcloud_ply(ns.output, state.params, meta)
    elif fmt == "splat":
        n = ckpt.export_splat(ns.output, state.params, meta)
    else:
        n = ckpt.export_ply(ns.output, state.params, meta)
    print(f"Wrote {n} gaussians to {ns.output}")
    return 0


def cmd_view(argv) -> int:
    """Standalone viewer over a checkpoint (reference vis="viewer" UX)."""
    import time

    import numpy as np

    from qed_splatter_tpu.engine import checkpoint as ckpt
    from qed_splatter_tpu.viewer import Viewer

    parser = argparse.ArgumentParser(prog="qed-view")
    parser.add_argument("--load-dir", required=True)
    parser.add_argument("--port", type=int, default=7007)
    add_crop_args(parser)
    ns = parser.parse_args(argv)
    try:
        state = ckpt.load_state(ns.load_dir)
    except FileNotFoundError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    cfg = ckpt.model_config_from_meta(ckpt.checkpoint_meta(ns.load_dir))
    # center the orbit on the alive gaussians
    alive = np.asarray(state.params.alive)
    means = np.asarray(state.params.means)[alive]
    target = tuple(means.mean(0)) if len(means) else (0.0, 0.0, 0.0)
    viewer = Viewer(cfg, port=ns.port, target=target,
                    crop=crop_from_args(ns))
    viewer.update(state.params, int(state.step))
    viewer.start()
    print("Press Ctrl-C to stop.")
    try:
        while True:
            time.sleep(1)
    except KeyboardInterrupt:
        viewer.stop()
    return 0


def cmd_render(argv) -> int:
    """Render a camera trajectory from a checkpoint to PNG frames
    (ns-render-equivalent: orbit path or the dataset's eval cameras)."""
    import numpy as np

    from qed_splatter_tpu.configs import DataConfig
    from qed_splatter_tpu.engine import checkpoint as ckpt

    parser = argparse.ArgumentParser(prog="qed-render")
    parser.add_argument("--load-dir", required=True)
    parser.add_argument("--output-dir", default="renders")
    parser.add_argument("--mode", choices=["orbit", "eval", "path"],
                        default=None,
                        help="default: 'path' when --camera-path is given, "
                             "else 'orbit'")
    parser.add_argument("--data", default=None,
                        help="dataset (required for --mode eval)")
    parser.add_argument("--camera-path", default=None,
                        help="nerfstudio camera-path JSON "
                             "(required for --mode path)")
    parser.add_argument("--num-frames", type=int, default=60)
    parser.add_argument("--width", type=int, default=960)
    parser.add_argument("--height", type=int, default=540)
    parser.add_argument("--radius", type=float, default=3.0)
    parser.add_argument("--elevation", type=float, default=0.2)
    parser.add_argument("--depth", action="store_true",
                        help="also write turbo-ish depth visualizations")
    add_crop_args(parser)
    ns = parser.parse_args(argv)

    import jax.numpy as jnp
    from PIL import Image
    from pathlib import Path

    from qed_splatter_tpu.models.splatfacto import render
    from qed_splatter_tpu.testing import orbit_c2w_opengl

    try:
        state = ckpt.load_state(ns.load_dir)
    except FileNotFoundError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    cfg = ckpt.model_config_from_meta(ckpt.checkpoint_meta(ns.load_dir))
    out_dir = Path(ns.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    if ns.mode is None:
        # --camera-path implies path mode: silently rendering a default
        # orbit instead of the user's authored path is a trap
        ns.mode = "path" if ns.camera_path else "orbit"
    cams = []
    if ns.mode == "eval":
        if not ns.data:
            print("error: --data required for --mode eval", file=sys.stderr)
            return 2
        from qed_splatter_tpu.data.dataset import FullImageDatamanager

        dm = FullImageDatamanager(DataConfig(data=ns.data))
        for item in dm.eval_items():
            c = item["camera"]
            cams.append((c.c2w, c.intrinsics_matrix(), c.width, c.height))
    elif ns.mode == "path":
        if not ns.camera_path:
            print("error: --camera-path required for --mode path",
                  file=sys.stderr)
            return 2
        from qed_splatter_tpu.data.camera_path import load_camera_path

        cams = load_camera_path(ns.camera_path, default_width=ns.width,
                                default_height=ns.height)
    else:
        alive = np.asarray(state.params.alive)
        means = np.asarray(state.params.means)[alive]
        target = tuple(means.mean(0)) if len(means) else (0.0, 0.0, 0.0)
        f = 0.8 * max(ns.width, ns.height)
        K = np.array(
            [[f, 0, ns.width / 2], [0, f, ns.height / 2], [0, 0, 1]],
            np.float32,
        )
        for i in range(ns.num_frames):
            az = 2 * np.pi * i / ns.num_frames
            cams.append((
                orbit_c2w_opengl(ns.radius, az, ns.elevation, target),
                K, ns.width, ns.height,
            ))

    crop = crop_from_args(ns)
    for i, (c2w, K, w, h) in enumerate(cams):
        out = render(
            state.params, jnp.asarray(c2w), jnp.asarray(K), w, h, cfg,
            step=state.step, train=False, crop_box=crop,
        )
        rgb = np.clip(np.asarray(out.rgb) * 255, 0, 255).astype(np.uint8)
        Image.fromarray(rgb).save(out_dir / f"frame_{i:05d}.png")
        if ns.depth and out.depth is not None:
            d = np.asarray(out.depth[..., 0])
            dn = (d - d.min()) / max(d.max() - d.min(), 1e-9)
            Image.fromarray((dn * 255).astype(np.uint8)).save(
                out_dir / f"depth_{i:05d}.png"
            )
        print(f"  frame {i + 1}/{len(cams)}", end="\r", flush=True)
    print(f"\nWrote {len(cams)} frames to {out_dir}")
    return 0


def cmd_eval_pc(argv) -> int:
    """Point-cloud accuracy/completeness vs a reference scan
    (reference PDMetrics, metrics.py:9-63 — the offline eval toolkit)."""
    from qed_splatter_tpu.data.ply import read_ply
    from qed_splatter_tpu.metrics import PDMetrics

    parser = argparse.ArgumentParser(prog="qed-eval-pc")
    parser.add_argument("--pred", required=True, help="reconstructed PLY")
    parser.add_argument("--gt", required=True, help="reference-scan PLY")
    parser.add_argument("--completeness-threshold", type=float, default=0.05)
    parser.add_argument("--accuracy-percentile", type=float, default=90.0)
    ns = parser.parse_args(argv)
    pred = read_ply(ns.pred).positions
    gt = read_ply(ns.gt).positions
    from qed_splatter_tpu.metrics import (
        calculate_accuracy, calculate_completeness,
    )
    acc = calculate_accuracy(pred, gt, percentile=ns.accuracy_percentile)
    cmp_ = calculate_completeness(
        pred, gt, threshold=ns.completeness_threshold
    )
    print(f"accuracy_p{ns.accuracy_percentile:.0f}: {acc:.6f}")
    print(f"completeness_{ns.completeness_threshold}: {cmp_:.2f}%")
    return 0


COMMANDS = {
    "train": cmd_train,
    "train-multi": cmd_train_multi,
    "eval": cmd_eval,
    "init-pc": cmd_init_pc,
    "export": cmd_export,
    "view": cmd_view,
    "render": cmd_render,
    "eval-pc": cmd_eval_pc,
}


def _honor_jax_platforms_env() -> None:
    """Make ``JAX_PLATFORMS=cpu qed train ...`` actually run on CPU.

    This container's sitecustomize registers the tunneled-TPU PJRT plugin
    at interpreter boot and the registration wins over the env var — a
    subprocess launched with ``JAX_PLATFORMS=cpu`` still lands on the TPU
    (and, worse, silently contends for the single-client chip). Mirroring
    the env var into jax.config before any backend touch restores the
    documented contract for every CLI entry point (including supervisor
    children).
    """
    import os

    plats = os.environ.get("JAX_PLATFORMS")
    if plats:
        import jax

        try:
            jax.config.update("jax_platforms", plats)
        except Exception:
            pass  # backend already initialized: too late, leave it


def main(argv: Optional[list] = None) -> int:
    _honor_jax_platforms_env()
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: qed <command> [flags]\ncommands: "
              + ", ".join(COMMANDS))
        return 0 if argv else 2
    cmd = argv[0]
    if cmd not in COMMANDS:
        print(f"unknown command: {cmd}; choose from {list(COMMANDS)}",
              file=sys.stderr)
        return 2
    return COMMANDS[cmd](argv[1:])


def _train_entry() -> int:
    """Console-script entry mirroring ``ns-train qed-splatter``."""
    _honor_jax_platforms_env()
    return cmd_train(sys.argv[1:])


def _init_pc_entry() -> int:
    """Console-script entry mirroring ``qed-init-pc``."""
    _honor_jax_platforms_env()
    return cmd_init_pc(sys.argv[1:])


if __name__ == "__main__":
    raise SystemExit(main())
