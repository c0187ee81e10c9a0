"""CLI: dataclass-driven flags + subcommands (tyro-equivalent).

Reference UX (SURVEY L5): ``ns-train qed-splatter --data PATH`` where every
config field is a CLI flag (pyproject.toml:14-19 entry points; tyro overlay
at config.py:25), plus the ``qed-init-pc`` console script
(create_init_pointcloud.py:513-515). Here:

    python -m qed_splatter_tpu.cli train --data PATH [--model.depth-lambda 0.2 ...]
    python -m qed_splatter_tpu.cli eval --load-dir outputs/.../ckpts --data PATH
    python -m qed_splatter_tpu.cli init-pc --data PATH [--stride 4 ...]
    python -m qed_splatter_tpu.cli export --load-dir ... --output splat.ply

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

    cfg = build_trainer_config(argv)
    if not cfg.data.data:
        print("error: --data PATH is required", file=sys.stderr)
        return 2
    trainer = Trainer(cfg)
    trainer.train()
    return 0


def cmd_eval(argv) -> int:
    from qed_splatter_tpu.engine.trainer import Trainer

    cfg = build_trainer_config(argv)
    if not cfg.data.data or not cfg.load_dir:
        print("error: --data and --load-dir are required", file=sys.stderr)
        return 2
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


def cmd_export(argv) -> int:
    from qed_splatter_tpu.engine import checkpoint as ckpt
    from qed_splatter_tpu.engine.optim import GroupOptimizers
    from qed_splatter_tpu.engine.train_step import init_train_state
    from qed_splatter_tpu.configs import default_optimizers
    from qed_splatter_tpu.models.gaussians import init_random

    parser = argparse.ArgumentParser(prog="qed-export")
    parser.add_argument("--load-dir", required=True)
    parser.add_argument("--output", default="splat.ply")
    parser.add_argument("--capacity", type=int, required=True,
                        help="capacity of the checkpointed state")
    parser.add_argument("--num-cameras", type=int, default=1)
    parser.add_argument("--sh-degree", type=int, default=3)
    parser.add_argument("--pointcloud", action="store_true",
                        help="write plain xyz/rgb instead of 3DGS layout")
    ns = parser.parse_args(argv)
    latest = ckpt.latest_checkpoint(ns.load_dir)
    if latest is None:
        print(f"error: no checkpoint under {ns.load_dir}", file=sys.stderr)
        return 2
    template = init_train_state(
        init_random(num_points=16, capacity=ns.capacity,
                    sh_degree=ns.sh_degree),
        GroupOptimizers(default_optimizers()),
        num_cameras=ns.num_cameras,
    )
    state = ckpt.restore_checkpoint(latest, template)
    if ns.pointcloud:
        n = ckpt.export_pointcloud_ply(ns.output, state.params)
    else:
        n = ckpt.export_ply(ns.output, state.params)
    print(f"Wrote {n} gaussians to {ns.output}")
    return 0


COMMANDS = {
    "train": cmd_train,
    "eval": cmd_eval,
    "init-pc": cmd_init_pc,
    "export": cmd_export,
}


def main(argv: Optional[list] = None) -> int:
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
    return cmd_train(sys.argv[1:])


def _init_pc_entry() -> int:
    """Console-script entry mirroring ``qed-init-pc``."""
    return cmd_init_pc(sys.argv[1:])


if __name__ == "__main__":
    raise SystemExit(main())
