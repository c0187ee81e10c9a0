"""Dry-run a capacity growth's compile + memory gate without risking the run.

Answers "would growing gaussian capacity to TARGET fit this device?" by
invoking the exact gate the trainer runs before committing a growth
(`Trainer._probe_grown_compiles`): AOT-compile the grown-capacity train
dispatch and refine pass, read XLA's memory analysis, and compare against
the device HBM budget. Nothing executes on the chip — compilation only.

Used to post-mortem the round-3 room run, which killed the TPU worker
twice at the 1,787,904 -> 3,575,808 growth (v5e, 16 GB HBM):

    python -m tools.probe_grow --data outputs/room648 \
        --load-dir outputs/room648-30k-r3/ckpts \
        --step 13700 --target-capacity 3575808
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", required=True)
    p.add_argument("--load-dir", default=None,
                   help="checkpoint dir; sets the pre-growth capacity")
    p.add_argument("--step", type=int, default=None,
                   help="training step the growth would happen at "
                        "(sets resolution bucket; default: checkpoint step)")
    p.add_argument("--target-capacity", type=int, required=True)
    p.add_argument("--max-per-tile", type=int, default=None,
                   help="override K (default: checkpoint k_by_d / config)")
    args = p.parse_args(argv)

    from qed_splatter_tpu.cli import build_trainer_config
    from qed_splatter_tpu.engine.trainer import Trainer

    cargv = ["--data", args.data, "--output-dir", "/tmp/probe-grow"]
    if args.load_dir:
        cargv += ["--load-dir", args.load_dir]
    cfg = build_trainer_config(cargv)
    trainer = Trainer(cfg)
    step = args.step if args.step is not None else int(trainer.state.step)
    d = trainer._downscale_factor(step)
    if args.max_per_tile:
        trainer._k_by_d[d] = args.max_per_tile
    if trainer.cfg.max_per_tile != trainer._k_for(d):
        import dataclasses

        trainer.cfg = dataclasses.replace(
            trainer.cfg, max_per_tile=trainer._k_for(d)
        )
    cam = trainer.dm.get_item(int(trainer.dm.train_indices[0]))["camera"]
    if d > 1:
        cam = cam.rescaled(1.0 / d)
    cap = trainer.state.params.capacity
    print(f"device: {trainer._device_memory_stats() or 'no memory stats'}")
    print(f"probing growth {cap} -> {args.target_capacity} at step {step} "
          f"(1/{d} res {cam.width}x{cam.height}, K={trainer.cfg.max_per_tile})")
    ok, why, _transient = trainer._probe_grown_compiles(
        step, max(cam.width, cam.height), args.target_capacity
    )
    print(f"{'WOULD GROW' if ok else 'WOULD REFUSE'}: {why}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
