"""Metrics / event writer (SURVEY D13: console + TensorBoard + JSONL).

The reference routes its metrics dict through nerfstudio's writer to
console/TensorBoard/wandb (SURVEY §5 observability). Here: always JSONL
(machine-readable, drives benchmarking), optional TensorBoard events when
the package is available, console lines at a configurable cadence, and
optional wandb / comet backends (reference ``vis='wandb'``/``'comet'``)
when those packages exist in the environment — they degrade to a warning,
never an import error, since this build environment has neither.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, Optional


class MetricsWriter:
    def __init__(self, output_dir, use_tensorboard: bool = False,
                 console_every: int = 100, use_wandb: bool = False,
                 use_comet: bool = False, project: str = "qed-splatter-tpu"):
        self.dir = Path(output_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.dir / "metrics.jsonl", "a", buffering=1)
        self.console_every = console_every
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=str(self.dir / "tb"))
            except Exception:  # tensorboard optional
                self._tb = None
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=project, dir=str(self.dir), resume="allow"
                )
            except Exception as e:
                print(f"wandb unavailable ({e}); falling back to JSONL")
        self._comet = None
        if use_comet:
            try:
                import comet_ml

                self._comet = comet_ml.Experiment(project_name=project)
            except Exception as e:
                print(f"comet unavailable ({e}); falling back to JSONL")
        self._t_last = time.perf_counter()
        self._step_last = 0

    def write(self, step: int, metrics: Dict, prefix: str = "train",
              force_console: bool = False) -> None:
        clean = {}
        for k, v in metrics.items():
            try:
                clean[k] = float(v)
            except (TypeError, ValueError):
                continue
        now = time.perf_counter()
        if step > self._step_last:
            clean["iters_per_s"] = (step - self._step_last) / max(
                now - self._t_last, 1e-9
            )
        self._t_last, self._step_last = now, step
        rec = {"step": step, "split": prefix, **clean}
        self._jsonl.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in clean.items():
                self._tb.add_scalar(f"{prefix}/{k}", v, step)
        if self._wandb is not None:
            self._wandb.log(
                {f"{prefix}/{k}": v for k, v in clean.items()}, step=step
            )
        if self._comet is not None:
            self._comet.log_metrics(
                {f"{prefix}/{k}": v for k, v in clean.items()}, step=step
            )
        if force_console or (
            self.console_every and step % self.console_every == 0
        ):
            keys = [
                k for k in ("loss", "main_loss", "depth_loss", "psnr",
                            "rgb_psnr", "gaussian_count", "iters_per_s",
                            "n_alive", "n_culled", "n_split", "n_dup",
                            "depth_abs_rel", "depth_a1")
                if k in clean
            ]
            msg = " ".join(f"{k}={clean[k]:.4g}" for k in keys)
            print(f"[{prefix} {step}] {msg}", flush=True)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
        if self._comet is not None:
            self._comet.end()
