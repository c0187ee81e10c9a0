"""Full parity metric table for a finished run, in one command.

Renders every eval view from the latest checkpoint through the eval path
and prints the complete BASELINE.md parity table (PSNR/SSIM/LPIPS, the
7-tuple depth metrics, point-cloud accuracy/completeness vs the dataset's
seed cloud, gaussian count) plus wall-clock/step-rate summaries parsed
from the run's metrics.jsonl. Usage:

    python tools/quality_table.py --run outputs/<experiment> --data <dataset>
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True, help="run dir (contains ckpts/)")
    ap.add_argument("--data", required=True, help="dataset dir")
    ap.add_argument("--pc-gt", default=None,
                    help="reference cloud PLY (default: dataset seed cloud)")
    ap.add_argument("--markdown", action="store_true")
    ns = ap.parse_args()

    import jax.numpy as jnp

    from qed_splatter_tpu.configs import DataConfig
    from qed_splatter_tpu.data.dataset import FullImageDatamanager
    from qed_splatter_tpu.data.ply import read_ply
    from qed_splatter_tpu.engine import checkpoint as ckpt
    from qed_splatter_tpu.metrics import (
        RGBMetrics,
        calculate_accuracy,
        calculate_completeness,
        full_eval_metrics,
    )
    from qed_splatter_tpu.models.splatfacto import render

    run = Path(ns.run)
    ckpts = run / "ckpts"
    state = ckpt.load_state(ckpts)
    meta = ckpt.checkpoint_meta(ckpts) or {}
    mc = ckpt.model_config_from_meta(meta)
    k_by_d = meta.get("k_by_d") or {}
    k = max([mc.max_per_tile, *(int(v) for v in k_by_d.values())])
    import dataclasses

    mc = dataclasses.replace(mc, max_per_tile=k)
    step = int(state.step)

    dm = FullImageDatamanager(DataConfig(data=ns.data))
    rgbm = RGBMetrics()
    rows = []
    render_jit = {}  # one compile per distinct eval resolution
    for item in dm.eval_items():
        cam = item["camera"]
        wh = (cam.width, cam.height)
        if wh not in render_jit:
            import jax

            render_jit[wh] = jax.jit(
                lambda p, c2w, K, s, w=cam.width, h=cam.height: render(
                    p, c2w, K, w, h, mc, step=s, train=False
                )
            )
        out = render_jit[wh](
            state.params, jnp.asarray(cam.c2w),
            jnp.asarray(cam.intrinsics_matrix()), state.step,
        )
        gt = jnp.asarray(np.asarray(item["image"], np.float32) / 255.0)
        gt_depth = (
            jnp.asarray(item["depth_image"]) if "depth_image" in item
            else None
        )
        rows.append(full_eval_metrics(out.rgb, gt, out.depth, gt_depth,
                                      rgb_metrics=rgbm))
    agg = {}
    for key in rows[0]:
        vals = np.asarray([r[key] for r in rows], np.float64)
        finite = vals[np.isfinite(vals)]
        agg[key] = float(finite.mean()) if finite.size else float("nan")
    agg["gaussian_count"] = int(state.params.num_alive())
    agg["step"] = step

    # point-cloud metrics vs the dataset's reference cloud
    gt_ply = ns.pc_gt or str(Path(ns.data) / "sparse_pc.ply")
    if Path(gt_ply).exists():
        alive = np.asarray(state.params.alive)
        means = np.asarray(state.params.means)[alive]
        # means live in normalized scene space; bring them back to dataset
        # space with the recorded dataparser transform (export_ply math)
        means, _ = ckpt._inverse_transform(
            means, np.zeros((len(means), 3), np.float32), meta
        )
        gt_pts = read_ply(gt_ply).positions
        agg["pc_accuracy_p90"] = float(calculate_accuracy(means, gt_pts))
        agg["pc_completeness@5cm"] = float(
            calculate_completeness(means, gt_pts)
        )

    # wall-clock summary from the training log
    mfile = run / "metrics.jsonl"
    if mfile.exists():
        trains = [json.loads(l) for l in open(mfile)
                  if '"split": "train"' in l]
        if trains:
            rates = [t["iters_per_s"] for t in trains
                     if np.isfinite(t.get("iters_per_s", np.nan))
                     and t["iters_per_s"] < 1000]
            agg["median_train_iters_per_s"] = float(np.median(rates))

    if ns.markdown:
        print("| metric | value |")
        print("|---|---|")
        for key in sorted(agg):
            v = agg[key]
            print(f"| {key} | {v:.4g} |" if isinstance(v, float)
                  else f"| {key} | {v} |")
    else:
        print(json.dumps(agg, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
