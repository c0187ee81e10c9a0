"""Profile the canonical train step and print per-op device-time totals.

Captures a jax.profiler trace of N steps at the bench workload, then
parses the trace protobuf/JSON for TPU op events and aggregates duration
by fusion/op name — ground truth for where the 48 ms step actually goes
(microbenchmarks on the tunneled chip disagree with in-context numbers
by 2x in both directions).
"""

import glob
import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from qed_splatter_tpu.configs import ModelConfig, default_optimizers
    from qed_splatter_tpu.engine.optim import GroupOptimizers
    from qed_splatter_tpu.engine.train_step import (
        init_train_state, make_train_step,
    )
    from qed_splatter_tpu.models.gaussians import init_from_points
    from qed_splatter_tpu.testing import orbit_c2w_opengl

    width, height = 1296, 840
    capacity, n_alive, k_cap = 131_072, 80_000, 256
    if len(sys.argv) > 1 and sys.argv[1] == "dense":
        capacity, n_alive, k_cap = 327_680, 288_000, 1024

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.2, 1.2, (n_alive, 3)).astype(np.float32)
    pts[:, 2] = pts[:, 2] * 0.7 + 3.0
    rgb = (rng.uniform(0, 1, (n_alive, 3)) * 255).astype(np.uint8)
    params = init_from_points(pts, rgb, capacity=capacity)
    cfg = ModelConfig(camera_opt_mode="SO3xR3", max_per_tile=k_cap,
                      background_color="random")
    f = 0.85 * max(width, height)
    K = jnp.asarray(np.array(
        [[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]], np.float32))
    c2w = jnp.asarray(orbit_c2w_opengl(3.0, 0.15, 0.1, (0, 0, 3.0)))
    gt_rgb = jnp.asarray(
        rng.uniform(0, 1, (height, width, 3)).astype(np.float32))
    gt_depth = jnp.asarray(
        rng.uniform(0.5, 4.0, (height, width, 1)).astype(np.float32))
    optims = GroupOptimizers(default_optimizers())
    batch = dict(c2w=c2w, K=K, cam_idx=jnp.asarray(0, jnp.int32),
                 rgb=gt_rgb, depth=gt_depth)
    state = init_train_state(params, optims, num_cameras=4)
    step = make_train_step(cfg, optims, width, height, has_depth=True)
    key = jax.random.PRNGKey(0)

    # warmup/compile
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, m = step(state, batch, sub)
    jax.block_until_ready(m)

    outdir = "/tmp/qed_profile"
    import shutil
    shutil.rmtree(outdir, ignore_errors=True)
    with jax.profiler.trace(outdir):
        for _ in range(10):
            key, sub = jax.random.split(key)
            state, m = step(state, batch, sub)
        jax.block_until_ready(m)

    # locate trace.json.gz
    paths = glob.glob(outdir + "/**/*.trace.json.gz", recursive=True)
    print("traces:", paths, flush=True)
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for p in paths:
        with gzip.open(p, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            # TPU device lanes carry XLA op events; host lanes have pid
            # names like "python". Use the 'dur' of complete events on
            # device tracks.
            name = ev.get("name", "")
            args = ev.get("args") or {}
            if "run_id" in args or name.startswith("jit_"):
                continue
            tid_name = ev.get("tid")
            dur = float(ev.get("dur", 0.0))
            # keep only device-side ops: heuristic — events with
            # 'long_name' or 'tf_op' args, or XLA-ish names
            if not args and "/" not in name and "fusion" not in name \
                    and "%" not in name:
                continue
            agg[name] += dur
            cnt[name] += 1
            total += dur

    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:48]
    print(f"{'us_total':>10} {'calls':>6}  name")
    for name, us in rows:
        print(f"{us:10.0f} {cnt[name]:6d}  {name[:110]}")
    print("sum of listed:", round(total / 1000, 2), "ms over 10 steps")


if __name__ == "__main__":
    main()
