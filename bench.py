"""Benchmark: full training-step throughput on the available accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Measures the complete per-iteration "solve" (project -> SH -> bin ->
rasterize (Pallas on TPU) -> photometric+depth loss -> analytic adjoint ->
per-group Adam + absgrad stats) at TWO workload points:

- canonical (the headline): 131k-capacity / 80k alive gaussians, one
  1296x840 camera per step, K=256. NOTE (corrected round 4): this
  synthetic scene's peak tile count is 697 with mean 168
  (tools/probe_k.py), so K=256 truncates the back-most splats of the
  densest tiles — the trainer's adaptive-K would escalate K here; the
  K=1024 regime is covered by the dense row below. The workload shape
  matches BASELINE.json config #2 (nerfstudio-scene class).
- dense (reported in "extra"): 288k alive / 320k capacity, K=1024 —
  the adaptive-K regime an evolved full-budget room run actually reaches
  (round-2 verdict: the headline config alone under-represented the
  workload that matters).

Also reported in "extra": the canonical config with mixed_precision
(bf16 MXU operands in the compositing kernels).

Timing methodology: N steps inside ONE jitted lax.fori_loop (state threaded
through), wall time of the single dispatch / N. Host-side per-call timing
through the tunneled TPU backend is unreliable in both directions (async
dispatch under-reports; per-call input re-upload over-reports by 10-100x).

vs_baseline: the reference stack (splatfacto + gsplat CUDA) trains
nerfstudio scenes at roughly 30 train iters/s on an A100-class GPU at this
resolution (gsplat paper scale, BASELINE.md context row). vs_baseline =
measured_iters_per_s / 30.0.
"""

import json
import time

import numpy as np


def measure(width, height, capacity, n_alive, k_cap, mixed_precision,
            n_timed=20, seed=0):
    """Iters/s for one workload point; fresh state per call."""
    import jax
    import jax.numpy as jnp

    from qed_splatter_tpu.configs import ModelConfig, default_optimizers
    from qed_splatter_tpu.engine.optim import GroupOptimizers
    from qed_splatter_tpu.engine.train_step import (
        init_train_state,
        make_train_step,
    )
    from qed_splatter_tpu.models.gaussians import init_from_points
    from qed_splatter_tpu.testing import orbit_c2w_opengl

    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1.2, 1.2, (n_alive, 3)).astype(np.float32)
    pts[:, 2] = pts[:, 2] * 0.7 + 3.0
    rgb = (rng.uniform(0, 1, (n_alive, 3)) * 255).astype(np.uint8)
    params = init_from_points(pts, rgb, capacity=capacity)

    cfg = ModelConfig(
        camera_opt_mode="SO3xR3",
        max_per_tile=k_cap,
        background_color="random",
        mixed_precision=mixed_precision,
    )
    optims = GroupOptimizers(default_optimizers())
    state = init_train_state(params, optims, num_cameras=4)
    step_jitted = make_train_step(cfg, optims, width, height, has_depth=True)
    inner = step_jitted.__wrapped__  # raw fn; we re-jit around the loop

    f = 0.85 * max(width, height)
    K = jnp.asarray(
        np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]],
                 np.float32)
    )
    c2w = jnp.asarray(orbit_c2w_opengl(3.0, 0.15, 0.1, (0, 0, 3.0)))
    gt_rgb = jnp.asarray(
        rng.uniform(0, 1, (height, width, 3)).astype(np.float32)
    )
    gt_depth = jnp.asarray(
        rng.uniform(0.5, 4.0, (height, width, 1)).astype(np.float32)
    )
    batch = dict(
        c2w=c2w, K=K, cam_idx=jnp.asarray(0, jnp.int32),
        rgb=gt_rgb, depth=gt_depth,
    )

    # batch is an explicit jit arg: closed-over arrays inline as literal
    # constants in the program (17 MB of GT images here)
    @jax.jit
    def loop(state, rng_key, batch):
        def body(i, carry):
            st, key = carry
            key, sub = jax.random.split(key)
            st, _ = inner(st, batch, sub)
            return (st, key)

        return jax.lax.fori_loop(0, n_timed, body, (state, rng_key))

    # warmup/compile
    state, key = loop(state, jax.random.PRNGKey(0), batch)
    _ = int(jax.device_get(state.step))

    t0 = time.perf_counter()
    state, key = loop(state, key, batch)
    final_step = int(jax.device_get(state.step))
    dt = time.perf_counter() - t0
    assert final_step == 2 * n_timed

    # loss sanity from one eager step
    _, metrics = step_jitted(state, batch, key)
    loss = float(jax.device_get(metrics["loss"]))
    return n_timed / dt, bool(np.isfinite(loss))


def main() -> None:
    import jax

    from qed_splatter_tpu.utils.chiplock import acquire_chip_lock

    # REFUSE to share the chip: a second client hangs silently on the
    # first worker crash (round-3 finding, now enforced in code)
    acquire_chip_lock("bench.py")

    width, height = 1296, 840

    iters, finite = measure(width, height, 131_072, 80_000, 256, False)
    dense_iters, dense_finite = measure(
        width, height, 327_680, 288_000, 1024, False, n_timed=10
    )
    mp_iters, _ = measure(width, height, 131_072, 80_000, 256, True)

    mpix = iters * width * height / 1e6
    print(
        json.dumps(
            {
                "metric": "train_iters_per_s_1296x840_80k_gaussians",
                "value": round(iters, 3),
                "unit": "iters/s",
                "vs_baseline": round(iters / 30.0, 3),
                "extra": {
                    "rasterized_mpix_per_s": round(mpix, 2),
                    "device": str(jax.devices()[0]),
                    "loss_finite": finite and dense_finite,
                    "dense_288k_alive_k1024_iters_per_s": round(
                        dense_iters, 3
                    ),
                    "mixed_precision_iters_per_s": round(mp_iters, 3),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
