"""The Trainer: setup + hot loop + eval cadence + checkpoints.

Rebuilds SURVEY D6 (nerfstudio ``Trainer``) around the jitted train step:
step loop to ``max_num_iterations=30000`` with eval image / full eval /
checkpoint cadences from reference config.py:27-31, the coarse-to-fine
resolution schedule (splatfacto ``_get_downscale_factor``, reference
model.py:129, 244), densify/cull callbacks every ``refine_every`` steps
after warmup (SURVEY D8), and host-side capacity growth (a bounded number
of recompiles replaces torch's dynamic tensor growth).

XLA-compile awareness: train steps are compiled once per (W, H, depth/mask)
bucket — the resolution schedule visits ``num_downscales + 1`` buckets.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qed_splatter_tpu.configs import TrainerConfig
from qed_splatter_tpu.data.dataset import FullImageDatamanager
from qed_splatter_tpu.engine import checkpoint as ckpt
from qed_splatter_tpu.engine.densify import (
    maybe_reset_opacities,
    refine,
)
from qed_splatter_tpu.engine.optim import GroupOptimizers
from qed_splatter_tpu.engine.train_step import (
    TrainState,
    init_train_state,
    make_train_step,
)
from qed_splatter_tpu.engine.writer import MetricsWriter
from qed_splatter_tpu.metrics import RGBMetrics, avg_min_scale, full_eval_metrics
from qed_splatter_tpu.models.gaussians import (
    grow_capacity,
    init_from_points,
    init_random,
)
from qed_splatter_tpu.models.splatfacto import render


def downscale_image(img: np.ndarray, d: int) -> np.ndarray:
    """Box-average downscale by integer factor (splatfacto resize_image)."""
    if d <= 1:
        return img
    h, w = img.shape[:2]
    hh, ww = h // d, w // d
    img = img[: hh * d, : ww * d]
    img = img.reshape(hh, d, ww, d, -1).astype(np.float32).mean(axis=(1, 3))
    return img


def downscale_depth(depth: np.ndarray, d: int) -> np.ndarray:
    """Nearest-sample downscale: metric depth must not blend across edges
    (deviation from the reference's bilinear resize, which bleeds invalid
    zeros into valid pixels)."""
    if d <= 1:
        return depth
    return depth[d // 2 :: d, d // 2 :: d][
        : depth.shape[0] // d, : depth.shape[1] // d
    ]


class TrainingDiverged(RuntimeError):
    """Raised when training went non-finite and cannot (or must not, per
    ``TrainerConfig.on_divergence``) be rolled back. The CLI lets this
    propagate so an unattended run exits non-zero instead of burning chip
    time on a dead model (round-2 failure mode)."""


class Trainer:
    def __init__(self, config: TrainerConfig,
                 datamanager: Optional[FullImageDatamanager] = None,
                 optims: Optional[GroupOptimizers] = None):
        self.config = config
        self.cfg = config.model
        if config.mixed_precision and not self.cfg.mixed_precision:
            # TrainerConfig.mixed_precision (reference config.py:32) is the
            # user-facing flag; sync it into the model config the render
            # path reads.
            import dataclasses as _dc

            self.cfg = _dc.replace(self.cfg, mixed_precision=True)
        try:
            pidx, pcnt = jax.process_index(), jax.process_count()
        except RuntimeError:
            pidx, pcnt = 0, 1
        if not config.data.data and datamanager is None:
            raise ValueError("TrainerConfig.data.data is required")
        self.dm = datamanager or FullImageDatamanager(
            config.data, seed=config.seed,
            process_index=pidx if config.shard_views_by_process else 0,
            process_count=pcnt if config.shard_views_by_process else 1,
        )
        # multi-device mesh (SURVEY §2c): data axis = cameras per step,
        # model axis = gaussian sharding
        self.mesh = None
        if config.num_data_shards * config.num_model_shards > 1:
            from qed_splatter_tpu.parallel.mesh import make_mesh

            self.mesh = make_mesh(
                config.num_data_shards, config.num_model_shards
            )
        # a shared GroupOptimizers across same-config trainers lets the
        # scan-runner compile cache hit across scenes (engine.multi_scene)
        self.optims = optims or GroupOptimizers(config.optimizers)
        out_root = Path(config.output_dir)
        name = config.experiment_name or "qed-splatter"
        self.run_dir = out_root / name
        self.writer = MetricsWriter(
            self.run_dir,
            use_tensorboard=(config.vis == "tensorboard"),
            use_wandb=(config.vis == "wandb"),
            use_comet=(config.vis == "comet"),
            console_every=config.log_every,
        )
        self.rgb_metrics = RGBMetrics()
        self.viewer = None
        if config.vis == "viewer":
            from qed_splatter_tpu.viewer import Viewer

            self.viewer = Viewer(self.cfg, port=config.viewer_port)
            self.viewer.start()
        self._step_fns: Dict[Tuple, object] = {}
        self._sharded_fns: Dict[Tuple, object] = {}
        # memory-gated capacity growth (see _probe_grown_compiles).
        # Deterministic refusals (budget overrun, crash journal) are
        # permanent; transient compile failures (e.g. a remote-compile
        # HTTP 500) only defer the retry to a later refine cadence.
        self._grow_refused: set = set()
        self._grow_retry_at: Dict[int, int] = {}
        self._refine_exec: Dict[Tuple, object] = {}
        # divergence containment (TrainerConfig.on_divergence)
        self._rollbacks = 0
        self._densify_frozen_until = 0
        self._good_ckpt: Optional[Tuple[int, int]] = None  # (step, capacity)
        # crash-witness journal (engine.journal): every NEW executable
        # configuration is recorded before its first dispatch and marked ok
        # after; an unmatched record on startup is a crash witness and the
        # killing configuration is refused by _apply_crash_policy
        from qed_splatter_tpu.engine.journal import AttemptJournal

        self._journal = AttemptJournal(self.run_dir / "attempt_journal.jsonl")
        self._witnessed: set = set()  # configs whose first dispatch ok'd
        # per-resolution-bucket K ceilings learned from crashes
        self._k_crash_cap: Dict[int, int] = {}
        self._eval_k_cap: Optional[int] = None
        # adaptive per-tile K, tracked PER resolution bucket: the coarse
        # phase (few tiles, many gaussians) saturates K long before full
        # resolution does; a global K would carry the coarse phase's
        # worst case into every later bucket
        self._k_by_d: Dict[int, int] = {}
        # adaptive hierarchical pair-expansion budget, also per bucket:
        # full-res splats cover ~4x the tiles of the coarse phase that
        # precedes them (round-5 config-2 collapse: 20% of splats
        # bbox-truncated at 1/1 res)
        self._tpg_by_d: Dict[int, int] = {}
        self._refine_jit = jax.jit(
            refine,
            static_argnames=(
                "cfg", "num_train_data", "max_hw", "max_new_per_refine"
            ),
            donate_argnums=(0, 1, 2),
        )
        self._reset_jit = jax.jit(
            maybe_reset_opacities, static_argnames=("cfg",),
            donate_argnums=(0, 1),
        )
        self.state = self._setup_state()
        # Sampling state persists ACROSS train() calls and is derived from
        # the resume step, not reset per call: reseeding in train() made
        # every multi-scene turn (and every checkpoint resume) replay the
        # identical permutation prefix — scenes with more training views
        # than one turn's steps silently never sampled the tail views.
        self._reseed_sampling()
        self._apply_crash_policy()

    def _reseed_sampling(self) -> None:
        """(Re)derive the jax key and the epoch-permutation queue from
        (seed, current step) — called at setup and after rollbacks."""
        step = int(self.state.step)
        self._key = jax.random.fold_in(
            jax.random.PRNGKey(self.config.seed), step
        )
        self._np_rng = np.random.default_rng((self.config.seed, step))
        self._queue: list = []

    # ------------------------------------------------------------ setup

    def _setup_state(self) -> TrainState:
        scene = self.dm.scene
        if scene.points is not None and not self.cfg.random_init:
            params = init_from_points(
                scene.points,
                scene.points_rgb,
                sh_degree=self.cfg.sh_degree,
                capacity_headroom=self.cfg.init_capacity_headroom,
                seed=self.config.seed,
            )
        else:
            params = init_random(
                num_points=self.cfg.num_random,
                random_scale=self.cfg.random_scale,
                sh_degree=self.cfg.sh_degree,
                capacity_headroom=self.cfg.init_capacity_headroom,
                seed=self.config.seed,
            )
        state = init_train_state(
            params, self.optims, num_cameras=len(scene.frames),
            use_bilateral_grid=self.cfg.use_bilateral_grid,
            bilateral_grid_shape=self.cfg.bilateral_grid_shape,
        )
        if self.config.load_dir:
            latest = ckpt.latest_checkpoint(self.config.load_dir)
            if latest is None:
                # Silent fresh-init here would make `qed eval` score an
                # untrained model on a path typo; fail loudly instead.
                raise FileNotFoundError(
                    f"--load-dir {self.config.load_dir!r} contains no "
                    "checkpoint (expected step-XXXXXXXXX dirs; note "
                    "checkpoints live under "
                    "<output-dir>/<experiment-name>/ckpts)"
                )
            meta = ckpt.checkpoint_meta(Path(self.config.load_dir)) or {}
            # the checkpoint may have grown capacity past the fresh-init
            # template (densification doubles it); restore needs matching
            # shapes
            cap = int(meta.get("capacity", state.params.capacity))
            if cap != int(state.params.capacity):
                if cap > int(state.params.capacity):
                    params = grow_capacity(state.params, cap)
                else:
                    params = init_random(
                        num_points=16, capacity=cap,
                        sh_degree=self.cfg.sh_degree,
                    )
                state = init_train_state(
                    params, self.optims,
                    num_cameras=int(state.camera_opt.shape[0]),
                    use_bilateral_grid=self.cfg.use_bilateral_grid,
                    bilateral_grid_shape=self.cfg.bilateral_grid_shape,
                )
            state = ckpt.restore_checkpoint(latest, state)
            for dd, kk in (meta.get("k_by_d") or {}).items():
                self._k_by_d[int(dd)] = int(kk)
            for dd, kk in (meta.get("tpg_by_d") or {}).items():
                self._tpg_by_d[int(dd)] = int(kk)
            print(f"Resumed from {latest} at step {int(state.step)}")
        return state

    # ------------------------------------------------- crash-proof dispatch

    def _apply_crash_policy(self) -> None:
        """Refuse, by execution evidence, the configuration that killed a
        previous run. The memory gate's prediction demonstrably cannot
        cover every (capacity, bucket, K) the adaptive schedule visits —
        round 3's 1080p run died at a K-growth executable the capacity
        gate never probed — so the unmatched journal attempt IS the
        measurement: crashed capacity growth -> that capacity is refused
        permanently; crashed K growth -> that bucket's K is capped below
        the killing value; crashed eval render -> eval K capped. Re-applied
        idempotently from ALL unmatched journal attempts on every startup —
        a config that killed the worker once stays refused forever —
        UNLESS it is within the ``journal_retry`` amnesty budget: a single
        kill on a shared chip can be a co-tenant's fault (round-3
        finding), so a config with crash count <= journal_retry is
        re-attempted; crashing again raises its count past the budget and
        the refusal becomes permanent."""
        retry_budget = getattr(self.config, "journal_retry", 0)
        for c, count in self._journal.crashed_with_counts():
            if count <= retry_budget:
                print(
                    f"CRASH POLICY: config {c} crashed {count}x "
                    f"(<= journal_retry={retry_budget}); granting amnesty "
                    f"and re-attempting — a second crash refuses it "
                    f"permanently"
                )
                continue
            self._apply_one_crash(c)

    def _apply_one_crash(self, c: Dict) -> None:
        cap_now = int(self.state.params.capacity)
        kind = c.get("kind", "?")
        if int(c.get("capacity", 0)) > cap_now:
            bad = int(c["capacity"])
            self._grow_refused.add(bad)
            print(
                f"CRASH POLICY: a previous run died executing {kind} at "
                f"capacity {bad} (> restored {cap_now}); refusing growth "
                f"to {bad} for this run (journal {self._journal.path})"
            )
        elif kind == "step" and "d" in c and "k" in c:
            d, k = int(c["d"]), int(c["k"])
            capped = max(k // 2, 128)
            self._k_crash_cap[d] = capped
            if self._k_by_d.get(d, 0) >= k:
                self._k_by_d[d] = capped
            print(
                f"CRASH POLICY: a previous run died executing the train "
                f"step at 1/{d} res with K={k}; capping this bucket's "
                f"max_per_tile at {capped} (quality may be truncation-"
                f"bounded — check tile_overflow)"
            )
        elif kind == "eval" and "k" in c:
            self._eval_k_cap = max(int(c["k"]) // 2, 128)
            print(
                f"CRASH POLICY: a previous run died in an eval render at "
                f"K={c['k']}; capping eval K at {self._eval_k_cap}"
            )
        else:  # refine or unknown at the current capacity
            self._grow_refused.add(min(cap_now * 2, self.cfg.max_capacity))
            self._densify_frozen_until = (
                int(self.state.step) + self.config.divergence_freeze_steps
            )
            print(
                f"CRASH POLICY: a previous run died executing {kind} at "
                f"the current capacity {cap_now}; freezing densification "
                f"until step {self._densify_frozen_until} and refusing "
                f"further growth"
            )

    def _dispatch_journaled(self, key: Dict, fn, *args):
        """Run one device dispatch; if its executable configuration was
        never witnessed this process, record it (attempt -> dispatch ->
        force completion -> ok) so a worker kill is attributed to exactly
        this configuration. Witnessed configs dispatch with zero overhead
        (their memory footprint is static — if the first dispatch fit,
        every later one does)."""
        fkey = frozenset(key.items())
        is_new = fkey not in self._witnessed
        if is_new:
            self._journal.attempt(**key)
        out = fn(*args)
        if is_new:
            # force real completion before writing ok: block_until_ready
            # can return early through the tunneled backend, so fetch the
            # smallest output leaf to the host
            leaves = [
                leaf for leaf in jax.tree.leaves(out)
                if hasattr(leaf, "shape")
            ]
            if leaves:
                np.asarray(min(leaves, key=lambda x: x.size))
            self._journal.ok(**key)
            self._witnessed.add(fkey)
        return out

    @staticmethod
    def _device_lost(e: Exception) -> bool:
        """True for errors after which the process must restart: the TPU
        worker died and took every device buffer with it."""
        s = f"{type(e).__name__}: {e}"
        return any(m in s for m in (
            "UNAVAILABLE", "worker process crashed", "DATA_LOSS",
            "device is lost",
        ))

    def _test_crash_hook(self, step: int) -> None:
        """QED_CRASH_ONCE_AT=<step>: simulate a TPU worker kill (hard
        process exit, no cleanup) the first time ``step`` is reached —
        drives the supervisor/journal recovery tests end to end."""
        import os

        at = os.environ.get("QED_CRASH_ONCE_AT")
        if not at:
            return
        marker = self.run_dir / ".crash_once_done"
        if step >= int(at) and not marker.exists():
            marker.write_text(str(step))
            print(f"TEST HOOK: simulating worker kill at step {step}",
                  flush=True)
            os._exit(41)

    # ------------------------------------------------------- step plumbing

    def _downscale_factor(self, step: int) -> int:
        """2^max(num_downscales - step // schedule, 0) (splatfacto)."""
        return 2 ** max(
            self.cfg.num_downscales - step // self.cfg.resolution_schedule, 0
        )

    def _get_step_fn(self, width, height, has_depth, has_mask, capacity,
                     need_absgrad=True):
        key = (width, height, has_depth, has_mask, capacity, need_absgrad,
               self.cfg.max_per_tile)
        if key not in self._step_fns:
            self._step_fns[key] = make_train_step(
                self.cfg, self.optims, width, height,
                has_depth=has_depth, has_mask=has_mask,
                need_absgrad=need_absgrad,
            )
        return self._step_fns[key]

    def _get_sharded_step_fn(self, width, height, has_depth, has_mask,
                             capacity):
        from qed_splatter_tpu.parallel.dp import make_sharded_train_step

        key = (width, height, has_depth, has_mask, capacity,
               self.cfg.max_per_tile)
        if key not in self._sharded_fns:
            self._sharded_fns[key] = make_sharded_train_step(
                self.cfg, self.optims, width, height, self.mesh,
                has_depth=has_depth, has_mask=has_mask,
            )
        return self._sharded_fns[key]

    def _prepare_sharded_batch(self, items, d: int):
        """Stack B per-camera batches (homogeneous sizes assumed)."""
        parts = [self._prepare_batch(item, d) for item in items]
        batches = [p[0] for p in parts]
        cam = parts[0][1]
        has_depth = parts[0][2]
        has_mask = parts[0][3]
        stacked = {
            k: jnp.stack([b[k] for b in batches]) for k in batches[0]
        }
        return stacked, cam, has_depth, has_mask

    def _prepare_batch(self, item: Dict, d: int):
        cam = item["camera"].rescaled(1.0 / d) if d > 1 else item["camera"]
        rgb = downscale_image(item["image"], d)
        rgb = np.asarray(rgb, np.float32) / 255.0
        batch = dict(
            c2w=jnp.asarray(cam.c2w),
            K=jnp.asarray(cam.intrinsics_matrix()),
            cam_idx=jnp.asarray(item["cam_idx"], jnp.int32),
            rgb=jnp.asarray(rgb),
        )
        has_depth = "depth_image" in item
        if has_depth:
            batch["depth"] = jnp.asarray(
                downscale_depth(item["depth_image"], d)
            )
        has_mask = "mask" in item
        if has_mask:
            m = downscale_image(item["mask"] * 255.0, d) / 255.0
            batch["mask"] = jnp.asarray((m > 0.5).astype(np.float32))
        return batch, cam, has_depth, has_mask

    @staticmethod
    def _grown_state(state: TrainState, new_cap: int) -> TrainState:
        """Pure capacity-growth transformation (eval_shape-able, so the
        memory gate can derive the grown shapes without allocating)."""
        params = state.params
        cap = params.capacity
        grown = grow_capacity(params, new_cap)
        # padded slots must hold benign values: a zero quat (from
        # jnp.pad) has a NaN-gradient normalization that poisons the
        # whole backward pass (first observed at the first growth)
        grown = grown.replace(
            quats=jnp.where(
                jnp.arange(new_cap)[:, None] < cap,
                grown.quats,
                jnp.asarray([1.0, 0.0, 0.0, 0.0]),
            )
        )

        def pad_leaf(x):
            pad = [(0, new_cap - cap)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, pad)

        # Adam moment leaves (mu/nu) have exactly their param's shape;
        # count scalars and any non-moment leaf pass through. Matching
        # against the param template (not a bare shape[0] == capacity
        # heuristic) cannot collide with unrelated same-length leaves.
        old_params = params.trainable_dict()
        opt_state = {
            k: jax.tree.map(
                lambda x: pad_leaf(x)
                if getattr(x, "shape", None) == old_params[k].shape
                else x,
                state.opt_state[k],
            )
            for k in state.opt_state
        }
        # DensifyStats leaves are all capacity-dim by construction
        stats = jax.tree.map(pad_leaf, state.stats)
        return state.replace(params=grown, opt_state=opt_state, stats=stats)

    # --------------------------------------------- memory-gated growth

    @staticmethod
    def _abstract(tree):
        return jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype)
            if not isinstance(x, jax.ShapeDtypeStruct) else x,
            tree,
        )

    @staticmethod
    def _exe_peak_bytes(compiled) -> Optional[int]:
        """Peak HBM of one executable run: live arguments + outputs
        (minus donation aliasing) + XLA temporaries."""
        try:
            ana = compiled.memory_analysis()
        except Exception:
            return None
        if ana is None:
            return None
        get = lambda f: int(getattr(ana, f, 0) or 0)  # noqa: E731
        return (
            get("argument_size_in_bytes") + get("output_size_in_bytes")
            - get("alias_size_in_bytes") + get("temp_size_in_bytes")
        )

    # nominal HBM by device kind — the fallback when the backend exposes no
    # memory_stats (observed: the tunneled 'axon' TPU platform returns
    # None, which left the growth gate blind and let a growth crash the
    # worker). QED_HBM_BYTES overrides both (e.g. with the measured usable
    # limit from tools/measure_hbm.py, which is what actually matters on a
    # shared/tunneled chip).
    _HBM_BY_KIND = (
        ("v5 lite", 16e9), ("v5e", 16e9), ("v5p", 95e9),
        ("v6 lite", 32e9), ("v6e", 32e9),
        ("v4", 32e9), ("v3", 16e9), ("v2", 8e9),
    )

    @staticmethod
    def _device_memory_stats() -> dict:
        """HBM accounting of device 0. Falls back to QED_HBM_BYTES or a
        device-kind nominal limit when the backend has no memory_stats
        ({} only when nothing at all is known, e.g. CPU)."""
        import os

        dev = None
        stats: dict = {}
        try:
            dev = jax.local_devices()[0]
            stats = dict(dev.memory_stats() or {})
        except Exception:
            pass
        if not stats.get("bytes_limit"):
            env = os.environ.get("QED_HBM_BYTES")
            if env:
                stats["bytes_limit"] = int(float(env))
            elif dev is not None and getattr(dev, "platform", "") == "tpu":
                kind = getattr(dev, "device_kind", "").lower()
                for sub, val in Trainer._HBM_BY_KIND:
                    if sub in kind:
                        stats["bytes_limit"] = int(val)
                        break
        return stats

    def _probe_grown_compiles(self, cur: int, max_hw: int,
                              new_cap: int) -> Tuple[bool, str]:
        """AOT-compile the train dispatch and the refine pass at the grown
        capacity, and check their XLA memory analysis against the device
        HBM budget. Returns (ok, reason, transient) — ``transient`` marks
        refusals worth retrying later (compile hiccups) vs deterministic
        budget overruns. The compiled executables are cached so a committed
        growth pays no second compile.

        Both observed failure modes of an over-large growth — a compile
        error (round-3 first crash: remote-compile HTTP 500 at 3.58M) and
        a mid-step TPU worker kill (round-3 second crash) — become a
        refusal here: training continues at the current capacity with the
        priority-capped densifier degrading gracefully."""
        grown_abs = jax.eval_shape(
            lambda s: self._grown_state(s, new_cap), self.state
        )
        rng_abs = jax.ShapeDtypeStruct((2,), jnp.uint32)
        step_abs = jax.ShapeDtypeStruct((), jnp.int32)
        peaks = []
        resident_args = sum(
            int(np.prod(l.shape)) * l.dtype.itemsize
            for l in jax.tree.leaves(self.state)
            if hasattr(l, "shape")
        )
        try:
            # --- refine at the grown capacity (first round-3 crash site) ---
            lowered = self._refine_jit.lower(
                grown_abs.params, grown_abs.opt_state, grown_abs.stats,
                step_abs, rng_abs, self.cfg,
                num_train_data=self.dm.num_train, max_hw=max_hw,
            )
            refine_exec = lowered.compile()
            peaks.append(self._exe_peak_bytes(refine_exec))
            rkey = (new_cap, max_hw, self.dm.num_train, self.cfg)
            self._refine_exec[rkey] = refine_exec

            # --- the next train dispatch at the grown capacity ---
            d = self._downscale_factor(cur)
            need_absgrad = cur < self.cfg.stop_split_at
            if self.mesh is None and self._use_scan():
                chunk = self._dispatch_chunk()
                skey = ("scan", d, chunk, need_absgrad, new_cap,
                        self.cfg.max_per_tile)
                call, ds = self._get_scan_fn(
                    d, chunk, need_absgrad=need_absgrad, capacity=new_cap
                )
                resident_args += ds.nbytes()
                perm_abs = jax.ShapeDtypeStruct((chunk,), jnp.int32)
                data_abs = self._abstract(ds.data)
                step_exec = call._jitted.lower(
                    grown_abs, perm_abs, rng_abs, data_abs
                ).compile()

                def scan_call(state, perm, rng, _exec=step_exec, _ds=ds):
                    return _exec(state, perm, rng, _ds.data)

                scan_call._jitted = call._jitted
                self._step_fns[skey] = scan_call
                peaks.append(self._exe_peak_bytes(step_exec))
            # mesh / per-step paths: refine (probed above) is the growth-
            # adjacent compile; the step executable is left to normal jit.
        except Exception as e:  # compile failure = refusal, not a crash.
            # "transient": compile errors (e.g. a remote-compile HTTP 500)
            # are retried at a later cadence; only deterministic budget
            # overruns below refuse permanently.
            return False, f"grown-capacity compile failed: {e!r}", True

        peaks = [p for p in peaks if p]
        mstats = self._device_memory_stats()
        limit = mstats.get("bytes_limit")
        pk_msg = f"exe peaks {[round(p / 1e9, 2) for p in peaks]} GB"
        if not peaks or not limit:
            return True, f"no device memory limit known; {pk_msg}", False
        # residents the step does not list as arguments (eval renderer
        # consts, other resolution buckets' image caches, ...)
        if mstats.get("bytes_in_use"):
            other = max(int(mstats["bytes_in_use"]) - resident_args, 0)
        else:
            # no live accounting (limit came from QED_HBM_BYTES or the
            # device-kind table): at least count the device image caches
            # of the OTHER resolution buckets (the current bucket's cache
            # is an executable argument already)
            other = sum(
                v.nbytes() for kk, v in self._step_fns.items()
                if isinstance(kk, tuple) and kk and kk[0] == "devds"
                and hasattr(v, "nbytes")
            )
        need = other + max(peaks)
        budget = self.cfg.grow_memory_fraction * limit
        msg = (f"{pk_msg} + {other / 1e9:.2f} GB other residents = "
               f"projected {need / 1e9:.2f} GB vs budget "
               f"{budget / 1e9:.2f} GB ({self.cfg.grow_memory_fraction:.2f}"
               f" x {limit / 1e9:.2f} GB HBM)")
        return need <= budget, msg, False

    def _maybe_grow(self, cur: int = 0,
                    max_hw: int = 0) -> Optional[Tuple[int, int]]:
        """Returns (pre_growth_capacity, new_capacity) when a growth was
        committed this call (the caller's next dispatch is the canary —
        see _callbacks), else None."""
        params = self.state.params
        n_alive = int(params.num_alive())
        cap = params.capacity
        if n_alive > 0.85 * cap and cap < self.cfg.max_capacity:
            new_cap = min(cap * 2, self.cfg.max_capacity)
            if new_cap in self._grow_refused:
                return None
            if cur < self._grow_retry_at.get(new_cap, 0):
                return None  # transient probe failure: retry later
            if max_hw <= 0:  # direct callers without a batch in flight
                cam = self.dm.get_item(int(self.dm.train_indices[0]))["camera"]
                d = self._downscale_factor(cur)
                if d > 1:
                    cam = cam.rescaled(1.0 / d)
                max_hw = max(cam.width, cam.height)
            ok, why, transient = self._probe_grown_compiles(
                cur, max_hw, new_cap
            )
            if not ok:
                print(
                    f"REFUSING gaussian capacity growth {cap} -> {new_cap}:"
                    f" {why}. Continuing at capacity {cap}; densification"
                    " is priority-capped to the remaining free slots."
                )
                if transient:
                    self._grow_retry_at[new_cap] = (
                        cur + 10 * self.cfg.refine_every
                    )
                else:
                    self._grow_refused.add(new_cap)
                return None
            # commit-after-proof: the compile probe is only a cheap first
            # filter (round 3 proved its arithmetic can pass while the
            # chip dies). Save a pre-growth checkpoint, THEN swap in the
            # grown state; the very next dispatch acts as the canary and
            # _callbacks restores this checkpoint + refuses the capacity
            # if it fails in-process (a worker kill instead leaves the
            # journal witness for the supervisor restart).
            ckpt.save_checkpoint(
                self.run_dir / "pregrow", self.state, cur,
                dataparser_transform=self.dm.scene.transform_matrix,
                dataparser_scale=self.dm.scene.scale_factor,
                model_config=self.cfg,
                k_by_d=self._k_by_d,
                tpg_by_d=self._tpg_by_d,
            )
            print(f"Growing gaussian capacity {cap} -> {new_cap} ({why}; "
                  f"pre-growth checkpoint at step {cur})")
            self.state = self._grown_state(self.state, new_cap)
            return (int(cap), int(new_cap))
        return None

    def _revert_growth(self, cur: int, pre_cap: int, new_cap: int,
                       err: Exception) -> None:
        """Canary dispatch failed in-process: restore the pre-growth
        checkpoint and refuse this capacity permanently."""
        print(
            f"GROWTH CANARY FAILED at step {cur} (capacity {pre_cap} -> "
            f"{new_cap}): {type(err).__name__}: {str(err)[:300]}. "
            f"Restoring the pre-growth checkpoint and refusing capacity "
            f"{new_cap}."
        )
        latest = ckpt.latest_checkpoint(self.run_dir / "pregrow")
        template = self._template_for_capacity(pre_cap)
        self.state = ckpt.restore_checkpoint(latest, template)
        self._grow_refused.add(new_cap)

    # ------------------------------------------------------------- train

    def _callbacks(self, cur: int, max_hw: int, key):
        """Refine / eval / checkpoint cadences shared by both train loops."""
        cfgt = self.config
        if (
            cur > self.cfg.warmup_length
            and cur % self.cfg.refine_every == 0
            and cur >= self._densify_frozen_until
        ):
            grown = self._maybe_grow(cur, max_hw)
            key, sub = jax.random.split(key)

            def _refine_dispatch():
                rkey = (int(self.state.params.capacity), max_hw,
                        self.dm.num_train, self.cfg)
                refine_fn = self._refine_exec.get(rkey)
                jrec = dict(kind="refine",
                            capacity=int(self.state.params.capacity),
                            max_hw=int(max_hw))
                if refine_fn is not None:
                    # AOT executable compiled by the growth memory gate
                    return self._dispatch_journaled(
                        jrec, refine_fn,
                        self.state.params, self.state.opt_state,
                        self.state.stats, self.state.step, sub,
                    )
                return self._dispatch_journaled(
                    jrec,
                    lambda *a: self._refine_jit(
                        *a, self.cfg, num_train_data=self.dm.num_train,
                        max_hw=max_hw,
                    ),
                    self.state.params, self.state.opt_state,
                    self.state.stats, self.state.step, sub,
                )

            try:
                params, opt_state, stats, info = _refine_dispatch()
            except Exception as e:
                # growth canary: the first dispatch at a freshly grown
                # capacity failing IN-PROCESS reverts the growth and
                # refuses the capacity (worker kills re-raise for the
                # supervisor; the journal witnesses the config)
                if grown is None or self._device_lost(e):
                    raise
                self._revert_growth(cur, grown[0], grown[1], e)
                params, opt_state, stats, info = _refine_dispatch()
            params, opt_state = self._reset_jit(
                params, opt_state, self.state.step, self.cfg
            )
            self.state = self.state.replace(
                params=params, opt_state=opt_state, stats=stats
            )
            self.writer.write(
                cur,
                {
                    "n_alive": info.n_alive,
                    "n_culled": info.n_culled,
                    "n_split": info.n_split,
                    "n_dup": info.n_dup,
                    "n_dropped": info.n_dropped,
                },
                prefix="refine",
            )
        if cfgt.steps_per_eval_image and cur % cfgt.steps_per_eval_image == 0:
            self.eval_image(cur)
        if cfgt.steps_per_eval_batch and cur % cfgt.steps_per_eval_batch == 0:
            self.eval_batch(cur)
        if (
            cfgt.steps_per_eval_all_images
            and cur % cfgt.steps_per_eval_all_images == 0
        ):
            self.eval_all(cur)
        if cfgt.steps_per_save and cur % cfgt.steps_per_save == 0:
            ckpt.save_checkpoint(
                self.run_dir / "ckpts", self.state, cur,
                dataparser_transform=self.dm.scene.transform_matrix,
                dataparser_scale=self.dm.scene.scale_factor,
                model_config=self.cfg,
                k_by_d=self._k_by_d,
                tpg_by_d=self._tpg_by_d,
            )
            # record as rollback target only if the canary says the saved
            # params are finite (a poisoned checkpoint must never be the
            # thing a divergence rolls back TO)
            if self._state_finite():
                self._good_ckpt = (cur, int(self.state.params.capacity))
        return key

    # ------------------------------------------------- divergence handling

    def _state_finite(self) -> bool:
        """Cheap canary over the parameter buffers + camera deltas. Needed
        in addition to the loss check: a fully poisoned model renders pure
        background (every NaN row is radii-0-masked) with a perfectly
        finite loss — the round-2 zombie run, one abstraction level up."""
        p = self.state.params
        s = (
            jnp.sum(p.means) + jnp.sum(p.scales) + jnp.sum(p.quats)
            + jnp.sum(p.opacities) + jnp.sum(self.state.camera_opt)
        )
        return bool(np.isfinite(np.asarray(s)))

    def _handle_divergence(self, step: int) -> int:
        """Non-finite loss seen this dispatch: post-mortem, then roll back
        to the last finite checkpoint (densification frozen for
        ``divergence_freeze_steps``) or halt per ``on_divergence``.
        Returns the step to continue from."""
        mode = self.config.on_divergence
        print(f"DIVERGENCE at step {step}: non-finite loss "
              f"(policy={mode}, rollbacks so far={self._rollbacks})")
        try:
            ckpt.save_checkpoint(
                self.run_dir / "postmortem", self.state, step,
                dataparser_transform=self.dm.scene.transform_matrix,
                dataparser_scale=self.dm.scene.scale_factor,
                model_config=self.cfg,
                k_by_d=self._k_by_d,
                tpg_by_d=self._tpg_by_d,
            )
            print(f"Post-mortem state saved to {self.run_dir/'postmortem'}")
        except Exception as e:  # post-mortem is best-effort
            print(f"post-mortem save failed: {e}")
        if mode == "ignore":
            return step
        if (
            mode == "rollback"
            and self._good_ckpt is not None
            and self._rollbacks < self.config.max_rollbacks
        ):
            good_step, good_cap = self._good_ckpt
            path = self.run_dir / "ckpts" / f"step-{good_step:09d}"
            template = self._template_for_capacity(good_cap)
            self.state = ckpt.restore_checkpoint(path, template)
            self._rollbacks += 1
            self._densify_frozen_until = (
                good_step + self.config.divergence_freeze_steps
            )
            print(
                f"Rolled back to finite checkpoint step {good_step} "
                f"(capacity {good_cap}); densification frozen until "
                f"step {self._densify_frozen_until}"
            )
            return good_step
        raise TrainingDiverged(
            f"training diverged at step {step} and could not roll back "
            f"(mode={mode}, good_ckpt={self._good_ckpt}, "
            f"rollbacks={self._rollbacks}/{self.config.max_rollbacks}); "
            f"post-mortem under {self.run_dir/'postmortem'}"
        )

    def _template_for_capacity(self, cap: int) -> TrainState:
        """A TrainState with the given capacity for checkpoint restore."""
        if cap == int(self.state.params.capacity):
            return self.state
        params = init_random(
            num_points=16, capacity=cap, sh_degree=self.cfg.sh_degree
        )
        return init_train_state(
            params, self.optims,
            num_cameras=int(self.state.camera_opt.shape[0]),
            use_bilateral_grid=self.cfg.use_bilateral_grid,
            bilateral_grid_shape=self.cfg.bilateral_grid_shape,
        )

    def _viewer_gate(self) -> None:
        """Block between dispatches while the viewer has training paused
        (the viser trainer-controls analog)."""
        if self.viewer is None:
            return
        while self.viewer.state.paused:
            time.sleep(0.3)

    def _dispatch_chunk(self) -> int:
        """Steps per dispatch: explicit, or gcd of all step cadences."""
        import math

        if self.config.steps_per_dispatch:
            return self.config.steps_per_dispatch
        cads = [
            self.cfg.refine_every, self.cfg.warmup_length,
            self.cfg.resolution_schedule, self.cfg.stop_split_at,
            self.cfg.stop_screen_size_at,
            self.config.steps_per_eval_image,
            self.config.steps_per_eval_all_images,
            self.config.steps_per_save, self.config.max_num_iterations,
            self.config.log_every,
        ]
        g = 0
        for c in cads:
            if c:
                g = math.gcd(g, int(c))
        return max(1, min(g or 1, 100))

    def _device_dataset(self, d: int):
        from qed_splatter_tpu.engine.scan_runner import DeviceDataset

        key = ("devds", d)
        if key not in self._step_fns:
            items = [
                self.dm.get_item(int(i)) for i in self.dm.train_indices
            ]
            self._step_fns[key] = DeviceDataset(
                items, d, downscale_image, downscale_depth
            )
        return self._step_fns[key]

    def _get_scan_fn(self, d: int, chunk: int, need_absgrad: bool,
                     capacity: int):
        from qed_splatter_tpu.engine.scan_runner import make_scan_steps

        ds = self._device_dataset(d)
        key = ("scan", d, chunk, need_absgrad, capacity,
               self.cfg.max_per_tile)
        if key not in self._step_fns:
            self._step_fns[key] = make_scan_steps(
                self.cfg, self.optims, ds, chunk,
                need_absgrad=need_absgrad,
            )
        return self._step_fns[key], ds

    def _k_for(self, d: int) -> int:
        """Per-resolution-bucket adaptive K. A bucket seen for the first
        time is SEEDED from the coarser buckets already visited (their max)
        rather than the config default: re-entering every bucket at K=512
        gave the round-2 run a 153k-dropped-intersections/step truncation
        shock at the 1/2->1/1 switch (the chunk where it diverged). Carrying
        K forward is conservative; the shrink path below recovers the
        throughput if the finer bucket needs less."""
        if d not in self._k_by_d:
            coarser = [k for dd, k in self._k_by_d.items() if dd > d]
            self._k_by_d[d] = max([self.config.model.max_per_tile, *coarser])
        cap = self._k_crash_cap.get(d)
        if cap is not None and self._k_by_d[d] > cap:
            self._k_by_d[d] = cap
        return self._k_by_d[d]

    def _maybe_adapt_k(self, overflow, max_count, width: int, height: int,
                       d: int) -> None:
        """Adaptive per-tile K (both directions, per resolution bucket).

        Grow (x2, up to the limit) when the K cap truncates >10% of
        per-tile intersections: truncation drops whole occluded surfaces,
        near-biases depth, and feeds a truncation->error->densify runaway
        (the round-2 root cause). Shrink (to the next pow2 covering
        1.25x the measured max per-tile count) when K is >2.5x oversized:
        compositing cost is linear in K, so an oversized K from a coarse
        bucket or an earlier densification phase wastes most of the
        rasterizer. Each change is one bounded recompile.
        """
        cfg = self.cfg
        if not cfg.adaptive_max_per_tile or overflow is None:
            return
        k_now = self._k_for(d)
        ts = cfg.tile_size
        t = (-(-width // ts)) * (-(-height // ts))
        # a K that killed a previous run caps this bucket below the
        # crash value (journal crash policy) regardless of overflow
        k_limit = min(cfg.max_per_tile_limit,
                      self._k_crash_cap.get(d, cfg.max_per_tile_limit))
        if overflow > 0.10 * t * k_now and k_now < k_limit:
            new_k = min(k_now * 2, k_limit)
            print(f"Growing max_per_tile {k_now} -> {new_k} at 1/{d} res "
                  f"(tile_overflow {overflow:.0f})")
            self._k_by_d[d] = new_k
        elif (
            max_count is not None
            and max_count * 2.5 < k_now
            and k_now > min(512, cfg.max_per_tile)
        ):
            import math

            fit = 2 ** math.ceil(math.log2(max(max_count * 1.25, 1.0)))
            new_k = max(int(fit), min(512, cfg.max_per_tile))
            if new_k < k_now:
                print(f"Shrinking max_per_tile {k_now} -> {new_k} at 1/{d} "
                      f"res (max per-tile count {max_count:.0f})")
                self._k_by_d[d] = new_k

    def _tpg_for(self, d: int) -> int:
        """Pair-expansion budget for bucket 1/d (see _k_for's rationale —
        finer buckets inherit the max of coarser ones as a floor)."""
        if d not in self._tpg_by_d:
            coarser = [k for dd, k in self._tpg_by_d.items() if dd > d]
            self._tpg_by_d[d] = max(
                [self.config.model.small_tiles_per_gaussian, *coarser]
            )
        return self._tpg_by_d[d]

    def _maybe_adapt_tpg(self, bbox_truncated, d: int) -> None:
        """Grow the hierarchical pair-expansion budget (x2, up to
        max_tiles_per_gaussian) when >0.5% of alive splats lose bbox
        cells: a truncated splat keeps an arbitrary top-rows subset of
        its bbox, so heavy truncation produces banding artifacts and a
        collapse the photometric loss cannot fix (round-5 config-2: the
        1/1-res phase after coarse-res growth truncated 130k of 614k
        splats; train PSNR fell 33 -> 16). One bounded recompile per
        doubling, mirroring adaptive K."""
        cfg = self.cfg
        if not cfg.adaptive_pair_budget or bbox_truncated is None:
            return
        tpg_now = self._tpg_for(d)
        alive = max(int(self.state.params.num_alive()), 1)
        if (bbox_truncated > 0.005 * alive
                and tpg_now < cfg.max_tiles_per_gaussian):
            new_tpg = min(tpg_now * 2, cfg.max_tiles_per_gaussian)
            print(f"Growing pair budget {tpg_now} -> {new_tpg} at 1/{d} "
                  f"res (bbox_truncated {bbox_truncated:.0f} of {alive})")
            self._tpg_by_d[d] = new_tpg

    def _use_scan(self) -> bool:
        if self.mesh is not None or self.config.steps_per_dispatch == 1:
            return False
        if self._dispatch_chunk() <= 1:
            return False
        item = self.dm.get_item(int(self.dm.train_indices[0]))
        per = item["image"].nbytes + (
            item["depth_image"].nbytes if "depth_image" in item else 0
        )
        total = per * self.dm.num_train * 2  # + downscale buckets
        return total <= self.config.max_device_cache_bytes

    def train(self, max_steps: Optional[int] = None,
              finalize: bool = True) -> TrainState:
        """Train to ``max_steps`` (default: the configured budget).
        ``finalize=False`` skips the end-of-training checkpoint + PLY
        export — for callers that interleave partial budgets across
        scenes (engine.multi_scene) and finalize once at the end."""
        if self._use_scan():
            return self._train_scan(max_steps, finalize)
        return self._train_per_step(max_steps, finalize)

    def finalize(self, total: Optional[int] = None) -> None:
        """End-of-training checkpoint + splat export."""
        ckpt.save_checkpoint(
            self.run_dir / "ckpts", self.state,
            total if total is not None else int(self.state.step),
            dataparser_transform=self.dm.scene.transform_matrix,
            dataparser_scale=self.dm.scene.scale_factor,
            model_config=self.cfg,
            k_by_d=self._k_by_d,
        )
        meta = ckpt.checkpoint_meta(self.run_dir / "ckpts")
        ckpt.export_ply(self.run_dir / "splat.ply", self.state.params, meta)

    def _train_scan(self, max_steps: Optional[int] = None,
                    do_finalize: bool = True) -> TrainState:
        """Multi-step scan dispatch: one device call per chunk of steps,
        sampling cameras from a device-resident uint8 image cache
        (engine.scan_runner) — amortizes host dispatch overhead that
        otherwise bounds small-resolution throughput."""
        cfgt = self.config
        total = max_steps or cfgt.max_num_iterations
        chunk = self._dispatch_chunk()
        start_step = int(self.state.step)
        t0 = time.perf_counter()
        step = start_step
        while step < total:
            self._viewer_gate()
            n = min(chunk, total - step)
            d = self._downscale_factor(step)
            while len(self._queue) < n:
                self._queue.extend(
                    self._np_rng.permutation(self.dm.num_train).tolist()
                )
            perm = jnp.asarray(np.asarray(self._queue[:n], np.int32))
            self._queue = self._queue[n:]
            import dataclasses as _dc

            if (self.cfg.max_per_tile != self._k_for(d)
                    or self.cfg.small_tiles_per_gaussian
                    != self._tpg_for(d)):
                self.cfg = _dc.replace(
                    self.cfg, max_per_tile=self._k_for(d),
                    small_tiles_per_gaussian=self._tpg_for(d),
                )
            scan_fn, ds = self._get_scan_fn(
                d, n, need_absgrad=(step < self.cfg.stop_split_at),
                capacity=self.state.params.capacity,
            )
            self._key, sub = jax.random.split(self._key)
            jrec = dict(
                kind="step", capacity=int(self.state.params.capacity),
                d=int(d), k=int(self.cfg.max_per_tile), chunk=int(n),
            )
            self.state, metrics = self._dispatch_journaled(
                jrec, scan_fn, self.state, perm, sub
            )
            step += n
            self._test_crash_hook(step)
            # per-chunk reductions, not just the last step: a loss spike or
            # first-NaN inside the chunk must be visible (round-2 weak #7)
            marr = {k: np.asarray(v) for k, v in metrics.items()}
            last = {k: float(v[-1]) for k, v in marr.items()}
            last["gaussian_count"] = int(self.state.params.num_alive())
            last["loss_max"] = float(np.max(marr["loss"]))
            if "nonfinite_grads" in marr:
                last["nonfinite_grads"] = float(np.sum(marr["nonfinite_grads"]))
            overflow = (
                float(np.max(marr["tile_overflow"]))
                if "tile_overflow" in marr else None
            )
            tmc = (
                float(np.max(marr["tile_max_count"]))
                if "tile_max_count" in marr else None
            )
            self._maybe_adapt_k(overflow, tmc, ds.width, ds.height, d)
            self._maybe_adapt_tpg(last.get("bbox_truncated"), d)
            self.writer.write(step, last, prefix="train")
            if self.viewer is not None:
                self.viewer.update(self.state.params, step, metrics=last)
            if not bool(np.isfinite(marr["loss"]).all()) or (
                not self._state_finite()
            ):
                step = self._handle_divergence(step)
                self._reseed_sampling()
                continue
            self._key = self._callbacks(
                step, max(ds.width, ds.height), self._key
            )
        wall = time.perf_counter() - t0
        done = total - start_step
        if done > 0:
            print(
                f"Trained {done} steps in {wall:.1f}s "
                f"({done / max(wall, 1e-9):.2f} iters/s, chunk={chunk})"
            )
        if do_finalize:
            self.finalize(total)
        return self.state

    def _train_per_step(self, max_steps: Optional[int] = None,
                        do_finalize: bool = True) -> TrainState:
        cfgt = self.config
        total = max_steps or cfgt.max_num_iterations
        start_step = int(self.state.step)
        t0 = time.perf_counter()
        step = start_step
        # lagged divergence watch: step N's loss is checked after step N+1
        # is dispatched, so detection costs no pipeline stall and a NaN
        # trains at most ONE extra step (the scan path checks per chunk)
        prev_loss = None
        while step < total:
            self._viewer_gate()
            if self.config.profile_dir and step == start_step + 10:
                jax.profiler.start_trace(self.config.profile_dir)
            d = self._downscale_factor(step)
            if (self.cfg.max_per_tile != self._k_for(d)
                    or self.cfg.small_tiles_per_gaussian
                    != self._tpg_for(d)):
                import dataclasses as _dc

                self.cfg = _dc.replace(
                    self.cfg, max_per_tile=self._k_for(d),
                    small_tiles_per_gaussian=self._tpg_for(d),
                )
            if self.mesh is not None:
                items = self.dm.next_train_batch(
                    step, self.config.num_data_shards
                )
                batch, cam, has_depth, has_mask = (
                    self._prepare_sharded_batch(items, d)
                )
                step_fn = self._get_sharded_step_fn(
                    cam.width, cam.height, has_depth, has_mask,
                    self.state.params.capacity,
                )
            else:
                item = self.dm.next_train(step)
                batch, cam, has_depth, has_mask = self._prepare_batch(item, d)
                step_fn = self._get_step_fn(
                    cam.width, cam.height, has_depth, has_mask,
                    self.state.params.capacity,
                    # absgrad stats only matter while densification can run
                    need_absgrad=(step < self.cfg.stop_split_at),
                )
            self._key, sub = jax.random.split(self._key)
            jrec = dict(
                kind="step", capacity=int(self.state.params.capacity),
                d=int(d), k=int(self.cfg.max_per_tile),
                w=int(cam.width), h=int(cam.height),
                sharded=self.mesh is not None,
            )
            self.state, metrics = self._dispatch_journaled(
                jrec, step_fn, self.state, batch, sub
            )
            cur = step + 1
            step = cur
            self._test_crash_hook(cur)
            if self.config.profile_dir and cur == start_step + 15:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()

            # check the PREVIOUS dispatch's loss (already complete, so the
            # fetch is free) — every step, not only on log cadence
            if prev_loss is not None and not np.isfinite(
                float(np.asarray(prev_loss))
            ):
                step = self._handle_divergence(cur - 1)
                self._reseed_sampling()
                prev_loss = None
                continue
            prev_loss = metrics["loss"]

            if cur % cfgt.log_every == 0:
                host = {k: float(np.asarray(v)) for k, v in metrics.items()}
                self.writer.write(cur, host, prefix="train")
                if self.viewer is not None:
                    self.viewer.update(self.state.params, cur, metrics=host)
                self._maybe_adapt_k(
                    host.get("tile_overflow"), host.get("tile_max_count"),
                    cam.width, cam.height, d,
                )
                self._maybe_adapt_tpg(host.get("bbox_truncated"), d)
                if not np.isfinite(host["loss"]) or not self._state_finite():
                    step = self._handle_divergence(cur)
                    self._reseed_sampling()
                    prev_loss = None
                    continue

            # refinement / eval / checkpoint cadences
            self._key = self._callbacks(
                cur, max(cam.width, cam.height), self._key
            )

        wall = time.perf_counter() - t0
        done = total - start_step
        if done > 0:
            print(
                f"Trained {done} steps in {wall:.1f}s "
                f"({done / max(wall, 1e-9):.2f} iters/s)"
            )
        if do_finalize:
            self.finalize(total)
        return self.state

    # -------------------------------------------------------------- eval

    def _k_eval(self, d: int) -> int:
        """K for eval renders: the max adaptive K across ALL resolution
        buckets, not just the current one. The shrink path sizes a bucket's
        K to fit TRAINING-view tile counts; eval views (different poses, no
        tile_overflow feedback loop) can exceed a shrunk K and silently
        truncate occluded surfaces, biasing PSNR/SSIM."""
        k = max([self._k_for(d), *self._k_by_d.values()])
        if self._eval_k_cap is not None:
            k = min(k, self._eval_k_cap)
        return k

    def _render_eval(self, item: Dict, d: int = 1):
        cam = item["camera"].rescaled(1.0 / d) if d > 1 else item["camera"]
        import dataclasses as _dc

        k = self._k_eval(d)
        # eval renders at the finest bucket: use the largest escalated
        # pair budget so eval never bbox-truncates more than training
        tpg = max([self.config.model.small_tiles_per_gaussian,
                   *self._tpg_by_d.values()])
        while True:
            eval_cfg = _dc.replace(self.cfg, max_per_tile=k,
                                   small_tiles_per_gaussian=tpg)
            key = ("eval_render", cam.width, cam.height,
                   self.state.params.capacity, eval_cfg.max_per_tile, tpg)
            if key not in self._step_fns:
                w, h = cam.width, cam.height

                def _eval_fn(params, c2w, K, step, _cfg=eval_cfg, _w=w, _h=h):
                    return render(
                        params, c2w, K, _w, _h, _cfg, step=step, train=False
                    )

                self._step_fns[key] = jax.jit(_eval_fn)
            jrec = dict(
                kind="eval", capacity=int(self.state.params.capacity),
                k=int(k), w=int(cam.width), h=int(cam.height),
            )
            out = self._dispatch_journaled(
                jrec, self._step_fns[key],
                self.state.params,
                jnp.asarray(cam.c2w),
                jnp.asarray(cam.intrinsics_matrix()),
                self.state.step,
            )
            # eval views have no adaptive-K feedback during training: if
            # this render truncated per-tile lists, re-render once at a
            # doubled K (bounded by the configured limit) for an unbiased
            # metric
            overflow = (
                int(np.asarray(out.tile_overflow))
                if out.tile_overflow is not None else 0
            )
            k_limit = min(
                self.cfg.max_per_tile_limit,
                self._eval_k_cap or self.cfg.max_per_tile_limit,
            )
            if overflow > 0 and k < k_limit:
                k = min(k * 2, k_limit)
                continue
            return out, cam

    def eval_image(self, step: int) -> Dict:
        idx = self.dm.scene.eval_indices[
            step // max(self.config.steps_per_eval_image, 1)
            % max(self.dm.num_eval, 1)
        ]
        item = self.dm.get_item(int(idx))
        d = self._downscale_factor(step)
        out, cam = self._render_eval(item, d)
        gt = jnp.asarray(
            np.asarray(downscale_image(item["image"], d), np.float32) / 255.0
        )
        gt_depth = (
            jnp.asarray(downscale_depth(item["depth_image"], d))
            if "depth_image" in item else None
        )
        metrics = full_eval_metrics(
            out.rgb, gt, out.depth, gt_depth,
            rgb_metrics=self.rgb_metrics,
            gaussian_count=int(self.state.params.num_alive()),
            avg_min_scale=float(
                avg_min_scale(self.state.params.scales, self.state.params.alive)
            ),
        )
        self._tag_eval_k_cap(metrics)
        self.writer.write(step, metrics, prefix="eval", force_console=True)
        return metrics

    def _tag_eval_k_cap(self, metrics: Dict) -> None:
        """Make a crash-capped eval K impossible to miss (VERDICT r4 weak
        #5): when ``_eval_k_cap`` is active the overflow re-render loop is
        bounded and eval renders can truncate — PSNR/SSIM are then not
        comparable across runs with different crash histories. The cap is
        written INTO the metrics row (JSONL/TB/console), not just logged
        once at startup."""
        if self._eval_k_cap is not None:
            metrics["eval_k_cap"] = int(self._eval_k_cap)
            print(
                f"WARNING: eval K crash-capped at {self._eval_k_cap} — "
                f"eval renders may truncate; metrics are lower bounds"
            )

    def eval_batch(self, step: int) -> Dict:
        """Eval-loss cadence (nerfstudio ``steps_per_eval_batch``, reference
        config.py:28): loss dict on one held-out image, no optimizer step."""
        from qed_splatter_tpu.models.splatfacto import total_loss

        idx = self.dm.scene.eval_indices[
            step // max(self.config.steps_per_eval_batch, 1)
            % max(self.dm.num_eval, 1)
        ]
        item = self.dm.get_item(int(idx))
        d = self._downscale_factor(step)
        out, cam = self._render_eval(item, d)
        gt = jnp.asarray(
            np.asarray(downscale_image(item["image"], d), np.float32) / 255.0
        )
        gt_depth = (
            jnp.asarray(downscale_depth(item["depth_image"], d))
            if "depth_image" in item else None
        )
        _, losses = total_loss(
            out, gt, gt_depth, self.state.params, self.cfg, self.state.step
        )
        losses = {k: float(v) for k, v in losses.items()}
        self.writer.write(step, losses, prefix="eval_loss")
        return losses

    def eval_all(self, step: int) -> Dict:
        all_metrics = []
        for item in self.dm.eval_items():
            out, cam = self._render_eval(item)
            gt = jnp.asarray(np.asarray(item["image"], np.float32) / 255.0)
            gt_depth = (
                jnp.asarray(item["depth_image"])
                if "depth_image" in item else None
            )
            all_metrics.append(
                full_eval_metrics(
                    out.rgb, gt, out.depth, gt_depth,
                    rgb_metrics=self.rgb_metrics,
                )
            )
        agg = {}
        for k in all_metrics[0]:
            vals = np.asarray([m[k] for m in all_metrics], np.float64)
            finite = vals[np.isfinite(vals)]
            # explicit empty-guard: nanmean on an all-NaN column (e.g.
            # lpips without weights) warns "Mean of empty slice"
            agg[k] = float(finite.mean()) if finite.size else float("nan")
        agg["gaussian_count"] = int(self.state.params.num_alive())
        self._tag_eval_k_cap(agg)
        self.writer.write(step, agg, prefix="eval_all", force_console=True)
        return agg
