"""Trainer loop integration: short run on a synthetic dataset, eval cadence,
checkpoint save/restore-resume, CLI flag plumbing (SURVEY §4.3)."""

import dataclasses
import json

import numpy as np
import pytest

from qed_splatter_tpu.cli import build_trainer_config
from qed_splatter_tpu.configs import DataConfig, ModelConfig, TrainerConfig
from qed_splatter_tpu.engine import checkpoint as ckpt
from qed_splatter_tpu.engine.trainer import Trainer, downscale_image
from qed_splatter_tpu.testing import write_synthetic_dataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("scene")
    write_synthetic_dataset(root, num_frames=5, width=64, height=48,
                            with_ply=True)
    return root


def _tiny_config(dataset, tmp_path, **kw) -> TrainerConfig:
    model = ModelConfig(
        camera_opt_mode="off",
        max_per_tile=64,
        num_downscales=1,
        resolution_schedule=20,
        warmup_length=10,
        refine_every=10,
        init_capacity_headroom=1.2,
        **kw.pop("model_kw", {}),
    )
    return TrainerConfig(
        max_num_iterations=40,
        steps_per_eval_image=20,
        steps_per_eval_all_images=40,
        steps_per_save=20,
        log_every=10,
        output_dir=str(tmp_path),
        data=DataConfig(data=str(dataset)),
        model=model,
        **kw,
    )


@pytest.mark.slow
def test_trainer_short_run(dataset, tmp_path):
    cfg = _tiny_config(dataset, tmp_path)
    trainer = Trainer(cfg)
    state = trainer.train()
    assert int(state.step) == 40
    # metrics written
    lines = [
        json.loads(l)
        for l in open(trainer.run_dir / "metrics.jsonl")
    ]
    splits = {l["split"] for l in lines}
    assert {"train", "eval", "eval_all", "refine"} <= splits
    train_lines = [l for l in lines if l["split"] == "train"]
    assert np.isfinite(train_lines[-1]["loss"])
    # checkpoints + splat export exist
    assert ckpt.latest_checkpoint(trainer.run_dir / "ckpts") is not None
    assert (trainer.run_dir / "splat.ply").exists()
    # resolution schedule: first steps at half res, later at full res
    # (num_downscales=1, schedule=20 -> d=2 before step 20, d=1 after)
    assert trainer._downscale_factor(0) == 2
    assert trainer._downscale_factor(39) == 1


@pytest.mark.slow
def test_checkpoint_meta_model_config(dataset, tmp_path):
    """Checkpoint metadata records the trained ModelConfig so render/view
    rebuild the exact model (ADVICE r1: sh_degree-0 checkpoints crashed
    under the default config)."""
    cfg = _tiny_config(
        dataset, tmp_path,
        model_kw=dict(sh_degree=0, rasterize_mode="antialiased",
                      background_color="black"),
        steps_per_eval_batch=20,
    )
    trainer = Trainer(cfg)
    trainer.train(max_steps=20)
    meta = ckpt.checkpoint_meta(trainer.run_dir / "ckpts")
    restored = ckpt.model_config_from_meta(meta)
    # adaptive_max_per_tile may have grown K during training; the grown
    # value is what the checkpoint correctly records
    import dataclasses

    assert restored.max_per_tile >= cfg.model.max_per_tile
    assert dataclasses.replace(
        restored, max_per_tile=cfg.model.max_per_tile
    ) == cfg.model
    # legacy checkpoints (top-level sh_degree only) still work
    legacy = ckpt.model_config_from_meta({"sh_degree": 1})
    assert legacy.sh_degree == 1
    # steps_per_eval_batch cadence wrote eval-loss lines
    lines = [json.loads(l) for l in open(trainer.run_dir / "metrics.jsonl")]
    assert any(l["split"] == "eval_loss" for l in lines)


@pytest.mark.slow
def test_trainer_resume(dataset, tmp_path):
    cfg = _tiny_config(dataset, tmp_path)
    t1 = Trainer(cfg)
    s1 = t1.train(max_steps=20)
    ckpt_dir = t1.run_dir / "ckpts"

    cfg2 = dataclasses.replace(cfg, load_dir=str(ckpt_dir))
    t2 = Trainer(cfg2)
    assert int(t2.state.step) == 20
    np.testing.assert_allclose(
        np.asarray(t2.state.params.means), np.asarray(s1.params.means)
    )
    s2 = t2.train(max_steps=30)
    assert int(s2.step) == 30


def test_downscale_image_box_mean():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    out = downscale_image(img, 2)
    assert out.shape == (2, 2, 1)
    np.testing.assert_allclose(out[0, 0, 0], np.mean([0, 1, 4, 5]))


def test_cli_config_overrides():
    cfg = build_trainer_config(
        [
            "--data", "/tmp/x",
            "--max-num-iterations", "123",
            "--model.depth-lambda", "0.3",
            "--model.rasterize-mode", "antialiased",
            "--no-model.output-depth-during-training",
            "--data.eval-mode", "interval",
            "--vis", "none",
        ]
    )
    assert cfg.data.data == "/tmp/x"
    assert cfg.max_num_iterations == 123
    assert cfg.model.depth_lambda == 0.3
    assert cfg.model.rasterize_mode == "antialiased"
    assert cfg.model.output_depth_during_training is False
    assert cfg.data.eval_mode == "interval"
    # untouched defaults stay at reference values
    assert cfg.model.cull_alpha_thresh == 0.005
    assert cfg.model.densify_grad_thresh == 0.0005


def test_cli_unknown_command():
    from qed_splatter_tpu.cli import main

    assert main(["frobnicate"]) == 2
    assert main([]) == 2


@pytest.mark.slow
def test_trainer_data_parallel_mesh(dataset, tmp_path):
    """Trainer drives the sharded multi-camera step over a 2x2 CPU mesh."""
    cfg = _tiny_config(dataset, tmp_path)
    cfg = dataclasses.replace(
        cfg, num_data_shards=2, num_model_shards=2, max_num_iterations=8,
        steps_per_eval_image=0, steps_per_eval_all_images=0,
        steps_per_save=0, log_every=4,
    )
    trainer = Trainer(cfg)
    assert trainer.mesh is not None
    state = trainer.train()
    assert int(state.step) == 8
    import jax
    # params ended up sharded over the model axis
    assert state.params.means.sharding.spec[0] == "model"


def test_process_sharded_views(dataset):
    from qed_splatter_tpu.configs import DataConfig
    from qed_splatter_tpu.data.dataset import FullImageDatamanager

    dm0 = FullImageDatamanager(DataConfig(data=str(dataset)),
                               process_index=0, process_count=2)
    dm1 = FullImageDatamanager(DataConfig(data=str(dataset)),
                               process_index=1, process_count=2)
    s0 = set(dm0.train_indices)
    s1 = set(dm1.train_indices)
    assert not (s0 & s1)
    assert s0 | s1 == set(dm0.scene.train_indices)


@pytest.mark.slow
def test_capacity_growth_pads_state(dataset, tmp_path):
    """_maybe_grow doubles capacity and pads params, Adam moments (exact
    param-template matching, not shape heuristics), and densify stats;
    training continues across the growth."""
    import jax
    import numpy as np

    cfg = _tiny_config(dataset, tmp_path)
    trainer = Trainer(cfg)
    params = trainer.state.params
    cap = params.capacity
    # force the growth trigger: mark > 85% of slots alive
    n_need = int(0.9 * cap)
    alive = np.zeros(cap, bool)
    alive[:n_need] = True
    trainer.state = trainer.state.replace(
        params=params.replace(alive=jax.numpy.asarray(alive))
    )
    trainer._maybe_grow()
    grown = trainer.state.params
    assert grown.capacity == 2 * cap
    assert grown.means.shape[0] == 2 * cap
    # padded quat slots are unit quats, not zeros (NaN-gradient guard)
    assert np.allclose(np.asarray(grown.quats[cap:])[:, 0], 1.0)
    tmpl = grown.trainable_dict()
    for k, st in trainer.state.opt_state.items():
        moments = [
            x for x in jax.tree.leaves(st)
            if getattr(x, "shape", None) == tmpl[k].shape
        ]
        assert len(moments) >= 2, f"group {k}: mu/nu not padded"
    assert trainer.state.stats.grad_norm_sum.shape[0] == 2 * cap
    # the step function still runs at the new capacity
    trainer.train(max_steps=10)
    assert np.isfinite(float(np.asarray(trainer.state.params.means).sum()))


def test_scan_program_payload_excludes_dataset(dataset, tmp_path):
    """The lowered scan program must not embed the image cache: jit inlines
    closed-over arrays as stablehlo literal constants (335 MB at full res in
    the first full-budget run — zero-filled test data hides it by
    serializing as splats). Guard with incompressible random images."""
    import numpy as np
    from PIL import Image

    # copy the dataset and overwrite the copy's images with random noise so
    # any embedded literal is visible in the serialized size (mutating the
    # module-scoped fixture would leak into later tests)
    import shutil

    noisy = tmp_path / "noisy_scene"
    shutil.copytree(dataset, noisy)
    rng = np.random.default_rng(0)
    for p in sorted((noisy / "images").glob("*.png")):
        img = Image.open(p)
        noise = rng.integers(0, 255, (img.height, img.width, 3), np.uint8)
        Image.fromarray(noise).save(p)

    cfg = _tiny_config(noisy, tmp_path)
    trainer = Trainer(cfg)
    scan_fn, ds = trainer._get_scan_fn(
        1, 10, need_absgrad=True, capacity=trainer.state.params.capacity
    )
    import jax

    perm = np.zeros(10, np.int32)
    # lower the underlying jitted fn without executing
    lowered = scan_fn._jitted.lower(
        trainer.state, perm, jax.random.PRNGKey(0), ds.data
    )
    text = lowered.compiler_ir().operation.get_asm(
        large_elements_limit=1 << 20
    )
    nbytes = ds.nbytes()
    assert nbytes > 100_000  # the dataset is big enough to notice
    assert len(text) < max(2_000_000, nbytes // 4), (
        f"scan program asm is {len(text) / 1e6:.1f} MB for a "
        f"{nbytes / 1e6:.1f} MB dataset — dataset literals embedded?"
    )


@pytest.mark.slow
def test_adaptive_max_per_tile_grows(dataset, tmp_path):
    """With adaptive_max_per_tile, heavy K-cap truncation (tile_overflow)
    doubles max_per_tile during training, bounded by max_per_tile_limit."""
    cfg = _tiny_config(
        dataset, tmp_path,
        model_kw=dict(adaptive_max_per_tile=True, max_per_tile_limit=256),
    )
    # _tiny_config pins max_per_tile=64; this dense tiny scene overflows it
    trainer = Trainer(cfg)
    assert trainer.cfg.max_per_tile == 64
    trainer.train(max_steps=20)
    assert trainer.cfg.max_per_tile > 64
    assert trainer.cfg.max_per_tile <= 256


@pytest.mark.slow
def test_eval_uses_checkpoint_model_config(dataset, tmp_path):
    """qed eval restores the TRAINED model config from checkpoint metadata:
    an sh_degree=0 checkpoint must evaluate without --model flags (a
    default ModelConfig would look up K=16 SH bases against K=1 coeffs)."""
    from qed_splatter_tpu import cli

    out = tmp_path / "out0"
    rc = cli.main([
        "train", "--data", str(dataset), "--output-dir", str(out),
        "--max-num-iterations", "20", "--steps-per-eval-image", "100",
        "--steps-per-eval-all-images", "100", "--steps-per-save", "20",
        "--model.sh-degree", "0", "--model.num-downscales", "0",
        "--model.max-per-tile", "64",
    ])
    assert rc == 0
    rc = cli.main([
        "eval", "--data", str(dataset),
        "--load-dir", str(out / "qed-splatter" / "ckpts"),
    ])
    assert rc == 0


def test_trainer_resume_after_capacity_growth(dataset, tmp_path):
    """Resuming must adapt the restore template to the checkpoint's grown
    capacity (densification doubles it mid-run)."""
    import jax.numpy as jnp

    from qed_splatter_tpu.models.gaussians import grow_capacity

    cfg = _tiny_config(dataset, tmp_path)
    t1 = Trainer(cfg)
    t1.train(max_steps=20)
    cap0 = int(t1.state.params.capacity)
    # simulate a capacity growth, then checkpoint it
    t1.state = t1.state.replace(
        params=grow_capacity(t1.state.params, cap0 * 2),
        opt_state=t1.optims.init(
            grow_capacity(t1.state.params, cap0 * 2).trainable_dict()
        ),
        stats=type(t1.state.stats).zeros(cap0 * 2),
    )
    ckpt.save_checkpoint(
        t1.run_dir / "ckpts", t1.state, 20, model_config=t1.cfg,
        k_by_d={2: 128},
    )
    cfg2 = _tiny_config(dataset, tmp_path, load_dir=str(t1.run_dir / "ckpts"))
    t2 = Trainer(cfg2)
    assert int(t2.state.params.capacity) == cap0 * 2
    assert int(t2.state.step) == 20
    assert t2._k_by_d.get(2) == 128
    assert bool(jnp.all(jnp.isfinite(t2.state.params.means)))
    t2.train(max_steps=30)
    assert int(t2.state.step) == 30


def _force_grow_trigger(trainer):
    """Mark >85% of slots alive so _maybe_grow wants to double capacity."""
    import jax.numpy as jnp

    params = trainer.state.params
    alive = np.zeros(params.capacity, bool)
    alive[: int(0.9 * params.capacity)] = True
    trainer.state = trainer.state.replace(
        params=params.replace(alive=jnp.asarray(alive))
    )


def test_growth_refused_when_over_memory_budget(dataset, tmp_path, monkeypatch):
    """A growth whose compiled step/refine would not fit HBM is refused
    (loudly, once) instead of crashing the TPU worker — the round-3 room
    run died twice at the 1.79M->3.58M growth before this gate existed."""
    cfg = _tiny_config(dataset, tmp_path)
    trainer = Trainer(cfg)
    cap = trainer.state.params.capacity
    _force_grow_trigger(trainer)
    # a 1-byte HBM "device": any projected peak exceeds the budget
    monkeypatch.setattr(
        Trainer, "_device_memory_stats",
        staticmethod(lambda: {"bytes_limit": 1, "bytes_in_use": 0}),
    )
    trainer._maybe_grow()
    assert trainer.state.params.capacity == cap
    assert (2 * cap) in trainer._grow_refused
    # the refusal is cached: no second probe (and no second compile)
    def boom(*a, **k):
        raise AssertionError("probe must not re-run for a refused capacity")
    monkeypatch.setattr(trainer, "_probe_grown_compiles", boom)
    trainer._maybe_grow()
    assert trainer.state.params.capacity == cap
    # training continues at the clamped capacity
    trainer.train(max_steps=10)
    assert np.isfinite(float(np.asarray(trainer.state.params.means).sum()))


def test_growth_refused_on_compile_failure(dataset, tmp_path):
    """A grown-capacity compile error (round-3 first crash: remote-compile
    HTTP 500 at 3.58M) downgrades to a refusal; training continues. The
    refusal is TRANSIENT (compile errors can be flaky remote-compile
    failures): the probe retries at a later cadence instead of capping
    capacity for the whole run, and a successful retry grows."""
    cfg = _tiny_config(dataset, tmp_path)
    trainer = Trainer(cfg)
    cap = trainer.state.params.capacity
    _force_grow_trigger(trainer)

    class FailingJit:
        def lower(self, *a, **k):
            raise RuntimeError("remote_compile: HTTP 500")

    good_jit = trainer._refine_jit
    trainer._refine_jit = FailingJit()
    trainer._maybe_grow(cur=100)
    assert trainer.state.params.capacity == cap
    # NOT a permanent refusal — deferred to a retry step
    assert (2 * cap) not in trainer._grow_refused
    retry_at = trainer._grow_retry_at[2 * cap]
    assert retry_at > 100
    # before the retry step: no probe runs (the failing jit would raise
    # through _maybe_grow only via _probe_grown_compiles' catch; use a
    # sentinel to prove it is not called at all)
    def boom(*a, **k):
        raise AssertionError("probe must not re-run before the retry step")
    probe = trainer._probe_grown_compiles
    trainer._probe_grown_compiles = boom
    trainer._maybe_grow(cur=retry_at - 1)
    assert trainer.state.params.capacity == cap
    # at the retry step with a healthy compiler: the growth goes through
    trainer._probe_grown_compiles = probe
    trainer._refine_jit = good_jit
    trainer._maybe_grow(cur=retry_at)
    assert trainer.state.params.capacity == 2 * cap


def test_growth_allowed_caches_aot_executables(dataset, tmp_path, monkeypatch):
    """When the memory gate passes, the probe's AOT-compiled refine (and
    scan step, on the scan path) are cached so growth pays no second
    compile of the same program."""
    cfg = _tiny_config(dataset, tmp_path)
    trainer = Trainer(cfg)
    cap = trainer.state.params.capacity
    _force_grow_trigger(trainer)
    monkeypatch.setattr(
        Trainer, "_device_memory_stats",
        staticmethod(lambda: {"bytes_limit": 1 << 40, "bytes_in_use": 0}),
    )
    trainer._maybe_grow()
    assert trainer.state.params.capacity == 2 * cap
    assert any(k[0] == 2 * cap for k in trainer._refine_exec)


def test_sampling_persists_across_train_calls(dataset, tmp_path):
    """View sampling state must survive train() turn boundaries: reseeding
    per call replayed the identical permutation prefix every multi-scene
    turn, so scenes with more views than one turn's steps NEVER sampled
    the tail views (round-3 advisor finding). With 2-step turns over a
    4-view scene, all views must still be visited."""
    cfg = _tiny_config(dataset, tmp_path, steps_per_dispatch=2)
    cfg = dataclasses.replace(
        cfg, steps_per_save=0, steps_per_eval_image=0,
        steps_per_eval_all_images=0,
        model=dataclasses.replace(
            cfg.model, num_downscales=0, warmup_length=100, refine_every=50,
        ),
    )
    trainer = Trainer(cfg)
    assert trainer._use_scan()
    seen: list = []
    orig = trainer._get_scan_fn

    def spying(*a, **kw):
        fn, ds = orig(*a, **kw)

        def wrapped(state, perm, rng):
            seen.extend(np.asarray(perm).tolist())
            return fn(state, perm, rng)

        return wrapped, ds

    trainer._get_scan_fn = spying
    n_train = trainer.dm.num_train
    assert n_train >= 3
    for turn in range(1, n_train + 2):
        trainer.train(max_steps=2 * turn, finalize=False)
    # one epoch's worth of steps across turns must cover every view
    assert set(seen[: n_train]) == set(range(n_train)), seen
    # and consecutive turns are NOT replays of the same prefix
    assert seen[:2] != seen[2:4] or seen[:2] != seen[4:6]


def test_per_step_nan_loss_detected_within_one_dispatch(dataset, tmp_path):
    """Per-step path: a NaN loss must be caught by the lagged per-dispatch
    watch (at most ONE extra step), not at the log_every cadence — a NaN
    could previously train for log_every - 1 steps undetected."""
    cfg = _tiny_config(
        dataset, tmp_path, steps_per_dispatch=1, on_divergence="halt",
    )
    cfg = dataclasses.replace(
        cfg, log_every=10_000, steps_per_save=0, steps_per_eval_image=0,
        steps_per_eval_all_images=0,
        model=dataclasses.replace(
            cfg.model, num_downscales=0, warmup_length=100, refine_every=50,
        ),
    )
    trainer = Trainer(cfg)
    trainer.train(max_steps=4, finalize=False)
    # NaN colors -> NaN rendered pixels wherever alpha > 0 -> NaN loss
    import jax.numpy as jnp

    trainer.state = trainer.state.replace(
        params=trainer.state.params.replace(
            features_dc=trainer.state.params.features_dc * jnp.nan
        )
    )
    from qed_splatter_tpu.engine.trainer import TrainingDiverged

    with pytest.raises(TrainingDiverged):
        trainer.train(max_steps=30, finalize=False)
    # detected within the lag window (dispatch N checked after N+1), far
    # before the 10_000-step log cadence
    assert int(trainer.state.step) <= 7
