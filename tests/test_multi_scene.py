"""Multi-scene training (BASELINE config #5): round-robin scheduling,
per-scene artifacts, and the shared compile cache across same-shaped
scenes."""

import numpy as np
import pytest

from qed_splatter_tpu.configs import DataConfig, ModelConfig, TrainerConfig
from qed_splatter_tpu.engine.multi_scene import MultiSceneTrainer
from qed_splatter_tpu.testing import write_synthetic_dataset


@pytest.fixture(scope="module")
def two_scenes(tmp_path_factory):
    root = tmp_path_factory.mktemp("scenes")
    for i, name in enumerate(["sceneA", "sceneB"]):
        write_synthetic_dataset(
            root / name, num_frames=5, width=64, height=48,
            with_ply=True, seed=i,
        )
    return root


def _cfg(tmp_path, **kw):
    return TrainerConfig(
        max_num_iterations=20,
        steps_per_eval_image=10,
        steps_per_eval_all_images=0,
        steps_per_save=10,
        log_every=10,
        output_dir=str(tmp_path),
        experiment_name="multi",
        data=DataConfig(data=""),
        model=ModelConfig(
            # K large enough that adaptive growth never splits the scenes
            # onto different compiled programs mid-test
            camera_opt_mode="off", max_per_tile=256, num_downscales=1,
            resolution_schedule=20, warmup_length=10, refine_every=10,
        ),
        **kw,
    )


def test_multi_scene_round_robin(two_scenes, tmp_path, monkeypatch):
    import qed_splatter_tpu.engine.scan_runner as sr

    calls = []
    orig = sr.make_train_step

    def counting(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(sr, "make_train_step", counting)

    cfg = _cfg(tmp_path)
    mst = MultiSceneTrainer(
        cfg, [str(two_scenes / "sceneA"), str(two_scenes / "sceneB")]
    )
    states = mst.train()

    assert set(states) == {"sceneA", "sceneB"}
    for name, state in states.items():
        assert int(state.step) == 20
        run = tmp_path / "multi" / name
        assert (run / "ckpts" / "step-000000020").exists()
        assert (run / "splat.ply").exists()
        assert (run / "metrics.jsonl").exists()
        assert np.isfinite(float(np.asarray(state.params.means).sum()))
    # the scenes differ (different seeds -> different reconstructions)
    a = np.asarray(states["sceneA"].params.means)
    b = np.asarray(states["sceneB"].params.means)
    assert a.shape == b.shape and not np.allclose(a, b)
    # same-shaped scenes share ONE compiled scan runner: the hot-path step
    # was built once per static configuration, not once per scene
    assert len(calls) == 1, f"expected 1 shared runner build, got {len(calls)}"


def test_multi_scene_cli(two_scenes, tmp_path):
    from qed_splatter_tpu.cli import main

    rc = main([
        "train-multi",
        "--data", str(two_scenes / "sceneA"),
        "--data", str(two_scenes / "sceneB"),
        "--output-dir", str(tmp_path),
        "--experiment-name", "multicli",
        "--max-num-iterations", "10",
        "--steps-per-eval-image", "0",
        "--steps-per-eval-all-images", "0",
        "--steps-per-save", "10",
        "--log-every", "10",
        "--model.camera-opt-mode", "off",
        "--model.max-per-tile", "64",
        "--model.warmup-length", "10",
        "--model.refine-every", "10",
    ])
    assert rc == 0
    for name in ("sceneA", "sceneB"):
        assert (tmp_path / "multicli" / name / "splat.ply").exists()


def test_multi_scene_process_sharding(two_scenes, tmp_path, monkeypatch):
    """Scene assignment is i::P by process index (whole scenes per host)."""
    import jax

    monkeypatch.setattr(jax, "process_index", lambda: 1)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    cfg = _cfg(tmp_path)
    mst = MultiSceneTrainer(
        cfg, [str(two_scenes / "sceneA"), str(two_scenes / "sceneB")]
    )
    assert list(mst.trainers) == ["sceneB"]


def test_multi_scene_rejects_duplicate_names(two_scenes, tmp_path):
    with pytest.raises(ValueError, match="unique"):
        MultiSceneTrainer(
            _cfg(tmp_path),
            [str(two_scenes / "sceneA"), str(two_scenes / "sceneA")],
        )
