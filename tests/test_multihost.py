"""Real multi-process execution of the sharded step (SURVEY §2c
multi-host): two OS processes, each with 4 virtual CPU devices, joined via
``jax.distributed.initialize`` into one 8-device ('data', 'model') mesh —
the execution shape of a 2-host TPU slice. Verifies the SPMD step runs
under actual process separation (not just the in-process virtual mesh) and
that both processes agree with the single-process value.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_step():
    child = os.path.join(os.path.dirname(__file__), "multihost_child.py")
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, child, str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"child failed:\n{err[-3000:]}"
        lines = [l for l in out.splitlines() if l.startswith("MHOST")]
        assert lines, f"no MHOST line in: {out[-500:]}\n{err[-1000:]}"
        outs.append(lines[0].split())

    # both processes computed the same global loss; params finite
    loss0, loss1 = float(outs[0][1]), float(outs[1][1])
    assert outs[0][2] == outs[1][2] == "8"      # global devices
    assert outs[0][3] == outs[1][3] == "2"      # process count
    assert outs[0][4] == outs[1][4] == "True"   # finite params
    assert np.isfinite(loss0)
    assert loss0 == pytest.approx(loss1, rel=1e-6)

    # cross-check against the single-process sharded step on the same data
    single = subprocess.run(
        [sys.executable, "-c", f"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from qed_splatter_tpu.configs import ModelConfig, default_optimizers
from qed_splatter_tpu.engine.optim import GroupOptimizers
from qed_splatter_tpu.engine.train_step import init_train_state
from qed_splatter_tpu.models.gaussians import init_from_points
from qed_splatter_tpu.parallel.dp import make_sharded_train_step
from qed_splatter_tpu.parallel.mesh import make_mesh
from qed_splatter_tpu.testing import orbit_c2w_opengl
W, H, B = 64, 48, 2
rng = np.random.default_rng(0)
pts = rng.uniform(-0.8, 0.8, (64, 3)).astype(np.float32)
pts[:, 2] = pts[:, 2] * 0.5 + 3.0
gp = init_from_points(pts, (rng.uniform(0, 1, (64, 3)) * 255).astype(np.uint8), capacity=256)
cfg = ModelConfig(background_color="black", max_per_tile=64, camera_opt_mode="SO3xR3")
optims = GroupOptimizers(default_optimizers())
state = init_train_state(gp, optims, num_cameras=B)
K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]], np.float32)
batch = dict(
    c2w=jnp.asarray(np.stack([np.asarray(orbit_c2w_opengl(3.0, 0.2 * i, 0.1, (0, 0, 3.0)), np.float32) for i in range(B)])),
    K=jnp.asarray(np.tile(K, (B, 1, 1))),
    cam_idx=jnp.arange(B, dtype=jnp.int32),
    rgb=jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)),
    depth=jnp.asarray(rng.uniform(0.5, 4.0, (B, H, W, 1)).astype(np.float32)),
)
fn = make_sharded_train_step(cfg, optims, W, H, make_mesh(2, 4), has_depth=True)
_, metrics = fn(state, batch, jax.random.PRNGKey(3))
print("SINGLE", float(np.asarray(metrics["loss"])))
"""],
        capture_output=True, text=True, timeout=240,
    )
    assert single.returncode == 0, single.stderr[-3000:]
    ref = float([l for l in single.stdout.splitlines()
                 if l.startswith("SINGLE")][0].split()[1])
    assert loss0 == pytest.approx(ref, rel=5e-5)
