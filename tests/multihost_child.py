"""Child process for the 2-process multi-host smoke test
(tests/test_multihost.py). Runs the sharded train step over a global
('data', 'model') mesh spanning two CPU processes of 4 virtual devices
each — the execution shape of a 2-host TPU slice (SURVEY §2c multi-host:
jax.distributed + DCN-coordinated processes, collectives over the mesh).

Prints one line: MHOST <loss> <global_devices> <process_count>.
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                           process_id=pid)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding  # noqa: E402

from qed_splatter_tpu.configs import ModelConfig, default_optimizers  # noqa: E402
from qed_splatter_tpu.engine.optim import GroupOptimizers  # noqa: E402
from qed_splatter_tpu.engine.train_step import init_train_state  # noqa: E402
from qed_splatter_tpu.models.gaussians import init_from_points  # noqa: E402
from qed_splatter_tpu.parallel.dp import (  # noqa: E402
    batch_partition_specs,
    make_sharded_train_step,
    state_partition_specs,
)
from qed_splatter_tpu.parallel.mesh import make_mesh  # noqa: E402
from qed_splatter_tpu.testing import orbit_c2w_opengl  # noqa: E402

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert len(jax.local_devices()) == 4

W, H, B = 64, 48, 2
rng = np.random.default_rng(0)  # same seed in both processes
pts = rng.uniform(-0.8, 0.8, (64, 3)).astype(np.float32)
pts[:, 2] = pts[:, 2] * 0.5 + 3.0
gp = init_from_points(
    pts, (rng.uniform(0, 1, (64, 3)) * 255).astype(np.uint8), capacity=256
)
cfg = ModelConfig(background_color="black", max_per_tile=64,
                  camera_opt_mode="SO3xR3")
optims = GroupOptimizers(default_optimizers())
state = init_train_state(gp, optims, num_cameras=B)
K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]], np.float32)
batch = dict(
    c2w=np.stack([np.asarray(orbit_c2w_opengl(3.0, 0.2 * i, 0.1,
                                              (0, 0, 3.0)), np.float32)
                  for i in range(B)]),
    K=np.tile(K, (B, 1, 1)),
    cam_idx=np.arange(B, dtype=np.int32),
    rgb=rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32),
    depth=rng.uniform(0.5, 4.0, (B, H, W, 1)).astype(np.float32),
)

mesh = make_mesh(2, 4)  # global: data axis spans the two processes


def globalize(tree, specs):
    """Host arrays (identical in every process) -> global jax.Arrays."""

    def one(x, spec):
        if not hasattr(x, "shape") or x.ndim == 0 or x.size == 0:
            return x
        arr = np.asarray(x)
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(arr.shape, sh,
                                            lambda idx: arr[idx])

    return jax.tree.map(one, tree, specs)


state_g = globalize(state, state_partition_specs(state, 256))
batch_g = globalize(batch, batch_partition_specs(batch))

fn = make_sharded_train_step(cfg, optims, W, H, mesh, has_depth=True)
new_state, metrics = fn(state_g, batch_g, jax.random.PRNGKey(3))
loss = float(np.asarray(jax.device_get(metrics["loss"])))
means_ok = all(
    bool(np.all(np.isfinite(np.asarray(sh.data))))
    for sh in new_state.params.means.addressable_shards
)
print(f"MHOST {loss:.6f} {jax.device_count()} {jax.process_count()} "
      f"{means_ok}", flush=True)
