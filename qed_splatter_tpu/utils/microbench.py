"""Device-truth microbenchmarking.

Host-side timing through the tunneled TPU backend is unreliable in BOTH
directions (async dispatch under-reports; per-call round-trips of ~27 ms and
worse over-report). The only trustworthy method found: run the op N times
inside ONE jitted ``lax.fori_loop`` with an iteration-dependent data
perturbation (to defeat CSE/licm), then divide wall time of the single
dispatch by N. Used by bench.py and the perf tests.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def device_time_per_call(
    op: Callable,
    args,
    n: int = 10,
    perturb: Callable = None,
    warmup: bool = True,
) -> float:
    """Average seconds per ``op(*args)`` measured inside one jit dispatch.

    ``perturb(args, i) -> args`` must make iteration i's input depend on the
    loop counter and previous output so XLA cannot hoist or CSE the op; the
    default adds a zero-valued data dependency derived from the previous
    result to the first float/int array leaf.
    """
    leaves, treedef = jax.tree.flatten(args)

    if perturb is None:
        def perturb(args, i, token):
            ls, td = jax.tree.flatten(args)
            for j, l in enumerate(ls):
                if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.inexact):
                    ls[j] = l + token.astype(l.dtype)
                    break
            else:
                for j, l in enumerate(ls):
                    if hasattr(l, "dtype") and jnp.issubdtype(
                        l.dtype, jnp.integer
                    ):
                        ls[j] = l + token.astype(l.dtype)
                        break
            return jax.tree.unflatten(td, ls)

    @jax.jit
    def loop(args):
        def body(i, carry):
            args, token = carry
            out = op(*perturb(args, i, token))
            # zero-valued token depending on EVERY output leaf: anchoring
            # only the first leaf lets XLA dead-code-eliminate the compute
            # behind the other outputs (e.g. a projection op's covariance
            # branch when only means2d is read), silently under-reporting
            new_token = sum(
                jnp.asarray(leaf.ravel()[0], jnp.float32) * 0
                for leaf in jax.tree.leaves(out)
                if hasattr(leaf, "ravel") and leaf.size > 0
            )
            return (args, jnp.asarray(new_token, jnp.float32))

        return jax.lax.fori_loop(
            0, n, body, (args, jnp.float32(0.0))
        )

    if warmup:
        r = loop(args)
        jax.block_until_ready(r)
        # force a real host sync via tiny transfer
        _ = jax.device_get(jax.tree.leaves(r)[-1])
    t0 = time.perf_counter()
    r = loop(args)
    _ = jax.device_get(jax.tree.leaves(r)[-1])
    dt = time.perf_counter() - t0
    return dt / n
