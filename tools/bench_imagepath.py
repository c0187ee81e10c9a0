"""Microbench: tile->image assembly transposes, SSIM layouts, fused Adam.

Round-5 step breakdown (bench_breakdown, fresh): assembly fwd 5.8 +
bwd 4.5 ms, ssim fwd_bwd 4.4 ms, adam 4.8 ms — ~14 ms of a 47 ms step in
layout shuffles and dispatch-bound small ops. Candidates measured here.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import json

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from qed_splatter_tpu.ops.ssim import ssim
    from qed_splatter_tpu.utils.microbench import device_time_per_call

    rng = np.random.default_rng(0)
    times = {}

    def t(name, op, args, n=20):
        times[name] = round(device_time_per_call(op, args, n=n) * 1e3, 3)
        print(name, times[name], "ms", flush=True)

    ts, d = 16, 4
    width, height = 1296, 840
    ntx, nty = -(-width // ts), -(-height // ts)
    T = ntx * nty
    out_t = jnp.asarray(
        rng.uniform(0, 1, (T, d, ts * ts)).astype(np.float32))

    def asm_hwc(o):  # current: [T, D, P] -> [H, W, D]
        img = o.reshape(nty, ntx, d, ts, ts)
        img = img.transpose(0, 3, 1, 4, 2).reshape(nty * ts, ntx * ts, d)
        return img[:height, :width]

    def asm_chw(o):  # candidate: [T, D, P] -> [D, H, W]
        img = o.reshape(nty, ntx, d, ts, ts)
        img = img.transpose(2, 0, 3, 1, 4).reshape(d, nty * ts, ntx * ts)
        return img[:, :height, :width]

    def asm_chw2(o):  # two-stage: row-band form then major-dim transpose
        img = o.reshape(nty, ntx, d, ts, ts)
        img = img.transpose(0, 2, 3, 1, 4)      # [nty, d, ts, ntx, ts]
        img = img.reshape(nty, d, ts, ntx * ts)
        img = img.transpose(1, 0, 2, 3).reshape(d, nty * ts, ntx * ts)
        return img[:, :height, :width]

    t("asm_hwc_fwd", asm_hwc, (out_t,))
    t("asm_chw_fwd", asm_chw, (out_t,))
    t("asm_chw2_fwd", asm_chw2, (out_t,))

    def grad_of(fn):
        def op(o):
            return jax.grad(lambda x: jnp.sum(fn(x) ** 2))(o)
        return op

    t("asm_hwc_fwdbwd", grad_of(asm_hwc), (out_t,))
    t("asm_chw_fwdbwd", grad_of(asm_chw), (out_t,))
    t("asm_chw2_fwdbwd", grad_of(asm_chw2), (out_t,))

    # ---- SSIM: [H, W, C] vs [C, H, W] formulation ----
    pred = jnp.asarray(rng.uniform(0, 1, (height, width, 3)).astype(np.float32))
    targ = jnp.asarray(rng.uniform(0, 1, (height, width, 3)).astype(np.float32))

    def ssim_grad(p, g):
        return jax.grad(lambda x: ssim(x, g))(p)

    t("ssim_hwc_fwdbwd", ssim_grad, (pred, targ))

    pred_c = pred.transpose(2, 0, 1)
    targ_c = targ.transpose(2, 0, 1)

    def ssim_chw(p, g):
        from jax import lax
        from qed_splatter_tpu.ops.ssim import _blur_band
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        sp, st = p - 0.5, g - 0.5
        stack = jnp.concatenate(
            [sp, st, sp * sp, st * st, sp * st])  # [5C, H, W]
        mu = _blur_band(stack, 1, 2, 11, 1.5, lax.Precision.DEFAULT)
        mu_p, mu_t, mu_pp, mu_tt, mu_pt = jnp.split(mu, 5)
        var_p = mu_pp - mu_p * mu_p
        var_t = mu_tt - mu_t * mu_t
        cov = mu_pt - mu_p * mu_t
        up, ut = mu_p + 0.5, mu_t + 0.5
        num = (2 * up * ut + c1) * (2 * cov + c2)
        den = (up * up + ut * ut + c1) * (var_p + var_t + c2)
        return jnp.mean(num / den)

    def ssim_chw_grad(p, g):
        return jax.grad(lambda x: ssim_chw(x, g))(p)

    t("ssim_chw_fwdbwd", ssim_chw_grad, (pred_c, targ_c))

    # ---- Adam: 6 optax groups vs one packed [N, C] fused update ----
    from qed_splatter_tpu.configs import default_optimizers
    from qed_splatter_tpu.engine.optim import GroupOptimizers

    n = 131_072
    shapes = dict(means=3, features_dc=3, features_rest=45, opacities=1,
                  scales=3, quats=4)
    params = {k: jnp.asarray(rng.normal(0, 1, (n, c)).astype(np.float32))
              for k, c in shapes.items()}
    params["opacities"] = params["opacities"][:, 0]
    params["features_rest"] = params["features_rest"].reshape(n, 15, 3)
    grads = jax.tree.map(lambda x: x * 0.01, params)
    optims = GroupOptimizers({k: v for k, v in default_optimizers().items()
                              if k in shapes})
    ostate = optims.init(params)

    def adam_groups(grads, ostate, params, step):
        for k in ostate:
            ostate[k][0].count  # touch
        new_p, new_s = optims.update(grads, ostate, params)
        return new_p, new_s

    t("adam_6groups", adam_groups, (grads, ostate, params, 0))

    # packed: one [N, 59] buffer, per-column lr
    packed = jnp.asarray(rng.normal(0, 1, (n, 59)).astype(np.float32))
    gpacked = packed * 0.01
    mu = jnp.zeros_like(packed)
    nu = jnp.zeros_like(packed)
    lr_cols = jnp.asarray(rng.uniform(1e-4, 1e-2, 59).astype(np.float32))

    def adam_packed(p, g, mu, nu, count):
        b1, b2, eps = 0.9, 0.999, 1e-15
        mu = b1 * mu + (1 - b1) * g
        nu = b2 * nu + (1 - b2) * g * g
        c = count + 1
        mu_hat = mu / (1 - b1 ** c)
        nu_hat = nu / (1 - b2 ** c)
        p = p - lr_cols[None, :] * mu_hat / (jnp.sqrt(nu_hat) + eps)
        return p, mu, nu, c

    t("adam_packed59", adam_packed,
      (packed, gpacked, mu, nu, jnp.asarray(0.0)))

    print(json.dumps(times))


if __name__ == "__main__":
    main()
