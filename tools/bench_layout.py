"""Is the projection/SH cost (6.4 + 3.5 ms for < 10 MFLOP of VPU math)
the small-minor-dim layout pathology?  Compare [N, 3]-style tensors +
stacked outputs vs channel-major [3, N] inputs + unstacked outputs.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import json

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from qed_splatter_tpu.ops.projection import project_gaussians
    from qed_splatter_tpu.ops.sh import eval_sh_basis, eval_sh_colors
    from qed_splatter_tpu.utils.microbench import device_time_per_call

    rng = np.random.default_rng(0)
    times = {}

    def t(name, op, args, n=20):
        times[name] = round(device_time_per_call(op, args, n=n) * 1e3, 3)
        print(name, times[name], "ms", flush=True)

    n = 131_072
    means = jnp.asarray(rng.normal(0, 1, (n, 3)).astype(np.float32))
    quats = jnp.asarray(rng.normal(0, 1, (n, 4)).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.01, 0.1, (n, 3)).astype(np.float32))
    viewmat = jnp.eye(4, dtype=jnp.float32)[None]
    K = jnp.asarray([[800.0, 0, 648], [0, 800, 420], [0, 0, 1]],
                    jnp.float32)[None]

    def proj_op(m, q, s):
        return project_gaussians(m, q, s, viewmat, K, 1296, 840)

    t("proj_fwd_rowmajor", proj_op, (means, quats, scales))

    # channel-major variant: same math, inputs [3, N] etc, outputs unstacked
    means_t, quats_t, scales_t = means.T, quats.T, scales.T

    def proj_cm(mt, qt, st):
        f32 = jnp.float32
        R = viewmat[:, :3, :3].astype(f32)
        tt = viewmat[:, :3, 3].astype(f32)
        fx, fy, cx, cy = K[0, 0, 0], K[0, 1, 1], K[0, 0, 2], K[0, 1, 2]
        m = [mt[i] for i in range(3)]
        p = [sum(R[0, i, j] * m[j] for j in range(3)) + tt[0, i]
             for i in range(3)]
        z = p[2]
        z_safe = jnp.where((z > 0.01) & (z < 1e10), z, 1.0)
        sq = sum(qt[i] * qt[i] for i in range(4))
        qn = [qt[i] / jnp.sqrt(jnp.maximum(sq, 1e-24)) for i in range(4)]
        w, x, y, zq = qn
        r = [[1 - 2 * (y * y + zq * zq), 2 * (x * y - w * zq),
              2 * (x * zq + w * y)],
             [2 * (x * y + w * zq), 1 - 2 * (x * x + zq * zq),
              2 * (y * zq - w * x)],
             [2 * (x * zq - w * y), 2 * (y * zq + w * x),
              1 - 2 * (x * x + y * y)]]
        M = [[r[i][j] * st[j] for j in range(3)] for i in range(3)]
        RM = [[sum(R[0, i, j] * M[j][k] for j in range(3)) for k in range(3)]
              for i in range(3)]

        def dotrow(i, l):
            return sum(RM[i][k] * RM[l][k] for k in range(3))

        inv_z = 1.0 / z_safe
        j00 = fx * inv_z
        j11 = fy * inv_z
        j02 = -fx * p[0] * inv_z * inv_z
        j12 = -fy * p[1] * inv_z * inv_z
        s00, s01, s02 = dotrow(0, 0), dotrow(0, 1), dotrow(0, 2)
        s11, s12, s22 = dotrow(1, 1), dotrow(1, 2), dotrow(2, 2)
        a = j00 * (j00 * s00 + j02 * s02) + j02 * (j00 * s02 + j02 * s22)
        b = j00 * (j11 * s01 + j12 * s02) + j02 * (j11 * s12 + j12 * s22)
        c = j11 * (j11 * s11 + j12 * s12) + j12 * (j11 * s12 + j12 * s22)
        det = (a + 0.3) * (c + 0.3) - b * b
        inv_det = 1.0 / jnp.where(det > 1e-6, det, 1.0)
        mx = fx * p[0] * inv_z + cx
        my = fy * p[1] * inv_z + cy
        mid = 0.5 * (a + c + 0.6)
        lam = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.01))
        radius = jnp.ceil(3.0 * jnp.sqrt(lam))
        return (mx, my, z, (c + 0.3) * inv_det, -b * inv_det,
                (a + 0.3) * inv_det, radius)

    t("proj_fwd_chanmajor", proj_cm, (means_t, quats_t, scales_t))

    def proj_cm_grad(mt, qt, st):
        def lo(m_, q_, s_):
            outs = proj_cm(m_, q_, s_)
            return sum(jnp.sum(o) for o in outs)
        return jax.grad(lo, argnums=(0, 1, 2))(mt, qt, st)

    t("proj_fwdbwd_chanmajor", proj_cm_grad, (means_t, quats_t, scales_t))

    def proj_grad_row(m, q, s):
        def lo(m_, q_, s_):
            pr = project_gaussians(m_, q_, s_, viewmat, K, 1296, 840)
            return (jnp.sum(pr.means2d) + jnp.sum(pr.conics)
                    + jnp.sum(pr.depths) + jnp.sum(pr.compensations))
        return jax.grad(lo, argnums=(0, 1, 2))(m, q, s)

    t("proj_fwdbwd_rowmajor", proj_grad_row, (means, quats, scales))

    # ---- SH ----
    coeffs = jnp.asarray(rng.normal(0, 0.2, (n, 16, 3)).astype(np.float32))
    campos = jnp.zeros(3, jnp.float32)

    def sh_row(c, m):
        return eval_sh_colors(c, m, campos, jnp.asarray(3, jnp.int32), 3)

    t("sh_fwd_rowmajor", sh_row, (coeffs, means))

    coeffs_cm = jnp.transpose(coeffs, (2, 1, 0))  # [3, 16, N]

    def sh_cm(ccm, mt):
        d = [mt[i] - campos[i] for i in range(3)]
        sq = sum(x * x for x in d)
        inv = 1.0 / jnp.sqrt(jnp.maximum(sq, 1e-24))
        dirs = jnp.stack([x * inv for x in d], axis=-1)  # [N, 3] small
        basis = eval_sh_basis(dirs, 3)  # [N, 16]... still row-major
        bT = basis.T  # [16, N]
        cols = [sum(bT[k] * ccm[ch, k] for k in range(16)) + 0.5
                for ch in range(3)]
        return [jnp.maximum(c, 0.0) for c in cols]

    t("sh_fwd_chanmajor", sh_cm, (coeffs_cm, means_t))

    def sh_cm_grad(ccm, mt):
        def lo(c_, m_):
            return sum(jnp.sum(x) for x in sh_cm(c_, m_))
        return jax.grad(lo, argnums=(0, 1))(ccm, mt)

    t("sh_fwdbwd_chanmajor", sh_cm_grad, (coeffs_cm, means_t))

    def sh_row_grad(c, m):
        def lo(c_, m_):
            return jnp.sum(sh_row(c_, m_))
        return jax.grad(lo, argnums=(0, 1))(c, m)

    t("sh_fwdbwd_rowmajor", sh_row_grad, (coeffs, means))

    # transposes needed at the boundary (params stored row-major)
    t("transpose_coeffs", lambda c: jnp.transpose(c, (2, 1, 0)), (coeffs,))
    packed_cm = jnp.asarray(rng.uniform(0, 1, (11, n)).astype(np.float32))
    t("transpose_packed_11xN", lambda p: p.T, (packed_cm,))

    print(json.dumps(times))


if __name__ == "__main__":
    main()
