"""Explain pc_accuracy_p90: where do the far-from-surface gaussians live?

VERDICT r3 weak #7: the 30k room run reported pc_accuracy_p90 = 0.24 m
against a 0.05 m completeness radius and nobody looked. This tool takes a
reconstruction (gaussian means from a checkpoint or an exported PLY) and a
reference surface cloud and reports the NN-distance distribution plus a
breakdown of the far tail: inside the scene volume (floaters), or beyond
the walls (depth-ambiguous fog pushed outside) — with opacity/scale stats
per group when a checkpoint is given, so the cull-threshold discussion has
numbers.

Usage:
  python -m tools.analyze_pc --pred splat.ply --ref sparse_pc.ply
  python -m tools.analyze_pc --load-dir outputs/run/ckpts --ref ref.ply
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pred", help="reconstruction PLY (splat export)")
    ap.add_argument("--load-dir", help="checkpoint dir (uses means+alive)")
    ap.add_argument("--ref", required=True, help="reference surface PLY")
    ap.add_argument("--far", type=float, default=0.24,
                    help="far-tail threshold in metric units")
    ns = ap.parse_args(argv)

    from qed_splatter_tpu.data.ply import read_ply

    opac = scale = None
    if ns.load_dir:
        import jax

        jax.config.update("jax_platforms", "cpu")
        from qed_splatter_tpu.engine import checkpoint as ckpt

        state = ckpt.load_state(Path(ns.load_dir))
        params = state.params
        alive = np.asarray(params.alive)
        P = np.asarray(params.means)[alive]
        log_s = np.asarray(params.scales)[alive]
        # back to input-world coordinates (the reference cloud's frame)
        meta = ckpt.checkpoint_meta(Path(ns.load_dir))
        P, log_s = ckpt._inverse_transform(P, log_s, meta)
        opac = 1 / (1 + np.exp(-np.asarray(params.opacities)[alive]))
        scale = np.exp(log_s).max(axis=-1)
    else:
        P = read_ply(ns.pred).positions
    R = read_ply(ns.ref).positions
    finite = np.isfinite(P).all(axis=1)
    if not finite.all():
        print(f"WARNING: {(~finite).sum()} non-finite recon points dropped")
        P = P[finite]
        if opac is not None:
            opac, scale = opac[finite], scale[finite]
    print(f"recon {len(P)} pts, ref {len(R)} pts")

    from scipy.spatial import cKDTree

    d, _ = cKDTree(R).query(P, k=1, workers=-1)
    q = np.percentile(d, [50, 75, 90, 95, 99])
    print(f"NN dist percentiles 50/75/90/95/99: {np.round(q, 4)}")
    far = d > ns.far
    print(f"frac beyond {ns.far}: {far.mean():.4f} ({far.sum()} pts)")
    if far.any():
        lo, hi = R.min(0) - 0.05, R.max(0) + 0.05
        inside = ((P[far] > lo) & (P[far] < hi)).all(axis=1)
        print(f"far tail: {inside.mean():.3f} inside the reference AABB "
              f"(floaters), {1 - inside.mean():.3f} outside (behind "
              f"surfaces / fog)")
        if opac is not None:
            print(f"far-tail opacity: median {np.median(opac[far]):.4f} "
                  f"(near-surface median {np.median(opac[~far]):.4f})")
            print(f"far-tail max-scale: median {np.median(scale[far]):.4f}"
                  f" (near-surface median {np.median(scale[~far]):.4f})")
            w = opac / opac.sum()
            print(f"opacity-weighted frac beyond {ns.far}: "
                  f"{w[far].sum():.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
