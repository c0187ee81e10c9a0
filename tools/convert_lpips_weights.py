#!/usr/bin/env python
"""Convert a torchmetrics LPIPS checkpoint into the .npz this framework loads.

The build environment is zero-egress, so pretrained backbone weights cannot
be downloaded here; run this once on any machine with torchmetrics + network:

    python tools/convert_lpips_weights.py --out lpips_alex.npz

then point the framework at it:

    QED_LPIPS_WEIGHTS=lpips_alex.npz qed eval --data ... --load-dir ...

Defaults to ``--net alex`` — the torchmetrics default the reference
constructs at metrics.py:95, so converted-weight ``rgb_lpips`` values are
directly comparable to the reference's. ``--net vgg`` converts the VGG16
variant instead (not reference-comparable; richzhang convention).

The output bundles the backbone conv weights and the five LPIPS linear
heads under the key names ``ops/lpips.py`` expects (``features.{i}.weight``
/ ``.bias``, ``lin{k}...weight``); the loader auto-detects the backbone.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="lpips_alex.npz")
    parser.add_argument("--net", default="alex", choices=["alex", "vgg"])
    args = parser.parse_args()

    import numpy as np
    from torchmetrics.image.lpip import (
        LearnedPerceptualImagePatchSimilarity,
    )

    m = LearnedPerceptualImagePatchSimilarity(net_type=args.net)
    out = {}
    for k, v in m.net.state_dict().items():
        out[k] = v.detach().cpu().numpy().astype(np.float32)
    np.savez(args.out, **out)
    print(f"wrote {len(out)} tensors ({args.net}) to {args.out}")


if __name__ == "__main__":
    main()
