#!/usr/bin/env python
"""Convert a torch LPIPS(VGG) checkpoint into the .npz this framework loads.

The build environment is zero-egress, so pretrained VGG weights cannot be
downloaded here; run this once on any machine with torchvision + network:

    python tools/convert_lpips_weights.py --out lpips_vgg.npz

then point the framework at it:

    QED_LPIPS_WEIGHTS=lpips_vgg.npz qed eval --data ... --load-dir ...

The output bundles the torchvision VGG16 feature weights and the five
LPIPS linear heads (from the torchmetrics/richzhang checkpoint) under the
key names ``ops/lpips.py`` expects (``features.{i}.weight/bias``,
``lin{k}...weight``).
"""

import argparse


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="lpips_vgg.npz")
    args = parser.parse_args()

    import numpy as np
    import torch
    from torchmetrics.image.lpip import (
        LearnedPerceptualImagePatchSimilarity,
    )

    m = LearnedPerceptualImagePatchSimilarity(net_type="vgg")
    out = {}
    for k, v in m.net.state_dict().items():
        out[k] = v.detach().cpu().numpy().astype(np.float32)
    np.savez(args.out, **out)
    print(f"wrote {len(out)} tensors to {args.out}")


if __name__ == "__main__":
    main()
