"""LPIPS perceptual metric (VGG16 backbone) in JAX.

Matches the architecture of ``torchmetrics``' LPIPS used at reference
metrics.py:95: VGG16 features at relu1_2/2_2/3_3/4_3/5_3, per-channel unit
normalization, learned 1x1 linear heads, spatial mean, layer sum.

Pretrained weights cannot be downloaded in this zero-egress environment;
supply them as an .npz via ``LPIPS.from_npz``. Expected keys:
``features.{i}.weight`` / ``features.{i}.bias`` for the VGG conv layers
(torchvision state_dict indices) and ``lin{k}.model.1.weight`` for the five
LPIPS heads — i.e. ``np.savez(path, **{k: v.numpy() for k, v in
torch_state_dict.items()})`` of the torchmetrics/lpips checkpoint.
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np
from jax import lax

# VGG16 conv layout: torchvision features indices of conv layers, with the
# relu slice boundaries used by LPIPS.
_VGG16_CONVS = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_SLICE_ENDS = {2: 0, 7: 1, 14: 2, 21: 3, 28: 4}  # conv idx -> lpips layer
_POOL_AFTER = {2, 7, 14, 21}  # maxpool after these conv indices (pre-slice)

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class LPIPS:
    def __init__(self, convs: List[np.ndarray], biases: List[np.ndarray],
                 heads: List[np.ndarray]):
        self.convs = [jnp.asarray(w) for w in convs]    # [O, I, 3, 3]
        self.biases = [jnp.asarray(b) for b in biases]  # [O]
        self.heads = [jnp.asarray(h) for h in heads]    # [1, C, 1, 1]

    @classmethod
    def from_npz(cls, path: str) -> "LPIPS":
        data = dict(np.load(path))
        convs, biases = [], []
        for i in _VGG16_CONVS:
            key = f"features.{i}.weight"
            # tolerate a "net." / "net.slice" style prefix
            cands = [k for k in data if k.endswith(key)]
            if not cands:
                raise KeyError(f"LPIPS npz missing {key}")
            convs.append(data[cands[0]])
            biases.append(data[cands[0].replace("weight", "bias")])
        heads = []
        for k in range(5):
            cands = [
                key for key in data
                if f"lin{k}" in key and key.endswith("weight")
            ]
            if not cands:
                raise KeyError(f"LPIPS npz missing lin{k} head")
            heads.append(data[cands[0]])
        return cls(convs, biases, heads)

    def _features(self, img: jnp.ndarray) -> List[jnp.ndarray]:
        """img: [H, W, 3] in [0, 1] -> list of 5 feature maps [1, C, h, w]."""
        x = img * 2.0 - 1.0  # lpips scaling layer input range
        x = (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
        x = x.transpose(2, 0, 1)[None]  # NCHW
        feats = []
        for li, (w, b) in enumerate(zip(self.convs, self.biases)):
            dn = lax.conv_dimension_numbers(
                x.shape, w.shape, ("NCHW", "OIHW", "NCHW")
            )
            x = lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=dn
            ) + b[None, :, None, None]
            x = jnp.maximum(x, 0.0)
            conv_idx = _VGG16_CONVS[li]
            if conv_idx in _SLICE_ENDS:
                feats.append(x)
            if conv_idx in _POOL_AFTER:
                x = lax.reduce_window(
                    x, -jnp.inf, lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
                )
        return feats

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        fp = self._features(pred)
        ft = self._features(target)
        total = jnp.asarray(0.0)
        for p, t, h in zip(fp, ft, self.heads):
            pn = p / jnp.sqrt(jnp.sum(p**2, axis=1, keepdims=True) + 1e-10)
            tn = t / jnp.sqrt(jnp.sum(t**2, axis=1, keepdims=True) + 1e-10)
            d = (pn - tn) ** 2
            w = jnp.asarray(h).reshape(1, -1, 1, 1)
            total = total + jnp.mean(jnp.sum(d * w, axis=1))
        return total
