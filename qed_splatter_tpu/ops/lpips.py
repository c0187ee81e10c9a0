"""LPIPS perceptual metric in JAX (AlexNet and VGG16 backbones).

Matches ``torchmetrics``' ``LearnedPerceptualImagePatchSimilarity`` used at
reference metrics.py:95. The reference constructs it with **defaults**:
``net_type="alex"`` and ``normalize=False`` — and feeds [0, 1] images
(reference metrics.py:106-110), so the scaling layer sees the [0, 1] range
directly with no [-1, 1] rescale. Reproducing that exactly is what makes
``rgb_lpips`` numerically comparable across the two stacks; pass
``normalize=True`` for the richzhang convention ([0, 1] -> [-1, 1] first).

Backbone taps (torchvision ``features`` indices of the conv layers):

- alex: relu1..relu5 (convs at 0, 3, 6, 8, 10; maxpool 3x3/2 after
  relu1 and relu2)
- vgg16: relu1_2/2_2/3_3/4_3/5_3 (maxpool 2x2/2 between blocks)

Pretrained weights cannot be downloaded in this zero-egress environment;
supply them as an .npz via ``LPIPS.from_npz`` (see
``tools/convert_lpips_weights.py``). Expected keys: ``features.{i}.weight``
/ ``.bias`` for the backbone convs (torchvision state_dict indices,
arbitrary prefix tolerated) and ``lin{k}...weight`` for the five 1x1
heads — i.e. ``np.savez(path, **torch_state_dict)`` of the torchmetrics
checkpoint. The backbone is auto-detected from which conv indices exist.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax

# (conv feature-index, stride, padding) per backbone, plus which convs are
# followed by a feature tap and/or a maxpool (applied AFTER the tap).
_ARCH: Dict[str, dict] = {
    "vgg": dict(
        convs=[(i, 1, 1) for i in
               (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)],
        taps={2, 7, 14, 21, 28},
        pools={2: (2, 2), 7: (2, 2), 14: (2, 2), 21: (2, 2)},
    ),
    "alex": dict(
        convs=[(0, 4, 2), (3, 1, 2), (6, 1, 1), (8, 1, 1), (10, 1, 1)],
        taps={0, 3, 6, 8, 10},
        pools={0: (3, 2), 3: (3, 2)},
    ),
}

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class LPIPS:
    """Functional LPIPS; ``normalize=False`` + [0, 1] inputs reproduces the
    reference's torchmetrics-default behavior."""

    def __init__(self, convs: Sequence[np.ndarray],
                 biases: Sequence[np.ndarray],
                 heads: Sequence[np.ndarray], net_type: str = "alex",
                 normalize: bool = False):
        if net_type not in _ARCH:
            raise ValueError(f"net_type must be one of {list(_ARCH)}")
        self.net_type = net_type
        self.normalize = normalize
        self.convs = [jnp.asarray(w) for w in convs]    # [O, I, kh, kw]
        self.biases = [jnp.asarray(b) for b in biases]  # [O]
        self.heads = [jnp.asarray(h) for h in heads]    # [1, C, 1, 1]

    @classmethod
    def from_npz(cls, path: str, normalize: bool = False) -> "LPIPS":
        data = dict(np.load(path))

        def find(key: str) -> str:
            cands = [k for k in data if k.endswith(key)]
            if not cands:
                raise KeyError(f"LPIPS npz missing {key}")
            return cands[0]

        # auto-detect backbone: vgg16 has a conv at features index 28
        net_type = "vgg" if any(
            k.endswith("features.28.weight") for k in data
        ) else "alex"
        convs, biases = [], []
        for i, _, _ in _ARCH[net_type]["convs"]:
            k = find(f"features.{i}.weight")
            convs.append(data[k])
            biases.append(data[k.replace("weight", "bias")])
        heads = []
        for k in range(5):
            cands = [key for key in data
                     if f"lin{k}" in key and key.endswith("weight")]
            if not cands:
                raise KeyError(f"LPIPS npz missing lin{k} head")
            heads.append(data[cands[0]])
        return cls(convs, biases, heads, net_type=net_type,
                   normalize=normalize)

    def _features(self, img: jnp.ndarray) -> List[jnp.ndarray]:
        """img: [H, W, 3] in [0, 1] -> list of 5 feature maps [1, C, h, w]."""
        x = img
        if self.normalize:
            x = x * 2.0 - 1.0  # richzhang convention; torchmetrics default off
        x = (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
        x = x.transpose(2, 0, 1)[None]  # NCHW
        arch = _ARCH[self.net_type]
        feats = []
        for (conv_idx, stride, pad), w, b in zip(
            arch["convs"], self.convs, self.biases
        ):
            dn = lax.conv_dimension_numbers(
                x.shape, w.shape, ("NCHW", "OIHW", "NCHW")
            )
            x = lax.conv_general_dilated(
                x, w, (stride, stride), [(pad, pad), (pad, pad)],
                dimension_numbers=dn,
            ) + b[None, :, None, None]
            x = jnp.maximum(x, 0.0)
            if conv_idx in arch["taps"]:
                feats.append(x)
            if conv_idx in arch["pools"]:
                k, s = arch["pools"][conv_idx]
                x = lax.reduce_window(
                    x, -jnp.inf, lax.max, (1, 1, k, k), (1, 1, s, s), "VALID"
                )
        return feats

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        fp = self._features(pred)
        ft = self._features(target)
        total = jnp.asarray(0.0)
        for p, t, h in zip(fp, ft, self.heads):
            # richzhang normalize_tensor: eps OUTSIDE the sqrt
            pn = p / (jnp.sqrt(jnp.sum(p**2, axis=1, keepdims=True)) + 1e-10)
            tn = t / (jnp.sqrt(jnp.sum(t**2, axis=1, keepdims=True)) + 1e-10)
            d = (pn - tn) ** 2
            w = jnp.asarray(h).reshape(1, -1, 1, 1)
            total = total + jnp.mean(jnp.sum(d * w, axis=1))
        return total
