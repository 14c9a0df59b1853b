"""LPIPS perceptual distance (VGG16 backbone) in jax.

The BASELINE quality gate asks for rendered views within LPIPS 0.05 of
the CUDA reference's output. No perceptual-metric weights ship in this
image, so the VGG16 trunk loads from a local torchvision-format state
dict (``features.N.weight`` keys — the file ``vgg16-397923af.pth``) and
the LPIPS linear calibration from the lpips project's ``vgg.pth``
(``lin{k}.model.1.weight`` keys). Point DG_VGG16_CKPT / DG_LPIPS_CKPT at
them; without the lin file the per-layer channel mean is used instead of
the learned weights (documented deviation, still a valid relative
metric).

Forward math mirrors lpips.LPIPS(net='vgg'): scale inputs by the lpips
ScalingLayer, tap relu1_2/2_2/3_3/4_3/5_3, unit-normalize channels,
mean over space of the weighted squared difference, sum over layers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# torchvision vgg16.features conv indices and channels; taps AFTER the
# relu following each listed conv block slice.
_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_POOL_BEFORE = {5, 10, 17, 24}   # conv indices preceded by a maxpool
_TAP_AFTER = {2: 0, 7: 1, 14: 2, 21: 3, 28: 4}  # conv idx -> lpips slice
CHANNELS = [64, 128, 256, 512, 512]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def load_vgg16_features(path: str) -> list:
    """torchvision state dict -> [(kernel HWIO, bias)] per conv."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    out = []
    for i in _CONV_IDX:
        w = sd[f"features.{i}.weight"].numpy().transpose(2, 3, 1, 0)
        b = sd[f"features.{i}.bias"].numpy()
        out.append((np.ascontiguousarray(w), b))
    return out


def load_lpips_lins(path: str) -> list:
    """lpips vgg.pth -> [w [C]] per tapped layer (1x1 conv squeezed)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    out = []
    for k in range(5):
        w = sd[f"lin{k}.model.1.weight"].numpy()  # [1, C, 1, 1]
        out.append(np.ascontiguousarray(w[0, :, 0, 0]))
    return out


def _vgg_taps(params, x):
    """x: [B,H,W,3] lpips-scaled -> list of 5 tapped feature maps."""
    taps = [None] * 5
    for j, i in enumerate(_CONV_IDX):
        if i in _POOL_BEFORE:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID",
            )
        w, b = params[j]
        x = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        x = jax.nn.relu(x)
        if i in _TAP_AFTER:
            taps[_TAP_AFTER[i]] = x
    return taps


def _unit_norm(x, eps=1e-10):
    return x * jax.lax.rsqrt(
        jnp.sum(x * x, axis=-1, keepdims=True) + eps
    )


class LPIPS:
    """lpips(img0, img1): [B,H,W,3] in [0,1] -> [B] distances."""

    def __init__(self, vgg_ckpt: str, lpips_ckpt: str | None = None):
        params = [
            (jnp.asarray(w), jnp.asarray(b))
            for w, b in load_vgg16_features(vgg_ckpt)
        ]
        if lpips_ckpt:
            lins = [jnp.asarray(w) for w in load_lpips_lins(lpips_ckpt)]
        else:
            lins = [jnp.full((c,), 1.0 / c) for c in CHANNELS]

        @jax.jit
        def fn(img0, img1):
            def scaled(img):
                x = img * 2.0 - 1.0
                return (x - _SHIFT) / _SCALE

            t0 = _vgg_taps(params, scaled(img0))
            t1 = _vgg_taps(params, scaled(img1))
            total = 0.0
            for a, b, w in zip(t0, t1, lins):
                d = (_unit_norm(a) - _unit_norm(b)) ** 2
                total = total + jnp.mean(
                    jnp.sum(d * w, axis=-1), axis=(1, 2)
                )
            return total

        self._fn = fn

    def __call__(self, img0, img1):
        return self._fn(jnp.asarray(img0), jnp.asarray(img1))
