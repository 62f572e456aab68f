"""LPIPS perceptual loss (VGG16 features + learned linear heads) — JAX.

(ref tokenizer/tokenizer_image/lpips.py:53-97: ScalingLayer -> torchvision
vgg16 feature slices (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3) ->
channel-normalize -> squared diff -> 1x1 lin heads -> spatial average -> sum.)

Weights come from torchvision vgg16 + the lpips lin checkpoint via
convert/torch_lpips.py; with random weights the math is still exercised by
parity tests.
"""
from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from controlar_tpu.ops.conv import conv2d, max_pool2d

Params = Dict[str, Any]

# ref lpips.py ScalingLayer constants
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# torchvision vgg16.features conv indices per slice
VGG_SLICES = [(0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28)]


def vgg16_features(p: Params, x: jnp.ndarray) -> List[jnp.ndarray]:
    """x: (B,H,W,3) in [-1,1] already scaled. Returns 5 relu feature maps."""
    feats = []
    h = x
    for si, slice_ids in enumerate(VGG_SLICES):
        if si > 0:
            h = max_pool2d(h, 2, 2)
        for ci in slice_ids:
            conv = p[str(ci)]
            h = jax.nn.relu(conv2d(h, conv["w"], conv["b"]))
        feats.append(h)
    return feats


def _normalize(f: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True))
    return f / (norm + eps)


def lpips(p: Params, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """x, y: (B,H,W,3) in [-1,1]. Returns per-sample LPIPS (B,)."""
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)
    xs = (x - shift) / scale
    ys = (y - shift) / scale
    fx = vgg16_features(p["vgg"], xs)
    fy = vgg16_features(p["vgg"], ys)
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        d = (_normalize(a) - _normalize(b)) ** 2
        w = p["lins"][i]["w"]  # (1,1,C,1)
        lin = conv2d(d, w, None)
        total = total + jnp.mean(lin, axis=(1, 2, 3))
    return total


def init_lpips_params(rng: jax.Array) -> Params:
    """Random init (testing / training-from-scratch fallback)."""
    cfgs = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256),
            (256, 256), (256, 512), (512, 512), (512, 512), (512, 512),
            (512, 512), (512, 512)]
    conv_ids = [i for sl in VGG_SLICES for i in sl]
    keys = jax.random.split(rng, len(conv_ids) + 5)
    convs = {}
    for (cin, cout), ci, k in zip(cfgs, conv_ids, keys):
        convs[str(ci)] = {
            "w": jax.random.normal(k, (3, 3, cin, cout)) * (1.0 / np.sqrt(9 * cin)),
            "b": jnp.zeros((cout,)),
        }
    chns = [64, 128, 256, 512, 512]
    lins = [
        {"w": jnp.abs(jax.random.normal(keys[len(conv_ids) + i], (1, 1, c, 1))) * 0.01}
        for i, c in enumerate(chns)
    ]
    return {"vgg": convs, "lins": lins}
