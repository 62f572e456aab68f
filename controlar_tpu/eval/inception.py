"""FID InceptionV3 feature extractor in JAX (NHWC, bf16-friendly).

Replaces the reference evaluator's frozen TF-1 graph
(ref evaluations/c2i/evaluator.py:16-24, 598-629):
- pool_3 features (N, 2048) — the FID/precision/recall embedding,
- spatial features `mixed_6/conv:0[..., :7]` (N, 17*17*7=2023) for sFID
  (evaluator.py:611-612 slices the first 7 channels),
- class logits = pool3 @ W with NO bias (evaluator.py:621-629 builds the
  softmax graph from the bare `softmax/logits/MatMul` weight) for IS.

Architecture is the 2015 "TF-FID" InceptionV3 as reproduced by the standard
pytorch-fid port (mseitzer/pytorch-fid FIDInceptionA/C/E patches vs
torchvision: average pools exclude the zero padding, and Mixed_7c's pool
branch is a MAX pool). Weights load from the pytorch-fid checkpoint
(`pt_inception-2015-12-05-*.pth`) via `load_torch_inception`; param-tree keys
mirror the torch module paths so conversion is mechanical.

TF-block -> torch-module mapping for the spatial tensor: the TF graph's
17x17 blocks are mixed_4..mixed_7 == torch Mixed_6b..6e, so `mixed_6` is
Mixed_6d and its `conv` tower is branch1x1 (post-BN-ReLU output).

Input contract matches the TF graph: NHWC uint8/float in [0, 255], any
resolution; resized to 299x299 with the LEGACY TF1 ResizeBilinear sampling
(src = dst * in/out, no half-pixel shift — jax.image.resize uses half-pixel
centers, which is NOT what the frozen graph does), then (x - 128) / 128.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

# ---------------------------------------------------------------------------
# Architecture spec: every conv+bn leaf as (in_ch, out_ch, kh, kw).
# Keys mirror the torch module paths of pytorch-fid's InceptionV3.
# ---------------------------------------------------------------------------


def _a(in_ch, pf):
    return {
        "branch1x1": (in_ch, 64, 1, 1),
        "branch5x5_1": (in_ch, 48, 1, 1),
        "branch5x5_2": (48, 64, 5, 5),
        "branch3x3dbl_1": (in_ch, 64, 1, 1),
        "branch3x3dbl_2": (64, 96, 3, 3),
        "branch3x3dbl_3": (96, 96, 3, 3),
        "branch_pool": (in_ch, pf, 1, 1),
    }


def _b(in_ch):
    return {
        "branch3x3": (in_ch, 384, 3, 3),
        "branch3x3dbl_1": (in_ch, 64, 1, 1),
        "branch3x3dbl_2": (64, 96, 3, 3),
        "branch3x3dbl_3": (96, 96, 3, 3),
    }


def _c(in_ch, c7):
    return {
        "branch1x1": (in_ch, 192, 1, 1),
        "branch7x7_1": (in_ch, c7, 1, 1),
        "branch7x7_2": (c7, c7, 1, 7),
        "branch7x7_3": (c7, 192, 7, 1),
        "branch7x7dbl_1": (in_ch, c7, 1, 1),
        "branch7x7dbl_2": (c7, c7, 7, 1),
        "branch7x7dbl_3": (c7, c7, 1, 7),
        "branch7x7dbl_4": (c7, c7, 7, 1),
        "branch7x7dbl_5": (c7, 192, 1, 7),
        "branch_pool": (in_ch, 192, 1, 1),
    }


def _d(in_ch):
    return {
        "branch3x3_1": (in_ch, 192, 1, 1),
        "branch3x3_2": (192, 320, 3, 3),
        "branch7x7x3_1": (in_ch, 192, 1, 1),
        "branch7x7x3_2": (192, 192, 1, 7),
        "branch7x7x3_3": (192, 192, 7, 1),
        "branch7x7x3_4": (192, 192, 3, 3),
    }


def _e(in_ch):
    return {
        "branch1x1": (in_ch, 320, 1, 1),
        "branch3x3_1": (in_ch, 384, 1, 1),
        "branch3x3_2a": (384, 384, 1, 3),
        "branch3x3_2b": (384, 384, 3, 1),
        "branch3x3dbl_1": (in_ch, 448, 1, 1),
        "branch3x3dbl_2": (448, 384, 3, 3),
        "branch3x3dbl_3a": (384, 384, 1, 3),
        "branch3x3dbl_3b": (384, 384, 3, 1),
        "branch_pool": (in_ch, 192, 1, 1),
    }


SPEC: Dict[str, Any] = {
    "Conv2d_1a_3x3": (3, 32, 3, 3),
    "Conv2d_2a_3x3": (32, 32, 3, 3),
    "Conv2d_2b_3x3": (32, 64, 3, 3),
    "Conv2d_3b_1x1": (64, 80, 1, 1),
    "Conv2d_4a_3x3": (80, 192, 3, 3),
    "Mixed_5b": _a(192, 32),
    "Mixed_5c": _a(256, 64),
    "Mixed_5d": _a(288, 64),
    "Mixed_6a": _b(288),
    "Mixed_6b": _c(768, 128),
    "Mixed_6c": _c(768, 160),
    "Mixed_6d": _c(768, 160),
    "Mixed_6e": _c(768, 192),
    "Mixed_7a": _d(768),
    "Mixed_7b": _e(1280),
    "Mixed_7c": _e(2048),
}
NUM_LOGITS = 1008  # the 2015 graph's 1008-way softmax (evaluator.py:621)
POOL_DIM = 2048
SPATIAL_DIM = 7 * 17 * 17  # 2023


def init_inception_params(rng: jax.Array, dtype=jnp.float32) -> Params:
    """Random-weight tree with the exact structure/shapes of the real model
    (for tests and converter plumbing; real metrics need converted weights)."""
    leaves = []

    def build(spec):
        if isinstance(spec, tuple):
            leaves.append(spec)
            return spec
        return {k: build(v) for k, v in spec.items()}

    build(SPEC)
    keys = jax.random.split(rng, len(leaves) + 1)
    it = iter(range(len(leaves)))

    def make(spec):
        if isinstance(spec, tuple):
            cin, cout, kh, kw = spec
            i = next(it)
            fan_in = cin * kh * kw
            return {
                "w": (jax.random.normal(keys[i], (kh, kw, cin, cout))
                      / np.sqrt(fan_in)).astype(dtype),
                "bn_scale": jnp.ones((cout,), dtype),
                "bn_bias": jnp.zeros((cout,), dtype),
                "bn_mean": jnp.zeros((cout,), dtype),
                "bn_var": jnp.ones((cout,), dtype),
            }
        return {k: make(v) for k, v in spec.items()}

    params = make(SPEC)
    params["fc"] = {
        "w": (jax.random.normal(keys[-1], (POOL_DIM, NUM_LOGITS)) * 0.01).astype(dtype),
        "b": jnp.zeros((NUM_LOGITS,), dtype),
    }
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

_BN_EPS = 1e-3  # torchvision BasicConv2d: BatchNorm2d(eps=0.001)


def _conv_bn(p, x, stride=1, padding="VALID"):
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    inv = jax.lax.rsqrt(p["bn_var"].astype(jnp.float32) + _BN_EPS)
    scale = (p["bn_scale"] * inv).astype(x.dtype)
    shift = (p["bn_bias"] - p["bn_mean"] * p["bn_scale"] * inv).astype(x.dtype)
    return jax.nn.relu(y * scale + shift)


def _pad_hw(k):
    return [(0, 0), (k[0] // 2, k[0] // 2), (k[1] // 2, k[1] // 2), (0, 0)]


def _avg_pool_nopad(x, k=3):
    """3x3 stride-1 average pool excluding the zero padding from the count
    (pytorch-fid's count_include_pad=False patch vs torchvision)."""
    pad = _pad_hw((k, k))
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, k, k, 1), (1, 1, 1, 1), pad)
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, k, k, 1), (1, 1, 1, 1), pad)
    return s / cnt


def _max_pool(x, k=3, stride=2, same=False):
    pad = _pad_hw((k, k)) if same else [(0, 0)] * 4
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, stride, stride, 1), pad
    )


def _block_a(p, x):
    b1 = _conv_bn(p["branch1x1"], x)
    b5 = _conv_bn(p["branch5x5_2"], _conv_bn(p["branch5x5_1"], x), padding=_pad_hw((5, 5))[1:3])
    b3 = _conv_bn(p["branch3x3dbl_1"], x)
    b3 = _conv_bn(p["branch3x3dbl_2"], b3, padding=_pad_hw((3, 3))[1:3])
    b3 = _conv_bn(p["branch3x3dbl_3"], b3, padding=_pad_hw((3, 3))[1:3])
    bp = _conv_bn(p["branch_pool"], _avg_pool_nopad(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _block_b(p, x):
    b3 = _conv_bn(p["branch3x3"], x, stride=2)
    bd = _conv_bn(p["branch3x3dbl_1"], x)
    bd = _conv_bn(p["branch3x3dbl_2"], bd, padding=_pad_hw((3, 3))[1:3])
    bd = _conv_bn(p["branch3x3dbl_3"], bd, stride=2)
    bp = _max_pool(x, 3, 2)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _block_c(p, x):
    p17 = _pad_hw((1, 7))[1:3]
    p71 = _pad_hw((7, 1))[1:3]
    b1 = _conv_bn(p["branch1x1"], x)
    b7 = _conv_bn(p["branch7x7_1"], x)
    b7 = _conv_bn(p["branch7x7_2"], b7, padding=p17)
    b7 = _conv_bn(p["branch7x7_3"], b7, padding=p71)
    bd = _conv_bn(p["branch7x7dbl_1"], x)
    bd = _conv_bn(p["branch7x7dbl_2"], bd, padding=p71)
    bd = _conv_bn(p["branch7x7dbl_3"], bd, padding=p17)
    bd = _conv_bn(p["branch7x7dbl_4"], bd, padding=p71)
    bd = _conv_bn(p["branch7x7dbl_5"], bd, padding=p17)
    bp = _conv_bn(p["branch_pool"], _avg_pool_nopad(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1), b1


def _block_d(p, x):
    b3 = _conv_bn(p["branch3x3_2"], _conv_bn(p["branch3x3_1"], x), stride=2)
    b7 = _conv_bn(p["branch7x7x3_1"], x)
    b7 = _conv_bn(p["branch7x7x3_2"], b7, padding=_pad_hw((1, 7))[1:3])
    b7 = _conv_bn(p["branch7x7x3_3"], b7, padding=_pad_hw((7, 1))[1:3])
    b7 = _conv_bn(p["branch7x7x3_4"], b7, stride=2)
    bp = _max_pool(x, 3, 2)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _block_e(p, x, pool: str):
    b1 = _conv_bn(p["branch1x1"], x)
    b3 = _conv_bn(p["branch3x3_1"], x)
    b3 = jnp.concatenate([
        _conv_bn(p["branch3x3_2a"], b3, padding=_pad_hw((1, 3))[1:3]),
        _conv_bn(p["branch3x3_2b"], b3, padding=_pad_hw((3, 1))[1:3]),
    ], axis=-1)
    bd = _conv_bn(p["branch3x3dbl_1"], x)
    bd = _conv_bn(p["branch3x3dbl_2"], bd, padding=_pad_hw((3, 3))[1:3])
    bd = jnp.concatenate([
        _conv_bn(p["branch3x3dbl_3a"], bd, padding=_pad_hw((1, 3))[1:3]),
        _conv_bn(p["branch3x3dbl_3b"], bd, padding=_pad_hw((3, 1))[1:3]),
    ], axis=-1)
    if pool == "max":  # Mixed_7c: the TF graph uses max here (FIDInceptionE_2)
        pooled = _max_pool(x, 3, 1, same=True)
    else:
        pooled = _avg_pool_nopad(x)
    bp = _conv_bn(p["branch_pool"], pooled)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def resize_bilinear_tf1(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Legacy TF1 ResizeBilinear (align_corners=False, NO half-pixel shift):
    src = dst * (in/out). This is what the frozen 2015 graph applies to the
    raw input batch; jax.image.resize's half-pixel convention differs."""
    n, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x

    def axis_idx(in_size, out_size):
        src = jnp.arange(out_size, dtype=jnp.float32) * (in_size / out_size)
        i0 = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, in_size - 1)
        i1 = jnp.minimum(i0 + 1, in_size - 1)
        t = src - i0.astype(jnp.float32)
        return i0, i1, t

    y0, y1, ty = axis_idx(h, out_h)
    x0, x1, tx = axis_idx(w, out_w)
    top = x[:, y0]
    bot = x[:, y1]
    rows = top + (bot - top) * ty[None, :, None, None]
    left = rows[:, :, x0]
    right = rows[:, :, x1]
    return left + (right - left) * tx[None, None, :, None]


def inception_features(
    params: Params, images: jnp.ndarray, compute_dtype=jnp.float32
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """images: NHWC in [0, 255] (uint8 or float), any HxW.

    Returns (pool3 (N,2048), spatial (N,2023), logits (N,1008)) in float32.
    """
    x = images.astype(jnp.float32)
    x = resize_bilinear_tf1(x, 299, 299)
    x = ((x - 128.0) / 128.0).astype(compute_dtype)

    x = _conv_bn(params["Conv2d_1a_3x3"], x, stride=2)
    x = _conv_bn(params["Conv2d_2a_3x3"], x)
    x = _conv_bn(params["Conv2d_2b_3x3"], x, padding=_pad_hw((3, 3))[1:3])
    x = _max_pool(x, 3, 2)
    x = _conv_bn(params["Conv2d_3b_1x1"], x)
    x = _conv_bn(params["Conv2d_4a_3x3"], x)
    x = _max_pool(x, 3, 2)

    x = _block_a(params["Mixed_5b"], x)
    x = _block_a(params["Mixed_5c"], x)
    x = _block_a(params["Mixed_5d"], x)
    x = _block_b(params["Mixed_6a"], x)
    x, _ = _block_c(params["Mixed_6b"], x)
    x, _ = _block_c(params["Mixed_6c"], x)
    x, b1_6d = _block_c(params["Mixed_6d"], x)  # TF "mixed_6/conv" tower
    spatial = b1_6d[..., :7]  # evaluator.py:612 `spatial[..., :7]`
    x, _ = _block_c(params["Mixed_6e"], x)
    x = _block_d(params["Mixed_7a"], x)
    x = _block_e(params["Mixed_7b"], x, pool="avg")
    x = _block_e(params["Mixed_7c"], x, pool="max")

    pool3 = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # global average pool
    # IS logits: bare MatMul against the softmax weight, NO bias
    # (evaluator.py:627-629 uses only matmul.inputs[1])
    logits = pool3 @ params["fc"]["w"].astype(jnp.float32)
    n = pool3.shape[0]
    return pool3, spatial.astype(jnp.float32).reshape(n, -1), logits


def iter_conv_paths():
    """Yield (dotted_torch_path, (cin, cout, kh, kw)) for every conv+bn leaf."""
    def walk(prefix, spec):
        if isinstance(spec, tuple):
            yield prefix, spec
            return
        for k, v in spec.items():
            yield from walk(f"{prefix}.{k}" if prefix else k, v)

    yield from walk("", SPEC)
