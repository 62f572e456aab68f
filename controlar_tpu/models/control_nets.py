"""HED and Lineart condition-map networks — TPU-native JAX.

- HED (ref condition/hed.py:36-81, ControlNetHED_Apache2): 5 VGG-ish double
  conv blocks (64->512 ch) with maxpool downsampling, per-block 1x1 side
  projections, bilinear-upsampled to input size, sigmoid of the mean.
  Input: (B, H, W, 3) raw 0..255 RGB floats. Output: (B, H, W) in 0..255.
- Lineart (ref condition/lineart.py:26-86): pix2pix-style generator —
  7x7 conv -> 2 stride-2 downs -> 3 residual blocks (InstanceNorm) ->
  2 transposed convs -> 7x7 conv + sigmoid.
  Input: (B, H, W, 3) raw 0..255 RGB floats. Output: (B, H, W) in 0..1.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from controlar_tpu.ops.conv import (
    conv2d,
    conv_transpose2d,
    max_pool2d,
    reflect_pad2d,
)
from controlar_tpu.ops.norms import instance_norm
from controlar_tpu.ops.resize import resize2d

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# HED
# ---------------------------------------------------------------------------

def _double_block(p: Params, x: jnp.ndarray, down: bool):
    if down:
        x = max_pool2d(x, 2, 2)
    for conv in p["convs"]:
        x = jax.nn.relu(conv2d(x, conv["w"], conv["b"]))
    proj = conv2d(x, p["projection"]["w"], p["projection"]["b"])
    return x, proj


def hed_forward(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, H, W, 3) raw RGB floats -> (B, H, W) edge map in 0..255."""
    b, h, w, _ = x.shape
    y = x - p["norm"]  # learned per-channel shift (ref hed.py:39,47)
    projections = []
    for i, blk in enumerate(p["blocks"]):
        y, proj = _double_block(blk, y, down=(i > 0))
        projections.append(proj)
    ups = [
        resize2d(e, h, w, mode="bilinear", align_corners=False)[..., 0]
        for e in projections
    ]
    edge = jax.nn.sigmoid(jnp.mean(jnp.stack(ups, axis=1), axis=1))
    return jnp.clip(edge * 255.0, 0, 255)


# ---------------------------------------------------------------------------
# Lineart
# ---------------------------------------------------------------------------

def _conv_in_relu(p, x, norm=True):
    x = conv2d(x, p["w"], p["b"], padding="VALID")
    if norm:
        x = instance_norm(x)
    return jax.nn.relu(x)


def lineart_forward(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, H, W, 3) raw RGB floats -> (B, H, W) line map in 0..1."""
    # model0: reflection-pad 3 + 7x7 conv + IN + relu
    y = reflect_pad2d(x, 3)
    y = _conv_in_relu(p["model0"], y)
    # model1: two stride-2 3x3 convs (torch padding=1: symmetric, unlike XLA
    # SAME at stride 2) + IN + relu
    for blk in p["model1"]:
        y = conv2d(y, blk["w"], blk["b"], stride=2, padding=((1, 1), (1, 1)))
        y = jax.nn.relu(instance_norm(y))
    # model2: residual blocks
    for blk in p["model2"]:
        r = reflect_pad2d(y, 1)
        r = conv2d(r, blk["conv1"]["w"], blk["conv1"]["b"], padding="VALID")
        r = jax.nn.relu(instance_norm(r))
        r = reflect_pad2d(r, 1)
        r = conv2d(r, blk["conv2"]["w"], blk["conv2"]["b"], padding="VALID")
        y = y + instance_norm(r)
    # model3: two transposed convs + IN + relu
    for blk in p["model3"]:
        y = conv_transpose2d(y, blk["w"], blk["b"], stride=2, padding=1, output_padding=1)
        y = jax.nn.relu(instance_norm(y))
    # model4: reflection-pad 3 + 7x7 conv + sigmoid
    y = reflect_pad2d(y, 3)
    y = conv2d(y, p["model4"]["w"], p["model4"]["b"], padding="VALID")
    return jax.nn.sigmoid(y)[..., 0]


# ---------------------------------------------------------------------------
# HED edge NMS (scribble-style thinning)
# ---------------------------------------------------------------------------

def hed_nms(x: jnp.ndarray, t: float, s: float) -> jnp.ndarray:
    """Directional NMS over an edge map (ref condition/hed.py:84-99 `nms`).

    Gaussian blur (sigma=s, OpenCV's derived odd kernel size for float
    inputs), then keep pixels that equal the 3-pixel dilation along any of
    the 4 line directions (H, V, two diagonals), then threshold: > t -> 255.

    x: (H, W) or (B, H, W) float edge map. Returns uint8 {0, 255} of the
    same shape. Jittable; t and s are static Python floats.
    """
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    x = x.astype(jnp.float32)

    # cv2.GaussianBlur((0,0), sigma) on CV_32F: ksize = round(sigma*4*2+1)|1
    k = int(round(s * 8 + 1)) | 1
    half = k // 2
    i = np.arange(k) - half
    g = np.exp(-(i.astype(np.float64) ** 2) / (2.0 * s * s))
    g = (g / g.sum()).astype(np.float32)
    # separable blur with REFLECT_101 borders (np/jnp "reflect")
    xp = jnp.pad(x, ((0, 0), (half, half), (0, 0)), mode="reflect")
    x_blur = sum(g[j] * xp[:, j : j + x.shape[1], :] for j in range(k))
    xp = jnp.pad(x_blur, ((0, 0), (0, 0), (half, half)), mode="reflect")
    x_blur = sum(g[j] * xp[:, :, j : j + x.shape[2]] for j in range(k))

    # 4 directional 3-element dilations (borders act as -inf, the dilate
    # BORDER_CONSTANT morphology default)
    p = jnp.pad(x_blur, ((0, 0), (1, 1), (1, 1)), constant_values=-jnp.inf)
    c = p[:, 1:-1, 1:-1]
    horiz = jnp.maximum(jnp.maximum(p[:, 1:-1, :-2], c), p[:, 1:-1, 2:])
    vert = jnp.maximum(jnp.maximum(p[:, :-2, 1:-1], c), p[:, 2:, 1:-1])
    diag1 = jnp.maximum(jnp.maximum(p[:, :-2, :-2], c), p[:, 2:, 2:])
    diag2 = jnp.maximum(jnp.maximum(p[:, :-2, 2:], c), p[:, 2:, :-2])
    is_max = (
        (c >= horiz) | (c >= vert) | (c >= diag1) | (c >= diag2)
    )
    y = jnp.where(is_max, x_blur, 0.0)
    z = jnp.where(y > t, jnp.uint8(255), jnp.uint8(0))
    return z[0] if squeeze else z
