"""Convolution helpers, NHWC / HWIO (TPU-native layouts)."""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride: int | Tuple[int, int] = 1,
    padding="SAME",
) -> jnp.ndarray:
    """x: (B,H,W,C_in), w: (KH,KW,C_in,C_out). padding: 'SAME'|'VALID'|explicit."""
    if isinstance(stride, int):
        stride = (stride, stride)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        y = y + b
    return y


def conv_transpose2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride: int = 2,
    padding: int = 1,
    output_padding: int = 1,
) -> jnp.ndarray:
    """torch-semantics ConvTranspose2d (ref lineart.py:59).

    x: (B,H,W,C_in); w: (KH,KW,C_in,C_out) — already flipped/transposed from
    torch's (C_in,C_out,KH,KW) by the converter. Output spatial size:
    (H-1)*stride - 2*padding + KH + output_padding.
    """
    kh, kw = w.shape[0], w.shape[1]
    pad_h = (kh - 1 - padding, kh - 1 - padding + output_padding)
    pad_w = (kw - 1 - padding, kw - 1 - padding + output_padding)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=(pad_h, pad_w),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        y = y + b
    return y


def max_pool2d(x: jnp.ndarray, window: int = 2, stride: int = 2) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, window, window, 1), (1, stride, stride, 1), "VALID",
    )


def upsample_nearest2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample, NHWC (ref Upsample: vq_model.py:368-379)."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def reflect_pad2d(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
