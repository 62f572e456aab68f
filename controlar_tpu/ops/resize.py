"""Image resizing with exact torch.nn.functional.interpolate semantics.

The reference's control stack is sensitive to the interpolation flavor
(ref dinov2_adapter.py:16-24: 'nearest' for canny/seg, bicubic
align_corners=True for depth/hed/lineart; HED upsamples bilinear
align_corners=False, hed.py:76). These are implemented as separable
matrix resizes: out = R_h @ x @ R_w^T with precomputed (static-shape) weight
matrices — exact, differentiable, and MXU-friendly on TPU (two matmuls
instead of gathers).
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp


def _cubic_weight(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel (torch uses A=-0.75)."""
    t = np.abs(t)
    w = np.where(
        t <= 1,
        (a + 2) * t ** 3 - (a + 3) * t ** 2 + 1,
        np.where(t < 2, a * t ** 3 - 5 * a * t ** 2 + 8 * a * t - 4 * a, 0.0),
    )
    return w


@lru_cache(maxsize=256)
def _resize_matrix(n_in: int, n_out: int, mode: str, align_corners: bool) -> np.ndarray:
    """(n_out, n_in) row-stochastic interpolation matrix."""
    m = np.zeros((n_out, n_in), dtype=np.float64)
    if mode == "nearest":
        # torch 'nearest': src = floor(i * n_in / n_out)
        idx = np.minimum((np.arange(n_out) * n_in) // n_out, n_in - 1)
        m[np.arange(n_out), idx] = 1.0
        return m.astype(np.float32)

    if align_corners:
        if n_out == 1:
            src = np.zeros(n_out)
        else:
            src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    else:
        src = (np.arange(n_out) + 0.5) * n_in / n_out - 0.5

    if mode == "bilinear":
        lo = np.floor(src).astype(int)
        frac = src - lo
        for i in range(n_out):
            l = min(max(lo[i], 0), n_in - 1)
            r = min(max(lo[i] + 1, 0), n_in - 1)
            m[i, l] += 1 - frac[i]
            m[i, r] += frac[i]
    elif mode == "bicubic":
        lo = np.floor(src).astype(int)
        frac = src - lo
        for i in range(n_out):
            for k in range(-1, 3):
                tap = min(max(lo[i] + k, 0), n_in - 1)
                m[i, tap] += _cubic_weight(np.array(k - frac[i]))
    else:
        raise ValueError(mode)
    return m.astype(np.float32)


def resize2d(
    x: jnp.ndarray,
    out_h: int,
    out_w: int,
    mode: str = "bilinear",
    align_corners: bool = False,
) -> jnp.ndarray:
    """Resize NHWC (or HWC) images with torch interpolate semantics."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    b, h, w, c = x.shape
    rh = jnp.asarray(_resize_matrix(h, out_h, mode, align_corners))
    rw = jnp.asarray(_resize_matrix(w, out_w, mode, align_corners))
    y = jnp.einsum("oh,bhwc->bowc", rh, x.astype(jnp.float32))
    y = jnp.einsum("pw,bowc->bopc", rw, y)
    y = y.astype(x.dtype)
    return y[0] if squeeze else y


def to_patch14(x: jnp.ndarray, condition_type: str) -> jnp.ndarray:
    """Reference adapter resize: map a /16-grid image onto a /14 grid so the
    DINOv2 token count equals the VQ token count (ref dinov2_adapter.py:16-24).

    x: (B, H, W, C) with H, W multiples of 16.
    """
    b, h, w, c = x.shape
    new_h, new_w = (h // 16) * 14, (w // 16) * 14
    if condition_type in ("canny", "seg"):
        return resize2d(x, new_h, new_w, mode="nearest")
    return resize2d(x, new_h, new_w, mode="bicubic", align_corners=True)
