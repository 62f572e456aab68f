"""Normalization primitives with the reference's exact mixed-precision rules."""
from __future__ import annotations

import jax.numpy as jnp
import jax


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """RMSNorm: fp32 normalize, cast back, then scale (ref: gpt_t2i.py:187-198).

    The cast-back *before* multiplying by the weight matters for bit parity.
    """
    xf = x.astype(jnp.float32)
    normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return normed.astype(x.dtype) * weight


def group_norm(
    x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
    num_groups: int = 32, eps: float = 1e-6,
) -> jnp.ndarray:
    """GroupNorm over NHWC input (ref VQGAN Normalize: vq_model.py:360-365).

    x: (B, H, W, C). Statistics are computed per (group) over (H, W, C/groups)
    in fp32 for stability on bf16 activations.
    """
    b, h, w, c = x.shape
    num_groups = min(num_groups, c)  # tiny test configs; real models use c>=128
    xf = x.astype(jnp.float32).reshape(b, h, w, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 4), keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn.reshape(b, h, w, c).astype(x.dtype)
    return xn * scale + bias


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm2d without affine params, NHWC (ref lineart.py:8 norm_layer).

    torch InstanceNorm2d defaults: affine=False, eps=1e-5, per-(B,C) stats
    over spatial dims, biased variance.
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.var(xf, axis=(1, 2), keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
