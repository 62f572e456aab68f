"""GAN discriminators for VQ tokenizer training.

PatchGAN (ref tokenizer/tokenizer_image/discriminator_patchgan.py:8-69):
4x4 convs, stride-2 pyramid, train-mode BatchNorm (batch statistics — the
reference trains with torch BN in training mode, which also uses batch
stats; running-average eval stats are not needed for training parity).
"""
from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from controlar_tpu.ops.conv import conv2d

Params = Dict[str, Any]


def _batch_norm_train(x: jnp.ndarray, scale, bias, eps: float = 1e-5):
    mean = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
    var = jnp.var(x, axis=(0, 1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def patchgan_forward(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x: (B,H,W,3) in [-1,1] -> logits map (B,h,w,1)."""
    h = conv2d(x, p["conv_in"]["w"], p["conv_in"]["b"], stride=2,
               padding=((1, 1), (1, 1)))
    h = jax.nn.leaky_relu(h, 0.2)
    nb = len(p["blocks"])
    for i, blk in enumerate(p["blocks"]):
        stride = 2 if i < nb - 1 else 1  # last pyramid conv is stride 1
        h = conv2d(h, blk["conv"]["w"], None, stride=stride,
                   padding=((1, 1), (1, 1)))
        h = _batch_norm_train(h, blk["bn"]["scale"], blk["bn"]["bias"])
        h = jax.nn.leaky_relu(h, 0.2)
    return conv2d(h, p["conv_out"]["w"], p["conv_out"]["b"],
                  padding=((1, 1), (1, 1)))


def init_patchgan_params(rng: jax.Array, input_nc: int = 3, ndf: int = 64,
                         n_layers: int = 3) -> Params:
    """Reference init: conv normal(0, 0.02), BN scale normal(1, 0.02)."""
    keys = iter(jax.random.split(rng, 16))

    def conv(cin, cout, k=4, bias=True):
        out = {"w": jax.random.normal(next(keys), (k, k, cin, cout)) * 0.02}
        if bias:
            out["b"] = jnp.zeros((cout,))
        return out

    blocks = []
    nf_prev, nf = 1, 1
    for n in range(1, n_layers):
        nf_prev, nf = nf, min(2 ** n, 8)
        blocks.append({
            "conv": conv(ndf * nf_prev, ndf * nf, bias=False),
            "bn": {
                "scale": 1.0 + jax.random.normal(next(keys), (ndf * nf,)) * 0.02,
                "bias": jnp.zeros((ndf * nf,)),
            },
        })
    nf_prev, nf = nf, min(2 ** n_layers, 8)
    blocks.append({
        "conv": conv(ndf * nf_prev, ndf * nf, bias=False),
        "bn": {
            "scale": 1.0 + jax.random.normal(next(keys), (ndf * nf,)) * 0.02,
            "bias": jnp.zeros((ndf * nf,)),
        },
    })
    return {
        "conv_in": conv(input_nc, ndf),
        "blocks": blocks,
        "conv_out": conv(ndf * nf, 1),
    }


def convert_patchgan_state_dict(sd, n_layers: int = 3) -> Params:
    """torch NLayerDiscriminator.main Sequential -> pytree."""
    def _np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    sd = {k: _np(v) for k, v in sd.items()}

    def conv(i, bias=True):
        w = sd[f"main.{i}.weight"]
        out = {"w": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))}
        if bias:
            out["b"] = sd[f"main.{i}.bias"]
        return out

    # layout: 0 conv, 1 lrelu, then per block: conv, bn, lrelu
    blocks = []
    idx = 2
    for n in range(1, n_layers + 1):
        blocks.append({
            "conv": conv(idx, bias=False),
            "bn": {"scale": sd[f"main.{idx+1}.weight"], "bias": sd[f"main.{idx+1}.bias"]},
        })
        idx += 3
    return {
        "conv_in": conv(0),
        "blocks": blocks,
        "conv_out": conv(idx),
    }
