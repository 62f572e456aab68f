"""GAN discriminators for VQ tokenizer training.

PatchGAN (ref tokenizer/tokenizer_image/discriminator_patchgan.py:8-69):
4x4 convs, stride-2 pyramid, train-mode BatchNorm (batch statistics — the
reference trains with torch BN in training mode, which also uses batch
stats; running-average eval stats are not needed for training parity).
"""
from __future__ import annotations

from typing import Any, Dict

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


# ---------------------------------------------------------------------------
# StyleGAN-style discriminator (ref discriminator_stylegan.py:13-100)
# ---------------------------------------------------------------------------

_SG_CHANNELS = {4: 512, 8: 512, 16: 512, 32: 512, 64: 256, 128: 128,
                256: 64, 512: 32, 1024: 16}


def _blur(x: jnp.ndarray) -> jnp.ndarray:
    """Normalized [1,2,1] (x) [1,2,1] depthwise blur with reflect border
    (kornia filter2d defaults, ref Blur: discriminator_stylegan.py:84-93)."""
    f = np.outer([1, 2, 1], [1, 2, 1]).astype(np.float32)
    f /= f.sum()
    c = x.shape[-1]
    k = jnp.asarray(f)[:, :, None, None]
    k = jnp.tile(k, (1, 1, 1, c))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        xp, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def stylegan_disc_forward(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, H, W, 3) in [-1,1] -> logits (B, 1)."""
    h = jax.nn.leaky_relu(conv2d(x, p["conv_in"]["w"], p["conv_in"]["b"]), 0.2)
    inv_sqrt2 = 1.0 / np.sqrt(2.0)
    for blk in p["blocks"]:
        res = conv2d(h, blk["conv_res"]["w"], blk["conv_res"]["b"], stride=2,
                     padding="VALID")
        y = jax.nn.leaky_relu(conv2d(h, blk["conv1"]["w"], blk["conv1"]["b"]), 0.2)
        y = jax.nn.leaky_relu(conv2d(y, blk["conv2"]["w"], blk["conv2"]["b"]), 0.2)
        y = _blur(y)
        y = conv2d(y, blk["down"]["w"], blk["down"]["b"], stride=2,
                   padding=((1, 1), (1, 1)))
        h = (y + res) * inv_sqrt2
    h = jax.nn.leaky_relu(conv2d(h, p["final_conv"]["w"], p["final_conv"]["b"]), 0.2)
    h = h.reshape(h.shape[0], -1)
    h = jax.nn.leaky_relu(h @ p["fc1"]["w"] + p["fc1"]["b"], 0.2)
    return h @ p["fc2"]["w"] + p["fc2"]["b"]


def init_stylegan_disc_params(rng: jax.Array, input_nc: int = 3,
                              image_size: int = 256) -> Params:
    import math

    keys = iter(jax.random.split(rng, 64))

    def conv(cin, cout, k):
        fan = k * k * cin
        bound = 1.0 / np.sqrt(fan)
        return {
            "w": jax.random.uniform(next(keys), (k, k, cin, cout),
                                    minval=-bound, maxval=bound),
            "b": jnp.zeros((cout,)),
        }

    log_size = int(math.log2(image_size))
    cin = _SG_CHANNELS[image_size]
    p = {"conv_in": conv(input_nc, cin, 3), "blocks": []}
    for i in range(log_size, 2, -1):
        cout = _SG_CHANNELS[2 ** (i - 1)]
        p["blocks"].append({
            "conv_res": conv(cin, cout, 1),
            "conv1": conv(cin, cout, 3),
            "conv2": conv(cout, cout, 3),
            "down": conv(cout, cout, 3),
        })
        cin = cout
    p["final_conv"] = conv(cin, 512, 3)
    fdim = 512 * 4 * 4
    p["fc1"] = {
        "w": jax.random.normal(next(keys), (fdim, 512)) * (1.0 / np.sqrt(fdim)),
        "b": jnp.zeros((512,)),
    }
    p["fc2"] = {
        "w": jax.random.normal(next(keys), (512, 1)) * (1.0 / np.sqrt(512)),
        "b": jnp.zeros((1,)),
    }
    return p


def convert_stylegan_disc_state_dict(sd) -> Params:
    """torch Discriminator (discriminator_stylegan.py) -> pytree."""
    def _np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    sd = {k: _np(v) for k, v in sd.items()}

    def conv(prefix):
        w = sd[f"{prefix}.weight"]
        return {"w": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0))),
                "b": sd[f"{prefix}.bias"]}

    # blocks.1 is a parameter-free LeakyReLU; DiscriminatorBlocks start at 2
    max_idx = max(int(k.split(".")[1]) for k in sd if k.startswith("blocks."))
    blocks = []
    for i in range(2, max_idx + 1):
        blocks.append({
            "conv_res": conv(f"blocks.{i}.conv_res"),
            "conv1": conv(f"blocks.{i}.net.0"),
            "conv2": conv(f"blocks.{i}.net.2"),
            "down": conv(f"blocks.{i}.downsample.1"),
        })
    # final_linear.0 consumes a torch NCHW flatten (c, h, w); our forward
    # flattens NHWC — permute the weight's input axis accordingly
    fc1_w = sd["final_linear.0.weight"]  # (512, C*4*4)
    c = fc1_w.shape[1] // 16
    fc1_w = fc1_w.reshape(-1, c, 4, 4).transpose(2, 3, 1, 0).reshape(16 * c, -1)
    return {
        "conv_in": conv("blocks.0"),
        "blocks": blocks,
        "final_conv": conv("final_conv.0"),
        "fc1": {"w": np.ascontiguousarray(fc1_w),
                "b": sd["final_linear.0.bias"]},
        "fc2": {"w": np.ascontiguousarray(sd["final_linear.2.weight"].T),
                "b": sd["final_linear.2.bias"]},
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
