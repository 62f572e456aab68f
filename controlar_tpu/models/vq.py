"""VQGAN image tokenizer (LlamaGen VQ-16/VQ-8) — TPU-native JAX.

Behavioral contract from the reference (ref: tokenizer/tokenizer_image/
vq_model.py): conv encoder/decoder with mid/self-attention blocks, 16384x8
codebook with L2-normalized codes, straight-through estimator. Layout is NHWC
(TPU-native); images in [-1, 1].

encode(x) -> (z_q, indices); decode_code(indices) -> image. The training
losses (vq/commit/entropy + GAN/LPIPS, ref vq_loss.py) live in
controlar_tpu/train/vq_loss.py.
"""
from __future__ import annotations

from typing import Dict, Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from controlar_tpu.config import VQConfig
from controlar_tpu.ops.conv import conv2d, upsample_nearest2x
from controlar_tpu.ops.norms import group_norm

Params = Dict[str, Any]


def swish(x):
    return x * jax.nn.sigmoid(x)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def resnet_block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """(ref ResnetBlock: vq_model.py:280-315)."""
    h = group_norm(x, p["norm1"]["scale"], p["norm1"]["bias"])
    h = swish(h)
    h = conv2d(h, p["conv1"]["w"], p["conv1"]["b"])
    h = group_norm(h, p["norm2"]["scale"], p["norm2"]["bias"])
    h = swish(h)
    h = conv2d(h, p["conv2"]["w"], p["conv2"]["b"])
    if "nin_shortcut" in p:
        x = conv2d(x, p["nin_shortcut"]["w"], p["nin_shortcut"]["b"])
    return x + h


def attn_block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Single-head spatial self-attention (ref AttnBlock: vq_model.py:318-352)."""
    b, h, w, c = x.shape
    hn = group_norm(x, p["norm"]["scale"], p["norm"]["bias"])
    q = conv2d(hn, p["q"]["w"], p["q"]["b"]).reshape(b, h * w, c)
    k = conv2d(hn, p["k"]["w"], p["k"]["b"]).reshape(b, h * w, c)
    v = conv2d(hn, p["v"]["w"], p["v"]["b"]).reshape(b, h * w, c)
    scores = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * (c ** -0.5)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    o = jnp.einsum("bqk,bkc->bqc", probs, v, preferred_element_type=jnp.float32)
    o = o.astype(x.dtype).reshape(b, h, w, c)
    o = conv2d(o, p["proj_out"]["w"], p["proj_out"]["b"])
    return x + o


def downsample(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Asymmetric-pad stride-2 conv (ref Downsample: vq_model.py:382-397)."""
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return conv2d(x, p["conv"]["w"], p["conv"]["b"], stride=2, padding="VALID")


def upsample(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    x = upsample_nearest2x(x)
    return conv2d(x, p["conv"]["w"], p["conv"]["b"])


# ---------------------------------------------------------------------------
# Encoder / Decoder
# ---------------------------------------------------------------------------

def encoder_forward(p: Params, cfg: VQConfig, x: jnp.ndarray) -> jnp.ndarray:
    """(ref Encoder.forward: vq_model.py:106-125). x: (B,H,W,3) -> (B,h,w,z)."""
    n_levels = len(cfg.encoder_ch_mult)
    h = conv2d(x, p["conv_in"]["w"], p["conv_in"]["b"])
    for i, level in enumerate(p["levels"]):
        for j, rb in enumerate(level["res"]):
            h = resnet_block(rb, h)
            if level.get("attn"):
                h = attn_block(level["attn"][j], h)
        if i != n_levels - 1:
            h = downsample(level["downsample"], h)
    h = resnet_block(p["mid"][0], h)
    h = attn_block(p["mid"][1], h)
    h = resnet_block(p["mid"][2], h)
    h = group_norm(h, p["norm_out"]["scale"], p["norm_out"]["bias"])
    h = swish(h)
    return conv2d(h, p["conv_out"]["w"], p["conv_out"]["b"])


def decoder_trunk(p: Params, cfg: VQConfig, z: jnp.ndarray) -> jnp.ndarray:
    """Decoder up to (but excluding) the final conv_out — the VQ-GAN adaptive
    discriminator weight needs gradients w.r.t. conv_out's weight alone
    (ref vq_loss.py:109-115 `last_layer=decoder.last_layer`), so the trunk is
    computed once and conv_out re-applied as a function of its weight."""
    n_levels = len(cfg.decoder_ch_mult)
    h = conv2d(z, p["conv_in"]["w"], p["conv_in"]["b"])
    h = resnet_block(p["mid"][0], h)
    h = attn_block(p["mid"][1], h)
    h = resnet_block(p["mid"][2], h)
    for i, level in enumerate(p["levels"]):  # levels stored high-res-last
        for j, rb in enumerate(level["res"]):
            h = resnet_block(rb, h)
            if level.get("attn"):
                h = attn_block(level["attn"][j], h)
        if i != n_levels - 1:
            h = upsample(level["upsample"], h)
    h = group_norm(h, p["norm_out"]["scale"], p["norm_out"]["bias"])
    return swish(h)


def decoder_forward(p: Params, cfg: VQConfig, z: jnp.ndarray) -> jnp.ndarray:
    """(ref Decoder.forward: vq_model.py:174-195). z: (B,h,w,zc) -> (B,H,W,3)."""
    h = decoder_trunk(p, cfg, z)
    return conv2d(h, p["conv_out"]["w"], p["conv_out"]["b"])


# ---------------------------------------------------------------------------
# Quantizer
# ---------------------------------------------------------------------------

def _codebook(p: Params, cfg: VQConfig) -> jnp.ndarray:
    emb = p["codebook"]
    if cfg.codebook_l2_norm:
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    return emb


def quantize(
    p: Params, cfg: VQConfig, z: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest-codebook-entry quantization with straight-through gradients
    (ref VectorQuantizer.forward: vq_model.py:216-260).

    z: (B,h,w,D) continuous latents -> (z_q (B,h,w,D), indices (B,h,w)).
    """
    emb = _codebook(p, cfg)
    if cfg.codebook_l2_norm:
        zn = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
    else:
        zn = z
    # distances: |z|^2 + |e|^2 - 2 z.e  (ref vq_model.py:229-231)
    d = (
        jnp.sum(zn * zn, axis=-1, keepdims=True)
        + jnp.sum(emb * emb, axis=-1)[None, None, None, :]
        - 2.0 * jnp.einsum("bhwd,nd->bhwn", zn, emb, preferred_element_type=jnp.float32)
    )
    indices = jnp.argmin(d, axis=-1)
    z_q = emb[indices]
    # straight-through: grads flow to z (note: through the *normalized* z,
    # matching the reference which computes z_q = z + (z_q - z).detach() on
    # the normalized z when l2_norm is on, vq_model.py:223,255)
    z_q = zn + jax.lax.stop_gradient(z_q - zn)
    return z_q.astype(z.dtype), indices


def codebook_lookup(
    p: Params, cfg: VQConfig, indices: jnp.ndarray
) -> jnp.ndarray:
    """indices (B,h,w) -> z_q (B,h,w,D) (ref get_codebook_entry: vq_model.py:262-277)."""
    return _codebook(p, cfg)[indices]


# ---------------------------------------------------------------------------
# Top level
# ---------------------------------------------------------------------------

def encode(p: Params, cfg: VQConfig, x: jnp.ndarray):
    """x (B,H,W,3) in [-1,1] -> (z_q, indices (B, H/f, W/f))."""
    h = encoder_forward(p["encoder"], cfg, x)
    h = conv2d(h, p["quant_conv"]["w"], p["quant_conv"]["b"])
    return quantize(p, cfg, h)


def decode(p: Params, cfg: VQConfig, z_q: jnp.ndarray) -> jnp.ndarray:
    h = conv2d(z_q, p["post_quant_conv"]["w"], p["post_quant_conv"]["b"])
    return decoder_forward(p["decoder"], cfg, h)


def decode_code(p: Params, cfg: VQConfig, indices: jnp.ndarray) -> jnp.ndarray:
    """indices (B,h,w) int32 -> image (B, h*f, w*f, 3)."""
    return decode(p, cfg, codebook_lookup(p, cfg, indices))


# ---------------------------------------------------------------------------
# Init (for training from scratch / tests)
# ---------------------------------------------------------------------------

def _init_conv(key, kh, kw, cin, cout, dtype):
    fan_in = kh * kw * cin
    bound = 1.0 / np.sqrt(fan_in)
    wkey, bkey = jax.random.split(key)
    return {
        "w": jax.random.uniform(wkey, (kh, kw, cin, cout), dtype, -bound, bound),
        "b": jax.random.uniform(bkey, (cout,), dtype, -bound, bound),
    }


def _init_norm(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _init_res(key, cin, cout, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": _init_norm(cin, dtype),
        "conv1": _init_conv(k1, 3, 3, cin, cout, dtype),
        "norm2": _init_norm(cout, dtype),
        "conv2": _init_conv(k2, 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["nin_shortcut"] = _init_conv(k3, 1, 1, cin, cout, dtype)
    return p


def _init_attn(key, c, dtype):
    ks = jax.random.split(key, 4)
    return {
        "norm": _init_norm(c, dtype),
        "q": _init_conv(ks[0], 1, 1, c, c, dtype),
        "k": _init_conv(ks[1], 1, 1, c, c, dtype),
        "v": _init_conv(ks[2], 1, 1, c, c, dtype),
        "proj_out": _init_conv(ks[3], 1, 1, c, c, dtype),
    }


def init_vq_params(rng: jax.Array, cfg: VQConfig, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(rng, 256))
    ch = cfg.ch

    def enc_params():
        n = len(cfg.encoder_ch_mult)
        in_mult = (1,) + tuple(cfg.encoder_ch_mult)
        levels = []
        block_in = ch
        for i in range(n):
            block_in = ch * in_mult[i]
            block_out = ch * cfg.encoder_ch_mult[i]
            res, attn = [], []
            for _ in range(cfg.num_res_blocks):
                res.append(_init_res(next(keys), block_in, block_out, dtype))
                block_in = block_out
                if i == n - 1:
                    attn.append(_init_attn(next(keys), block_in, dtype))
            level = {"res": res, "attn": attn}
            if i != n - 1:
                level["downsample"] = {"conv": _init_conv(next(keys), 3, 3, block_in, block_in, dtype)}
            levels.append(level)
        return {
            "conv_in": _init_conv(next(keys), 3, 3, 3, ch, dtype),
            "levels": levels,
            "mid": [
                _init_res(next(keys), block_in, block_in, dtype),
                _init_attn(next(keys), block_in, dtype),
                _init_res(next(keys), block_in, block_in, dtype),
            ],
            "norm_out": _init_norm(block_in, dtype),
            "conv_out": _init_conv(next(keys), 3, 3, block_in, cfg.z_channels, dtype),
        }, block_in

    def dec_params():
        n = len(cfg.decoder_ch_mult)
        block_in = ch * cfg.decoder_ch_mult[n - 1]
        conv_in = _init_conv(next(keys), 3, 3, cfg.z_channels, block_in, dtype)
        mid = [
            _init_res(next(keys), block_in, block_in, dtype),
            _init_attn(next(keys), block_in, dtype),
            _init_res(next(keys), block_in, block_in, dtype),
        ]
        levels = []
        for i in reversed(range(n)):
            block_out = ch * cfg.decoder_ch_mult[i]
            res, attn = [], []
            for _ in range(cfg.num_res_blocks + 1):
                res.append(_init_res(next(keys), block_in, block_out, dtype))
                block_in = block_out
                if i == n - 1:
                    attn.append(_init_attn(next(keys), block_in, dtype))
            level = {"res": res, "attn": attn}
            if i != 0:
                level["upsample"] = {"conv": _init_conv(next(keys), 3, 3, block_in, block_in, dtype)}
            levels.append(level)
        return {
            "conv_in": conv_in,
            "mid": mid,
            "levels": levels,
            "norm_out": _init_norm(block_in, dtype),
            "conv_out": _init_conv(next(keys), 3, 3, block_in, 3, dtype),
        }

    enc, _ = enc_params()
    codebook = jax.random.uniform(
        next(keys), (cfg.codebook_size, cfg.codebook_embed_dim), dtype,
        -1.0 / cfg.codebook_size, 1.0 / cfg.codebook_size,
    )
    if cfg.codebook_l2_norm:
        codebook = codebook / jnp.linalg.norm(codebook, axis=-1, keepdims=True)
    return {
        "encoder": enc,
        "quant_conv": _init_conv(next(keys), 1, 1, cfg.z_channels, cfg.codebook_embed_dim, dtype),
        "codebook": codebook,
        "post_quant_conv": _init_conv(next(keys), 1, 1, cfg.codebook_embed_dim, cfg.z_channels, dtype),
        "decoder": dec_params(),
    }
