"""Taming-Transformers VQGAN — the reference's comparison tokenizer family
(ref tokenizer/vqgan/{model,layer,quantize}.py: VQModel over taming
Encoder/Decoder + VectorQuantizer2 with optional index remapping).

Four released configs (ref model.py VQGAN_FROM_TAMING): f16-1024, f16-16384,
openimages f8-256 (remapped from a 16384 codebook) and f8-16384. Differences
from the in-house VQ (models/vq.py / LlamaGen lineage):
- attention blocks placed by RESOLUTION (attn_resolutions) in both encoder
  and decoder, not only at the bottleneck,
- decoder levels run num_res_blocks + 1 resnet blocks (layer.py:315),
- the quantizer uses raw (un-normalized) L2 distances and supports remapping
  the full codebook onto a "used" subset (quantize.py:144-166),
- double_z=False, beta=0.25, legacy loss ordering (quantize.py:187-193).

Blocks (ResnetBlock / AttnBlock / Up/Downsample / GroupNorm-swish) are shared
with models/vq.py — LlamaGen inherited them from taming unchanged.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from controlar_tpu.models.vq import (
    attn_block,
    downsample,
    resnet_block,
    swish,
    upsample,
)
from controlar_tpu.ops.conv import conv2d
from controlar_tpu.ops.norms import group_norm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class TamingVQConfig:
    ch: int = 128
    out_ch: int = 3
    in_channels: int = 3
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    resolution: int = 256
    z_channels: int = 256
    n_embed: int = 1024
    embed_dim: int = 256
    beta: float = 0.25
    legacy: bool = True
    # remap: indices of the "used" codebook rows (ref quantize.py:129-140);
    # unknown_index: 'random' | 'extra' | int — 'extra' appends one id
    remap: Optional[Tuple[int, ...]] = None
    unknown_index: Any = "random"

    @property
    def num_resolutions(self) -> int:
        return len(self.ch_mult)

    @property
    def re_embed(self) -> int:
        if self.remap is None:
            return self.n_embed
        n = len(self.remap)
        return n + 1 if self.unknown_index == "extra" else n


# registry of the reference's released comparison configs (model.py:10-22 +
# the yaml configs they point to)
TAMING_CONFIGS = {
    "vqgan_imagenet_f16_1024": TamingVQConfig(n_embed=1024, embed_dim=256),
    "vqgan_imagenet_f16_16384": TamingVQConfig(n_embed=16384, embed_dim=256),
    "vqgan_openimage_f8_256": TamingVQConfig(
        ch_mult=(1, 2, 2, 4), attn_resolutions=(32,), z_channels=4,
        n_embed=16384, embed_dim=4,
    ),  # released with a 256-entry remap table supplied at load time
    "vqgan_openimage_f8_16384": TamingVQConfig(
        ch_mult=(1, 2, 2, 4), attn_resolutions=(32,), z_channels=4,
        n_embed=16384, embed_dim=4,
    ),
}


def _attn_gates(cfg: TamingVQConfig, decoder: bool):
    """Which levels carry attention (resolution bookkeeping of layer.py)."""
    gates = []
    if not decoder:
        curr = cfg.resolution
        for i in range(cfg.num_resolutions):
            gates.append(curr in cfg.attn_resolutions)
            if i != cfg.num_resolutions - 1:
                curr //= 2
    else:
        curr = cfg.resolution // 2 ** (cfg.num_resolutions - 1)
        rev = []
        for i_level in reversed(range(cfg.num_resolutions)):
            rev.append(curr in cfg.attn_resolutions)
            if i_level != 0:
                curr *= 2
        gates = rev[::-1]  # up[] is stored high-res-first (layer.py:329)
    return gates


def encoder_forward(p: Params, cfg: TamingVQConfig, x: jnp.ndarray) -> jnp.ndarray:
    """x (B,H,W,3) in [-1,1] -> (B,h,w,z_channels) (layer.py Encoder)."""
    gates = _attn_gates(cfg, decoder=False)
    h = conv2d(x, p["conv_in"]["w"], p["conv_in"]["b"])
    for i, level in enumerate(p["down"]):
        for j, rb in enumerate(level["block"]):
            h = resnet_block(rb, h)
            if gates[i]:
                h = attn_block(level["attn"][j], h)
        if "downsample" in level:
            h = downsample(level["downsample"], h)
    h = resnet_block(p["mid"]["block_1"], h)
    h = attn_block(p["mid"]["attn_1"], h)
    h = resnet_block(p["mid"]["block_2"], h)
    h = group_norm(h, p["norm_out"]["scale"], p["norm_out"]["bias"])
    h = swish(h)
    return conv2d(h, p["conv_out"]["w"], p["conv_out"]["b"])


def decoder_forward(p: Params, cfg: TamingVQConfig, z: jnp.ndarray) -> jnp.ndarray:
    gates = _attn_gates(cfg, decoder=True)
    h = conv2d(z, p["conv_in"]["w"], p["conv_in"]["b"])
    h = resnet_block(p["mid"]["block_1"], h)
    h = attn_block(p["mid"]["attn_1"], h)
    h = resnet_block(p["mid"]["block_2"], h)
    for i_level in reversed(range(cfg.num_resolutions)):
        level = p["up"][i_level]
        for j, rb in enumerate(level["block"]):
            h = resnet_block(rb, h)
            if gates[i_level]:
                h = attn_block(level["attn"][j], h)
        if "upsample" in level:
            h = upsample(level["upsample"], h)
    h = group_norm(h, p["norm_out"]["scale"], p["norm_out"]["bias"])
    h = swish(h)
    return conv2d(h, p["conv_out"]["w"], p["conv_out"]["b"])


# ---------------------------------------------------------------------------
# VectorQuantizer2 (quantize.py:110-229)
# ---------------------------------------------------------------------------

def quantize(p: Params, cfg: TamingVQConfig, z: jnp.ndarray,
             rng: Optional[jax.Array] = None):
    """z (B,h,w,embed_dim) -> (z_q_ste, loss, indices (B,h,w) in remapped ids).

    Distances on RAW vectors (no l2 norm); remap maps full-codebook argmins
    onto the used subset, unknown ids going to `unknown_index`."""
    emb = p["embedding"]
    b, h, w, d = z.shape
    flat = z.reshape(-1, d)
    dist = (
        jnp.sum(flat * flat, axis=1, keepdims=True)
        + jnp.sum(emb * emb, axis=1)
        - 2.0 * jnp.einsum("bd,nd->bn", flat, emb,
                           preferred_element_type=jnp.float32)
    )
    idx = jnp.argmin(dist, axis=1)
    z_q = emb[idx].reshape(z.shape)
    if cfg.legacy:
        loss = jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2) + \
            cfg.beta * jnp.mean((z_q - jax.lax.stop_gradient(z)) ** 2)
    else:
        loss = cfg.beta * jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2) + \
            jnp.mean((z_q - jax.lax.stop_gradient(z)) ** 2)
    z_q = z + jax.lax.stop_gradient(z_q - z)

    if cfg.remap is not None:
        used = jnp.asarray(np.asarray(cfg.remap, np.int64))
        match = idx[:, None] == used[None, :]
        new = jnp.argmax(match, axis=1)
        unknown = ~jnp.any(match, axis=1)
        if cfg.unknown_index == "random":
            if rng is None:
                rng = jax.random.PRNGKey(0)
            rand = jax.random.randint(rng, new.shape, 0, cfg.re_embed)
            new = jnp.where(unknown, rand, new)
        elif cfg.unknown_index == "extra":
            new = jnp.where(unknown, cfg.re_embed - 1, new)
        else:
            new = jnp.where(unknown, int(cfg.unknown_index), new)
        idx = new
    return z_q, loss, idx.reshape(b, h, w)


def codebook_entry(p: Params, cfg: TamingVQConfig, indices: jnp.ndarray,
                   shape_hw: Tuple[int, int]) -> jnp.ndarray:
    """Remapped indices (B, h*w) -> z_q (B,h,w,embed_dim)
    (quantize.py:211-229 get_codebook_entry + unmap_to_all)."""
    b = indices.shape[0]
    idx = indices.reshape(b, -1)
    if cfg.remap is not None:
        used = jnp.asarray(np.asarray(cfg.remap, np.int64))
        n_used = used.shape[0]
        idx = jnp.where(idx >= n_used, 0, idx)  # extra token -> 0
        idx = used[idx]
    h, w = shape_hw
    return p["embedding"][idx.reshape(-1)].reshape(b, h, w, -1)


# ---------------------------------------------------------------------------
# Top level (model.py VQModel)
# ---------------------------------------------------------------------------

def encode(p: Params, cfg: TamingVQConfig, x: jnp.ndarray,
           rng: Optional[jax.Array] = None):
    h = encoder_forward(p["encoder"], cfg, x)
    h = conv2d(h, p["quant_conv"]["w"], p["quant_conv"]["b"])
    return quantize(p, cfg, h, rng)


def decode(p: Params, cfg: TamingVQConfig, z_q: jnp.ndarray) -> jnp.ndarray:
    h = conv2d(z_q, p["post_quant_conv"]["w"], p["post_quant_conv"]["b"])
    return decoder_forward(p["decoder"], cfg, h)


def decode_code(p: Params, cfg: TamingVQConfig, indices: jnp.ndarray,
                shape_hw: Tuple[int, int]) -> jnp.ndarray:
    return decode(p, cfg, codebook_entry(p, cfg, indices, shape_hw))


def reconstruct(p: Params, cfg: TamingVQConfig, x: jnp.ndarray) -> jnp.ndarray:
    z_q, _, _ = encode(p, cfg, x)
    return decode(p, cfg, z_q)


# ---------------------------------------------------------------------------
# Init (tests / training from scratch)
# ---------------------------------------------------------------------------

def init_taming_params(rng: jax.Array, cfg: TamingVQConfig,
                       dtype=jnp.float32) -> Params:
    key = [rng]

    def nk():
        key[0], k = jax.random.split(key[0])
        return k

    def conv(kh, kw, cin, cout, std=0.05):
        return {"w": (jax.random.normal(nk(), (kh, kw, cin, cout)) * std).astype(dtype),
                "b": jnp.zeros((cout,), dtype)}

    def gn(c):
        return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

    def res(cin, cout):
        p = {"norm1": gn(cin), "conv1": conv(3, 3, cin, cout),
             "norm2": gn(cout), "conv2": conv(3, 3, cout, cout)}
        if cin != cout:
            p["nin_shortcut"] = conv(1, 1, cin, cout)
        return p

    def attn(c):
        return {"norm": gn(c), "q": conv(1, 1, c, c), "k": conv(1, 1, c, c),
                "v": conv(1, 1, c, c), "proj_out": conv(1, 1, c, c)}

    enc_gates = _attn_gates(cfg, decoder=False)
    dec_gates = _attn_gates(cfg, decoder=True)
    in_mult = (1,) + tuple(cfg.ch_mult)

    down = []
    for i in range(cfg.num_resolutions):
        cin, cout = cfg.ch * in_mult[i], cfg.ch * cfg.ch_mult[i]
        level: Params = {"block": [], "attn": []}
        c = cin
        for _ in range(cfg.num_res_blocks):
            level["block"].append(res(c, cout))
            c = cout
            if enc_gates[i]:
                level["attn"].append(attn(c))
        if i != cfg.num_resolutions - 1:
            level["downsample"] = {"conv": conv(3, 3, c, c)}
        down.append(level)
    block_in = cfg.ch * cfg.ch_mult[-1]
    encoder = {
        "conv_in": conv(3, 3, cfg.in_channels, cfg.ch),
        "down": down,
        "mid": {"block_1": res(block_in, block_in), "attn_1": attn(block_in),
                "block_2": res(block_in, block_in)},
        "norm_out": gn(block_in),
        "conv_out": conv(3, 3, block_in, cfg.z_channels),
    }

    up = [None] * cfg.num_resolutions
    c = block_in
    for i_level in reversed(range(cfg.num_resolutions)):
        cout = cfg.ch * cfg.ch_mult[i_level]
        level = {"block": [], "attn": []}
        for _ in range(cfg.num_res_blocks + 1):
            level["block"].append(res(c, cout))
            c = cout
            if dec_gates[i_level]:
                level["attn"].append(attn(c))
        if i_level != 0:
            level["upsample"] = {"conv": conv(3, 3, c, c)}
        up[i_level] = level
    decoder = {
        "conv_in": conv(3, 3, cfg.z_channels, block_in),
        "mid": {"block_1": res(block_in, block_in), "attn_1": attn(block_in),
                "block_2": res(block_in, block_in)},
        "up": up,
        "norm_out": gn(cfg.ch * cfg.ch_mult[0]),
        "conv_out": conv(3, 3, cfg.ch * cfg.ch_mult[0], cfg.out_ch),
    }

    return {
        "encoder": encoder,
        "decoder": decoder,
        "quant_conv": conv(1, 1, cfg.z_channels, cfg.embed_dim),
        "post_quant_conv": conv(1, 1, cfg.embed_dim, cfg.z_channels),
        "embedding": (
            jax.random.uniform(nk(), (cfg.n_embed, cfg.embed_dim),
                               minval=-1.0 / cfg.n_embed, maxval=1.0 / cfg.n_embed)
        ).astype(dtype),
    }
