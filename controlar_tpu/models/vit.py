"""Generic ViT encoder: the control-image encoder ("adapter") backbone.

Covers both reference adapters (ref: autoregressive/models/dinov2_adapter.py —
HF Dinov2Model small/base, patch 14, LayerScale; and vit_adapter.py — HF
ViTModel vit-small, patch 16, interpolate_pos_encoding=True). TPU-native
re-implementation: stacked-layer lax.scan, position-embedding interpolation as
a static-shape bicubic matrix resize, NHWC patchify via conv.

The adapter contract (ref dinov2_adapter.py:26-29 / vit_adapter.py:13-15):
forward(x) -> last_hidden_state without the CLS token.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from controlar_tpu.ops.resize import resize2d

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    hidden_size: int = 384
    n_layer: int = 12
    n_head: int = 6
    mlp_ratio: float = 4.0
    patch_size: int = 14
    pos_grid: int = 37          # native pos-embed grid (518/14 dinov2, 224/16 vit)
    layerscale: bool = True     # DINOv2 yes, ViT no
    layer_norm_eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.n_head

    @property
    def mlp_dim(self) -> int:
        return int(self.hidden_size * self.mlp_ratio)


DINOV2_SMALL = ViTConfig(hidden_size=384, n_layer=12, n_head=6, patch_size=14,
                         pos_grid=37, layerscale=True, layer_norm_eps=1e-6)
DINOV2_BASE = ViTConfig(hidden_size=768, n_layer=12, n_head=12, patch_size=14,
                        pos_grid=37, layerscale=True, layer_norm_eps=1e-6)
VIT_SMALL = ViTConfig(hidden_size=384, n_layer=12, n_head=6, patch_size=16,
                      pos_grid=14, layerscale=False, layer_norm_eps=1e-12)


def layer_norm(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def _interp_pos_embed(params: Params, cfg: ViTConfig, grid_h: int, grid_w: int):
    """Interpolate the (1+N, C) table to a (grid_h, grid_w) patch grid
    (HF semantics: bicubic align_corners=False on the patch part, fp32;
    skipped when the grid matches the native square grid)."""
    pos = params["pos_embed"]  # (1+N, C)
    cls_pos = pos[:1]
    patch_pos = pos[1:]
    g = cfg.pos_grid
    if (grid_h, grid_w) == (g, g):
        return pos
    patch = patch_pos.reshape(g, g, -1)
    patch = resize2d(
        patch.astype(jnp.float32), grid_h, grid_w, mode="bicubic", align_corners=False
    ).reshape(grid_h * grid_w, -1)
    return jnp.concatenate([cls_pos, patch.astype(pos.dtype)], axis=0)


def vit_forward(
    params: Params, cfg: ViTConfig, x: jnp.ndarray, remat: "str | bool" = False
) -> jnp.ndarray:
    """x: (B, H, W, 3) -> patch tokens (B, (H/P)*(W/P), C), CLS dropped.

    remat: rematerialize each layer in backward (same policy strings as
    gpt._scan_layers). Without it, training at 512px saves every layer's
    (B, heads, 1025, 1025) score tensor for the VJP — 3.8 GB at batch 8, the
    single largest allocation of the XL-512 control step."""
    b, h, w, _ = x.shape
    p = cfg.patch_size
    gh, gw = h // p, w // p
    # no preferred_element_type: its AD transpose mismatches dtypes under
    # bf16 training; TPU convs accumulate fp32 internally regardless
    patches = jax.lax.conv_general_dilated(
        x, params["patch_proj"]["w"], (p, p), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["patch_proj"]["b"]
    tokens = patches.reshape(b, gh * gw, cfg.hidden_size)
    cls = jnp.broadcast_to(params["cls_token"][None, None, :], (b, 1, cfg.hidden_size))
    hstate = jnp.concatenate([cls, tokens], axis=1)
    hstate = hstate + _interp_pos_embed(params, cfg, gh, gw)[None].astype(hstate.dtype)

    def body(carry, lp):
        hh = carry
        y = layer_norm(hh, lp["norm1"]["scale"], lp["norm1"]["bias"], cfg.layer_norm_eps)
        t = y.shape[1]
        q = (y @ lp["q"]["w"] + lp["q"]["b"]).reshape(b, t, cfg.n_head, cfg.head_dim)
        k = (y @ lp["k"]["w"] + lp["k"]["b"]).reshape(b, t, cfg.n_head, cfg.head_dim)
        v = (y @ lp["v"]["w"] + lp["v"]["b"]).reshape(b, t, cfg.n_head, cfg.head_dim)
        scores = jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32)
        scores = scores * (cfg.head_dim ** -0.5)
        probs = jax.nn.softmax(scores, axis=-1).astype(y.dtype)
        attn = jnp.einsum("bhts,bshd->bthd", probs, v, preferred_element_type=jnp.float32)
        attn = attn.astype(y.dtype).reshape(b, t, cfg.hidden_size)
        attn = attn @ lp["out"]["w"] + lp["out"]["b"]
        if cfg.layerscale:
            attn = attn * lp["ls1"]
        hh = hh + attn
        y = layer_norm(hh, lp["norm2"]["scale"], lp["norm2"]["bias"], cfg.layer_norm_eps)
        y = jax.nn.gelu(y @ lp["fc1"]["w"] + lp["fc1"]["b"], approximate=False)
        y = y @ lp["fc2"]["w"] + lp["fc2"]["b"]
        if cfg.layerscale:
            y = y * lp["ls2"]
        return hh + y, None

    if remat:
        if remat == "dots":
            body = jax.checkpoint(
                body,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            )
        else:
            body = jax.checkpoint(body)
    hstate, _ = jax.lax.scan(body, hstate, params["layers"])
    hstate = layer_norm(
        hstate, params["final_norm"]["scale"], params["final_norm"]["bias"],
        cfg.layer_norm_eps,
    )
    return hstate[:, 1:]


def init_vit_params(rng: jax.Array, cfg: ViTConfig, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(rng, 16))
    c, m, L = cfg.hidden_size, cfg.mlp_dim, cfg.n_layer

    def nrm():
        return {"scale": jnp.ones((L, c), dtype), "bias": jnp.zeros((L, c), dtype)}

    def lin(kin, kout):
        return {
            "w": jax.random.normal(next(keys), (L, kin, kout), dtype) * 0.02,
            "b": jnp.zeros((L, kout), dtype),
        }

    layers = {
        "norm1": nrm(),
        "q": lin(c, c), "k": lin(c, c), "v": lin(c, c), "out": lin(c, c),
        "norm2": nrm(),
        "fc1": lin(c, m), "fc2": lin(m, c),
    }
    if cfg.layerscale:
        layers["ls1"] = jnp.ones((L, c), dtype)
        layers["ls2"] = jnp.ones((L, c), dtype)
    n = cfg.pos_grid * cfg.pos_grid
    return {
        "cls_token": jax.random.normal(next(keys), (c,), dtype) * 0.02,
        "pos_embed": jax.random.normal(next(keys), (n + 1, c), dtype) * 0.02,
        "patch_proj": {
            "w": jax.random.normal(next(keys), (cfg.patch_size, cfg.patch_size, 3, c), dtype) * 0.02,
            "b": jnp.zeros((c,), dtype),
        },
        "layers": layers,
        "final_norm": {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)},
    }
