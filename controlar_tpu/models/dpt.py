"""DPT (dense prediction transformer) depth estimator — TPU-native JAX.

The reference's depth condition extractor (ref condition/depth.py, usage in
sample_t2i.py:114-139 via HF DPTForDepthEstimation from condition/ckpts/
dpt_large, and depth RMSE eval, evaluations/depth_rmse.py:33-34).

DPT-Large: ViT-L/16 backbone (qkv bias, bilinear-interpolated pos embeds,
NO final layernorm on tapped states), readout-'project' token->map
reassembly at 4 depths with scale factors (4, 2, 1, 0.5), feature-fusion
top-down decoder (pre-act residual conv units, 2x bilinear align_corners
upsampling), 3-conv monocular depth head.

The standard image preprocessing (DPTImageProcessor): resize to 512 (here
handled by the caller), scale 1/255, normalize mean=std=0.5.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from controlar_tpu.ops.conv import conv2d, conv_transpose2d
from controlar_tpu.ops.resize import resize2d
from controlar_tpu.models.vit import layer_norm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class DPTConfig:
    hidden_size: int = 1024
    n_layer: int = 24
    n_head: int = 16
    mlp_dim: int = 4096
    patch_size: int = 16
    pos_grid: int = 24                 # 384/16 native
    out_indices: Tuple[int, ...] = (5, 11, 17, 23)
    neck_hidden_sizes: Tuple[int, ...] = (256, 512, 1024, 1024)
    reassemble_factors: Tuple[float, ...] = (4, 2, 1, 0.5)
    fusion_hidden_size: int = 256
    layer_norm_eps: float = 1e-12

    @property
    def head_dim(self):
        return self.hidden_size // self.n_head


DPT_LARGE = DPTConfig()


def _backbone(params: Params, cfg: DPTConfig, x: jnp.ndarray) -> List[jnp.ndarray]:
    """x: (B,H,W,3) preprocessed -> tapped hidden states (with CLS, no final ln)."""
    b, h, w, _ = x.shape
    p = cfg.patch_size
    gh, gw = h // p, w // p
    patches = jax.lax.conv_general_dilated(
        x, params["patch_proj"]["w"], (p, p), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["patch_proj"]["b"]
    tokens = patches.reshape(b, gh * gw, cfg.hidden_size)
    cls = jnp.broadcast_to(params["cls_token"][None, None, :], (b, 1, cfg.hidden_size))
    hs = jnp.concatenate([cls, tokens], axis=1)
    # pos embed: bilinear (align_corners=False) resize of the grid part
    # (ref DPTViTEmbeddings._resize_pos_embed)
    pos = params["pos_embed"]
    g = cfg.pos_grid
    if (gh, gw) != (g, g):
        grid = pos[1:].reshape(g, g, -1).astype(jnp.float32)
        grid = resize2d(grid, gh, gw, mode="bilinear", align_corners=False)
        pos = jnp.concatenate([pos[:1], grid.reshape(gh * gw, -1).astype(pos.dtype)], 0)
    hs = hs + pos[None]

    taps = []
    n_tap = max(cfg.out_indices)
    for l in range(cfg.n_layer):
        lp = jax.tree.map(lambda a: a[l], params["layers"])
        y = layer_norm(hs, lp["norm1"]["scale"], lp["norm1"]["bias"], cfg.layer_norm_eps)
        t = y.shape[1]
        q = (y @ lp["q"]["w"] + lp["q"]["b"]).reshape(b, t, cfg.n_head, cfg.head_dim)
        k = (y @ lp["k"]["w"] + lp["k"]["b"]).reshape(b, t, cfg.n_head, cfg.head_dim)
        v = (y @ lp["v"]["w"] + lp["v"]["b"]).reshape(b, t, cfg.n_head, cfg.head_dim)
        scores = jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32)
        scores = scores * (cfg.head_dim ** -0.5)
        probs = jax.nn.softmax(scores, axis=-1).astype(y.dtype)
        attn = jnp.einsum("bhts,bshd->bthd", probs, v, preferred_element_type=jnp.float32)
        attn = attn.astype(y.dtype).reshape(b, t, cfg.hidden_size)
        hs = hs + (attn @ lp["out"]["w"] + lp["out"]["b"])
        y = layer_norm(hs, lp["norm2"]["scale"], lp["norm2"]["bias"], cfg.layer_norm_eps)
        y = jax.nn.gelu(y @ lp["fc1"]["w"] + lp["fc1"]["b"], approximate=False)
        hs = hs + (y @ lp["fc2"]["w"] + lp["fc2"]["b"])
        if l in cfg.out_indices:
            taps.append(hs)
        if l == n_tap:
            break
    return taps


def _reassemble(params: Params, cfg: DPTConfig, taps, gh: int, gw: int):
    """Tokens -> 4 image-like maps at (4, 2, 1, 0.5) x patch resolution."""
    outs = []
    for i, hs in enumerate(taps):
        rp = params["reassemble"][i]
        cls, tok = hs[:, :1], hs[:, 1:]
        b, n, c = tok.shape
        # readout 'project': concat CLS onto every token, Linear+GELU
        readout = jnp.broadcast_to(cls, tok.shape)
        t = jnp.concatenate([tok, readout], axis=-1)
        t = jax.nn.gelu(t @ rp["readout"]["w"] + rp["readout"]["b"], approximate=False)
        fmap = t.reshape(b, gh, gw, c)
        fmap = conv2d(fmap, rp["projection"]["w"], rp["projection"]["b"])
        f = cfg.reassemble_factors[i]
        if f > 1:
            fmap = conv_transpose2d(
                fmap, rp["resize"]["w"], rp["resize"]["b"],
                stride=int(f), padding=0, output_padding=0,
            )
        elif f < 1:
            fmap = conv2d(fmap, rp["resize"]["w"], rp["resize"]["b"],
                          stride=int(1 / f), padding=((1, 1), (1, 1)))
        fmap = conv2d(fmap, params["neck_convs"][i]["w"], None)
        outs.append(fmap)
    return outs


def _residual_unit(rp: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = jax.nn.relu(x)
    h = conv2d(h, rp["conv1"]["w"], rp["conv1"]["b"])
    h = jax.nn.relu(h)
    h = conv2d(h, rp["conv2"]["w"], rp["conv2"]["b"])
    return x + h


def _fusion(params: Params, cfg: DPTConfig, feats) -> jnp.ndarray:
    """Top-down fusion; returns the highest-resolution fused map."""
    fused = None
    for i, feat in enumerate(feats[::-1]):
        fp = params["fusion"][i]
        if fused is None:
            fused = feat
        else:
            res = feat
            if res.shape[1:3] != fused.shape[1:3]:
                res = resize2d(res, *fused.shape[1:3], mode="bilinear",
                               align_corners=False)
            fused = fused + _residual_unit(fp["res1"], res)
        fused = _residual_unit(fp["res2"], fused)
        fused = resize2d(fused, fused.shape[1] * 2, fused.shape[2] * 2,
                         mode="bilinear", align_corners=True)
        fused = conv2d(fused, fp["projection"]["w"], fp["projection"]["b"])
    return fused


def dpt_depth(params: Params, cfg: DPTConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Preprocessed x (B,H,W,3) -> predicted depth (B, H, W) (the head
    upsamples 2x from half resolution, matching HF output size H x W... the
    HF head outputs (H, W) when input is (H, W) with patch 16: fused map is
    at H/2 after fusion, head upsamples 2x -> H."""
    b, h, w, _ = x.shape
    gh, gw = h // cfg.patch_size, w // cfg.patch_size
    taps = _backbone(params, cfg, x)
    feats = _reassemble(params, cfg, taps, gh, gw)
    fused = _fusion(params, cfg, feats)
    hp = params["head"]
    y = conv2d(fused, hp["conv1"]["w"], hp["conv1"]["b"])
    y = resize2d(y, y.shape[1] * 2, y.shape[2] * 2, mode="bilinear",
                 align_corners=True)
    y = jax.nn.relu(conv2d(y, hp["conv2"]["w"], hp["conv2"]["b"]))
    y = jax.nn.relu(conv2d(y, hp["conv3"]["w"], hp["conv3"]["b"]))
    return y[..., 0]


def preprocess_depth_input(images_u8: jnp.ndarray, size: int = 512) -> jnp.ndarray:
    """DPTImageProcessor semantics: resize (bilinear), rescale 1/255,
    normalize mean=std=0.5."""
    x = resize2d(images_u8.astype(jnp.float32), size, size, mode="bilinear")
    return (x / 255.0 - 0.5) / 0.5


def depth_to_condition(depth: jnp.ndarray) -> jnp.ndarray:
    """predicted_depth -> 0..255 map (ref sample_t2i.py:138-139:
    depth * 255 / depth.max())."""
    mx = jnp.max(depth, axis=(1, 2), keepdims=True)
    return depth * 255.0 / jnp.maximum(mx, 1e-6)
