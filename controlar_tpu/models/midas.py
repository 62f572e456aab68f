"""MiDaS DPT-Hybrid depth estimator (BiT-R50 + ViT-B) — TPU-native JAX.

The reference's multi-resolution depth conditioning path
(ref condition/midas/: DPTDepthModel(backbone="vitb_rn50_384"),
dpt_depth.py:88-107; flexible pos-embed forward, vit.py:100-157; detector
usage sample_t2i_MR.py:133 + depth.py:175-204). The released depth-MR
checkpoints were trained against THIS conditioning network, so checkpoint
parity requires it exactly (VERDICT r1 item 6); models/dpt.py remains the
rect-capable DPT-Large path for the square-grid depth condition.

Architecture (timm `vit_base_resnet50_384`, as instantiated by the frozen
dpt_hybrid-midas-501f0c75.pt checkpoint):
- BiT ResNetV2-50 stem+3 stages: weight-standardized convs (eps 1e-8,
  TF-'SAME' asymmetric padding), GroupNorm(32)+ReLU, non-preact bottlenecks,
  layers (3, 4, 9); stage0 (256ch, /4) and stage1 (512ch, /8) are tapped as
  DPT layers 1/2 directly (vit.py:360-366, act_postprocess1/2 = Identity).
- ViT-B/16 over the /16 R50 feature map (1x1 conv patch proj, cls token,
  bilinearly resized pos-embed with NO half-pixel alignment correction
  (align_corners=False), 12 pre-LN blocks, fused qkv, exact GELU); blocks 8
  and 11 tapped (hooks [0,1,8,11], dpt_depth.py:41-45) BEFORE the final norm.
- Readout 'project' (concat cls, Linear 2d->d + GELU) for taps 3/4;
  reassemble to /16 (1x1 conv) and /32 (1x1 conv + 3x3 stride-2).
- Scratch 3x3 bias-free convs [256,512,768,768] -> 256; four
  FeatureFusionBlock_custom (pre-act residual conv units, x2 bilinear
  align_corners=True, 1x1 out conv); depth head 256->128 -> x2 -> 32 -> 1,
  non-negative ReLU (blocks.py:231-341, dpt_depth.py:92-100).

Inputs are NHWC in [-1, 1] at any resolution divisible by 32 — the ControlAR
detector feeds the raw image without the aspect-preserving transform
(depth.py:180-186: `image / 127.5 - 1`, model, min-max -> uint8).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from controlar_tpu.ops.conv import conv2d
from controlar_tpu.ops.resize import resize2d
from controlar_tpu.models.vit import layer_norm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MidasHybridConfig:
    # ResNetV2 (BiT) trunk
    stem_width: int = 64
    layers: Tuple[int, ...] = (3, 4, 9)
    # ViT
    hidden_size: int = 768
    n_layer: int = 12
    n_head: int = 12
    mlp_dim: int = 3072
    pos_grid: int = 24              # 384/16 native
    vit_hooks: Tuple[int, int] = (8, 11)
    ln_eps: float = 1e-6
    gn_eps: float = 1e-5
    std_eps: float = 1e-8
    # DPT
    features: int = 256
    layer_channels: Tuple[int, ...] = (256, 512, 768, 768)

    @property
    def head_dim(self):
        return self.hidden_size // self.n_head

    @property
    def stage_channels(self) -> Tuple[int, ...]:
        return (256, 512, 1024)


MIDAS_HYBRID = MidasHybridConfig()


# ---------------------------------------------------------------------------
# BiT ResNetV2 trunk (timm resnetv2, non-preact, StdConv2dSame + GroupNormAct)
# ---------------------------------------------------------------------------

def _std_conv(p, x, stride=1, eps=1e-8):
    """Weight-standardized conv, TF-'SAME' padding (timm StdConv2dSame)."""
    w = p["w"].astype(jnp.float32)
    mean = jnp.mean(w, axis=(0, 1, 2), keepdims=True)
    var = jnp.var(w, axis=(0, 1, 2), keepdims=True)
    w = ((w - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return conv2d(x, w, p.get("b"), stride=stride, padding="SAME")


def _gn_relu(p, x, eps, relu=True):
    """GroupNorm(32) (+ReLU) over NHWC."""
    b, h, w, c = x.shape
    g = 32
    xg = x.reshape(b, h, w, g, c // g).astype(jnp.float32)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    y = xg.reshape(b, h, w, c) * p["scale"] + p["bias"]
    y = y.astype(x.dtype)
    return jax.nn.relu(y) if relu else y


def _max_pool_same(x, k=3, stride=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, stride, stride, 1), "SAME"
    )


def _bottleneck(p, cfg: MidasHybridConfig, x, stride=1):
    """timm resnetv2 Bottleneck (non-preact): conv1-gnact, conv2(s)-gnact,
    conv3-gn, + downsampled shortcut, relu."""
    shortcut = x
    if "downsample" in p:
        shortcut = _std_conv(p["downsample"]["conv"], x, stride, cfg.std_eps)
        shortcut = _gn_relu(p["downsample"]["norm"], shortcut, cfg.gn_eps, relu=False)
    h = _std_conv(p["conv1"], x, 1, cfg.std_eps)
    h = _gn_relu(p["norm1"], h, cfg.gn_eps)
    h = _std_conv(p["conv2"], h, stride, cfg.std_eps)
    h = _gn_relu(p["norm2"], h, cfg.gn_eps)
    h = _std_conv(p["conv3"], h, 1, cfg.std_eps)
    h = _gn_relu(p["norm3"], h, cfg.gn_eps, relu=False)
    return jax.nn.relu(h + shortcut)


def _resnet_trunk(p, cfg: MidasHybridConfig, x):
    """x (B,H,W,3) -> (stage0 /4, stage1 /8, stage2 /16) feature maps."""
    h = _std_conv(p["stem"]["conv"], x, 2, cfg.std_eps)
    h = _gn_relu(p["stem"]["norm"], h, cfg.gn_eps)
    h = _max_pool_same(h, 3, 2)
    taps = []
    for si, blocks in enumerate(p["stages"]):
        for bi, bp in enumerate(blocks):
            stride = 2 if (si > 0 and bi == 0) else 1
            h = _bottleneck(bp, cfg, h, stride)
        taps.append(h)
    return taps


# ---------------------------------------------------------------------------
# ViT over the R50 feature map, flexible pos-embed
# ---------------------------------------------------------------------------

def _resize_pos_embed(pos, g_old: int, gh: int, gw: int):
    """vit.py:100-113: bilinear align_corners=False grid resize, cls kept."""
    if (gh, gw) == (g_old, g_old):
        return pos
    grid = pos[1:].reshape(g_old, g_old, -1).astype(jnp.float32)
    grid = resize2d(grid, gh, gw, mode="bilinear", align_corners=False)
    return jnp.concatenate([pos[:1], grid.reshape(gh * gw, -1).astype(pos.dtype)], 0)


def _vit_blocks(p, cfg: MidasHybridConfig, hs, taps_at):
    taps = []
    b, t, c = hs.shape
    for l in range(cfg.n_layer):
        lp = p["blocks"][l]
        y = layer_norm(hs, lp["norm1"]["scale"], lp["norm1"]["bias"], cfg.ln_eps)
        qkv = y @ lp["qkv"]["w"] + lp["qkv"]["b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, cfg.n_head, cfg.head_dim)
        k = k.reshape(b, t, cfg.n_head, cfg.head_dim)
        v = v.reshape(b, t, cfg.n_head, cfg.head_dim)
        s = jnp.einsum("bthd,bshd->bhts", q, k,
                       preferred_element_type=jnp.float32) * cfg.head_dim ** -0.5
        a = jax.nn.softmax(s, axis=-1).astype(y.dtype)
        attn = jnp.einsum("bhts,bshd->bthd", a, v,
                          preferred_element_type=jnp.float32)
        attn = attn.astype(y.dtype).reshape(b, t, c)
        hs = hs + (attn @ lp["proj"]["w"] + lp["proj"]["b"])
        y = layer_norm(hs, lp["norm2"]["scale"], lp["norm2"]["bias"], cfg.ln_eps)
        y = jax.nn.gelu(y @ lp["fc1"]["w"] + lp["fc1"]["b"], approximate=False)
        hs = hs + (y @ lp["fc2"]["w"] + lp["fc2"]["b"])
        if l in taps_at:
            taps.append(hs)  # block output, final norm NOT applied (hook)
    return taps


def _project_readout(rp, hs):
    """ProjectReadout (vit.py:31-42): tokens ++ broadcast cls -> Linear+GELU."""
    cls, tok = hs[:, :1], hs[:, 1:]
    t = jnp.concatenate([tok, jnp.broadcast_to(cls, tok.shape)], axis=-1)
    return jax.nn.gelu(t @ rp["w"] + rp["b"], approximate=False)


# ---------------------------------------------------------------------------
# DPT decode
# ---------------------------------------------------------------------------

def _residual_unit(rp, x):
    h = jax.nn.relu(x)
    h = conv2d(h, rp["conv1"]["w"], rp["conv1"]["b"], padding=((1, 1), (1, 1)))
    h = jax.nn.relu(h)
    h = conv2d(h, rp["conv2"]["w"], rp["conv2"]["b"], padding=((1, 1), (1, 1)))
    return x + h


def _fusion_block(fp, x, skip=None):
    out = x
    if skip is not None:
        out = out + _residual_unit(fp["res1"], skip)
    out = _residual_unit(fp["res2"], out)
    out = resize2d(out, out.shape[1] * 2, out.shape[2] * 2,
                   mode="bilinear", align_corners=True)
    return conv2d(out, fp["out"]["w"], fp["out"]["b"])


def midas_hybrid_depth(params: Params, cfg: MidasHybridConfig,
                       x: jnp.ndarray) -> jnp.ndarray:
    """x: (B,H,W,3) in [-1,1], H and W multiples of 32 -> depth (B,H,W)."""
    b, h, w, _ = x.shape
    gh, gw = h // 16, w // 16

    s0, s1, s2 = _resnet_trunk(params["backbone"], cfg, x)
    tokens = conv2d(s2, params["patch_proj"]["w"], params["patch_proj"]["b"],
                    padding="VALID").reshape(b, gh * gw, cfg.hidden_size)
    cls = jnp.broadcast_to(params["cls_token"][None], (b, 1, cfg.hidden_size))
    hs = jnp.concatenate([cls, tokens], axis=1)
    hs = hs + _resize_pos_embed(params["pos_embed"], cfg.pos_grid, gh, gw)[None]
    t3, t4 = _vit_blocks(params, cfg, hs, cfg.vit_hooks)

    l3 = _project_readout(params["readout3"], t3).reshape(b, gh, gw, -1)
    l3 = conv2d(l3, params["post3"]["w"], params["post3"]["b"], padding="VALID")
    l4 = _project_readout(params["readout4"], t4).reshape(b, gh, gw, -1)
    l4 = conv2d(l4, params["post4a"]["w"], params["post4a"]["b"], padding="VALID")
    l4 = conv2d(l4, params["post4b"]["w"], params["post4b"]["b"], stride=2,
                padding=((1, 1), (1, 1)))

    rn = [
        conv2d(f, params["layer_rn"][i], None, padding=((1, 1), (1, 1)))
        for i, f in enumerate((s0, s1, l3, l4))
    ]
    path = _fusion_block(params["refinenet"][3], rn[3])
    path = _fusion_block(params["refinenet"][2], path, rn[2])
    path = _fusion_block(params["refinenet"][1], path, rn[1])
    path = _fusion_block(params["refinenet"][0], path, rn[0])

    hp = params["head"]
    y = conv2d(path, hp["conv1"]["w"], hp["conv1"]["b"], padding=((1, 1), (1, 1)))
    y = resize2d(y, y.shape[1] * 2, y.shape[2] * 2, mode="bilinear",
                 align_corners=True)
    y = jax.nn.relu(conv2d(y, hp["conv2"]["w"], hp["conv2"]["b"],
                           padding=((1, 1), (1, 1))))
    y = jax.nn.relu(conv2d(y, hp["conv3"]["w"], hp["conv3"]["b"], padding="VALID"))
    return y[..., 0]


def midas_depth_condition(params: Params, cfg: MidasHybridConfig,
                          images_u8: jnp.ndarray) -> jnp.ndarray:
    """MidasDetector.__call__ (depth.py:180-193): raw image at native
    resolution -> min-max-normalized 0..255 depth map."""
    x = images_u8.astype(jnp.float32) / 127.5 - 1.0
    d = midas_hybrid_depth(params, cfg, x)
    mn = jnp.min(d, axis=(1, 2), keepdims=True)
    mx = jnp.max(d, axis=(1, 2), keepdims=True)
    return jnp.clip((d - mn) / jnp.maximum(mx - mn, 1e-9) * 255.0, 0, 255)


# ---------------------------------------------------------------------------
# Init (tests / converter plumbing)
# ---------------------------------------------------------------------------

def init_midas_params(rng: jax.Array, cfg: MidasHybridConfig = MIDAS_HYBRID,
                      dtype=jnp.float32) -> Params:
    key = [rng]

    def nk():
        key[0], k = jax.random.split(key[0])
        return k

    def conv(kh, kw, cin, cout, bias=True, std=0.05):
        p = {"w": (jax.random.normal(nk(), (kh, kw, cin, cout)) * std).astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((cout,), dtype)
        return p

    def gn(c):
        return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

    def lin(cin, cout, std=0.05):
        return {"w": (jax.random.normal(nk(), (cin, cout)) * std).astype(dtype),
                "b": jnp.zeros((cout,), dtype)}

    sw = cfg.stem_width
    stages = []
    in_ch = sw
    for si, n_blocks in enumerate(cfg.layers):
        out_ch = cfg.stage_channels[si]
        mid = out_ch // 4
        blocks = []
        for bi in range(n_blocks):
            bp = {
                "conv1": conv(1, 1, in_ch, mid, bias=False),
                "norm1": gn(mid),
                "conv2": conv(3, 3, mid, mid, bias=False),
                "norm2": gn(mid),
                "conv3": conv(1, 1, mid, out_ch, bias=False),
                "norm3": gn(out_ch),
            }
            if bi == 0:
                bp["downsample"] = {
                    "conv": conv(1, 1, in_ch, out_ch, bias=False),
                    "norm": gn(out_ch),
                }
            blocks.append(bp)
            in_ch = out_ch
        stages.append(blocks)

    d, f = cfg.hidden_size, cfg.features
    params: Params = {
        "backbone": {
            "stem": {"conv": conv(7, 7, 3, sw, bias=False), "norm": gn(sw)},
            "stages": stages,
        },
        "patch_proj": conv(1, 1, cfg.stage_channels[-1], d),
        "cls_token": (jax.random.normal(nk(), (1, d)) * 0.02).astype(dtype),
        "pos_embed": (
            jax.random.normal(nk(), (1 + cfg.pos_grid ** 2, d)) * 0.02
        ).astype(dtype),
        "blocks": [
            {
                "norm1": gn(d), "qkv": lin(d, 3 * d), "proj": lin(d, d),
                "norm2": gn(d), "fc1": lin(d, cfg.mlp_dim),
                "fc2": lin(cfg.mlp_dim, d),
            }
            for _ in range(cfg.n_layer)
        ],
        "readout3": lin(2 * d, d),
        "readout4": lin(2 * d, d),
        "post3": conv(1, 1, d, cfg.layer_channels[2]),
        "post4a": conv(1, 1, d, cfg.layer_channels[3]),
        "post4b": conv(3, 3, cfg.layer_channels[3], cfg.layer_channels[3]),
        "layer_rn": [
            conv(3, 3, cfg.layer_channels[i], f, bias=False)["w"] for i in range(4)
        ],
        "refinenet": [
            {
                "res1": {"conv1": conv(3, 3, f, f), "conv2": conv(3, 3, f, f)},
                "res2": {"conv1": conv(3, 3, f, f), "conv2": conv(3, 3, f, f)},
                "out": conv(1, 1, f, f),
            }
            for _ in range(4)
        ],
        "head": {
            "conv1": conv(3, 3, f, f // 2),
            "conv2": conv(3, 3, f // 2, 32),
            "conv3": conv(1, 1, 32, 1),
        },
    }
    return params
