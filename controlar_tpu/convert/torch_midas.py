"""Convert the MiDaS dpt_hybrid checkpoint (dpt_hybrid-midas-501f0c75.pt,
ref condition/midas/depth.py:22-29) to the JAX tree of models/midas.py.

State-dict layout: the frozen DPTDepthModel wraps timm's
`vit_base_resnet50_384` under `pretrained.model.*` (ResNetV2 backbone under
`patch_embed.backbone.*`), the readout/reassemble convs under
`pretrained.act_postprocess{3,4}.*`, and the scratch/fusion/head under
`scratch.*` (ref midas/vit.py:336-470, dpt_depth.py:26-100)."""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

from controlar_tpu.models.midas import MIDAS_HYBRID, MidasHybridConfig


def _c(w):  # torch conv OIHW -> HWIO
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _l(w):  # torch linear (out, in) -> (in, out)
    return np.asarray(w).T


def _npy(sd, k):
    t = sd[k]
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def convert_midas_state_dict(
    sd: Dict[str, Any], cfg: MidasHybridConfig = MIDAS_HYBRID
) -> Dict[str, Any]:
    g = lambda k: _npy(sd, k)  # noqa: E731
    vm = "pretrained.model."
    bb = vm + "patch_embed.backbone."

    def gn(prefix):
        return {"scale": g(prefix + ".weight"), "bias": g(prefix + ".bias")}

    stages = []
    for si, n_blocks in enumerate(cfg.layers):
        blocks = []
        for bi in range(n_blocks):
            p = f"{bb}stages.{si}.blocks.{bi}."
            bp = {
                "conv1": {"w": _c(g(p + "conv1.weight"))},
                "norm1": gn(p + "norm1"),
                "conv2": {"w": _c(g(p + "conv2.weight"))},
                "norm2": gn(p + "norm2"),
                "conv3": {"w": _c(g(p + "conv3.weight"))},
                "norm3": gn(p + "norm3"),
            }
            if p + "downsample.conv.weight" in sd:
                bp["downsample"] = {
                    "conv": {"w": _c(g(p + "downsample.conv.weight"))},
                    "norm": gn(p + "downsample.norm"),
                }
            blocks.append(bp)
        stages.append(blocks)

    def lin(prefix):
        return {"w": _l(g(prefix + ".weight")), "b": g(prefix + ".bias")}

    def conv(prefix, bias=True):
        p = {"w": _c(g(prefix + ".weight"))}
        if bias:
            p["b"] = g(prefix + ".bias")
        return p

    blocks = []
    for i in range(cfg.n_layer):
        p = f"{vm}blocks.{i}."
        blocks.append({
            "norm1": gn(p + "norm1"),
            "qkv": lin(p + "attn.qkv"),
            "proj": lin(p + "attn.proj"),
            "norm2": gn(p + "norm2"),
            "fc1": lin(p + "mlp.fc1"),
            "fc2": lin(p + "mlp.fc2"),
        })

    params = {
        "backbone": {
            "stem": {"conv": {"w": _c(g(bb + "stem.conv.weight"))},
                     "norm": gn(bb + "stem.norm")},
            "stages": stages,
        },
        "patch_proj": conv(vm + "patch_embed.proj"),
        "cls_token": g(vm + "cls_token").reshape(1, cfg.hidden_size),
        "pos_embed": g(vm + "pos_embed").reshape(-1, cfg.hidden_size),
        "blocks": blocks,
        "readout3": lin("pretrained.act_postprocess3.0.project.0"),
        "readout4": lin("pretrained.act_postprocess4.0.project.0"),
        "post3": conv("pretrained.act_postprocess3.3"),
        "post4a": conv("pretrained.act_postprocess4.3"),
        "post4b": conv("pretrained.act_postprocess4.4"),
        "layer_rn": [
            _c(g(f"scratch.layer{i + 1}_rn.weight")) for i in range(4)
        ],
        "refinenet": [
            {
                "res1": {"conv1": conv(f"scratch.refinenet{i + 1}.resConfUnit1.conv1"),
                         "conv2": conv(f"scratch.refinenet{i + 1}.resConfUnit1.conv2")},
                "res2": {"conv1": conv(f"scratch.refinenet{i + 1}.resConfUnit2.conv1"),
                         "conv2": conv(f"scratch.refinenet{i + 1}.resConfUnit2.conv2")},
                "out": conv(f"scratch.refinenet{i + 1}.out_conv"),
            }
            for i in range(4)
        ],
        "head": {
            "conv1": conv("scratch.output_conv.0"),
            "conv2": conv("scratch.output_conv.2"),
            "conv3": conv("scratch.output_conv.4"),
        },
    }
    return params


def load_midas_checkpoint(path: str) -> Dict[str, Any]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd and "pretrained.model.cls_token" not in sd:
        sd = sd["model"]
    return convert_midas_state_dict(sd)


def export_midas_state_dict(params: Dict[str, Any],
                            cfg: MidasHybridConfig = MIDAS_HYBRID) -> Dict[str, Any]:
    """Inverse walk (JAX tree -> checkpoint-named numpy dict) — exercises the
    converter in tests without the released file on disk."""
    sd: Dict[str, Any] = {}
    vm = "pretrained.model."
    bb = vm + "patch_embed.backbone."

    def put_c(prefix, p, bias=True):
        sd[prefix + ".weight"] = np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))
        if bias and "b" in p:
            sd[prefix + ".bias"] = np.asarray(p["b"])

    def put_gn(prefix, p):
        sd[prefix + ".weight"] = np.asarray(p["scale"])
        sd[prefix + ".bias"] = np.asarray(p["bias"])

    def put_l(prefix, p):
        sd[prefix + ".weight"] = np.asarray(p["w"]).T
        sd[prefix + ".bias"] = np.asarray(p["b"])

    put_c(bb + "stem.conv", params["backbone"]["stem"]["conv"], bias=False)
    put_gn(bb + "stem.norm", params["backbone"]["stem"]["norm"])
    for si, blocks in enumerate(params["backbone"]["stages"]):
        for bi, bp in enumerate(blocks):
            p = f"{bb}stages.{si}.blocks.{bi}."
            for j in (1, 2, 3):
                put_c(p + f"conv{j}", bp[f"conv{j}"], bias=False)
                put_gn(p + f"norm{j}", bp[f"norm{j}"])
            if "downsample" in bp:
                put_c(p + "downsample.conv", bp["downsample"]["conv"], bias=False)
                put_gn(p + "downsample.norm", bp["downsample"]["norm"])
    put_c(vm + "patch_embed.proj", params["patch_proj"])
    sd[vm + "cls_token"] = np.asarray(params["cls_token"]).reshape(1, 1, -1)
    sd[vm + "pos_embed"] = np.asarray(params["pos_embed"])[None]
    for i, bp in enumerate(params["blocks"]):
        p = f"{vm}blocks.{i}."
        put_gn(p + "norm1", bp["norm1"])
        put_l(p + "attn.qkv", bp["qkv"])
        put_l(p + "attn.proj", bp["proj"])
        put_gn(p + "norm2", bp["norm2"])
        put_l(p + "mlp.fc1", bp["fc1"])
        put_l(p + "mlp.fc2", bp["fc2"])
    put_l("pretrained.act_postprocess3.0.project.0", params["readout3"])
    put_l("pretrained.act_postprocess4.0.project.0", params["readout4"])
    put_c("pretrained.act_postprocess3.3", params["post3"])
    put_c("pretrained.act_postprocess4.3", params["post4a"])
    put_c("pretrained.act_postprocess4.4", params["post4b"])
    for i in range(4):
        sd[f"scratch.layer{i + 1}_rn.weight"] = np.transpose(
            np.asarray(params["layer_rn"][i]), (3, 2, 0, 1))
        rp = params["refinenet"][i]
        put_c(f"scratch.refinenet{i + 1}.resConfUnit1.conv1", rp["res1"]["conv1"])
        put_c(f"scratch.refinenet{i + 1}.resConfUnit1.conv2", rp["res1"]["conv2"])
        put_c(f"scratch.refinenet{i + 1}.resConfUnit2.conv1", rp["res2"]["conv1"])
        put_c(f"scratch.refinenet{i + 1}.resConfUnit2.conv2", rp["res2"]["conv2"])
        put_c(f"scratch.refinenet{i + 1}.out_conv", rp["out"])
    put_c("scratch.output_conv.0", params["head"]["conv1"])
    put_c("scratch.output_conv.2", params["head"]["conv2"])
    put_c("scratch.output_conv.4", params["head"]["conv3"])
    return sd
