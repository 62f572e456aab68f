"""Convert taming-transformers VQGAN checkpoints (the reference's comparison
tokenizers, ref tokenizer/vqgan/model.py VQGAN_FROM_TAMING) to the JAX tree
of models/taming_vqgan.py. State-dict layout is the pytorch-lightning
`state_dict` of VQModel: encoder./decoder. (layer.py names), quant_conv,
post_quant_conv, quantize.embedding.weight."""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

from controlar_tpu.models.taming_vqgan import TamingVQConfig, _attn_gates


def _c(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _npy(sd, k):
    t = sd[k]
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def convert_taming_state_dict(sd: Dict[str, Any],
                              cfg: TamingVQConfig) -> Dict[str, Any]:
    g = lambda k: _npy(sd, k)  # noqa: E731

    def conv(prefix):
        return {"w": _c(g(prefix + ".weight")), "b": g(prefix + ".bias")}

    def gn(prefix):
        return {"scale": g(prefix + ".weight"), "bias": g(prefix + ".bias")}

    def res(prefix):
        p = {"norm1": gn(prefix + ".norm1"), "conv1": conv(prefix + ".conv1"),
             "norm2": gn(prefix + ".norm2"), "conv2": conv(prefix + ".conv2")}
        if prefix + ".nin_shortcut.weight" in sd:
            p["nin_shortcut"] = conv(prefix + ".nin_shortcut")
        return p

    def attn(prefix):
        return {"norm": gn(prefix + ".norm"), "q": conv(prefix + ".q"),
                "k": conv(prefix + ".k"), "v": conv(prefix + ".v"),
                "proj_out": conv(prefix + ".proj_out")}

    def half(side: str, decoder: bool):
        gates = _attn_gates(cfg, decoder=decoder)
        levels = []
        n_blocks = cfg.num_res_blocks + (1 if decoder else 0)
        sub = "up" if decoder else "down"
        for i in range(cfg.num_resolutions):
            level: Dict[str, Any] = {"block": [], "attn": []}
            for j in range(n_blocks):
                level["block"].append(res(f"{side}.{sub}.{i}.block.{j}"))
                if gates[i]:
                    level["attn"].append(attn(f"{side}.{sub}.{i}.attn.{j}"))
            if decoder and i != 0:
                level["upsample"] = {"conv": conv(f"{side}.up.{i}.upsample.conv")}
            if not decoder and i != cfg.num_resolutions - 1:
                level["downsample"] = {
                    "conv": conv(f"{side}.down.{i}.downsample.conv")
                }
            levels.append(level)
        return {
            "conv_in": conv(f"{side}.conv_in"),
            ("up" if decoder else "down"): levels,
            "mid": {"block_1": res(f"{side}.mid.block_1"),
                    "attn_1": attn(f"{side}.mid.attn_1"),
                    "block_2": res(f"{side}.mid.block_2")},
            "norm_out": gn(f"{side}.norm_out"),
            "conv_out": conv(f"{side}.conv_out"),
        }

    return {
        "encoder": half("encoder", decoder=False),
        "decoder": half("decoder", decoder=True),
        "quant_conv": conv("quant_conv"),
        "post_quant_conv": conv("post_quant_conv"),
        "embedding": g("quantize.embedding.weight"),
    }


def load_taming_checkpoint(path: str, cfg: TamingVQConfig) -> Dict[str, Any]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return convert_taming_state_dict(sd, cfg)
