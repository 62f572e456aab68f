"""PyTorch -> JAX weight conversion for the VQGAN tokenizer.

Maps reference VQModel state dicts (ref: tokenizer/tokenizer_image/vq_model.py;
ckpt format {'model': sd}, sample_t2i.py:48-49) to the controlar_tpu NHWC
pytree. Conv weights OIHW -> HWIO; 1x1 convs likewise.
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from controlar_tpu.config import VQConfig


def _conv(sd, prefix) -> Dict:
    w = np.asarray(sd[f"{prefix}.weight"])  # (O, I, KH, KW)
    return {
        "w": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0))),
        "b": np.asarray(sd[f"{prefix}.bias"]),
    }


def _norm(sd, prefix) -> Dict:
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def _res(sd, prefix) -> Dict:
    p = {
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "conv1": _conv(sd, f"{prefix}.conv1"),
        "norm2": _norm(sd, f"{prefix}.norm2"),
        "conv2": _conv(sd, f"{prefix}.conv2"),
    }
    if f"{prefix}.nin_shortcut.weight" in sd:
        p["nin_shortcut"] = _conv(sd, f"{prefix}.nin_shortcut")
    return p


def _attn(sd, prefix) -> Dict:
    return {
        "norm": _norm(sd, f"{prefix}.norm"),
        "q": _conv(sd, f"{prefix}.q"),
        "k": _conv(sd, f"{prefix}.k"),
        "v": _conv(sd, f"{prefix}.v"),
        "proj_out": _conv(sd, f"{prefix}.proj_out"),
    }


def convert_vq_state_dict(sd: Mapping, cfg: VQConfig) -> Dict:
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in sd.items()}

    def convert_side(side: str, ch_mult, num_levels_iter, extra_res, resample_key):
        levels = []
        for li in num_levels_iter:
            prefix = f"{side}.conv_blocks.{li}"
            res = []
            j = 0
            while f"{prefix}.res.{j}.norm1.weight" in sd:
                res.append(_res(sd, f"{prefix}.res.{j}"))
                j += 1
            attn = []
            j = 0
            while f"{prefix}.attn.{j}.norm.weight" in sd:
                attn.append(_attn(sd, f"{prefix}.attn.{j}"))
                j += 1
            level = {"res": res, "attn": attn}
            if f"{prefix}.{resample_key}.conv.weight" in sd:
                level[resample_key] = {"conv": _conv(sd, f"{prefix}.{resample_key}.conv")}
            levels.append(level)
        return {
            "conv_in": _conv(sd, f"{side}.conv_in"),
            "levels": levels,
            "mid": [
                _res(sd, f"{side}.mid.0"),
                _attn(sd, f"{side}.mid.1"),
                _res(sd, f"{side}.mid.2"),
            ],
            "norm_out": _norm(sd, f"{side}.norm_out"),
            "conv_out": _conv(sd, f"{side}.conv_out"),
        }

    n_enc = len(cfg.encoder_ch_mult)
    n_dec = len(cfg.decoder_ch_mult)
    return {
        "encoder": convert_side("encoder", cfg.encoder_ch_mult, range(n_enc), 0, "downsample"),
        "quant_conv": _conv(sd, "quant_conv"),
        "codebook": np.asarray(sd["quantize.embedding.weight"]),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
        "decoder": convert_side("decoder", cfg.decoder_ch_mult, range(n_dec), 1, "upsample"),
    }
