"""Converters for the HED and Lineart condition-network checkpoints.

HED: ControlNetHED.pth (ref condition/hed.py:59-65).
Lineart: condition/ckpts/model.pth (ref lineart.py:93).
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _np(v):
    return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)


def _conv(sd, prefix) -> Dict:
    w = _np(sd[f"{prefix}.weight"])  # (O, I, KH, KW)
    return {
        "w": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0))),
        "b": _np(sd[f"{prefix}.bias"]),
    }


def _conv_transpose(sd, prefix) -> Dict:
    w = _np(sd[f"{prefix}.weight"])  # torch ConvTranspose2d: (I, O, KH, KW)
    # lhs-dilated conv computes correlation with a flipped kernel: flip
    # spatially and move to HWIO
    w = np.flip(w, axis=(2, 3))
    return {
        "w": np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))),
        "b": _np(sd[f"{prefix}.bias"]),
    }


def convert_hed_state_dict(sd: Mapping) -> Dict:
    sd = {k: _np(v) for k, v in sd.items()}
    blocks = []
    layer_counts = [2, 2, 3, 3, 3]
    for i, n in enumerate(layer_counts, start=1):
        blocks.append({
            "convs": [_conv(sd, f"block{i}.convs.{j}") for j in range(n)],
            "projection": _conv(sd, f"block{i}.projection"),
        })
    return {
        "norm": _np(sd["norm"]).reshape(1, 1, 1, 3),  # torch (1,3,1,1) -> NHWC
        "blocks": blocks,
    }


def convert_lineart_state_dict(sd: Mapping) -> Dict:
    sd = {k: _np(v) for k, v in sd.items()}
    return {
        "model0": _conv(sd, "model0.1"),
        "model1": [_conv(sd, "model1.0"), _conv(sd, "model1.3")],
        "model2": [
            {
                "conv1": _conv(sd, f"model2.{i}.conv_block.1"),
                "conv2": _conv(sd, f"model2.{i}.conv_block.5"),
            }
            for i in range(3)
        ],
        "model3": [
            _conv_transpose(sd, "model3.0"),
            _conv_transpose(sd, "model3.3"),
        ],
        "model4": _conv(sd, "model4.1"),
    }
