"""HF T5EncoderModel state_dict -> controlar_tpu T5 params.

(ref language/t5.py:43-56 loads flan-t5-xl via T5EncoderModel.)
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from controlar_tpu.models.t5 import T5Config


def _np(v):
    return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)


def convert_t5_state_dict(sd: Mapping, cfg: T5Config) -> Dict:
    sd = {k: _np(v) for k, v in sd.items()}
    L = cfg.n_layer

    def t(key):
        return np.ascontiguousarray(sd[key].T)

    layers = {
        "ln1": np.stack([sd[f"encoder.block.{i}.layer.0.layer_norm.weight"] for i in range(L)]),
        "q": np.stack([t(f"encoder.block.{i}.layer.0.SelfAttention.q.weight") for i in range(L)]),
        "k": np.stack([t(f"encoder.block.{i}.layer.0.SelfAttention.k.weight") for i in range(L)]),
        "v": np.stack([t(f"encoder.block.{i}.layer.0.SelfAttention.v.weight") for i in range(L)]),
        "o": np.stack([t(f"encoder.block.{i}.layer.0.SelfAttention.o.weight") for i in range(L)]),
        "ln2": np.stack([sd[f"encoder.block.{i}.layer.1.layer_norm.weight"] for i in range(L)]),
        "wi0": np.stack([t(f"encoder.block.{i}.layer.1.DenseReluDense.wi_0.weight") for i in range(L)]),
        "wi1": np.stack([t(f"encoder.block.{i}.layer.1.DenseReluDense.wi_1.weight") for i in range(L)]),
        "wo": np.stack([t(f"encoder.block.{i}.layer.1.DenseReluDense.wo.weight") for i in range(L)]),
    }
    return {
        "embedding": sd["shared.weight"],
        "rel_bias": sd[
            "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
        ],
        "layers": layers,
        "final_ln": sd["encoder.final_layer_norm.weight"],
    }
