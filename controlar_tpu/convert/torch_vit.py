"""HF Dinov2Model / ViTModel state_dict -> controlar_tpu ViT params.

(ref adapters load these backbones: dinov2_adapter.py:13, vit_adapter.py:11.)
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from controlar_tpu.models.vit import ViTConfig


def _np(v):
    return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)


def _lin(sd, prefix):
    return {"w": np.ascontiguousarray(_np(sd[f"{prefix}.weight"]).T),
            "b": _np(sd[f"{prefix}.bias"])}


def _nrm(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def convert_hf_vit_state_dict(sd: Mapping, cfg: ViTConfig, flavor: str) -> Dict:
    """flavor: 'dinov2' | 'vit' (HF module naming differs)."""
    sd = {k: _np(v) for k, v in sd.items()}
    L = cfg.n_layer

    def stack(maker):
        outs = [maker(i) for i in range(L)]
        return {
            k: {kk: np.stack([o[k][kk] for o in outs]) for kk in outs[0][k]}
            if isinstance(outs[0][k], dict)
            else np.stack([o[k] for o in outs])
            for k in outs[0]
        }

    if flavor == "dinov2":
        def one(i):
            p = f"encoder.layer.{i}"
            out = {
                "norm1": _nrm(sd, f"{p}.norm1"),
                "q": _lin(sd, f"{p}.attention.attention.query"),
                "k": _lin(sd, f"{p}.attention.attention.key"),
                "v": _lin(sd, f"{p}.attention.attention.value"),
                "out": _lin(sd, f"{p}.attention.output.dense"),
                "norm2": _nrm(sd, f"{p}.norm2"),
                "fc1": _lin(sd, f"{p}.mlp.fc1"),
                "fc2": _lin(sd, f"{p}.mlp.fc2"),
                "ls1": _np(sd[f"{p}.layer_scale1.lambda1"]),
                "ls2": _np(sd[f"{p}.layer_scale2.lambda1"]),
            }
            return out
    elif flavor == "vit":
        def one(i):
            p = f"encoder.layer.{i}"
            return {
                "norm1": _nrm(sd, f"{p}.layernorm_before"),
                "q": _lin(sd, f"{p}.attention.attention.query"),
                "k": _lin(sd, f"{p}.attention.attention.key"),
                "v": _lin(sd, f"{p}.attention.attention.value"),
                "out": _lin(sd, f"{p}.attention.output.dense"),
                "norm2": _nrm(sd, f"{p}.layernorm_after"),
                "fc1": _lin(sd, f"{p}.intermediate.dense"),
                "fc2": _lin(sd, f"{p}.output.dense"),
            }
    else:
        raise ValueError(flavor)

    patch_w = _np(sd["embeddings.patch_embeddings.projection.weight"])  # (C,3,P,P)
    return {
        "cls_token": _np(sd["embeddings.cls_token"]).reshape(-1),
        "pos_embed": _np(sd["embeddings.position_embeddings"]).reshape(
            -1, cfg.hidden_size
        ),
        "patch_proj": {
            "w": np.ascontiguousarray(np.transpose(patch_w, (2, 3, 1, 0))),
            "b": _np(sd["embeddings.patch_embeddings.projection.bias"]),
        },
        "layers": stack(one),
        "final_norm": _nrm(sd, "layernorm"),
    }
