"""HF DPTForDepthEstimation state_dict -> controlar_tpu DPT params."""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from controlar_tpu.models.dpt import DPTConfig


def _np(v):
    return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)


def _lin(sd, p):
    return {"w": np.ascontiguousarray(_np(sd[f"{p}.weight"]).T),
            "b": _np(sd[f"{p}.bias"])}


def _nrm(sd, p):
    return {"scale": _np(sd[f"{p}.weight"]), "bias": _np(sd[f"{p}.bias"])}


def _conv(sd, p, bias=True):
    w = _np(sd[f"{p}.weight"])
    out = {"w": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))}
    if bias:
        out["b"] = _np(sd[f"{p}.bias"])
    return out


def _conv_t(sd, p):
    w = _np(sd[f"{p}.weight"])  # (I, O, KH, KW)
    w = np.flip(w, axis=(2, 3))
    return {"w": np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))),
            "b": _np(sd[f"{p}.bias"])}


def convert_dpt_state_dict(sd: Mapping, cfg: DPTConfig) -> Dict:
    sd = {k: _np(v) for k, v in sd.items()}
    L = cfg.n_layer

    def layer(i):
        p = f"dpt.encoder.layer.{i}"
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

    layers = {}
    l0 = layer(0)
    for k in l0:
        if isinstance(l0[k], dict):
            layers[k] = {
                kk: np.stack([layer(i)[k][kk] for i in range(L)]) for kk in l0[k]
            }

    reassemble = []
    for i, f in enumerate(cfg.reassemble_factors):
        p = f"neck.reassemble_stage"
        blk = {
            "readout": _lin(sd, f"{p}.readout_projects.{i}.0"),
            "projection": _conv(sd, f"{p}.layers.{i}.projection"),
        }
        if f > 1:
            blk["resize"] = _conv_t(sd, f"{p}.layers.{i}.resize")
        elif f < 1:
            blk["resize"] = _conv(sd, f"{p}.layers.{i}.resize")
        reassemble.append(blk)

    fusion = []
    for i in range(len(cfg.neck_hidden_sizes)):
        p = f"neck.fusion_stage.layers.{i}"
        fusion.append({
            "projection": _conv(sd, f"{p}.projection"),
            "res1": {
                "conv1": _conv(sd, f"{p}.residual_layer1.convolution1"),
                "conv2": _conv(sd, f"{p}.residual_layer1.convolution2"),
            },
            "res2": {
                "conv1": _conv(sd, f"{p}.residual_layer2.convolution1"),
                "conv2": _conv(sd, f"{p}.residual_layer2.convolution2"),
            },
        })

    patch_w = _np(sd["dpt.embeddings.patch_embeddings.projection.weight"])
    return {
        "cls_token": _np(sd["dpt.embeddings.cls_token"]).reshape(-1),
        "pos_embed": _np(sd["dpt.embeddings.position_embeddings"]).reshape(
            -1, cfg.hidden_size
        ),
        "patch_proj": {
            "w": np.ascontiguousarray(np.transpose(patch_w, (2, 3, 1, 0))),
            "b": _np(sd["dpt.embeddings.patch_embeddings.projection.bias"]),
        },
        "layers": layers,
        "reassemble": reassemble,
        "neck_convs": [
            _conv(sd, f"neck.convs.{i}", bias=False)
            for i in range(len(cfg.neck_hidden_sizes))
        ],
        "fusion": fusion,
        "head": {
            "conv1": _conv(sd, "head.head.0"),
            "conv2": _conv(sd, "head.head.2"),
            "conv3": _conv(sd, "head.head.4"),
        },
    }
