"""LPIPS weights: torchvision VGG16 + lin-head checkpoint -> JAX pytree.

(ref tokenizer/tokenizer_image/lpips.py:53-75: torchvision vgg16 features +
'vgg_lpips' lin weights from the taming-transformers release.)
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from controlar_tpu.models.lpips import VGG_SLICES


def _np(v):
    return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)


def convert_lpips_state_dicts(vgg_sd: Mapping, lin_sd: Mapping) -> Dict:
    """vgg_sd: torchvision vgg16 state_dict ('features.{i}.weight'...);
    lin_sd: the lpips checkpoint ('lin{k}.model.1.weight' 1x1 convs)."""
    vgg_sd = {k: _np(v) for k, v in vgg_sd.items()}
    lin_sd = {k: _np(v) for k, v in lin_sd.items()}
    convs = {}
    for sl in VGG_SLICES:
        for ci in sl:
            w = vgg_sd[f"features.{ci}.weight"]
            convs[str(ci)] = {
                "w": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0))),
                "b": vgg_sd[f"features.{ci}.bias"],
            }
    lins = []
    for k in range(5):
        w = lin_sd[f"lin{k}.model.1.weight"]  # (1, C, 1, 1)
        lins.append({"w": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))})
    return {"vgg": convs, "lins": lins}
