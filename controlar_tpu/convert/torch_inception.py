"""Convert the pytorch-fid InceptionV3 checkpoint to the JAX param tree.

Source checkpoint: mseitzer/pytorch-fid `pt_inception-2015-12-05-*.pth`
(the TTUR conversion of the frozen TF graph the reference evaluator downloads,
ref evaluations/c2i/evaluator.py:20-21). State-dict keys follow torchvision's
inception_v3 module paths (`Mixed_5b.branch5x5_1.conv.weight`, ...); our tree
mirrors them, so conversion is a mechanical walk of eval/inception.SPEC.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

from controlar_tpu.eval.inception import NUM_LOGITS, POOL_DIM, SPEC, iter_conv_paths


def convert_inception_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """sd: torch state dict (tensors or numpy). Returns the JAX param tree."""
    def npy(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    tree: Dict[str, Any] = {}
    for path, (cin, cout, kh, kw) in iter_conv_paths():
        w = npy(sd[f"{path}.conv.weight"])  # torch OIHW
        assert w.shape == (cout, cin, kh, kw), (path, w.shape)
        leaf = {
            "w": np.transpose(w, (2, 3, 1, 0)),  # -> HWIO
            "bn_scale": npy(sd[f"{path}.bn.weight"]),
            "bn_bias": npy(sd[f"{path}.bn.bias"]),
            "bn_mean": npy(sd[f"{path}.bn.running_mean"]),
            "bn_var": npy(sd[f"{path}.bn.running_var"]),
        }
        node = tree
        parts = path.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf

    fc_w = npy(sd["fc.weight"])
    assert fc_w.shape == (NUM_LOGITS, POOL_DIM), fc_w.shape
    tree["fc"] = {
        "w": fc_w.T,
        "b": npy(sd["fc.bias"]) if "fc.bias" in sd else np.zeros(NUM_LOGITS),
    }
    return tree


def load_torch_inception(path: str) -> Dict[str, Any]:
    """Load a pytorch-fid .pth checkpoint into the JAX tree."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return convert_inception_state_dict(sd)


def export_inception_state_dict(params: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse walk (JAX tree -> torch-named numpy dict) — used by tests to
    exercise the converter without a released checkpoint on disk."""
    sd: Dict[str, Any] = {}
    for path, _ in iter_conv_paths():
        node = params
        for p in path.split("."):
            node = node[p]
        sd[f"{path}.conv.weight"] = np.transpose(np.asarray(node["w"]), (3, 2, 0, 1))
        sd[f"{path}.bn.weight"] = np.asarray(node["bn_scale"])
        sd[f"{path}.bn.bias"] = np.asarray(node["bn_bias"])
        sd[f"{path}.bn.running_mean"] = np.asarray(node["bn_mean"])
        sd[f"{path}.bn.running_var"] = np.asarray(node["bn_var"])
    sd["fc.weight"] = np.asarray(params["fc"]["w"]).T
    sd["fc.bias"] = np.asarray(params["fc"]["b"])
    return sd
