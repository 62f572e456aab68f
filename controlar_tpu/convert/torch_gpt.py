"""PyTorch -> JAX weight conversion for the GPT decoder family.

Maps the reference checkpoints' state dicts (ref key layout:
autoregressive/models/gpt_t2i.py:310-370, gpt.py:306-360; load formats per
sample_c2i.py:59-77: 'model' / 'module' / 'state_dict' wrappers, safetensors)
onto the controlar_tpu functional param pytree. Linear weights are transposed
to (in, out).
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from controlar_tpu.config import GPTConfig


def _t(x) -> np.ndarray:
    """torch (out, in) linear weight -> (in, out)."""
    return np.ascontiguousarray(np.asarray(x).T)


def _a(x) -> np.ndarray:
    return np.asarray(x)


def unwrap_state_dict(ckpt: Mapping) -> Mapping:
    """Unwrap the reference's checkpoint containers (ref sample_c2i.py:66-77)."""
    for key in ("model", "module", "state_dict"):
        if key in ckpt and isinstance(ckpt[key], Mapping):
            return ckpt[key]
    return ckpt


def convert_gpt_state_dict(
    sd: Mapping[str, "np.ndarray"], cfg: GPTConfig, init_rng_seed: int = 0
) -> Dict:
    """Convert a torch state_dict (tensors or ndarrays) to the param pytree.

    Adapter weights (`adapter.*`, the DINOv2/ViT control encoder) are handled
    by their own converters and skipped here. `condition_embeddings` and
    `condition_norm` exist in checkpoints but are dead in the reference
    forward pass; they are ignored.

    Base LlamaGen checkpoints (the documented fine-tune init,
    TrainerConfig.gpt_ckpt) lack the ControlAR modules (adapter_mlp,
    condition_mlp, condition_layers); those fall back to freshly initialized
    values drawn with `init_rng_seed`, matching starting a control fine-tune
    from the base model as the reference does.
    """
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in sd.items()}
    L = cfg.n_layer

    fresh = None

    def _get(key: str, transpose: bool = True):
        """Fetch a control-module weight, falling back to fresh init."""
        nonlocal fresh
        if key in sd:
            return _t(sd[key]) if transpose else _a(sd[key])
        if fresh is None:
            import jax
            from controlar_tpu.models.gpt import init_gpt_params

            fresh = jax.tree_util.tree_map(
                np.asarray,
                init_gpt_params(jax.random.PRNGKey(init_rng_seed), cfg),
            )
        node = fresh
        parts = key.replace("cap_proj.", "").replace(".weight", "").split(".")
        # condition_layers.{i}.fcN -> fresh["condition_layers"]["fcN"][i]
        if parts[0] == "condition_layers":
            return node["condition_layers"][parts[2]][int(parts[1])]
        for p in parts:
            node = node[p]
        return node

    layers = {
        "attention_norm": np.stack([_a(sd[f"layers.{i}.attention_norm.weight"]) for i in range(L)]),
        "ffn_norm": np.stack([_a(sd[f"layers.{i}.ffn_norm.weight"]) for i in range(L)]),
        "wqkv": np.stack([_t(sd[f"layers.{i}.attention.wqkv.weight"]) for i in range(L)]),
        "wo": np.stack([_t(sd[f"layers.{i}.attention.wo.weight"]) for i in range(L)]),
        "w1": np.stack([_t(sd[f"layers.{i}.feed_forward.w1.weight"]) for i in range(L)]),
        "w3": np.stack([_t(sd[f"layers.{i}.feed_forward.w3.weight"]) for i in range(L)]),
        "w2": np.stack([_t(sd[f"layers.{i}.feed_forward.w2.weight"]) for i in range(L)]),
    }

    if cfg.model_type == "c2i":
        cls_embedding = {"embedding": _a(sd["cls_embedding.embedding_table.weight"])}
    else:
        cls_embedding = {
            "fc1": _t(sd["cls_embedding.cap_proj.fc1.weight"]),
            "fc2": _t(sd["cls_embedding.cap_proj.fc2.weight"]),
            "uncond_embedding": _a(sd["cls_embedding.uncond_embedding"]),
        }

    params = {
        "tok_embeddings": _a(sd["tok_embeddings.weight"]),
        "cls_embedding": cls_embedding,
        "adapter_mlp": {
            "fc1": _get("adapter_mlp.fc1.weight"),
            "fc2": _get("adapter_mlp.fc2.weight"),
        },
        "condition_mlp": {
            "fc1": _get("condition_mlp.cap_proj.fc1.weight"),
            "fc2": _get("condition_mlp.cap_proj.fc2.weight"),
        },
        "condition_layers": {
            "fc1": np.stack([_get(f"condition_layers.{i}.fc1.weight") for i in range(3)]),
            "fc2": np.stack([_get(f"condition_layers.{i}.fc2.weight") for i in range(3)]),
        },
        "layers": layers,
        "norm": _a(sd["norm.weight"]),
        "output": _t(sd["output.weight"]),
    }
    return params
