"""Parameter/activation partition specs for the GPT decoder.

Covers the reference's three distributed modes in one scheme
(ref SURVEY.md §2.10):
- DP (DDP, ref train_*.py): batch sharded over ('data','fsdp'); XLA psums grads.
- FSDP/ZeRO (ref train_c2i_fsdp.py): parameters sharded over 'fsdp'
  (all-gathered per layer by XLA, grads reduce-scattered).
- TP (megatron-style, properly sharded unlike the reference's scaffolding-only
  TP, serve/gpt_model.py:138-139): attention heads and FFN hidden dim split
  over 'tp' — wqkv/w1/w3 column-parallel, wo/w2 row-parallel.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from controlar_tpu.config import GPTConfig


def gpt_param_specs(cfg: GPTConfig) -> Dict[str, Any]:
    """PartitionSpec pytree matching init_gpt_params' structure.

    Layer weights carry a leading L axis (scanned), kept unsharded.
    """
    layers = {
        "attention_norm": P(None, None),
        "ffn_norm": P(None, None),
        "wqkv": P(None, "fsdp", "tp"),
        "wo": P(None, "tp", "fsdp"),
        "w1": P(None, "fsdp", "tp"),
        "w3": P(None, "fsdp", "tp"),
        "w2": P(None, "tp", "fsdp"),
    }
    if cfg.model_type == "c2i":
        cls_embedding = {"embedding": P(None, "fsdp")}
    else:
        cls_embedding = {
            "fc1": P("fsdp", "tp"),
            "fc2": P("tp", "fsdp"),
            "uncond_embedding": P(None, None),
        }
    return {
        "tok_embeddings": P("tp", "fsdp"),
        "cls_embedding": cls_embedding,
        "adapter_mlp": {"fc1": P("fsdp", "tp"), "fc2": P("tp", "fsdp")},
        "condition_mlp": {"fc1": P("fsdp", "tp"), "fc2": P("tp", "fsdp")},
        "condition_layers": {"fc1": P(None, "fsdp", "tp"), "fc2": P(None, "tp", "fsdp")},
        "layers": layers,
        "norm": P(None),
        "output": P("fsdp", "tp"),
    }


def vit_param_specs(vit_params) -> Dict[str, Any]:
    """Partition specs for the control-encoder ViT (structure-driven:
    shard the two biggest axes of each stacked linear over fsdp/tp)."""
    def spec(path, p):
        k = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        parent = path[-2].key if len(path) > 1 and hasattr(path[-2], "key") else ""
        if parent in ("q", "k", "v", "out", "fc1", "fc2") and k == "w":
            return P(None, "fsdp", "tp") if parent in ("q", "k", "v", "fc1") else P(None, "tp", "fsdp")
        return P(*([None] * p.ndim))

    return jax.tree_util.tree_map_with_path(spec, vit_params)


def control_train_specs(params, cfg: GPTConfig) -> Dict[str, Any]:
    """Specs for the full {'gpt', 'adapter'} training pytree."""
    return {
        "gpt": gpt_param_specs(cfg),
        "adapter": vit_param_specs(params["adapter"]),
    }


def batch_spec() -> P:
    """Data batch: sharded over both data-parallel axes."""
    return P(("data", "fsdp"))


def shard_params(params, mesh: Mesh, cfg: GPTConfig):
    """Place a param pytree onto the mesh with the training shardings."""
    specs = gpt_param_specs(cfg)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def mesh_active() -> bool:
    """True iff tracing/running under an active (data, fsdp, tp) mesh."""
    mesh = jax.sharding.get_abstract_mesh()
    return (not mesh.empty) and "data" in mesh.axis_names


def constrain_batch(x):
    """with_sharding_constraint(P(("data","fsdp"), None...)) iff a (data,
    fsdp, tp) mesh is active; no-op otherwise (single-device paths).

    Used on batch-major activations whose BACKWARD cotangents XLA would
    otherwise reshard through an involuntary full rematerialization (the
    transpose of a sharding constraint applies the same constraint to the
    cotangent, pinning both directions to batch sharding).
    """
    mesh = jax.sharding.get_abstract_mesh()
    if mesh.empty or "data" not in mesh.axis_names:
        return x
    spec = P(*([("data", "fsdp")] + [None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, spec)
