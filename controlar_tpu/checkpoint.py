"""Checkpointing: orbax for native training state, loaders for the reference
model zoo.

Covers the reference's checkpoint surface (ref SURVEY.md §2.12):
- GPT .pt files with 'model' / 'module' / 'state_dict' wrappers or raw
  consolidated FSDP dicts (ref sample_c2i.py:59-77)
- .safetensors releases loaded strict=False (ref sample_t2i.py:64-69)
- VQ .pt with {'model': sd} (ref sample_t2i.py:48-49)
- native training state via orbax (sharded-aware save/restore + EMA)
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np


# ---------------------------------------------------------------------------
# Reference-zoo loaders (host-side; torch only needed when loading .pt)
# ---------------------------------------------------------------------------

def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Load a .pt/.pth or .safetensors file to a flat numpy state dict."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    from controlar_tpu.convert.torch_gpt import unwrap_state_dict

    sd = unwrap_state_dict(ckpt) if isinstance(ckpt, dict) else ckpt
    return {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in sd.items()}


def load_native_checkpoint(path: str) -> Dict[str, Any]:
    """Load a NATIVE checkpoint: a .npz param dump (tools.export_params_npz)
    or an orbax training directory (a step_XXXXXXXX dir, or a results dir
    containing them — the latest step wins). Returns the raw pytree; orbax
    TrainStates keep their {step, params, ...} structure."""
    if path.endswith(".npz"):
        from controlar_tpu.tools import import_params_npz

        return import_params_npz(path)
    import orbax.checkpoint as ocp

    p = os.path.abspath(path)
    if not os.path.basename(p).startswith("step_"):
        sub = os.path.join(p, "checkpoints")
        if os.path.isdir(sub):
            p = sub
        steps = sorted(d for d in os.listdir(p) if d.startswith("step_"))
        if steps:
            p = os.path.join(p, steps[-1])
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(p)


def native_gpt_params(tree: Dict[str, Any]):
    """Pull GPT params out of a native checkpoint tree (TrainState, EMA-first
    when present, or a bare param tree)."""
    params = tree.get("ema_params") or tree.get("params") or tree
    if isinstance(params, dict) and "gpt" in params:
        return params["gpt"]
    return params


def _is_native(path: str) -> bool:
    return path.endswith(".npz") or os.path.isdir(path)


def load_gpt_checkpoint(path: str, cfg) -> Dict[str, Any]:
    if _is_native(path):
        return native_gpt_params(load_native_checkpoint(path))
    from controlar_tpu.convert.torch_gpt import convert_gpt_state_dict

    return convert_gpt_state_dict(load_torch_file(path), cfg)


def load_vq_checkpoint(path: str, cfg) -> Dict[str, Any]:
    if _is_native(path):
        tree = load_native_checkpoint(path)
        # VQTrainState keys (train/vq_step.py); EMA-first like the GPT side
        if isinstance(tree, dict):
            for key in ("ema_params", "vq_params", "params"):
                if tree.get(key) is not None:
                    return tree[key]
        return tree
    from controlar_tpu.convert.torch_vq import convert_vq_state_dict

    return convert_vq_state_dict(load_torch_file(path), cfg)


# ---------------------------------------------------------------------------
# Native (orbax) checkpointing for training
# ---------------------------------------------------------------------------

def save_train_state(ckpt_dir: str, state, step: Optional[int] = None) -> str:
    """Save a TrainState pytree with orbax. Returns the checkpoint path."""
    import orbax.checkpoint as ocp

    step = int(state.step) if step is None else step
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state)
    return path


def restore_train_state(path: str, abstract_state):
    """Restore into the sharding/structure of `abstract_state`
    (e.g. jax.eval_shape of init + shardings)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), abstract_state)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("step_"))
    return os.path.join(ckpt_dir, steps[-1]) if steps else None
