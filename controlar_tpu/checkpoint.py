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


def load_gpt_checkpoint(path: str, cfg) -> Dict[str, Any]:
    from controlar_tpu.convert.torch_gpt import convert_gpt_state_dict

    return convert_gpt_state_dict(load_torch_file(path), cfg)


def load_vq_checkpoint(path: str, cfg) -> Dict[str, Any]:
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
