"""Optimizer: AdamW with the reference's weight-decay split + grad clipping.

(ref creat_optimizer, autoregressive/train/train_c2i.py:28-50: decay applies
only to params with ndim >= 2; betas (0.9, 0.95) per trainer args; global-norm
grad clip per --max-grad-norm.)
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

# Reference semantics on *unstacked* tensors: norm weights are 1-D -> no decay.
# Our per-layer norms are stacked to (L, dim), so the rule is keyed by name.
_NO_DECAY_KEYS = {"attention_norm", "ffn_norm", "norm", "uncond_embedding"}

# torch buffers in the reference (state_dict but never optimized):
# CaptionEmbedder.uncond_embedding is register_buffer'd (gpt_t2i.py:140).
_FROZEN_KEYS = {"uncond_embedding"}


def _leaf_key(path) -> str:
    k = path[-1]
    return getattr(k, "key", getattr(k, "name", str(k)))


def decay_mask(params) -> Any:
    """True for parameters that receive weight decay."""
    return jax.tree_util.tree_map_with_path(
        lambda path, p: p.ndim >= 2 and _leaf_key(path) not in _NO_DECAY_KEYS,
        params,
    )


def frozen_mask(params) -> Any:
    """True for leaves that must not be updated (reference buffers)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, p: _leaf_key(path) in _FROZEN_KEYS, params
    )


def zero_frozen_grads(grads):
    return jax.tree_util.tree_map_with_path(
        lambda path, g: jnp.zeros_like(g) if _leaf_key(path) in _FROZEN_KEYS else g,
        grads,
    )


def step_lr(lr: float, decay_every_steps: int, gamma: float = 0.9) -> optax.Schedule:
    """torch StepLR equivalent: lr * gamma^(step // decay_every_steps).

    The reference's seg trainer decays per epoch with gamma=0.9 (ref
    autoregressive/train/train_t2i_seg.py, StepLR(optimizer, 1, 0.9) applied
    each epoch); callers pass decay_every_steps = steps per epoch.
    """
    return optax.exponential_decay(
        init_value=lr,
        transition_steps=decay_every_steps,
        decay_rate=gamma,
        staircase=True,
    )


def make_optimizer(
    lr: float = 1e-4,
    weight_decay: float = 5e-2,
    beta1: float = 0.9,
    beta2: float = 0.95,
    max_grad_norm: float = 1.0,
    lr_schedule: "optax.Schedule | None" = None,
) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(
            learning_rate=lr_schedule if lr_schedule is not None else lr,
            b1=beta1,
            b2=beta2,
            weight_decay=weight_decay,
            mask=decay_mask,
        ),
    )
    return tx


def update_ema(ema_params, params, decay: float = 0.9999):
    """EMA of parameters (ref utils/ema.py:4-14)."""
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params)
