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


def _map_adam_states(state, fn):
    """Apply `fn` to every ScaleByAdamState inside a (possibly nested) optax
    state tree, rebuilding the surrounding NamedTuple/tuple/list/dict
    containers unchanged. Scoping the cast to Adam moments keeps any other
    float tensor state (schedules, future chain elements) at full precision."""
    def rec(s):
        if isinstance(s, optax.ScaleByAdamState):
            return fn(s)
        if isinstance(s, tuple):
            vals = [rec(x) for x in s]
            return type(s)(*vals) if hasattr(s, "_fields") else tuple(vals)
        if isinstance(s, list):
            return [rec(x) for x in s]
        if isinstance(s, dict):
            return {k: rec(v) for k, v in s.items()}
        return s

    return rec(state)


def _cast_adam_moments(state, from_dtype, to_dtype):
    def cast_leaf(x):
        if hasattr(x, "dtype") and x.dtype == from_dtype:
            return x.astype(to_dtype)
        return x

    def cast_adam(s):
        return s._replace(mu=jax.tree.map(cast_leaf, s.mu),
                          nu=jax.tree.map(cast_leaf, s.nu))

    return _map_adam_states(state, cast_adam)


def with_state_dtype(
    tx: optax.GradientTransformation, dtype
) -> optax.GradientTransformation:
    """Store Adam's mu/nu moment tensors in `dtype` (other state untouched).

    Adam's mu/nu dominate trainer memory at large sizes (GPT-XL 775M: 6.2 GB
    of fp32 moments; the fp32 state was the single-chip OOM driver for XL-512
    training). bf16 keeps fp32's exponent range, so nu (a running mean of g²,
    strictly positive with huge dynamic range) stays well-conditioned; the
    8-bit mantissa costs <1e-2 relative noise per moment read — the update
    itself still runs in fp32 (cast up, apply, cast back down).
    """
    dtype = jnp.dtype(dtype)

    def init(params):
        return _cast_adam_moments(tx.init(params), jnp.float32, dtype)

    def update(updates, state, params=None):
        state32 = _cast_adam_moments(state, dtype, jnp.float32)
        updates, new_state = tx.update(updates, state32, params)
        return updates, _cast_adam_moments(new_state, jnp.float32, dtype)

    return optax.GradientTransformation(init, update)


def make_optimizer(
    lr: float = 1e-4,
    weight_decay: float = 5e-2,
    beta1: float = 0.9,
    beta2: float = 0.95,
    max_grad_norm: float = 1.0,
    lr_schedule: "optax.Schedule | None" = None,
    state_dtype: "str | None" = None,
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
    if state_dtype is not None and jnp.dtype(state_dtype) != jnp.float32:
        tx = with_state_dtype(tx, jnp.dtype(state_dtype))
    return tx


def update_ema(ema_params, params, decay: float = 0.9999):
    """EMA of parameters (ref utils/ema.py:4-14)."""
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params)
