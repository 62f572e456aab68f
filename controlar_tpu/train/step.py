"""Jitted, sharded train step for c2i/t2i control fine-tuning.

One step function replaces the reference's 12 trainer scripts' inner loops
(ref train_t2i_canny.py:147-218, train_c2i.py:160-230): bf16 forward (params
kept fp32, cast at use — the autocast equivalent), CE loss with `valid`
masking, shared caption<->condition CFG dropout (ref gpt_t2i.py:421-427),
global-norm clip, AdamW update, optional EMA.

Sharding: donate the state; params sharded per parallel/sharding.py; batch
sharded over ('data','fsdp'). XLA inserts DP psums / FSDP gathers / TP
collectives.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from controlar_tpu.config import GPTConfig
from controlar_tpu.models import gpt as gpt_model
from controlar_tpu.train.optimizer import update_ema, zero_frozen_grads


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any = None  # optional


def init_train_state(
    rng: jax.Array,
    cfg: GPTConfig,
    tx: optax.GradientTransformation,
    params: Optional[Any] = None,
    use_ema: bool = False,
) -> TrainState:
    if params is None:
        params = gpt_model.init_gpt_params(rng, cfg, dtype=jnp.float32)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if use_ema else None,
    )


def _cast_bf16(params):
    return jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, params
    )


def make_train_step(
    cfg: GPTConfig,
    tx: optax.GradientTransformation,
    ema_decay: Optional[float] = None,
    compute_dtype=jnp.bfloat16,
):
    """Build the jitted train step.

    Batch dict fields:
      c2i: labels (B,)           t2i: caption_emb (B, T_cls, caption_dim)
      tokens (B, block_size) ground-truth VQ codes
      adapter_features (B, block_size, adapter_dim) or absent (no control)
      attn_mask (B, 1, T, T) bool (einsum path) or key_valid (B, T) bool
      (flash path) or absent
      valid (B,) float or absent
    """

    def loss_fn(params, batch, rng):
        p = _cast_bf16(params) if compute_dtype == jnp.bfloat16 else params
        tokens = batch["tokens"]
        b = tokens.shape[0]
        drop_rng, model_rng = jax.random.split(rng)
        drop_ids = (
            jax.random.uniform(drop_rng, (b,)) < cfg.class_dropout_prob
        )

        if cfg.model_type == "c2i":
            labels = batch["labels"]
            # CFG dropout replaces the label with the null class row
            # (ref LabelEmbedder.token_drop: gpt_t2i.py:78-87)
            labels = jnp.where(drop_ids, cfg.num_classes, labels)
            prefix = gpt_model.embed_prefix_c2i(p, labels)
        else:
            cap = batch["caption_emb"].astype(compute_dtype)
            uncond = p["cls_embedding"]["uncond_embedding"].astype(compute_dtype)
            cap = jnp.where(drop_ids[:, None, None], uncond[None, : cap.shape[1]], cap)
            prefix = gpt_model.embed_prefix_t2i(p, cap)[:, : cfg.cls_token_num]

        cond_tokens = None
        if "adapter_features" in batch:
            cond_tokens = gpt_model.control_tokens(
                p, cfg, batch["adapter_features"].astype(compute_dtype), drop_ids
            )

        logits, loss = gpt_model.forward_train(
            p,
            cfg,
            prefix.astype(compute_dtype),
            tokens[:, :-1],
            cond_tokens=cond_tokens,
            mask=batch.get("attn_mask"),
            key_valid=batch.get("key_valid"),
            targets=tokens,
            valid=batch.get("valid"),
            rng=model_rng,
            deterministic=False,
        )
        return loss

    def train_step(state: TrainState, batch: Dict, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        grads = zero_frozen_grads(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None and ema_decay is not None:
            ema = update_ema(ema, params, ema_decay)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, ema_params=ema
        )
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    return train_step
