"""Full control-training step: on-device condition extraction -> trained
DINOv2 adapter -> control fusion -> CE loss.

Mirrors the reference control trainers (ref train_t2i_canny.py:147-218,
train_c2i_canny.py, train_t2i_hed.py) in one jitted function:
- the condition map is computed ON DEVICE from the raw image (canny via the
  XLA op; hed/lineart via frozen nets — the reference runs cv2 in dataloader
  workers and frozen torch nets in the trainer)
- the DINOv2/ViT adapter is part of the optimized parameters (the reference
  optimizes the whole model incl. adapter, train_t2i_canny.py:94)
- the t2i attention mask is built in-step from the compact (120,) emb_mask
  (ref builds a (1,1144,1144) host-side mask per sample and slices
  [:-1,:-1], t2i_control.py:134-139 + train_t2i_canny.py:165-167)
- caption & condition CFG dropout share drop_ids (ref gpt_t2i.py:421-427)
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from controlar_tpu.config import GPTConfig
from controlar_tpu.models import gpt as gpt_model
from controlar_tpu.models import vit as vit_model
from controlar_tpu.models import control_nets
from controlar_tpu.ops.canny import canny
from controlar_tpu.ops.resize import to_patch14
from controlar_tpu.train.optimizer import update_ema, zero_frozen_grads
from controlar_tpu.train.step import TrainState, _cast_bf16


def extract_condition_on_device(
    batch: Dict[str, jnp.ndarray],
    condition_type: str,
    frozen: Optional[Dict[str, Any]] = None,
) -> jnp.ndarray:
    """-> (B, H, W, 3) in [-1, 1]."""
    if "control_map" in batch:
        # pre-extracted condition maps (the ref c2i trainers train from
        # offline canny/depth .npy trees, dataset/imagenet.py:60-77)
        cm = batch["control_map"].astype(jnp.float32)
        cond = cm if cm.ndim == 4 else jnp.repeat(cm[..., None], 3, axis=-1)
        return 2.0 * (cond / 255.0 - 0.5)
    if condition_type == "canny":
        m = canny(batch["control_image"], 100, 200).astype(jnp.float32)
        cond = jnp.repeat(m[..., None], 3, axis=-1)
    elif condition_type == "hed":
        m = control_nets.hed_forward(
            frozen["hed"], batch["control_image"].astype(jnp.float32)
        )
        cond = jnp.repeat(m[..., None], 3, axis=-1)
    elif condition_type == "lineart":
        m = control_nets.lineart_forward(
            frozen["lineart"], batch["control_image"].astype(jnp.float32)
        ) * 255.0
        cond = jnp.repeat(m[..., None], 3, axis=-1)
    else:
        raise ValueError(condition_type)
    return 2.0 * (cond / 255.0 - 0.5)


def build_t2i_attn_mask(emb_mask: jnp.ndarray, code_len: int) -> jnp.ndarray:
    """(B, T_cls) bool -> (B, 1, T-1, T-1) bool where T = T_cls + code_len.

    tril, prefix columns gated by emb_mask, diagonal restored, then sliced by
    one (the model input drops the last token). This materialized form feeds
    the einsum parity path only; training passes `t2i_key_valid` so flash
    attention never builds a (T, T) tensor."""
    b, t_cls = emb_mask.shape
    t = t_cls + code_len
    rows = np.arange(t)[:, None]
    cols = np.arange(t)[None, :]
    causal = jnp.asarray(rows >= cols)
    colmask = jnp.concatenate(
        [emb_mask, jnp.ones((b, t - t_cls), dtype=bool)], axis=1
    )
    eye = jnp.asarray(rows == cols)
    m = causal[None] & (colmask[:, None, :] | eye[None])
    return m[:, None, : t - 1, : t - 1]


def t2i_key_valid(emb_mask: jnp.ndarray, code_len: int) -> jnp.ndarray:
    """Compact per-key column mask for the same semantics: (B, T-1) bool,
    caption columns gated by emb_mask, image columns always valid. The model
    applies causal & (key_valid | diagonal) — exactly build_t2i_attn_mask."""
    b, t_cls = emb_mask.shape
    return jnp.concatenate(
        [emb_mask, jnp.ones((b, code_len - 1), dtype=bool)], axis=1
    )


def make_control_train_step(
    gpt_cfg: GPTConfig,
    adapter_cfg: vit_model.ViTConfig,
    tx: optax.GradientTransformation,
    condition_type: str = "canny",
    frozen: Optional[Dict[str, Any]] = None,
    ema_decay: Optional[float] = None,
    compute_dtype=jnp.bfloat16,
    remat_policy: str = "full",
):
    """Params pytree: {'gpt': ..., 'adapter': ...} (both optimized).

    Batch fields:
      tokens (B, code_len) int32
      c2i: labels (B,)        t2i: caption_emb (B,120,2048) + emb_mask (B,120)
      control_image (B,H,W,3) uint8 raw RGB  OR  control_map (uint8 map)
      valid (B,) float
    """

    def loss_fn(params, batch, rng):
        p = _cast_bf16(params) if compute_dtype == jnp.bfloat16 else params
        gp, ap = p["gpt"], p["adapter"]
        tokens = batch["tokens"]
        b = tokens.shape[0]
        drop_rng, model_rng = jax.random.split(rng)
        drop_ids = jax.random.uniform(drop_rng, (b,)) < gpt_cfg.class_dropout_prob

        cond_img = extract_condition_on_device(batch, condition_type, frozen)
        feats = vit_model.vit_forward(
            ap, adapter_cfg,
            to_patch14(cond_img, condition_type).astype(compute_dtype),
            remat=(remat_policy if remat_policy != "none" else False),
        )
        cond_tokens = gpt_model.control_tokens(gp, gpt_cfg, feats, drop_ids)

        key_valid = None
        if gpt_cfg.model_type == "c2i":
            labels = jnp.where(drop_ids, gpt_cfg.num_classes, batch["labels"])
            prefix = gpt_model.embed_prefix_c2i(gp, labels)
        else:
            cap = batch["caption_emb"].astype(compute_dtype)
            uncond = gp["cls_embedding"]["uncond_embedding"].astype(compute_dtype)
            cap = jnp.where(drop_ids[:, None, None], uncond[None, : cap.shape[1]], cap)
            prefix = gpt_model.embed_prefix_t2i(gp, cap)[:, : gpt_cfg.cls_token_num]
            key_valid = t2i_key_valid(batch["emb_mask"], tokens.shape[1])

        _, loss = gpt_model.forward_train(
            gp,
            gpt_cfg,
            prefix.astype(compute_dtype),
            tokens[:, :-1],
            cond_tokens=cond_tokens,
            key_valid=key_valid,
            targets=tokens,
            valid=batch.get("valid"),
            rng=model_rng,
            deterministic=False,
            remat_policy=remat_policy,
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
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state,
                       ema_params=ema),
            {"loss": loss, "grad_norm": optax.global_norm(grads)},
        )

    return train_step
