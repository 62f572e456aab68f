"""Multiscale (arbitrary-resolution) control training.

The reference's multiscale trainers intend to sample a random (H, W) from
{384..1024 step 16}^2 under a (H/16)*(W/16) <= 2304 token budget and resize
each batch, VQ-encoding on the fly — but their guard is trivially false so
resolution stays fixed (ref train_t2i_hed_multiscale.py:42-56; SURVEY.md
§2.6). This implements the intent:

- `sample_bucket` draws a budget-respecting (H, W) per step
- the train step VQ-encodes the resized batch on device (frozen tokenizer,
  ref :202-208 region), builds the rect-RoPE config for that bucket, and
  runs the control step; jit caches one executable per bucket shape, so
  restrict the bucket set (SURVEY.md §7.7).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from controlar_tpu.config import GPTConfig, VQConfig
from controlar_tpu.models import gpt as gpt_model
from controlar_tpu.models import vit as vit_model
from controlar_tpu.models import vq as vq_model
from controlar_tpu.ops.resize import to_patch14
from controlar_tpu.train.control_step import (
    extract_condition_on_device,
    t2i_key_valid,
)
from controlar_tpu.train.optimizer import update_ema, zero_frozen_grads
from controlar_tpu.train.step import TrainState, _cast_bf16


def resolution_buckets(
    min_px: int = 384, max_px: int = 1024, step: int = 64,
    max_tokens: int = 2304, downsample: int = 16,
) -> List[Tuple[int, int]]:
    """Budget-respecting (H, W) bucket set. The reference intent uses step
    16; a 64px step keeps the compiled-executable count manageable
    (SURVEY.md §7.7)."""
    out = []
    for h in range(min_px, max_px + 1, step):
        for w in range(min_px, max_px + 1, step):
            if (h // downsample) * (w // downsample) <= max_tokens:
                out.append((h, w))
    return out


def sample_bucket(rng: np.random.Generator, buckets: List[Tuple[int, int]]):
    return buckets[int(rng.integers(0, len(buckets)))]


def make_multiscale_train_step(
    gpt_cfg: GPTConfig,
    adapter_cfg: vit_model.ViTConfig,
    vq_cfg: VQConfig,
    tx: optax.GradientTransformation,
    condition_type: str = "hed",
    frozen: Optional[Dict[str, Any]] = None,
    ema_decay: Optional[float] = None,
    compute_dtype=jnp.bfloat16,
):
    """Batch fields: images (B,H,W,3) in [-1,1] at the step's bucket size,
    caption_emb (B,120,D), emb_mask (B,120), valid (B,).
    vq_params rides `frozen['vq']` (never optimized). Shapes vary per bucket;
    jit (applied by the caller) compiles per bucket."""

    def loss_fn(params, batch, rng):
        p = _cast_bf16(params) if compute_dtype == jnp.bfloat16 else params
        gp, ap = p["gpt"], p["adapter"]
        images = batch["images"]
        b, h, w, _ = images.shape
        gh, gw = h // vq_cfg.downsample_factor, w // vq_cfg.downsample_factor
        cfg = gpt_cfg.with_resolution(gh, gw)

        # online VQ encode (frozen tokenizer, stop-grad codes)
        _, codes = vq_model.encode(frozen["vq"], vq_cfg, images)
        tokens = jax.lax.stop_gradient(codes.reshape(b, gh * gw))

        drop_rng, model_rng = jax.random.split(rng)
        drop_ids = jax.random.uniform(drop_rng, (b,)) < cfg.class_dropout_prob

        cond_batch = {"control_image": ((images + 1.0) * 127.5).astype(jnp.uint8)}
        cond_img = extract_condition_on_device(cond_batch, condition_type, frozen)
        feats = vit_model.vit_forward(
            ap, adapter_cfg, to_patch14(cond_img, condition_type).astype(compute_dtype)
        )
        cond_tokens = gpt_model.control_tokens(gp, cfg, feats, drop_ids)

        cap = batch["caption_emb"].astype(compute_dtype)
        uncond = gp["cls_embedding"]["uncond_embedding"].astype(compute_dtype)
        cap = jnp.where(drop_ids[:, None, None], uncond[None, : cap.shape[1]], cap)
        prefix = gpt_model.embed_prefix_t2i(gp, cap)[:, : cfg.cls_token_num]
        key_valid = t2i_key_valid(batch["emb_mask"], tokens.shape[1])

        _, loss = gpt_model.forward_train(
            gp, cfg, prefix.astype(compute_dtype), tokens[:, :-1],
            cond_tokens=cond_tokens, key_valid=key_valid, targets=tokens,
            valid=batch.get("valid"), rng=model_rng, deterministic=False,
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
