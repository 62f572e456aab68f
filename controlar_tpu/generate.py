"""CFG decode loop (ref: autoregressive/models/generate.py:85-204), TPU-native.

Design: one jitted program per (batch, prefix-len, new-token) bucket containing
prefill + a `lax.scan` over decode steps with in-graph sampling. Nothing syncs
with the host per token (the reference calls torch.multinomial every step,
generate.py:71 — the main latency loser it needed CUDA graphs to paper over).

CFG batching matches the reference: the conditional and unconditional branches
ride one 2B batch; logits are split and mixed `uncond + (cond-uncond)*scale`
(ref generate.py:89-90). `cfg_interval` disables CFG after N steps by switching
the effective scale to 1 (equivalent to taking the cond logits, ref
generate.py:104-107,121-122).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from controlar_tpu.config import GPTConfig, find_multiple
from controlar_tpu import decode as decode_engine
from controlar_tpu.models import gpt as gpt_model
from controlar_tpu.ops.sampling import top_k_top_p_filter


def _sample_from(rng, logits, temperature, top_k, top_p, sample_logits):
    logits = logits.astype(jnp.float32) / max(temperature, 1e-5)
    if top_k > 0 or top_p < 1.0:
        logits = top_k_top_p_filter(logits, top_k=top_k, top_p=top_p)
    if sample_logits:
        return jax.random.categorical(rng, logits, axis=-1)
    return jnp.argmax(logits, axis=-1)


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_new_tokens", "cfg_scale", "cfg_interval",
        "temperature", "top_k", "top_p", "sample_logits", "cache_dtype",
        "use_flash", "kv_stacked",
    ),
    donate_argnums=(),
)
def generate_tokens(
    params,
    cfg: GPTConfig,
    prefix_emb: jnp.ndarray,
    fused3: Optional[jnp.ndarray],
    col_mask: Optional[jnp.ndarray],
    rng: jax.Array,
    control_strength: jnp.ndarray | float = 1.0,
    *,
    max_new_tokens: int,
    cfg_scale: float = 1.0,
    cfg_interval: int = -1,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    sample_logits: bool = True,
    cache_dtype=jnp.bfloat16,
    use_flash: bool = False,
    kv_stacked: bool = False,
) -> jnp.ndarray:
    """Generate image tokens. All CFG doubling must be done by the caller
    (prefix_emb/fused3/col_mask carry the [cond; uncond] 2B batch when
    cfg_scale > 1).

    prefix_emb: (Bc, T_cls, dim) where Bc = 2B if cfg_scale > 1 else B.
    fused3: (3, Bc, block_size, dim) control projections or None.
    col_mask: (B_logical? ) -> must already be (Bc, T_cls) boolean, or None.
    use_flash: route decode attention through the Pallas flash-decode kernel
    (TPU only); a col_mask rides the kernel's additive column-bias path, so
    t2i emb masks are fully supported.
    Returns (B, max_new_tokens) int32 tokens (conditional half only).
    """
    bc, t_cls, _ = prefix_emb.shape
    use_cfg = cfg_scale > 1.0
    b = bc // 2 if use_cfg else bc
    s_align = 256 if use_flash else 8
    s_max = find_multiple(t_cls + max_new_tokens, s_align)

    init = (decode_engine.init_stacked_caches if kv_stacked
            else decode_engine.init_flat_caches)
    caches = init(cfg, bc, s_max, cache_dtype)

    logits0, caches = decode_engine.prefill_flat(
        params, cfg, caches, prefix_emb, fused3, col_mask, control_strength
    )

    def mix(logits):
        if use_cfg:
            cond, uncond = jnp.split(logits, 2, axis=0)
            return uncond + (cond - uncond) * cfg_scale
        return logits

    def mix_interval(logits, step):
        # after cfg_interval decode steps, fall back to cond logits (scale=1).
        # `step` is the 0-based decode-loop index i, matching the reference's
        # `if i > cfg_interval` in decode_n_tokens (generate.py:104-107): CFG
        # stays active through step i == cfg_interval inclusive.
        if use_cfg:
            cond, uncond = jnp.split(logits, 2, axis=0)
            if cfg_interval > -1:
                scale = jnp.where(step > cfg_interval, 1.0, cfg_scale)
            else:
                scale = cfg_scale
            return uncond + (cond - uncond) * scale
        return logits

    tok0 = _sample_from(
        jax.random.fold_in(rng, 0), mix(logits0),
        temperature, top_k, top_p, sample_logits,
    ).astype(jnp.int32)

    if col_mask is not None:
        col_mask_full = jnp.concatenate(
            [col_mask, jnp.ones((bc, s_max - t_cls), dtype=bool)], axis=1
        )
    else:
        col_mask_full = None

    def step(carry, i):
        caches, cur = carry
        pos = t_cls + i
        cur_c = jnp.concatenate([cur, cur], axis=0) if use_cfg else cur
        logits, caches = decode_engine.decode_step_flat(
            params, cfg, caches, cur_c, pos, fused3, col_mask_full,
            control_strength, use_flash=use_flash,
        )
        logits = mix_interval(logits, i)
        nxt = _sample_from(
            jax.random.fold_in(rng, i + 1), logits,
            temperature, top_k, top_p, sample_logits,
        ).astype(jnp.int32)
        return (caches, nxt), nxt

    (_, _), rest = jax.lax.scan(
        step, (caches, tok0), jnp.arange(max_new_tokens - 1)
    )
    tokens = jnp.concatenate([tok0[None], rest], axis=0)  # (N, B)
    return tokens.T  # (B, N)


def generate(
    params,
    cfg: GPTConfig,
    *,
    labels: Optional[jnp.ndarray] = None,
    caption_emb: Optional[jnp.ndarray] = None,
    emb_masks: Optional[jnp.ndarray] = None,
    adapter_features: Optional[jnp.ndarray] = None,
    max_new_tokens: int,
    cfg_scale: float = 1.0,
    cfg_interval: int = -1,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    sample_logits: bool = True,
    control_strength: float = 1.0,
    rng: Optional[jax.Array] = None,
    cache_dtype=jnp.bfloat16,
    use_flash: Optional[bool] = None,
    kv_stacked: bool = False,
) -> jnp.ndarray:
    """High-level entry mirroring ref generate() (generate.py:134-204).

    kv_stacked=True selects the stacked (L, B, S, R) KV cache with deferred
    batched appends (decode.init_stacked_caches) — fewer per-step dispatch
    ops on the uniform-position decode loop.

    Builds the CFG-combined prefix / control projections, then calls the jitted
    loop. `adapter_features` are the control-encoder outputs *after*
    adapter_mlp is NOT applied — pass raw adapter outputs (B, block, adapter_dim).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    use_cfg = cfg_scale > 1.0
    if use_flash is None:
        # auto: Pallas path on TPU (emb-mask prefixes ride the kernel's
        # additive column bias)
        use_flash = (
            jax.default_backend() == "tpu" and cfg.kv_heads == cfg.n_head
        )

    if cfg.model_type == "c2i":
        assert labels is not None
        if use_cfg:
            null = jnp.full_like(labels, cfg.num_classes)
            labels = jnp.concatenate([labels, null], axis=0)
        prefix = gpt_model.embed_prefix_c2i(params, labels)
        col_mask = None
    else:
        assert caption_emb is not None
        b = caption_emb.shape[0]
        if use_cfg:
            uncond = jnp.broadcast_to(
                params["cls_embedding"]["uncond_embedding"][None],
                caption_emb.shape,
            ).astype(caption_emb.dtype)
            caption_emb = jnp.concatenate([caption_emb, uncond], axis=0)
        prefix = gpt_model.embed_prefix_t2i(params, caption_emb)
        if emb_masks is not None:
            col_mask = emb_masks.astype(bool)
            if use_cfg:
                col_mask = jnp.concatenate([col_mask, col_mask], axis=0)
        else:
            col_mask = None
        prefix = prefix[:, : cfg.cls_token_num]

    # one-time weight unstacking for the decode loop (see decode.unstack_layers)
    params = decode_engine.unstack_layers(params)

    fused3 = None
    if adapter_features is not None:
        cond_tok = gpt_model.mlp_gelu(params["adapter_mlp"], adapter_features)
        if use_cfg:
            cond_tok = jnp.concatenate([cond_tok, jnp.zeros_like(cond_tok)], axis=0)
        cond_tok = gpt_model.mlp_gelu(params["condition_mlp"], cond_tok)
        fused3 = gpt_model.fusion_projections(params, cond_tok)

    return generate_tokens(
        params, cfg, prefix, fused3, col_mask, rng,
        jnp.asarray(control_strength, jnp.float32),
        max_new_tokens=max_new_tokens,
        cfg_scale=cfg_scale,
        cfg_interval=cfg_interval,
        temperature=temperature,
        top_k=top_k,
        top_p=top_p,
        sample_logits=sample_logits,
        cache_dtype=cache_dtype,
        use_flash=use_flash,
        kv_stacked=kv_stacked,
    )
