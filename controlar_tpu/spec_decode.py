"""Speculative multi-token decode: draft k tokens cheaply, verify them with
ONE target forward over the k positions.

Decode at the large model sizes is weight-stream bound (every step reads
every weight; PERFORMANCE.md): a k-token verify forward reads the weights
and the KV slab ONCE for k tokens, so accepted drafts are nearly free. The
reference has no equivalent (its vLLM fork decodes strictly one token per
forward, serve/model_runner.py).

Drafts are pluggable — any (params, cfg) pair with the same vocab/prefix
semantics:
  - a smaller family member (GPT-B drafting for GPT-3B),
  - the SAME model in a cheaper precision (int8 or W4 self-drafting): the
    output is then exactly the target-precision greedy sequence, and the
    acceptance rate is the measured cross-precision token agreement.

Greedy mode is provably lossless: the emitted sequence equals the vanilla
greedy decode REGARDLESS of the draft (rejections fall back to the target's
own argmax). Per-row acceptance bookkeeping: each logical batch row advances
by its own accepted count (per-row positions, per-row output offsets), so
one slow row never throttles the others' acceptance.

Numerics caveat (TPU): "identical" means identical under one scoring
function. The CPU suite proves algorithmic exactness (spec == vanilla
bit-for-bit when both share the attention program). On TPU, an eager decode
step, the XLA chunk, and the flash chunk kernel all produce BIT-IDENTICAL
logits to each other, but the lax.scan-fused vanilla loop body compiles to
slightly different bf16 arithmetic; at near-ties the argmax flips (measured
0.055 on O(10) logits at the first flip). At RANDOM weights (pathologically
small top-1 margins over 16k classes) this flips ~1% of steps; with real
trained weights the margins make it vanish. Speculation economics: speedup
= (E[accepted]+1) * t_target / (k * t_draft + t_verify) — a quantized
SELF-draft is not cheaper than the target's own quantized step, so
self-speculation only upgrades quality (bf16-exact output at near-int8
cost); real gains need a cross-size draft (GPT-B drafting GPT-3B), whose
acceptance requires released weights to measure. Measured int8-self-draft
acceptance at GPT-B, k=4: 3.26/4 per cycle (alpha = 0.82, consistent with
the quant gate's 0.87 teacher-forced agreement).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from controlar_tpu.config import GPTConfig, find_multiple
from controlar_tpu import decode as dec
from controlar_tpu.models import gpt as gpt_model
from controlar_tpu.models.gpt import _fusion_gates, _qkv, make_rope_table
from controlar_tpu.ops.cache_append import cache_append_block
from controlar_tpu.ops.norms import rms_norm
from controlar_tpu.quant import dequantize_kv_slab, quantize_kv_rows, wdot


def forward_chunk(
    params,
    cfg: GPTConfig,
    caches: dec.Caches,
    tokens: Optional[jnp.ndarray],  # (B, K) int32, or None with emb
    pos: jnp.ndarray,     # (B,) int32 — chunk occupies [pos, pos+K)
    fused3: Optional[jnp.ndarray] = None,
    col_mask_full: Optional[jnp.ndarray] = None,
    control_strength=1.0,
    use_flash: bool = False,
    emb: Optional[jnp.ndarray] = None,  # (B, K, dim) pre-embedded chunk
    apply_fusion: bool = True,
    prefill_fusion: bool = False,
) -> Tuple[jnp.ndarray, dec.Caches]:
    """K-token chunk forward with per-row base positions.

    Query j attends cache rows <= pos[b] + j (the chunk's own rows are
    appended first, giving in-chunk causality for free), with a diagonal
    exception: a query always attends its own column even when col_mask
    masks it (left-padded caption rows — matches prefill_flat's mask; keeps
    the softmax finite for fully-masked rows). Returns logits (B, K, vocab)
    for every chunk position. This is the speculative verify step AND the
    chunked-prefill primitive (pass `emb` for prefix embeddings).
    """
    if emb is None:
        b, k = tokens.shape
        h = params["tok_embeddings"][tokens]  # (B, K, dim)
    else:
        b, k, _ = emb.shape
        h = emb
    hd = cfg.n_head * cfg.head_dim
    gate, fidx = _fusion_gates(cfg)
    split = dec._is_split(params)
    chunk_pos = pos[:, None] + jnp.arange(k)[None]  # (B, K)
    if split:
        rope, cos_sin = None, tuple(
            tb[chunk_pos] for tb in dec._split_tables(cfg))  # (B, K, W2)
    else:
        rope, cos_sin = make_rope_table(cfg)[chunk_pos], None
    fuse_pos = pos - cfg.cls_token_num + 1

    s_max = dec.cache_seq_len(caches)
    cols = jnp.arange(s_max)
    own = (pos[:, None] + jnp.arange(k)[None])[:, None, :, None]
    # (B, 1, K, S): col <= pos + j, with the diagonal exception
    allow = cols[None, None, None, :] <= own
    if col_mask_full is not None:
        allow = allow & (col_mask_full[:, None, None, :]
                         | (cols[None, None, None, :] == own))

    def append(cache, kv_rows):
        # kv_rows (B, K, 2*HD')
        if isinstance(cache, dict):
            kk_ = dec._cache_kv_key(cache)
            q_rows, s_rows = dec._quantize_rows_for(cache, kv_rows,
                                                    cfg.kv_heads, split=split)
            if use_flash:
                return {kk_: cache_append_block(cache[kk_], q_rows, pos),
                        "s": cache_append_block(cache["s"], s_rows, pos)}
            vdus = jax.vmap(
                lambda c, r, p: jax.lax.dynamic_update_slice(c, r, (p, 0))
            )
            return {kk_: vdus(cache[kk_], q_rows, pos),
                    "s": vdus(cache["s"], s_rows, pos)}
        kv_rows = kv_rows.astype(cache.dtype)
        if use_flash:
            return cache_append_block(cache, kv_rows, pos)
        return jax.vmap(
            lambda c, r, p: jax.lax.dynamic_update_slice(c, r, (p, 0))
        )(cache, kv_rows, pos)

    kvs = list(caches)
    for l in range(cfg.n_layer):
        lp = dec._layer_params(params, l)
        if fused3 is not None and gate[l] > 0 and apply_fusion:
            if prefill_fusion:
                # prefix semantics (prefill_flat): control row 0 lands on the
                # LAST prefix position only
                is_last = ((pos[:, None] + jnp.arange(k))
                           == cfg.cls_token_num - 1)[..., None]
                add = (control_strength * fused3[fidx[l]][:, 0:1]).astype(h.dtype)
                h = h + jnp.where(is_last, add, 0)
            else:
                rows = jax.vmap(
                    lambda f, p: jax.lax.dynamic_slice_in_dim(f, p, k, axis=0)
                )(fused3[fidx[l]], fuse_pos)
                h = h + (control_strength * rows).astype(h.dtype)
        x = rms_norm(h, lp["attention_norm"], cfg.norm_eps)
        q, kk, v = dec._qkv_for(lp, cfg, x, rope, cos_sin)  # (B, K, H, D)
        kv_rows = jnp.concatenate(
            [kk.reshape(b, k, hd), v.reshape(b, k, hd)], axis=-1
        )
        kvs[l] = append(kvs[l], kv_rows)
        if use_flash:
            from controlar_tpu.ops.flash_chunk import (
                flash_chunk_attention,
                flash_chunk_attention_q4,
                flash_chunk_attention_q8,
            )

            col_bias = (None if col_mask_full is None else
                        jnp.where(col_mask_full, 0.0, -1e9).astype(jnp.float32))
            if isinstance(kvs[l], dict) and "kv4" in kvs[l]:
                attn = flash_chunk_attention_q4(
                    q.reshape(b, k, hd), kvs[l]["kv4"], kvs[l]["s"], pos,
                    col_bias, n_head=cfg.n_head, head_dim=cfg.head_dim,
                    split=split,
                ).astype(h.dtype)
            elif isinstance(kvs[l], dict):
                attn = flash_chunk_attention_q8(
                    q.reshape(b, k, hd), kvs[l]["kv"], kvs[l]["s"], pos,
                    col_bias, n_head=cfg.n_head,
                ).astype(h.dtype)
            else:
                attn = flash_chunk_attention(
                    q.reshape(b, k, hd), kvs[l], pos, col_bias,
                    n_head=cfg.n_head,
                ).astype(h.dtype)
        else:
            slab = (dec._dequant_slab(kvs[l], cfg, h.dtype, split=split)
                    if isinstance(kvs[l], dict) else kvs[l])
            kl = slab[:, :, :hd].reshape(b, s_max, cfg.kv_heads, cfg.head_dim)
            vl = slab[:, :, hd:].reshape(b, s_max, cfg.kv_heads, cfg.head_dim)
            scores = jnp.einsum(
                "bthd,bshd->bhts", q, kl, preferred_element_type=jnp.float32
            ) * (1.0 / np.sqrt(cfg.head_dim))
            scores = jnp.where(allow[:, :, :, :], scores, -jnp.inf)
            probs = jax.nn.softmax(scores, axis=-1).astype(h.dtype)
            attn = jnp.einsum(
                "bhts,bshd->bthd", probs, vl, preferred_element_type=jnp.float32
            ).astype(h.dtype).reshape(b, k, hd)
        h = h + wdot(attn, lp["wo"])
        x = rms_norm(h, lp["ffn_norm"], cfg.norm_eps)
        h = h + dec.ffn(lp, x)
    h = rms_norm(h, params["norm"], cfg.norm_eps)
    logits = wdot(h, params["output"]).astype(jnp.float32)
    return logits, tuple(kvs)


def speculative_accept(drafts, qprobs, pprobs, key):
    """Leviathan et al. accept/reject for one verify cycle (vectorized).

    drafts: (B, K-1) tokens sampled from the draft dists qprobs (B, K-1, V);
    pprobs: (B, K, V) target dists at the same positions. Returns
    (m (B,) accepted-draft counts, tokens_row (B, K) where positions < m are
    the accepted drafts and position m is the bonus/residual token, cur (B,)
    = tokens_row[:, m]).

    Draft j is accepted with prob min(1, p_j(d_j)/q_j(d_j)); at the first
    rejection the replacement is sampled from norm(max(p_m - q_m, 0)), and
    when every draft survives the bonus token comes from p_{K-1} (q treated
    as 0 there, which folds both cases into one residual formula). This
    preserves the target distribution exactly (Leviathan et al. 2023, thm 1;
    the reference has no speculative path at all).
    """
    b, km1 = drafts.shape
    k = km1 + 1
    ku, kr = jax.random.split(key)
    pd = jnp.take_along_axis(pprobs[:, :km1], drafts[..., None], axis=-1)[..., 0]
    qd = jnp.take_along_axis(qprobs, drafts[..., None], axis=-1)[..., 0]
    u = jax.random.uniform(ku, (b, km1))
    # strict <: P(u*q < p) = min(1, p/q) exactly for u ~ U[0,1), and a
    # draft with p==0 (outside the warped target's top-k support) can
    # never be accepted even when u draws exactly 0.0
    accept = u * qd < pd
    prefix_ok = jnp.cumprod(accept.astype(jnp.int32), axis=1)
    m = prefix_ok.sum(axis=1)  # (B,) in [0, K-1]

    p_m = jnp.take_along_axis(pprobs, m[:, None, None], axis=1)[:, 0]  # (B,V)
    q_all = jnp.concatenate(
        [qprobs, jnp.zeros((b, 1, qprobs.shape[-1]), qprobs.dtype)], axis=1)
    q_m = jnp.take_along_axis(q_all, m[:, None, None], axis=1)[:, 0]
    res = jnp.maximum(p_m - q_m, 0.0)
    rsum = res.sum(axis=-1, keepdims=True)
    # numerically-empty residual (p ~= q): fall back to p itself
    dist = jnp.where(rsum > 1e-9, res / jnp.maximum(rsum, 1e-30), p_m)
    e_m = jax.random.categorical(kr, jnp.log(jnp.maximum(dist, 1e-30)),
                                 axis=-1).astype(jnp.int32)

    cols = jnp.arange(k)[None, :]
    tokens_row = jnp.concatenate(
        [drafts, jnp.zeros((b, 1), jnp.int32)], axis=1)
    tokens_row = jnp.where(cols == m[:, None], e_m[:, None], tokens_row)
    return m, tokens_row, e_m


def _mix_rowwise(logits, n_row, cfg_scale, cfg_interval, offset):
    """CFG mix with the reference's interval semantics, per-row step index.

    logits (2B, ..., V) or (B, ..., V); n_row (B,) finalized-token counts.
    Token at position j of the chunk corresponds to vanilla decode-loop index
    i = n_row + j - 1 + offset; CFG stays active while i <= cfg_interval
    (matching generate.mix_interval).
    """
    if cfg_scale <= 1.0:
        return logits
    cond, uncond = jnp.split(logits, 2, axis=0)
    if cfg_interval > -1:
        k = logits.shape[1] if logits.ndim == 3 else 1
        step = n_row[:, None] + jnp.arange(k)[None] - 1 + offset  # (B, K)
        scale = jnp.where(step > cfg_interval, 1.0, cfg_scale)
        if logits.ndim == 3:
            scale = scale[:, :, None]
        else:
            scale = scale[:, 0, None]
    else:
        scale = cfg_scale
    return uncond + (cond - uncond) * scale


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "draft_cfg", "max_new_tokens", "k_draft", "cfg_scale",
        "cfg_interval", "cache_dtype", "draft_cache_dtype", "use_flash",
        "collect_stats", "temperature", "top_k", "top_p",
    ),
)
def generate_tokens_spec(
    params,
    draft_params,
    cfg: GPTConfig,
    draft_cfg: GPTConfig,
    prefix_emb: jnp.ndarray,
    draft_prefix_emb: jnp.ndarray,
    fused3: Optional[jnp.ndarray],
    draft_fused3: Optional[jnp.ndarray],
    col_mask: Optional[jnp.ndarray],
    control_strength: jnp.ndarray | float = 1.0,
    rng: Optional[jnp.ndarray] = None,
    *,
    max_new_tokens: int,
    k_draft: int = 4,
    cfg_scale: float = 1.0,
    cfg_interval: int = -1,
    cache_dtype=jnp.bfloat16,
    draft_cache_dtype=jnp.bfloat16,
    use_flash: bool = False,
    collect_stats: bool = False,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
):
    """Speculative decode. Returns (tokens (B, N), accepted_frac).

    rng=None: greedy — the emitted tokens are EXACTLY the vanilla greedy
    sequence of the target model (for any draft). rng given: speculative
    SAMPLING (Leviathan et al. 2023) — drafts are sampled from the draft's
    warped distribution and accept/reject preserves the target's warped
    distribution exactly (speculative_accept); temperature/top-k/top-p warp
    both sides identically (generate.py sampling semantics).
    accepted_frac = mean accepted-per-cycle / k_draft over all cycles."""
    from controlar_tpu.ops.sampling import top_k_top_p_filter

    sample = rng is not None

    def warp(lg):
        return top_k_top_p_filter(lg / max(temperature, 1e-5), top_k, top_p)

    bc, t_cls, _ = prefix_emb.shape
    use_cfg = cfg_scale > 1.0
    b = bc // 2 if use_cfg else bc
    n_new = max_new_tokens
    k = k_draft
    s_align = 256 if use_flash else 8
    # slack: one extra append window (64 int8 rows) past the last chunk
    s_max = find_multiple(t_cls + n_new + k + 64, s_align)

    caches_t = dec.init_flat_caches(cfg, bc, s_max, cache_dtype)
    caches_d = dec.init_flat_caches(draft_cfg, bc, s_max, draft_cache_dtype)

    logits_t0, caches_t = dec.prefill_flat(
        params, cfg, caches_t, prefix_emb, fused3, col_mask, control_strength
    )
    _, caches_d = dec.prefill_flat(
        draft_params, draft_cfg, caches_d, draft_prefix_emb, draft_fused3,
        col_mask, control_strength
    )

    def mix0(logits):
        if use_cfg:
            cond, uncond = jnp.split(logits, 2, axis=0)
            return uncond + (cond - uncond) * cfg_scale
        return logits

    if sample:
        rng, k0 = jax.random.split(rng)
        tok0 = jax.random.categorical(
            k0, warp(mix0(logits_t0)), axis=-1).astype(jnp.int32)
    else:
        tok0 = jnp.argmax(mix0(logits_t0), axis=-1).astype(jnp.int32)  # (B,)

    if col_mask is not None:
        col_mask_full = jnp.concatenate(
            [col_mask, jnp.ones((bc, s_max - t_cls), dtype=bool)], axis=1
        )
    else:
        col_mask_full = None

    def rep(x):
        return jnp.concatenate([x, x], axis=0) if use_cfg else x

    out0 = jnp.zeros((b, n_new + k), jnp.int32)
    out0 = out0.at[:, 0].set(tok0)
    # n = finalized tokens per logical row; cur = last finalized (unfed)
    # it_sum counts raw while iterations (the loop runs until the SLOWEST
    # row finishes, so iterations > mean n_new/(acc+1) — profile_spec.py
    # needs the true count to attribute cycle time honestly)
    state0 = (caches_t, caches_d, tok0, jnp.ones((b,), jnp.int32), out0,
              jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
              jnp.zeros((), jnp.float32))
    if sample:
        state0 = state0 + (rng,)

    def cycle(state):
        if sample:
            (caches_t, caches_d, cur, n, out, acc_sum, cyc_sum, it_sum,
             key) = state
            key, kd, kv = jax.random.split(key, 3)
        else:
            caches_t, caches_d, cur, n, out, acc_sum, cyc_sum, it_sum = state
        pos0 = t_cls + n - 1  # (B,) base position of the chunk
        pos0_r = rep(pos0)

        # ---- draft k steps (its own cache, per-row positions)
        def draft_step(carry, j):
            caches_d, tok = carry
            logits, caches_d = dec.decode_step_multi(
                draft_params, draft_cfg, caches_d, rep(tok), pos0_r + j,
                draft_fused3, control_strength, use_flash=use_flash,
                col_mask_full=col_mask_full,
            )
            mixed = _mix_rowwise(logits, n + j, cfg_scale, cfg_interval, 0)
            if sample:
                warped = warp(mixed)
                nxt = jax.random.categorical(
                    jax.random.fold_in(kd, j), warped, axis=-1
                ).astype(jnp.int32)
                return (caches_d, nxt), (nxt, jax.nn.softmax(warped, axis=-1))
            nxt = jnp.argmax(mixed, axis=-1).astype(jnp.int32)
            return (caches_d, nxt), nxt

        (caches_d, _), ys = jax.lax.scan(
            draft_step, (caches_d, cur), jnp.arange(k)
        )
        if sample:
            drafts, qprobs = ys[0].T, ys[1]  # (B, k), (k, B, V)
        else:
            drafts = ys.T  # (B, k): drafts[:, j] = d_{j+1}

        # ---- verify: one target forward over [cur, d_1 .. d_{k-1}]
        chunk = jnp.concatenate([cur[:, None], drafts[:, : k - 1]], axis=1)
        logits, caches_t = forward_chunk(
            params, cfg, caches_t, rep(chunk), pos0_r, fused3,
            col_mask_full, control_strength, use_flash=use_flash,
        )
        mixed = _mix_rowwise(logits, n, cfg_scale, cfg_interval, 0)

        if sample:
            # ---- Leviathan accept/reject against the draft dists
            pprobs = jax.nn.softmax(warp(mixed), axis=-1)  # (B, k, V)
            m, g, cur2 = speculative_accept(
                drafts[:, : k - 1], qprobs[: k - 1].transpose(1, 0, 2),
                pprobs, kv)
        else:
            g = jnp.argmax(mixed, axis=-1).astype(jnp.int32)  # (B, k)
            # ---- accept leading matches: m = #{j>=1 : d_j == g_{j-1} pref}
            matches = drafts[:, : k - 1] == g[:, : k - 1]  # (B, k-1)
            prefix_ok = jnp.cumprod(matches.astype(jnp.int32), axis=1)
            m = prefix_ok.sum(axis=1)  # (B,) in [0, k-1]
            cur2 = jnp.take_along_axis(g, m[:, None], axis=1)[:, 0]

        done = n >= n_new
        w_off = jnp.where(done, n_new, n)
        out = jax.vmap(
            lambda o, gg, off: jax.lax.dynamic_update_slice(o, gg, (off,))
        )(out, g, w_off)
        cur = jnp.where(done, cur, cur2)
        n = jnp.where(done, n, n + m + 1)
        live = (~done).astype(jnp.float32)
        acc_sum = acc_sum + ((m + 1) * live).sum()
        cyc_sum = cyc_sum + live.sum()
        new_state = (caches_t, caches_d, cur, n, out, acc_sum, cyc_sum,
                     it_sum + 1.0)
        return new_state + ((key,) if sample else ())

    def cond_fn(state):
        return jnp.any(state[3] < n_new)

    state = jax.lax.while_loop(cond_fn, cycle, state0)
    out = state[4][:, :n_new]
    accepted_per_cycle = state[5] / jnp.maximum(state[6], 1.0)
    return out, accepted_per_cycle, state[7]


def generate_spec(
    params,
    cfg: GPTConfig,
    draft_params,
    draft_cfg: Optional[GPTConfig] = None,
    *,
    labels: Optional[jnp.ndarray] = None,
    caption_emb: Optional[jnp.ndarray] = None,
    emb_masks: Optional[jnp.ndarray] = None,
    adapter_features: Optional[jnp.ndarray] = None,
    max_new_tokens: int,
    k_draft: int = 4,
    cfg_scale: float = 1.0,
    cfg_interval: int = -1,
    control_strength: float = 1.0,
    cache_dtype=jnp.bfloat16,
    draft_cache_dtype=None,
    use_flash: Optional[bool] = None,
    return_stats: bool = False,
    rng: Optional[jnp.ndarray] = None,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
):
    """High-level speculative generate (mirrors generate.generate).

    draft_params may be a quantized copy of `params` (self-speculation) or a
    smaller family member's params (pass its cfg as draft_cfg). rng=None is
    greedy (provably target-exact); rng given enables distribution-
    preserving speculative sampling with temperature/top-k/top-p.
    """
    draft_cfg = draft_cfg or cfg
    if draft_cache_dtype is None:
        draft_cache_dtype = cache_dtype
    if use_flash is None:
        use_flash = (
            jax.default_backend() == "tpu" and cfg.kv_heads == cfg.n_head
        )
    use_cfg = cfg_scale > 1.0

    def build_prefix(p, c):
        if c.model_type == "c2i":
            assert labels is not None
            lab = labels
            if use_cfg:
                null = jnp.full_like(lab, c.num_classes)
                lab = jnp.concatenate([lab, null], axis=0)
            return gpt_model.embed_prefix_c2i(p, lab), None
        assert caption_emb is not None
        cap = caption_emb
        if use_cfg:
            uncond = jnp.broadcast_to(
                p["cls_embedding"]["uncond_embedding"][None], cap.shape
            ).astype(cap.dtype)
            cap = jnp.concatenate([cap, uncond], axis=0)
        prefix = gpt_model.embed_prefix_t2i(p, cap)[:, : c.cls_token_num]
        cm = None
        if emb_masks is not None:
            cm = emb_masks.astype(bool)
            if use_cfg:
                cm = jnp.concatenate([cm, cm], axis=0)
        return prefix, cm

    params = dec.unstack_layers(params)
    draft_params = dec.unstack_layers(draft_params)
    prefix, col_mask = build_prefix(params, cfg)
    draft_prefix, _ = build_prefix(draft_params, draft_cfg)

    def fused_of(p, c):
        if adapter_features is None:
            return None
        cond_tok = gpt_model.mlp_gelu(p["adapter_mlp"], adapter_features)
        if use_cfg:
            cond_tok = jnp.concatenate(
                [cond_tok, jnp.zeros_like(cond_tok)], axis=0)
        cond_tok = gpt_model.mlp_gelu(p["condition_mlp"], cond_tok)
        return gpt_model.fusion_projections(p, cond_tok)

    fused3 = fused_of(params, cfg)
    draft_fused3 = fused_of(draft_params, draft_cfg)

    tokens, acc, iters = generate_tokens_spec(
        params, draft_params, cfg, draft_cfg, prefix, draft_prefix,
        fused3, draft_fused3, col_mask,
        jnp.asarray(control_strength, jnp.float32), rng,
        max_new_tokens=max_new_tokens, k_draft=k_draft, cfg_scale=cfg_scale,
        cfg_interval=cfg_interval, cache_dtype=cache_dtype,
        draft_cache_dtype=draft_cache_dtype, use_flash=use_flash,
        temperature=temperature, top_k=top_k, top_p=top_p,
    )
    if return_stats:
        return tokens, {"accepted_per_cycle": acc, "k_draft": k_draft,
                        "loop_iters": iters}
    return tokens


def prefill_chunked(
    params,
    cfg: GPTConfig,
    caches: dec.Caches,
    prefix_emb: jnp.ndarray,
    fused3: Optional[jnp.ndarray] = None,
    col_mask: Optional[jnp.ndarray] = None,
    control_strength=1.0,
    *,
    chunk: int = 256,
    use_flash: bool = True,
) -> Tuple[jnp.ndarray, dec.Caches]:
    """Chunked prefill through the flash-chunk kernels (drop-in for
    decode.prefill_flat): the prefix streams through forward_chunk in
    `chunk`-token pieces, so long MR prefixes never materialize a (T, T)
    XLA attention or touch the full slab per token. Returns
    (last-position logits, caches)."""
    b, t, _ = prefix_emb.shape
    s_max = dec.cache_seq_len(caches)
    col_mask_full = None
    if col_mask is not None:
        col_mask_full = jnp.concatenate(
            [col_mask.astype(bool),
             jnp.ones((b, s_max - col_mask.shape[1]), dtype=bool)], axis=1)
    logits = None
    for c0 in range(0, t, chunk):
        ck = min(chunk, t - c0)
        logits, caches = forward_chunk(
            params, cfg, caches, None, jnp.full((b,), c0, jnp.int32),
            fused3, col_mask_full, control_strength, use_flash=use_flash,
            emb=prefix_emb[:, c0:c0 + ck], prefill_fusion=True)
    return logits[:, -1], caches
