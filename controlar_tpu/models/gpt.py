"""LlamaGen-style decoder with ControlAR conditional decoding — TPU-native.

Re-design of the reference Transformer (ref: autoregressive/models/gpt_t2i.py:310-484
and gpt.py:306-469) as a functional JAX model:

- Parameters are a pytree of arrays; per-layer weights are stacked on a leading
  layer axis and the block stack runs under `lax.scan` (fast compiles for the
  36-48 layer sizes, natural remat boundary for training).
- Control fusion (the heart of ControlAR): control tokens are projected by 3
  per-fusion-point MLPs once, then added to the hidden state at layers where
  i % (n_layer//3) == 0. Each generated position t receives control token t
  (ref: gpt_t2i.py:456-467). Inside the layer scan this becomes a gather from a
  precomputed (3, B, T, dim) tensor selected by a static per-layer gate/index.
- The KV cache is an explicit (n_layer, B, S, H, D) pytree threaded through
  scan as xs/ys and donated by callers — no module state, no Python objects.
- c2i and t2i share one code path: with cls_token_num=1 the c2i fusion rules
  (gpt.py:440-466) coincide with the t2i rules (position p fuses control token
  p - cls_token_num + 1; training fuses into positions cls_token_num-1 ...).

Weight layout: all linears are stored (in_features, out_features) so forward is
`x @ W` (torch stores the transpose). The torch->jax converter transposes.
"""
from __future__ import annotations

from typing import Optional, Tuple, Dict, Any

import jax
import jax.numpy as jnp
import numpy as np

from controlar_tpu.config import GPTConfig
from controlar_tpu.ops.norms import rms_norm
from controlar_tpu.quant import wdot
from controlar_tpu.ops.rope import apply_rope, precompute_rope_2d

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Parameter initialization (ref: gpt_t2i.py:372-389)
# ---------------------------------------------------------------------------

def init_gpt_params(rng: jax.Array, cfg: GPTConfig, dtype=jnp.float32) -> Params:
    """Initialize parameters matching the reference init distribution:
    normal(0, initializer_range) for all linears/embeddings — including the
    adapter/condition control MLPs (ref gpt_t2i.py:372-389 re-inits every
    nn.Linear after construction) — with zeros only for the output head
    (ref gpt_t2i.py:377)."""
    std = cfg.initializer_range
    keys = iter(jax.random.split(rng, 64))

    def normal(shape):
        return (jax.random.normal(next(keys), shape) * std).astype(dtype)

    def zeros(shape):
        return jnp.zeros(shape, dtype)

    d, hd, nh, nkv = cfg.dim, cfg.head_dim, cfg.n_head, cfg.kv_heads
    ffn = cfg.ffn_hidden_dim
    L = cfg.n_layer

    layers = {
        "attention_norm": jnp.ones((L, d), dtype),
        "ffn_norm": jnp.ones((L, d), dtype),
        "wqkv": normal((L, d, (nh + 2 * nkv) * hd)),
        "wo": normal((L, d, d)),
        "w1": normal((L, d, ffn)),
        "w3": normal((L, d, ffn)),
        "w2": normal((L, ffn, d)),
    }

    if cfg.model_type == "c2i":
        cls_embedding = {"embedding": normal((cfg.num_classes + 1, d))}
    else:
        cls_embedding = {
            "fc1": normal((cfg.caption_dim, d)),
            "fc2": normal((d, d)),
            # ref CaptionEmbedder buffer: randn(token_num, in_ch)/sqrt(in_ch)
            "uncond_embedding": (
                jax.random.normal(next(keys), (cfg.cls_token_num, cfg.caption_dim))
                / cfg.caption_dim ** 0.5
            ).astype(dtype),
        }

    params = {
        "tok_embeddings": normal((cfg.vocab_size, d)),
        "cls_embedding": cls_embedding,
        # Control MLPs use the same normal(0, std) init as every other linear:
        # the reference's MLP constructor zeros them (gpt_t2i.py:174-175) but
        # initialize_weights() then applies _init_weights to EVERY nn.Linear
        # (gpt_t2i.py:372-389), overwriting the zeros; only `output` is
        # re-zeroed. Zero-init here would make the whole control branch a
        # permanent zero-gradient fixed point (gelu(x@0)@0 has zero grad in
        # both matrices).
        "adapter_mlp": {"fc1": normal((cfg.adapter_dim, d)), "fc2": normal((d, d))},
        "condition_mlp": {"fc1": normal((d, d)), "fc2": normal((d, d))},
        "condition_layers": {"fc1": normal((3, d, d)), "fc2": normal((3, d, d))},
        "layers": layers,
        "norm": jnp.ones((d,), dtype),
        "output": zeros((d, cfg.vocab_size))
        if cfg.model_type == "t2i"
        else normal((d, cfg.vocab_size)),
    }
    return params


def make_rope_table(cfg: GPTConfig) -> jnp.ndarray:
    """(cls_token_num + block_size, head_dim//2, 2) fp32 cos/sin table.

    Rectangular grids (arbitrary resolution) get an exact per-bucket table
    rather than slicing rows from a square one (fixes the reference's MR
    row-alignment caveat, SURVEY.md §5)."""
    gh, gw = cfg.grid
    if gh == gw:
        return jnp.asarray(
            precompute_rope_2d(gh, cfg.head_dim, cfg.rope_base, cfg.cls_token_num)
        )
    from controlar_tpu.ops.rope import precompute_rope_2d_rect

    return jnp.asarray(
        precompute_rope_2d_rect(gh, gw, cfg.head_dim, cfg.rope_base, cfg.cls_token_num)
    )


# ---------------------------------------------------------------------------
# Small pieces
# ---------------------------------------------------------------------------

def mlp_gelu(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Bias-free MLP with tanh-GELU (ref MLP: gpt_t2i.py:165-181)."""
    h = jax.nn.gelu(x @ p["fc1"], approximate=True)
    return h @ p["fc2"]


def embed_prefix_c2i(
    params: Params, labels: jnp.ndarray
) -> jnp.ndarray:
    """Class labels -> (B, 1, dim) (ref LabelEmbedder: gpt_t2i.py:67-97)."""
    emb = params["cls_embedding"]["embedding"][labels]
    return emb[:, None, :]


def embed_prefix_t2i(params: Params, caption_emb: jnp.ndarray) -> jnp.ndarray:
    """T5 features (B, T_cls, caption_dim) -> (B, T_cls, dim)
    (ref CaptionEmbedder: gpt_t2i.py:133-162)."""
    return mlp_gelu(params["cls_embedding"], caption_emb)


def control_tokens(
    params: Params,
    cfg: GPTConfig,
    adapter_features: jnp.ndarray,
    drop_ids: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Adapter features (B, T_img, adapter_dim) -> control tokens (B, T_img, dim).

    adapter_mlp then ConditionEmbedder.cap_proj; CFG-dropout replaces the
    *input* of the condition MLP with zeros (the uncond embedding is a zeros
    buffer, ref gpt_t2i.py:107,120), sharing drop_ids with the caption dropout
    (ref gpt_t2i.py:427).
    """
    x = mlp_gelu(params["adapter_mlp"], adapter_features)
    if drop_ids is not None:
        x = jnp.where(drop_ids[:, None, None], jnp.zeros_like(x), x)
    return mlp_gelu(params["condition_mlp"], x)


def fusion_projections(params: Params, cond_tokens: jnp.ndarray) -> jnp.ndarray:
    """Apply the 3 condition_layers MLPs -> (3, B, T, dim) (ref gpt_t2i.py:440-442)."""
    return jax.vmap(lambda fc1, fc2: mlp_gelu({"fc1": fc1, "fc2": fc2}, cond_tokens))(
        params["condition_layers"]["fc1"], params["condition_layers"]["fc2"]
    )


def _fusion_gates(cfg: GPTConfig) -> Tuple[np.ndarray, np.ndarray]:
    """Static per-layer (gate, projection-index) for control fusion."""
    interval = cfg.layer_interval
    ids = np.arange(cfg.n_layer)
    gate = (ids % interval == 0).astype(np.float32)
    idx = np.minimum(ids // interval, cfg.n_fusion_points - 1).astype(np.int32)
    return gate, idx


# ---------------------------------------------------------------------------
# Attention + FFN block bodies
# ---------------------------------------------------------------------------

def _qkv(lp: Params, cfg: GPTConfig, x: jnp.ndarray, rope_slice: jnp.ndarray):
    """Project + rotate. x: (B, T, dim) -> q (B,T,H,D), k/v (B,T,KV,D)."""
    b, t, _ = x.shape
    nh, nkv, hd = cfg.n_head, cfg.kv_heads, cfg.head_dim
    qkv = wdot(x, lp["wqkv"])
    q, k, v = jnp.split(qkv, [nh * hd, nh * hd + nkv * hd], axis=-1)
    q = q.reshape(b, t, nh, hd)
    k = k.reshape(b, t, nkv, hd)
    v = v.reshape(b, t, nkv, hd)
    q = apply_rope(q, rope_slice)
    k = apply_rope(k, rope_slice)
    return q, k, v


def _attend_full(
    cfg: GPTConfig,
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Full-sequence attention, materialized scores (the PARITY path — kept
    for tests and arbitrary masks). q: (B,T,H,D), k/v: (B,S,KV,D).
    mask: broadcastable boolean (B,1,T,S) or None for causal-within-T.
    Scores accumulate in fp32 (MXU), softmax in fp32."""
    b, t, nh, hd = q.shape
    s = k.shape[1]
    if cfg.kv_heads != nh:
        rep = nh // cfg.kv_heads
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    scores = jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32)
    scores = scores * (1.0 / np.sqrt(hd))
    if mask is None:
        causal = np.tril(np.ones((t, s), dtype=bool), k=s - t)
        scores = jnp.where(causal[None, None], scores, -jnp.inf)
    else:
        scores = jnp.where(mask, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhts,bshd->bthd", probs, v, preferred_element_type=jnp.float32)
    return out.astype(q.dtype).reshape(b, t, nh * hd)


def _attend_blockwise(
    cfg: GPTConfig,
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_valid: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Flash training attention (ops/flash_train.py): online-softmax over
    MXU-tiled blocks, never materializes (T,S) scores in forward or backward
    (the TPU answer to the reference's F.scaled_dot_product_attention flash
    path, ref gpt_t2i.py:282-286). Causal + optional per-key column mask
    with the diagonal exception — exactly build_t2i_attn_mask's semantics."""
    b, t, nh, hd = q.shape
    if cfg.kv_heads != nh:
        rep = nh // cfg.kv_heads
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    if key_valid is not None:
        key_valid = key_valid[:, :t]  # callers may pass the unsliced column mask
    import os

    backend = os.environ.get("CONTROLAR_TRAIN_BLOCKWISE", "auto")
    if backend == "auto":
        # Measured on v5e (round 5, PERFORMANCE.md attention-backend A/B):
        # with the residual-saving remat policies (attn/qkv_attn save the
        # custom-VJP out/lse via checkpoint_name; dots keeps the blockwise
        # matmuls) the XLA blockwise path beats the Pallas kernel at both
        # flagship points — XL-512 qkv_attn 744 vs 766 ms/step, GPT-B dots
        # 76.2 vs 78.4 — so it is the default everywhere. The Pallas
        # kernel (VMEM-resident score tiles) still wins under remat=full,
        # where the backward re-runs the attention forward twice: select
        # it with CONTROLAR_TRAIN_BLOCKWISE=pallas for that memory-floor
        # regime.
        backend = "xla"
    if backend == "pallas":
        from controlar_tpu.ops.flash_train_pallas import (
            flash_attention_train_pallas)

        out = flash_attention_train_pallas(q, k, v, key_valid)
    else:
        from controlar_tpu.ops.flash_train import flash_attention_train

        out = flash_attention_train(q, k, v, key_valid)
    return out.reshape(b, t, nh * hd)


def _dropout(rng: jax.Array, p: float, x: jnp.ndarray) -> jnp.ndarray:
    keep = jax.random.bernoulli(rng, 1.0 - p, x.shape)
    return jnp.where(keep, x / (1.0 - p), jnp.zeros_like(x))


def block_forward(
    lp: Params,
    cfg: GPTConfig,
    h: jnp.ndarray,
    rope_slice: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    kv_cache: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    pos: Optional[jnp.ndarray] = None,
    drop_rng: Optional[jax.Array] = None,
    drop_path_p: float | jnp.ndarray = 0.0,
    key_valid: Optional[jnp.ndarray] = None,
    attn_impl: str = "einsum",
) -> Tuple[jnp.ndarray, Optional[Tuple[jnp.ndarray, jnp.ndarray]]]:
    """One pre-norm block (ref TransformerBlock: gpt_t2i.py:294-307).

    If kv_cache=(k,v) with shape (B,S,KV,D) is given, the new k/v rows are
    written at positions [pos, pos+T) and attention runs over the whole cache.
    If drop_rng is given, residual/ffn dropout is applied at the config rates
    (ref Attention.resid_dropout gpt_t2i.py:290, FeedForward.ffn_dropout
    gpt_t2i.py:217) and stochastic depth at drop_path_p (ref utils/
    drop_path.py; per-layer rates are linearly spaced by the caller per
    gpt_t2i.py:347). Returns (h_out, updated_cache_or_None).
    """
    x = rms_norm(h, lp["attention_norm"], cfg.norm_eps)
    q, k, v = _qkv(lp, cfg, x, rope_slice)
    # named for the "qkv" remat policy (save q/k/v, recompute the rest):
    # skips re-running the wqkv matmul + rope during the backward pass at
    # 3*(B,T,dim) bf16 per layer of extra HBM — the midpoint between
    # remat=full (fits, max recompute) and remat=dots (OOM at XL-512 b8)
    from jax.ad_checkpoint import checkpoint_name

    q = checkpoint_name(q, "qkv")
    k = checkpoint_name(k, "qkv")
    v = checkpoint_name(v, "qkv")
    if kv_cache is not None:
        k_cache, v_cache = kv_cache
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k.astype(k_cache.dtype), (0, pos, 0, 0)
        )
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v.astype(v_cache.dtype), (0, pos, 0, 0)
        )
        attn = _attend_full(cfg, q, k_cache, v_cache, mask)
        new_cache = (k_cache, v_cache)
    elif attn_impl == "blockwise":
        attn = _attend_blockwise(cfg, q, k, v, key_valid)
        new_cache = None
    else:
        attn = _attend_full(cfg, q, k, v, mask)
        new_cache = None
    def _drop_path(rng, branch):
        # stochastic depth: zero the whole residual branch per sample with
        # prob p, rescale survivors (ref utils/drop_path.py:6-15)
        keep = jax.random.bernoulli(
            rng, 1.0 - drop_path_p, (branch.shape[0],) + (1,) * (branch.ndim - 1)
        )
        return jnp.where(keep, branch / (1.0 - drop_path_p), 0.0)

    attn_out = wdot(attn, lp["wo"])
    if drop_rng is not None and cfg.resid_dropout_p > 0:
        attn_out = _dropout(jax.random.fold_in(drop_rng, 1), cfg.resid_dropout_p, attn_out)
    if drop_rng is not None and cfg.drop_path_rate > 0:
        attn_out = _drop_path(jax.random.fold_in(drop_rng, 3), attn_out)
    h = h + attn_out
    x = rms_norm(h, lp["ffn_norm"], cfg.norm_eps)
    ffn = wdot(jax.nn.silu(wdot(x, lp["w1"])) * wdot(x, lp["w3"]), lp["w2"])
    if drop_rng is not None and cfg.ffn_dropout_p > 0:
        ffn = _dropout(jax.random.fold_in(drop_rng, 2), cfg.ffn_dropout_p, ffn)
    if drop_rng is not None and cfg.drop_path_rate > 0:
        ffn = _drop_path(jax.random.fold_in(drop_rng, 4), ffn)
    return h + ffn, new_cache


# ---------------------------------------------------------------------------
# Full forward passes
# ---------------------------------------------------------------------------

def _scan_layers(
    params: Params,
    cfg: GPTConfig,
    h: jnp.ndarray,
    rope_slice: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    fused3: Optional[jnp.ndarray],
    fuse_fn,
    unroll: int = 1,
    drop_rng: Optional[jax.Array] = None,
    remat: bool = False,
    key_valid: Optional[jnp.ndarray] = None,
    attn_impl: str = "einsum",
):
    """Run the layer stack under lax.scan (the TRAINING path; inference
    lives in decode.py with per-layer unrolling and flat caches).

    fused3: (3, B, T_fuse, dim) precomputed control projections (or None).
    fuse_fn(h, fused_j) -> h applies the fusion for one layer given the
    selected projection row(s).
    remat: rematerialize each layer in the backward pass.
    """
    gate_np, idx_np = _fusion_gates(cfg)
    gate = jnp.asarray(gate_np)
    idx = jnp.asarray(idx_np)
    layer_ids = jnp.arange(cfg.n_layer)

    def body(carry, xs):
        h = carry
        lp, g, j, lid = xs
        if fused3 is not None:
            fused_j = jax.lax.dynamic_index_in_dim(fused3, j, axis=0, keepdims=False)
            h = jax.lax.cond(g > 0, lambda hh: fuse_fn(hh, fused_j), lambda hh: hh, h)
        rng_l = None if drop_rng is None else jax.random.fold_in(drop_rng, lid)
        # stochastic depth: linearly spaced per-layer rate (ref gpt_t2i.py:347)
        dp = cfg.drop_path_rate * lid / max(cfg.n_layer - 1, 1)
        h, _ = block_forward(
            lp, cfg, h, rope_slice, mask, None, None, drop_rng=rng_l,
            drop_path_p=dp, key_valid=key_valid, attn_impl=attn_impl,
        )
        return h, None

    if remat:
        # policy selection (SURVEY aux: remat tuning): "full" recomputes the
        # whole layer; "dots" saves matmul outputs and recomputes only the
        # cheap elementwise chain (more HBM, fewer backward FLOPs); "qkv"
        # saves only the rope'd q/k/v (skips the wqkv matmul recompute at a
        # quarter of dots' extra HBM)
        if remat == "qkv":
            body = jax.checkpoint(
                body,
                policy=jax.checkpoint_policies.save_only_these_names("qkv"),
            )
        elif remat == "attn":
            # save the Pallas attention kernel's (out, lse) residuals: the
            # backward never re-runs the attention forward; everything else
            # (plain MXU matmuls) is recomputed. ~1 GB extra at XL-512 b8.
            body = jax.checkpoint(
                body,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "attn_res"),
            )
        elif remat == "qkv_attn":
            body = jax.checkpoint(
                body,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "qkv", "attn_res"),
            )
        elif remat == "dots":
            body = jax.checkpoint(
                body,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            )
        else:
            body = jax.checkpoint(body)
    xs = (params["layers"], gate, idx, layer_ids)
    # CONTROLAR_SCAN_UNROLL: unroll the layer scan (weight-prefetch overlap
    # A/B on chip; measured no-win at XL-512, so default stays 1)
    import os

    unroll = int(os.environ.get("CONTROLAR_SCAN_UNROLL", unroll))
    h, _ = jax.lax.scan(body, h, xs, unroll=unroll)
    return h, None


def _logits(params: Params, cfg: GPTConfig, h: jnp.ndarray) -> jnp.ndarray:
    h = rms_norm(h, params["norm"], cfg.norm_eps)
    return wdot(h, params["output"]).astype(jnp.float32)


def forward_train(
    params: Params,
    cfg: GPTConfig,
    prefix_emb: jnp.ndarray,
    idx: jnp.ndarray,
    cond_tokens: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    targets: Optional[jnp.ndarray] = None,
    valid: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    remat_policy: str = "full",
    key_valid: Optional[jnp.ndarray] = None,
    attn_impl: Optional[str] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Teacher-forced forward (ref gpt_t2i.py:420-481, training branch).

    prefix_emb: (B, cls_token_num, dim) already-embedded class/caption prefix.
    idx: (B, T_img - 1) ground-truth image tokens (z[:, :-1]).
    cond_tokens: (B, block_size, dim) output of `control_tokens` (post CFG-drop).
    mask: optional boolean (B, 1, T, T) attention mask (True = attend) —
      forces the materialized einsum path (arbitrary masks only there).
    key_valid: optional (B, T) bool per-key column mask — the compact form of
      the t2i emb mask (causal & (key_valid | diagonal)); works with BOTH
      attention implementations and is what the trainers pass.
    attn_impl: 'blockwise' (flash, O(T*block) memory — the training default),
      'einsum' (materialized (T,S) scores — the parity path), or None for
      auto: einsum when an explicit `mask` is given, else blockwise.
    targets: (B, T_img) for the CE loss; valid: (B,) 0/1 sample mask.

    Dropout: token/ffn/resid dropout are applied when deterministic=False
    using `rng` (ref ModelArgs dropout rates); attn dropout is 0 in all
    reference configs and is not implemented.
    """
    from controlar_tpu.parallel.sharding import constrain_batch, mesh_active

    if mesh_active():
        # Under SPMD, a gather's backward is a scatter-add into the
        # (tp, fsdp)-sharded table, whose update layout the partitioner can
        # only reach via involuntary full rematerialization of the cotangent.
        # A one-hot matmul is the TPU-idiomatic embedding: both directions
        # are dot_generals the partitioner shards with standard collectives
        # (flops are negligible at train shapes).
        table = params["tok_embeddings"]
        onehot = jax.nn.one_hot(idx, table.shape[0], dtype=table.dtype)
        tok = constrain_batch(onehot @ table)
    else:
        tok = params["tok_embeddings"][idx]
    h = jnp.concatenate([prefix_emb, tok], axis=1)
    t = h.shape[1]
    if not deterministic and cfg.token_dropout_p > 0 and rng is not None:
        keep = jax.random.bernoulli(
            jax.random.fold_in(rng, 0), 1.0 - cfg.token_dropout_p, h.shape
        )
        h = jnp.where(keep, h / (1.0 - cfg.token_dropout_p), 0.0)

    if attn_impl is None:
        # an explicit dense mask can only run through the einsum path; the
        # trainers pass the compact key_valid and get flash attention.
        # CONTROLAR_TRAIN_ATTN=einsum is the A/B escape hatch.
        import os

        attn_impl = "einsum" if mask is not None else os.environ.get(
            "CONTROLAR_TRAIN_ATTN", "blockwise")
    if attn_impl == "blockwise" and mask is not None:
        raise ValueError(
            "attn_impl='blockwise' expresses masks via key_valid (B, T); "
            "pass key_valid instead of a materialized mask")
    if attn_impl == "einsum" and mask is None and key_valid is not None:
        # materialize causal & (key_valid | diag) — identical semantics to
        # the blockwise path, for parity tests and the A/B switch
        rows = np.arange(t)[:, None]
        cols = np.arange(t)[None, :]
        causal = jnp.asarray(rows >= cols)
        eye = jnp.asarray(rows == cols)
        mask = (causal[None] & (key_valid[:, None, :t] | eye[None]))[:, None]

    rope = make_rope_table(cfg)[:t]
    cls = cfg.cls_token_num

    def fuse_train(hh, fused_j):
        # add control tokens to every position that predicts an image token
        # (ref gpt_t2i.py:459; c2i equivalently adds over the full length)
        body = hh[:, cls - 1 :] + fused_j[:, : hh.shape[1] - (cls - 1)].astype(hh.dtype)
        return jnp.concatenate([hh[:, : cls - 1], body], axis=1)

    fused3 = fusion_projections(params, cond_tokens) if cond_tokens is not None else None
    layer_rng = None
    if not deterministic and rng is not None:
        layer_rng = jax.random.fold_in(rng, 1)
    h, _ = _scan_layers(
        params, cfg, h, rope, mask, fused3, fuse_train,
        drop_rng=layer_rng,
        remat=(remat_policy if remat_policy != "none" else False)
        if not deterministic else False,
        key_valid=key_valid, attn_impl=attn_impl,
    )
    logits = _logits(params, cfg, h)
    logits = logits[:, cls - 1 :]

    loss = None
    if targets is not None:
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        if valid is not None:
            w = valid[:, None].astype(jnp.float32) * jnp.ones_like(nll)
            loss = (nll * w).sum() / jnp.maximum(w.sum(), 1.0)
        else:
            loss = nll.mean()
    return logits, loss
