"""Fast decode engine: flat per-layer KV caches + Pallas flash-decode.

This is the performance-critical inference path (the reference needed a vLLM
fork + CUDA graphs for this, ref serve/; SURVEY.md §6). Differences from the
portable scan path in models/gpt.py:

- Caches are per-layer (B, S, H*D) arrays carried as a flat tuple — XLA keeps
  the row-append dynamic-update-slice in place across the decode scan, and
  each layer's slab feeds the Pallas kernel without a gather from a stacked
  (L, ...) array.
- The layer loop is a Python (unrolled) loop: no scan xs/ys re-stacking of
  multi-hundred-MB cache tensors per step (measured 4.6x on v5e).
- Attention is the flash_decode kernel on TPU (reads only rows [0, pos]);
  a masked full-slab XLA einsum otherwise (CPU tests, emb-mask prefixes).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from controlar_tpu.config import GPTConfig
from controlar_tpu.models.gpt import (
    Params,
    _fusion_gates,
    _qkv,
    make_rope_table,
)
from controlar_tpu.ops.cache_append import cache_append_rows
from controlar_tpu.ops.flash_decode2 import (
    flash_decode_attention2 as flash_decode_attention,
    flash_decode_attention2_q4,
    flash_decode_attention2_q8,
    flash_decode_attention2_q8_append,
)
from controlar_tpu.quant import (
    dequantize_kv4_slab,
    dequantize_kv_slab,
    kv4_row_width,
    quantize_kv_rows,
    quantize_kv_rows_4,
)
from controlar_tpu.ops.norms import rms_norm
from controlar_tpu.ops.rope import apply_rope_split, make_split_rope_tables
from controlar_tpu.quant import wdot


def _is_split(params: Params) -> bool:
    """split-rope layout marker (quant.to_split_rope): wqkv cols / wo rows
    permuted so RoPE is full-width elementwise — kills the (...,D/2,2)
    relayout copies (~330 us/step at GPT-3B)."""
    return "rope_split" in params


def _split_tables(cfg: GPTConfig):
    return make_split_rope_tables(
        make_rope_table(cfg), cfg.n_head, cfg.kv_heads, cfg.head_dim)


def _qkv_for(lp, cfg: GPTConfig, x: jnp.ndarray, rope, cos_sin):
    """Project + rotate under either layout. Returns q (B,T,H,D),
    k/v (B,T,KV,D) — identical shapes/semantics to models.gpt._qkv; only
    the within-head lane order differs (split), which cancels in q.k and
    in the permuted wo."""
    if cos_sin is None:
        return _qkv(lp, cfg, x, rope)
    b, t, _ = x.shape
    nh, nkv, hd = cfg.n_head, cfg.kv_heads, cfg.head_dim
    cos, sin = cos_sin
    qkv = wdot(x, lp["wqkv"])
    qk = apply_rope_split(qkv[..., : (nh + nkv) * hd], cos, sin, hd)
    q = qk[..., : nh * hd].reshape(b, t, nh, hd)
    k = qk[..., nh * hd:].reshape(b, t, nkv, hd)
    v = qkv[..., (nh + nkv) * hd:].reshape(b, t, nkv, hd)
    return q, k, v

# per-layer interleaved [k|v] slabs: rows are (2*H*D,) so one DMA chain
# fetches both in the flash kernel
Caches = Tuple[jnp.ndarray, ...]


def init_flat_caches(
    cfg: GPTConfig, batch: int, max_seq: int, dtype=jnp.bfloat16
) -> Caches:
    """dtype=jnp.int8 selects the quantized cache: per-layer
    {'kv': int8 rows, 's': (B, S, 2*H) f32 per-head scales} — halves the
    dominant decode HBM read; attention runs flash_decode_attention2_q8.
    dtype=jnp.int4 selects the nibble-packed cache {'kv4': ..., 's': ...}
    (quantize_kv_rows_4 layout) — halves it again; attention runs
    flash_decode_attention2_q4. Quality per mode: eval/quant_report.py."""
    shape = (batch, max_seq, 2 * cfg.kv_heads * cfg.head_dim)
    sshape = (batch, max_seq, scale_pad(cfg.kv_heads))
    if dtype == jnp.int8:
        # scale lanes padded to 128 (Mosaic DMA tiling requirement)
        return tuple(
            {"kv": jnp.zeros(shape, jnp.int8), "s": jnp.zeros(sshape, jnp.float32)}
            for _ in range(cfg.n_layer)
        )
    if dtype == jnp.int4:
        w = kv4_row_width(cfg.kv_heads, cfg.head_dim)
        return tuple(
            {"kv4": jnp.zeros((batch, max_seq, 2 * w), jnp.int8),
             "s": jnp.zeros(sshape, jnp.float32)}
            for _ in range(cfg.n_layer)
        )
    return tuple(jnp.zeros(shape, dtype) for _ in range(cfg.n_layer))


def init_stacked_caches(
    cfg: GPTConfig, batch: int, max_seq: int, dtype=jnp.bfloat16
):
    """STACKED cache: one (L, B, S, R) array per stream instead of a
    per-layer tuple. Pairs with the deferred-append decode step
    (_decode_step_flat_stacked): the flash kernels read the stack at a
    traced layer index and score the in-flight row from VMEM, so the step
    appends ALL layers' rows with one dynamic-update-slice per stream
    (2 ops/step) instead of 2 per layer (48 at GPT-3B, ~0.33 ms/step of
    dispatch glue). Uniform positions only (the generate() regime)."""
    shape = (cfg.n_layer, batch, max_seq, 2 * cfg.kv_heads * cfg.head_dim)
    sshape = (cfg.n_layer, batch, max_seq, scale_pad(cfg.kv_heads))
    if dtype == jnp.int8:
        return {"kv": jnp.zeros(shape, jnp.int8),
                "s": jnp.zeros(sshape, jnp.float32)}
    if dtype == jnp.int4:
        w = kv4_row_width(cfg.kv_heads, cfg.head_dim)
        return {"kv4": jnp.zeros((cfg.n_layer, batch, max_seq, 2 * w),
                                 jnp.int8),
                "s": jnp.zeros(sshape, jnp.float32)}
    return jnp.zeros(shape, dtype)


def is_stacked_caches(caches) -> bool:
    return not isinstance(caches, tuple)


def scale_pad(kv_heads: int) -> int:
    return max(128, ((2 * kv_heads + 127) // 128) * 128)


def _pad_scales(s_rows: jnp.ndarray, kv_heads: int) -> jnp.ndarray:
    pad = scale_pad(kv_heads) - 2 * kv_heads
    widths = [(0, 0)] * (s_rows.ndim - 1) + [(0, pad)]
    return jnp.pad(s_rows, widths)


def is_quantized_cache(caches_or_layer) -> bool:
    c = caches_or_layer[0] if isinstance(caches_or_layer, tuple) else caches_or_layer
    return isinstance(c, dict)


def cache_seq_len(caches: Caches) -> int:
    if is_stacked_caches(caches):
        arr = caches.get("kv", caches.get("kv4")) if isinstance(
            caches, dict) else caches
        return arr.shape[2]
    c0 = caches[0]
    if isinstance(c0, dict):
        return c0.get("kv", c0.get("kv4")).shape[1]
    return c0.shape[1]


def _quantize_rows_for(cache, kv_rows, kv_heads, split=False):
    """Quantize new rows to the cache's own format ({kv} int8 / {kv4})."""
    if "kv4" in cache:
        q_rows, s_rows = quantize_kv_rows_4(kv_rows, kv_heads, split=split)
    else:
        q_rows, s_rows = quantize_kv_rows(kv_rows, kv_heads)
    return q_rows, _pad_scales(s_rows, kv_heads)


def _cache_kv_key(cache) -> str:
    return "kv4" if "kv4" in cache else "kv"


def _dequant_slab(cache, cfg, dtype, split=False):
    if "kv4" in cache:
        return dequantize_kv4_slab(cache["kv4"], cache["s"], cfg.kv_heads,
                                   cfg.head_dim, dtype, split=split)
    return dequantize_kv_slab(cache["kv"], cache["s"], cfg.kv_heads, dtype)


def _flash_quant_attn(q2d, cache, pos, col_bias, cfg, split=False):
    if "kv4" in cache:
        return flash_decode_attention2_q4(
            q2d, cache["kv4"], cache["s"], pos, col_bias,
            n_head=cfg.n_head, head_dim=cfg.head_dim, split=split)
    return flash_decode_attention2_q8(
        q2d, cache["kv"], cache["s"], pos, col_bias, n_head=cfg.n_head)


_UNSTACK_CACHE: Dict[int, Any] = {}


def unstack_layers(params: Params) -> Params:
    """Split the stacked (L, ...) layer weights into per-layer arrays.

    Inside jit, slicing a stacked weight materializes a copy every decode
    step (~1 ms/step at GPT-XL). Callers unstack ONCE outside jit and pass
    the unstacked tree; training keeps the stacked layout for lax.scan.
    Results are cached per stacked-tree identity (the host-side slicing
    itself costs ~100 dispatches).
    """
    if isinstance(params["layers"], (list, tuple)):
        return params
    import weakref

    # purge entries whose stacked source died (else unstacked copies leak)
    for k in [k for k, (r, _) in _UNSTACK_CACHE.items() if r() is None]:
        del _UNSTACK_CACHE[k]
    anchor = jax.tree.leaves(params["layers"])[0]  # weakref-able jax.Array
    # key on the layers CONTAINER + anchor: keying on the anchor alone
    # aliased distinct trees sharing their first leaf (e.g. a quantized copy
    # whose norms are untouched) to the same cache entry
    key = (id(params["layers"]), id(anchor))
    hit = _UNSTACK_CACHE.get(key)
    if hit is not None and hit[0]() is anchor:
        return hit[1]
    n_layer = anchor.shape[0]
    layers = tuple(
        jax.tree.map(lambda a: a[l], params["layers"]) for l in range(n_layer)
    )
    out = {k: v for k, v in params.items() if k != "layers"}
    out["layers"] = layers
    try:
        _UNSTACK_CACHE[key] = (weakref.ref(anchor), out)
    except TypeError:
        pass
    return out


def _layer_params(params: Params, l: int):
    if isinstance(params["layers"], (list, tuple)):
        return params["layers"][l]
    return jax.tree.map(lambda a: a[l], params["layers"])


# A/B toggle for the single-call fused W4 FFN kernel (w13 + gate + w2 in
# one Pallas program; the (B, 2F) intermediate never round-trips HBM)
W4_FFN_FUSED = True


def ffn(lp, x: jnp.ndarray) -> jnp.ndarray:
    """SwiGLU FFN; supports the fused-w13 layout (one streamed weight for
    w1|w3 — halves the per-layer kernel dispatches on the W4 path) and,
    when both weights are W4 and the shapes fit VMEM, the fully-fused
    single-kernel FFN (ops/w4_matmul.w4_ffn)."""
    if "w13" in lp:
        from controlar_tpu.quant import is_quantized_w4

        if (W4_FFN_FUSED and is_quantized_w4(lp["w13"])
                and is_quantized_w4(lp["w2"])):
            from controlar_tpu.ops.w4_matmul import w4_ffn, w4_ffn_fits

            lead = x.shape[:-1]
            x2 = x.reshape(-1, x.shape[-1])
            if (jax.default_backend() == "tpu" and x2.shape[0] <= 256
                    and w4_ffn_fits(lp["w13"]["q4"], lp["w13"]["s"],
                                    lp["w2"]["q4"], lp["w2"]["s"],
                                    x2.shape[0], x2.shape[-1])):
                out = w4_ffn(x2, lp["w13"]["q4"], lp["w13"]["s"],
                             lp["w2"]["q4"], lp["w2"]["s"],
                             out_dtype=x.dtype)
                return out.reshape(*lead, out.shape[-1])
        y = wdot(x, lp["w13"])
        h1, h3 = jnp.split(y, 2, axis=-1)
        return wdot(jax.nn.silu(h1) * h3, lp["w2"])
    return wdot(jax.nn.silu(wdot(x, lp["w1"])) * wdot(x, lp["w3"]), lp["w2"])


def _logits(params: Params, cfg: GPTConfig, h: jnp.ndarray) -> jnp.ndarray:
    h = rms_norm(h, params["norm"], cfg.norm_eps)
    return wdot(h, params["output"]).astype(jnp.float32)


def prefill_flat(
    params: Params,
    cfg: GPTConfig,
    caches: Caches,
    prefix_emb: jnp.ndarray,
    fused3: Optional[jnp.ndarray],
    col_mask: Optional[jnp.ndarray],
    control_strength=1.0,
) -> Tuple[jnp.ndarray, Caches]:
    """Prefill the prefix; returns (last-position logits, caches)."""
    b, t, _ = prefix_emb.shape
    gate, fidx = _fusion_gates(cfg)
    split = _is_split(params)
    if split:
        rope, cos_sin = None, tuple(
            tb[:t][None] for tb in _split_tables(cfg))
    else:
        rope, cos_sin = make_rope_table(cfg)[:t], None
    rows = np.arange(t)[:, None]
    cols = np.arange(t)[None, :]
    causal = jnp.asarray(rows >= cols)
    if col_mask is not None:
        m = causal[None] & (col_mask[:, None, :] | jnp.asarray(rows == cols)[None])
    else:
        m = causal[None]
    mask = m[:, None]  # (B|1, 1, T, T)

    stacked = is_stacked_caches(caches)
    kvs = [None] * cfg.n_layer if stacked else list(caches)
    stk_rows, stk_scales = [], []
    h = prefix_emb
    hd = cfg.n_head * cfg.head_dim
    for l in range(cfg.n_layer):
        lp = _layer_params(params, l)
        if fused3 is not None and gate[l] > 0:
            add = (control_strength * fused3[fidx[l]][:, 0:1]).astype(h.dtype)
            h = jnp.concatenate([h[:, :-1], h[:, -1:] + add], axis=1)
        x = rms_norm(h, lp["attention_norm"], cfg.norm_eps)
        q, k, v = _qkv_for(lp, cfg, x, rope, cos_sin)
        kv_rows = jnp.concatenate(
            [k.reshape(b, t, hd), v.reshape(b, t, hd)], axis=-1
        )
        if stacked:
            if isinstance(caches, dict):
                q_rows, s_rows = _quantize_rows_for(
                    caches, kv_rows, cfg.kv_heads, split=split)
                stk_rows.append(q_rows)
                stk_scales.append(s_rows)
            else:
                stk_rows.append(kv_rows.astype(caches.dtype))
        elif isinstance(kvs[l], dict):
            kk_ = _cache_kv_key(kvs[l])
            q_rows, s_rows = _quantize_rows_for(kvs[l], kv_rows, cfg.kv_heads,
                                                split=split)
            kvs[l] = {
                kk_: jax.lax.dynamic_update_slice(kvs[l][kk_], q_rows, (0, 0, 0)),
                "s": jax.lax.dynamic_update_slice(kvs[l]["s"], s_rows, (0, 0, 0)),
            }
        else:
            kvs[l] = jax.lax.dynamic_update_slice(
                kvs[l], kv_rows.astype(kvs[l].dtype), (0, 0, 0)
            )
        scores = jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32)
        scores = scores * (1.0 / np.sqrt(cfg.head_dim))
        scores = jnp.where(mask, scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        attn = jnp.einsum(
            "bhts,bshd->bthd", probs, v, preferred_element_type=jnp.float32
        ).astype(x.dtype).reshape(b, t, hd)
        h = h + wdot(attn, lp["wo"])
        x = rms_norm(h, lp["ffn_norm"], cfg.norm_eps)
        h = h + ffn(lp, x)
    logits = _logits(params, cfg, h[:, -1])
    if stacked:
        if isinstance(caches, dict):
            kk_ = _cache_kv_key(caches)
            new = {
                kk_: jax.lax.dynamic_update_slice(
                    caches[kk_], jnp.stack(stk_rows), (0, 0, 0, 0)),
                "s": jax.lax.dynamic_update_slice(
                    caches["s"], jnp.stack(stk_scales), (0, 0, 0, 0)),
            }
        else:
            new = jax.lax.dynamic_update_slice(
                caches, jnp.stack(stk_rows), (0, 0, 0, 0))
        return logits, new
    return logits, tuple(kvs)


def decode_step_multi(
    params: Params,
    cfg: GPTConfig,
    caches: Caches,
    token: jnp.ndarray,
    pos: jnp.ndarray,
    fused3: Optional[jnp.ndarray] = None,
    control_strength=1.0,
    use_flash: bool = True,
    col_mask_full: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Caches]:
    """Decode step with PER-SLOT positions: pos (B,) int32 — the serving
    engine's continuous-batching primitive (each slot at its own depth;
    replaces the reference's vLLM scheduler+paged attention machinery,
    serve/model_runner.py)."""
    if is_stacked_caches(caches):
        return _decode_step_multi_stacked(
            params, cfg, caches, token, pos, fused3, control_strength,
            use_flash=use_flash, col_mask_full=col_mask_full)
    b = token.shape[0]
    hd = cfg.n_head * cfg.head_dim
    gate, fidx = _fusion_gates(cfg)
    h = params["tok_embeddings"][token][:, None, :]
    split = _is_split(params)
    if split:
        rope, cos_sin = None, tuple(
            tb[pos][:, None] for tb in _split_tables(cfg))  # (B, 1, W2)
    else:
        rope, cos_sin = make_rope_table(cfg)[pos][:, None], None
    fuse_pos = pos - cfg.cls_token_num + 1  # (B,)

    s_max = cache_seq_len(caches)
    col_bias = None
    if use_flash:
        if col_mask_full is not None:
            col_bias = jnp.where(col_mask_full, 0.0, -1e9).astype(jnp.float32)
    else:
        cols = jnp.arange(s_max)
        mask = (cols[None, :] <= pos[:, None])[:, None, None, :]
        if col_mask_full is not None:
            mask = mask & col_mask_full[:, None, None, :]

    def write_row(cache, row, p):
        # Pallas RMW append under flash: XLA's vmapped DUS lowers to a
        # scatter that is catastrophically slow on TPU
        if isinstance(cache, dict):
            kk_ = _cache_kv_key(cache)
            q_row, s_row = _quantize_rows_for(cache, row[:, 0], cfg.kv_heads,
                                              split=split)
            if use_flash:
                return {kk_: cache_append_rows(cache[kk_], q_row, p),
                        "s": cache_append_rows(cache["s"], s_row, p)}
            vdus = jax.vmap(
                lambda c, r, pp: jax.lax.dynamic_update_slice(c, r, (pp, 0))
            )
            return {kk_: vdus(cache[kk_], q_row[:, None], p),
                    "s": vdus(cache["s"], s_row[:, None], p)}
        if use_flash:
            return cache_append_rows(cache, row[:, 0], p)
        return jax.vmap(
            lambda c, r, pp: jax.lax.dynamic_update_slice(c, r, (pp, 0))
        )(cache, row, p)

    kvs = list(caches)
    for l in range(cfg.n_layer):
        lp = _layer_params(params, l)
        if fused3 is not None and gate[l] > 0:
            row = jax.vmap(
                lambda f, p: jax.lax.dynamic_slice_in_dim(f, p, 1, axis=0)
            )(fused3[fidx[l]], fuse_pos)
            h = h + (control_strength * row).astype(h.dtype)
        x = rms_norm(h, lp["attention_norm"], cfg.norm_eps)
        q, k, v = _qkv_for(lp, cfg, x, rope, cos_sin)
        kv_row = jnp.concatenate(
            [k.reshape(b, 1, hd), v.reshape(b, 1, hd)], axis=-1
        )
        if use_flash:
            if not isinstance(kvs[l], dict):
                kv_row = kv_row.astype(kvs[l].dtype)
            kvs[l] = write_row(kvs[l], kv_row, pos)
            if isinstance(kvs[l], dict):
                attn = _flash_quant_attn(
                    q.reshape(b, hd), kvs[l], pos, col_bias, cfg, split=split
                ).astype(h.dtype)[:, None, :]
            else:
                attn = flash_decode_attention(
                    q.reshape(b, hd), kvs[l], pos, col_bias, n_head=cfg.n_head
                ).astype(h.dtype)[:, None, :]
        else:
            if not isinstance(kvs[l], dict):
                kv_row = kv_row.astype(kvs[l].dtype)
            kvs[l] = write_row(kvs[l], kv_row, pos)
            slab = (_dequant_slab(kvs[l], cfg, h.dtype, split=split)
                    if isinstance(kvs[l], dict) else kvs[l])
            kl = slab[:, :, :hd].reshape(b, s_max, cfg.kv_heads, cfg.head_dim)
            vl = slab[:, :, hd:].reshape(b, s_max, cfg.kv_heads, cfg.head_dim)
            scores = jnp.einsum(
                "bthd,bshd->bhts", q, kl, preferred_element_type=jnp.float32
            ) * (1.0 / np.sqrt(cfg.head_dim))
            scores = jnp.where(mask, scores, -jnp.inf)
            probs = jax.nn.softmax(scores, axis=-1).astype(h.dtype)
            attn = jnp.einsum(
                "bhts,bshd->bthd", probs, vl, preferred_element_type=jnp.float32
            ).astype(h.dtype).reshape(b, 1, hd)
        h = h + wdot(attn, lp["wo"])
        x = rms_norm(h, lp["ffn_norm"], cfg.norm_eps)
        h = h + ffn(lp, x)
    logits = _logits(params, cfg, h[:, -1])
    return logits, tuple(kvs)


def decode_step_flat(
    params: Params,
    cfg: GPTConfig,
    caches: Caches,
    token: jnp.ndarray,
    pos: jnp.ndarray,
    fused3: Optional[jnp.ndarray],
    col_mask_full: Optional[jnp.ndarray],
    control_strength=1.0,
    use_flash: bool = True,
) -> Tuple[jnp.ndarray, Caches]:
    """One decode step at position pos. token: (B,)."""
    if is_stacked_caches(caches):
        return _decode_step_flat_stacked(
            params, cfg, caches, token, pos, fused3, col_mask_full,
            control_strength, use_flash=use_flash)
    b = token.shape[0]
    hd = cfg.n_head * cfg.head_dim
    gate, fidx = _fusion_gates(cfg)
    h = params["tok_embeddings"][token][:, None, :]
    split = _is_split(params)
    if split:
        rope, cos_sin = None, tuple(
            jax.lax.dynamic_slice_in_dim(tb, pos, 1, axis=0)
            for tb in _split_tables(cfg))  # each (1, W2), broadcasts over B
    else:
        rope = jax.lax.dynamic_slice_in_dim(
            make_rope_table(cfg), pos, 1, axis=0)
        cos_sin = None
    fuse_pos = pos - cfg.cls_token_num + 1

    s_max = cache_seq_len(caches)
    col_bias = None
    if use_flash:
        if col_mask_full is not None:
            col_bias = jnp.where(col_mask_full, 0.0, -1e9).astype(jnp.float32)
    else:
        cols = jnp.arange(s_max)
        allowed = cols[None, :] <= pos
        if col_mask_full is not None:
            allowed = allowed & col_mask_full
        mask = allowed[:, None, None, :]

    kvs = list(caches)
    for l in range(cfg.n_layer):
        lp = _layer_params(params, l)
        if fused3 is not None and gate[l] > 0:
            row = jax.lax.dynamic_slice_in_dim(fused3[fidx[l]], fuse_pos, 1, axis=1)
            h = h + (control_strength * row).astype(h.dtype)
        x = rms_norm(h, lp["attention_norm"], cfg.norm_eps)
        q, k, v = _qkv_for(lp, cfg, x, rope, cos_sin)  # (B, 1, H, D)
        kv_row = jnp.concatenate(
            [k.reshape(b, 1, hd), v.reshape(b, 1, hd)], axis=-1
        )
        if isinstance(kvs[l], dict):
            kk_ = _cache_kv_key(kvs[l])
            q_row, s_row = _quantize_rows_for(kvs[l], kv_row, cfg.kv_heads,
                                              split=split)
            kvs[l] = {
                kk_: jax.lax.dynamic_update_slice(kvs[l][kk_], q_row, (0, pos, 0)),
                "s": jax.lax.dynamic_update_slice(kvs[l]["s"], s_row, (0, pos, 0)),
            }
        else:
            kvs[l] = jax.lax.dynamic_update_slice(
                kvs[l], kv_row.astype(kvs[l].dtype), (0, pos, 0)
            )
        if use_flash:
            if isinstance(kvs[l], dict):
                attn = _flash_quant_attn(
                    q.reshape(b, hd), kvs[l], pos, col_bias, cfg, split=split
                ).astype(h.dtype)[:, None, :]
            else:
                attn = flash_decode_attention(
                    q.reshape(b, hd), kvs[l], pos, col_bias, n_head=cfg.n_head
                ).astype(h.dtype)[:, None, :]
        else:
            slab = (_dequant_slab(kvs[l], cfg, h.dtype, split=split)
                    if isinstance(kvs[l], dict) else kvs[l])
            kl = slab[:, :, :hd].reshape(b, s_max, cfg.kv_heads, cfg.head_dim)
            vl = slab[:, :, hd:].reshape(b, s_max, cfg.kv_heads, cfg.head_dim)
            scores = jnp.einsum(
                "bthd,bshd->bhts", q, kl, preferred_element_type=jnp.float32
            ) * (1.0 / np.sqrt(cfg.head_dim))
            scores = jnp.where(mask, scores, -jnp.inf)
            probs = jax.nn.softmax(scores, axis=-1).astype(h.dtype)
            attn = jnp.einsum(
                "bhts,bshd->bthd", probs, vl, preferred_element_type=jnp.float32
            ).astype(h.dtype).reshape(b, 1, hd)
        h = h + wdot(attn, lp["wo"])
        x = rms_norm(h, lp["ffn_norm"], cfg.norm_eps)
        h = h + ffn(lp, x)
    logits = _logits(params, cfg, h[:, -1])
    return logits, tuple(kvs)


def _decode_step_flat_stacked(
    params: Params,
    cfg: GPTConfig,
    caches,
    token: jnp.ndarray,
    pos: jnp.ndarray,
    fused3: Optional[jnp.ndarray],
    col_mask_full: Optional[jnp.ndarray],
    control_strength=1.0,
    use_flash: bool = True,
) -> Tuple[jnp.ndarray, Any]:
    """Deferred-append decode step over a STACKED (L, B, S, R) cache.

    Per layer, attention runs over HBM rows [0, pos) plus the in-flight row
    passed to the kernel in VMEM (ops/flash_decode_stacked); the appends for
    ALL layers happen at the end of the step as one dynamic-update-slice per
    cache stream. Positions are uniform (scalar pos) — the generate() /
    spec-verify regime. Replaces 2 DUS per layer (~0.33 ms/step at GPT-3B)
    with 2 per step."""
    from controlar_tpu.ops.flash_decode_stacked import (
        flash_stacked, flash_stacked_q4, flash_stacked_q8)

    b = token.shape[0]
    hd = cfg.n_head * cfg.head_dim
    gate, fidx = _fusion_gates(cfg)
    h = params["tok_embeddings"][token][:, None, :]
    split = _is_split(params)
    if split:
        rope, cos_sin = None, tuple(
            jax.lax.dynamic_slice_in_dim(tb, pos, 1, axis=0)
            for tb in _split_tables(cfg))
    else:
        rope = jax.lax.dynamic_slice_in_dim(
            make_rope_table(cfg), pos, 1, axis=0)
        cos_sin = None
    fuse_pos = pos - cfg.cls_token_num + 1

    quant = isinstance(caches, dict)
    kk_ = _cache_kv_key(caches) if quant else None
    s_max = cache_seq_len(caches)
    col_bias = None
    if use_flash:
        if col_mask_full is not None:
            col_bias = jnp.where(col_mask_full, 0.0, -1e9).astype(jnp.float32)
    else:
        cols = jnp.arange(s_max)
        allowed = cols[None, :] <= pos
        if col_mask_full is not None:
            allowed = allowed & col_mask_full
        mask = allowed[:, None, None, :]

    stk_rows, stk_scales = [], []
    for l in range(cfg.n_layer):
        lp = _layer_params(params, l)
        if fused3 is not None and gate[l] > 0:
            row = jax.lax.dynamic_slice_in_dim(fused3[fidx[l]], fuse_pos, 1,
                                               axis=1)
            h = h + (control_strength * row).astype(h.dtype)
        x = rms_norm(h, lp["attention_norm"], cfg.norm_eps)
        q, k, v = _qkv_for(lp, cfg, x, rope, cos_sin)
        kv_row = jnp.concatenate(
            [k.reshape(b, 1, hd), v.reshape(b, 1, hd)], axis=-1
        )
        if quant:
            q_row, s_row = _quantize_rows_for(caches, kv_row[:, 0],
                                              cfg.kv_heads, split=split)
            stk_rows.append(q_row)
            stk_scales.append(s_row)
        else:
            stk_rows.append(kv_row[:, 0].astype(caches.dtype))

        if use_flash:
            lyr = jnp.asarray(l, jnp.int32)
            if quant and kk_ == "kv4":
                attn = flash_stacked_q4(
                    q.reshape(b, hd), stk_rows[-1], stk_scales[-1],
                    caches["kv4"], caches["s"], lyr, pos, col_bias,
                    n_head=cfg.n_head, head_dim=cfg.head_dim, split=split,
                ).astype(h.dtype)[:, None, :]
            elif quant:
                attn = flash_stacked_q8(
                    q.reshape(b, hd), stk_rows[-1], stk_scales[-1],
                    caches["kv"], caches["s"], lyr, pos, col_bias,
                    n_head=cfg.n_head,
                ).astype(h.dtype)[:, None, :]
            else:
                attn = flash_stacked(
                    q.reshape(b, hd), stk_rows[-1], caches, lyr, pos,
                    col_bias, n_head=cfg.n_head,
                ).astype(h.dtype)[:, None, :]
        else:
            # XLA fallback (CPU tests): materialize this layer's slab with
            # the in-flight row written, then masked attention
            if quant:
                lc = {kk_: jax.lax.dynamic_update_slice(
                          caches[kk_][l], stk_rows[-1][:, None], (0, pos, 0)),
                      "s": jax.lax.dynamic_update_slice(
                          caches["s"][l], stk_scales[-1][:, None],
                          (0, pos, 0))}
                slab = _dequant_slab(lc, cfg, h.dtype, split=split)
            else:
                slab = jax.lax.dynamic_update_slice(
                    caches[l], stk_rows[-1][:, None].astype(caches.dtype),
                    (0, pos, 0))
            kl = slab[:, :, :hd].reshape(b, s_max, cfg.kv_heads, cfg.head_dim)
            vl = slab[:, :, hd:].reshape(b, s_max, cfg.kv_heads, cfg.head_dim)
            scores = jnp.einsum(
                "bthd,bshd->bhts", q, kl, preferred_element_type=jnp.float32
            ) * (1.0 / np.sqrt(cfg.head_dim))
            scores = jnp.where(mask, scores, -jnp.inf)
            probs = jax.nn.softmax(scores, axis=-1).astype(h.dtype)
            attn = jnp.einsum(
                "bhts,bshd->bthd", probs, vl, preferred_element_type=jnp.float32
            ).astype(h.dtype).reshape(b, 1, hd)
        h = h + wdot(attn, lp["wo"])
        x = rms_norm(h, lp["ffn_norm"], cfg.norm_eps)
        h = h + ffn(lp, x)

    # deferred batched append: one DUS per stream for all L layers
    if quant:
        new = {
            kk_: jax.lax.dynamic_update_slice(
                caches[kk_], jnp.stack(stk_rows)[:, :, None],
                (0, 0, pos, 0)),
            "s": jax.lax.dynamic_update_slice(
                caches["s"], jnp.stack(stk_scales)[:, :, None],
                (0, 0, pos, 0)),
        }
    else:
        new = jax.lax.dynamic_update_slice(
            caches, jnp.stack(stk_rows)[:, :, None], (0, 0, pos, 0))
    logits = _logits(params, cfg, h[:, -1])
    return logits, new


def _stacked_vdus(stk, rows, p):
    """XLA fallback write: stk[l, b, p[b]] = rows[l, b] (CPU tests)."""
    return jax.vmap(
        lambda c, r: jax.vmap(
            lambda cc, rr, pp: jax.lax.dynamic_update_slice(
                cc, rr[None], (pp, 0))
        )(c, r, p)
    )(stk, rows)


def _decode_step_multi_stacked(
    params: Params,
    cfg: GPTConfig,
    caches,
    token: jnp.ndarray,
    pos: jnp.ndarray,
    fused3: Optional[jnp.ndarray] = None,
    control_strength=1.0,
    use_flash: bool = True,
    col_mask_full: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Any]:
    """PER-SLOT decode step over a STACKED (L, B, S, R) cache.

    Attention per layer runs through ops/flash_decode_stacked (HBM rows
    [0, pos_b) + in-flight row from VMEM); the appends for all L layers
    collapse into ONE cache_append_rows_stacked call per stream (grid
    (L, B) RMW windows) instead of a pallas_call per layer per stream.
    Positions are clamped to >= 1 here (the stacked kernels' chained DMA
    prefetch requires every slot to stream at least one block; a pos-0
    slot has no prefill and is garbage by definition — the serving engine
    overwrites its slab wholesale at admission)."""
    from controlar_tpu.ops.cache_append import cache_append_rows_stacked
    from controlar_tpu.ops.flash_decode_stacked import (
        flash_stacked, flash_stacked_q4, flash_stacked_q8)

    pos = jnp.maximum(pos, 1)
    b = token.shape[0]
    hd = cfg.n_head * cfg.head_dim
    gate, fidx = _fusion_gates(cfg)
    h = params["tok_embeddings"][token][:, None, :]
    split = _is_split(params)
    if split:
        rope, cos_sin = None, tuple(
            tb[pos][:, None] for tb in _split_tables(cfg))  # (B, 1, W2)
    else:
        rope, cos_sin = make_rope_table(cfg)[pos][:, None], None
    fuse_pos = pos - cfg.cls_token_num + 1  # (B,)

    quant = isinstance(caches, dict)
    kk_ = _cache_kv_key(caches) if quant else None
    s_max = cache_seq_len(caches)
    col_bias = None
    if use_flash:
        if col_mask_full is not None:
            col_bias = jnp.where(col_mask_full, 0.0, -1e9).astype(jnp.float32)
    else:
        cols = jnp.arange(s_max)
        mask = (cols[None, :] <= pos[:, None])[:, None, None, :]
        if col_mask_full is not None:
            mask = mask & col_mask_full[:, None, None, :]

    stk_rows, stk_scales = [], []
    for l in range(cfg.n_layer):
        lp = _layer_params(params, l)
        if fused3 is not None and gate[l] > 0:
            row = jax.vmap(
                lambda f, p: jax.lax.dynamic_slice_in_dim(f, p, 1, axis=0)
            )(fused3[fidx[l]], fuse_pos)
            h = h + (control_strength * row).astype(h.dtype)
        x = rms_norm(h, lp["attention_norm"], cfg.norm_eps)
        q, k, v = _qkv_for(lp, cfg, x, rope, cos_sin)
        kv_row = jnp.concatenate(
            [k.reshape(b, 1, hd), v.reshape(b, 1, hd)], axis=-1
        )
        if quant:
            q_row, s_row = _quantize_rows_for(caches, kv_row[:, 0],
                                              cfg.kv_heads, split=split)
            stk_rows.append(q_row)
            stk_scales.append(s_row)
        else:
            stk_rows.append(kv_row[:, 0].astype(caches.dtype))

        if use_flash:
            lyr = jnp.asarray(l, jnp.int32)
            if quant and kk_ == "kv4":
                attn = flash_stacked_q4(
                    q.reshape(b, hd), stk_rows[-1], stk_scales[-1],
                    caches["kv4"], caches["s"], lyr, pos, col_bias,
                    n_head=cfg.n_head, head_dim=cfg.head_dim, split=split,
                ).astype(h.dtype)[:, None, :]
            elif quant:
                attn = flash_stacked_q8(
                    q.reshape(b, hd), stk_rows[-1], stk_scales[-1],
                    caches["kv"], caches["s"], lyr, pos, col_bias,
                    n_head=cfg.n_head,
                ).astype(h.dtype)[:, None, :]
            else:
                attn = flash_stacked(
                    q.reshape(b, hd), stk_rows[-1], caches, lyr, pos,
                    col_bias, n_head=cfg.n_head,
                ).astype(h.dtype)[:, None, :]
        else:
            vdus = jax.vmap(
                lambda c, r, pp: jax.lax.dynamic_update_slice(c, r, (pp, 0)))
            if quant:
                lc = {kk_: vdus(caches[kk_][l], stk_rows[-1][:, None], pos),
                      "s": vdus(caches["s"][l], stk_scales[-1][:, None], pos)}
                slab = _dequant_slab(lc, cfg, h.dtype, split=split)
            else:
                slab = vdus(caches[l],
                            stk_rows[-1][:, None].astype(caches.dtype), pos)
            kl = slab[:, :, :hd].reshape(b, s_max, cfg.kv_heads, cfg.head_dim)
            vl = slab[:, :, hd:].reshape(b, s_max, cfg.kv_heads, cfg.head_dim)
            scores = jnp.einsum(
                "bthd,bshd->bhts", q, kl, preferred_element_type=jnp.float32
            ) * (1.0 / np.sqrt(cfg.head_dim))
            scores = jnp.where(mask, scores, -jnp.inf)
            probs = jax.nn.softmax(scores, axis=-1).astype(h.dtype)
            attn = jnp.einsum(
                "bhts,bshd->bthd", probs, vl, preferred_element_type=jnp.float32
            ).astype(h.dtype).reshape(b, 1, hd)
        h = h + wdot(attn, lp["wo"])
        x = rms_norm(h, lp["ffn_norm"], cfg.norm_eps)
        h = h + ffn(lp, x)

    # deferred appends: one grid-(L,B) RMW kernel per stream (flash), or the
    # XLA scatter fallback (CPU tests)
    write = (cache_append_rows_stacked if use_flash else _stacked_vdus)
    if quant:
        new = {kk_: write(caches[kk_], jnp.stack(stk_rows), pos),
               "s": write(caches["s"], jnp.stack(stk_scales), pos)}
    else:
        new = write(caches, jnp.stack(stk_rows).astype(caches.dtype), pos)
    logits = _logits(params, cfg, h[:, -1])
    return logits, new
