"""T5 encoder (flan-t5-xl) — TPU-native JAX.

The t2i text encoder (ref language/t5.py:19-79 wraps HF T5EncoderModel;
contract: captions -> (B, 120, 2048) embeddings + attention mask). Faithful
re-implementation of the HF T5 encoder stack:

- T5LayerNorm: RMS (no mean subtraction, no bias), fp32, eps 1e-6.
- Attention: NO 1/sqrt(d) scaling (T5 trait), q/k/v/o bias-free, relative
  position bias (32 buckets, max distance 128, bidirectional) computed by
  layer 0 and shared by all layers.
- flan FFN: gated act — wi_0 (gelu tanh) * wi_1 -> wo.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 2048
    d_kv: int = 64
    d_ff: int = 5120
    n_layer: int = 24
    n_head: int = 32
    rel_buckets: int = 32
    rel_max_distance: int = 128
    layer_norm_eps: float = 1e-6


T5_XL = T5Config()


def t5_layer_norm(x, weight, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * weight


def _relative_position_bucket(rel_pos: np.ndarray, num_buckets: int, max_distance: int):
    """HF T5 bidirectional bucketing (modeling_t5._relative_position_bucket)."""
    nb = num_buckets // 2
    ret = (rel_pos > 0).astype(np.int64) * nb
    n = np.abs(rel_pos)
    max_exact = nb // 2
    is_small = n < max_exact
    large = max_exact + (
        np.log(n.clip(1) / max_exact) / np.log(max_distance / max_exact) * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    return ret + np.where(is_small, n, large)


def relative_bias(params: Params, cfg: T5Config, q_len: int, k_len: int) -> jnp.ndarray:
    """(1, H, q_len, k_len) additive attention bias from layer-0's table."""
    ctx = np.arange(q_len)[:, None]
    mem = np.arange(k_len)[None, :]
    buckets = _relative_position_bucket(
        mem - ctx, cfg.rel_buckets, cfg.rel_max_distance
    )  # (q, k)
    table = params["rel_bias"]  # (num_buckets, H)
    bias = table[jnp.asarray(buckets)]  # (q, k, H)
    return jnp.transpose(bias, (2, 0, 1))[None]


def t5_encode(
    params: Params, cfg: T5Config, input_ids: jnp.ndarray, attn_mask: jnp.ndarray
) -> jnp.ndarray:
    """input_ids (B, T) int32, attn_mask (B, T) {0,1} -> (B, T, d_model)."""
    b, t = input_ids.shape
    h = params["embedding"][input_ids]
    pos_bias = relative_bias(params, cfg, t, t).astype(jnp.float32)
    # HF extends the mask as (1-mask)*min_dtype added to the bias
    mask_bias = jnp.where(attn_mask[:, None, None, :] > 0, 0.0, -1e9).astype(jnp.float32)
    bias = pos_bias + mask_bias

    def body(carry, lp):
        hh = carry
        x = t5_layer_norm(hh, lp["ln1"], cfg.layer_norm_eps)
        nh, dk = cfg.n_head, cfg.d_kv
        q = (x @ lp["q"]).reshape(b, t, nh, dk)
        k = (x @ lp["k"]).reshape(b, t, nh, dk)
        v = (x @ lp["v"]).reshape(b, t, nh, dk)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores + bias  # NOTE: no 1/sqrt(d) scaling in T5
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32)
        attn = attn.astype(x.dtype).reshape(b, t, nh * dk)
        hh = hh + attn @ lp["o"]
        x = t5_layer_norm(hh, lp["ln2"], cfg.layer_norm_eps)
        g = jax.nn.gelu(x @ lp["wi0"], approximate=True)
        hh = hh + ((g * (x @ lp["wi1"])) @ lp["wo"])
        return hh, None

    h, _ = jax.lax.scan(body, h, params["layers"])
    return t5_layer_norm(h, params["final_ln"], cfg.layer_norm_eps)


def init_t5_params(rng: jax.Array, cfg: T5Config, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(rng, 8))
    d, dk, nh, dff, L = cfg.d_model, cfg.d_kv, cfg.n_head, cfg.d_ff, cfg.n_layer

    def nrm(shape):
        return (jax.random.normal(next(keys), shape) * 0.02).astype(dtype)

    return {
        "embedding": nrm((cfg.vocab_size, d)),
        "rel_bias": nrm((cfg.rel_buckets, nh)),
        "layers": {
            "ln1": jnp.ones((L, d), dtype),
            "q": nrm((L, d, nh * dk)),
            "k": nrm((L, d, nh * dk)),
            "v": nrm((L, d, nh * dk)),
            "o": nrm((L, nh * dk, d)),
            "ln2": jnp.ones((L, d), dtype),
            "wi0": nrm((L, d, dff)),
            "wi1": nrm((L, d, dff)),
            "wo": nrm((L, dff, d)),
        },
        "final_ln": jnp.ones((d,), dtype),
    }
