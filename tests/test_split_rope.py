"""Split-rope layout parity: the decode-path head-dim permutation
(quant.to_split_rope + ops/rope.apply_rope_split) must be math-identical to
the interleaved layout — the permutation cancels in q.k and is undone by the
permuted wo rows. Covers prefill, uniform-pos decode, per-slot decode, the
chunk scorer, and all three cache formats.

Reference role: pure TPU-layout optimization (kills the (...,D/2,2) RoPE
relayout copies, ~330 us/step at GPT-3B); the reference has no equivalent
(interleaved rope on GPU is free, ref gpt_t2i.py:522-532).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controlar_tpu import decode as dec
from controlar_tpu import quant
from controlar_tpu.config import gpt_config
from controlar_tpu.models import gpt as jgpt
from controlar_tpu.ops.rope import apply_rope, apply_rope_split, \
    make_split_rope_tables


def tiny_cfg():
    return gpt_config(
        "GPT-B", model_type="c2i", cls_token_num=1, block_size=64,
        vocab_size=128, num_classes=10, n_layer=2, dim=128, n_head=2,
    )


def test_apply_rope_split_matches_interleaved():
    cfg = tiny_cfg()
    d = cfg.head_dim
    table = jgpt.make_rope_table(cfg)
    cos, sin = make_split_rope_tables(table, cfg.n_head, cfg.kv_heads, d)
    rng = np.random.default_rng(0)
    t = 5
    x = jnp.asarray(rng.standard_normal(
        (2, t, cfg.n_head + cfg.kv_heads, d)).astype(np.float32))
    ref = apply_rope(x, table[:t])  # (B,T,H+KV,D) interleaved

    # permute to split layout, rotate, permute back
    perm = np.concatenate([np.arange(0, d, 2), np.arange(1, d, 2)])
    xs = x[..., perm].reshape(2, t, -1)
    got = apply_rope_split(xs, cos[None, :t], sin[None, :t], d)
    got = got.reshape(2, t, cfg.n_head + cfg.kv_heads, d)
    inv = np.argsort(perm)
    np.testing.assert_allclose(np.asarray(got[..., inv]), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("cache_dtype", [jnp.bfloat16, jnp.int8, jnp.int4])
def test_decode_token_parity(cache_dtype):
    """Greedy tokens through prefill + decode_step_flat must be identical
    between interleaved and split-rope params (bf16 weights isolate the
    layout change from quantization error)."""
    cfg = tiny_cfg()
    params = jgpt.init_gpt_params(jax.random.PRNGKey(0), cfg,
                                  dtype=jnp.float32)
    base = dec.unstack_layers(params)
    sp = quant.to_split_rope(base, cfg)
    assert dec._is_split(sp) and not dec._is_split(base)

    b, t_cls, s_max = 2, cfg.cls_token_num, 16
    rng = np.random.default_rng(1)
    prefix = jnp.asarray(rng.standard_normal(
        (b, t_cls, cfg.dim)).astype(np.float32))

    def roll(p):
        caches = dec.init_flat_caches(cfg, b, s_max, cache_dtype)
        logits, caches = dec.prefill_flat(p, cfg, caches, prefix, None, None)
        toks = [jnp.argmax(logits, -1)]
        logits_all = [logits]
        for i in range(6):
            logits, caches = dec.decode_step_flat(
                p, cfg, caches, toks[-1], t_cls + i, None, None,
                use_flash=False)
            toks.append(jnp.argmax(logits, -1))
            logits_all.append(logits)
        return np.asarray(jnp.stack(toks)), np.asarray(jnp.stack(logits_all))

    toks_i, log_i = roll(base)
    toks_s, log_s = roll(sp)
    np.testing.assert_allclose(log_s, log_i, rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(toks_s, toks_i)


def test_decode_step_multi_parity():
    """Per-slot positions (the serving primitive) under the int4 cache."""
    cfg = tiny_cfg()
    params = jgpt.init_gpt_params(jax.random.PRNGKey(2), cfg,
                                  dtype=jnp.float32)
    base = dec.unstack_layers(params)
    sp = quant.to_split_rope(base, cfg)

    b, s_max = 2, 16
    rng = np.random.default_rng(3)
    prefix = jnp.asarray(rng.standard_normal(
        (b, cfg.cls_token_num, cfg.dim)).astype(np.float32))
    tok = jnp.asarray([3, 7], jnp.int32)
    pos = jnp.asarray([1, 2], jnp.int32)

    outs = []
    for p in (base, sp):
        caches = dec.init_flat_caches(cfg, b, s_max, jnp.int4)
        _, caches = dec.prefill_flat(p, cfg, caches, prefix, None, None)
        logits, _ = dec.decode_step_multi(p, cfg, caches, tok, pos,
                                          use_flash=False)
        outs.append(np.asarray(logits))
    np.testing.assert_allclose(outs[1], outs[0], rtol=2e-4, atol=2e-4)


def test_forward_chunk_parity():
    """The chunked scorer (spec decode / chunked prefill) under int8 cache."""
    from controlar_tpu import spec_decode as sd

    cfg = tiny_cfg()
    params = jgpt.init_gpt_params(jax.random.PRNGKey(4), cfg,
                                  dtype=jnp.float32)
    base = dec.unstack_layers(params)
    sp = quant.to_split_rope(base, cfg)

    b, k, s_max = 2, 3, 16
    tokens = jnp.asarray([[1, 2, 3], [4, 5, 6]], jnp.int32)
    pos = jnp.asarray([1, 1], jnp.int32)
    rng = np.random.default_rng(5)
    prefix = jnp.asarray(rng.standard_normal(
        (b, cfg.cls_token_num, cfg.dim)).astype(np.float32))

    outs = []
    for p in (base, sp):
        caches = dec.init_flat_caches(cfg, b, s_max, jnp.int8)
        _, caches = dec.prefill_flat(p, cfg, caches, prefix, None, None)
        logits, _ = sd.forward_chunk(p, cfg, caches, tokens, pos, None, None,
                                     use_flash=False)
        outs.append(np.asarray(logits))
    np.testing.assert_allclose(outs[1], outs[0], rtol=2e-4, atol=2e-4)


def test_flash_q4_split_interpret():
    """The q4 flash kernel's split q-prep/output path (interpret mode) must
    agree with the interleaved path on permuted inputs."""
    from controlar_tpu.ops.flash_decode2 import flash_decode_attention2_q4
    from controlar_tpu.quant import quantize_kv_rows_4

    nh, d, b, s_max, pos_v = 2, 8, 2, 8, 5
    rng = np.random.default_rng(6)
    kv = rng.standard_normal((b, s_max, 2 * nh * d)).astype(np.float32)
    q = rng.standard_normal((b, nh * d)).astype(np.float32)

    perm = np.concatenate([np.arange(0, d, 2), np.arange(1, d, 2)])
    full_perm = (np.arange(2 * nh)[:, None] * d + perm[None, :]).reshape(-1)
    q_perm = (np.arange(nh)[:, None] * d + perm[None, :]).reshape(-1)

    c_i, s_i = quantize_kv_rows_4(jnp.asarray(kv), nh)
    c_s, s_s = quantize_kv_rows_4(jnp.asarray(kv[..., full_perm]), nh,
                                  split=True)
    np.testing.assert_array_equal(np.asarray(c_i), np.asarray(c_s))
    np.testing.assert_allclose(np.asarray(s_i), np.asarray(s_s))

    pos = jnp.full((b,), pos_v, jnp.int32)
    s_pad = jnp.pad(s_i, ((0, 0), (0, 0), (0, 128 - s_i.shape[-1])))
    out_i = flash_decode_attention2_q4(
        jnp.asarray(q), c_i, s_pad, pos, None, n_head=nh, head_dim=d,
        block=8, interpret=True)
    out_s = flash_decode_attention2_q4(
        jnp.asarray(q[:, q_perm]), c_s, s_pad, pos, None, n_head=nh,
        head_dim=d, block=8, interpret=True, split=True)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_i)[:, q_perm],
                               rtol=1e-5, atol=1e-5)
