"""Int8 KV cache: quantize/dequantize bounds, the q8 flash kernel vs exact
attention over the dequantized slab (interpret mode on CPU), and the full
generate() loop through the quantized cache."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from controlar_tpu import quant
from controlar_tpu.config import GPTConfig
from controlar_tpu.models import gpt as jgpt
from controlar_tpu import decode as dec
from controlar_tpu import generate as jgen


def test_kv_quant_roundtrip_bound():
    rng = jax.random.PRNGKey(0)
    rows = jax.random.normal(rng, (2, 5, 2 * 4 * 8))  # B=2,T=5,H=4,D=8
    q, s = quant.quantize_kv_rows(rows, n_head=4)
    assert q.dtype == jnp.int8 and s.shape == (2, 5, 8)
    back = quant.dequantize_kv_slab(q.reshape(2, 5, -1), s, 4)
    err = np.abs(np.asarray(back) - np.asarray(rows, np.float32))
    bound = np.repeat(np.asarray(s) / 2, 8, axis=-1).reshape(err.shape) + 1e-6
    assert (err <= bound).all()


def test_q8_flash_kernel_matches_dequant_attention():
    from controlar_tpu.ops.flash_decode2 import flash_decode_attention2_q8

    rng = np.random.default_rng(1)
    B, S, H, D = 2, 512, 4, 32
    hd = H * D
    pos = np.array([300, 45], np.int32)
    kv = rng.normal(size=(B, S, 2 * hd)).astype(np.float32) * 0.3
    qv = rng.normal(size=(B, hd)).astype(np.float32) * 0.3
    kv_q, kv_s = quant.quantize_kv_rows(jnp.asarray(kv), n_head=H)
    bias = np.where(rng.uniform(size=(B, S)) < 0.1, -1e9, 0.0).astype(np.float32)

    got = np.asarray(flash_decode_attention2_q8(
        jnp.asarray(qv, jnp.bfloat16), kv_q, kv_s, jnp.asarray(pos),
        jnp.asarray(bias), n_head=H, block=256, interpret=True,
    ), np.float32)

    # reference: exact attention over the dequantized slab
    slab = np.asarray(quant.dequantize_kv_slab(kv_q, kv_s, H))
    qb = np.asarray(jnp.asarray(qv, jnp.bfloat16), np.float32)
    for b in range(B):
        k = slab[b, :, :hd].reshape(S, H, D)
        v = slab[b, :, hd:].reshape(S, H, D)
        qh = qb[b].reshape(H, D)
        scores = np.einsum("shd,hd->sh", k, qh) / np.sqrt(D)
        scores += bias[b][:, None]
        scores[pos[b] + 1:] = -np.inf
        p = np.exp(scores - scores.max(0))
        p /= p.sum(0)
        want = np.einsum("sh,shd->hd", p, v).reshape(hd)
        np.testing.assert_allclose(got[b], want, atol=2e-2, rtol=2e-2)


def test_generate_with_int8_cache_close_to_bf16():
    cfg = GPTConfig(model_type="c2i", dim=64, n_layer=4, n_head=4,
                    cls_token_num=1, block_size=16, vocab_size=128,
                    num_classes=10)
    params = jgpt.init_gpt_params(jax.random.PRNGKey(2), cfg, jnp.float32)
    labels = jnp.arange(2)
    kw = dict(labels=labels, max_new_tokens=cfg.block_size, cfg_scale=2.0,
              sample_logits=False, rng=jax.random.PRNGKey(0), use_flash=False)
    t_ref = np.asarray(jgen.generate(params, cfg, cache_dtype=jnp.float32, **kw))
    t_q8 = np.asarray(jgen.generate(params, cfg, cache_dtype=jnp.int8, **kw))
    assert t_q8.shape == t_ref.shape
    # greedy tokens through the int8 cache stay overwhelmingly aligned with
    # the exact cache at tiny scale (per-head symmetric quant is tight)
    agree = (t_ref == t_q8).mean()
    assert agree >= 0.85, agree


def test_int8_cache_structothers():
    cfg = GPTConfig(model_type="c2i", dim=32, n_layer=2, n_head=2,
                    cls_token_num=1, block_size=4, vocab_size=32, num_classes=4)
    caches = dec.init_flat_caches(cfg, 2, 8, jnp.int8)
    assert dec.is_quantized_cache(caches)
    assert dec.cache_seq_len(caches) == 8
    assert caches[0]["kv"].dtype == jnp.int8
    assert caches[0]["s"].shape == (2, 8, dec.scale_pad(cfg.kv_heads))
    # prefill writes both streams
    params = jgpt.init_gpt_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    prefix = jgpt.embed_prefix_c2i(params, jnp.arange(2))
    logits, caches = dec.prefill_flat(params, cfg, caches, prefix, None, None)
    assert np.asarray(caches[0]["s"][:, 0]).max() > 0
    assert np.isfinite(np.asarray(logits)).all()


def test_generate_int8_cache_no_cfg_branch():
    """cfg_scale=1.0 (no CFG doubling) through the quantized cache — the
    non-CFG decode branch carries single-batch rows through quantize/append."""
    cfg = GPTConfig(model_type="c2i", dim=64, n_layer=4, n_head=4,
                    cls_token_num=1, block_size=16, vocab_size=128,
                    num_classes=10)
    params = jgpt.init_gpt_params(jax.random.PRNGKey(3), cfg, jnp.float32)
    kw = dict(labels=jnp.arange(3), max_new_tokens=cfg.block_size,
              cfg_scale=1.0, sample_logits=False, rng=jax.random.PRNGKey(0),
              use_flash=False)
    t_ref = np.asarray(jgen.generate(params, cfg, cache_dtype=jnp.float32, **kw))
    t_q8 = np.asarray(jgen.generate(params, cfg, cache_dtype=jnp.int8, **kw))
    assert t_ref.shape == t_q8.shape == (3, cfg.block_size)
    assert (t_ref == t_q8).mean() >= 0.85


def test_q8_append_kernel_matches_separate_ops():
    """Fused append+attention == DUS append then flash attention (interpret),
    including the written slabs and per-slot positions."""
    from controlar_tpu.ops.flash_decode2 import (
        flash_decode_attention2_q8, flash_decode_attention2_q8_append)
    from controlar_tpu.quant import quantize_kv_rows
    from controlar_tpu import decode as dec

    rng = np.random.default_rng(0)
    B, H, D, S = 3, 2, 8, 128
    hd = H * D
    kv = rng.standard_normal((B, S, 2 * hd)).astype(np.float32)
    qkv, scales = quantize_kv_rows(jnp.asarray(kv), H)
    scales = dec._pad_scales(scales, H)
    pos = jnp.asarray([5, 64, 101], jnp.int32)
    q = jnp.asarray(rng.standard_normal((B, hd)) * 0.5, jnp.float32)
    new_row = jnp.asarray(rng.standard_normal((B, 2 * hd)), jnp.float32)
    nq, ns = quantize_kv_rows(new_row, H)
    ns = dec._pad_scales(ns, H)

    # reference: write the row, then attend rows <= pos
    vdus = jax.vmap(lambda c, r, p: jax.lax.dynamic_update_slice(c, r, (p, 0)))
    kv_ref = vdus(qkv, nq[:, None], pos)
    s_ref = vdus(scales, ns[:, None], pos)
    want = np.asarray(flash_decode_attention2_q8(
        q, kv_ref, s_ref, pos, None, n_head=H, block=64, interpret=True))

    got, kv_out, s_out = flash_decode_attention2_q8_append(
        q, nq, ns, qkv, scales, pos, None, n_head=H, block=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-2, atol=3e-2)
    np.testing.assert_array_equal(np.asarray(kv_out), np.asarray(kv_ref))
    np.testing.assert_array_equal(np.asarray(s_out), np.asarray(s_ref))

    # with a prefix column bias (0 at decode positions)
    bias = np.zeros((B, S), np.float32)
    bias[:, :4] = -1e9
    want = np.asarray(flash_decode_attention2_q8(
        q, kv_ref, s_ref, pos, jnp.asarray(bias), n_head=H, block=64,
        interpret=True))
    got, _, _ = flash_decode_attention2_q8_append(
        q, nq, ns, qkv, scales, pos, jnp.asarray(bias), n_head=H, block=64,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-2, atol=3e-2)


def test_q4_flash_kernel_matches_dequant_attention():
    """flash_decode_attention2_q4 == bf16 flash over the dequantized slab,
    incl. odd head_dims, per-slot positions and column bias."""
    from controlar_tpu.ops.flash_decode2 import (
        flash_decode_attention2, flash_decode_attention2_q4)
    from controlar_tpu.quant import dequantize_kv4_slab, quantize_kv_rows_4

    rng = np.random.default_rng(4)
    for H, D in [(2, 8), (2, 10)]:
        hd = H * D
        B, S = 3, 128
        kv = rng.standard_normal((B, S, 2 * hd)).astype(np.float32)
        c, s = quantize_kv_rows_4(jnp.asarray(kv), H)
        pos = jnp.asarray([4, 77, 120], jnp.int32)
        q = jnp.asarray(rng.standard_normal((B, hd)) * 0.5, jnp.float32)
        bias = np.where(rng.random((B, S)) < 0.2, -1e9, 0.0).astype(np.float32)
        bias[:, :5] = 0  # keep at least the first rows attendable

        deq = dequantize_kv4_slab(c, s, H, D, jnp.bfloat16)
        want = np.asarray(flash_decode_attention2(
            q, deq, pos, jnp.asarray(bias), n_head=H, block=64,
            interpret=True))
        got = np.asarray(flash_decode_attention2_q4(
            q, c, s, pos, jnp.asarray(bias), n_head=H, head_dim=D, block=64,
            interpret=True))
        np.testing.assert_allclose(got, want, rtol=4e-2, atol=4e-2)

        # no-bias path
        want = np.asarray(flash_decode_attention2(
            q, deq, pos, None, n_head=H, block=64, interpret=True))
        got = np.asarray(flash_decode_attention2_q4(
            q, c, s, pos, None, n_head=H, head_dim=D, block=64,
            interpret=True))
        np.testing.assert_allclose(got, want, rtol=4e-2, atol=4e-2)


def test_generate_with_kv4_cache_runs_and_close():
    """Full decode with the int4 KV cache (CPU dequant path): shapes sane,
    logits in the quantized neighborhood of bf16."""
    from controlar_tpu import generate as jgen2

    from controlar_tpu.config import GPTConfig as _G

    cfg = _G(model_type="c2i", dim=64, n_layer=2, n_head=2, cls_token_num=1,
             block_size=16, vocab_size=64, num_classes=8)
    params = jgpt.init_gpt_params(jax.random.PRNGKey(0), cfg)
    kw = dict(labels=jnp.arange(3), max_new_tokens=16, cfg_scale=2.0,
              sample_logits=False, rng=jax.random.PRNGKey(1), use_flash=False)
    ref = np.asarray(jgen2.generate(params, cfg, **kw))
    got = np.asarray(jgen2.generate(params, cfg, cache_dtype=jnp.int4, **kw))
    assert got.shape == ref.shape
    assert (got >= 0).all() and (got < 64).all()
    # kv4 noise at tiny scale: most tokens still match the bf16 rollout
    assert (got == ref).mean() > 0.4, (got == ref).mean()
