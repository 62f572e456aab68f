"""Stacked (L, B, S, R) KV cache with deferred batched appends.

Kernel parity (interpret): flash_stacked / _q8 / _q4 over a stacked cache
with the in-flight row in VMEM must equal the per-layer kernels run on a
slab with the row DUS-written first. E2E: generate(kv_stacked=True) must
emit the per-layer path's exact greedy tokens on the XLA fallback, and the
real kernels (interpret mode) must agree through a full CPU generate.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from controlar_tpu import decode as dec
from controlar_tpu import generate as jgen
from controlar_tpu.config import GPTConfig
from controlar_tpu.models import gpt as jgpt
from controlar_tpu.ops import flash_decode_stacked as fds
from controlar_tpu.ops.flash_decode2 import (
    flash_decode_attention2,
    flash_decode_attention2_q4,
    flash_decode_attention2_q8,
)
from controlar_tpu.quant import quantize_kv_rows, quantize_kv_rows_4


def _stack_setup(rng, L, B, S, hd2):
    kv = rng.standard_normal((L, B, S, hd2)).astype(np.float32)
    new = rng.standard_normal((B, hd2)).astype(np.float32)
    q = (rng.standard_normal((B, hd2 // 2)) * 0.5).astype(np.float32)
    return kv, new, q


@pytest.mark.parametrize("pos,bias", [(5, False), (200, False), (64, True)])
def test_stacked_bf16_matches_dus_then_flash(pos, bias):
    L, B, H, D, S = 3, 2, 4, 32, 256
    hd = H * D
    rng = np.random.default_rng(pos)
    kv, new, q = _stack_setup(rng, L, B, S, 2 * hd)
    kv_stack = jnp.asarray(kv, jnp.bfloat16)
    col_bias = None
    if bias:
        cb = np.zeros((B, S), np.float32)
        cb[:, :3] = -1e9
        col_bias = jnp.asarray(cb)

    for lyr in range(L):
        ref_slab = jax.lax.dynamic_update_slice(
            kv_stack[lyr], jnp.asarray(new, jnp.bfloat16)[:, None],
            (0, pos, 0))
        want = np.asarray(flash_decode_attention2(
            jnp.asarray(q), ref_slab, jnp.asarray(pos), col_bias,
            n_head=H, block=64, interpret=True))
        got = np.asarray(fds.flash_stacked(
            jnp.asarray(q), jnp.asarray(new), kv_stack,
            jnp.asarray(lyr), jnp.asarray(pos), col_bias,
            n_head=H, block=64, interpret=True))
        np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_stacked_q8_matches_dus_then_flash():
    L, B, H, D, S = 2, 3, 2, 16, 128
    hd = H * D
    rng = np.random.default_rng(1)
    kv, new, q = _stack_setup(rng, L, B, S, 2 * hd)
    qkv, scales = quantize_kv_rows(jnp.asarray(kv), H)
    scales = dec._pad_scales(scales, H)
    nq, ns = quantize_kv_rows(jnp.asarray(new), H)
    ns = dec._pad_scales(ns, H)
    pos = 65

    for lyr in range(L):
        kv_ref = jax.lax.dynamic_update_slice(qkv[lyr], nq[:, None],
                                              (0, pos, 0))
        s_ref = jax.lax.dynamic_update_slice(scales[lyr], ns[:, None],
                                             (0, pos, 0))
        want = np.asarray(flash_decode_attention2_q8(
            jnp.asarray(q), kv_ref, s_ref, jnp.asarray(pos), None,
            n_head=H, block=64, interpret=True))
        got = np.asarray(fds.flash_stacked_q8(
            jnp.asarray(q), nq, ns, qkv, scales,
            jnp.asarray(lyr), jnp.asarray(pos), None,
            n_head=H, block=64, interpret=True))
        np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("split,D", [(False, 16), (True, 10)])
def test_stacked_q4_matches_dus_then_flash(split, D):
    L, B, H, S = 2, 2, 2, 128
    hd = H * D
    rng = np.random.default_rng(2)
    kv, new, q = _stack_setup(rng, L, B, S, 2 * hd)
    qkv, scales = quantize_kv_rows_4(jnp.asarray(kv), H, split=split)
    scales = dec._pad_scales(scales, H)
    nq, ns = quantize_kv_rows_4(jnp.asarray(new), H, split=split)
    ns = dec._pad_scales(ns, H)
    pos = 33

    for lyr in range(L):
        kv_ref = jax.lax.dynamic_update_slice(qkv[lyr], nq[:, None],
                                              (0, pos, 0))
        s_ref = jax.lax.dynamic_update_slice(scales[lyr], ns[:, None],
                                             (0, pos, 0))
        want = np.asarray(flash_decode_attention2_q4(
            jnp.asarray(q), kv_ref, s_ref, jnp.asarray(pos), None,
            n_head=H, head_dim=D, block=64, interpret=True, split=split))
        got = np.asarray(fds.flash_stacked_q4(
            jnp.asarray(q), nq, ns, qkv, scales,
            jnp.asarray(lyr), jnp.asarray(pos), None,
            n_head=H, head_dim=D, block=64, interpret=True, split=split))
        np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def _tiny(block_size=16):
    return GPTConfig(model_type="c2i", dim=64, n_layer=3, n_head=4,
                     cls_token_num=1, block_size=block_size, vocab_size=128,
                     num_classes=10)


@pytest.mark.parametrize("cache_dtype", ["f32", "int8", "int4"])
def test_generate_stacked_equals_per_layer_fallback(cache_dtype):
    """kv_stacked=True on the XLA fallback must emit the per-layer path's
    exact greedy tokens (identical math, only the append plumbing moves)."""
    dt = {"f32": jnp.float32, "int8": jnp.int8, "int4": jnp.int4}[cache_dtype]
    cfg = _tiny()
    params = jgpt.init_gpt_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    kw = dict(labels=jnp.arange(4), max_new_tokens=cfg.block_size,
              cfg_scale=2.0, sample_logits=False, rng=jax.random.PRNGKey(0),
              use_flash=False, cache_dtype=dt)
    t_ref = np.asarray(jgen.generate(params, cfg, kv_stacked=False, **kw))
    t_stk = np.asarray(jgen.generate(params, cfg, kv_stacked=True, **kw))
    np.testing.assert_array_equal(t_ref, t_stk)


def test_generate_stacked_t2i_emb_masks_equals_per_layer():
    """t2i with left-padded caption masks (the col_mask_full path) through
    the stacked fallback: exact token equality vs per-layer."""
    cfg = GPTConfig(model_type="t2i", dim=64, n_layer=2, n_head=4,
                    cls_token_num=6, block_size=16, vocab_size=128,
                    caption_dim=32)
    params = jgpt.init_gpt_params(jax.random.PRNGKey(4), cfg, jnp.float32)
    cap = jax.random.normal(jax.random.PRNGKey(5), (2, 6, 32), jnp.float32)
    masks = np.ones((2, 6), bool)
    masks[0, :3] = False  # left padding
    kw = dict(caption_emb=cap, emb_masks=jnp.asarray(masks),
              max_new_tokens=cfg.block_size, cfg_scale=3.0,
              sample_logits=False, rng=jax.random.PRNGKey(0),
              use_flash=False, cache_dtype=jnp.int8)
    t_ref = np.asarray(jgen.generate(params, cfg, kv_stacked=False, **kw))
    t_stk = np.asarray(jgen.generate(params, cfg, kv_stacked=True, **kw))
    np.testing.assert_array_equal(t_ref, t_stk)


def test_generate_stacked_kernels_interpret_e2e():
    """Full CPU generate through the REAL stacked kernels (interpret):
    greedy tokens must track the XLA per-layer reference closely (bf16
    kernel internals round differently; near-ties may flip at random
    weights)."""
    cfg = _tiny()
    params = jgpt.init_gpt_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    kw = dict(labels=jnp.arange(2), max_new_tokens=cfg.block_size,
              cfg_scale=2.0, sample_logits=False, rng=jax.random.PRNGKey(0))
    t_ref = np.asarray(jgen.generate(params, cfg, use_flash=False, **kw))
    fds.INTERPRET = True
    try:
        t_stk = np.asarray(jgen.generate(
            params, cfg, kv_stacked=True, use_flash=True, **kw))
    finally:
        fds.INTERPRET = False
    assert (t_ref == t_stk).mean() >= 0.85, (t_ref, t_stk)


def test_prefill_stacked_writes_match_per_layer():
    """Stacked prefill writes the identical rows the per-layer prefill
    writes (exact: same quantize math, different plumbing)."""
    cfg = _tiny()
    params = dec.unstack_layers(
        jgpt.init_gpt_params(jax.random.PRNGKey(2), cfg, jnp.float32))
    b, t, s_max = 3, 1, 24
    prefix = jax.random.normal(jax.random.PRNGKey(3), (b, t, cfg.dim),
                               jnp.float32)
    for dt in (jnp.float32, jnp.int8, jnp.int4):
        per = dec.init_flat_caches(cfg, b, s_max, dt)
        stk = dec.init_stacked_caches(cfg, b, s_max, dt)
        lg_p, per = dec.prefill_flat(params, cfg, per, prefix, None, None)
        lg_s, stk = dec.prefill_flat(params, cfg, stk, prefix, None, None)
        np.testing.assert_array_equal(np.asarray(lg_p), np.asarray(lg_s))
        for l in range(cfg.n_layer):
            if isinstance(stk, dict):
                for key in stk:
                    np.testing.assert_array_equal(
                        np.asarray(per[l][key]), np.asarray(stk[key][l]))
            else:
                np.testing.assert_array_equal(
                    np.asarray(per[l]), np.asarray(stk[l]))


def test_stacked_per_slot_positions_match_dus_then_flash():
    """Per-slot pos vector (the serving regime) through flash_stacked_q8:
    each slot at its own depth must equal the per-layer kernel run on a
    slab with that slot's row DUS-written first."""
    L, B, H, D, S = 2, 3, 2, 16, 128
    hd = H * D
    rng = np.random.default_rng(7)
    kv, new, q = _stack_setup(rng, L, B, S, 2 * hd)
    qkv, scales = quantize_kv_rows(jnp.asarray(kv), H)
    scales = dec._pad_scales(scales, H)
    nq, ns = quantize_kv_rows(jnp.asarray(new), H)
    ns = dec._pad_scales(ns, H)
    pos = jnp.asarray([1, 65, 100], jnp.int32)

    vdus = jax.vmap(lambda c, r, p: jax.lax.dynamic_update_slice(c, r, (p, 0)))
    for lyr in range(L):
        kv_ref = vdus(qkv[lyr], nq[:, None], pos)
        s_ref = vdus(scales[lyr], ns[:, None], pos)
        want = np.asarray(flash_decode_attention2_q8(
            jnp.asarray(q), kv_ref, s_ref, pos, None,
            n_head=H, block=64, interpret=True))
        got = np.asarray(fds.flash_stacked_q8(
            jnp.asarray(q), nq, ns, qkv, scales,
            jnp.asarray(lyr), pos, None,
            n_head=H, block=64, interpret=True))
        np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_cache_append_rows_stacked_matches_vdus():
    from controlar_tpu.ops.cache_append import cache_append_rows_stacked

    rng = np.random.default_rng(8)
    for dt in (jnp.float32, jnp.int8):
        L, B, S, hd = 3, 2, 64, 256
        if dt == jnp.int8:
            cache = jnp.asarray(rng.integers(-100, 100, (L, B, S, hd)), dt)
            rows = jnp.asarray(rng.integers(-100, 100, (L, B, hd)), dt)
        else:
            cache = jnp.asarray(rng.standard_normal((L, B, S, hd)), dt)
            rows = jnp.asarray(rng.standard_normal((L, B, hd)), dt)
        pos = jnp.asarray([5, 40], jnp.int32)
        want = np.asarray(dec._stacked_vdus(cache, rows, pos))
        got = np.asarray(cache_append_rows_stacked(cache, rows, pos,
                                                   interpret=True))
        np.testing.assert_array_equal(got, want)


def test_decode_step_multi_stacked_equals_per_layer():
    """Per-slot stacked step (XLA fallback) == per-layer decode_step_multi:
    exact logits and cache contents."""
    cfg = _tiny()
    params = dec.unstack_layers(
        jgpt.init_gpt_params(jax.random.PRNGKey(6), cfg, jnp.float32))
    b, s_max = 3, 24
    prefix = jax.random.normal(jax.random.PRNGKey(7), (b, 2, cfg.dim),
                               jnp.float32)
    tok = jnp.asarray([3, 5, 7], jnp.int32)
    pos = jnp.asarray([2, 2, 2], jnp.int32)  # fresh after a 2-token prefill
    for dt in (jnp.float32, jnp.int8, jnp.int4):
        per = dec.init_flat_caches(cfg, b, s_max, dt)
        stk = dec.init_stacked_caches(cfg, b, s_max, dt)
        _, per = dec.prefill_flat(params, cfg, per, prefix, None, None)
        _, stk = dec.prefill_flat(params, cfg, stk, prefix, None, None)
        lg_p, per = dec.decode_step_multi(params, cfg, per, tok, pos,
                                          use_flash=False)
        lg_s, stk = dec.decode_step_multi(params, cfg, stk, tok, pos,
                                          use_flash=False)
        np.testing.assert_array_equal(np.asarray(lg_p), np.asarray(lg_s))
        for l in range(cfg.n_layer):
            if isinstance(stk, dict):
                for key in stk:
                    np.testing.assert_array_equal(
                        np.asarray(per[l][key]), np.asarray(stk[key][l]))
            else:
                np.testing.assert_array_equal(
                    np.asarray(per[l]), np.asarray(stk[l]))
