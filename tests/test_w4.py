"""W4A16 packing + fused dequant-matmul kernel (ops/w4_matmul.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from controlar_tpu.ops.w4_matmul import (
    GROUP,
    dequantize_weight_w4,
    quantize_weight_w4,
    w4_matmul,
)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    # 3200: odd plane count (kernel epilogue path); 200: K not a group
    # multiple (padded-x fallback path)
    for k, n in [(256, 128), (512, 256), (3200, 384), (200, 128)]:
        w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
        qw = quantize_weight_w4(w)
        g = GROUP
        kp = ((k + 2 * g - 1) // (2 * g)) * (2 * g)
        assert qw["q4"].shape == (kp // 2, n) and qw["q4"].dtype == jnp.int8
        assert qw["s"].shape == (kp // g, n)
        back = dequantize_weight_w4(qw, jnp.float32, k=k)
        assert back.shape == (k, n)
        # int4 group quantization: error bounded by s/2 per element
        smax = np.asarray(qw["s"]).max()
        err = np.abs(np.asarray(back) - np.asarray(w))
        assert err.max() <= smax / 2 + 1e-6
        # better than half the dynamic range by construction
        rel = err.max() / np.abs(np.asarray(w)).max()
        assert rel < 0.12, rel


def test_w4_matmul_matches_dequant_reference():
    rng = np.random.default_rng(1)
    for b, k, n in [(16, 256, 256), (8, 3200, 384), (3, 512, 640)]:
        x = jnp.asarray(rng.standard_normal((b, k)).astype(np.float32) * 0.1,
                        dtype=jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32) * 0.05)
        qw = quantize_weight_w4(w)
        want = np.asarray(
            jnp.dot(x, dequantize_weight_w4(qw, jnp.bfloat16, k=k),
                    preferred_element_type=jnp.float32)
        )
        got = np.asarray(
            w4_matmul(x, qw["q4"], qw["s"], out_dtype=jnp.float32,
                      interpret=True)
        )
        assert got.shape == (b, n)
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_w4_quality_vs_w8():
    """int4 group-128 error stays within ~4x of int8 per-channel error at
    gaussian weights (sanity: the serving-accuracy story)."""
    from controlar_tpu.quant import quantize_weight, dequantize_weight

    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.standard_normal((512, 256)).astype(np.float32))
    e4 = np.abs(np.asarray(dequantize_weight_w4(quantize_weight_w4(w), jnp.float32, k=512)) - np.asarray(w)).mean()
    e8 = np.abs(np.asarray(dequantize_weight(quantize_weight(w), jnp.float32)) - np.asarray(w)).mean()
    assert e4 < 16 * e8  # 16x grid coarsening, grouped scales claw some back
    assert e4 < 0.12  # mean |err| ~= s/4 = amax(group)/28 on unit gaussians


def test_w4_generate_runs_and_close():
    """Full decode with W4-quantized params (CPU dequant fallback path)."""
    from controlar_tpu import decode as dec, generate as jgen
    from controlar_tpu.config import GPTConfig
    from controlar_tpu.models import gpt as jgpt
    from controlar_tpu.quant import quantize_gpt_params_w4

    cfg = GPTConfig(model_type="c2i", dim=128, n_layer=2, n_head=2,
                    cls_token_num=1, block_size=16, vocab_size=64,
                    num_classes=8)
    params = dec.unstack_layers(
        jgpt.init_gpt_params(jax.random.PRNGKey(0), cfg))
    w4p = quantize_gpt_params_w4(params)
    # head is int8, big mats are w4 dicts
    lp0 = w4p["layers"][0]
    assert "q" in w4p["output"] and "q4" in lp0["w13"]
    assert "w1" not in lp0 and "w3" not in lp0  # fused into one stream

    kw = dict(labels=jnp.arange(4), max_new_tokens=16, cfg_scale=2.0,
              sample_logits=False, rng=jax.random.PRNGKey(1), use_flash=False)
    ref = np.asarray(jgen.generate(params, cfg, **kw))
    got = np.asarray(jgen.generate(w4p, cfg, **kw))
    assert got.shape == ref.shape and got.dtype == ref.dtype
    assert (got >= 0).all() and (got < cfg.vocab_size).all()

    # pointwise quality: prefill logits stay close (token-level divergence
    # compounds autoregressively, so tokens are only a smoke check)
    from controlar_tpu import decode as dec2

    caches = dec2.init_flat_caches(cfg, 2, 24)
    prefix = jgpt.embed_prefix_c2i(params, jnp.asarray([1, 2]))
    l_ref, _ = dec2.prefill_flat(params, cfg, caches, prefix, None, None)
    l_w4, _ = dec2.prefill_flat(w4p, cfg, caches, prefix, None, None)
    rel = np.abs(np.asarray(l_w4) - np.asarray(l_ref)).max() / (
        np.abs(np.asarray(l_ref)).max() + 1e-9)
    assert rel < 0.25, rel


def test_kv4_pack_roundtrip():
    from controlar_tpu.quant import (
        dequantize_kv4_slab, kv4_row_width, quantize_kv_rows_4)

    rng = np.random.default_rng(3)
    for H, D in [(2, 8), (4, 100), (12, 64)]:
        kv = jnp.asarray(rng.standard_normal((2, 5, 2 * H * D)), jnp.float32)
        c, s = quantize_kv_rows_4(kv, H)
        assert c.shape == (2, 5, 2 * kv4_row_width(H, D))
        assert c.dtype == jnp.int8 and s.shape == (2, 5, 2 * H)
        back = np.asarray(dequantize_kv4_slab(c, s, H, D))
        err = np.abs(back - np.asarray(kv))
        # int4 per-head: |err| <= s/2
        smax = np.asarray(s).max()
        assert err.max() <= smax / 2 + 1e-6
        rel = err.max() / np.abs(np.asarray(kv)).max()
        assert rel < 0.15, rel


def test_w4_ffn_fused_matches_unfused():
    """w4_ffn (one kernel: w13 + bf16 silu-gate + w2) == the unfused
    two-call path's math (w4 dequant reference with the same bf16 gate)."""
    from controlar_tpu.ops.w4_matmul import w4_ffn, w4_ffn_fits

    rng = np.random.default_rng(5)
    for b, k, f, n in [(16, 256, 512, 256), (8, 384, 640, 384)]:
        x = jnp.asarray(rng.standard_normal((b, k)).astype(np.float32) * 0.2,
                        dtype=jnp.bfloat16)
        w13 = jnp.asarray(
            rng.standard_normal((k, 2 * f)).astype(np.float32) * 0.05)
        w2 = jnp.asarray(
            rng.standard_normal((f, n)).astype(np.float32) * 0.05)
        q13 = quantize_weight_w4(w13)
        q2 = quantize_weight_w4(w2)
        assert w4_ffn_fits(q13["q4"], q13["s"], q2["q4"], q2["s"], b, k)
        # mismatched quantization groups must be rejected, not miscomputed
        q2_g64 = quantize_weight_w4(w2, group=64)
        assert not w4_ffn_fits(q13["q4"], q13["s"], q2_g64["q4"],
                               q2_g64["s"], b, k)
        # K not a multiple of the group must be rejected
        assert not w4_ffn_fits(q13["q4"], q13["s"], q2["q4"], q2["s"], b,
                               k - 8)

        y = jnp.dot(x, dequantize_weight_w4(q13, jnp.bfloat16, k=k),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        h1, h3 = jnp.split(y, 2, axis=-1)
        z = (jax.nn.silu(h1) * h3).astype(jnp.bfloat16)
        want = np.asarray(jnp.dot(
            z, dequantize_weight_w4(q2, jnp.bfloat16, k=f),
            preferred_element_type=jnp.float32))

        got = np.asarray(w4_ffn(
            x, q13["q4"], q13["s"], q2["q4"], q2["s"],
            out_dtype=jnp.float32, interpret=True))
        np.testing.assert_allclose(got, want, rtol=4e-2, atol=4e-2)


def test_w4_ffn_odd_plane_counts():
    """K and F that give odd plane counts exercise both peeled epilogues."""
    from controlar_tpu.ops.w4_matmul import w4_ffn

    rng = np.random.default_rng(6)
    b, k, f, n = 4, 384, 384, 128  # 384/128 = 3 planes (odd) both phases
    x = jnp.asarray(rng.standard_normal((b, k)).astype(np.float32) * 0.2,
                    dtype=jnp.bfloat16)
    w13 = jnp.asarray(rng.standard_normal((k, 2 * f)).astype(np.float32) * 0.05)
    w2 = jnp.asarray(rng.standard_normal((f, n)).astype(np.float32) * 0.05)
    q13 = quantize_weight_w4(w13)
    q2 = quantize_weight_w4(w2)
    y = jnp.dot(x, dequantize_weight_w4(q13, jnp.bfloat16, k=k),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    h1, h3 = jnp.split(y, 2, axis=-1)
    z = (jax.nn.silu(h1) * h3).astype(jnp.bfloat16)
    want = np.asarray(jnp.dot(
        z, dequantize_weight_w4(q2, jnp.bfloat16, k=f),
        preferred_element_type=jnp.float32))
    got = np.asarray(w4_ffn(
        x, q13["q4"], q13["s"], q2["q4"], q2["s"],
        out_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(got, want, rtol=4e-2, atol=4e-2)


def test_unpack_i8_mode_bit_identical():
    """CONTROLAR_UNPACK_I8 mode (int8-domain nibble shifts) must produce
    bit-identical kernel output to the default int32-domain unpack.
    Unique shapes so the jit cache cannot serve stale-flag compilations."""
    from controlar_tpu.ops import w4_matmul as wm

    rng = np.random.default_rng(11)
    b, k, n = 4, 1024, 896  # shape used only by this test
    x = jnp.asarray(rng.standard_normal((b, k)).astype(np.float32) * 0.1,
                    dtype=jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32) * 0.05)
    qw = quantize_weight_w4(w)
    base = np.asarray(wm.w4_matmul(x, qw["q4"], qw["s"],
                                   out_dtype=jnp.float32, interpret=True))
    old = wm.UNPACK_I8
    wm.UNPACK_I8 = True
    try:
        alt = np.asarray(wm.w4_matmul(x[:, :k], qw["q4"][:, :n], qw["s"],
                                      out_dtype=jnp.float32, interpret=True))
    finally:
        wm.UNPACK_I8 = old
    np.testing.assert_array_equal(alt, base)


def test_w4_matmul_vmem_split_matches_dequant_reference():
    """Shapes whose fixed VMEM residents exceed the scoped limit must take
    the recursive N-split (regression: speculative chunk-verify at GPT-3B
    w13 — bp=64, N=17408 — OOM'd scoped vmem by 2.8 MB)."""
    from controlar_tpu.ops.w4_matmul import (
        _VMEM_BUDGET, _pad_to, _resident_bytes)

    rng = np.random.default_rng(2)
    b, k, n = 256, 256, 4096  # 4*bp*n*4 = 16.8 MB of out+acc > 15.25 MB
    qshape_group = 128
    x = jnp.asarray(rng.standard_normal((b, k)).astype(np.float32) * 0.1,
                    dtype=jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32) * 0.05)
    qw = quantize_weight_w4(w)
    group = 2 * qw["q4"].shape[0] // qw["s"].shape[0]
    assert group == qshape_group
    bp = _pad_to(b, 16)
    nchunks = qw["q4"].shape[0] // group
    assert (_resident_bytes(group, n, bp, nchunks)
            + 2 * group * n > _VMEM_BUDGET), "shape must trigger the split"
    want = np.asarray(
        jnp.dot(x, dequantize_weight_w4(qw, jnp.bfloat16, k=k),
                preferred_element_type=jnp.float32))
    got = np.asarray(
        w4_matmul(x, qw["q4"], qw["s"], out_dtype=jnp.float32,
                  interpret=True))
    assert got.shape == (b, n)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
