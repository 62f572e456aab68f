"""Int8 weight-only quantization (quant.py): math bounds, fused-dot parity,
and end-to-end decode through the quantized tree."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controlar_tpu import quant
from controlar_tpu.config import GPTConfig
from controlar_tpu.models import gpt as jgpt
from controlar_tpu import generate as jgen


def tiny_cfg(**kw):
    base = dict(
        dim=64, n_layer=2, n_head=4, vocab_size=128, block_size=16,
        num_classes=10, cls_token_num=1, model_type="c2i",
    )
    base.update(kw)
    return GPTConfig(**base)


def test_quantize_roundtrip_error_bound():
    w = jax.random.normal(jax.random.PRNGKey(0), (3, 32, 48)) * 0.05
    qw = quant.quantize_weight(w)
    assert qw["q"].dtype == jnp.int8
    assert qw["s"].shape == (3, 1, 48)
    # symmetric round-to-nearest: |err| <= s/2 per element
    err = quant.quantization_error(w)
    bound = np.asarray(qw["s"]) / 2 + 1e-8
    assert np.all(np.asarray(err) <= bound)


def test_wdot_matches_dequantized_matmul():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = (jax.random.normal(k1, (4, 32)) * 0.1).astype(jnp.bfloat16)
    w = jax.random.normal(k2, (32, 48)) * 0.05
    qw = quant.quantize_weight(w)
    got = np.asarray(quant.wdot(x, qw), np.float32)
    ref = np.asarray(
        x.astype(jnp.float32) @ quant.dequantize_weight(qw, jnp.float32)
    )
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-3)


def test_wdot_plain_passthrough():
    x = jnp.ones((2, 8), jnp.bfloat16)
    w = jnp.ones((8, 4), jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(quant.wdot(x, w)), np.asarray(x @ w)
    )


def test_quantize_gpt_params_structure():
    cfg = tiny_cfg()
    params = jgpt.init_gpt_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    qp = quant.quantize_gpt_params(params)
    for k in quant.LAYER_QUANT_KEYS:
        assert quant.is_quantized(qp["layers"][k]), k
        assert qp["layers"][k]["q"].shape == params["layers"][k].shape
    assert quant.is_quantized(qp["output"])
    # untouched leaves are the same arrays
    assert qp["tok_embeddings"] is params["tok_embeddings"]
    # keep= excludes
    qp2 = quant.quantize_gpt_params(params, keep=("output", "wqkv"))
    assert not quant.is_quantized(qp2["output"])
    assert not quant.is_quantized(qp2["layers"]["wqkv"])
    assert quant.is_quantized(qp2["layers"]["wo"])


@pytest.mark.slow
def test_quantized_decode_logits_close_and_generate_runs():
    """Decode logits through the int8 tree stay close to bf16, and the full
    generate() loop runs on the quantized tree (incl. unstack_layers)."""
    cfg = tiny_cfg()
    params = jgpt.init_gpt_params(jax.random.PRNGKey(2), cfg, jnp.bfloat16)
    qp = quant.quantize_gpt_params(params)

    labels = jnp.arange(2)
    toks = jgen.generate(
        qp, cfg, labels=labels, max_new_tokens=cfg.block_size,
        cfg_scale=2.0, top_k=0, sample_logits=False,
        rng=jax.random.PRNGKey(0), use_flash=False,
    )
    assert toks.shape == (2, cfg.block_size)
    assert np.asarray(toks).min() >= 0 and np.asarray(toks).max() < cfg.vocab_size

    # logit fidelity at the first position: prefill through both trees
    from controlar_tpu import decode as dec
    prefix = jgpt.embed_prefix_c2i(params, labels).astype(jnp.bfloat16)
    caches = dec.init_flat_caches(cfg, 2, cfg.max_seq_len)
    lb, _ = dec.prefill_flat(params, cfg, caches, prefix, None, None)
    lq, _ = dec.prefill_flat(qp, cfg, caches, prefix, None, None)
    lb, lq = np.asarray(lb, np.float32), np.asarray(lq, np.float32)
    scale = np.abs(lb).max() + 1e-6
    assert np.abs(lb - lq).max() / scale < 0.08, np.abs(lb - lq).max() / scale


def test_unstack_layers_quantized_tree_cached():
    """decode.unstack_layers handles {q, s} dict leaves (per-layer slicing
    maps over them) and its identity cache works for quantized trees."""
    from controlar_tpu import decode as dec

    cfg = tiny_cfg()
    params = jgpt.init_gpt_params(jax.random.PRNGKey(7), cfg, jnp.bfloat16)
    qp = quant.quantize_gpt_params(params)
    u1 = dec.unstack_layers(qp)
    u2 = dec.unstack_layers(qp)
    assert u1 is u2  # cache hit on the same stacked tree
    assert isinstance(u1["layers"], tuple) and len(u1["layers"]) == cfg.n_layer
    l0 = u1["layers"][0]
    assert quant.is_quantized(l0["wqkv"])
    assert l0["wqkv"]["q"].shape == (cfg.dim, 3 * cfg.dim)
    np.testing.assert_array_equal(
        np.asarray(l0["wqkv"]["q"]), np.asarray(qp["layers"]["wqkv"]["q"][0]))


def test_quant_agreement_gate():
    """The accuracy gate orders the modes sensibly and int8 clears a floor
    at tiny scale (the structural claim; absolute numbers are logged for
    real weights through verify-zoo --quant-report)."""
    from controlar_tpu.eval.quant_report import (
        format_report, measure_quant_agreement)

    cfg = GPTConfig(model_type="c2i", dim=128, n_layer=3, n_head=4,
                    cls_token_num=1, block_size=64, vocab_size=512,
                    num_classes=16)
    params = jgpt.init_gpt_params(jax.random.PRNGKey(0), cfg,
                                  dtype=jnp.bfloat16)
    rep = measure_quant_agreement(
        params, cfg, modes=("int8", "int8+kv8", "w4"), max_new_tokens=64)
    txt = format_report(rep)
    assert "int8+kv8" in txt

    i8 = rep["int8"]
    # int8 weight-only: near-lossless teacher-forced agreement
    assert i8["teacher_forced_agreement"] >= 0.9, rep
    assert i8["max_rel_logit_err"] < 0.1, rep
    # adding KV-cache quantization can only add noise
    assert (rep["int8+kv8"]["max_rel_logit_err"]
            >= i8["max_rel_logit_err"] * 0.5)
    # w4 is coarser than int8
    assert rep["w4"]["max_rel_logit_err"] >= i8["max_rel_logit_err"], rep
    assert rep["w4"]["teacher_forced_agreement"] >= 0.3, rep
    for m in rep.values():
        assert 0 <= m["free_running_match"] <= 1
        assert 0 <= m["mean_prefix_survival"] <= 64


def test_unstack_cache_distinguishes_quantized_tree():
    """Regression: unstack(params) then unstack(quantize(params)) must NOT
    alias (the cache once keyed on the first leaf, which quantization leaves
    untouched — the quant-report then silently measured bf16 vs bf16)."""
    from controlar_tpu import decode as dec

    cfg = GPTConfig(model_type="c2i", dim=32, n_layer=2, n_head=2,
                    cls_token_num=1, block_size=4, vocab_size=32,
                    num_classes=4)
    params = jgpt.init_gpt_params(jax.random.PRNGKey(0), cfg)
    base = dec.unstack_layers(params)
    qp = dec.unstack_layers(quant.quantize_gpt_params(params))
    assert quant.is_quantized(qp["layers"][0]["w1"])
    assert not quant.is_quantized(base["layers"][0]["w1"])


def test_quantize_gpt_params_unstacked_matches_stacked():
    """quantize(unstack(p)) must equal unstack(quantize(p)) — the unstacked
    path exists so the GPT-3B quant-report never holds a stacked int8 temp
    (HBM headroom fix)."""
    from controlar_tpu import decode as dec

    cfg = tiny_cfg()
    p = jgpt.init_gpt_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    a = dec.unstack_layers(quant.quantize_gpt_params(p))
    b = quant.quantize_gpt_params(dec.unstack_layers(p))
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
