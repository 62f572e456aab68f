"""Client-side TPU (Mosaic) lowering of every new Pallas kernel.

Interpret mode hides Mosaic trace-time restrictions (gather support, block
shape divisibility, dtype verifier rules); `.lower(lowering_platforms=
("tpu",))` runs the Pallas->Mosaic lowering on CPU without a TPU backend
and catches them. This gate found three real bugs on first run (a 1D
mixed-index gather in the q4 in-flight unpack, a (1,1,hd) block violating
the trailing-dims rule, and a bf16-logistic broadcast verifier trip).
Compile-server-side failures (layout/alignment) can still only surface on
hardware, but everything trace-level is pinned here.
"""
import jax
import jax.numpy as jnp
import pytest

from controlar_tpu.ops import flash_decode_stacked as fds
from controlar_tpu.ops.cache_append import cache_append_rows_stacked
from controlar_tpu.ops.w4_matmul import (
    quantize_weight_w4, w4_ffn, w4_matmul)
from controlar_tpu.quant import kv4_row_width

L, B, H, D, S = 2, 4, 4, 64, 256
HD = H * D
SP = 128


def _lowers(fn, *args):
    jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))


def test_stacked_kernels_lower_for_tpu():
    q = jnp.zeros((B, HD), jnp.bfloat16)
    stack = jnp.zeros((L, B, S, 2 * HD), jnp.bfloat16)
    cb = jnp.zeros((B, S), jnp.float32)
    _lowers(lambda a, b, c: fds.flash_stacked(
        a, b, c, jnp.int32(1), jnp.int32(5), None, n_head=H),
        q, jnp.zeros((B, 2 * HD), jnp.bfloat16), stack)
    _lowers(lambda a, b, c, d: fds.flash_stacked(
        a, b, c, jnp.int32(1), jnp.int32(5), d, n_head=H),
        q, jnp.zeros((B, 2 * HD), jnp.bfloat16), stack, cb)

    kv8 = jnp.zeros((L, B, S, 2 * HD), jnp.int8)
    sc = jnp.zeros((L, B, S, SP), jnp.float32)
    nk8 = jnp.zeros((B, 2 * HD), jnp.int8)
    ns = jnp.zeros((B, SP), jnp.float32)
    pos_v = jnp.asarray([1] * B, jnp.int32)  # per-slot vector
    _lowers(lambda a, b, c, d, e: fds.flash_stacked_q8(
        a, b, c, d, e, jnp.int32(0), pos_v, None, n_head=H),
        q, nk8, ns, kv8, sc)

    w = kv4_row_width(H, D)
    kv4 = jnp.zeros((L, B, S, 2 * w), jnp.int8)
    nc = jnp.zeros((B, 2 * w), jnp.int8)
    for split in (False, True):
        _lowers(lambda a, b, c, d, e: fds.flash_stacked_q4(
            a, b, c, d, e, jnp.int32(0), jnp.int32(7), None,
            n_head=H, head_dim=D, split=split),
            q, nc, ns, kv4, sc)


def test_stacked_append_kernel_lowers_for_tpu():
    kv8 = jnp.zeros((L, B, S, 2 * HD), jnp.int8)
    rows = jnp.zeros((L, B, 2 * HD), jnp.int8)
    pos = jnp.asarray([1] * B, jnp.int32)
    _lowers(lambda a, b, c: cache_append_rows_stacked(a, b, c),
            kv8, rows, pos)
    scs = jnp.zeros((L, B, S, SP), jnp.float32)
    rows_s = jnp.zeros((L, B, SP), jnp.float32)
    _lowers(lambda a, b, c: cache_append_rows_stacked(a, b, c),
            scs, rows_s, pos)


@pytest.mark.parametrize("k,f,n", [(256, 512, 256), (384, 384, 128)])
def test_w4_ffn_lowers_for_tpu(k, f, n):
    x = jnp.zeros((8, k), jnp.bfloat16)
    q13 = quantize_weight_w4(jnp.zeros((k, 2 * f)))
    q2 = quantize_weight_w4(jnp.zeros((f, n)))
    _lowers(lambda a: w4_ffn(a, q13["q4"], q13["s"], q2["q4"], q2["s"]), x)


def test_w4_matmul_chunk0_split_lowers_for_tpu():
    qw = quantize_weight_w4(jnp.zeros((3200, 768)))
    x = jnp.zeros((16, 3200), jnp.bfloat16)
    _lowers(lambda a: w4_matmul(a, qw["q4"], qw["s"]), x)


def test_full_generate_programs_lower_for_tpu():
    """The complete jitted decode programs at every serving configuration
    (bf16, int8+kv8, W4+split-rope+kv4+fused-FFN; per-layer and stacked;
    flash on) lower for TPU end to end — the exact compositions the bench
    sweep compiles on hardware."""
    from controlar_tpu import decode as dec
    from controlar_tpu import generate as jgen
    from controlar_tpu import quant
    from controlar_tpu.config import GPTConfig
    from controlar_tpu.models import gpt as jgpt

    cfg = GPTConfig(model_type="c2i", dim=256, n_layer=2, n_head=2,
                    cls_token_num=1, block_size=16, vocab_size=256,
                    num_classes=10)
    params = jgpt.init_gpt_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    labels = jnp.arange(4)

    def trace(params, cache_dtype, kv_stacked, expect_kernels=()):
        kw = dict(cfg=cfg, max_new_tokens=cfg.block_size, cfg_scale=4.0,
                  temperature=1.0, top_k=16, top_p=1.0, sample_logits=True,
                  cache_dtype=cache_dtype, use_flash=True,
                  kv_stacked=kv_stacked)
        prefix = jgpt.embed_prefix_c2i(
            params, jnp.concatenate([labels, labels]))
        lowered = jgen.generate_tokens.trace(
            dec.unstack_layers(params), prefix_emb=prefix, fused3=None,
            col_mask=None, rng=jax.random.PRNGKey(0),
            control_strength=jnp.float32(1.0), **kw,
        ).lower(lowering_platforms=("tpu",))
        txt = lowered.as_text()
        for name in expect_kernels:
            assert name in txt, f"{name} kernel missing from the program"

    for stacked in (False, True):
        trace(params, jnp.bfloat16, stacked)
        trace(quant.quantize_gpt_params(params), jnp.int8, stacked)
        # the full 3B serving point: W4 weights (fused w13 + fused FFN +
        # chunk-0 split), split-rope layout, int4 KV cache. wdot/ffn route
        # to the Pallas kernels only when the default backend reads "tpu",
        # so patch it for the trace — otherwise this lowers the dequant
        # fallback instead of the real serving program.
        w4p = quant.quantize_gpt_params_w4(dec.unstack_layers(params),
                                           cfg=cfg)
        real_backend = jax.default_backend
        jax.default_backend = lambda: "tpu"
        try:
            trace(w4p, jnp.int4, stacked,
                  expect_kernels=("_w4_ffn_kernel", "_w4_kernel")
                  + (("_kernel_q4s",) if stacked else ("_kernel_q4",)))
        finally:
            jax.default_backend = real_backend


@pytest.mark.parametrize("stacked", [False, True])
def test_serve_quantum_and_admission_lower_for_tpu(stacked):
    """The serving engine's two compiled programs (group admission and the
    fixed-quantum decode scan) lower for TPU with flash kernels on, in both
    cache layouts — the composition bench_serve compiles on hardware."""
    from controlar_tpu.config import GPTConfig
    from controlar_tpu.models import gpt as jgpt
    from controlar_tpu.serve.engine import ServeConfig, ServeEngine

    cfg = GPTConfig(model_type="c2i", dim=256, n_layer=2, n_head=2,
                    cls_token_num=1, block_size=16, vocab_size=256,
                    num_classes=10)
    params = jgpt.init_gpt_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    eng = ServeEngine(params, cfg, ServeConfig(
        max_slots=2, quantum=4, cache_dtype=jnp.int8, use_flash=True,
        kv_stacked=stacked))

    n = 2
    eng._quantum_jit.trace(
        eng, eng.caches, eng.fused, eng.pos, eng.cur_tok, eng.cfg_scales,
        eng.strengths, jnp.ones((2 * n,), bool), eng.seeds, eng.col_mask,
    ).lower(lowering_platforms=("tpu",))

    k = 2
    eng._admit_group_jit.trace(
        eng, eng.caches, eng.fused, eng.pos, eng.cur_tok, eng.col_mask,
        eng.cfg_scales, eng.strengths, eng.seeds,
        jnp.asarray([1, 2], jnp.int32),
        jnp.zeros((k, cfg.block_size, cfg.adapter_dim), jnp.float32),
        jnp.ones((k, cfg.cls_token_num), bool),
        jnp.asarray([0, 1], jnp.int32),
        jnp.ones((k,), jnp.float32), jnp.ones((k,), jnp.float32),
        jnp.zeros((k,), jnp.uint32),
    ).lower(lowering_platforms=("tpu",))


def test_flash_train_pallas_lowers_for_tpu():
    from controlar_tpu.ops.flash_train_pallas import (
        flash_attention_train_pallas)

    q = jnp.zeros((2, 320, H, D), jnp.bfloat16)
    kv_mask = jnp.ones((2, 320), bool)

    def f(q, k, v, m):
        out = flash_attention_train_pallas(q, k, v, m, q_block=128,
                                           k_block=128)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    # fwd + both bwd kernels lower (grad traces the custom VJP)
    _lowers(jax.grad(f, argnums=(0, 1, 2)), q, q, q, kv_mask)


def test_flash_chunk_q4_lowers_for_tpu():
    from controlar_tpu.ops.flash_chunk import flash_chunk_attention_q4

    w = kv4_row_width(H, D)
    q = jnp.zeros((B, 3, HD), jnp.bfloat16)
    kv4 = jnp.zeros((B, S, 2 * w), jnp.int8)
    sc = jnp.zeros((B, S, SP), jnp.float32)
    pos = jnp.asarray([1] * B, jnp.int32)
    cb = jnp.zeros((B, S), jnp.float32)
    for split in (False, True):
        _lowers(lambda a, b, c, d: flash_chunk_attention_q4(
            a, b, c, d, None, n_head=H, head_dim=D, split=split),
            q, kv4, sc, pos)
    _lowers(lambda a, b, c, d, e: flash_chunk_attention_q4(
        a, b, c, d, e, n_head=H, head_dim=D), q, kv4, sc, pos, cb)
