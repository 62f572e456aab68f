"""Flash-decode attention over a STACKED (L, B, S, R) KV cache.

The uniform-position decode loop (generate.py) previously paid 2 XLA
dynamic-update-slice dispatches per layer per step to append the new KV row
before attention (~0.33 ms/step at GPT-3B — 48 DUS of ~7 us each in the
device trace). These kernels remove the per-layer appends entirely:

- the cache is ONE stacked array per format, (L, B, S, R); the kernel takes
  the whole HBM ref plus a TRACED layer index (major-dim indexing is free,
  and one Mosaic binary serves all layers);
- attention reads HBM rows [0, pos) and scores the IN-FLIGHT row (the row
  being appended at `pos`) directly from a VMEM operand, exactly like
  flash_decode_attention2_q8_append's epilogue math;
- the caller batches all L layers' new rows into a single stacked DUS at
  the end of the step (decode._decode_step_flat_stacked): 48 DUS -> 2.

Positions may be a scalar (uniform — the generate() regime) or a (B,)
vector (per-slot — the serving engine's continuous batching). EVERY
position must be >= 1 (a prefill precedes decode; serving must clamp
never-admitted slots to 1): the chained cross-slot DMA prefetch assumes
each batch element streams at least one block, exactly like
flash_decode_attention2_q8_append. col_bias, when given, must be 0 at
decode positions (prefix masks only), the same contract as q8_append.

Math is identical to ops/flash_decode2.py (same block-diagonal-q MXU trick,
same online softmax); reference role unchanged (the reference needed a vLLM
fork + CUDA graphs for this loop, serve/model_runner.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from controlar_tpu.ops.w4_matmul import unpack_nibbles

DEFAULT_BLOCK = 256

# tests flip this to run the real kernels (interpret mode) inside a full
# CPU generate; production callers leave it False
INTERPRET = False


def _sel_row(ref2d, b, dtype=jnp.float32):
    """Dynamic single-row VMEM loads are not tileable; select-reduce."""
    sel = jax.lax.broadcasted_iota(jnp.int32, ref2d.shape, 0) == b
    return jnp.sum(jnp.where(sel, ref2d[:].astype(dtype), 0.0), axis=0)


def _scalars(layer, pos, b):
    """Scalar-prefetch vector [layer, pos_0..pos_{B-1}]; pos may be a
    scalar (uniform decode) or (B,) (per-slot serving)."""
    pos_vec = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1),
                               (b,))
    return jnp.concatenate(
        [jnp.asarray(layer, jnp.int32).reshape(1), pos_vec])


def _head_masks(n_head, head_dim):
    hd = n_head * head_dim
    row = jax.lax.broadcasted_iota(jnp.int32, (hd, n_head), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (hd, n_head), 1)
    head_mask = (row // head_dim) == col
    erow = jax.lax.broadcasted_iota(jnp.int32, (n_head, hd), 0)
    ecol = jax.lax.broadcasted_iota(jnp.int32, (n_head, hd), 1)
    exp_mask = ((ecol // head_dim) == erow).astype(jnp.bfloat16)
    return head_mask, exp_mask


def _bias_row(bias_ref, b, i, block, batch):
    bias_blk = bias_ref[:, pl.ds(i * block, block)]
    bsel = jax.lax.broadcasted_iota(jnp.int32, (batch, block), 0) == b
    return jnp.sum(jnp.where(bsel, bias_blk, 0.0), axis=0).reshape(block, 1)


# ---------------------------------------------------------------------------
# bf16 stacked
# ---------------------------------------------------------------------------

def _kernel_bf16s(sc_ref, q_ref, kvn_ref, kv_hbm, bias_ref, o_ref,
                  kvbuf, sem,
                  *, n_head, head_dim, block, batch, has_bias):
    hd = n_head * head_dim
    scale = 1.0 / np.sqrt(head_dim)
    lyr = sc_ref[0]
    head_mask, exp_mask = _head_masks(n_head, head_dim)
    exp_mask_f = exp_mask.astype(jnp.float32)

    def get_dma(slot, b, i):
        return pltpu.make_async_copy(
            kv_hbm.at[lyr, b, pl.ds(i * block, block), :], kvbuf.at[slot],
            sem.at[slot])

    get_dma(0, 0, 0).start()

    def body_b(b, slot0):
        pos = sc_ref[1 + b]  # rows [0, pos) from HBM; row pos from VMEM
        nb = pl.cdiv(pos, block)
        qf = _sel_row(q_ref, b)
        q_bd = jnp.where(head_mask, qf[:, None], 0.0).astype(jnp.bfloat16)

        def body_blk(i, carry):
            m, l, acc, slot = carry
            nxt = (slot + 1) % 2

            @pl.when(i + 1 < nb)
            def _():
                get_dma(nxt, b, i + 1).start()

            @pl.when((i + 1 == nb) & (b + 1 < batch))
            def _():
                get_dma(nxt, b + 1, 0).start()

            get_dma(slot, b, i).wait()
            kb = kvbuf[slot][:, :hd]
            vb = kvbuf[slot][:, hd:]
            s = jnp.dot(kb, q_bd, preferred_element_type=jnp.float32) * scale
            rows = i * block + jax.lax.broadcasted_iota(
                jnp.int32, (block, n_head), 0)
            s = jnp.where(rows < pos, s, -jnp.inf)
            if has_bias:
                s = s + _bias_row(bias_ref, b, i, block, batch)
            m_blk = jnp.max(s, axis=0, keepdims=True)
            m_new = jnp.maximum(m, m_blk)
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l_new = l * alpha + jnp.sum(p, axis=0, keepdims=True)
            p_e = jnp.dot(p.astype(jnp.bfloat16), exp_mask,
                          preferred_element_type=jnp.float32)
            term = jnp.sum(p_e * vb.astype(jnp.float32), axis=0,
                           keepdims=True)
            alpha_e = jnp.dot(alpha.astype(jnp.bfloat16), exp_mask,
                              preferred_element_type=jnp.float32)
            return m_new, l_new, acc * alpha_e + term, nxt

        m0 = jnp.full((1, n_head), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((1, n_head), jnp.float32)
        acc0 = jnp.zeros((1, hd), jnp.float32)
        m, l, acc, slot_end = jax.lax.fori_loop(
            0, nb, body_blk, (m0, l0, acc0, slot0))

        # in-flight row (position pos) from VMEM
        knv = _sel_row(kvn_ref, b)
        s_new = jnp.dot((knv[:hd] * qf)[None].astype(jnp.bfloat16),
                        exp_mask.T, preferred_element_type=jnp.float32)
        s_new = s_new * scale  # (1, H)
        m_fin = jnp.maximum(m, s_new)
        alpha = jnp.exp(m - m_fin)
        p_new = jnp.exp(s_new - m_fin)
        l_fin = l * alpha + p_new
        alpha_e = jnp.dot(alpha.astype(jnp.bfloat16), exp_mask,
                          preferred_element_type=jnp.float32)
        pv_e = jnp.dot(p_new.astype(jnp.bfloat16), exp_mask,
                       preferred_element_type=jnp.float32)
        acc = acc * alpha_e + pv_e * knv[hd:][None]

        l_e = jnp.dot(l_fin, exp_mask_f, preferred_element_type=jnp.float32)
        val = (acc / l_e).astype(o_ref.dtype)
        sel = jax.lax.broadcasted_iota(jnp.int32, o_ref.shape, 0) == b
        o_ref[:] = jnp.where(sel, val, o_ref[:])
        return slot_end

    jax.lax.fori_loop(0, batch, body_b, jnp.asarray(0, jnp.int32))


@functools.partial(jax.jit, static_argnames=("n_head", "block", "interpret"))
def flash_stacked(
    q: jnp.ndarray,        # (B, H*D)
    new_kv: jnp.ndarray,   # (B, 2*H*D) — the row for position pos (unwritten)
    kv_stack: jnp.ndarray,  # (L, B, S, 2*H*D) — rows [0, pos) valid
    layer: jnp.ndarray,    # scalar int32 (traced)
    pos: jnp.ndarray,      # scalar (uniform) or (B,) per-slot positions
    col_bias: jnp.ndarray | None = None,  # (B, S), 0 at decode positions
    *,
    n_head: int,
    block: int = DEFAULT_BLOCK,
    interpret: bool | None = None,
) -> jnp.ndarray:
    nl, b, s, hd2 = kv_stack.shape
    hd = hd2 // 2
    head_dim = hd // n_head
    has_bias = col_bias is not None
    if not has_bias:
        col_bias = jnp.zeros((b, 8), jnp.float32)
    kernel = functools.partial(
        _kernel_bf16s, n_head=n_head, head_dim=head_dim, block=block,
        batch=b, has_bias=has_bias)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),   # q
                pl.BlockSpec(memory_space=pltpu.VMEM),   # new row
                pl.BlockSpec(memory_space=pltpu.HBM),    # stacked cache
                pl.BlockSpec(memory_space=pltpu.VMEM),   # bias
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, block, hd2), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hd), q.dtype),
        interpret=INTERPRET if interpret is None else interpret,
    )(
        _scalars(layer, pos, b),
        q.astype(jnp.bfloat16),
        new_kv.astype(jnp.bfloat16),
        kv_stack,
        col_bias.astype(jnp.float32),
    )
    return out


# ---------------------------------------------------------------------------
# int8 stacked
# ---------------------------------------------------------------------------

def _kernel_q8s(sc_ref, q_ref, kvn_ref, sn_ref, kv_hbm, sc_hbm, bias_ref,
                o_ref, kvbuf, scbuf, sem, scsem,
                *, n_head, head_dim, block, batch, has_bias, s_pad):
    hd = n_head * head_dim
    scale = 1.0 / np.sqrt(head_dim)
    lyr = sc_ref[0]
    head_mask, exp_mask = _head_masks(n_head, head_dim)
    exp_mask_f = exp_mask.astype(jnp.float32)

    def get_dma(slot, b, i):
        return pltpu.make_async_copy(
            kv_hbm.at[lyr, b, pl.ds(i * block, block), :], kvbuf.at[slot],
            sem.at[slot])

    def get_sc_dma(slot, b, i):
        return pltpu.make_async_copy(
            sc_hbm.at[lyr, b, pl.ds(i * block, block), :], scbuf.at[slot],
            scsem.at[slot])

    get_dma(0, 0, 0).start()
    get_sc_dma(0, 0, 0).start()

    def body_b(b, slot0):
        pos = sc_ref[1 + b]  # rows [0, pos) from HBM; row pos from VMEM
        nb = pl.cdiv(pos, block)
        qf = _sel_row(q_ref, b)
        q_bd = jnp.where(head_mask, qf[:, None], 0.0).astype(jnp.bfloat16)

        def body_blk(i, carry):
            m, l, acc, slot = carry
            nxt = (slot + 1) % 2

            @pl.when(i + 1 < nb)
            def _():
                get_dma(nxt, b, i + 1).start()
                get_sc_dma(nxt, b, i + 1).start()

            @pl.when((i + 1 == nb) & (b + 1 < batch))
            def _():
                get_dma(nxt, b + 1, 0).start()
                get_sc_dma(nxt, b + 1, 0).start()

            get_dma(slot, b, i).wait()
            get_sc_dma(slot, b, i).wait()

            kb = kvbuf[slot][:, :hd].astype(jnp.bfloat16)
            ks = scbuf[slot][:, :n_head]
            vs = scbuf[slot][:, n_head: 2 * n_head]
            s = jnp.dot(kb, q_bd, preferred_element_type=jnp.float32)
            s = s * ks * scale
            rows = i * block + jax.lax.broadcasted_iota(
                jnp.int32, (block, n_head), 0)
            s = jnp.where(rows < pos, s, -jnp.inf)
            if has_bias:
                s = s + _bias_row(bias_ref, b, i, block, batch)
            m_blk = jnp.max(s, axis=0, keepdims=True)
            m_new = jnp.maximum(m, m_blk)
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l_new = l * alpha + jnp.sum(p, axis=0, keepdims=True)
            p2_e = jnp.dot((p * vs).astype(jnp.bfloat16), exp_mask,
                           preferred_element_type=jnp.float32)
            vb = kvbuf[slot][:, hd:].astype(jnp.float32)
            term = jnp.sum(p2_e * vb, axis=0, keepdims=True)
            alpha_e = jnp.dot(alpha.astype(jnp.bfloat16), exp_mask,
                              preferred_element_type=jnp.float32)
            return m_new, l_new, acc * alpha_e + term, nxt

        m0 = jnp.full((1, n_head), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((1, n_head), jnp.float32)
        acc0 = jnp.zeros((1, hd), jnp.float32)
        m, l, acc, slot_end = jax.lax.fori_loop(
            0, nb, body_blk, (m0, l0, acc0, slot0))

        # in-flight row: int8 values + scales from VMEM
        knf = _sel_row(kvn_ref, b)          # (2hd,) int8 values as f32
        snf = _sel_row(sn_ref, b)           # (s_pad,)
        ks_n = snf[:n_head][None]
        vs_n = snf[n_head: 2 * n_head][None]
        s_new = jnp.dot((knf[:hd] * qf)[None].astype(jnp.bfloat16),
                        exp_mask.T, preferred_element_type=jnp.float32)
        s_new = s_new * ks_n * scale
        m_fin = jnp.maximum(m, s_new)
        alpha = jnp.exp(m - m_fin)
        p_new = jnp.exp(s_new - m_fin)
        l_fin = l * alpha + p_new
        alpha_e = jnp.dot(alpha.astype(jnp.bfloat16), exp_mask,
                          preferred_element_type=jnp.float32)
        pv_e = jnp.dot((p_new * vs_n).astype(jnp.bfloat16), exp_mask,
                       preferred_element_type=jnp.float32)
        acc = acc * alpha_e + pv_e * knf[hd:][None]

        l_e = jnp.dot(l_fin, exp_mask_f, preferred_element_type=jnp.float32)
        val = (acc / l_e).astype(o_ref.dtype)
        sel = jax.lax.broadcasted_iota(jnp.int32, o_ref.shape, 0) == b
        o_ref[:] = jnp.where(sel, val, o_ref[:])
        return slot_end

    jax.lax.fori_loop(0, batch, body_b, jnp.asarray(0, jnp.int32))


@functools.partial(jax.jit, static_argnames=("n_head", "block", "interpret"))
def flash_stacked_q8(
    q: jnp.ndarray,        # (B, H*D)
    new_kv: jnp.ndarray,   # (B, 2*H*D) int8 quantized row for position pos
    new_s: jnp.ndarray,    # (B, s_pad) f32 row scales (lane-padded)
    kv_stack: jnp.ndarray,  # (L, B, S, 2*H*D) int8
    sc_stack: jnp.ndarray,  # (L, B, S, s_pad) f32
    layer: jnp.ndarray,
    pos: jnp.ndarray,
    col_bias: jnp.ndarray | None = None,
    *,
    n_head: int,
    block: int = DEFAULT_BLOCK,
    interpret: bool | None = None,
) -> jnp.ndarray:
    nl, b, s, hd2 = kv_stack.shape
    hd = hd2 // 2
    head_dim = hd // n_head
    s_pad = sc_stack.shape[-1]
    assert s_pad % 128 == 0 and new_s.shape[-1] == s_pad
    has_bias = col_bias is not None
    if not has_bias:
        col_bias = jnp.zeros((b, 8), jnp.float32)
    kernel = functools.partial(
        _kernel_q8s, n_head=n_head, head_dim=head_dim, block=block,
        batch=b, has_bias=has_bias, s_pad=s_pad)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),   # q
                pl.BlockSpec(memory_space=pltpu.VMEM),   # new row
                pl.BlockSpec(memory_space=pltpu.VMEM),   # new scales
                pl.BlockSpec(memory_space=pltpu.HBM),    # kv stack
                pl.BlockSpec(memory_space=pltpu.HBM),    # scale stack
                pl.BlockSpec(memory_space=pltpu.VMEM),   # bias
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, block, hd2), jnp.int8),
                pltpu.VMEM((2, block, s_pad), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hd), q.dtype),
        interpret=INTERPRET if interpret is None else interpret,
    )(
        _scalars(layer, pos, b),
        q.astype(jnp.bfloat16),
        new_kv,
        new_s.astype(jnp.float32),
        kv_stack,
        sc_stack,
        col_bias.astype(jnp.float32),
    )
    return out


# ---------------------------------------------------------------------------
# int4 stacked (nibble-packed carriers, quantize_kv_rows_4 layout)
# ---------------------------------------------------------------------------

def _kernel_q4s(sc_ref, qe_ref, qo_ref, ncn_ref, sn_ref, kv_hbm, sc_hbm,
                bias_ref, o_ref, kvbuf, scbuf, sem, scsem,
                *, n_head, half_d, w, block, batch, has_bias, s_pad):
    half = n_head * half_d
    scale = 1.0 / np.sqrt(2 * half_d)
    lyr = sc_ref[0]

    lane = jax.lax.broadcasted_iota(jnp.int32, (w, n_head), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (w, n_head), 1)
    head_mask = (lane // half_d == col) & (lane < half)
    elane = jax.lax.broadcasted_iota(jnp.int32, (n_head, w), 1)
    erow = jax.lax.broadcasted_iota(jnp.int32, (n_head, w), 0)
    exp_mask = ((elane // half_d == erow) & (elane < half)).astype(
        jnp.bfloat16)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (n_head, 2 * w), 1) % w
    exp_mask2 = ((lane2 // half_d == jax.lax.broadcasted_iota(
        jnp.int32, (n_head, 2 * w), 0)) & (lane2 < half)).astype(jnp.bfloat16)
    exp_mask2_f = exp_mask2.astype(jnp.float32)

    def get_dma(slot, b, i):
        return pltpu.make_async_copy(
            kv_hbm.at[lyr, b, pl.ds(i * block, block), :], kvbuf.at[slot],
            sem.at[slot])

    def get_sc_dma(slot, b, i):
        return pltpu.make_async_copy(
            sc_hbm.at[lyr, b, pl.ds(i * block, block), :], scbuf.at[slot],
            scsem.at[slot])

    get_dma(0, 0, 0).start()
    get_sc_dma(0, 0, 0).start()

    def body_b(b, slot0):
        pos = sc_ref[1 + b]
        nb = pl.cdiv(pos, block)
        qe_bd = jnp.where(head_mask, _sel_row(qe_ref, b)[:, None],
                          0.0).astype(jnp.bfloat16)
        qo_bd = jnp.where(head_mask, _sel_row(qo_ref, b)[:, None],
                          0.0).astype(jnp.bfloat16)

        def body_blk(i, carry):
            m, l, acc, slot = carry
            nxt = (slot + 1) % 2

            @pl.when(i + 1 < nb)
            def _():
                get_dma(nxt, b, i + 1).start()
                get_sc_dma(nxt, b, i + 1).start()

            @pl.when((i + 1 == nb) & (b + 1 < batch))
            def _():
                get_dma(nxt, b + 1, 0).start()
                get_sc_dma(nxt, b + 1, 0).start()

            get_dma(slot, b, i).wait()
            get_sc_dma(slot, b, i).wait()

            k_lo, k_hi = unpack_nibbles(kvbuf[slot][:, :w],
                                        jnp.bfloat16)
            ks = scbuf[slot][:, :n_head]
            vs = scbuf[slot][:, n_head: 2 * n_head]
            s = (jnp.dot(k_lo, qe_bd, preferred_element_type=jnp.float32)
                 + jnp.dot(k_hi, qo_bd, preferred_element_type=jnp.float32))
            s = s * ks * scale
            rows = i * block + jax.lax.broadcasted_iota(
                jnp.int32, (block, n_head), 0)
            s = jnp.where(rows < pos, s, -jnp.inf)
            if has_bias:
                s = s + _bias_row(bias_ref, b, i, block, batch)
            m_blk = jnp.max(s, axis=0, keepdims=True)
            m_new = jnp.maximum(m, m_blk)
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l_new = l * alpha + jnp.sum(p, axis=0, keepdims=True)
            p2_e = jnp.dot((p * vs).astype(jnp.bfloat16), exp_mask,
                           preferred_element_type=jnp.float32)
            v_lo, v_hi = unpack_nibbles(kvbuf[slot][:, w: 2 * w],
                                        jnp.float32)
            t_even = jnp.sum(p2_e * v_lo, axis=0, keepdims=True)
            t_odd = jnp.sum(p2_e * v_hi, axis=0, keepdims=True)
            term = jnp.concatenate([t_even, t_odd], axis=1)
            alpha_e = jnp.dot(alpha.astype(jnp.bfloat16), exp_mask2,
                              preferred_element_type=jnp.float32)
            return m_new, l_new, acc * alpha_e + term, nxt

        m0 = jnp.full((1, n_head), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((1, n_head), jnp.float32)
        acc0 = jnp.zeros((1, 2 * w), jnp.float32)
        m, l, acc, slot_end = jax.lax.fori_loop(
            0, nb, body_blk, (m0, l0, acc0, slot0))

        # in-flight row: unpack the carrier row from VMEM
        ncf = _sel_row(ncn_ref, b)          # (2w,) carrier bytes as f32
        snf = _sel_row(sn_ref, b)
        ks_n = snf[:n_head][None]
        vs_n = snf[n_head: 2 * n_head][None]
        # slice-then-expand (ncf[None, :w] lowers to an unsupported gather)
        kci = ncf[:w][None].astype(jnp.int32)      # (1, w)
        k_lo = ((kci << 28) >> 28).astype(jnp.float32)
        k_hi = (kci >> 4).astype(jnp.float32)
        qe_f = _sel_row(qe_ref, b)[None]
        qo_f = _sel_row(qo_ref, b)[None]
        s_new = jnp.dot((k_lo * qe_f + k_hi * qo_f).astype(jnp.bfloat16),
                        exp_mask.T, preferred_element_type=jnp.float32)
        s_new = s_new * ks_n * scale               # (1, H)
        m_fin = jnp.maximum(m, s_new)
        alpha = jnp.exp(m - m_fin)
        p_new = jnp.exp(s_new - m_fin)
        l_fin = l * alpha + p_new
        alpha_e = jnp.dot(alpha.astype(jnp.bfloat16), exp_mask2,
                          preferred_element_type=jnp.float32)
        pv_e = jnp.dot((p_new * vs_n).astype(jnp.bfloat16), exp_mask,
                       preferred_element_type=jnp.float32)  # (1, w)
        vci = ncf[w:][None].astype(jnp.int32)
        v_lo = ((vci << 28) >> 28).astype(jnp.float32)
        v_hi = (vci >> 4).astype(jnp.float32)
        term = jnp.concatenate([pv_e * v_lo, pv_e * v_hi], axis=1)
        acc = acc * alpha_e + term

        l_e = jnp.dot(l_fin, exp_mask2_f, preferred_element_type=jnp.float32)
        val = (acc / jnp.maximum(l_e, 1e-30)).astype(o_ref.dtype)
        sel = jax.lax.broadcasted_iota(jnp.int32, o_ref.shape, 0) == b
        o_ref[:] = jnp.where(sel, val, o_ref[:])
        return slot_end

    jax.lax.fori_loop(0, batch, body_b, jnp.asarray(0, jnp.int32))


@functools.partial(jax.jit,
                   static_argnames=("n_head", "head_dim", "block",
                                    "interpret", "split"))
def flash_stacked_q4(
    q: jnp.ndarray,        # (B, H*D)
    new_c: jnp.ndarray,    # (B, 2*W) int4 carriers for position pos
    new_s: jnp.ndarray,    # (B, s_pad) f32
    kv_stack: jnp.ndarray,  # (L, B, S, 2*W) int8 carriers
    sc_stack: jnp.ndarray,  # (L, B, S, s_pad) f32
    layer: jnp.ndarray,
    pos: jnp.ndarray,
    col_bias: jnp.ndarray | None = None,
    *,
    n_head: int,
    head_dim: int,
    block: int = DEFAULT_BLOCK,
    interpret: bool | None = None,
    split: bool = False,
) -> jnp.ndarray:
    nl, b, s, w2 = kv_stack.shape
    w = w2 // 2
    d = head_dim
    half = n_head * (d // 2)
    hd = n_head * d
    s_pad = sc_stack.shape[-1]
    assert s_pad % 128 == 0 and new_s.shape[-1] == s_pad
    has_bias = col_bias is not None
    if not has_bias:
        col_bias = jnp.zeros((b, 8), jnp.float32)

    qhd = q.reshape(b, n_head, d)
    if split:
        qe = qhd[..., : d // 2].reshape(b, half)
        qo = qhd[..., d // 2:].reshape(b, half)
    else:
        qe = qhd[..., 0::2].reshape(b, half)
        qo = qhd[..., 1::2].reshape(b, half)
    if w > half:
        qe = jnp.pad(qe, ((0, 0), (0, w - half)))
        qo = jnp.pad(qo, ((0, 0), (0, w - half)))

    kernel = functools.partial(
        _kernel_q4s, n_head=n_head, half_d=d // 2, w=w, block=block,
        batch=b, has_bias=has_bias, s_pad=s_pad)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),   # qe
                pl.BlockSpec(memory_space=pltpu.VMEM),   # qo
                pl.BlockSpec(memory_space=pltpu.VMEM),   # new carriers
                pl.BlockSpec(memory_space=pltpu.VMEM),   # new scales
                pl.BlockSpec(memory_space=pltpu.HBM),    # carrier stack
                pl.BlockSpec(memory_space=pltpu.HBM),    # scale stack
                pl.BlockSpec(memory_space=pltpu.VMEM),   # bias
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, block, 2 * w), jnp.int8),
                pltpu.VMEM((2, block, s_pad), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, 2 * w), q.dtype),
        interpret=INTERPRET if interpret is None else interpret,
    )(
        _scalars(layer, pos, b),
        qe.astype(jnp.bfloat16),
        qo.astype(jnp.bfloat16),
        new_c,
        new_s.astype(jnp.float32),
        kv_stack,
        sc_stack,
        col_bias.astype(jnp.float32),
    )
    o_even = out[:, :w][:, :half].reshape(b, n_head, d // 2)
    o_odd = out[:, w:][:, :half].reshape(b, n_head, d // 2)
    if split:
        return jnp.concatenate([o_even, o_odd], axis=-1).reshape(b, hd)
    return jnp.stack([o_even, o_odd], axis=-1).reshape(b, hd)
