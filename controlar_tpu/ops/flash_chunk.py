"""Flash chunk attention: K queries per batch row against the KV slab.

The speculative-verify / chunked-prefill attention primitive: query j of row
b attends cache rows <= pos[b] + j (the chunk's own rows are appended before
the call). Same streaming structure as ops/flash_decode2.py (single program,
double-buffered KV block DMAs, online softmax), with per-query running
(m, l, acc) carried as (K, ...) stacks; scores for all K queries are computed
per block before the per-query value expansion.

K is static and small (the draft length, 2-8): the extra VPU/MXU work rides
under the same KV DMA stream that a single-query decode step pays, which is
exactly why verification is nearly free in the bandwidth-bound regime.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK = 256


def _kernel(pos_ref, q_ref, kv_hbm, bias_ref, o_ref, kvbuf, sem,
            *, n_head: int, head_dim: int, block: int, batch: int, k: int,
            has_bias: bool, quant: bool, s_pad: int,
            sc_hbm=None, scbuf=None, scsem=None):
    hd = n_head * head_dim
    scale = 1.0 / np.sqrt(head_dim)

    row = jax.lax.broadcasted_iota(jnp.int32, (hd, n_head), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (hd, n_head), 1)
    head_mask = (row // head_dim) == col
    erow = jax.lax.broadcasted_iota(jnp.int32, (n_head, hd), 0)
    ecol = jax.lax.broadcasted_iota(jnp.int32, (n_head, hd), 1)
    exp_mask = ((ecol // head_dim) == erow).astype(jnp.bfloat16)
    exp_mask_f = exp_mask.astype(jnp.float32)

    def nblocks_of(b):
        # rows visible to the LAST query: pos + k - 1
        return pl.cdiv(pos_ref[b] + k, block)

    def get_dma(slot, b, i):
        return pltpu.make_async_copy(
            kv_hbm.at[b, pl.ds(i * block, block), :], kvbuf.at[slot],
            sem.at[slot])

    def get_sc_dma(slot, b, i):
        return pltpu.make_async_copy(
            sc_hbm.at[b, pl.ds(i * block, block), :], scbuf.at[slot],
            scsem.at[slot])

    get_dma(0, 0, 0).start()
    if quant:
        get_sc_dma(0, 0, 0).start()

    def body_b(b, slot0):
        pos = pos_ref[b]
        nb = nblocks_of(b)
        # q rows of this batch element: (K, hd) via select-reduce
        qsel3 = jax.lax.broadcasted_iota(
            jnp.int32, (batch, k, hd), 0) == b
        qb = jnp.sum(jnp.where(qsel3, q_ref[:].astype(jnp.float32), 0.0),
                     axis=0)  # (K, hd)

        def body_blk(i, carry):
            m, l, acc, slot = carry
            nxt = (slot + 1) % 2

            @pl.when(i + 1 < nb)
            def _():
                get_dma(nxt, b, i + 1).start()
                if quant:
                    get_sc_dma(nxt, b, i + 1).start()

            @pl.when((i + 1 == nb) & (b + 1 < batch))
            def _():
                get_dma(nxt, b + 1, 0).start()
                if quant:
                    get_sc_dma(nxt, b + 1, 0).start()

            get_dma(slot, b, i).wait()
            if quant:
                get_sc_dma(slot, b, i).wait()
                ks = scbuf[slot][:, :n_head]
                vs = scbuf[slot][:, n_head: 2 * n_head]

            kb = kvbuf[slot][:, :hd].astype(jnp.bfloat16)
            rows = i * block + jax.lax.broadcasted_iota(
                jnp.int32, (block, n_head), 0)
            if has_bias:
                bias_blk = bias_ref[:, pl.ds(i * block, block)]
                bsel = jax.lax.broadcasted_iota(
                    jnp.int32, (batch, block), 0) == b
                brow = jnp.sum(jnp.where(bsel, bias_blk, 0.0), axis=0)

            ss = []
            for j in range(k):
                qf = jnp.sum(jnp.where(
                    jax.lax.broadcasted_iota(jnp.int32, (k, hd), 0) == j,
                    qb, 0.0), axis=0)  # (hd,)
                q_bd = jnp.where(head_mask, qf[:, None], 0.0).astype(
                    jnp.bfloat16)
                sj = jnp.dot(kb, q_bd, preferred_element_type=jnp.float32)
                if quant:
                    sj = sj * ks
                sj = sj * scale
                sj = jnp.where(rows <= pos + j, sj, -jnp.inf)
                if has_bias:
                    # diagonal exception: a query's own column ignores the
                    # prefix bias (left-padded caption rows stay finite)
                    sj_b = sj + brow.reshape(block, 1)
                    sj = jnp.where(rows == pos + j, sj, sj_b)
                ss.append(sj)
            s = jnp.stack(ss, axis=0)  # (K, block, H)

            m_blk = jnp.max(s, axis=1)  # (K, H)
            m_new = jnp.maximum(m, m_blk)
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new[:, None, :])  # (K, block, H)
            l_new = l * alpha + jnp.sum(p, axis=1)

            if quant:
                vb = kvbuf[slot][:, hd:].astype(jnp.float32)
            else:
                vb = kvbuf[slot][:, hd:]
            terms = []
            for j in range(k):
                pj = jnp.sum(jnp.where(
                    jax.lax.broadcasted_iota(
                        jnp.int32, (k, block, n_head), 0) == j, p, 0.0),
                    axis=0)  # (block, H)
                if quant:
                    pj = pj * vs
                p_e = jnp.dot(pj.astype(jnp.bfloat16), exp_mask,
                              preferred_element_type=jnp.float32)
                terms.append(jnp.sum(p_e * vb.astype(jnp.float32), axis=0))
            term = jnp.stack(terms, axis=0)  # (K, hd)
            alpha_e = jnp.dot(alpha.astype(jnp.bfloat16), exp_mask,
                              preferred_element_type=jnp.float32)  # (K, hd)
            return m_new, l_new, acc * alpha_e + term, nxt

        m0 = jnp.full((k, n_head), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((k, n_head), jnp.float32)
        acc0 = jnp.zeros((k, hd), jnp.float32)
        m, l, acc, slot_end = jax.lax.fori_loop(
            0, nb, body_blk, (m0, l0, acc0, slot0))
        l_e = jnp.dot(l, exp_mask_f, preferred_element_type=jnp.float32)
        val = (acc / l_e).astype(o_ref.dtype)  # (K, hd)
        sel = jax.lax.broadcasted_iota(jnp.int32, (batch, k, hd), 0) == b
        o_ref[:] = jnp.where(sel, val[None], o_ref[:])
        return slot_end

    jax.lax.fori_loop(0, batch, body_b, jnp.asarray(0, jnp.int32))


def _call(q, kv_cache, kv_scale, pos, col_bias, n_head, block, interpret):
    b, kq, hd = q.shape
    s = kv_cache.shape[1]
    head_dim = hd // n_head
    quant = kv_scale is not None
    has_bias = col_bias is not None
    s_pad = 0
    scratch = [
        pltpu.VMEM((2, block, 2 * hd),
                   jnp.int8 if quant else jnp.bfloat16),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    operands = [q.astype(jnp.bfloat16)]
    if quant:
        if kv_scale.shape[-1] % 128 != 0:
            pad = 128 - kv_scale.shape[-1] % 128
            kv_scale = jnp.pad(kv_scale, ((0, 0), (0, 0), (0, pad)))
        s_pad = kv_scale.shape[-1]
        scratch = [
            pltpu.VMEM((2, block, 2 * hd), jnp.int8),
            pltpu.VMEM((2, block, s_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]

    if col_bias is None:
        col_bias = jnp.zeros((b, 8), jnp.float32)

    def kernel(pos_ref, q_ref, kv_hbm, *rest):
        if quant:
            sc_hbm, bias_ref, o_ref, kvbuf, scbuf, sem, scsem = rest
            _kernel(pos_ref, q_ref, kv_hbm, bias_ref, o_ref, kvbuf, sem,
                    n_head=n_head, head_dim=head_dim, block=block, batch=b,
                    k=kq, has_bias=has_bias, quant=True, s_pad=s_pad,
                    sc_hbm=sc_hbm, scbuf=scbuf, scsem=scsem)
        else:
            bias_ref, o_ref, kvbuf, sem = rest
            _kernel(pos_ref, q_ref, kv_hbm, bias_ref, o_ref, kvbuf, sem,
                    n_head=n_head, head_dim=head_dim, block=block, batch=b,
                    k=kq, has_bias=has_bias, quant=False, s_pad=0)

    args = [jnp.broadcast_to(pos.astype(jnp.int32).reshape(-1), (b,))]
    args.append(q.astype(jnp.bfloat16))
    args.append(kv_cache)
    if quant:
        args.append(kv_scale)
    args.append(col_bias.astype(jnp.float32))

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((b, kq, hd), q.dtype),
        interpret=interpret,
    )(*args)
    return out


@functools.partial(jax.jit, static_argnames=("n_head", "block", "interpret"))
def flash_chunk_attention(q, kv_cache, pos, col_bias=None, *, n_head,
                          block=DEFAULT_BLOCK, interpret=False):
    """q (B, K, H*D); kv_cache (B, S, 2*H*D) bf16 (chunk rows pre-written);
    pos (B,) base positions. Returns (B, K, H*D)."""
    return _call(q, kv_cache, None, pos, col_bias, n_head, block, interpret)


@functools.partial(jax.jit, static_argnames=("n_head", "block", "interpret"))
def flash_chunk_attention_q8(q, kv_cache, kv_scale, pos, col_bias=None, *,
                             n_head, block=DEFAULT_BLOCK, interpret=False):
    """Int8-cache variant: kv_cache int8 + per-head scale stream kv_scale
    (B, S, >=2H, lane-padded)."""
    return _call(q, kv_cache, kv_scale, pos, col_bias, n_head, block,
                 interpret)


# ---------------------------------------------------------------------------
# Int4 KV-cache chunk variant (nibble-packed rows, quant.quantize_kv_rows_4
# layout). Same per-query streaming structure as _kernel, with the q4 decode
# kernel's split-half unpack (ops/flash_decode2.py::_kernel_q4): q arrives as
# even/odd dim halves, carriers unpack to (lo, hi) nibble planes under the
# (quartered) KV DMA stream. This closes the spec-decode gap where W4 serving
# had to fall back to an int8 cache for chunk verification.
# ---------------------------------------------------------------------------

def _kernel_chunk_q4(pos_ref, qe_ref, qo_ref, kv_hbm, sc_hbm, bias_ref, o_ref,
                     kvbuf, scbuf, sem, scsem,
                     *, n_head: int, half_d: int, w: int, block: int,
                     batch: int, k: int, has_bias: bool, s_pad: int):
    from controlar_tpu.ops.w4_matmul import unpack_nibbles

    half = n_head * half_d
    scale = 1.0 / np.sqrt(2 * half_d)

    lane = jax.lax.broadcasted_iota(jnp.int32, (w, n_head), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (w, n_head), 1)
    head_mask = (lane // half_d == col) & (lane < half)
    elane = jax.lax.broadcasted_iota(jnp.int32, (n_head, w), 1)
    erow = jax.lax.broadcasted_iota(jnp.int32, (n_head, w), 0)
    exp_mask = ((elane // half_d == erow) & (elane < half)).astype(jnp.bfloat16)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (n_head, 2 * w), 1) % w
    exp_mask2 = ((lane2 // half_d == jax.lax.broadcasted_iota(
        jnp.int32, (n_head, 2 * w), 0)) & (lane2 < half)).astype(jnp.bfloat16)
    exp_mask2_f = exp_mask2.astype(jnp.float32)

    def nblocks_of(b):
        return pl.cdiv(pos_ref[b] + k, block)

    def get_dma(slot, b, i):
        return pltpu.make_async_copy(
            kv_hbm.at[b, pl.ds(i * block, block), :], kvbuf.at[slot],
            sem.at[slot])

    def get_sc_dma(slot, b, i):
        return pltpu.make_async_copy(
            sc_hbm.at[b, pl.ds(i * block, block), :], scbuf.at[slot],
            scsem.at[slot])

    get_dma(0, 0, 0).start()
    get_sc_dma(0, 0, 0).start()

    def body_b(b, slot0):
        pos = pos_ref[b]
        nb = nblocks_of(b)

        def sel_q(ref3d):
            sel = jax.lax.broadcasted_iota(jnp.int32, (batch, k, w), 0) == b
            return jnp.sum(jnp.where(sel, ref3d[:].astype(jnp.float32), 0.0),
                           axis=0)  # (K, w)

        qe_b = sel_q(qe_ref)
        qo_b = sel_q(qo_ref)

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

            k_lo, k_hi = unpack_nibbles(kvbuf[slot][:, :w], jnp.bfloat16)
            ks = scbuf[slot][:, :n_head]
            vs = scbuf[slot][:, n_head: 2 * n_head]
            rows = i * block + jax.lax.broadcasted_iota(
                jnp.int32, (block, n_head), 0)
            if has_bias:
                bias_blk = bias_ref[:, pl.ds(i * block, block)]
                bsel = jax.lax.broadcasted_iota(
                    jnp.int32, (batch, block), 0) == b
                brow = jnp.sum(jnp.where(bsel, bias_blk, 0.0), axis=0)

            ss = []
            for j in range(k):
                def jrow(qkw):
                    return jnp.sum(jnp.where(
                        jax.lax.broadcasted_iota(
                            jnp.int32, (k, w), 0) == j, qkw, 0.0), axis=0)
                qe_bd = jnp.where(head_mask, jrow(qe_b)[:, None], 0.0).astype(
                    jnp.bfloat16)
                qo_bd = jnp.where(head_mask, jrow(qo_b)[:, None], 0.0).astype(
                    jnp.bfloat16)
                sj = (jnp.dot(k_lo, qe_bd, preferred_element_type=jnp.float32)
                      + jnp.dot(k_hi, qo_bd,
                                preferred_element_type=jnp.float32))
                sj = sj * ks * scale
                sj = jnp.where(rows <= pos + j, sj, -jnp.inf)
                if has_bias:
                    # diagonal exception: a query's own column ignores the
                    # prefix bias
                    sj_b = sj + brow.reshape(block, 1)
                    sj = jnp.where(rows == pos + j, sj, sj_b)
                ss.append(sj)
            s = jnp.stack(ss, axis=0)  # (K, block, H)

            m_blk = jnp.max(s, axis=1)
            m_new = jnp.maximum(m, m_blk)
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new[:, None, :])
            l_new = l * alpha + jnp.sum(p, axis=1)

            v_lo, v_hi = unpack_nibbles(kvbuf[slot][:, w: 2 * w], jnp.float32)
            terms = []
            for j in range(k):
                pj = jnp.sum(jnp.where(
                    jax.lax.broadcasted_iota(
                        jnp.int32, (k, block, n_head), 0) == j, p, 0.0),
                    axis=0)  # (block, H)
                p2_e = jnp.dot((pj * vs).astype(jnp.bfloat16), exp_mask,
                               preferred_element_type=jnp.float32)
                t_even = jnp.sum(p2_e * v_lo, axis=0)  # (w,)
                t_odd = jnp.sum(p2_e * v_hi, axis=0)
                terms.append(jnp.concatenate([t_even, t_odd]))
            term = jnp.stack(terms, axis=0)  # (K, 2w)
            alpha_e = jnp.dot(alpha.astype(jnp.bfloat16), exp_mask2,
                              preferred_element_type=jnp.float32)  # (K, 2w)
            return m_new, l_new, acc * alpha_e + term, nxt

        m0 = jnp.full((k, n_head), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((k, n_head), jnp.float32)
        acc0 = jnp.zeros((k, 2 * w), jnp.float32)
        m, l, acc, slot_end = jax.lax.fori_loop(
            0, nb, body_blk, (m0, l0, acc0, slot0))
        l_e = jnp.dot(l, exp_mask2_f, preferred_element_type=jnp.float32)
        val = (acc / jnp.maximum(l_e, 1e-30)).astype(o_ref.dtype)  # (K, 2w)
        sel = jax.lax.broadcasted_iota(jnp.int32, (batch, k, 2 * w), 0) == b
        o_ref[:] = jnp.where(sel, val[None], o_ref[:])
        return slot_end

    jax.lax.fori_loop(0, batch, body_b, jnp.asarray(0, jnp.int32))


@functools.partial(jax.jit, static_argnames=("n_head", "head_dim", "block",
                                              "interpret", "split"))
def flash_chunk_attention_q4(q, kv_cache, kv_scale, pos, col_bias=None, *,
                             n_head, head_dim, block=DEFAULT_BLOCK,
                             interpret=False, split=False):
    """Int4-cache chunk variant. q (B, K, H*D); kv_cache (B, S, 2*W) int4
    carriers (quantize_kv_rows_4, chunk rows pre-appended); kv_scale
    (B, S, >=2H) f32 [ks|vs]. split selects the split-rope pair layout.
    Returns (B, K, H*D)."""
    b, kq, hd = q.shape
    d = head_dim
    w2 = kv_cache.shape[-1]
    w = w2 // 2
    half = n_head * (d // 2)
    if kv_scale.shape[-1] % 128 != 0:
        pad = 128 - kv_scale.shape[-1] % 128
        kv_scale = jnp.pad(kv_scale, ((0, 0), (0, 0), (0, pad)))
    s_pad = kv_scale.shape[-1]
    has_bias = col_bias is not None
    if col_bias is None:
        col_bias = jnp.zeros((b, 8), jnp.float32)

    qhd = q.reshape(b, kq, n_head, d)
    if split:
        qe = qhd[..., : d // 2].reshape(b, kq, half)
        qo = qhd[..., d // 2:].reshape(b, kq, half)
    else:
        qe = qhd[..., 0::2].reshape(b, kq, half)
        qo = qhd[..., 1::2].reshape(b, kq, half)
    if w > half:
        qe = jnp.pad(qe, ((0, 0), (0, 0), (0, w - half)))
        qo = jnp.pad(qo, ((0, 0), (0, 0), (0, w - half)))

    kernel = functools.partial(
        _kernel_chunk_q4, n_head=n_head, half_d=d // 2, w=w, block=block,
        batch=b, k=kq, has_bias=has_bias, s_pad=s_pad)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, block, 2 * w), jnp.int8),
                pltpu.VMEM((2, block, s_pad), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, kq, 2 * w), q.dtype),
        interpret=interpret,
    )(jnp.broadcast_to(pos.astype(jnp.int32).reshape(-1), (b,)),
      qe.astype(jnp.bfloat16), qo.astype(jnp.bfloat16), kv_cache, kv_scale,
      col_bias.astype(jnp.float32))

    # reassemble halves -> (B, K, H*D)
    even = out[..., :w][..., :half].reshape(b, kq, n_head, d // 2)
    odd = out[..., w: 2 * w][..., :half].reshape(b, kq, n_head, d // 2)
    if split:
        return jnp.concatenate([even, odd], axis=-1).reshape(b, kq, hd)
    return jnp.stack([even, odd], axis=-1).reshape(b, kq, hd)
