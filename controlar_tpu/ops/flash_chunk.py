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
