"""Flash-decode attention, single-program variant.

Same math as ops/flash_decode.py but grid=() with an internal batch loop:
the grid-(B,) version pays 4 tiny pipelined block copies per batch element
(~70us/call fixed overhead, which dominates bandwidth at decode shapes).
Here q and out move as one (B, HD) copy and only the K/V block DMAs remain,
double-buffered across both blocks and batch elements.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK = 256


def _kernel(pos_ref, q_ref, kv_hbm, bias_ref, o_ref,
            kvbuf, sem,
            *, n_head: int, head_dim: int, block: int, batch: int,
            has_bias: bool):
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
        return pl.cdiv(pos_ref[b] + 1, block)

    def get_dma(slot, b, i):
        return pltpu.make_async_copy(
            kv_hbm.at[b, pl.ds(i * block, block), :], kvbuf.at[slot], sem.at[slot]
        )

    # warm-up: first block of batch element 0
    get_dma(0, 0, 0).start()

    def body_b(b, slot0):
        pos = pos_ref[b]
        nb = nblocks_of(b)
        # dynamic single-row VMEM load is not tileable; select-reduce instead
        qsel = jax.lax.broadcasted_iota(jnp.int32, q_ref.shape, 0) == b
        qf = jnp.sum(
            jnp.where(qsel, q_ref[:].astype(jnp.float32), 0.0), axis=0
        )
        q_bd = jnp.where(head_mask, qf[:, None], 0.0).astype(jnp.bfloat16)

        def body_blk(i, carry):
            m, l, acc, slot = carry
            nxt = (slot + 1) % 2

            # prefetch: next block of this b, or first block of b+1
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
                jnp.int32, (block, n_head), 0
            )
            s = jnp.where(rows <= pos, s, -jnp.inf)
            if has_bias:
                # additive column bias (0 / -1e9), e.g. left-padded t2i
                # caption prefixes (ref generate.py:184-193 emb-mask stamp)
                bias_blk = bias_ref[:, pl.ds(i * block, block)]  # (B, block)
                bsel = jax.lax.broadcasted_iota(
                    jnp.int32, (batch, block), 0
                ) == b
                brow = jnp.sum(jnp.where(bsel, bias_blk, 0.0), axis=0)
                s = s + brow.reshape(block, 1)
            m_blk = jnp.max(s, axis=0, keepdims=True)
            m_new = jnp.maximum(m, m_blk)
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l_new = l * alpha + jnp.sum(p, axis=0, keepdims=True)
            p_e = jnp.dot(p.astype(jnp.bfloat16), exp_mask,
                          preferred_element_type=jnp.float32)
            term = jnp.sum(p_e * vb.astype(jnp.float32), axis=0, keepdims=True)
            alpha_e = jnp.dot(alpha.astype(jnp.bfloat16), exp_mask,
                              preferred_element_type=jnp.float32)
            return m_new, l_new, acc * alpha_e + term, nxt

        m0 = jnp.full((1, n_head), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((1, n_head), jnp.float32)
        acc0 = jnp.zeros((1, hd), jnp.float32)
        m, l, acc, slot_end = jax.lax.fori_loop(
            0, nb, body_blk, (m0, l0, acc0, slot0)
        )
        l_e = jnp.dot(l, exp_mask_f, preferred_element_type=jnp.float32)
        # dynamic single-row VMEM store is not tileable; select-write instead
        val = (acc / l_e).astype(o_ref.dtype)  # (1, hd)
        sel = jax.lax.broadcasted_iota(jnp.int32, o_ref.shape, 0) == b
        o_ref[:] = jnp.where(sel, val, o_ref[:])
        return slot_end

    jax.lax.fori_loop(0, batch, body_b, jnp.asarray(0, jnp.int32))


@functools.partial(jax.jit, static_argnames=("n_head", "block", "interpret"))
def flash_decode_attention2(
    q: jnp.ndarray,        # (B, H*D)
    kv_cache: jnp.ndarray,  # (B, S, 2*H*D) interleaved [k|v] rows; row pos
                            # must already be written
    pos: jnp.ndarray,      # scalar or (B,)
    col_bias: jnp.ndarray | None = None,  # (B, S) f32 additive (0 / -1e9)
    *,
    n_head: int,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
) -> jnp.ndarray:
    b, s, hd2 = kv_cache.shape
    hd = hd2 // 2
    head_dim = hd // n_head
    has_bias = col_bias is not None
    kernel = functools.partial(
        _kernel, n_head=n_head, head_dim=head_dim, block=block, batch=b,
        has_bias=has_bias,
    )
    if not has_bias:
        col_bias = jnp.zeros((b, 8), jnp.float32)  # placeholder operand
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, block, 2 * hd), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hd), q.dtype),
        interpret=interpret,
    )(
        jnp.broadcast_to(pos.astype(jnp.int32).reshape(-1), (b,)),
        q.astype(jnp.bfloat16),
        kv_cache,
        col_bias.astype(jnp.float32),
    )
    return out


# ---------------------------------------------------------------------------
# Int8 KV-cache variant: rows are per-head symmetric int8; a parallel scale
# stream (B, S, 2*H) f32 carries [k_scales | v_scales]. Halves the decode
# engine's dominant HBM read (the KV slab approaches the weight bytes at
# full sequence length for the MHA models); the int8->bf16/f32 converts ride
# the VPU under the (halved) DMA.
# ---------------------------------------------------------------------------

def _kernel_q8(pos_ref, q_ref, kv_hbm, sc_hbm, bias_ref, o_ref,
               kvbuf, scbuf, sem, scsem,
               *, n_head: int, head_dim: int, block: int, batch: int,
               has_bias: bool, s_pad: int):
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
        return pl.cdiv(pos_ref[b] + 1, block)

    def get_dma(slot, b, i):
        return pltpu.make_async_copy(
            kv_hbm.at[b, pl.ds(i * block, block), :], kvbuf.at[slot], sem.at[slot]
        )

    def get_sc_dma(slot, b, i):
        return pltpu.make_async_copy(
            sc_hbm.at[b, pl.ds(i * block, block), :], scbuf.at[slot],
            scsem.at[slot],
        )

    get_dma(0, 0, 0).start()
    get_sc_dma(0, 0, 0).start()

    def body_b(b, slot0):
        pos = pos_ref[b]
        nb = nblocks_of(b)
        qsel = jax.lax.broadcasted_iota(jnp.int32, q_ref.shape, 0) == b
        qf = jnp.sum(
            jnp.where(qsel, q_ref[:].astype(jnp.float32), 0.0), axis=0
        )
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
            ks = scbuf[slot][:, :n_head]                      # (block, H) f32
            vs = scbuf[slot][:, n_head: 2 * n_head]
            s = jnp.dot(kb, q_bd, preferred_element_type=jnp.float32)
            s = s * ks * scale
            rows = i * block + jax.lax.broadcasted_iota(
                jnp.int32, (block, n_head), 0
            )
            s = jnp.where(rows <= pos, s, -jnp.inf)
            if has_bias:
                bias_blk = bias_ref[:, pl.ds(i * block, block)]
                bsel = jax.lax.broadcasted_iota(
                    jnp.int32, (batch, block), 0
                ) == b
                brow = jnp.sum(jnp.where(bsel, bias_blk, 0.0), axis=0)
                s = s + brow.reshape(block, 1)
            m_blk = jnp.max(s, axis=0, keepdims=True)
            m_new = jnp.maximum(m, m_blk)
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l_new = l * alpha + jnp.sum(p, axis=0, keepdims=True)
            # fold the per-row v scale into p BEFORE lane expansion
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
            0, nb, body_blk, (m0, l0, acc0, slot0)
        )
        l_e = jnp.dot(l, exp_mask_f, preferred_element_type=jnp.float32)
        val = (acc / l_e).astype(o_ref.dtype)
        sel = jax.lax.broadcasted_iota(jnp.int32, o_ref.shape, 0) == b
        o_ref[:] = jnp.where(sel, val, o_ref[:])
        return slot_end

    jax.lax.fori_loop(0, batch, body_b, jnp.asarray(0, jnp.int32))


@functools.partial(jax.jit, static_argnames=("n_head", "block", "interpret"))
def flash_decode_attention2_q8(
    q: jnp.ndarray,         # (B, H*D)
    kv_cache: jnp.ndarray,  # (B, S, 2*H*D) int8 interleaved [k|v]
    kv_scale: jnp.ndarray,  # (B, S, >=2*H f32, padded to 128 lanes) [ks|vs]
    pos: jnp.ndarray,
    col_bias: jnp.ndarray | None = None,
    *,
    n_head: int,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
) -> jnp.ndarray:
    b, s, hd2 = kv_cache.shape
    hd = hd2 // 2
    head_dim = hd // n_head
    # scales must occupy a 128-lane multiple for the HBM block DMA; callers
    # (decode.py) pre-pad, direct callers get padded here
    if kv_scale.shape[-1] % 128 != 0:
        pad = 128 - kv_scale.shape[-1] % 128
        kv_scale = jnp.pad(kv_scale, ((0, 0), (0, 0), (0, pad)))
    s_pad = kv_scale.shape[-1]
    assert s_pad >= 2 * n_head, (s_pad, n_head)
    has_bias = col_bias is not None
    kernel = functools.partial(
        _kernel_q8, n_head=n_head, head_dim=head_dim, block=block, batch=b,
        has_bias=has_bias, s_pad=s_pad,
    )
    if not has_bias:
        col_bias = jnp.zeros((b, 8), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, block, 2 * hd), jnp.int8),
            pltpu.VMEM((2, block, s_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hd), q.dtype),
        interpret=interpret,
    )(
        jnp.broadcast_to(pos.astype(jnp.int32).reshape(-1), (b,)),
        q.astype(jnp.bfloat16),
        kv_cache,
        kv_scale,
        col_bias.astype(jnp.float32),
    )
    return out
