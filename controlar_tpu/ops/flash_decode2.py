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

from controlar_tpu.ops.w4_matmul import unpack_nibbles

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


# ---------------------------------------------------------------------------
# Fused append + attention (int8 cache): the decode step's KV row never
# round-trips through separate dynamic_update_slice ops — the kernel scores
# the in-flight row from VMEM and RMW-writes it into the slab in its
# epilogue. Removes 2 DUS dispatches per layer per step (~0.33 ms/step at
# GPT-3B) and the append->attention serialization.
# ---------------------------------------------------------------------------

def _kernel_q8a(pos_ref, q_ref, kvn_ref, sn_ref, kv_hbm, sc_hbm, bias_ref,
                o_ref, kv_out, sc_out, kvbuf, scbuf, sem, scsem, wsem,
                kvwin, swin,
                *, n_head: int, head_dim: int, block: int, batch: int,
                has_bias: bool, s_pad: int):
    hd = n_head * head_dim
    scale = 1.0 / np.sqrt(head_dim)
    KW, SW = 32, 8  # RMW window rows (int8 / f32 tiling)

    row = jax.lax.broadcasted_iota(jnp.int32, (hd, n_head), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (hd, n_head), 1)
    head_mask = (row // head_dim) == col
    erow = jax.lax.broadcasted_iota(jnp.int32, (n_head, hd), 0)
    ecol = jax.lax.broadcasted_iota(jnp.int32, (n_head, hd), 1)
    exp_mask = ((ecol // head_dim) == erow).astype(jnp.bfloat16)
    exp_mask_f = exp_mask.astype(jnp.float32)

    def nblocks_of(b):
        return pl.cdiv(pos_ref[b], block)  # rows [0, pos) from HBM

    def get_dma(slot, b, i):
        return pltpu.make_async_copy(
            kv_hbm.at[b, pl.ds(i * block, block), :], kvbuf.at[slot],
            sem.at[slot])

    def get_sc_dma(slot, b, i):
        return pltpu.make_async_copy(
            sc_hbm.at[b, pl.ds(i * block, block), :], scbuf.at[slot],
            scsem.at[slot])

    # pos >= 1 for every decode call (a prefill precedes decode), so every
    # batch element streams at least one block: simple chained prefetch.
    get_dma(0, 0, 0).start()
    get_sc_dma(0, 0, 0).start()

    def body_b(b, slot0):
        pos = pos_ref[b]
        nb = nblocks_of(b)

        def sel_row(ref2d, dtype=jnp.float32):
            sel = jax.lax.broadcasted_iota(jnp.int32, ref2d.shape, 0) == b
            return jnp.sum(jnp.where(sel, ref2d[:].astype(dtype), 0.0), axis=0)

        qf = sel_row(q_ref)
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
                bias_blk = bias_ref[:, pl.ds(i * block, block)]
                bsel = jax.lax.broadcasted_iota(
                    jnp.int32, (batch, block), 0) == b
                brow = jnp.sum(jnp.where(bsel, bias_blk, 0.0), axis=0)
                s = s + brow.reshape(block, 1)
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

        # ---- in-flight row (position pos): score/value from VMEM, no HBM
        knf = sel_row(kvn_ref)[:hd]           # (hd,) f32 int8 values
        vnf = sel_row(kvn_ref)[hd:]
        snf = sel_row(sn_ref)                 # (s_pad,)
        ks_n = snf[:n_head][None]             # (1, H)
        vs_n = snf[n_head: 2 * n_head][None]
        s_new = jnp.dot((knf * qf)[None].astype(jnp.bfloat16), exp_mask.T,
                        preferred_element_type=jnp.float32)  # (1, H)
        s_new = s_new * ks_n * scale
        m_fin = jnp.maximum(m, s_new)
        alpha = jnp.exp(m - m_fin)
        p_new = jnp.exp(s_new - m_fin)        # (1, H)
        l_fin = l * alpha + p_new
        alpha_e = jnp.dot(alpha.astype(jnp.bfloat16), exp_mask,
                          preferred_element_type=jnp.float32)
        pv_e = jnp.dot((p_new * vs_n).astype(jnp.bfloat16), exp_mask,
                       preferred_element_type=jnp.float32)   # (1, hd)
        acc = acc * alpha_e + pv_e * vnf[None]

        l_e = jnp.dot(l_fin, exp_mask_f, preferred_element_type=jnp.float32)
        val = (acc / l_e).astype(o_ref.dtype)
        sel = jax.lax.broadcasted_iota(jnp.int32, o_ref.shape, 0) == b
        o_ref[:] = jnp.where(sel, val, o_ref[:])

        # ---- epilogue: RMW-append the row at pos into the aliased slabs
        ka = pl.multiple_of((pos // KW) * KW, KW)
        rd = pltpu.make_async_copy(kv_out.at[b, pl.ds(ka, KW), :], kvwin, wsem)
        rd.start()
        rd.wait()
        rsel = jax.lax.broadcasted_iota(
            jnp.int32, (KW, 2 * hd), 0) == (pos - ka)
        kvwin[:] = jnp.where(rsel, sel_row(kvn_ref, jnp.int32
                                           ).astype(jnp.int8), kvwin[:])
        wr = pltpu.make_async_copy(kvwin, kv_out.at[b, pl.ds(ka, KW), :], wsem)
        wr.start()
        wr.wait()

        sa = pl.multiple_of((pos // SW) * SW, SW)
        rd = pltpu.make_async_copy(sc_out.at[b, pl.ds(sa, SW), :], swin, wsem)
        rd.start()
        rd.wait()
        ssel = jax.lax.broadcasted_iota(
            jnp.int32, (SW, s_pad), 0) == (pos - sa)
        swin[:] = jnp.where(ssel, snf, swin[:])
        wr = pltpu.make_async_copy(swin, sc_out.at[b, pl.ds(sa, SW), :], wsem)
        wr.start()
        wr.wait()
        return slot_end

    jax.lax.fori_loop(0, batch, body_b, jnp.asarray(0, jnp.int32))


@functools.partial(jax.jit, static_argnames=("n_head", "block", "interpret"))
def flash_decode_attention2_q8_append(
    q: jnp.ndarray,         # (B, H*D) current query
    new_kv: jnp.ndarray,    # (B, 2*H*D) int8 quantized row for position pos
    new_s: jnp.ndarray,     # (B, >=2H f32, lane-padded) row scales
    kv_cache: jnp.ndarray,  # (B, S, 2*H*D) int8 — rows [0, pos) valid
    kv_scale: jnp.ndarray,  # (B, S, s_pad) f32
    pos: jnp.ndarray,       # scalar or (B,)
    col_bias: jnp.ndarray | None = None,
    *,
    n_head: int,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
):
    """Attention over rows [0, pos] where row pos comes from (new_kv, new_s)
    in VMEM; the row is RMW-written into the (aliased, donated) slabs in the
    kernel epilogue. Requires pos >= 1 (always true in decode: a prefill
    precedes it). col_bias, when given, must be 0 at decode positions
    (prefix-mask biases only — true for all t2i caption masks).

    Returns (out (B, H*D), kv_cache', kv_scale')."""
    b, s, hd2 = kv_cache.shape
    hd = hd2 // 2
    head_dim = hd // n_head
    if kv_scale.shape[-1] % 128 != 0:
        pad = 128 - kv_scale.shape[-1] % 128
        kv_scale = jnp.pad(kv_scale, ((0, 0), (0, 0), (0, pad)))
    s_pad = kv_scale.shape[-1]
    if new_s.shape[-1] != s_pad:
        new_s = jnp.pad(new_s, ((0, 0), (0, s_pad - new_s.shape[-1])))
    has_bias = col_bias is not None
    kernel = functools.partial(
        _kernel_q8a, n_head=n_head, head_dim=head_dim, block=block, batch=b,
        has_bias=has_bias, s_pad=s_pad,
    )
    if not has_bias:
        col_bias = jnp.zeros((b, 8), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # q
            pl.BlockSpec(memory_space=pltpu.VMEM),   # new_kv
            pl.BlockSpec(memory_space=pltpu.VMEM),   # new_s
            pl.BlockSpec(memory_space=pltpu.HBM),    # kv_cache
            pl.BlockSpec(memory_space=pltpu.HBM),    # kv_scale
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bias
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, block, hd2), jnp.int8),
            pltpu.VMEM((2, block, s_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.VMEM((32, hd2), jnp.int8),
            pltpu.VMEM((8, s_pad), jnp.float32),
        ],
    )
    out, kv_new, s_new_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, hd), q.dtype),
            jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype),
            jax.ShapeDtypeStruct(kv_scale.shape, kv_scale.dtype),
        ),
        # operands: pos=0, q=1, new_kv=2, new_s=3, kv=4, scale=5, bias=6
        input_output_aliases={4: 1, 5: 2},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        jnp.broadcast_to(pos.astype(jnp.int32).reshape(-1), (b,)),
        q.astype(jnp.bfloat16),
        new_kv,
        new_s.astype(jnp.float32),
        kv_cache,
        kv_scale,
        col_bias.astype(jnp.float32),
    )
    return out, kv_new, s_new_out


# ---------------------------------------------------------------------------
# Int4 KV-cache variant: rows are nibble-packed per head (2 values/byte,
# quant.quantize_kv_rows_4 layout: [k_carriers | v_carriers], each half
# lane-padded to 128). Unpack (2 shifts + convert) runs per block in VMEM
# under the (halved again) DMA stream. q arrives pre-split into even/odd
# dim halves; the output returns split halves, reassembled by the wrapper.
# ---------------------------------------------------------------------------

def _kernel_q4(pos_ref, qe_ref, qo_ref, kv_hbm, sc_hbm, bias_ref, o_ref,
               kvbuf, scbuf, sem, scsem,
               *, n_head: int, half_d: int, w: int, block: int, batch: int,
               has_bias: bool, s_pad: int):
    half = n_head * half_d
    scale = 1.0 / np.sqrt(2 * half_d)

    lane = jax.lax.broadcasted_iota(jnp.int32, (w, n_head), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (w, n_head), 1)
    head_mask = (lane // half_d == col) & (lane < half)
    elane = jax.lax.broadcasted_iota(jnp.int32, (n_head, w), 1)
    erow = jax.lax.broadcasted_iota(jnp.int32, (n_head, w), 0)
    exp_mask = ((elane // half_d == erow) & (elane < half)).astype(jnp.bfloat16)
    # both output halves share the per-head expansion
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (n_head, 2 * w), 1) % w
    exp_mask2 = ((lane2 // half_d == jax.lax.broadcasted_iota(
        jnp.int32, (n_head, 2 * w), 0)) & (lane2 < half)).astype(jnp.bfloat16)
    exp_mask2_f = exp_mask2.astype(jnp.float32)

    def nblocks_of(b):
        return pl.cdiv(pos_ref[b] + 1, block)

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

        def sel_row(ref2d):
            sel = jax.lax.broadcasted_iota(jnp.int32, ref2d.shape, 0) == b
            return jnp.sum(jnp.where(sel, ref2d[:].astype(jnp.float32), 0.0),
                           axis=0)

        qe_bd = jnp.where(head_mask, sel_row(qe_ref)[:, None], 0.0).astype(
            jnp.bfloat16)
        qo_bd = jnp.where(head_mask, sel_row(qo_ref)[:, None], 0.0).astype(
            jnp.bfloat16)

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
            s = jnp.where(rows <= pos, s, -jnp.inf)
            if has_bias:
                bias_blk = bias_ref[:, pl.ds(i * block, block)]
                bsel = jax.lax.broadcasted_iota(
                    jnp.int32, (batch, block), 0) == b
                brow = jnp.sum(jnp.where(bsel, bias_blk, 0.0), axis=0)
                s = s + brow.reshape(block, 1)
            m_blk = jnp.max(s, axis=0, keepdims=True)
            m_new = jnp.maximum(m, m_blk)
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l_new = l * alpha + jnp.sum(p, axis=0, keepdims=True)
            p2_e = jnp.dot((p * vs).astype(jnp.bfloat16), exp_mask,
                           preferred_element_type=jnp.float32)  # (block, w)
            v_lo, v_hi = unpack_nibbles(kvbuf[slot][:, w: 2 * w],
                                        jnp.float32)
            t_even = jnp.sum(p2_e * v_lo, axis=0, keepdims=True)
            t_odd = jnp.sum(p2_e * v_hi, axis=0, keepdims=True)
            term = jnp.concatenate([t_even, t_odd], axis=1)  # (1, 2w)
            alpha_e = jnp.dot(alpha.astype(jnp.bfloat16), exp_mask2,
                              preferred_element_type=jnp.float32)
            return m_new, l_new, acc * alpha_e + term, nxt

        m0 = jnp.full((1, n_head), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((1, n_head), jnp.float32)
        acc0 = jnp.zeros((1, 2 * w), jnp.float32)
        m, l, acc, slot_end = jax.lax.fori_loop(
            0, nb, body_blk, (m0, l0, acc0, slot0))
        l_e = jnp.dot(l, exp_mask2_f, preferred_element_type=jnp.float32)
        val = (acc / jnp.maximum(l_e, 1e-30)).astype(o_ref.dtype)
        sel = jax.lax.broadcasted_iota(jnp.int32, o_ref.shape, 0) == b
        o_ref[:] = jnp.where(sel, val, o_ref[:])
        return slot_end

    jax.lax.fori_loop(0, batch, body_b, jnp.asarray(0, jnp.int32))


@functools.partial(jax.jit,
                   static_argnames=("n_head", "head_dim", "block", "interpret",
                                    "split"))
def flash_decode_attention2_q4(
    q: jnp.ndarray,         # (B, H*D)
    kv_cache: jnp.ndarray,  # (B, S, 2*W) int4 carriers (quantize_kv_rows_4)
    kv_scale: jnp.ndarray,  # (B, S, >=2H) f32 [ks|vs], lane-padded
    pos: jnp.ndarray,
    col_bias: jnp.ndarray | None = None,
    *,
    n_head: int,
    head_dim: int,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
    split: bool = False,  # q + output in split-rope layout (no interleave)
) -> jnp.ndarray:
    b, s, w2 = kv_cache.shape
    w = w2 // 2
    d = head_dim
    half = n_head * (d // 2)
    hd = n_head * d
    if kv_scale.shape[-1] % 128 != 0:
        pad = 128 - kv_scale.shape[-1] % 128
        kv_scale = jnp.pad(kv_scale, ((0, 0), (0, 0), (0, pad)))
    s_pad = kv_scale.shape[-1]
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
        _kernel_q4, n_head=n_head, half_d=d // 2, w=w, block=block, batch=b,
        has_bias=has_bias, s_pad=s_pad,
    )
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
        out_shape=jax.ShapeDtypeStruct((b, 2 * w), q.dtype),
        interpret=interpret,
    )(
        jnp.broadcast_to(pos.astype(jnp.int32).reshape(-1), (b,)),
        qe.astype(jnp.bfloat16),
        qo.astype(jnp.bfloat16),
        kv_cache,
        kv_scale,
        col_bias.astype(jnp.float32),
    )
    o_even = out[:, :w][:, :half].reshape(b, n_head, d // 2)
    o_odd = out[:, w:][:, :half].reshape(b, n_head, d // 2)
    if split:
        # split layout: halves stay contiguous per head
        return jnp.concatenate([o_even, o_odd], axis=-1).reshape(b, hd)
    # reassemble interleaved dims: halves -> (B, H, D/2, 2) -> (B, hd)
    return jnp.stack([o_even, o_odd], axis=-1).reshape(b, hd)
