"""Tuning harness for the q4 flash-decode kernel at GPT-3B shapes.

Measures serial per-call time (scan with a data dependency between calls)
for the library kernel at several block sizes plus modified variants.
Run phases in separate processes (tunnel memory): --variant v0|v0b512|...
"""
import argparse
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, D = 32, 100
B, S = 16, 768
POS = 719
N_ITERS = 50
ABLATE_UNPACK = False
ABLATE_KDOT = False    # single k dot instead of two
ABLATE_PMULT = False   # term without the p2 elementwise product
ABLATE_SOFTMAX = False # skip the online-softmax rescale chain


def bench(call, q0):
    def make(n):
        @jax.jit
        def loop(q):
            def body(q, _):
                out = call(q)
                return (q + 1e-6 * out.astype(q.dtype)).astype(q.dtype), ()
            q, _ = jax.lax.scan(body, q, None, length=n)
            return q.sum()
        return loop

    def run(loop):
        jax.device_get(loop(q0))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.device_get(loop(q0))
            best = min(best, time.perf_counter() - t0)
        return best

    # slope timing cancels the ~26 ms tunnel round-trip overhead
    t_small, t_big = run(make(50)), run(make(450))
    return (t_big - t_small) / 400


# --- v2: bf16 v-path elementwise + MXU ones-reduction for the term -------

def _kernel_q4v2(pos_ref, qe_ref, qo_ref, kv_hbm, sc_hbm, o_ref,
                 kvbuf, scbuf, sem, scsem,
                 *, n_head: int, half_d: int, w: int, block: int, batch: int,
                 s_pad: int):
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
    ones_row = jnp.ones((1, block), jnp.bfloat16)

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

            if ABLATE_UNPACK:
                k_lo = kvbuf[slot][:, :w].astype(jnp.bfloat16)
                k_hi = k_lo
            else:
                k_lo, k_hi = _unpack_i8(kvbuf[slot][:, :w])
            ks = scbuf[slot][:, :n_head]
            vs = scbuf[slot][:, n_head: 2 * n_head]
            if ABLATE_KDOT:
                s = jnp.dot(k_lo, qe_bd, preferred_element_type=jnp.float32)
            else:
                s = (jnp.dot(k_lo, qe_bd, preferred_element_type=jnp.float32)
                     + jnp.dot(k_hi, qo_bd, preferred_element_type=jnp.float32))
            s = s * ks * scale
            rows = i * block + jax.lax.broadcasted_iota(
                jnp.int32, (block, n_head), 0)
            if ABLATE_SOFTMAX:
                m_new, alpha = m, jnp.ones_like(m)
                p = s
                l_new = l
            else:
                s = jnp.where(rows <= pos, s, -jnp.inf)
                m_blk = jnp.max(s, axis=0, keepdims=True)
                m_new = jnp.maximum(m, m_blk)
                alpha = jnp.exp(m - m_new)
                p = jnp.exp(s - m_new)
                l_new = l * alpha + jnp.sum(p, axis=0, keepdims=True)
            p2_e = jnp.dot((p * vs).astype(jnp.bfloat16), exp_mask,
                           preferred_element_type=jnp.float32)  # (block, w)
            p2_bf = p2_e.astype(jnp.bfloat16)
            if ABLATE_UNPACK:
                v_lo = kvbuf[slot][:, w: 2 * w].astype(jnp.bfloat16)
                v_hi = v_lo
            else:
                v_lo, v_hi = _unpack_i8(kvbuf[slot][:, w: 2 * w])
            # MXU ones-reduction instead of VPU sum(axis=0)
            if ABLATE_PMULT:
                t_even = jnp.dot(ones_row, v_lo,
                                 preferred_element_type=jnp.float32)
                t_odd = jnp.dot(ones_row, v_hi,
                                preferred_element_type=jnp.float32)
            else:
                t_even = jnp.dot(ones_row, p2_bf * v_lo,
                                 preferred_element_type=jnp.float32)
                t_odd = jnp.dot(ones_row, p2_bf * v_hi,
                                preferred_element_type=jnp.float32)
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


# --- v5: v2 with int8-native nibble unpack (no int32 widening) ------------
# The v2/v0 unpack widens each carrier byte to int32 before shifting (4x
# the VPU lanes per value). int8 shifts wrap (sign-preserving for the low
# nibble after <<4 >>4) and int8->bf16 converts directly.
V5_INT8_UNPACK = True


def _unpack_i8(c8):
    if V5_INT8_UNPACK:
        c = c8.astype(jnp.int16)
        lo = ((c << 12) >> 12).astype(jnp.bfloat16)
        hi = (c >> 4).astype(jnp.bfloat16)
    else:
        c = c8.astype(jnp.int32)
        lo = ((c << 28) >> 28).astype(jnp.bfloat16)
        hi = (c >> 4).astype(jnp.bfloat16)
    return lo, hi


# --- v4: v2's k-path, transposed P^T V v-path only (no scratch) -----------

def _kernel_q4v4(pos_ref, qe_ref, qo_ref, kv_hbm, sc_hbm, o_ref,
                 kvbuf, scbuf, sem, scsem,
                 *, n_head: int, half_d: int, w: int, block: int, batch: int,
                 s_pad: int):
    half = n_head * half_d
    scale = 1.0 / np.sqrt(2 * half_d)

    lane = jax.lax.broadcasted_iota(jnp.int32, (w, n_head), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (w, n_head), 1)
    head_mask = (lane // half_d == col) & (lane < half)
    elane_w = jax.lax.broadcasted_iota(jnp.int32, (n_head, w), 1)
    erow_w = jax.lax.broadcasted_iota(jnp.int32, (n_head, w), 0)
    exp_mask_f = ((elane_w // half_d == erow_w) & (elane_w < half)).astype(
        jnp.float32)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (n_head, 2 * w), 1) % w
    exp_mask2 = ((lane2 // half_d == jax.lax.broadcasted_iota(
        jnp.int32, (n_head, 2 * w), 0)) & (lane2 < half)).astype(jnp.bfloat16)
    exp_mask2_f = exp_mask2.astype(jnp.float32)

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
        nb = pl.cdiv(pos + 1, block)

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

            kc = kvbuf[slot][:, :w].astype(jnp.int32)
            k_lo = ((kc << 28) >> 28).astype(jnp.bfloat16)
            k_hi = (kc >> 4).astype(jnp.bfloat16)
            ks = scbuf[slot][:, :n_head]
            vs = scbuf[slot][:, n_head: 2 * n_head]
            s = (jnp.dot(k_lo, qe_bd, preferred_element_type=jnp.float32)
                 + jnp.dot(k_hi, qo_bd, preferred_element_type=jnp.float32))
            s = s * ks * scale
            rows = i * block + jax.lax.broadcasted_iota(
                jnp.int32, (block, n_head), 0)
            s = jnp.where(rows <= pos, s, -jnp.inf)
            m_blk = jnp.max(s, axis=0, keepdims=True)
            m_new = jnp.maximum(m, m_blk)
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l_new = l * alpha + jnp.sum(p, axis=0, keepdims=True)
            # transposed v-path: fold v-scale into p (small), one MXU dot
            # per nibble plane, then a (nh, w)-sized masked reduce - no
            # (block, w) elementwise products
            p_v = (p * vs).astype(jnp.bfloat16).T  # (nh, block)
            vc = kvbuf[slot][:, w: 2 * w].astype(jnp.int32)
            v_lo = ((vc << 28) >> 28).astype(jnp.bfloat16)
            v_hi = (vc >> 4).astype(jnp.bfloat16)
            pv_lo = jnp.dot(p_v, v_lo,
                            preferred_element_type=jnp.float32)  # (nh, w)
            pv_hi = jnp.dot(p_v, v_hi,
                            preferred_element_type=jnp.float32)
            t_even = jnp.sum(pv_lo * exp_mask_f, axis=0, keepdims=True)
            t_odd = jnp.sum(pv_hi * exp_mask_f, axis=0, keepdims=True)
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


@functools.partial(jax.jit, static_argnames=("n_head", "head_dim", "block"))
def flash_q4_v4(q, kv_cache, kv_scale, pos, *, n_head, head_dim, block=256):
    b, s, w2 = kv_cache.shape
    w = w2 // 2
    d = head_dim
    half = n_head * (d // 2)
    hd = n_head * d
    s_pad = kv_scale.shape[-1]

    qhd = q.reshape(b, n_head, d)
    qe = qhd[..., 0::2].reshape(b, half)
    qo = qhd[..., 1::2].reshape(b, half)
    if w > half:
        qe = jnp.pad(qe, ((0, 0), (0, w - half)))
        qo = jnp.pad(qo, ((0, 0), (0, w - half)))

    kernel = functools.partial(
        _kernel_q4v4, n_head=n_head, half_d=d // 2, w=w, block=block, batch=b,
        s_pad=s_pad)
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
    )(
        jnp.broadcast_to(pos.astype(jnp.int32).reshape(-1), (b,)),
        qe.astype(jnp.bfloat16),
        qo.astype(jnp.bfloat16),
        kv_cache,
        kv_scale,
    )
    o_even = out[:, :w][:, :half].reshape(b, n_head, d // 2)
    o_odd = out[:, w:][:, :half].reshape(b, n_head, d // 2)
    return jnp.stack([o_even, o_odd], axis=-1).reshape(b, hd)


# --- v3: merged [lo|hi] single k-dot + transposed P^T V v-path ------------
#
# Ablations (full cache pos=719, B=16, block 256): DMA floor 69.5us/call
# (0.637 TB/s - perfect), but compute adds ~74us on top (k-dots 34, v-path
# elementwise 37, softmax 12). v3 cuts compute: unpack writes [lo|hi] into
# one (block, 2w) scratch so the two half-K dots become ONE K=2w dot, and
# the v accumulation becomes p^T @ [v_lo|v_hi] (MXU, M=nh) + a masked
# (nh, 2w) reduce - 16x fewer VPU elements than the (block, w) products.

def _kernel_q4v3(pos_ref, qc_ref, kv_hbm, sc_hbm, o_ref,
                 kvbuf, scbuf, kcat, sem, scsem,
                 *, n_head: int, half_d: int, w: int, block: int, batch: int,
                 s_pad: int):
    half = n_head * half_d
    scale = 1.0 / np.sqrt(2 * half_d)

    # (2w, nh) head-pattern mask for building per-b q columns
    lane2w = jax.lax.broadcasted_iota(jnp.int32, (2 * w, n_head), 0) % w
    col2w = jax.lax.broadcasted_iota(jnp.int32, (2 * w, n_head), 1)
    qmask = (lane2w // half_d == col2w) & (lane2w < half)
    # (nh, 2w) head-pattern masks for the PV diagonal-block extraction
    elane = jax.lax.broadcasted_iota(jnp.int32, (n_head, 2 * w), 1) % w
    erow = jax.lax.broadcasted_iota(jnp.int32, (n_head, 2 * w), 0)
    exp_mask2 = ((elane // half_d == erow) & (elane < half)).astype(
        jnp.bfloat16)
    exp_mask2_f = exp_mask2.astype(jnp.float32)

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
        nb = pl.cdiv(pos + 1, block)

        def sel_row(ref2d):
            sel = jax.lax.broadcasted_iota(jnp.int32, ref2d.shape, 0) == b
            return jnp.sum(jnp.where(sel, ref2d[:].astype(jnp.float32), 0.0),
                           axis=0)

        qb = sel_row(qc_ref)  # (2w,) f32: [qe | qo]
        qcat_bd = jnp.where(qmask, qb[:, None], 0.0).astype(jnp.bfloat16)

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

            kc = kvbuf[slot][:, :w].astype(jnp.int32)
            kcat[:, :w] = ((kc << 28) >> 28).astype(jnp.bfloat16)
            kcat[:, w:] = (kc >> 4).astype(jnp.bfloat16)
            s = jnp.dot(kcat[:], qcat_bd,
                        preferred_element_type=jnp.float32)  # (block, nh)
            ks = scbuf[slot][:, :n_head]
            vs = scbuf[slot][:, n_head: 2 * n_head]
            s = s * ks * scale
            rows = i * block + jax.lax.broadcasted_iota(
                jnp.int32, (block, n_head), 0)
            s = jnp.where(rows <= pos, s, -jnp.inf)
            m_blk = jnp.max(s, axis=0, keepdims=True)
            m_new = jnp.maximum(m, m_blk)
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l_new = l * alpha + jnp.sum(p, axis=0, keepdims=True)
            # v-path: fold the per-(row, head) v-scale into p, transpose to
            # (nh, block), then one MXU dot against [v_lo | v_hi]
            p_v = (p * vs).astype(jnp.bfloat16)
            vc = kvbuf[slot][:, w: 2 * w].astype(jnp.int32)
            kcat[:, :w] = ((vc << 28) >> 28).astype(jnp.bfloat16)
            kcat[:, w:] = (vc >> 4).astype(jnp.bfloat16)
            pv = jnp.dot(p_v.T, kcat[:],
                         preferred_element_type=jnp.float32)  # (nh, 2w)
            term = jnp.sum(pv * exp_mask2_f, axis=0, keepdims=True)  # (1,2w)
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


@functools.partial(jax.jit, static_argnames=("n_head", "head_dim", "block"))
def flash_q4_v3(q, kv_cache, kv_scale, pos, *, n_head, head_dim, block=256):
    b, s, w2 = kv_cache.shape
    w = w2 // 2
    d = head_dim
    half = n_head * (d // 2)
    hd = n_head * d
    s_pad = kv_scale.shape[-1]

    qhd = q.reshape(b, n_head, d)
    qe = qhd[..., 0::2].reshape(b, half)
    qo = qhd[..., 1::2].reshape(b, half)
    if w > half:
        qe = jnp.pad(qe, ((0, 0), (0, w - half)))
        qo = jnp.pad(qo, ((0, 0), (0, w - half)))
    qc = jnp.concatenate([qe, qo], axis=1)  # (b, 2w)

    kernel = functools.partial(
        _kernel_q4v3, n_head=n_head, half_d=d // 2, w=w, block=block, batch=b,
        s_pad=s_pad)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, block, 2 * w), jnp.int8),
                pltpu.VMEM((2, block, s_pad), jnp.float32),
                pltpu.VMEM((block, 2 * w), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, 2 * w), q.dtype),
    )(
        jnp.broadcast_to(pos.astype(jnp.int32).reshape(-1), (b,)),
        qc.astype(jnp.bfloat16),
        kv_cache,
        kv_scale,
    )
    o_even = out[:, :w][:, :half].reshape(b, n_head, d // 2)
    o_odd = out[:, w:][:, :half].reshape(b, n_head, d // 2)
    return jnp.stack([o_even, o_odd], axis=-1).reshape(b, hd)


@functools.partial(jax.jit, static_argnames=("n_head", "head_dim", "block"))
def flash_q4_v2(q, kv_cache, kv_scale, pos, *, n_head, head_dim, block=256):
    b, s, w2 = kv_cache.shape
    w = w2 // 2
    d = head_dim
    half = n_head * (d // 2)
    hd = n_head * d
    s_pad = kv_scale.shape[-1]

    qhd = q.reshape(b, n_head, d)
    qe = qhd[..., 0::2].reshape(b, half)
    qo = qhd[..., 1::2].reshape(b, half)
    if w > half:
        qe = jnp.pad(qe, ((0, 0), (0, w - half)))
        qo = jnp.pad(qo, ((0, 0), (0, w - half)))

    kernel = functools.partial(
        _kernel_q4v2, n_head=n_head, half_d=d // 2, w=w, block=block, batch=b,
        s_pad=s_pad)
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
    )(
        jnp.broadcast_to(pos.astype(jnp.int32).reshape(-1), (b,)),
        qe.astype(jnp.bfloat16),
        qo.astype(jnp.bfloat16),
        kv_cache,
        kv_scale,
    )
    o_even = out[:, :w][:, :half].reshape(b, n_head, d // 2)
    o_odd = out[:, w:][:, :half].reshape(b, n_head, d // 2)
    return jnp.stack([o_even, o_odd], axis=-1).reshape(b, hd)


def main():
    from controlar_tpu.ops.flash_decode2 import flash_decode_attention2_q4
    from controlar_tpu.quant import kv4_row_width

    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="v0")
    ap.add_argument("--trace", action="store_true")
    args = ap.parse_args()

    w = kv4_row_width(H, D)
    rng = jax.random.PRNGKey(0)
    # the kernel DMAs whole blocks: S must be a block multiple
    s_alloc = 1024 if "512" in args.variant else S
    kv = jax.random.randint(rng, (B, s_alloc, 2 * w), -128, 127, jnp.int8)
    sc = jnp.abs(jax.random.normal(rng, (B, s_alloc, 128), jnp.float32)) * 0.01
    q0 = jax.random.normal(rng, (B, H * D), jnp.bfloat16)
    pos = jnp.full((B,), POS, jnp.int32)

    nbytes = B * (POS + 1) * (2 * w + 512)
    variants = {
        "v0": lambda q: flash_decode_attention2_q4(
            q, kv, sc, pos, None, n_head=H, head_dim=D),
        "v0b512": lambda q: flash_decode_attention2_q4(
            q, kv, sc, pos, None, n_head=H, head_dim=D, block=512),
        "v0b128": lambda q: flash_decode_attention2_q4(
            q, kv, sc, pos, None, n_head=H, head_dim=D, block=128),
        "v2": lambda q: flash_q4_v2(
            q, kv, sc, pos, n_head=H, head_dim=D, block=256),
        "v2b512": lambda q: flash_q4_v2(
            q, kv, sc, pos, n_head=H, head_dim=D, block=512),
        "v3": lambda q: flash_q4_v3(
            q, kv, sc, pos, n_head=H, head_dim=D, block=256),
        "v3b512": lambda q: flash_q4_v3(
            q, kv, sc, pos, n_head=H, head_dim=D, block=512),
        "v4": lambda q: flash_q4_v4(
            q, kv, sc, pos, n_head=H, head_dim=D, block=256),
        "v4b512": lambda q: flash_q4_v4(
            q, kv, sc, pos, n_head=H, head_dim=D, block=512),
        "v5": lambda q: flash_q4_v2(
            q, kv, sc, pos, n_head=H, head_dim=D, block=256),
        "v2i32": lambda q: flash_q4_v2(
            q, kv, sc, pos, n_head=H, head_dim=D, block=256),
        "vab": lambda q: flash_q4_v2(
            q, kv, sc, pos, n_head=H, head_dim=D, block=256),
    }
    for flag, names in [
        ("ABLATE_UNPACK", ("vab", "vabK", "vabP", "vabS", "vabALL")),
        ("ABLATE_KDOT", ("vabK", "vabALL")),
        ("ABLATE_PMULT", ("vabP", "vabALL")),
        ("ABLATE_SOFTMAX", ("vabS", "vabALL")),
    ]:
        if args.variant in names:
            globals()[flag] = True
    for nm in ("vabK", "vabP", "vabS", "vabALL"):
        variants[nm] = variants["vab"]
    call = variants[args.variant]
    if args.variant in ("v2i32",) or args.variant.startswith("v2"):
        globals()["V5_INT8_UNPACK"] = False
    if args.variant.startswith(("v2", "v3", "v4", "v5")):
        ref = variants["v0"](q0)
        got = call(q0)
        err = jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)))
        print(f"max |v2 - v0| = {float(err):.5f}")
    t = bench(call, q0)
    print(f"{args.variant}: {t*1e6:.1f} us/call  "
          f"({nbytes/t/1e12:.3f} TB/s effective on read bytes)")

    if args.trace:
        import collections, glob, gzip, json

        @jax.jit
        def loop(q):
            def body(q, _):
                out = call(q)
                return (q + 1e-6 * out.astype(q.dtype)).astype(q.dtype), ()
            q, _ = jax.lax.scan(body, q, None, length=N_ITERS)
            return q.sum()

        jax.device_get(loop(q0))
        with jax.profiler.trace("/tmp/q4trace"):
            jax.device_get(loop(q0))
        paths = glob.glob("/tmp/q4trace/**/*.trace.json.gz", recursive=True)
        with gzip.open(max(paths), "rt") as f:
            tr = json.load(f)
        tot = collections.Counter()
        cnt = collections.Counter()
        for ev in tr.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev and not str(
                    ev.get("name", "")).startswith("$"):
                tot[ev["name"]] += ev["dur"]
                cnt[ev["name"]] += 1
        for nm, d in tot.most_common(12):
            print(f"  {d/N_ITERS:9.1f} us/iter x{cnt[nm]/N_ITERS:6.1f}  {nm[:80]}")


if __name__ == "__main__":
    main()
