"""Blockwise flash attention for TRAINING — forward and backward.

The reference trains through F.scaled_dot_product_attention's flash kernels
(ref autoregressive/models/gpt_t2i.py:282-286); the einsum path in
models/gpt.py materializes the full (B, H, T, S) fp32 score tensor, which at
the t2i flagship (T=1144, H=20) costs ~100 MB per layer per sample-batch and
was the direct blocker for GPT-XL 512 single-chip training. This module is
the TPU-native replacement: an online-softmax blockwise attention
(FlashAttention-2 schedule) written as lax.scan/fori_loop over MXU-tiled
einsums with a hand-written custom VJP, so neither the forward nor the
backward ever materializes a (T, S) tensor. Peak attention memory is
O(T * block) per layer instead of O(T^2).

Mask semantics match the ControlAR training mask exactly
(train/control_step.py:build_t2i_attn_mask, ref t2i_control.py:134-139):

    visible(b, qa, s) = (s <= qa) and (key_valid[b, s] or s == qa)

i.e. causal, with per-key column gating (left-padded caption rows) and the
diagonal exception that keeps fully-padded prefix queries finite. Plain
causal attention is key_valid=None.

Precision mirrors the einsum path: scores and the softmax statistics in
fp32, the two block matmuls run in the input dtype (bf16 under training
autocast) with fp32 accumulation on the MXU. Masking uses a large finite
negative (-1e30) instead of -inf so empty blocks stay NaN-free; their junk
contributions are annihilated by the online-softmax rescale as soon as a
visible key appears (the diagonal guarantees one for every real query).

Pure JAX by design: the same code runs on CPU (tests) and TPU, autodiff
composes with jax.checkpoint in the layer scan, and GSPMD partitions the
batch/head axes without custom sharding rules — the blocked einsums are
plain dot_generals.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_NEG = -1e30  # finite mask value: exp() underflows to exactly 0.0 in fp32

DEFAULT_Q_BLOCK = 256
DEFAULT_K_BLOCK = 512


def _round_up(n: int, k: int) -> int:
    return (n + k - 1) // k * k


def _block_bias(qa: jnp.ndarray, sa: jnp.ndarray, bias_k: jnp.ndarray) -> jnp.ndarray:
    """(B,1,qb,kb) additive fp32 bias for one (q-block, k-block) tile.

    qa (qb,) / sa (kb,) absolute positions; bias_k (B, kb) per-key column
    bias (0 valid / -1e30 masked)."""
    causal = qa[:, None] >= sa[None, :]                       # (qb, kb)
    diag = qa[:, None] == sa[None, :]
    tile = jnp.where(diag, 0.0, bias_k[:, None, :])           # (B, qb, kb)
    tile = jnp.where(causal[None], tile, _NEG)
    return tile[:, None]                                      # (B, 1, qb, kb)


def _fwd_core(q, k, v, kbias, q_offset: int, qb: int, kb: int):
    """q (B,T,H,D), k/v (B,S,H,D), kbias (B,S) fp32. T % qb == 0, S % kb == 0.
    Returns out (B,T,H,D) in q.dtype and lse (B,H,T) fp32."""
    b, t, h, d = q.shape
    s_len = k.shape[1]
    nq, nk = t // qb, s_len // kb
    scale = 1.0 / np.sqrt(d)
    cdt = q.dtype

    def q_step(_, i):
        qi = jax.lax.dynamic_slice(q, (0, i * qb, 0, 0), (b, qb, h, d))
        qa = q_offset + i * qb + jnp.arange(qb)

        def k_step(j, carry):
            m, l, acc = carry
            kj = jax.lax.dynamic_slice(k, (0, j * kb, 0, 0), (b, kb, h, d))
            vj = jax.lax.dynamic_slice(v, (0, j * kb, 0, 0), (b, kb, h, d))
            bj = jax.lax.dynamic_slice(kbias, (0, j * kb), (b, kb))
            sa = j * kb + jnp.arange(kb)
            s = jnp.einsum("bqhd,bkhd->bhqk", qi, kj,
                           preferred_element_type=jnp.float32) * scale
            s = s + _block_bias(qa, sa, bj)
            m_blk = jnp.max(s, axis=-1)
            m_new = jnp.maximum(m, m_blk)
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new[..., None])
            l_new = l * alpha + jnp.sum(p, axis=-1)
            pv = jnp.einsum("bhqk,bkhd->bhqd", p.astype(cdt), vj,
                            preferred_element_type=jnp.float32)
            return m_new, l_new, acc * alpha[..., None] + pv

        # causal upper bound: the last query of this block sits at absolute
        # position q_offset + (i+1)*qb - 1; only k-blocks starting at or
        # before it can be visible.
        hi = jnp.minimum((q_offset + (i + 1) * qb + kb - 1) // kb, nk)
        m0 = jnp.full((b, h, qb), _NEG, jnp.float32)
        l0 = jnp.zeros((b, h, qb), jnp.float32)
        a0 = jnp.zeros((b, h, qb, d), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, hi, k_step, (m0, l0, a0))
        out_i = (acc / l[..., None]).astype(cdt)              # (B,H,qb,D)
        lse_i = m + jnp.log(l)                                # (B,H,qb)
        return None, (out_i, lse_i)

    _, (out_blocks, lse_blocks) = jax.lax.scan(q_step, None, jnp.arange(nq))
    out = out_blocks.transpose(1, 0, 3, 2, 4).reshape(b, t, h, d)
    lse = lse_blocks.transpose(1, 2, 0, 3).reshape(b, h, t)
    return out, lse


def _bwd_core(q, k, v, kbias, out, lse, dout, q_offset: int, qb: int, kb: int):
    b, t, h, d = q.shape
    s_len = k.shape[1]
    nq, nk = t // qb, s_len // kb
    scale = 1.0 / np.sqrt(d)
    cdt = q.dtype

    # Delta_i = rowsum(dO * O) per query (FlashAttention-2 eq. 4)
    delta = jnp.sum(dout.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1).transpose(0, 2, 1)               # (B,H,T)
    dout_c = dout.astype(cdt)

    def tile(i, j):
        """Recompute p and ds for tile (i, j). Returns qi, kj, vj, p, ds."""
        qi = jax.lax.dynamic_slice(q, (0, i * qb, 0, 0), (b, qb, h, d))
        kj = jax.lax.dynamic_slice(k, (0, j * kb, 0, 0), (b, kb, h, d))
        vj = jax.lax.dynamic_slice(v, (0, j * kb, 0, 0), (b, kb, h, d))
        bj = jax.lax.dynamic_slice(kbias, (0, j * kb), (b, kb))
        doi = jax.lax.dynamic_slice(dout_c, (0, i * qb, 0, 0), (b, qb, h, d))
        lse_i = jax.lax.dynamic_slice(lse, (0, 0, i * qb), (b, h, qb))
        del_i = jax.lax.dynamic_slice(delta, (0, 0, i * qb), (b, h, qb))
        qa = q_offset + i * qb + jnp.arange(qb)
        sa = j * kb + jnp.arange(kb)
        s = jnp.einsum("bqhd,bkhd->bhqk", qi, kj,
                       preferred_element_type=jnp.float32) * scale
        s = s + _block_bias(qa, sa, bj)
        p = jnp.exp(s - lse_i[..., None])                     # (B,H,qb,kb)
        dp = jnp.einsum("bqhd,bkhd->bhqk", doi, vj,
                        preferred_element_type=jnp.float32)
        ds = p * (dp - del_i[..., None]) * scale
        return qi, kj, vj, doi, p, ds

    # --- dq: stream over k for each q block -------------------------------
    def dq_step(_, i):
        def k_step(j, dq_i):
            _, kj, _, _, _, ds = tile(i, j)
            return dq_i + jnp.einsum("bhqk,bkhd->bqhd", ds.astype(cdt), kj,
                                     preferred_element_type=jnp.float32)
        hi = jnp.minimum((q_offset + (i + 1) * qb + kb - 1) // kb, nk)
        dq_i = jax.lax.fori_loop(
            0, hi, k_step, jnp.zeros((b, qb, h, d), jnp.float32))
        return None, dq_i

    _, dq_blocks = jax.lax.scan(dq_step, None, jnp.arange(nq))
    dq = dq_blocks.transpose(1, 0, 2, 3, 4).reshape(b, t, h, d)

    # --- dk/dv: stream over q for each k block ----------------------------
    def dkv_step(_, j):
        def q_step(i, carry):
            dk_j, dv_j = carry
            qi, _, _, doi, p, ds = tile(i, j)
            dv_j = dv_j + jnp.einsum("bhqk,bqhd->bkhd", p.astype(cdt), doi,
                                     preferred_element_type=jnp.float32)
            dk_j = dk_j + jnp.einsum("bhqk,bqhd->bkhd", ds.astype(cdt), qi,
                                     preferred_element_type=jnp.float32)
            return dk_j, dv_j
        # causal lower bound: first q block whose last query reaches this
        # k block's first key.
        lo = jnp.maximum((j * kb - q_offset) // qb, 0)
        z = jnp.zeros((b, kb, h, d), jnp.float32)
        dk_j, dv_j = jax.lax.fori_loop(lo, nq, q_step, (z, z))
        return None, (dk_j, dv_j)

    _, (dk_blocks, dv_blocks) = jax.lax.scan(dkv_step, None, jnp.arange(nk))
    dk = dk_blocks.transpose(1, 0, 2, 3, 4).reshape(b, s_len, h, d)
    dv = dv_blocks.transpose(1, 0, 2, 3, 4).reshape(b, s_len, h, d)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            jnp.zeros_like(kbias))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash(q, k, v, kbias, q_offset, qb, kb):
    out, _ = _fwd_core(q, k, v, kbias, q_offset, qb, kb)
    return out


def _flash_fwd(q, k, v, kbias, q_offset, qb, kb):
    out, lse = _fwd_core(q, k, v, kbias, q_offset, qb, kb)
    # named so remat policy "attn" (save_only_these_names("attn_res"))
    # keeps these residuals under the XLA backend too — the backward then
    # never re-runs the attention forward (mirrors flash_train_pallas.py)
    from jax.ad_checkpoint import checkpoint_name

    out = checkpoint_name(out, "attn_res")
    lse = checkpoint_name(lse, "attn_res")
    return out, (q, k, v, kbias, out, lse)


def _flash_bwd(q_offset, qb, kb, res, dout):
    q, k, v, kbias, out, lse = res
    return _bwd_core(q, k, v, kbias, out, lse, dout, q_offset, qb, kb)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention_train(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_valid: Optional[jnp.ndarray] = None,
    *,
    q_offset: int = 0,
    q_block: int = DEFAULT_Q_BLOCK,
    k_block: int = DEFAULT_K_BLOCK,
) -> jnp.ndarray:
    """Blockwise causal attention, differentiable, O(T * block) memory.

    q: (B, T, H, D); k, v: (B, S, H, D) (same head count — repeat GQA heads
    before the call); key_valid: optional (B, S) bool column mask. Query t
    has absolute position q_offset + t and attends key s iff
    s <= pos and (key_valid[b, s] or s == pos). Returns (B, T, H, D).
    """
    b, t, h, d = q.shape
    s_len = k.shape[1]
    qb = min(q_block, _round_up(t, 8))
    kb = min(k_block, _round_up(s_len, 8))
    t_pad = _round_up(t, qb)
    s_pad = _round_up(s_len, kb)

    kbias = jnp.zeros((b, s_len), jnp.float32) if key_valid is None else \
        jnp.where(key_valid, 0.0, _NEG).astype(jnp.float32)
    if s_pad != s_len:
        pad = s_pad - s_len
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        kbias = jnp.pad(kbias, ((0, 0), (0, pad)), constant_values=_NEG)
    if t_pad != t:
        q = jnp.pad(q, ((0, 0), (0, t_pad - t), (0, 0), (0, 0)))

    out = _flash(q, k, v, kbias, q_offset, qb, kb)
    return out[:, :t] if t_pad != t else out
