"""Pallas flash attention for TRAINING — fwd + custom VJP, VMEM-resident tiles.

ops/flash_train.py implements the same FlashAttention-2 schedule at the XLA
level, which still materializes every (B, H, qb, kb) fp32 score tile in HBM
(the XL-512 profile showed those tiles dominating step time). This kernel
keeps score tiles and the running (m, l, acc) statistics in VMEM:

  fwd : grid (B, H, nq) — arrays ride in (B, H, T, D) layout; the full per-(b, h) K/V rows ride one VMEM block
        (S*D*2B each, ~160 KB at the t2i flagship; Pallas fetches them once
        per (b, h) since their block index is constant over the innermost
        q axis), a fori_loop walks causally-visible k blocks with online
        softmax in fp32, emits out (qb, D) + the logsumexp row.
  bwd : two kernels — dq over grid (B, H, nq), and dk/dv over grid
        (B, H, nk) streaming q/dout/lse/delta rows, with
        delta = rowsum(dO * O) precomputed in XLA (cheap elementwise).

Mask semantics: causal + per-key column bias kbias (B, S) in {0, -1e9}
(left-padded caption columns, train/control_step.py t2i_key_valid). Unlike
ops/flash_train.py there is NO diagonal exception — it is loss-invariant: a
fully-padded prefix query's output reaches no kept logit (its key column is
masked at every layer and prefix logits before cls_token_num-1 are sliced
off, models/gpt.py forward_train) and its cotangent is exactly zero, so the
loss and every parameter gradient match the einsum/blockwise paths (pinned
by tests/test_flash_train_pallas.py). Finite -1e9 masking keeps fully-masked
rows NaN-free (uniform junk that the zero cotangent annihilates).

Precision mirrors the XLA path: scores/statistics fp32, block matmuls in
bf16 with fp32 MXU accumulation, dq/dk/dv accumulated fp32.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9

DEFAULT_Q_BLOCK = 512
DEFAULT_K_BLOCK = 512


def _round_up(n: int, k: int) -> int:
    return (n + k - 1) // k * k


# ---------------------------------------------------------------- forward


def _fwd_kernel(q_ref, k_ref, v_ref, kbias_ref, o_ref, lse_ref,
                *, qb: int, kb: int, d: int, nk: int, scale: float):
    i = pl.program_id(2)
    hi = jnp.minimum(((i + 1) * qb + kb - 1) // kb, nk)
    q = q_ref[0, 0]  # (qb, D)
    qa = i * qb + jax.lax.broadcasted_iota(jnp.int32, (qb, kb), 0)

    def body(j, carry):
        m, l, acc = carry
        kt = k_ref[0, 0, pl.ds(j * kb, kb), :]  # (kb, D)
        s = jax.lax.dot_general(
            q, kt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (qb, kb)
        sa = j * kb + jax.lax.broadcasted_iota(jnp.int32, (qb, kb), 1)
        bias = kbias_ref[0, 0, pl.ds(j * kb, kb)]
        s = jnp.where(qa >= sa, s + bias[None, :], _NEG)

        m_blk = jnp.max(s, axis=1)
        m_new = jnp.maximum(m, m_blk)
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[:, None])
        l_new = l * alpha + jnp.sum(p, axis=1)
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v_ref[0, 0, pl.ds(j * kb, kb), :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return m_new, l_new, acc * alpha[:, None] + pv

    m0 = jnp.full((qb,), _NEG, jnp.float32)
    l0 = jnp.zeros((qb,), jnp.float32)
    a0 = jnp.zeros((qb, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, hi, body, (m0, l0, a0))
    o_ref[0, 0] = (acc / l[:, None]).astype(o_ref.dtype)
    lse_ref[0, 0, :, 0] = m + jnp.log(l)


def _fwd(q, k, v, kbias, qb, kb, interpret):
    b, t, h, d = q.shape
    s_len = k.shape[1]
    nq, nk = t // qb, s_len // kb
    scale = 1.0 / np.sqrt(d)
    kernel = functools.partial(_fwd_kernel, qb=qb, kb=kb, d=d, nk=nk,
                               scale=scale)
    out, lse = pl.pallas_call(
        kernel,
        grid=(b, h, nq),
        in_specs=[
            pl.BlockSpec((1, 1, qb, d), lambda b_, h_, i: (b_, h_, i, 0)),
            pl.BlockSpec((1, 1, s_len, d), lambda b_, h_, i: (b_, h_, 0, 0)),
            pl.BlockSpec((1, 1, s_len, d), lambda b_, h_, i: (b_, h_, 0, 0)),
            pl.BlockSpec((1, 1, s_len), lambda b_, h_, i: (b_, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, qb, d), lambda b_, h_, i: (b_, h_, i, 0)),
            pl.BlockSpec((1, 1, qb, 1), lambda b_, h_, i: (b_, h_, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, t, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q.astype(jnp.bfloat16).transpose(0, 2, 1, 3),
      k.astype(jnp.bfloat16).transpose(0, 2, 1, 3),
      v.astype(jnp.bfloat16).transpose(0, 2, 1, 3), kbias[:, None, :])
    return out.transpose(0, 2, 1, 3), lse[..., 0]


# ---------------------------------------------------------------- backward


def _dq_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref, kbias_ref,
               dq_ref, *, qb: int, kb: int, d: int, nk: int, scale: float):
    i = pl.program_id(2)
    hi = jnp.minimum(((i + 1) * qb + kb - 1) // kb, nk)
    q = q_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0, :, 0]
    delta = delta_ref[0, 0, :, 0]
    qa = i * qb + jax.lax.broadcasted_iota(jnp.int32, (qb, kb), 0)

    def body(j, dq):
        kt = k_ref[0, 0, pl.ds(j * kb, kb), :]
        vt = v_ref[0, 0, pl.ds(j * kb, kb), :]
        s = jax.lax.dot_general(
            q, kt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        sa = j * kb + jax.lax.broadcasted_iota(jnp.int32, (qb, kb), 1)
        bias = kbias_ref[0, 0, pl.ds(j * kb, kb)]
        s = jnp.where(qa >= sa, s + bias[None, :], _NEG)
        p = jnp.exp(s - lse[:, None])
        dp = jax.lax.dot_general(
            do, vt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta[:, None]) * scale
        return dq + jax.lax.dot_general(
            ds.astype(jnp.bfloat16), kt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, hi, body, jnp.zeros((qb, d), jnp.float32))
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


def _dkv_kernel(k_ref, v_ref, q_ref, do_ref, lse_ref, delta_ref, kbias_ref,
                dk_ref, dv_ref, *, qb: int, kb: int, d: int, nq: int,
                scale: float):
    j = pl.program_id(2)
    lo = j * kb // qb
    kt = k_ref[0, 0]  # (kb, D)
    vt = v_ref[0, 0]
    bias = kbias_ref[0, 0, pl.ds(j * kb, kb)]
    sa = j * kb + jax.lax.broadcasted_iota(jnp.int32, (qb, kb), 1)

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, 0, pl.ds(i * qb, qb), :]
        do = do_ref[0, 0, pl.ds(i * qb, qb), :]
        lse = lse_ref[0, 0, pl.ds(i * qb, qb), 0]
        delta = delta_ref[0, 0, pl.ds(i * qb, qb), 0]
        qa = i * qb + jax.lax.broadcasted_iota(jnp.int32, (qb, kb), 0)
        s = jax.lax.dot_general(
            q, kt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = jnp.where(qa >= sa, s + bias[None, :], _NEG)
        p = jnp.exp(s - lse[:, None])  # (qb, kb)
        dv = dv + jax.lax.dot_general(
            p.astype(jnp.bfloat16), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (kb, D)
        dp = jax.lax.dot_general(
            do, vt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = (p * (dp - delta[:, None]) * scale).astype(jnp.bfloat16)
        dk = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk, dv

    z = jnp.zeros((kb, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(lo, nq, body, (z, z))
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _bwd(q, k, v, kbias, out, lse, dout, qb, kb, interpret):
    b, t, h, d = q.shape
    s_len = k.shape[1]
    nq, nk = t // qb, s_len // kb
    scale = 1.0 / np.sqrt(d)
    delta = jnp.sum(dout.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1).transpose(0, 2, 1)  # (B, H, T)
    qb16 = q.astype(jnp.bfloat16).transpose(0, 2, 1, 3)   # (B,H,T,D)
    kb16 = k.astype(jnp.bfloat16).transpose(0, 2, 1, 3)
    vb16 = v.astype(jnp.bfloat16).transpose(0, 2, 1, 3)
    do16 = dout.astype(jnp.bfloat16).transpose(0, 2, 1, 3)

    qspec = pl.BlockSpec((1, 1, qb, d), lambda b_, h_, i: (b_, h_, i, 0))
    qrow = pl.BlockSpec((1, 1, t, d), lambda b_, h_, j: (b_, h_, 0, 0))
    krow = pl.BlockSpec((1, 1, s_len, d), lambda b_, h_, i: (b_, h_, 0, 0))
    kspec = pl.BlockSpec((1, 1, kb, d), lambda b_, h_, j: (b_, h_, j, 0))
    lblk = pl.BlockSpec((1, 1, qb, 1), lambda b_, h_, i: (b_, h_, i, 0))
    lrow = pl.BlockSpec((1, 1, t, 1), lambda b_, h_, j: (b_, h_, 0, 0))
    brow = pl.BlockSpec((1, 1, s_len), lambda b_, h_, i: (b_, 0, 0))

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, qb=qb, kb=kb, d=d, nk=nk, scale=scale),
        grid=(b, h, nq),
        in_specs=[qspec, qspec, lblk, lblk, krow, krow, brow],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
        interpret=interpret,
    )(qb16, do16, lse[..., None], delta[..., None], kb16, vb16, kbias[:, None, :])

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, qb=qb, kb=kb, d=d, nq=nq, scale=scale),
        grid=(b, h, nk),
        in_specs=[kspec, kspec, qrow, qrow, lrow, lrow, brow],
        out_specs=[kspec, kspec],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, s_len, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, s_len, d), v.dtype),
        ],
        interpret=interpret,
    )(kb16, vb16, qb16, do16, lse[..., None], delta[..., None], kbias[:, None, :])
    return (dq.transpose(0, 2, 1, 3), dk.transpose(0, 2, 1, 3),
            dv.transpose(0, 2, 1, 3))


# ------------------------------------------------------------- entry point


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_p(q, k, v, kbias, qb, kb, interpret):
    out, _ = _fwd(q, k, v, kbias, qb, kb, interpret)
    return out


def _flash_p_fwd(q, k, v, kbias, qb, kb, interpret):
    from jax.ad_checkpoint import checkpoint_name

    out, lse = _fwd(q, k, v, kbias, qb, kb, interpret)
    # named for the "attn" remat policy: saving (out, lse) lets layer-level
    # rematerialization skip re-running this kernel entirely (the VJP's only
    # other residuals, q/k/v, are regenerated by the cheap wqkv matmul)
    out = checkpoint_name(out, "attn_res")
    lse = checkpoint_name(lse, "attn_res")
    return out, (q, k, v, kbias, out, lse)


def _flash_p_bwd(qb, kb, interpret, res, dout):
    q, k, v, kbias, out, lse = res
    dq, dk, dv = _bwd(q, k, v, kbias, out, lse, dout, qb, kb, interpret)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            jnp.zeros_like(kbias))


_flash_p.defvjp(_flash_p_fwd, _flash_p_bwd)


def flash_attention_train_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_valid: Optional[jnp.ndarray] = None,
    *,
    q_block: Optional[int] = None,
    k_block: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas blockwise causal attention, differentiable.

    q: (B, T, H, D); k, v: (B, S, H, D); key_valid: optional (B, S) bool
    column mask (False = masked; see the module docstring for the
    loss-invariant treatment of masked positions' own rows).
    Returns (B, T, H, D).
    """
    b, t, h, d = q.shape
    s_len = k.shape[1]
    if q_block is None or k_block is None:
        # CONTROLAR_FLASH_QB / _KB: on-chip block-size sweeps without code
        # edits (scripts/bench_train.py A/Bs); defaults are the swept optimum
        import os

        if q_block is None:
            q_block = int(os.environ.get("CONTROLAR_FLASH_QB",
                                         DEFAULT_Q_BLOCK))
        if k_block is None:
            k_block = int(os.environ.get("CONTROLAR_FLASH_KB",
                                         DEFAULT_K_BLOCK))

    def fit_block(n, bmax):
        # smallest block that keeps the same block COUNT as bmax would,
        # minimizing padding (e.g. T=1143, bmax=512 -> 3 blocks of 384 =
        # 1152 rows instead of 3 blocks of 512 = 1536: 34% less work).
        # Blocks are 128-multiples: in-kernel dynamic slices of the lane
        # dimension (the kbias row) must be provably 128-aligned on Mosaic.
        if bmax < 128:  # explicit tiny blocks (tests) pass through
            return min(bmax, _round_up(n, 8))
        nblk = -(-n // bmax)
        return min(bmax, _round_up(-(-n // nblk), 128))

    qb = fit_block(t, q_block)
    kb = fit_block(s_len, k_block)
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

    out = _flash_p(q, k, v, kbias, qb, kb, interpret)
    return out[:, :t] if t_pad != t else out
