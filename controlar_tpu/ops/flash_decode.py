"""Pallas flash-decode attention over an HBM-resident KV cache.

The decode-loop hot op (replaces what the reference buys from vLLM's
PagedAttention CUDA kernels, ref serve/gpt_model.py:141-175 — here the cache
is a static slab per sequence, not paged, since image generation has fixed
sequence lengths; SURVEY.md §2.9).

Design (one kernel per layer per decode step, grid over batch):
- K/V caches live in HBM as (B, S, H*D) slabs. The new row at `pos` is
  written by the caller with an XLA dynamic-update-slice (in-place inside the
  decode scan carry; Mosaic cannot express a single-row HBM write because HBM
  memrefs carry (8,128) tiling).
- Only blocks covering rows [0, pos] are DMA'd (double-buffered); the tail
  of the slab is never touched — read volume tracks the true context length
  instead of S_max. This is the decode bandwidth win over plain XLA attention.
- Per-head dots use a block-diagonal trick: scores = K_blk @ Qbd where
  Qbd[(h*D+d), h'] = q[h,d] * (h==h'), one MXU matmul for all heads; the
  value reduction expands probs to head-blocks with a second tiny matmul and
  reduces on the VPU. MXU overwork is free — decode is bandwidth-bound.
- Online (flash) softmax in fp32 across blocks.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK = 256


def _kernel(pos_ref, q_ref, k_hbm, v_hbm, o_ref,
            kbuf, vbuf, sem_k, sem_v,
            *, n_head: int, head_dim: int, block: int):
    b = pl.program_id(0)
    # per-slot positions: pos_ref is (B,) — continuous-batching serving runs
    # every slot at its own depth (scalar callers broadcast)
    pos = pos_ref[b]
    hd = n_head * head_dim

    # block-diagonal q: (HD, H), col h carries q[h*D:(h+1)*D]
    row = jax.lax.broadcasted_iota(jnp.int32, (hd, n_head), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (hd, n_head), 1)
    head_mask = (row // head_dim) == col
    # minor-dim insertion on bf16 is unsupported in Mosaic — broadcast in f32
    qf = q_ref[0, 0, :].astype(jnp.float32)
    q_bd = jnp.where(head_mask, qf[:, None], 0.0).astype(jnp.bfloat16)
    # (H, HD) expansion mask built directly (bool transpose is unsupported)
    erow = jax.lax.broadcasted_iota(jnp.int32, (n_head, hd), 0)
    ecol = jax.lax.broadcasted_iota(jnp.int32, (n_head, hd), 1)
    exp_mask = (ecol // head_dim) == erow

    scale = 1.0 / np.sqrt(head_dim)
    nblocks = pl.cdiv(pos + 1, block)  # rows [0, pos] inclusive

    def get_dma(slot, i, buf, sem, hbm):
        return pltpu.make_async_copy(
            hbm.at[b, pl.ds(i * block, block), :], buf.at[slot], sem.at[slot]
        )

    get_dma(0, 0, kbuf, sem_k, k_hbm).start()
    get_dma(0, 0, vbuf, sem_v, v_hbm).start()

    def body(i, carry):
        m, l, acc = carry  # (1,H) f32, (1,H) f32, (1,HD) f32
        slot = i % 2
        nxt = (i + 1) % 2

        @pl.when(i + 1 < nblocks)
        def _():
            get_dma(nxt, i + 1, kbuf, sem_k, k_hbm).start()
            get_dma(nxt, i + 1, vbuf, sem_v, v_hbm).start()

        get_dma(slot, i, kbuf, sem_k, k_hbm).wait()
        get_dma(slot, i, vbuf, sem_v, v_hbm).wait()

        kb = kbuf[slot]  # (block, HD) bf16
        vb = vbuf[slot]
        s = jnp.dot(kb, q_bd, preferred_element_type=jnp.float32) * scale  # (block, H)
        rows = i * block + jax.lax.broadcasted_iota(jnp.int32, (block, n_head), 0)
        s = jnp.where(rows <= pos, s, -jnp.inf)

        m_blk = jnp.max(s, axis=0, keepdims=True)  # (1, H)
        m_new = jnp.maximum(m, m_blk)
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)  # (block, H)
        l_new = l * alpha + jnp.sum(p, axis=0, keepdims=True)
        # expand probs to (block, HD) with one tiny matmul, weight V, reduce
        p_e = jnp.dot(
            p.astype(jnp.bfloat16), exp_mask.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        term = jnp.sum(p_e * vb.astype(jnp.float32), axis=0, keepdims=True)
        alpha_e = jnp.dot(
            alpha.astype(jnp.bfloat16), exp_mask.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        acc_new = acc * alpha_e + term
        return m_new, l_new, acc_new

    m0 = jnp.full((1, n_head), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((1, n_head), jnp.float32)
    acc0 = jnp.zeros((1, hd), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nblocks, body, (m0, l0, acc0))

    l_e = jnp.dot(l, exp_mask.astype(jnp.float32), preferred_element_type=jnp.float32)
    o_ref[0] = (acc / l_e).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_head", "block", "interpret"))
def flash_decode_attention(
    q: jnp.ndarray,       # (B, H*D) bf16 — already rotated
    k_cache: jnp.ndarray,  # (B, S, H*D) — row `pos` must already be written
    v_cache: jnp.ndarray,
    pos: jnp.ndarray,      # scalar or (B,) int32 positions (attend [0, pos_b])
    *,
    n_head: int,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns attn_out (B, H*D)."""
    b, s, hd = k_cache.shape
    head_dim = hd // n_head
    kernel = functools.partial(
        _kernel, n_head=n_head, head_dim=head_dim, block=block
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, hd), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, hd), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, block, hd), jnp.bfloat16),
            pltpu.VMEM((2, block, hd), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 1, hd), q.dtype),
        interpret=interpret,
    )(
        jnp.broadcast_to(pos.astype(jnp.int32).reshape(-1), (b,)),
        q.astype(jnp.bfloat16)[:, None, :],
        k_cache,
        v_cache,
    )
    return out[:, 0, :]
