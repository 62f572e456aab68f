"""Fused decode step: the ENTIRE transformer stack in one Pallas call.

STATUS: EXPERIMENTAL — correct (bf16-level vs the unfused engine) but NOT
faster yet: 0.90 ms/step at GPT-B vs 0.73 ms/step for the unfused
decode-engine path, measured on one v5e. The weight streaming pipelines
well (software-pipelined per-buffer DMAs, w1/w3 sharing one buffer for
VMEM), but the per-batch-element attention loop serializes 16 small
matmul+DMA segments that the unfused flash kernel hides behind XLA's
surrounding work. Next step (round 2): batch the block reads across batch
elements at uniform positions. Not wired into generate(); decode.py remains
the production path.

Per decode step the unfused engine pays ~n_layer kernel-call fixed costs plus
XLA op overheads between them; this kernel runs the whole stack as one
program with grid=(n_layer,) — the hidden state lives in VMEM scratch across
grid steps (Mosaic executes grid iterations sequentially), layer weights are
DMA'd from the stacked HBM arrays per iteration, and attention + cache
append reuse the flash-decode structure in-kernel.

Per layer: RMSNorm -> qkv matmul -> 2D-RoPE rotation (adjacent-lane swap via
pltpu.roll) -> KV row append (8-aligned RMW window) -> flash attention over
rows [0, pos) + the current row from VMEM -> out projection -> residual ->
RMSNorm -> SwiGLU FFN -> residual. Control fusion adds the pre-scaled
projection row at layers where l % (n_layer//3) == 0 (computed from
program_id arithmetic).

VMEM budget = all per-layer weights resident at once (~14 MB at GPT-B), so
this path is gated on small dims; the unfused engine remains the general
path. fits_fused_step() decides.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from controlar_tpu.config import GPTConfig

BLOCK = 128
WINDOW = 8  # cache append RMW window


def fits_fused_step(cfg: GPTConfig, vmem_budget: int = 15 * 2**20) -> bool:
    d, hd, f = cfg.dim, cfg.n_head * cfg.head_dim, cfg.ffn_hidden_dim
    weights = 2 * (d * 3 * hd + hd * d + d * f + f * d)  # bf16 (w1/w3 share)
    bufs = 2 * BLOCK * 2 * hd * 2 + WINDOW * 2 * hd * 2
    return (
        weights + bufs < vmem_budget
        and cfg.kv_heads == cfg.n_head
        and cfg.head_dim % 2 == 0
        and (cfg.n_head * cfg.head_dim) % 128 == 0
    )


def _rms(x_f32, w_f32, eps):
    var = jnp.mean(x_f32 * x_f32, axis=-1, keepdims=True)
    return x_f32 * jax.lax.rsqrt(var + eps) * w_f32


def _kernel(pos_ref,  # (B,) prefetch
            h0_ref, fused_ref, cos_ref, sin_ref, bias_ref,
            attn_norm_ref, ffn_norm_ref, wqkv_hbm, wo_hbm,
            w1_hbm, w3_hbm, w2_hbm, cache_hbm,
            out_ref, cache_out,
            h_s, wqkv_s, wo_s, wff_s, w2_s,
            kvbuf, rowbuf, attn_s, wsem, ksem, rsem,
            *, n_layer: int, n_head: int, head_dim: int, dim: int,
            ffn: int, batch: int, s_max: int, interval: int,
            strength_baked: bool, has_bias: bool, eps: float):
    l = pl.program_id(0)
    hd = n_head * head_dim
    scale = 1.0 / np.sqrt(head_dim)

    # ---- software-pipelined weight streaming ----
    # Each weight buffer's NEXT-layer DMA is started the moment this layer's
    # matmul has consumed it (in-kernel ops are synchronous, so the start is
    # ordered after the consuming matmul); step l waits on DMAs started at
    # step l-1 (layer 0 warms up). Overlaps weight streaming with attention
    # and the FFN without double buffers.
    # w1 and w3 share one buffer (VMEM budget): w3's DMA loads after w1 is
    # consumed, w1 of the next layer after w3 is consumed
    def w_dma(which, layer):
        hbm, buf, slot = [
            (wqkv_hbm, wqkv_s, 0), (wo_hbm, wo_s, 1), (w1_hbm, wff_s, 2),
            (w3_hbm, wff_s, 2), (w2_hbm, w2_s, 4),
        ][which]
        return pltpu.make_async_copy(hbm.at[layer], buf, wsem.at[slot])

    @pl.when(l == 0)
    def _():
        for which in (0, 1, 2, 4):
            w_dma(which, 0).start()

    # norm weights are tiny VMEM inputs; dynamic row reads are not tileable,
    # select-reduce the layer's row instead
    lsel = jax.lax.broadcasted_iota(jnp.int32, attn_norm_ref.shape, 0) == l
    an_row = jnp.sum(
        jnp.where(lsel, attn_norm_ref[:].astype(jnp.float32), 0.0), axis=0
    )
    fn_row = jnp.sum(
        jnp.where(lsel, ffn_norm_ref[:].astype(jnp.float32), 0.0), axis=0
    )

    @pl.when(l == 0)
    def _():
        h_s[:] = h0_ref[:]

    # ---- control fusion (pre-scaled rows; gate from program_id arith) ----
    gate = (l % interval) == 0
    j = jnp.minimum(l // interval, 2)

    @pl.when(gate)
    def _():
        h_s[:] = h_s[:] + fused_ref[j]

    w_dma(0, l).wait()
    hf = h_s[:].astype(jnp.float32)
    xn = _rms(hf, an_row, eps).astype(jnp.bfloat16)
    qkv = jnp.dot(xn, wqkv_s[:], preferred_element_type=jnp.float32)  # (B, 3hd)

    @pl.when(l + 1 < n_layer)
    def _():
        w_dma(0, l + 1).start()

    # ---- RoPE: out[2i] = x[2i]c - x[2i+1]s ; out[2i+1] = x[2i+1]c + x[2i]s
    # = x * cos_lane + swap(x) * sin_signed_lane
    cos = cos_ref[0]  # (hd,) duplicated per pair
    sin_sgn = sin_ref[0]  # (hd,) = [-s0, s0, -s1, s1, ...]
    lane = jax.lax.broadcasted_iota(jnp.int32, (batch, hd), 1)
    even = (lane % 2) == 0

    def rope(x):
        # pltpu.roll requires non-negative shifts; roll by hd-1 == roll by -1
        swapped = jnp.where(
            even, pltpu.roll(x, hd - 1, axis=1), pltpu.roll(x, 1, axis=1)
        )
        return x * cos + swapped * sin_sgn

    q = rope(qkv[:, :hd])
    k = rope(qkv[:, hd: 2 * hd])
    v = qkv[:, 2 * hd:]
    kv_row = jnp.concatenate([k, v], axis=-1).astype(jnp.bfloat16)  # (B, 2hd)

    # ---- per-head block-diagonal masks for the attention matmuls ----
    row_i = jax.lax.broadcasted_iota(jnp.int32, (hd, n_head), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (hd, n_head), 1)
    head_mask = (row_i // head_dim) == col_i
    erow = jax.lax.broadcasted_iota(jnp.int32, (n_head, hd), 0)
    ecol = jax.lax.broadcasted_iota(jnp.int32, (n_head, hd), 1)
    exp_mask = ((ecol // head_dim) == erow).astype(jnp.bfloat16)
    exp_mask_f = exp_mask.astype(jnp.float32)

    # ---- batched KV row append: positions are uniform in batch decode,
    # so one RMW of the 8-aligned window covers every batch element
    pos0 = pos_ref[0]
    aligned = pl.multiple_of((pos0 // WINDOW) * WINDOW, WINDOW)
    r0 = pos0 - aligned
    rd_all = pltpu.make_async_copy(
        cache_hbm.at[l, :, pl.ds(aligned, WINDOW), :], rowbuf, rsem
    )
    rd_all.start()
    rd_all.wait()
    wsel_all = jax.lax.broadcasted_iota(
        jnp.int32, (batch, WINDOW, 2 * hd), 1
    ) == r0
    rowbuf[:] = jnp.where(wsel_all, kv_row[:, None, :], rowbuf[:])
    wr_all = pltpu.make_async_copy(
        rowbuf, cache_out.at[l, :, pl.ds(aligned, WINDOW), :], rsem
    )
    wr_all.start()

    def nblocks_of(b):
        return pl.cdiv(pos_ref[b], BLOCK)

    def blk_dma(slot, b, i):
        return pltpu.make_async_copy(
            cache_hbm.at[l, b, pl.ds(i * BLOCK, BLOCK), :],
            kvbuf.at[slot], ksem.at[slot],
        )

    @pl.when(nblocks_of(0) > 0)
    def _():
        blk_dma(0, 0, 0).start()

    def body_b(b, slot0):
        pos = pos_ref[b]
        nb = nblocks_of(b)  # blocks over PREVIOUS rows [0, pos)

        bsel = jax.lax.broadcasted_iota(jnp.int32, (batch, 2 * hd), 0) == b
        myrow = jnp.sum(jnp.where(bsel, kv_row, 0), axis=0, keepdims=True)
        qsel = jax.lax.broadcasted_iota(jnp.int32, (batch, hd), 0) == b
        qf = jnp.sum(jnp.where(qsel, q, 0.0), axis=0)
        q_bd = jnp.where(head_mask, qf[:, None], 0.0).astype(jnp.bfloat16)

        # current row's contribution (k,v still in registers/VMEM)
        k_cur = myrow[:, :hd].astype(jnp.bfloat16)
        v_cur = myrow[:, hd:].astype(jnp.float32)
        s_cur = jnp.dot(k_cur, q_bd, preferred_element_type=jnp.float32) * scale

        def body_blk(i, carry):
            m, lsum, acc, slot = carry
            nxt = (slot + 1) % 2

            @pl.when(i + 1 < nb)
            def _():
                blk_dma(nxt, b, i + 1).start()

            @pl.when((i + 1 == nb) & (b + 1 < batch) & (nblocks_of(b + 1) > 0))
            def _():
                blk_dma(nxt, b + 1, 0).start()

            blk_dma(slot, b, i).wait()
            kb = kvbuf[slot][:, :hd]
            vb = kvbuf[slot][:, hd:]
            s = jnp.dot(kb, q_bd, preferred_element_type=jnp.float32) * scale
            rows = i * BLOCK + jax.lax.broadcasted_iota(
                jnp.int32, (BLOCK, n_head), 0
            )
            s = jnp.where(rows < pos, s, -jnp.inf)
            if has_bias:
                bias_blk = bias_ref[:, pl.ds(i * BLOCK, BLOCK)]
                bsel2 = jax.lax.broadcasted_iota(
                    jnp.int32, (batch, BLOCK), 0
                ) == b
                brow = jnp.sum(jnp.where(bsel2, bias_blk, 0.0), axis=0)
                s = s + brow.reshape(BLOCK, 1)
            m_blk = jnp.max(s, axis=0, keepdims=True)
            m_new = jnp.maximum(m, m_blk)
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l_new = lsum * alpha + jnp.sum(p, axis=0, keepdims=True)
            p_e = jnp.dot(p.astype(jnp.bfloat16), exp_mask,
                          preferred_element_type=jnp.float32)
            term = jnp.sum(p_e * vb.astype(jnp.float32), axis=0, keepdims=True)
            alpha_e = jnp.dot(alpha.astype(jnp.bfloat16), exp_mask,
                              preferred_element_type=jnp.float32)
            return m_new, l_new, acc * alpha_e + term, nxt

        # degenerate case: b has no previous blocks but b+1 does — start its
        # warmup here since the block loop will not run
        @pl.when((nb == 0) & (b + 1 < batch) & (nblocks_of(b + 1) > 0))
        def _():
            blk_dma(slot0, b + 1, 0).start()

        m0 = jnp.full((1, n_head), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((1, n_head), jnp.float32)
        acc0 = jnp.zeros((1, hd), jnp.float32)
        m, lsum, acc, slot_end = jax.lax.fori_loop(
            0, nb, body_blk, (m0, l0, acc0, slot0)
        )

        # fold in the current row (score may also carry its column bias)
        m_new = jnp.maximum(m, s_cur)
        alpha = jnp.exp(m - m_new)
        p_cur = jnp.exp(s_cur - m_new)
        lsum = lsum * alpha + p_cur
        p_cur_e = jnp.dot(p_cur.astype(jnp.bfloat16), exp_mask,
                          preferred_element_type=jnp.float32)
        alpha_e = jnp.dot(alpha.astype(jnp.bfloat16), exp_mask,
                          preferred_element_type=jnp.float32)
        acc = acc * alpha_e + p_cur_e * v_cur
        l_e = jnp.dot(lsum, exp_mask_f, preferred_element_type=jnp.float32)
        val = (acc / l_e).astype(jnp.bfloat16)
        osel = jax.lax.broadcasted_iota(jnp.int32, (batch, hd), 0) == b
        attn_s[:] = jnp.where(osel, val, attn_s[:])
        return jnp.where(nb == 0, slot0, slot_end)

    jax.lax.fori_loop(0, batch, body_b, jnp.asarray(0, jnp.int32))
    wr_all.wait()

    w_dma(1, l).wait()
    y = jnp.dot(attn_s[:], wo_s[:], preferred_element_type=jnp.float32)

    @pl.when(l + 1 < n_layer)
    def _():
        w_dma(1, l + 1).start()

    h_new = hf + y
    xn2 = _rms(h_new, fn_row, eps).astype(jnp.bfloat16)
    w_dma(2, l).wait()          # w1 resident
    a1 = jnp.dot(xn2, wff_s[:], preferred_element_type=jnp.float32)
    w_dma(3, l).start()          # stream w3 into the shared buffer
    w_dma(3, l).wait()
    a3 = jnp.dot(xn2, wff_s[:], preferred_element_type=jnp.float32)

    @pl.when(l + 1 < n_layer)
    def _():
        w_dma(2, l + 1).start()  # next layer's w1

    act = (jax.nn.silu(a1) * a3).astype(jnp.bfloat16)
    w_dma(4, l).wait()
    h_out = h_new + jnp.dot(act, w2_s[:], preferred_element_type=jnp.float32)

    @pl.when(l + 1 < n_layer)
    def _():
        w_dma(4, l + 1).start()

    h_s[:] = h_out.astype(h_s.dtype)

    @pl.when(l == n_layer - 1)
    def _():
        out_ref[:] = h_s[:]


@functools.partial(
    jax.jit, static_argnames=("cfg", "interpret"), donate_argnums=(3,)
)
def fused_decode_step(
    params_stacked,     # dict with stacked (L, ...) layer weights (bf16)
    cfg: GPTConfig,
    h0: jnp.ndarray,    # (B, dim) bf16 — token embedding for this step
    cache: jnp.ndarray,  # (L, B, S, 2*H*D) bf16, donated/aliased
    pos: jnp.ndarray,   # scalar or (B,)
    fused_rows: Optional[jnp.ndarray] = None,  # (3, B, dim) PRE-SCALED
    col_bias: Optional[jnp.ndarray] = None,    # (B, S) f32
    *,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (h_final (B, dim) bf16, cache')."""
    L, b, s_max, hd2 = cache.shape
    hd = hd2 // 2
    d, f = cfg.dim, cfg.ffn_hidden_dim

    # rope row for this position, expanded to full-lane cos / signed-sin
    from controlar_tpu.models.gpt import make_rope_table

    tab = make_rope_table(cfg)  # (T, hd/2... ) wait: (T, head_dim//2, 2)
    pos_b = jnp.broadcast_to(pos.astype(jnp.int32).reshape(-1), (b,))
    # per-batch rope is required for serving; the kernel uses one row, so
    # this fused path requires equal positions (batch decode). Callers
    # guarantee it; we take row pos[0].
    row = tab[pos_b[0]]  # (head_dim//2, 2) f32
    cos_half = row[:, 0]
    sin_half = row[:, 1]
    cos_pair = jnp.repeat(cos_half, 2)           # (head_dim,)
    sin_pair = jnp.repeat(sin_half, 2)
    sgn = jnp.asarray(np.tile([-1.0, 1.0], cfg.head_dim // 2), jnp.float32)
    sin_signed = sin_pair * sgn                   # (head_dim,)
    cos_full = jnp.tile(cos_pair, cfg.n_head).reshape(1, hd)
    sin_full = jnp.tile(sin_signed, cfg.n_head).reshape(1, hd)

    has_bias = col_bias is not None
    if not has_bias:
        col_bias = jnp.zeros((b, 8), jnp.float32)
    if fused_rows is None:
        fused_rows = jnp.zeros((3, b, d), jnp.bfloat16)

    lw = params_stacked["layers"]
    kernel = functools.partial(
        _kernel,
        n_layer=L, n_head=cfg.n_head, head_dim=cfg.head_dim, dim=d,
        ffn=f, batch=b, s_max=s_max, interval=cfg.layer_interval,
        strength_baked=True, has_bias=has_bias, eps=cfg.norm_eps,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # h0
            pl.BlockSpec(memory_space=pltpu.VMEM),  # fused_rows
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cos
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sin
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
            pl.BlockSpec(memory_space=pltpu.VMEM),  # attn_norm (L, d)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ffn_norm (L, d)
            pl.BlockSpec(memory_space=pltpu.HBM),   # wqkv
            pl.BlockSpec(memory_space=pltpu.HBM),   # wo
            pl.BlockSpec(memory_space=pltpu.HBM),   # w1
            pl.BlockSpec(memory_space=pltpu.HBM),   # w3
            pl.BlockSpec(memory_space=pltpu.HBM),   # w2
            pl.BlockSpec(memory_space=pltpu.HBM),   # cache
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # h_final
            pl.BlockSpec(memory_space=pltpu.HBM),   # cache out
        ],
        scratch_shapes=[
            pltpu.VMEM((b, d), jnp.bfloat16),            # h_s
            pltpu.VMEM((d, 3 * hd), jnp.bfloat16),       # wqkv_s
            pltpu.VMEM((hd, d), jnp.bfloat16),           # wo_s
            pltpu.VMEM((d, f), jnp.bfloat16),            # wff_s (w1/w3)
            pltpu.VMEM((f, d), jnp.bfloat16),            # w2_s
            pltpu.VMEM((2, BLOCK, 2 * hd), jnp.bfloat16),  # kv blocks
            pltpu.VMEM((b, WINDOW, 2 * hd), jnp.bfloat16),  # RMW row window
            pltpu.VMEM((b, hd), jnp.bfloat16),           # attn out
            pltpu.SemaphoreType.DMA((5,)),               # weight DMAs
            pltpu.SemaphoreType.DMA((2,)),               # kv block DMAs
            pltpu.SemaphoreType.DMA(()),                 # RMW row DMA
        ],
    )
    # operand indices (incl. prefetch pos=0): h0=1, fused=2, cos=3, sin=4,
    # bias=5, attn_norm=6, ffn_norm=7, wqkv=8, wo=9, w1=10, w3=11, w2=12,
    # cache=13 -> alias cache to output 1
    h_final, cache = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, d), jnp.bfloat16),
            jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        ],
        input_output_aliases={13: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        pos_b,
        h0.astype(jnp.bfloat16),
        fused_rows.astype(jnp.bfloat16),
        cos_full.astype(jnp.float32),
        sin_full.astype(jnp.float32),
        col_bias.astype(jnp.float32),
        lw["attention_norm"].astype(jnp.float32),
        lw["ffn_norm"].astype(jnp.float32),
        lw["wqkv"].astype(jnp.bfloat16),
        lw["wo"].astype(jnp.bfloat16),
        lw["w1"].astype(jnp.bfloat16),
        lw["w3"].astype(jnp.bfloat16),
        lw["w2"].astype(jnp.bfloat16),
        cache,
    )
    return h_final, cache
