"""W4A16 fused dequant-matmul Pallas kernel (int4 weights, bf16 compute).

Decode at GPT-3B is weight-stream bound: the W8A16 path (quant.py) streams
3.1 GB/step at ~0.65 TB/s. Halving the bytes again needs int4 — but jnp.int4
arrays crash at transfer on this stack, and an XLA-level nibble unpack
materializes a full VPU pass (~3 ops/elem) that erases the DMA win
(NEXTSTEPS round-2 probe). This kernel unpacks per-tile in VMEM instead,
overlapped with the grid pipeline's HBM block prefetch, so the VPU work runs
under the DMA shadow.

Packing layout ("group-pair planes"): the K (contraction) dim is padded to a
multiple of 2*GROUP and split into pairs of adjacent GROUP-row planes; a
carrier byte holds plane 2p in its low nibble and plane 2p+1 in its high
nibble:

    carrier[p*G + i, j] = (q[2p*G + i, j] & 0xF) | (q[(2p+1)*G + i, j] << 4)

Unpack per tile is 2 shifts + a convert; each plane is a contiguous row
block, so the two MXU dots per grid step consume the planes directly — no
row interleave/permute. Scales are per (group, out-channel) f32, applied to
the per-group f32 partial sums (GPTQ/AWQ-style group quantization,
group = 128 rows).

Reference role: the reference ships no quantized serving at all (its vLLM
fork serves fp16, serve/README.md); this is additive capability for the
same workload.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128  # quantization group size along K (rows per scale)


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def quantize_weight_w4(w: jnp.ndarray, group: int = GROUP) -> Dict[str, jnp.ndarray]:
    """(K, N) float -> {"q4": (Kp/2, N) int8 carriers, "s": (Kp/group, N) f32}.

    Symmetric per-(group, out-channel) int4: q in [-7, 7] (symmetric range,
    -8 unused, matching AWQ-style symmetric grids). K is zero-padded to a
    multiple of 2*group; padded rows quantize to 0 and contribute nothing.
    """
    k, n = w.shape
    kp = _pad_to(k, 2 * group)
    w32 = jnp.pad(w.astype(jnp.float32), ((0, kp - k), (0, 0)))
    g = w32.reshape(kp // group, group, n)
    amax = jnp.max(jnp.abs(g), axis=1, keepdims=True)
    s = jnp.maximum(amax / 7.0, 1e-12)
    q = jnp.clip(jnp.round(g / s), -7, 7).astype(jnp.int8).reshape(kp, n)
    # pack adjacent group planes: low nibble = plane 2p, high = plane 2p+1
    planes = q.reshape(kp // group // 2, 2, group, n)
    lo = planes[:, 0] & jnp.int8(0xF)
    hi = planes[:, 1] << jnp.int8(4)
    carriers = (lo | hi).reshape(kp // 2, n)
    return {"q4": carriers, "s": s[:, 0, :]}


def dequantize_weight_w4(qw: Dict[str, jnp.ndarray], dtype=jnp.bfloat16,
                         k: int | None = None) -> jnp.ndarray:
    """Reference unpack (tests + non-TPU fallback): -> (K|Kp, N) dtype.

    `k` trims the zero padding back off; padded rows dequantize to zero so
    leaving them in is harmless for x @ w with zero-padded x.
    """
    c = qw["q4"].astype(jnp.int32)
    kp2, n = c.shape
    g = GROUP
    lo = ((c << 28) >> 28).reshape(kp2 // g, g, n)
    hi = (c >> 4).reshape(kp2 // g, g, n)  # arithmetic: sign-extends
    planes = jnp.stack([lo, hi], axis=1).reshape(2 * kp2 // g, g, n)
    w = planes.astype(jnp.float32) * qw["s"][:, None, :]
    w = w.reshape(2 * kp2, n)
    return (w if k is None else w[:k]).astype(dtype)


def _w4_kernel(x_ref, q_ref, s_ref, o_ref, *, bc: int, bn: int):
    """Grid (N/bn, Kp/2/bc). Block step: unpack (bc, bn) carriers into
    2*(bc, bn) int4 planes and accumulate their group-scaled dots."""
    kb = pl.program_id(1)

    @pl.when(kb == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    c = q_ref[:].astype(jnp.int32)
    lo = ((c << 28) >> 28).astype(jnp.bfloat16)
    hi = (c >> 4).astype(jnp.bfloat16)

    acc = o_ref[:]
    for gi in range(bc // GROUP):
        # carrier rows [kb*bc + gi*G, +G) hold planes 2p and 2p+1 where
        # p = (kb*bc + gi*G) / G  ->  x rows 2p*G.. and (2p+1)*G..
        p = kb * (bc // GROUP) + gi
        x_lo = x_ref[:, pl.ds(pl.multiple_of(2 * p * GROUP, GROUP), GROUP)]
        x_hi = x_ref[:, pl.ds(pl.multiple_of((2 * p + 1) * GROUP, GROUP), GROUP)]
        d_lo = jnp.dot(x_lo, lo[gi * GROUP:(gi + 1) * GROUP],
                       preferred_element_type=jnp.float32)
        d_hi = jnp.dot(x_hi, hi[gi * GROUP:(gi + 1) * GROUP],
                       preferred_element_type=jnp.float32)
        s_lo = s_ref[pl.ds(2 * p, 1), :]
        s_hi = s_ref[pl.ds(2 * p + 1, 1), :]
        acc = acc + d_lo * s_lo + d_hi * s_hi
    o_ref[:] = acc


def _pick_bn(n: int) -> int:
    for bn in (1024, 896, 768, 640, 512, 384, 256, 128):
        if n % bn == 0:
            return bn
    raise ValueError(f"N={n} not a multiple of 128")


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def w4_matmul(x: jnp.ndarray, q4: jnp.ndarray, s: jnp.ndarray,
              out_dtype=jnp.bfloat16, interpret: bool = False) -> jnp.ndarray:
    """x (B, K) bf16 @ w4 (K, N) -> (B, N) out_dtype.

    x is zero-padded to the carrier's padded Kp; B is padded to the bf16
    sublane tile (16).
    """
    b, k = x.shape
    kp2, n = q4.shape
    kp = 2 * kp2
    bn = _pick_bn(n)
    bc = GROUP  # one group-pair of planes per grid step
    bp = _pad_to(max(b, 16), 16)
    xp = jnp.zeros((bp, kp), jnp.bfloat16).at[:b, :k].set(x.astype(jnp.bfloat16))

    grid = (n // bn, kp2 // bc)
    out = pl.pallas_call(
        functools.partial(_w4_kernel, bc=bc, bn=bn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bp, kp), lambda ni, ki: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, bn), lambda ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp // GROUP, bn), lambda ni, ki: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bp, bn), lambda ni, ki: (0, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, n), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * kp * n,
            bytes_accessed=kp2 * n + xp.nbytes + s.nbytes + bp * n * 4,
            transcendentals=0,
        ),
    )(xp, q4, s)
    return out[:b].astype(out_dtype)
