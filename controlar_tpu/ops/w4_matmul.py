"""W4A16 fused dequant-matmul Pallas kernel (int4 weights, bf16 compute).

Decode at GPT-3B is weight-stream bound: the W8A16 path (quant.py) streams
3.1 GB/step at ~0.65 TB/s. Halving the bytes again needs int4 — but jnp.int4
arrays crash at transfer on this stack, and an XLA-level nibble unpack
materializes a full VPU pass (~3 ops/elem) that erases the DMA win
(NEXTSTEPS round-2 probe). This kernel unpacks per-chunk in VMEM instead,
under the shadow of a manual NSLOT-deep DMA pipeline (28.7 us vs the 43.9 us
W8A16 fused dot for a GPT-3B FFN weight on one v5e; pure-DMA floor 20.7 us).

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

GROUP = 128  # default quantization group size along K (rows per scale)

# A/B switch (env CONTROLAR_UNPACK_I8=1): unpack nibbles with int8-domain
# shifts instead of widening to int32 first. Bit-identical (interpret-
# verified) and it passes the CLIENT-side Mosaic lowering, but the real
# backend rejects it: `arith.shli` only legalizes on 32-bit vectors on the
# current toolchain (measured 2026-08-19; int16 fails identically). The
# flag stays for future toolchains; int32-domain remains the default and
# the only compilable mode, so the q4 unpack cost (~35 us/call at GPT-3B)
# is a hardware-toolchain floor for now.
import os as _os

UNPACK_I8 = _os.environ.get("CONTROLAR_UNPACK_I8") == "1"


def unpack_nibbles(c, lo_dtype, hi_dtype=None):
    """int8 carriers -> (lo, hi) sign-extended nibble planes."""
    hi_dtype = hi_dtype or lo_dtype
    if UNPACK_I8:
        return (((c << 4) >> 4).astype(lo_dtype), (c >> 4).astype(hi_dtype))
    ci = c.astype(jnp.int32)
    return (((ci << 28) >> 28).astype(lo_dtype), (ci >> 4).astype(hi_dtype))


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def group_of(q4: jnp.ndarray, s: jnp.ndarray) -> int:
    """Derive the (static) group size from the packed shapes."""
    return 2 * q4.shape[0] // s.shape[0]


def quantize_weight_w4(w: jnp.ndarray, group: int = GROUP
                       ) -> Dict[str, jnp.ndarray]:
    """(K, N) float -> {"q4": (Kp/2, N) int8 carriers, "s": (Kp/group, N) f32}.

    Symmetric per-(group, out-channel) int4: q in [-7, 7] (symmetric range,
    -8 unused, matching AWQ-style symmetric grids). K is zero-padded to a
    multiple of 2*group; padded planes quantize to exactly 0, which lets the
    kernel skip their dots and read x unpadded (see _w4_kernel).
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
    g = group_of(qw["q4"], qw["s"])
    lo = ((c << 28) >> 28).reshape(kp2 // g, g, n)
    hi = (c >> 4).reshape(kp2 // g, g, n)  # arithmetic: sign-extends
    planes = jnp.stack([lo, hi], axis=1).reshape(2 * kp2 // g, g, n)
    w = planes.astype(jnp.float32) * qw["s"][:, None, :]
    w = w.reshape(2 * kp2, n)
    return (w if k is None else w[:k]).astype(dtype)


_VMEM_BUDGET = int(15.25 * 1024 * 1024)


def _resident_bytes(group: int, n: int, bp: int, nchunks: int) -> int:
    """The kernel's fixed VMEM residents (f32 out, scales, plane-major x at
    bf16 lane padding, f32 loop temporaries) before any slot buffers."""
    out_b = bp * n * 4
    s_b = 2 * nchunks * n * 4
    x_b = 2 * nchunks * max(bp, 16) * _pad_to(group, 128) * 2
    acc_b = 3 * bp * n * 4  # acc + dl + dh f32 loop temporaries (measured)
    return out_b + s_b + x_b + acc_b


def _nslot(group: int, n: int, bp: int, nchunks: int) -> int:
    """Pipeline depth bounded by VMEM: slot buffers plus the kernel's other
    VMEM residents must fit the 16 MB scoped limit, with ~1.5 MB headroom
    for Mosaic's own stack (accumulators, spills)."""
    budget = _VMEM_BUDGET - _resident_bytes(group, n, bp, nchunks)
    return max(2, min(6, budget // (group * n)))


def _dual_plane_dots(p, carrier, x_ref, s_ref, group, cols=None):
    """One carrier chunk -> unpack lo/hi nibble planes (VPU) + two group
    dots (MXU), scaled per plane. Planes 2p / 2p+1 read x columns
    [2p*G, (2p+1)*G) / [(2p+1)*G, ...). Shared by _w4_kernel and
    _w4_ffn_kernel so the unpack/addressing math has one home."""
    lo, hi = unpack_nibbles(carrier, jnp.bfloat16)
    csl = slice(None) if cols is None else pl.ds(*cols)
    sl = s_ref[pl.ds(2 * p, 1), csl].astype(jnp.float32)
    sh = s_ref[pl.ds(2 * p + 1, 1), csl].astype(jnp.float32)
    xl = x_ref[:, pl.ds(2 * p * group, group)]
    xh = x_ref[:, pl.ds((2 * p + 1) * group, group)]
    dl = jnp.dot(xl, lo, preferred_element_type=jnp.float32)
    dh = jnp.dot(xh, hi, preferred_element_type=jnp.float32)
    return dl * sl + dh * sh


def _tail_lo_dot(p, carrier, x_ref, s_ref, group):
    """Peeled odd-plane tail: chunk p's lo plane is the last real one; the
    hi plane is zero-quantized padding whose dot is skipped entirely."""
    lo, _ = unpack_nibbles(carrier, jnp.bfloat16)
    sl = s_ref[pl.ds(2 * p, 1), :].astype(jnp.float32)
    xl = x_ref[:, pl.ds(2 * p * group, group)]
    return jnp.dot(xl, lo, preferred_element_type=jnp.float32) * sl


def _w4_kernel(x_ref, q_hbm, s_ref, o_ref, buf, sem, sem0,
               *, nchunks: int, nslot: int, group: int, nfull: int,
               bounds: tuple):
    """Single-program manual-DMA kernel: NSLOT-deep double buffering of
    GROUP-row carrier chunks (full N width, contiguous HBM reads), unpack
    (VPU) + two group dots (MXU) per chunk under the DMA shadow.

    An auto-pipelined grid version measured 38.5 us/weight vs 28.7 us here
    and a 20.7 us pure-DMA floor (GPT-3B FFN shape): Mosaic's grid pipeline
    did not overlap the unpack with the block fetches; manual DMA does.

    x arrives UNPADDED (bp, nfull*group): only the first `nfull` g-wide
    planes are real; any trailing plane is quantization padding whose weight
    nibbles are exactly 0, so its dot is skipped rather than fed zero-padded
    x (saves the per-call (bp, Kp) pad copy — 96/step at GPT-3B — and one
    MXU dot). When nfull is odd the last chunk's lo-plane dot runs in a
    statically-peeled epilogue so every lane offset stays a literal
    128-multiple (Mosaic's dynamic-slice alignment rule)."""

    def get(slot, i):
        return pltpu.make_async_copy(
            q_hbm.at[pl.ds(i * group, group), :], buf.at[slot],
            sem.at[slot])

    nbody = nfull // 2
    npieces = len(bounds) - 1
    split0 = nbody >= 1 and npieces > 1

    def get_piece(j):
        c0, c1 = bounds[j], bounds[j + 1]
        return pltpu.make_async_copy(
            q_hbm.at[pl.ds(0, group), pl.ds(c0, c1 - c0)],
            buf.at[0, :, pl.ds(c0, c1 - c0)], sem0.at[j])

    if split0:
        # chunk 0 split along N into 128-aligned pieces with their own
        # semaphores: the first dot starts after 1/npieces of the fill
        # instead of the whole chunk (the only exposed DMA latency in the
        # pipeline — ~3.4 us for the 2.2 MB w13 chunk at GPT-3B); chunks
        # 1..nslot-1 prefetch behind the pieces
        for j in range(npieces):
            get_piece(j).start()
        for w in range(1, min(nslot, nchunks)):
            get(w, w).start()
    else:
        for w in range(min(nslot - 1, nchunks)):
            get(w, w).start()

    def chunk_dots(p, carrier, cols=None):
        return _dual_plane_dots(p, carrier, x_ref, s_ref, group, cols)

    def body(p, acc):
        slot = p % nslot

        @pl.when(p + nslot - 1 < nchunks)
        def _():
            get((p + nslot - 1) % nslot, p + nslot - 1).start()

        get(slot, p).wait()
        return acc + chunk_dots(p, buf[slot][:])

    if split0:
        parts = []
        for j in range(npieces):
            get_piece(j).wait()
            c0, c1 = bounds[j], bounds[j + 1]
            parts.append(chunk_dots(0, buf[0, :, pl.ds(c0, c1 - c0)],
                                    cols=(c0, c1 - c0)))
        acc0 = jnp.concatenate(parts, axis=-1)
        # body(p) prefetches chunk p+nslot-1, so starting at p=1 continues
        # seamlessly from the prologue's chunks 1..nslot-1
        acc = jax.lax.fori_loop(1, nbody, body, acc0)
    else:
        acc = jax.lax.fori_loop(
            0, nbody, body, jnp.zeros(o_ref.shape, jnp.float32))
    if nfull % 2:
        p = nbody
        get(p % nslot, p).wait()
        acc = acc + _tail_lo_dot(p, buf[p % nslot][:], x_ref, s_ref, group)
    o_ref[:] = acc


def _w4_ffn_kernel(x_ref, q13_hbm, s13_ref, q2_hbm, s2_ref, o_ref,
                   buf13, sem13, sem0, buf2, sem2, zbuf,
                   *, group: int, nfull13: int, nchunks13: int, nslot13: int,
                   bounds: tuple, f: int, nfull2: int, nchunks2: int,
                   nslot2: int):
    """Fused SwiGLU FFN: stream q13 (K -> 2F), gate in VMEM, stream q2
    (F -> N) — one kernel call; the (B, 2F) intermediate never leaves VMEM
    and q2's first chunks prefetch under the q13 phase."""

    def get13(slot, i):
        return pltpu.make_async_copy(
            q13_hbm.at[pl.ds(i * group, group), :], buf13.at[slot],
            sem13.at[slot])

    def get2(slot, i):
        return pltpu.make_async_copy(
            q2_hbm.at[pl.ds(i * group, group), :], buf2.at[slot],
            sem2.at[slot])

    npieces = len(bounds) - 1
    nbody13 = nfull13 // 2
    split0 = nbody13 >= 1 and npieces > 1

    def get_piece(j):
        c0, c1 = bounds[j], bounds[j + 1]
        return pltpu.make_async_copy(
            q13_hbm.at[pl.ds(0, group), pl.ds(c0, c1 - c0)],
            buf13.at[0, :, pl.ds(c0, c1 - c0)], sem0.at[j])

    # warm-up: chunk 0 (piece-split when worthwhile), then the pipeline
    # depth of q13, then q2's first chunks (they land during phase 1)
    if split0:
        for j in range(npieces):
            get_piece(j).start()
        for w_ in range(1, min(nslot13, nchunks13)):
            get13(w_, w_).start()
    else:
        for w_ in range(min(nslot13 - 1, nchunks13)):
            get13(w_, w_).start()
    for w_ in range(min(nslot2 - 1, nchunks2)):
        get2(w_, w_).start()

    def chunk_dots(p, carrier, src_ref, s_ref, cols=None):
        return _dual_plane_dots(p, carrier, src_ref, s_ref, group, cols)

    # ---- phase 1: acc13 = x @ w13 (f32, lives in VMEM regs)
    def body13(p, acc):
        slot = p % nslot13

        @pl.when(p + nslot13 - 1 < nchunks13)
        def _():
            get13((p + nslot13 - 1) % nslot13, p + nslot13 - 1).start()

        get13(slot, p).wait()
        return acc + chunk_dots(p, buf13[slot][:], x_ref, s13_ref)

    if split0:
        parts = []
        for j in range(npieces):
            get_piece(j).wait()
            c0, c1 = bounds[j], bounds[j + 1]
            parts.append(chunk_dots(0, buf13[0, :, pl.ds(c0, c1 - c0)],
                                    x_ref, s13_ref, cols=(c0, c1 - c0)))
        acc0 = jnp.concatenate(parts, axis=-1)
        acc13 = jax.lax.fori_loop(1, nbody13, body13, acc0)
    else:
        acc13 = jax.lax.fori_loop(
            0, nbody13, body13,
            jnp.zeros((x_ref.shape[0], 2 * f), jnp.float32))
    if nfull13 % 2:
        p = nbody13
        get13(p % nslot13, p).wait()
        acc13 = acc13 + _tail_lo_dot(p, buf13[p % nslot13][:], x_ref,
                                     s13_ref, group)

    # ---- gate: round the accumulator halves to bf16 (matching the
    # unfused path's wdot output dtype), then silu*mul in f32 — Mosaic's
    # bf16 logistic lowering trips a broadcast verifier, and the f32 math
    # is within the quantized path's tolerance of XLA's bf16 silu
    y = acc13.astype(jnp.bfloat16).astype(jnp.float32)
    h1 = y[:, :f]
    h3 = y[:, f:]
    zbuf[:] = (h1 * jax.nn.sigmoid(h1) * h3).astype(jnp.bfloat16)

    # ---- phase 2: out = z @ w2
    def body2(p, acc):
        slot = p % nslot2

        @pl.when(p + nslot2 - 1 < nchunks2)
        def _():
            get2((p + nslot2 - 1) % nslot2, p + nslot2 - 1).start()

        get2(slot, p).wait()
        return acc + chunk_dots(p, buf2[slot][:], zbuf, s2_ref)

    acc2 = jax.lax.fori_loop(
        0, nfull2 // 2, body2, jnp.zeros(o_ref.shape, jnp.float32))
    if nfull2 % 2:
        p = nfull2 // 2
        get2(p % nslot2, p).wait()
        acc2 = acc2 + _tail_lo_dot(p, buf2[p % nslot2][:], zbuf, s2_ref,
                                   group)
    o_ref[:] = acc2


def w4_ffn_fits(q13, s13, q2, s2, b: int, k: int) -> bool:
    """Static shape + VMEM feasibility gate for the fused FFN kernel:
    both weights quantized with the SAME group, K and F group multiples,
    lane-aligned widths, and all phase buffers within the VMEM budget."""
    kp13, n13 = q13.shape
    kp2, n2 = q2.shape
    group = 2 * kp13 // s13.shape[0]
    group2 = 2 * kp2 // s2.shape[0]
    bp = _pad_to(max(b, 16), 16)
    if n13 % 256 or n2 % 128 or group % 128 or group2 != group:
        return False
    if k % group or 2 * kp13 != _pad_to(k, 2 * group):
        return False
    f = n13 // 2
    if f % group or 2 * kp2 != _pad_to(f, 2 * group):
        return False
    resident = (
        2 * group * n13 +            # buf13 (nslot13=2) int8
        2 * group * n2 +             # buf2 int8
        s13.size * 4 + s2.size * 4 +
        bp * f * 2 +                 # zbuf bf16
        bp * n13 * 4 * 3 +           # acc13 + dl/dh temporaries
        bp * n2 * 4 * 3 +
        bp * (kp13 * 2) * 2          # x bf16
    )
    return resident < int(14.0 * 1024 * 1024)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def w4_ffn(x: jnp.ndarray, q13: jnp.ndarray, s13: jnp.ndarray,
           q2: jnp.ndarray, s2: jnp.ndarray,
           out_dtype=jnp.bfloat16, interpret: bool = False) -> jnp.ndarray:
    """Fused SwiGLU FFN over the fused-w13 W4 layout:
    silu(x@w1) * (x@w3) @ w2, one Pallas call.

    Numerics match decode.ffn's unfused path (bf16 gate on the f32
    accumulator halves). K and F must be group multiples (every model dim
    is); callers gate on w4_ffn_fits."""
    b, k = x.shape
    kp13_2, n13 = q13.shape
    kp2_2, n2 = q2.shape
    group = 2 * kp13_2 // s13.shape[0]
    f = n13 // 2
    assert f % group == 0 and k % group == 0
    nfull13, nchunks13 = k // group, kp13_2 // group
    nfull2, nchunks2 = f // group, kp2_2 // group
    bp = _pad_to(max(b, 16), 16)
    xp = x.astype(jnp.bfloat16)
    if bp != b:
        xp = jnp.zeros((bp, k), jnp.bfloat16).at[:b].set(xp)
    piece = max(512, _pad_to((n13 + 3) // 4, 128))
    bounds = tuple(range(0, n13, piece)) + (n13,)
    nslot13 = nslot2 = 2

    out = pl.pallas_call(
        functools.partial(
            _w4_ffn_kernel, group=group, nfull13=nfull13,
            nchunks13=nchunks13, nslot13=nslot13, bounds=bounds, f=f,
            nfull2=nfull2, nchunks2=nchunks2, nslot2=nslot2),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, n2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nslot13, group, n13), jnp.int8),
            pltpu.SemaphoreType.DMA((nslot13,)),
            pltpu.SemaphoreType.DMA((len(bounds) - 1,)),
            pltpu.VMEM((nslot2, group, n2), jnp.int8),
            pltpu.SemaphoreType.DMA((nslot2,)),
            pltpu.VMEM((bp, f), jnp.bfloat16),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * (k * n13 + f * n2),
            bytes_accessed=kp13_2 * n13 + kp2_2 * n2 + xp.nbytes
            + s13.nbytes + s2.nbytes + bp * n2 * 4,
            transcendentals=bp * f,
        ),
    )(xp, q13, s13, q2, s2)
    return out[:b].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def w4_matmul(x: jnp.ndarray, q4: jnp.ndarray, s: jnp.ndarray,
              out_dtype=jnp.bfloat16, interpret: bool = False) -> jnp.ndarray:
    """x (B, K) bf16 @ w4 (K, N) -> (B, N) out_dtype.

    When K is a group multiple (every model dim is), x passes through
    unpadded and the kernel skips the zero-quantized padding planes;
    otherwise x is zero-padded to the carrier's padded Kp. B is padded to
    the bf16 sublane tile (16). N must be a 128 multiple.
    """
    b, k = x.shape
    kp2, n = q4.shape
    kp = 2 * kp2
    group = 2 * kp2 // s.shape[0]
    nchunks = kp2 // group
    bp = _pad_to(max(b, 16), 16)
    # VMEM-aware N-split: at large row counts (speculative chunk-verify,
    # prefill tails) the fixed residents alone (4x bp*n f32 out+acc) blow
    # the 16 MB scoped limit that bp=16 decode was tuned for. Halve the
    # output columns (128-aligned) recursively until a piece fits; the
    # weights stream once per piece over disjoint columns, so total HBM
    # weight bytes are unchanged.
    if (n > 128 and _resident_bytes(group, n, bp, nchunks)
            + 2 * group * n > _VMEM_BUDGET):
        mid = _pad_to(n // 2, 128)
        lo = w4_matmul(x, q4[:, :mid], s[:, :mid],
                       out_dtype=out_dtype, interpret=interpret)
        hi = w4_matmul(x, q4[:, mid:], s[:, mid:],
                       out_dtype=out_dtype, interpret=interpret)
        return jnp.concatenate([lo, hi], axis=-1)
    nslot = _nslot(group, n, bp, nchunks)
    natural = group % 128 == 0 and k % group == 0
    if natural:
        # x unpadded on K: padded weight planes are zero-quantized, so the
        # kernel skips their dots (no (bp, Kp) pad copy per call)
        nfull = k // group
        xp = x.astype(jnp.bfloat16)
        if bp != b:
            xp = jnp.zeros((bp, k), jnp.bfloat16).at[:b].set(xp)
    else:
        nfull = kp // group
        xp = jnp.zeros((bp, kp), jnp.bfloat16
                       ).at[:b, :k].set(x.astype(jnp.bfloat16))

    # chunk-0 N-split bounds (128-aligned quarters, >=512 lanes each)
    piece = max(512, _pad_to((n + 3) // 4, 128))
    bounds = tuple(range(0, n, piece)) + (n,)

    out = pl.pallas_call(
        functools.partial(_w4_kernel, nchunks=nchunks, nslot=nslot,
                          group=group, nfull=nfull, bounds=bounds),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nslot, group, n), jnp.int8),
            pltpu.SemaphoreType.DMA((nslot,)),
            pltpu.SemaphoreType.DMA((len(bounds) - 1,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * kp * n,
            bytes_accessed=kp2 * n + xp.nbytes + s.nbytes + bp * n * 4,
            transcendentals=0,
        ),
    )(xp, q4, s)
    return out[:b].astype(out_dtype)
