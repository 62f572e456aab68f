"""Int8 weight-only quantization for the decode engine (W8A16).

Decode is HBM-bandwidth bound: every step streams every matmul weight once.
Per-output-channel symmetric int8 halves the streamed bytes; XLA fuses the
int8->bf16 dequant convert into the dot, so the fused matmul runs at the same
per-byte HBM rate as the bf16 one (measured 43.9 us vs 86.2 us for a GPT-3B
FFN matmul on one v5e = 1.96x). No Pallas kernel is needed - the convert rides
the dot fusion's operand read.

This replaces the role of the reference's GPU serving-engine optimizations for
its largest models (ref serve/README.md benchmarks; the reference ships no
quantized path at all, so this is strictly additive capability).

Usage:
    qparams = quantize_gpt_params(params, keep=("output",))   # optional keep
    tokens = generate(qparams, cfg, ...)                      # transparent

A quantized weight is a dict {"q": int8 (..., in, out), "s": f32 (..., 1, out)}
- a plain pytree, so jit/scan/`decode.unstack_layers` all handle it untouched.
`wdot(x, w)` dispatches: quantized dicts take the fused dequant path, plain
arrays the ordinary matmul.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Union

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

# the big per-layer matmuls + the output head: together >95% of streamed bytes
LAYER_QUANT_KEYS = ("wqkv", "wo", "w1", "w3", "w2")
TOP_QUANT_KEYS = ("output",)


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and "q" in w and "s" in w


def is_quantized_w4(w: Any) -> bool:
    return isinstance(w, dict) and "q4" in w and "s" in w


def quantize_weight(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Symmetric per-output-channel int8: w (..., in, out) -> q/s.

    s[..., 0, j] = max_i |w[..., i, j]| / 127;  q = round(w / s) in [-127, 127].
    Leading dims (the stacked layer axis L) quantize independently.
    """
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)
    s = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(w32 / s), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s}


def dequantize_weight(qw: Dict[str, jnp.ndarray], dtype=jnp.bfloat16) -> jnp.ndarray:
    return (qw["q"].astype(jnp.float32) * qw["s"]).astype(dtype)


def wdot(x: jnp.ndarray, w: Union[jnp.ndarray, Dict[str, jnp.ndarray]]) -> jnp.ndarray:
    """x @ w with transparent W8A16 support.

    Quantized path: dot(x, q.astype(bf16)) * s - XLA fuses the convert into
    the dot's operand read, so only int8 bytes cross HBM. Output is cast back
    to x.dtype (the bf16 residual stream), matching the plain-path dtype.
    """
    if is_quantized(w):
        acc = jnp.dot(
            x, w["q"].astype(jnp.bfloat16), preferred_element_type=jnp.float32
        )
        return (acc * w["s"]).astype(x.dtype)
    if is_quantized_w4(w):
        from controlar_tpu.ops.w4_matmul import dequantize_weight_w4, w4_matmul

        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        if jax.default_backend() == "tpu" and x2.shape[0] <= 256:
            out = w4_matmul(x2, w["q4"], w["s"], out_dtype=x.dtype)
        else:
            # prefill/train/CPU fallback: materialize the bf16 weight once
            wd = dequantize_weight_w4(w, jnp.bfloat16, k=x.shape[-1])
            out = jnp.dot(x2, wd, preferred_element_type=jnp.float32
                          ).astype(x.dtype)
        return out.reshape(*lead, out.shape[-1])
    return x @ w


def split_head_perm(n_head: int, kv_heads: int, head_dim: int):
    """Column permutation taking interleaved head dims to split layout.

    Within every head's D-lane block the dims reorder to
    [0,2,..,D-2, 1,3,..,D-1] (NeoX-style [evens | odds]). Returns
    (qkv_perm over (H+2KV)*D columns, q_perm over H*D rows for wo).
    The permutation cancels in q.k (same perm on both sides) and is undone
    for free by permuting wo's input rows — so decode math is unchanged
    while RoPE becomes full-width elementwise (ops/rope.apply_rope_split)
    and the int4 nibble pack becomes contiguous halves.
    """
    import numpy as np

    d = head_dim
    in_head = np.concatenate([np.arange(0, d, 2), np.arange(1, d, 2)])
    n = n_head + 2 * kv_heads
    qkv_perm = (np.arange(n)[:, None] * d + in_head[None, :]).reshape(-1)
    q_perm = qkv_perm[: n_head * d]
    return qkv_perm, q_perm


def to_split_rope(params: Params, cfg) -> Params:
    """Permute an UNSTACKED float/W8 param tree into split-rope layout and
    mark it (params["rope_split"]). Decode paths branch on the marker.

    wqkv output columns and wo input rows get split_head_perm; everything
    else is untouched. Must run before W4 packing (the perm is along wo's
    K axis, which the group quantization bakes in)."""
    if "rope_split" in params:
        return params
    if not isinstance(params["layers"], (list, tuple)):
        raise ValueError("to_split_rope needs the unstacked layout "
                         "(call decode.unstack_layers first)")
    qkv_perm, q_perm = split_head_perm(cfg.n_head, cfg.kv_heads, cfg.head_dim)
    layers = []
    for lp in params["layers"]:
        lp = dict(lp)
        for k, axis, perm in (("wqkv", -1, qkv_perm), ("wo", -2, q_perm)):
            w = lp[k]
            if is_quantized(w):
                if axis == -1:  # s is (..., 1, out): permute with the cols
                    lp[k] = {"q": jnp.take(w["q"], perm, axis=-1),
                             "s": jnp.take(w["s"], perm, axis=-1)}
                else:
                    lp[k] = {"q": jnp.take(w["q"], perm, axis=-2), "s": w["s"]}
            elif is_quantized_w4(w):
                raise ValueError("to_split_rope must run before W4 packing")
            else:
                lp[k] = jnp.take(w, perm, axis=axis)
        layers.append(lp)
    out = dict(params)
    out["layers"] = tuple(layers)
    out["rope_split"] = jnp.zeros((), jnp.int8)  # marker leaf
    return out


def quantize_gpt_params(
    params: Params, keep: Sequence[str] = ()
) -> Params:
    """Quantize the decode-dominant weights of a GPT param tree to int8.

    Works on the stacked (L, in, out) layout (quantize BEFORE
    `decode.unstack_layers`; the per-layer slicing maps over the q/s leaves).
    `keep` names weights to leave in the original dtype (e.g. ("output",) to
    keep the head full-precision for maximum logit fidelity).

    Everything else (embeddings, norms, control MLPs) stays untouched: their
    per-step traffic is negligible (gathers + (d,d)-at-most MLP applied once).
    Also accepts the UNSTACKED layout (list/tuple of per-layer dicts) —
    quantizing after unstacking avoids holding a stacked int8 temp at the
    big sizes (GPT-3B quant-report HBM headroom).
    """
    out = dict(params)
    if isinstance(params["layers"], (list, tuple)):
        out["layers"] = tuple(
            {k: (quantize_weight(v) if k in LAYER_QUANT_KEYS and k not in keep
                 else v) for k, v in lp.items()}
            for lp in params["layers"])
        for k in TOP_QUANT_KEYS:
            if k in out and k not in keep:
                out[k] = quantize_weight(out[k])
        return out
    layers = dict(params["layers"])
    for k in LAYER_QUANT_KEYS:
        if k in layers and k not in keep:
            layers[k] = quantize_weight(layers[k])
    out["layers"] = layers
    for k in TOP_QUANT_KEYS:
        if k in out and k not in keep:
            out[k] = quantize_weight(out[k])
    return out


def quantize_gpt_params_w4(
    params: Params, keep: Sequence[str] = (), cfg=None
) -> Params:
    """W4 (int4 group-128, ops/w4_matmul.py) variant of quantize_gpt_params.

    Must run on the UNSTACKED layout (after decode.unstack_layers): the
    nibble packing pads K per weight, which the stacked (L, ...) tree can't
    carry uniformly. The output head goes to int8 (W8A16), not W4, for logit
    fidelity — it is <2% of streamed bytes at GPT-3B.

    When cfg is given, the tree is first permuted to split-rope layout
    (to_split_rope) — the high-throughput serving configuration.
    """
    from controlar_tpu.ops.w4_matmul import quantize_weight_w4

    if not isinstance(params["layers"], (list, tuple)):
        raise ValueError("quantize_gpt_params_w4 needs the unstacked layout "
                         "(call decode.unstack_layers first)")
    perms = None
    if cfg is not None and "rope_split" not in params:
        # split-rope permutation applied PER LAYER inside the loop: a full
        # to_split_rope() copy of the tree alongside the source and the W4
        # output exceeds 16 GB HBM at GPT-3B
        perms = split_head_perm(cfg.n_head, cfg.kv_heads, cfg.head_dim)
    out = dict(params)
    layers = []
    for lp in params["layers"]:
        lp = dict(lp)
        if perms is not None:
            qkv_perm, q_perm = perms
            for k, axis, perm in (("wqkv", -1, qkv_perm), ("wo", -2, q_perm)):
                w = lp[k]
                if is_quantized(w):
                    lp[k] = ({"q": jnp.take(w["q"], perm, axis=-1),
                              "s": jnp.take(w["s"], perm, axis=-1)}
                             if axis == -1 else
                             {"q": jnp.take(w["q"], perm, axis=-2),
                              "s": w["s"]})
                else:
                    lp[k] = jnp.take(w, perm, axis=axis)
        # fuse w1|w3 into one streamed weight (one kernel call per FFN up)
        if ("w1" in lp and "w3" in lp and "w1" not in keep
                and "w3" not in keep):
            w1, w3 = lp.pop("w1"), lp.pop("w3")
            w1 = dequantize_weight(w1) if is_quantized(w1) else w1
            w3 = dequantize_weight(w3) if is_quantized(w3) else w3
            lp["w13"] = quantize_weight_w4(jnp.concatenate([w1, w3], axis=1))
        for k in LAYER_QUANT_KEYS:
            if k in lp and k not in keep:
                w = lp[k]
                lp[k] = quantize_weight_w4(
                    dequantize_weight(w) if is_quantized(w) else w)
        layers.append(lp)
    out["layers"] = tuple(layers)
    for k in TOP_QUANT_KEYS:
        if k in out and k not in keep and not is_quantized(out[k]):
            out[k] = quantize_weight(out[k])
    if perms is not None:
        out["rope_split"] = jnp.zeros((), jnp.int8)
    return out


def quantization_error(w: jnp.ndarray) -> jnp.ndarray:
    """Max elementwise |w - dequant(quant(w))| per output channel, for tests."""
    qw = quantize_weight(w)
    back = dequantize_weight(qw, jnp.float32)
    return jnp.abs(w.astype(jnp.float32) - back)


def quantize_kv_rows(kv_rows: jnp.ndarray, n_head: int):
    """Interleaved [k|v] cache rows (..., 2*H*D) -> per-head symmetric int8
    plus scales (..., 2*H) f32 (layout [k_scales | v_scales], matching the
    flash_decode_attention2_q8 scale stream)."""
    *lead, hd2 = kv_rows.shape
    h2 = 2 * n_head
    d = hd2 // h2
    kv = kv_rows.astype(jnp.float32).reshape(*lead, h2, d)
    amax = jnp.max(jnp.abs(kv), axis=-1)
    s = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(kv / s[..., None]), -127, 127).astype(jnp.int8)
    return q.reshape(*lead, hd2), s


def dequantize_kv_slab(kv_q: jnp.ndarray, s: jnp.ndarray, n_head: int,
                       dtype=jnp.float32) -> jnp.ndarray:
    """(B,S,2*H*D) int8 + (B,S,>=2*H) f32 (possibly lane-padded)
    -> (B,S,2*H*D) dtype."""
    b, t, hd2 = kv_q.shape
    h2 = 2 * n_head
    d = hd2 // h2
    kv = kv_q.astype(jnp.float32).reshape(b, t, h2, d) * s[..., :h2, None]
    return kv.reshape(b, t, hd2).astype(dtype)


# ---------------------------------------------------------------------------
# Int4 KV cache: nibble-packed rows (2 values/byte along head_dim), per-head
# scales. Halves the decode engine's second-largest HBM read again (the KV
# slab); the flash kernel unpacks per block in VMEM under the DMA shadow
# (ops/flash_decode2.flash_decode_attention2_q4). Quality is measured by the
# same gate as the other modes (eval/quant_report.py, "kv4").
# ---------------------------------------------------------------------------

def kv4_row_width(n_head: int, head_dim: int) -> int:
    """Carrier row bytes for one of k|v: H*D/2 nibble pairs, lane-padded to
    128 (Mosaic block-DMA requirement)."""
    half = n_head * (head_dim // 2)
    return ((half + 127) // 128) * 128


def quantize_kv_rows_4(kv_rows: jnp.ndarray, n_head: int,
                       split: bool = False):
    """[k|v] rows (..., 2*H*D) -> int4 carriers + scales.

    Per-head symmetric int4 (q in [-7, 7], s = amax/7). Packing: carrier j
    of head h holds the pair (even_j, odd_j) as low|high nibbles. With
    split=False rows are interleaved (pair = dims 2j, 2j+1, strided
    extracts); with split=True rows are in split-rope layout (pair = dims
    j, D/2+j — contiguous half slices, the serving fast path).
    Returns (carriers (..., 2*W) int8 with W = kv4_row_width, scales
    (..., 2*H) f32 in [k_scales | v_scales] order).
    """
    *lead, hd2 = kv_rows.shape
    h2 = 2 * n_head
    d = hd2 // h2
    w = kv4_row_width(n_head, d)
    kv = kv_rows.astype(jnp.float32).reshape(*lead, h2, d)
    amax = jnp.max(jnp.abs(kv), axis=-1)
    s = jnp.maximum(amax / 7.0, 1e-8)
    q = jnp.clip(jnp.round(kv / s[..., None]), -7, 7).astype(jnp.int32)
    if split:
        even = q[..., : d // 2]
        odd = q[..., d // 2:]
    else:
        even = q[..., 0::2]  # (..., h2, d/2)
        odd = q[..., 1::2]
    carrier = ((even & 0xF) | (odd << 4)).astype(jnp.int8)
    carrier = carrier.reshape(*lead, 2, n_head * (d // 2))
    pad = w - n_head * (d // 2)
    if pad:
        carrier = jnp.pad(carrier, [(0, 0)] * len(lead) + [(0, 0), (0, pad)])
    return carrier.reshape(*lead, 2 * w), s


def dequantize_kv4_slab(kv_c: jnp.ndarray, s: jnp.ndarray, n_head: int,
                        head_dim: int, dtype=jnp.float32,
                        split: bool = False) -> jnp.ndarray:
    """(B,S,2*W) carriers + (B,S,>=2H) scales -> (B,S,2*H*D) dtype.

    split=True returns rows in split-rope layout (matching
    quantize_kv_rows_4(split=True))."""
    b, t, w2 = kv_c.shape
    w = w2 // 2
    d = head_dim
    half = n_head * (d // 2)
    c = kv_c.reshape(b, t, 2, w)[..., :half].astype(jnp.int32)
    lo = (c << 28) >> 28
    hi = c >> 4
    if split:
        q = jnp.concatenate(
            [lo.reshape(b, t, 2, n_head, d // 2),
             hi.reshape(b, t, 2, n_head, d // 2)], axis=-1)
    else:
        q = jnp.stack([lo, hi], axis=-1).reshape(b, t, 2, n_head, d)
    sv = s[..., : 2 * n_head].reshape(b, t, 2, n_head)
    kv = q.astype(jnp.float32) * sv[..., None]
    return kv.reshape(b, t, 2 * n_head * d).astype(dtype)
