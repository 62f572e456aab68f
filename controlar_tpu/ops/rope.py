"""2D rotary position embeddings over a square token grid.

Semantics match the reference (ref: autoregressive/models/gpt_t2i.py:506-532):
- head_dim is split in half: first half rotates with the row (y) coordinate,
  second half with the column (x) coordinate.
- The first `cls_token_num` positions (class/caption prefix) get an all-zero
  cos/sin table, which zeroes the rotated q/k for prefix tokens — this is the
  reference's (intentional) behavior and is preserved bit-for-bit.
- Rotation operates on interleaved (even, odd) channel pairs.

TPU notes: the table is precomputed once in fp32 on host, lives in HBM, and is
gathered per-position inside jit; `apply_rope` is a pure VPU elementwise op that
XLA fuses into the surrounding qkv projection.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def precompute_rope_2d(
    grid_size: int,
    head_dim: int,
    base: float = 10000.0,
    cls_token_num: int = 120,
) -> np.ndarray:
    """Build the (cls_token_num + grid_size**2, head_dim//2, 2) cos/sin table.

    Mirrors ref gpt_t2i.py:506-519 exactly (fp32, zeros for the prefix rows).
    """
    half_dim = head_dim // 2
    # freq count per axis = head_dim // 4
    exponents = np.arange(0, half_dim, 2)[: half_dim // 2].astype(np.float32) / half_dim
    freqs = 1.0 / (base ** exponents)  # (head_dim//4,)
    t = np.arange(grid_size, dtype=np.float32)
    angles = np.outer(t, freqs)  # (grid, head_dim//4)
    # (grid, grid, head_dim//2): rows vary along axis 0, cols along axis 1
    grid_angles = np.concatenate(
        [
            np.broadcast_to(angles[:, None, :], (grid_size, grid_size, angles.shape[-1])),
            np.broadcast_to(angles[None, :, :], (grid_size, grid_size, angles.shape[-1])),
        ],
        axis=-1,
    )
    table = np.stack([np.cos(grid_angles), np.sin(grid_angles)], axis=-1)
    table = table.reshape(grid_size * grid_size, half_dim, 2)
    prefix = np.zeros((cls_token_num, half_dim, 2), dtype=np.float32)
    return np.concatenate([prefix, table.astype(np.float32)], axis=0)


def precompute_rope_2d_rect(
    grid_h: int,
    grid_w: int,
    head_dim: int,
    base: float = 10000.0,
    cls_token_num: int = 120,
) -> np.ndarray:
    """Rectangular-grid variant for arbitrary-resolution generation.

    The reference slices rows out of a 48x48 square table (sample_t2i_MR.py),
    which only aligns when W/16 == 48; we instead generate the exact (h, w)
    grid per bucket (SURVEY.md §7 item 7).
    """
    half_dim = head_dim // 2
    exponents = np.arange(0, half_dim, 2)[: half_dim // 2].astype(np.float32) / half_dim
    freqs = 1.0 / (base ** exponents)
    ang_h = np.outer(np.arange(grid_h, dtype=np.float32), freqs)
    ang_w = np.outer(np.arange(grid_w, dtype=np.float32), freqs)
    grid_angles = np.concatenate(
        [
            np.broadcast_to(ang_h[:, None, :], (grid_h, grid_w, ang_h.shape[-1])),
            np.broadcast_to(ang_w[None, :, :], (grid_h, grid_w, ang_w.shape[-1])),
        ],
        axis=-1,
    )
    table = np.stack([np.cos(grid_angles), np.sin(grid_angles)], axis=-1)
    table = table.reshape(grid_h * grid_w, half_dim, 2)
    prefix = np.zeros((cls_token_num, half_dim, 2), dtype=np.float32)
    return np.concatenate([prefix, table.astype(np.float32)], axis=0)


def make_split_rope_tables(table: jnp.ndarray, n_head: int, kv_heads: int,
                           head_dim: int):
    """Full-width COS/SIN tables for split-layout (NeoX-style) RoPE over a
    fused [q|k] lane block.

    Split layout stores each head's dims as [evens | odds] within its D-lane
    block (see quant.split_head_perm): pair j lives at lanes (j, D/2+j), so
    rotation is full-width elementwise math with a half-roll — no (...,D/2,2)
    pair reshape, whose TPU relayout copies cost ~330 us/step at GPT-3B.

    table: (T, D/2, 2) from make_rope_table. Returns (cos, sin) each
    (T, (n_head + kv_heads) * D): per head block [c | c] and [-s | s],
    tiled across the q heads then the k heads.
    """
    c = table[..., 0]  # (T, D/2)
    s = table[..., 1]
    per_head_c = jnp.concatenate([c, c], axis=-1)  # (T, D)
    per_head_s = jnp.concatenate([-s, s], axis=-1)
    n = n_head + kv_heads
    cos = jnp.tile(per_head_c, (1, n))
    sin = jnp.tile(per_head_s, (1, n))
    return cos, sin


def apply_rope_split(qk: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
                     head_dim: int) -> jnp.ndarray:
    """Rotate a fused [q|k] block stored in split layout.

    qk: (..., (H+KV)*D) with each head's lanes as [evens | odds].
    cos/sin: broadcastable (..., (H+KV)*D) rows from make_split_rope_tables.
    out = qk*cos + swap(qk)*sin where swap exchanges the half-blocks within
    every head (rolls never cross head boundaries because the select picks
    the in-head direction). fp32 math, cast back (ref gpt_t2i.py:522-532).
    """
    half = head_dim // 2
    lanes = jnp.arange(qk.shape[-1]) % head_dim
    swapped = jnp.where(lanes < half,
                        jnp.roll(qk, -half, axis=-1),
                        jnp.roll(qk, half, axis=-1))
    out = qk.astype(jnp.float32) * cos + swapped.astype(jnp.float32) * sin
    return out.astype(qk.dtype)


def apply_rope(x: jnp.ndarray, rope: jnp.ndarray) -> jnp.ndarray:
    """Rotate q or k. x: (B, T, H, D); rope: (T, D//2, 2) fp32, or
    (B, T, D//2, 2) for per-sequence positions (continuous-batching decode).

    Matches ref gpt_t2i.py:522-532: compute in fp32, cast back to x.dtype.
    """
    b, t, h, d = x.shape
    xf = x.astype(jnp.float32).reshape(b, t, h, d // 2, 2)
    if rope.ndim == 4:
        cos = rope[:, :, None, :, 0]
        sin = rope[:, :, None, :, 1]
    else:
        cos = rope[None, :, None, :, 0]
        sin = rope[None, :, None, :, 1]
    even = xf[..., 0] * cos - xf[..., 1] * sin
    odd = xf[..., 1] * cos + xf[..., 0] * sin
    out = jnp.stack([even, odd], axis=-1).reshape(b, t, h, d)
    return out.astype(x.dtype)
