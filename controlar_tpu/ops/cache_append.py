"""Per-slot KV-cache row append as a Pallas kernel.

The serving engine needs to write one (H*D,) row per batch element at that
element's own position. XLA lowers a vmapped dynamic-update-slice to scatter,
which is pathologically slow on TPU; Mosaic requires DMA slice shapes AND
dynamic offsets aligned to the (8, 128) tiling, so a single arbitrary row
cannot be addressed directly.

Approach: read-modify-write of the 8-aligned row window containing `pos`
(provably aligned via pl.multiple_of): DMA the (8, HD) window to VMEM,
replace row `pos % 8` with a vector select, DMA it back. 24 KB of traffic
per call — noise next to the attention reads.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WINDOW = 8


def _window_for(dtype) -> int:
    # the RMW window must cover the dtype's native sublane tile
    # (int8 tiles are (32, 128); fp32/bf16 fit in 8)
    return 32 if jnp.dtype(dtype).itemsize == 1 else WINDOW


def _kernel(pos_ref, row_ref, cache_hbm, cache_out, buf, sem, *, window):
    b = pl.program_id(0)
    pos = pos_ref[b]
    aligned = pl.multiple_of((pos // window) * window, window)
    r = pos - aligned

    rd = pltpu.make_async_copy(
        cache_hbm.at[b, pl.ds(aligned, window), :], buf, sem
    )
    rd.start()
    rd.wait()
    hd = buf.shape[-1]
    sel = jax.lax.broadcasted_iota(jnp.int32, (window, hd), 0) == r
    buf[:] = jnp.where(sel, row_ref[0], buf[:])
    wr = pltpu.make_async_copy(
        buf, cache_out.at[b, pl.ds(aligned, window), :], sem
    )
    wr.start()
    wr.wait()


@jax.jit
def cache_append_rows(
    cache: jnp.ndarray,  # (B, S, HD)
    rows: jnp.ndarray,   # (B, HD)
    pos: jnp.ndarray,    # (B,) int32
) -> jnp.ndarray:
    """cache[b, pos[b]] = rows[b], in place (aliased)."""
    b, s, hd = cache.shape
    window = _window_for(cache.dtype)
    out = pl.pallas_call(
        functools.partial(_kernel, window=window),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, 1, hd), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[
                pltpu.VMEM((window, hd), cache.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        # operands: pos=0, rows=1, cache=2 -> alias cache to output 0
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        pos.astype(jnp.int32),
        rows.astype(cache.dtype).reshape(b, 1, hd),
        cache,
    )
    return out


def _block_kernel(pos_ref, rows_ref, cache_hbm, cache_out, buf, sem,
                  *, window: int, k: int, wb: int):
    b = pl.program_id(0)
    pos = pos_ref[b]
    aligned = pl.multiple_of((pos // window) * window, window)
    r = pos - aligned

    rd = pltpu.make_async_copy(
        cache_hbm.at[b, pl.ds(aligned, wb), :], buf, sem
    )
    rd.start()
    rd.wait()
    hd = buf.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (wb, hd), 0)
    merged = buf[:]
    for j in range(k):
        merged = jnp.where(rows == r + j, rows_ref[0, j], merged)
    buf[:] = merged
    wr = pltpu.make_async_copy(
        buf, cache_out.at[b, pl.ds(aligned, wb), :], sem
    )
    wr.start()
    wr.wait()


@jax.jit
def cache_append_block(
    cache: jnp.ndarray,  # (B, S, HD)
    rows: jnp.ndarray,   # (B, K, HD)
    pos: jnp.ndarray,    # (B,) int32 — rows land at [pos[b], pos[b]+K)
) -> jnp.ndarray:
    """cache[b, pos[b] + j] = rows[b, j] for j < K, in place (aliased).

    The speculative-verify primitive: one RMW of the aligned window(s)
    covering the K-row span (K static, small). Requires
    pos[b] + K <= S - window_slack; callers size S with one extra
    alignment window of slack (spec_decode does).
    """
    b, s, hd = cache.shape
    _, k, _ = rows.shape
    window = _window_for(cache.dtype)
    wb = ((window - 1 + k + window - 1) // window) * window
    out = pl.pallas_call(
        functools.partial(_block_kernel, window=window, k=k, wb=wb),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, k, hd), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[
                pltpu.VMEM((wb, hd), cache.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        pos.astype(jnp.int32),
        rows.astype(cache.dtype),
        cache,
    )
    return out


def _stacked_kernel(pos_ref, rows_ref, cache_hbm, cache_out, buf, sem,
                    *, window):
    lyr = pl.program_id(0)
    b = pl.program_id(1)
    pos = pos_ref[b]
    aligned = pl.multiple_of((pos // window) * window, window)
    r = pos - aligned

    rd = pltpu.make_async_copy(
        cache_hbm.at[lyr, b, pl.ds(aligned, window), :], buf, sem
    )
    rd.start()
    rd.wait()
    hd = buf.shape[-1]
    sel = jax.lax.broadcasted_iota(jnp.int32, (window, hd), 0) == r
    buf[:] = jnp.where(sel, rows_ref[0, 0], buf[:])
    wr = pltpu.make_async_copy(
        buf, cache_out.at[lyr, b, pl.ds(aligned, window), :], sem
    )
    wr.start()
    wr.wait()


# tests flip this to run the stacked append kernel (interpret mode)
# inside a full CPU serve run; production callers leave it False
INTERPRET = False


@functools.partial(jax.jit, static_argnames=("interpret",))
def cache_append_rows_stacked(
    cache: jnp.ndarray,  # (L, B, S, HD) stacked slabs
    rows: jnp.ndarray,   # (L, B, HD) one new row per (layer, slot)
    pos: jnp.ndarray,    # (B,) int32 per-slot positions
    interpret: bool | None = None,
) -> jnp.ndarray:
    """cache[l, b, pos[b]] = rows[l, b] for every layer, in place (aliased).

    ONE kernel call replaces the per-layer cache_append_rows dispatches in
    the per-slot (serving) decode step: grid (L, B) pipelines all the RMW
    windows back to back instead of paying a pallas_call per layer per
    stream."""
    nl, b, s, hd = cache.shape
    window = _window_for(cache.dtype)
    out = pl.pallas_call(
        functools.partial(_stacked_kernel, window=window),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nl, b),
            in_specs=[
                # rows reshaped (L, B, 1, HD) so the block's trailing two
                # dims equal the array's (Mosaic block-shape rule)
                pl.BlockSpec((1, 1, 1, hd), lambda i, j, *_: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[
                pltpu.VMEM((window, hd), cache.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        # operands: pos=0, rows=1, cache=2 -> alias cache to output 0
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=INTERPRET if interpret is None else interpret,
    )(
        pos.astype(jnp.int32),
        rows.astype(cache.dtype).reshape(nl, b, 1, hd),
        cache,
    )
    return out
