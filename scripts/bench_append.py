"""Microbench: KV-cache append strategies for the uniform-pos decode scan.

Variants (GPT-3B W4+KV4 shapes: 24 layers, bc=16, S=768, row 2*1664 int8
carriers + 128 f32 scale lanes):
  a) per-layer DUS at (0, pos, 0) on (B, S, W)   -- current decode_step_flat
  b) ONE stacked DUS at (0, 0, pos, 0) on (L, B, S, W)  -- proposed
  c) per-layer DUS at (pos, 0, 0) on (S, B, W)   -- time-major per-layer

Slope timing (two scan lengths, device_get-bounded) cancels tunnel RTT.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

L, B, S, W, SP = 24, 16, 768, 3328, 128


def run(fn, n):
    out = jax.jit(fn, static_argnames=("n",))(n=n)
    jax.device_get(out)  # warm/compile
    t0 = time.perf_counter()
    jax.device_get(jax.jit(fn, static_argnames=("n",))(n=n))
    return time.perf_counter() - t0


def variant_a(n):
    kvs = [jnp.zeros((B, S, W), jnp.int8) for _ in range(L)]
    scs = [jnp.zeros((B, S, SP), jnp.float32) for _ in range(L)]

    def step(carry, i):
        kvs, scs = carry
        pos = 1 + i
        row = (jnp.ones((B, 1, W), jnp.int8) * (i % 3).astype(jnp.int8))
        srow = jnp.ones((B, 1, SP), jnp.float32) * i
        kvs = tuple(
            jax.lax.dynamic_update_slice(c, row, (0, pos, 0)) for c in kvs
        )
        scs = tuple(
            jax.lax.dynamic_update_slice(c, srow, (0, pos, 0)) for c in scs
        )
        return (kvs, scs), ()

    (kvs, scs), _ = jax.lax.scan(step, (tuple(kvs), tuple(scs)), jnp.arange(n))
    return sum(c.astype(jnp.int32).sum() for c in kvs) + sum(
        c.sum() for c in scs
    ).astype(jnp.int32)


def variant_b(n):
    kv = jnp.zeros((L, B, S, W), jnp.int8)
    sc = jnp.zeros((L, B, S, SP), jnp.float32)

    def step(carry, i):
        kv, sc = carry
        pos = 1 + i
        rows = jnp.ones((L, B, 1, W), jnp.int8) * (i % 3).astype(jnp.int8)
        srows = jnp.ones((L, B, 1, SP), jnp.float32) * i
        kv = jax.lax.dynamic_update_slice(kv, rows, (0, 0, pos, 0))
        sc = jax.lax.dynamic_update_slice(sc, srows, (0, 0, pos, 0))
        return (kv, sc), ()

    (kv, sc), _ = jax.lax.scan(step, (kv, sc), jnp.arange(n))
    return kv.astype(jnp.int32).sum() + sc.sum().astype(jnp.int32)


def variant_c(n):
    kvs = [jnp.zeros((S, B, W), jnp.int8) for _ in range(L)]
    scs = [jnp.zeros((S, B, SP), jnp.float32) for _ in range(L)]

    def step(carry, i):
        kvs, scs = carry
        pos = 1 + i
        row = jnp.ones((1, B, W), jnp.int8) * (i % 3).astype(jnp.int8)
        srow = jnp.ones((1, B, SP), jnp.float32) * i
        kvs = tuple(
            jax.lax.dynamic_update_slice(c, row, (pos, 0, 0)) for c in kvs
        )
        scs = tuple(
            jax.lax.dynamic_update_slice(c, srow, (pos, 0, 0)) for c in scs
        )
        return (kvs, scs), ()

    (kvs, scs), _ = jax.lax.scan(step, (tuple(kvs), tuple(scs)), jnp.arange(n))
    return sum(c.astype(jnp.int32).sum() for c in kvs) + sum(
        c.sum() for c in scs
    ).astype(jnp.int32)


if __name__ == "__main__":
    print("devices:", jax.devices())
    for name, fn in [("a_perlayer_bsw", variant_a),
                     ("b_stacked_one_dus", variant_b),
                     ("c_perlayer_sbw", variant_c)]:
        t_small = run(fn, 64)
        t_big = run(fn, 576)
        per_step = (t_big - t_small) / (576 - 64)
        print(f"{name}: {per_step*1e6:.2f} us/step "
              f"(64: {t_small*1e3:.1f} ms, 576: {t_big*1e3:.1f} ms)")
