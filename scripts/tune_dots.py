"""MXU dot cost scaling inside a Pallas kernel at flash-decode shapes.

Questions: is a (256,W)x(W,32) dot issue-bound or K/N-proportional?  Do two
dots cost two issues?  Cost of elementwise+sum vs dot-reduce?
"""
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 512


def make_kernel(mode, w, block=256, nh=32):
    def kernel(a_ref, b_ref, o_ref):
        def body(i, acc):
            a = a_ref[:]
            if mode == "dot2":        # two half-K dots
                s = (jnp.dot(a[:, :w], b_ref[:w],
                             preferred_element_type=jnp.float32)
                     + jnp.dot(a[:, w:], b_ref[w:],
                               preferred_element_type=jnp.float32))
            elif mode == "dot1":      # one full-K dot
                s = jnp.dot(a, b_ref[:], preferred_element_type=jnp.float32)
            elif mode == "dot_half":  # one half-K dot
                s = jnp.dot(a[:, :w], b_ref[:w],
                            preferred_element_type=jnp.float32)
            elif mode == "dotN64":    # one half-K dot, N=64
                b2 = jnp.concatenate([b_ref[:w], b_ref[w:]], axis=1)
                s = jnp.dot(a[:, :w], b2, preferred_element_type=jnp.float32)
            elif mode == "mulsum":    # elementwise + VPU sum (term-style)
                p = a * jnp.bfloat16(1.01)
                s = jnp.sum(p.astype(jnp.float32), axis=0, keepdims=True)
                s = jnp.broadcast_to(s[:, :nh], (1, nh)) * jnp.ones(
                    (block, nh), jnp.float32)
            elif mode == "conv":      # i-to-f conversion chain cost probe
                c = a.astype(jnp.float32)
                s = jnp.broadcast_to(
                    jnp.sum(c, axis=1, keepdims=True)[:, :1], (block, nh))
            acc = acc + s[0:1, 0:nh].astype(jnp.float32)
            return acc

        acc = jax.lax.fori_loop(
            0, REPS, body, jnp.zeros((1, nh), jnp.float32))
        o_ref[0, 0] = jnp.sum(acc)

    return kernel


def bench(mode, w=1664, block=256):
    a = jax.random.normal(jax.random.PRNGKey(0), (block, 2 * w), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (2 * w, 32), jnp.bfloat16)

    def run(reps):
        global REPS
        REPS = reps
        f = pl.pallas_call(
            make_kernel(mode, w, block),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        )
        g = jax.jit(lambda a, b: f(a, b))
        jax.device_get(g(a, b))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.device_get(g(a, b))
            best = min(best, time.perf_counter() - t0)
        return best

    # slope timing cancels the ~26 ms tunnel round trip
    return (run(4096) - run(512)) / (4096 - 512)


if __name__ == "__main__":
    for mode in sys.argv[1:] or ["dot_half", "dot2", "dot1", "dotN64",
                                 "mulsum", "conv"]:
        t = bench(mode)
        print(f"{mode:9s}: {t*1e6:7.3f} us/iter")
