"""Microbenchmark: W4A16 Pallas kernel vs W8A16 XLA-fused dot vs bf16.

One GPT-3B-shaped weight (dim=3200 -> hidden=8704), batch 16 (8 + CFG).
Run: python scripts/bench_w4.py
"""
import sys
import time

sys.path.insert(0, ".")


def timeit(fn, n=5):
    import jax

    jax.device_get(fn())
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        jax.device_get(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_serve_cache")
    from controlar_tpu import quant
    from controlar_tpu.ops.w4_matmul import quantize_weight_w4, w4_matmul

    b = 16
    reps = 24  # amortize dispatch: stream `reps` distinct weights per call
    for k, n in [(3200, 8704), (8704, 3200), (3200, 9600)]:
        key = jax.random.PRNGKey(0)
        ws = [jax.random.normal(jax.random.fold_in(key, i), (k, n),
                                jnp.bfloat16) * 0.02 for i in range(reps)]
        x = jax.random.normal(jax.random.PRNGKey(1), (b, k), jnp.bfloat16)

        w8 = [quant.quantize_weight(w) for w in ws]
        w4 = [quantize_weight_w4(w) for w in ws]

        @jax.jit
        def run_bf16(x, ws):
            return sum(jnp.dot(x, w, preferred_element_type=jnp.float32).sum()
                       for w in ws)

        @jax.jit
        def run_w8(x, ws):
            return sum(quant.wdot(x, w).astype(jnp.float32).sum() for w in ws)

        @jax.jit
        def run_w4(x, ws):
            return sum(w4_matmul(x, w["q4"], w["s"]).astype(jnp.float32).sum()
                       for w in ws)

        bytes_bf16 = reps * k * n * 2
        t16 = timeit(lambda: run_bf16(x, ws)) / reps
        t8 = timeit(lambda: run_w8(x, w8)) / reps
        t4 = timeit(lambda: run_w4(x, w4)) / reps
        kp = w4[0]["q4"].shape[0] * 2
        print(f"({k}x{n}) b={b}:")
        print(f"  bf16 {t16*1e6:8.1f} us  {k*n*2/t16/1e12:.3f} TB/s")
        print(f"  w8   {t8*1e6:8.1f} us  {k*n/t8/1e12:.3f} TB/s  ({t16/t8:.2f}x)")
        print(f"  w4   {t4*1e6:8.1f} us  {kp*n/2/t4/1e12:.3f} TB/s  "
              f"({t16/t4:.2f}x vs bf16, {t8/t4:.2f}x vs w8)")


if __name__ == "__main__":
    main()
