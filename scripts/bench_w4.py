"""Microbenchmark: W4A16 Pallas kernel vs W8A16 XLA-fused dot vs bf16.

One GPT-3B-shaped weight, batch 16 (8 + CFG). Each variant runs a long
in-jit scan; per-step cost is the slope between two scan lengths, which
cancels the tunnel RTT and dispatch overhead (see memory: device_get-only
timing on axon).

Run: python scripts/bench_w4.py
"""
import sys
import time

sys.path.insert(0, ".")

N1, N2 = 400, 1600


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_serve_cache")
    from controlar_tpu import quant
    from controlar_tpu.ops.w4_matmul import quantize_weight_w4, w4_matmul

    b = 16

    def slope(make_scan):
        ts = {}
        for n in (N1, N2):
            f = make_scan(n)
            jax.device_get(f())  # compile + warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.device_get(f())
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        return (ts[N2] - ts[N1]) / (N2 - N1)

    for k, n in [(3200, 8704), (8704, 3200), (3200, 9600)]:
        w = jax.random.normal(jax.random.PRNGKey(0), (k, n), jnp.bfloat16) * 0.02
        x0 = jax.random.normal(jax.random.PRNGKey(1), (b, k), jnp.bfloat16)
        w8 = quant.quantize_weight(w)
        w4 = quantize_weight_w4(w)

        def scan_of(step):
            def make(nsteps):
                @jax.jit
                def run():
                    def body(x, _):
                        out = step(x)
                        # weak dependency so steps serialize without CSE
                        return x + (out[:, :1] * 1e-6).astype(x.dtype), ()
                    xf, _ = jax.lax.scan(body, x0, None, length=nsteps)
                    return xf.sum()
                return run
            return make

        t16 = slope(scan_of(lambda x: jnp.dot(x, w, preferred_element_type=jnp.float32)))
        t8 = slope(scan_of(lambda x: quant.wdot(x, w8)))
        t4 = slope(scan_of(lambda x: w4_matmul(x, w4["q4"], w4["s"])))
        kp = w4["q4"].shape[0] * 2
        print(f"({k}x{n}) b={b}:")
        print(f"  bf16 {t16*1e6:8.1f} us  {k*n*2/t16/1e12:.3f} TB/s")
        print(f"  w8   {t8*1e6:8.1f} us  {k*n/t8/1e12:.3f} TB/s  ({t16/t8:.2f}x)")
        print(f"  w4   {t4*1e6:8.1f} us  {kp*n/2/t4/1e12:.3f} TB/s  "
              f"({t16/t4:.2f}x vs bf16, {t8/t4:.2f}x vs w8)", flush=True)


if __name__ == "__main__":
    main()
