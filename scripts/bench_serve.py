"""Serving-engine benchmark: 16 staggered GPT-B c2i requests on one v5e.

Measures cold-to-first-image (compile included) and warm steady-state img/s,
against the reference vLLM fork's A100 rate (8 imgs / 2.39 s = 3.35 img/s,
ref serve/README.md:12). Run: python scripts/bench_serve.py [--quant]"""
import sys
import time

sys.path.insert(0, ".")


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from controlar_tpu.config import gpt_config
    from controlar_tpu.models import gpt as jgpt
    from controlar_tpu.serve.engine import Request, ServeConfig, ServeEngine
    from controlar_tpu import quant

    cfg = gpt_config("GPT-B", model_type="c2i", cls_token_num=1, block_size=576,
                     vocab_size=16384, num_classes=1000)
    params = jgpt.init_gpt_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    if "--quant" in sys.argv:
        params = quant.quantize_gpt_params(params)

    scfg = ServeConfig(max_slots=8, quantum=72, top_k=2000,
                       compilation_cache_dir="/tmp/jax_serve_cache")
    eng = ServeEngine(params, cfg, scfg)

    def mkreq(i):
        return Request(request_id=i, label=i % 1000, cfg_scale=4.0, seed=i)

    # cold: first image out (includes admission + quantum compiles)
    t0 = time.perf_counter()
    done = eng.run([mkreq(0)])
    cold = time.perf_counter() - t0
    print(f"cold-to-first-image: {cold:.1f} s", flush=True)

    # warm: 16 staggered requests (8 now, 8 arrive mid-flight)
    for trial in range(2):
        reqs = [mkreq(100 * trial + i) for i in range(16)]
        for r in reqs[:8]:
            eng.add_request(r)
        t0 = time.perf_counter()
        step = 0
        while eng.has_unfinished():
            eng.step()
            step += 1
            if step == 2:
                for r in reqs[8:]:
                    eng.add_request(r)
        dt = time.perf_counter() - t0
        print(f"warm trial {trial}: 16 imgs in {dt:.2f} s = {16/dt:.2f} img/s "
              f"({16/dt/3.3472:.2f}x ref vLLM A100)", flush=True)


if __name__ == "__main__":
    main()
