"""Model-size benchmark sweep matching the reference's serving table
(ref serve/README.md:8-16: GPT-B/L/XL/XXL/3B, batch 8, 384px = 576 tokens,
CFG). Writes PERFORMANCE.md. Run on the TPU: python scripts/bench_sweep.py"""
import json
import sys
import time

sys.path.insert(0, ".")

BASELINES = {  # A100 seconds: (eager, vLLM fork) per ref serve/README.md
    "GPT-B": (7.80, 2.39),
    "GPT-L": (13.72, 3.48),
    "GPT-XL": (19.76, 4.84),
    "GPT-XXL": (26.38, 6.36),
    "GPT-3B": (14.73, 6.26),
}


def main():
    import jax
    import jax.numpy as jnp

    from controlar_tpu.config import gpt_config
    from controlar_tpu.models import gpt as jgpt
    from controlar_tpu import generate as jgen

    rows = []
    for size, (eager, vllm) in BASELINES.items():
        cfg = gpt_config(size, model_type="c2i", cls_token_num=1, block_size=576,
                         vocab_size=16384, num_classes=1000)
        params = jgpt.init_gpt_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        # pre-unstack and drop the stacked copy (halves weight HBM for 3B)
        from controlar_tpu import decode as dec

        params = dec.unstack_layers(params)
        labels = jnp.arange(8) * 100

        def run(seed):
            return jax.device_get(jgen.generate(
                params, cfg, labels=labels, max_new_tokens=576,
                cfg_scale=4.0, temperature=1.0, top_k=2000,
                rng=jax.random.PRNGKey(seed),
            ))

        run(0)
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            run(i + 1)
            times.append(time.perf_counter() - t0)
        best = min(times)
        rows.append((size, eager, vllm, best, vllm / best))
        print(f"{size}: {best:.3f}s ({vllm/best:.2f}x vs vLLM A100)", flush=True)
        del params

    with open("PERFORMANCE.md", "w") as f:
        f.write(
            "# Performance\n\n"
            "Reference serving workload (ref serve/README.md:8-16): batch 8,\n"
            "c2i 384px = 576 tokens/image, CFG (model batch 16), bf16.\n"
            "Reference numbers are A100; ours are ONE TPU v5e chip via the\n"
            "single-jitted-loop decode path (`generate`), random weights\n"
            "(throughput is weight-independent).\n\n"
            "| model | ref eager A100 | ref vLLM-fork A100 | controlar_tpu 1x v5e | speedup vs vLLM |\n"
            "|---|---|---|---|---|\n"
        )
        for size, eager, vllm, best, speedup in rows:
            f.write(f"| {size} | {eager:.2f} s | {vllm:.2f} s | "
                    f"{best:.3f} s | {speedup:.2f}x |\n")
        f.write("\nReproduce: `python scripts/bench_sweep.py` (headline single "
                "metric: `python bench.py`).\n")
    print("wrote PERFORMANCE.md")


if __name__ == "__main__":
    main()
