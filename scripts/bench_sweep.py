"""Model-size benchmark sweep matching the reference's serving table
(ref serve/README.md:8-16: GPT-B/L/XL/XXL/3B, batch 8, 384px = 576 tokens,
CFG). Also measures the int8 weight-streaming decode path (quant.py) for the
HBM-bound larger models. Writes PERFORMANCE.md. Run: python scripts/bench_sweep.py"""
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
INT8_SIZES = ("GPT-L", "GPT-XL", "GPT-XXL", "GPT-3B")


def main():
    import jax
    import jax.numpy as jnp

    from controlar_tpu.config import gpt_config
    from controlar_tpu.models import gpt as jgpt
    from controlar_tpu import generate as jgen, decode as dec, quant

    rows = []
    for size, (eager, vllm) in BASELINES.items():
        cfg = gpt_config(size, model_type="c2i", cls_token_num=1, block_size=576,
                         vocab_size=16384, num_classes=1000)
        labels = jnp.arange(8) * 100

        def timed(params):
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
            return min(times)

        params = jgpt.init_gpt_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        # pre-unstack and drop the stacked copy (halves weight HBM for 3B)
        pu = dec.unstack_layers(params)
        best = timed(pu)
        del pu
        dec._UNSTACK_CACHE.clear()

        best8 = None
        if size in INT8_SIZES:
            qp = quant.quantize_gpt_params(params)
            del params
            qp = dec.unstack_layers(qp)
            best8 = timed(qp)
            del qp
            dec._UNSTACK_CACHE.clear()
        else:
            del params

        rows.append((size, eager, vllm, best, vllm / best, best8,
                     (vllm / best8) if best8 else None))
        i8 = f", int8 {best8:.3f}s ({vllm/best8:.2f}x)" if best8 else ""
        print(f"{size}: bf16 {best:.3f}s ({vllm/best:.2f}x vs vLLM A100){i8}",
              flush=True)

    with open("PERFORMANCE.md", "w") as f:
        f.write(
            "# Performance\n\n"
            "Reference serving workload (ref serve/README.md:8-16): batch 8,\n"
            "c2i 384px = 576 tokens/image, CFG (model batch 16), bf16.\n"
            "Reference numbers are A100; ours are ONE TPU v5e chip via the\n"
            "single-jitted-loop decode path (`generate`), random weights\n"
            "(throughput is weight-independent). The int8 column is the\n"
            "weight-streaming W8A16 path (`quant.quantize_gpt_params`):\n"
            "per-output-channel scales, XLA fuses the dequant into the dot so\n"
            "only int8 bytes cross HBM. The reference ships no quantized path.\n\n"
            "| model | ref eager A100 | ref vLLM-fork A100 | v5e bf16 | vs vLLM | v5e int8 | vs vLLM |\n"
            "|---|---|---|---|---|---|---|\n"
        )
        for size, eager, vllm, best, speedup, best8, speedup8 in rows:
            i8 = f"{best8:.3f} s | {speedup8:.2f}x" if best8 else "- | -"
            f.write(f"| {size} | {eager:.2f} s | {vllm:.2f} s | "
                    f"{best:.3f} s | {speedup:.2f}x | {i8} |\n")
        f.write("\nReproduce: `python scripts/bench_sweep.py` (headline single "
                "metric: `python bench.py`).\n")
    with open("BENCH_SWEEP.json", "w") as f:
        json.dump([
            {"size": s, "bf16_s": b, "bf16_x": round(x, 3),
             "int8_s": b8, "int8_x": round(x8, 3) if x8 else None}
            for s, _, _, b, x, b8, x8 in rows
        ], f, indent=1)
    print("wrote PERFORMANCE.md")


if __name__ == "__main__":
    main()
