"""Benchmark: the reference's headline serving workload on one TPU chip.

Workload (ref serve/README.md:8-16): GPT-B (111M) c2i at 384px — 8 images x
576 tokens with CFG (batch 16 through the model), bf16. Reference numbers on
A100: 7.80 s eager, 2.39 s with their vLLM fork. vs_baseline is measured
against the vLLM-fork number (their best): >1 means faster than the
reference's optimized serving engine.

Prints exactly ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""
from __future__ import annotations

import json
import sys
import time

BASELINE_VLLM_S = 2.39  # ref serve/README.md:12, GPT-B batch-8 @384px on A100


def main():
    import jax
    import jax.numpy as jnp

    from controlar_tpu.config import gpt_config
    from controlar_tpu.models import gpt as jgpt
    from controlar_tpu import generate as jgen

    # 384px c2i -> 24x24 = 576 tokens (ref sample latency table workload)
    cfg = gpt_config(
        "GPT-B", model_type="c2i", cls_token_num=1, block_size=576,
        vocab_size=16384, num_classes=1000,
    )
    rng = jax.random.PRNGKey(0)
    params = jgpt.init_gpt_params(rng, cfg, dtype=jnp.bfloat16)
    labels = jnp.arange(8) * 100

    def run(seed):
        toks = jgen.generate(
            params, cfg, labels=labels, max_new_tokens=576,
            cfg_scale=4.0, temperature=1.0, top_k=2000,
            rng=jax.random.PRNGKey(seed),
        )
        # device_get, not block_until_ready: on the tunneled axon platform
        # only a host transfer reliably waits for completion
        return jax.device_get(toks)

    run(0)  # compile
    times = []
    for i in range(5):
        t0 = time.perf_counter()
        run(i + 1)
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(json.dumps({
        "metric": "c2i_gptB_384px_batch8_latency",
        "value": round(best, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_VLLM_S / best, 3),
    }))


if __name__ == "__main__":
    main()
