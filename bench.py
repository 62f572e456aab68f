"""Benchmark: the reference's headline serving workload on one TPU chip.

Primary metric (unchanged across rounds, for continuity): GPT-B (111M) c2i at
384px — 8 images x 576 tokens with CFG (batch 16 through the model), bf16.
Reference numbers on A100: 7.80 s eager, 2.39 s with their vLLM fork
(ref serve/README.md:12). vs_baseline is measured against the vLLM-fork
number (their best): >1 means faster than the reference's optimized engine.

The GPT-B number has been flat (dispatch-bound) since round 1 while the
repo's actual wins moved to the flagship configs, so the same JSON line also
carries an "extra" object with the flagship trio:
  - gpt3b_w4kv4_s: GPT-3B batch-8 576-token latency on the W4+KV4 serving
    path (int4 group-128 Pallas dequant-matmul + int4 KV cache) vs the ref
    vLLM fork's 6.26 s (serve/README.md:16) — the max-throughput 3B point.
  - t2i_xl512_img_s: the t2i flagship (GPT-XL, 512px = 1024 tokens, 120-token
    left-padded captions through the flash kernel's column-bias path, CFG 7.5),
    batch 8 bf16, images/sec.
  - serve_warm_img_s: the continuous-batching engine (8 slots, quantum 72,
    in-graph sampling) steady-state warm img/s on GPT-B c2i vs the ref fork's
    3.35 img/s A100 rate.
Each extra is best-effort (guarded; null on failure). Set
CONTROLAR_BENCH_EXTRAS=0 to skip them.

Prints exactly ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ..., "extra": {...}}
"""
from __future__ import annotations

import json
import os
import sys
import time
import traceback

BASELINE_VLLM_S = 2.39   # ref serve/README.md:12, GPT-B batch-8 @384px, A100
BASELINE_3B_VLLM_S = 6.26  # ref serve/README.md:16, GPT-3B
BASELINE_SERVE_IMG_S = 8 / 2.39  # ref fork steady rate implied by README.md:12


def _timed(run, reps=3):
    run(0)  # compile
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        run(i + 1)
        times.append(time.perf_counter() - t0)
    return min(times)


def headline():
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
    params = jgpt.init_gpt_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    labels = jnp.arange(8) * 100

    def run(seed):
        # device_get, not block_until_ready: on the tunneled axon platform
        # only a host transfer reliably waits for completion
        return jax.device_get(jgen.generate(
            params, cfg, labels=labels, max_new_tokens=576,
            cfg_scale=4.0, temperature=1.0, top_k=2000,
            rng=jax.random.PRNGKey(seed),
        ))

    return _timed(run, reps=5)


def extra_gpt3b_w4():
    import jax
    import jax.numpy as jnp

    from controlar_tpu.config import gpt_config
    from controlar_tpu.models import gpt as jgpt
    from controlar_tpu import generate as jgen, decode as dec, quant

    cfg = gpt_config("GPT-3B", model_type="c2i", cls_token_num=1,
                     block_size=576, vocab_size=16384, num_classes=1000)
    params = jgpt.init_gpt_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    w4p = quant.quantize_gpt_params_w4(dec.unstack_layers(params), cfg=cfg)
    del params
    dec._UNSTACK_CACHE.clear()
    labels = jnp.arange(8) * 100

    def run(seed):
        return jax.device_get(jgen.generate(
            w4p, cfg, labels=labels, max_new_tokens=576,
            cfg_scale=4.0, temperature=1.0, top_k=2000,
            rng=jax.random.PRNGKey(seed), cache_dtype=jnp.int4,
        ))

    best = _timed(run)
    del w4p
    dec._UNSTACK_CACHE.clear()
    return {"gpt3b_w4kv4_s": round(best, 4),
            "gpt3b_w4kv4_vs_a100_vllm": round(BASELINE_3B_VLLM_S / best, 3)}


def extra_t2i_xl512():
    import jax
    import jax.numpy as jnp

    from controlar_tpu.config import gpt_config
    from controlar_tpu.models import gpt as jgpt
    from controlar_tpu import generate as jgen, decode as dec

    cfg = gpt_config("GPT-XL", model_type="t2i", cls_token_num=120,
                     block_size=1024, vocab_size=16384)
    params = jgpt.init_gpt_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(1)
    caption = jax.random.normal(rng, (8, 120, cfg.caption_dim),
                                jnp.bfloat16) * 0.1
    # left-padded captions of mixed lengths (ref generate.py:184-193 masks)
    lens = jnp.asarray([17, 120, 64, 33, 90, 8, 51, 120])
    emb_masks = (jnp.arange(120)[None, :] >= (120 - lens)[:, None]).astype(
        jnp.int32)
    caption = caption * emb_masks[:, :, None]

    def run(seed):
        return jax.device_get(jgen.generate(
            params, cfg, caption_emb=caption, emb_masks=emb_masks,
            max_new_tokens=1024, cfg_scale=7.5, temperature=1.0, top_k=2000,
            rng=jax.random.PRNGKey(seed),
        ))

    best = _timed(run)
    del params
    dec._UNSTACK_CACHE.clear()
    return {"t2i_xl512_batch8_s": round(best, 4),
            "t2i_xl512_img_s": round(8 / best, 3)}


def extra_serve():
    import jax
    import jax.numpy as jnp

    from controlar_tpu.config import gpt_config
    from controlar_tpu.models import gpt as jgpt
    from controlar_tpu.serve.engine import Request, ServeConfig, ServeEngine

    cfg = gpt_config("GPT-B", model_type="c2i", cls_token_num=1,
                     block_size=576, vocab_size=16384, num_classes=1000)
    params = jgpt.init_gpt_params(jax.random.PRNGKey(0), cfg,
                                  dtype=jnp.bfloat16)
    scfg = ServeConfig(max_slots=8, quantum=72, top_k=2000,
                       cache_dtype=jnp.bfloat16,
                       compilation_cache_dir="/tmp/jax_serve_cache")
    eng = ServeEngine(params, cfg, scfg)
    eng.run([Request(request_id=999 + i, label=0, cfg_scale=4.0, seed=0)
             for i in range(8)])  # warm the full-batch program

    reqs = [Request(request_id=i, label=(i * 37) % 1000, cfg_scale=4.0,
                    seed=i) for i in range(16)]
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
    rate = 16 / dt
    return {"serve_warm_img_s": round(rate, 3),
            "serve_vs_a100_vllm": round(rate / BASELINE_SERVE_IMG_S, 3)}


def main():
    best = headline()
    out = {
        "metric": "c2i_gptB_384px_batch8_latency",
        "value": round(best, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_VLLM_S / best, 3),
    }
    if os.environ.get("CONTROLAR_BENCH_EXTRAS", "1") != "0":
        extra = {}
        for fn in (extra_gpt3b_w4, extra_t2i_xl512, extra_serve):
            try:
                extra.update(fn())
            except Exception:
                traceback.print_exc(file=sys.stderr)
        out["extra"] = extra
    print(json.dumps(out))


if __name__ == "__main__":
    main()
