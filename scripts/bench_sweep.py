"""Model-size benchmark sweep matching the reference's serving table
(ref serve/README.md:8-16: GPT-B/L/XL/XXL/3B, batch 8, 384px = 576 tokens,
CFG). Also measures the int8 weight-streaming decode path (quant.py) for the
HBM-bound larger models. Writes PERFORMANCE.md. Run: python scripts/bench_sweep.py

A/B switches (these do NOT overwrite PERFORMANCE.md/BENCH_SWEEP.json):
  --stacked        use the stacked (L,B,S,R) deferred-append KV cache
  --sizes GPT-3B   comma list, subset of the sweep
  --modes w4       comma subset of bf16,int8,w4
"""
import argparse
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
INT8_SIZES = ("GPT-B", "GPT-L", "GPT-XL", "GPT-XXL", "GPT-3B")
W4_SIZES = ("GPT-XL", "GPT-XXL", "GPT-3B")  # weight-stream-bound sizes

NOTES = """
Notes:
- Decode is HBM-bandwidth-bound; a v5e chip has 0.82 TB/s vs the A100's
  2.0 TB/s. bf16 streams the big matmuls at ~0.7 TB/s measured; the W8A16
  path streams the same weights in half the bytes at the same per-byte rate
  (43.9 us vs 86.2 us for a GPT-3B FFN matmul; XLA fuses the dequant into
  the dot's operand read). The int8 column also quantizes the KV cache
  (cache_dtype=jnp.int8: per-head scales, Pallas q8 flash kernel with a
  parallel scale stream).
- The W4 column is the max-throughput serving point: int4 group-128 weights
  through the manual-DMA Pallas dequant-matmul (ops/w4_matmul.py, 27.5 us
  vs 43.9 us W8A16 for a 3B FFN weight; w1|w3 fused into one stream) plus
  the int4 KV cache (cache_dtype=jnp.int4, nibble-packed rows, q4 flash
  kernel). It pays only where the weight stream dominates: GPT-3B (24 wide
  layers) gets 6.26 s (ref A100) -> 4.04 s int8 -> 3.074 s W4+KV4 (2.04x,
  clearing BASELINE.md's 2x single-chip bar); at XL/XXL the per-call fixed
  costs and the KV4 VPU unpack outweigh the byte savings (int8 stays
  faster there) - pick the mode per size.
- The stacked deferred-append KV cache (kv_stacked=True: one (L,B,S,R)
  slab per k/v, appends batched across layers, 2 dynamic-update-slices per
  step instead of 2 per layer) measured NEUTRAL on the real chip: GPT-B
  bf16 0.444 s vs 0.416 s per-layer, int8 0.396 s vs 0.404 s; GPT-3B w4
  3.129 s vs 3.079 s per-layer. XLA already overlaps the per-layer DUS
  with compute, so the dispatch saving buys nothing single-chip; per-layer
  stays the default, stacked remains an A/B flag
  (scripts/bench_sweep.py --stacked, ServeConfig.kv_stacked).
- Quantization quality is MEASURED, not assumed: eval/quant_report.py
  (CLI `quant-report`, and verify-zoo --quant-report for real weights)
  reports teacher-forced token agreement / logit error / prefix survival
  per mode. On TRAINED weights (scripts/toy_train_quant.py: models trained
  to convergence on-chip — GPT-B loss 1.36, GPT-XL 1.54, vs the task's
  ~1.3 optimum — the sharp-logit regime real checkpoints live in), token
  agreement is 1.000 for EVERY mode at both sizes, including w4+kv4
  (GPT-B/XL logit-rel-err 0.053/0.038; prefix survival 256/256; the
  free-running sequences match bf16 exactly). The previously-reported
  RANDOM-weight numbers (GPT-B/XL: int8 0.87/0.89, w4 0.41/0.05) are the
  systems-level worst case — near-uniform logits, so argmax flips on tiny
  noise; they bound kernel bugs, not deployment quality. verify-zoo
  --quant-report on released checkpoints remains the ship gate for the W4
  point; int8 is the default --quant mode.
- A roofline note on the 2x-vs-A100 target at GPT-3B: int8 weights are
  3.36 GB x 576 steps = 1.93 TB; finishing in 3.13 s would need 0.62 TB/s
  for weights ALONE, against ~0.70 TB/s measured ceiling with the KV read
  still to serve - quality-preserving int8 cannot reach 2x on one v5e's
  0.82 TB/s HBM; W4 exists for exactly this regime (2.04x measured).
- Speculative multi-token decode (spec_decode.py): draft k tokens with any
  cheaper model, verify in ONE k-position chunk forward; greedy output
  provably equals vanilla decode for ANY draft (CPU suite, bit-for-bit;
  on TPU the scanned vanilla loop's scan-body fusion differs at bf16
  epsilon, flipping near-ties that only random-weight margins produce -
  the eager step, XLA chunk and flash chunk kernels are bit-identical).
  Measured int8-self-draft acceptance at GPT-B k=4: 0.82/token (matches
  the quant gate's 0.87 teacher-forced agreement). Self-drafts are not
  cheaper than the target's own quantized step, so speculation pays with
  CROSS-SIZE drafts (GPT-B drafting 3B) - acceptance there needs real
  released weights to measure; the machinery + equality tests are in.
- t2i flagship (GPT-XL 512px, 1024 tokens + 120-token left-padded captions
  through the kernel's column-bias path, CFG 7.5): 5.56 s / batch 8 bf16 =
  1.44 img/s; 4.14 s = 1.93 img/s with int8 weights + int8 KV.
- Serving engine (continuous batching, 8 slots, quantum 72, group admission,
  in-graph sampling, per-slot positions): 8.1 img/s warm (9.4 with --quant)
  = 2.4-2.8x the ref vLLM fork's A100 rate, serving t2i + emb masks the
  reference cannot. Mixed Poisson load (scripts/bench_serve.py --scenario
  mixed, GPT-B bf16): at 8 req/s offered, 5.1 img/s with p50 1.05 s /
  p95 1.17 s; early quantum exit (quantum_buckets 72/36/18) tightens p95 to
  1.07 s. Device-step waste is 33-35% at rate 8 and 61% at rate 4 — the
  dominant term is EMPTY SLOTS under partial load, not the frozen tail
  (uniform 576-token requests bound the tail by the admission offset), so
  the fixed quantum remains the default. Cold start: `serve-warmup` is the
  deploy-time priming step (compiles every admission bucket + quantum
  program into the persistent cache). Measured cold-to-first-image on the
  remote-compile tunnel is dominated by the tunnel itself and varies
  run-to-run (404 s empty-cache and 1185 s on a repeat that should have
  been cache-warm, vs 95 s in round-2 conditions); a real TPU host
  compiles locally without these roundtrips.
- Input pipeline: carpack (csrc/carpack.cpp, one mmap'd record file) feeds
  the trainer at 1402 items/s vs 318 items/s from the reference-style
  tiny-file tree (4.4x, scripts/bench_input.py); `pack-data` packs a tree,
  train-t2i/train-c2i consume .car directly, loss-for-loss identical.
- Training throughput: GPT-B t2i control fine-tuning at 256px, batch 16:
  161 ms/step = 99 imgs/sec/chip (scripts/bench_train.py; --remat sweeps
  full/dots/none rematerialization policies).
- Timing methodology: `jax.device_get` bounds every measurement
  (block_until_ready does not reliably wait on the tunneled platform).
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stacked", action="store_true",
                    help="stacked deferred-append KV cache (A/B run)")
    ap.add_argument("--sizes", default=None,
                    help="comma list of sizes (A/B run)")
    ap.add_argument("--modes", default="bf16,int8,w4",
                    help="comma subset of bf16,int8,w4 (A/B run)")
    args = ap.parse_args()
    modes = [m.strip() for m in args.modes.split(",") if m.strip()]
    bad = [m for m in modes if m not in ("bf16", "int8", "w4")]
    if bad or not modes:
        ap.error(f"--modes must be a comma subset of bf16,int8,w4 (got {args.modes!r})")
    ab_run = (args.stacked or args.sizes is not None
              or set(modes) != {"bf16", "int8", "w4"})
    if args.sizes is not None:
        unknown = [s for s in args.sizes.split(",") if s not in BASELINES]
        if unknown:
            ap.error(f"--sizes unknown: {unknown}; options {sorted(BASELINES)}")
    sizes = (dict(BASELINES) if args.sizes is None else
             {s: BASELINES[s] for s in args.sizes.split(",")})

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_serve_cache")

    from controlar_tpu.config import gpt_config
    from controlar_tpu.models import gpt as jgpt
    from controlar_tpu import generate as jgen, decode as dec, quant

    rows = []
    for size, (eager, vllm) in sizes.items():
        cfg = gpt_config(size, model_type="c2i", cls_token_num=1, block_size=576,
                         vocab_size=16384, num_classes=1000)
        labels = jnp.arange(8) * 100

        def timed(params, cache_dtype=jnp.bfloat16):
            def run(seed):
                return jax.device_get(jgen.generate(
                    params, cfg, labels=labels, max_new_tokens=576,
                    cfg_scale=4.0, temperature=1.0, top_k=2000,
                    rng=jax.random.PRNGKey(seed), cache_dtype=cache_dtype,
                    kv_stacked=args.stacked,
                ))
            run(0)
            times = []
            for i in range(3):
                t0 = time.perf_counter()
                run(i + 1)
                times.append(time.perf_counter() - t0)
            return min(times)

        params = jgpt.init_gpt_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        best = best8 = best4 = None
        if "bf16" in modes:
            # pre-unstack and drop the stacked copy (halves weight HBM for 3B)
            pu = dec.unstack_layers(params)
            best = timed(pu)
            del pu
            dec._UNSTACK_CACHE.clear()

        if "int8" in modes and size in INT8_SIZES:
            qp = quant.quantize_gpt_params(params)
            qp = dec.unstack_layers(qp)
            # full quantized serving config: int8 weights + int8 KV cache
            best8 = timed(qp, cache_dtype=jnp.int8)
            del qp
            dec._UNSTACK_CACHE.clear()
        if "w4" in modes and size in W4_SIZES:
            # W4A16 weights (int4 group-128 Pallas kernel) + int8 KV cache
            w4p = quant.quantize_gpt_params_w4(dec.unstack_layers(params),
                                               cfg=cfg)
            dec._UNSTACK_CACHE.clear()
            best4 = timed(w4p, cache_dtype=jnp.int4)
            del w4p
        del params

        rows.append((size, eager, vllm, best,
                     (vllm / best) if best else None, best8,
                     (vllm / best8) if best8 else None, best4,
                     (vllm / best4) if best4 else None))
        parts = []
        if best:
            parts.append(f"bf16 {best:.3f}s ({vllm/best:.2f}x vs vLLM A100)")
        if best8:
            parts.append(f"int8 {best8:.3f}s ({vllm/best8:.2f}x)")
        if best4:
            parts.append(f"w4 {best4:.3f}s ({vllm/best4:.2f}x)")
        print(f"{size}: {', '.join(parts)}", flush=True)

    if ab_run:
        print(json.dumps([
            {"size": s, "bf16_s": b, "int8_s": b8, "w4_s": b4,
             "stacked": args.stacked}
            for s, _, _, b, x, b8, x8, b4, x4 in rows]))
        return
    with open("PERFORMANCE.md", "w") as f:
        f.write(
            "# Performance\n\n"
            "Reference serving workload (ref serve/README.md:8-16): batch 8,\n"
            "c2i 384px = 576 tokens/image, CFG (model batch 16), bf16.\n"
            "Reference numbers are A100; ours are ONE TPU v5e chip via the\n"
            "single-jitted-loop decode path (`generate`), random weights\n"
            "(throughput is weight-independent). The int8 column is the\n"
            "weight-streaming W8A16 + int8-KV-cache path (quant.py):\n"
            "per-output-channel scales, XLA fuses the dequant into the dot so\n"
            "only int8 bytes cross HBM. The reference ships no quantized path.\n\n"
            "| model | ref eager A100 | ref vLLM-fork A100 | v5e bf16 | vs vLLM | v5e int8 | vs vLLM | v5e W4 | vs vLLM |\n"
            "|---|---|---|---|---|---|---|---|---|\n"
        )
        for (size, eager, vllm, best, speedup, best8, speedup8,
             best4, speedup4) in rows:
            i8 = f"{best8:.3f} s | {speedup8:.2f}x" if best8 else "- | -"
            w4c = f"{best4:.3f} s | {speedup4:.2f}x" if best4 else "- | -"
            f.write(f"| {size} | {eager:.2f} s | {vllm:.2f} s | "
                    f"{best:.3f} s | {speedup:.2f}x | {i8} | {w4c} |\n")
        f.write("\nReproduce: `python scripts/bench_sweep.py` (headline single "
                "metric: `python bench.py`).\n")
        f.write(NOTES)
    with open("BENCH_SWEEP.json", "w") as f:
        json.dump([
            {"size": s, "bf16_s": b, "bf16_x": round(x, 3),
             "int8_s": b8, "int8_x": round(x8, 3) if x8 else None,
             "w4_s": b4, "w4_x": round(x4, 3) if x4 else None}
            for s, _, _, b, x, b8, x8, b4, x4 in rows
        ], f, indent=1)
    print("wrote PERFORMANCE.md")


if __name__ == "__main__":
    main()
