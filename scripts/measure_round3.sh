#!/bin/bash
# Round-3 late-optimization measurement batch (run on a live TPU chip).
#
# Everything here is correctness-verified on CPU (interpret parity +
# tests/test_tpu_lowering.py Mosaic lowering gate) but landed after the
# last recorded sweep, so BENCH_SWEEP.json/PERFORMANCE.md lag it:
#   split-rope decode layout, w4_matmul chunk-0 piece split, the stacked
#   deferred-append KV cache, the fused W4 FFN kernel.
# Serialize (the box has one CPU; parallel runs starve the compile helper).
set -x
cd "$(dirname "$0")/.."

# 1. W4 kernel micro: expect <= the recorded 28.4us per GPT-3B FFN weight
timeout 1500 python scripts/bench_w4.py

# 2. The red-cell target: GPT-3B, per-layer vs stacked (goal: w4_s <= 3.13)
timeout 2700 python scripts/bench_sweep.py --sizes GPT-3B
timeout 2700 python scripts/bench_sweep.py --sizes GPT-3B --stacked

# 3. GPT-B A/B (the bench.py headline config)
timeout 1500 python scripts/bench_sweep.py --sizes GPT-B
timeout 1500 python scripts/bench_sweep.py --sizes GPT-B --stacked

# 4. Serving A/B (per-slot stacked path)
timeout 2700 python scripts/bench_serve.py
timeout 2700 python scripts/bench_serve.py --stacked

# 5. If stacked wins: rerun the FULL sweep with the winning flags, refresh
#    PERFORMANCE.md/BENCH_SWEEP.json, consider defaulting kv_stacked on TPU
#    in generate()/bench.py, and record numbers in NEXTSTEPS.md.
timeout 3000 python scripts/bench_sweep.py

# 6. Headline single metric
timeout 1500 python bench.py
