"""Serving-engine benchmarks on one v5e (GPT-B, 576 tokens).

Scenarios:
  throughput (default): 16 staggered c2i requests, warm steady-state img/s
      vs the reference vLLM fork's A100 rate (8 imgs / 2.39 s = 3.35 img/s,
      ref serve/README.md:12), plus cold-to-first-image.
  mixed: Poisson-staggered arrivals at a given offered load, per-request
      p50/p95 latency and the device-step waste fraction (empty slots +
      frozen-tail steps), with and without early quantum exit
      (ServeConfig.quantum_buckets).
  t2i: the same engine serving t2i requests (120-token left-padded caption
      prefixes through the kernel's column-bias path).

Run: python scripts/bench_serve.py [--quant] [--scenario mixed|t2i]
     [--rate 4.0]"""
import argparse
import sys
import time

sys.path.insert(0, ".")


def _latency_stats(done):
    import numpy as np

    lats = np.asarray([r.t_done - r.t_submit for r in done])
    return (float(np.percentile(lats, 50)), float(np.percentile(lats, 95)),
            float(lats.mean()))


def run_mixed(params, cfg, quant_on, rate):
    import numpy as np
    import jax.numpy as jnp

    from controlar_tpu.serve.engine import Request, ServeConfig, ServeEngine

    rng = np.random.default_rng(0)
    n_req = 24
    arrivals = np.cumsum(rng.exponential(1.0 / rate, n_req))

    for label, quantum, buckets, policy, overlap in [
            ("fixed quantum 72", 72, None, "early_exit", False),
            ("buckets (72,36,18)", 72, (72, 36, 18), "early_exit", False),
            ("occupancy (72,36,18,9)", 72, (72, 36, 18, 9), "occupancy", False),
            # overlapped admission: enqueue-ahead scheduling removes the host
            # round-trip from each quantum boundary, so SMALL quanta (more
            # admission opportunities -> less empty-slot waste) stop costing
            # wall-clock
            ("overlap fixed 72", 72, None, "early_exit", True),
            ("overlap fixed 24", 24, None, "early_exit", True),
            ("overlap buckets (72,36,18)", 72, (72, 36, 18), "early_exit",
             True)]:
        scfg = ServeConfig(
            max_slots=8, quantum=quantum, top_k=2000, quantum_buckets=buckets,
            quantum_policy=policy, overlap_admission=overlap,
            cache_dtype=jnp.int8 if quant_on else jnp.bfloat16,
            compilation_cache_dir="/tmp/jax_serve_cache")
        eng = ServeEngine(params, cfg, scfg)
        # warm every admission bucket (1/2/4/8) and all quantum programs
        # (excluded from the measurement)
        for j, nw in enumerate((8, 4, 2, 1)):
            eng.run([Request(request_id=-(100 * (j + 1) + i), label=0,
                             cfg_scale=4.0, seed=0) for i in range(nw)])
        eng.finished = []
        eng.stats = {"slot_steps": 0, "useful_steps": 0}

        reqs = [Request(request_id=i, label=int(rng.integers(0, 1000)),
                        cfg_scale=float(rng.choice([2.0, 4.0, 7.5])),
                        seed=i) for i in range(n_req)]
        t0 = time.perf_counter()
        nxt = 0
        while nxt < n_req or eng.has_unfinished():
            now = time.perf_counter() - t0
            while nxt < n_req and arrivals[nxt] <= now:
                eng.add_request(reqs[nxt]); nxt += 1
            if eng.has_unfinished():
                eng.step()
            else:
                time.sleep(min(0.01, max(0.0, arrivals[nxt] - now)))
        dt = time.perf_counter() - t0
        done = sorted(eng.finished, key=lambda r: r.request_id)
        p50, p95, mean = _latency_stats(done)
        st = eng.stats
        waste = 1.0 - st["useful_steps"] / max(st["slot_steps"], 1)
        print(f"mixed [{label}] rate={rate}/s: {n_req} reqs in {dt:.2f}s "
              f"({n_req/dt:.2f} img/s), latency p50={p50:.2f}s p95={p95:.2f}s "
              f"mean={mean:.2f}s, device-step waste={waste*100:.1f}%",
              flush=True)


def run_t2i(quant_on):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from controlar_tpu.config import gpt_config
    from controlar_tpu.models import gpt as jgpt
    from controlar_tpu.serve.engine import Request, ServeConfig, ServeEngine
    from controlar_tpu import quant

    cfg = gpt_config("GPT-B", model_type="t2i", cls_token_num=120,
                     block_size=576, vocab_size=16384)
    params = jgpt.init_gpt_params(jax.random.PRNGKey(0), cfg,
                                  dtype=jnp.bfloat16)
    if quant_on:
        params = quant.quantize_gpt_params(params)
    rng = np.random.default_rng(0)
    scfg = ServeConfig(max_slots=8, quantum=72, top_k=2000,
                       cache_dtype=jnp.int8 if quant_on else jnp.bfloat16,
                       compilation_cache_dir="/tmp/jax_serve_cache")
    eng = ServeEngine(params, cfg, scfg)

    def mkreq(i):
        ln = int(rng.integers(8, 121))
        cap = np.zeros((120, cfg.caption_dim), np.float32)
        cap[-ln:] = rng.standard_normal((ln, cfg.caption_dim)) * 0.1
        mask = np.zeros((120,), np.int64)
        mask[-ln:] = 1
        return Request(request_id=i, caption_emb=cap, emb_mask=mask,
                       cfg_scale=7.5, seed=i)

    eng.run([mkreq(999)])  # warm
    reqs = [mkreq(i) for i in range(16)]
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
    done = [r for r in eng.finished if r.request_id < 999]
    p50, p95, _ = _latency_stats(done[-16:])
    print(f"t2i warm: 16 imgs in {dt:.2f} s = {16/dt:.2f} img/s, "
          f"latency p50={p50:.2f}s p95={p95:.2f}s", flush=True)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from controlar_tpu.config import gpt_config
    from controlar_tpu.models import gpt as jgpt
    from controlar_tpu.serve.engine import Request, ServeConfig, ServeEngine
    from controlar_tpu import quant

    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", action="store_true")
    ap.add_argument("--stacked", action="store_true",
                    help="stacked (L,B,S,R) KV cache (ServeConfig.kv_stacked)")
    ap.add_argument("--scenario", default="throughput",
                    choices=["throughput", "mixed", "t2i"])
    ap.add_argument("--rate", type=float, default=4.0,
                    help="mixed: offered load, requests/sec")
    args = ap.parse_args()

    if args.scenario == "t2i":
        run_t2i(args.quant)
        return

    cfg = gpt_config("GPT-B", model_type="c2i", cls_token_num=1, block_size=576,
                     vocab_size=16384, num_classes=1000)
    params = jgpt.init_gpt_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    if args.quant:
        params = quant.quantize_gpt_params(params)

    if args.scenario == "mixed":
        run_mixed(params, cfg, args.quant, args.rate)
        return

    scfg = ServeConfig(max_slots=8, quantum=72, top_k=2000,
                       kv_stacked=args.stacked,
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
