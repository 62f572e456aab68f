"""Decode-step cost decomposition for the W4+KV4 GPT-3B path.

Times the step at empty vs full cache, then captures a jax.profiler device
trace of a short scan and buckets per-op device time (w4 matmul kernel, q4
flash kernel, DUS appends, quantize rows, everything else).
Run: python scripts/profile_w4.py [--size GPT-3B] [--steps 48]
"""
import argparse
import collections
import glob
import gzip
import json
import sys
import time

sys.path.insert(0, ".")


def timeit(fn, n=3):
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

    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="GPT-3B")
    ap.add_argument("--steps", type=int, default=48)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--phase", default="empty",
                    choices=["empty", "full", "trace"])
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_serve_cache")

    from controlar_tpu.config import gpt_config
    from controlar_tpu.models import gpt as jgpt
    from controlar_tpu import decode as dec, quant

    cfg = gpt_config(args.size, model_type="c2i", cls_token_num=1,
                     block_size=576, vocab_size=16384, num_classes=1000)
    params = jgpt.init_gpt_params(jax.random.PRNGKey(0), cfg,
                                  dtype=jnp.bfloat16)
    w4p = quant.quantize_gpt_params_w4(dec.unstack_layers(params), cfg=cfg)
    dec._UNSTACK_CACHE.clear()
    del params
    nbytes = sum(x.nbytes for x in jax.tree.leaves(w4p))
    # s_max must be a flash-block (256) multiple: the q4 kernel DMAs whole
    # 256-row blocks, so a non-multiple slab reads out of bounds at high pos
    b, s_max, steps = args.batch, 768, args.steps

    def make_steps(pos0):
        @jax.jit
        def run(qp, tok):
            caches = dec.init_flat_caches(cfg, b, s_max, jnp.int4)

            def body(carry, i):
                caches, tok = carry
                logits, caches = dec.decode_step_flat(
                    qp, cfg, caches, tok, pos0 + i, None, None,
                    use_flash=True)
                return (caches, jnp.argmax(logits, -1).astype(jnp.int32)), ()

            (caches, tok), _ = jax.lax.scan(
                body, (caches, tok), jnp.arange(steps))
            return tok

        return run

    tok = jnp.zeros((b,), jnp.int32)
    if args.phase == "empty":
        run = make_steps(1)
        t = timeit(lambda: run(w4p, tok)) / steps
        print(f"{args.size} W4+KV4 b={b}: step(empty cache) {t*1e3:.3f} ms")
        print(f"  weight bytes {nbytes/1e9:.3f} GB -> empty-cache stream "
              f"{nbytes/t/1e12:.3f} TB/s")
        return
    if args.phase == "full":
        run = make_steps(s_max - steps - 1)
        t = timeit(lambda: run(w4p, tok)) / steps
        print(f"{args.size} W4+KV4 b={b}: step(full cache) {t*1e3:.3f} ms")
        return

    run = make_steps(s_max - steps - 1)
    jax.device_get(run(w4p, tok))
    with jax.profiler.trace("/tmp/w4trace"):
        jax.device_get(run(w4p, tok))

    # bucket device-op durations from the trace
    paths = glob.glob("/tmp/w4trace/**/*.trace.json.gz", recursive=True)
    latest = max(paths, key=lambda p: p)
    with gzip.open(latest, "rt") as f:
        tr = json.load(f)
    buckets = collections.Counter()
    counts = collections.Counter()
    names = collections.defaultdict(collections.Counter)
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        pid_name = ev.get("pid")
        name = ev.get("name", "")
        cat = (ev.get("args") or {}).get("long_name", "") or name
        low = name.lower()
        if "w4_matmul" in low or "w4mm" in low:
            key = "w4_matmul"
        elif "flash" in low or "q4" in low:
            key = "q4_flash"
        elif "dynamic-update-slice" in low or "dynamic_update_slice" in low:
            key = "dus_append"
        elif "fusion" in low:
            key = "fusion(glue)"
        elif "copy" in low:
            key = "copy"
        else:
            key = "other"
        buckets[key] += ev["dur"]
        counts[key] += 1
        names[key][name] += ev["dur"]
    total = sum(buckets.values())
    print(f"\ntrace {latest}: total device-op time {total/1e3:.1f} ms "
          f"over {steps} steps")
    for k, v in buckets.most_common():
        print(f"  {k:14s} {v/1e3:8.2f} ms  ({v/steps:7.1f} us/step, "
              f"{counts[k]/steps:5.1f} ops/step)")
        for nm, d in names[k].most_common(6):
            print(f"      {d/steps:7.1f} us/step  {nm[:90]}")


if __name__ == "__main__":
    main()
