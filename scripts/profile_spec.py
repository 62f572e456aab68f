"""Component-level timing of the speculative-decode cycle.

The spec cycle (spec_decode.generate_tokens_spec) is ONE jitted
lax.while_loop: cycle = k draft decode-steps + 1 target chunk-verify +
accept bookkeeping, all in-graph — no host round-trips. This script times
each component as its own in-graph fori_loop (pure device time, dispatch
amortized away) and compares their sum against the measured end-to-end
cycle, so the "fixed cost" (VERDICT r4 weak #3: ~20 ms measured vs ~12 ms
theoretical at k=4) is attributed to a specific program instead of guessed.

Components, at the headline workload (c2i batch 8, CFG -> 16 rows,
576 new tokens, s_max 768):
  draft_step_ms    — GPT-B decode_step_multi (per-row positions, flash)
  verify_ms        — GPT-3B forward_chunk over k tokens (flash chunk kernel)
  target_step_ms   — GPT-3B decode_step_multi (what vanilla pays per token)
  cycle_ms         — measured: generate_tokens_spec wall / cycles
  theory_ms        — k * draft_step_ms + verify_ms

Run: python scripts/profile_spec.py [--mode bf16|w4] [--k 4] [--json-out F]
Random weights are fine here: timing is shape-dependent only (acceptance is
not — that's bench_spec.py's job with trained checkpoints).
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", default="GPT-3B")
    ap.add_argument("--draft", default="GPT-B")
    ap.add_argument("--mode", default="bf16", choices=["bf16", "w4"])
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--new-tokens", type=int, default=576)
    ap.add_argument("--reps", type=int, default=64)
    ap.add_argument("--no-flash", action="store_true",
                    help="XLA attention instead of the Pallas kernels "
                         "(CPU smoke testing)")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_serve_cache")

    from controlar_tpu.config import gpt_config, find_multiple
    from controlar_tpu import decode as dec, quant
    from controlar_tpu import spec_decode as spec
    from controlar_tpu.models import gpt as jgpt

    tcfg = gpt_config(args.target, model_type="c2i", cls_token_num=1,
                      block_size=args.new_tokens, vocab_size=16384,
                      num_classes=1000)
    dcfg = gpt_config(args.draft, model_type="c2i", cls_token_num=1,
                      block_size=args.new_tokens, vocab_size=16384,
                      num_classes=1000)
    k = args.k
    use_flash = not args.no_flash
    b = args.batch
    bc = 2 * b  # CFG rows
    s_max = find_multiple(tcfg.cls_token_num + args.new_tokens + k + 64, 256 if use_flash else 8)

    tparams = dec.unstack_layers(
        jgpt.init_gpt_params(jax.random.PRNGKey(0), tcfg, dtype=jnp.bfloat16))
    dparams = dec.unstack_layers(
        jgpt.init_gpt_params(jax.random.PRNGKey(1), dcfg, dtype=jnp.bfloat16))
    if args.mode == "w4":
        tparams = quant.quantize_gpt_params_w4(tparams, cfg=tcfg)
        cache_dtype = jnp.int4
    else:
        cache_dtype = jnp.bfloat16
    dec._UNSTACK_CACHE.clear()

    def timed_loop(make_fn, reps):
        """make_fn() -> (init_state, body) ; runs body reps times in-graph."""
        init_state, body = make_fn()

        @jax.jit
        def run(state):
            return jax.lax.fori_loop(0, reps, body, state)

        out = run(init_state)
        jax.tree.map(lambda x: x.block_until_ready()
                     if hasattr(x, "block_until_ready") else x, out)
        jax.device_get(jax.tree.leaves(out)[0])
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(init_state)
            jax.device_get(jax.tree.leaves(out)[0])
            times.append(time.perf_counter() - t0)
        return min(times) / reps * 1e3  # ms per body

    # --- draft decode step (per-row positions, bf16 cache, flash) ---
    def mk_draft():
        caches = dec.init_flat_caches(dcfg, bc, s_max, jnp.bfloat16)
        tok = jnp.zeros((bc,), jnp.int32)
        pos0 = jnp.full((bc,), 64, jnp.int32)

        # argmax feedback keeps the loop-carried data dependency honest
        def body(i, state):
            caches, tok = state
            logits, caches = dec.decode_step_multi(
                dparams, dcfg, caches, tok, pos0 + i, use_flash=use_flash)
            return caches, jnp.argmax(logits, -1).astype(jnp.int32).reshape(-1)

        return (caches, tok), body

    draft_ms = timed_loop(mk_draft, args.reps)

    # --- target vanilla decode step ---
    def mk_target_step():
        caches = dec.init_flat_caches(tcfg, bc, s_max, cache_dtype)
        tok = jnp.zeros((bc,), jnp.int32)
        pos0 = jnp.full((bc,), 64, jnp.int32)

        def body(i, state):
            caches, tok = state
            logits, caches = dec.decode_step_multi(
                tparams, tcfg, caches, tok, pos0 + i, use_flash=use_flash)
            return caches, jnp.argmax(logits, -1).astype(jnp.int32).reshape(-1)

        return (caches, tok), body

    target_step_ms = timed_loop(mk_target_step, min(args.reps, 32))

    # --- target chunk verify (k tokens) ---
    def mk_verify():
        caches = dec.init_flat_caches(tcfg, bc, s_max, cache_dtype)
        chunk = jnp.zeros((bc, k), jnp.int32)
        pos0 = jnp.full((bc,), 64, jnp.int32)

        def body(i, state):
            caches, chunk = state
            logits, caches = spec.forward_chunk(
                tparams, tcfg, caches, chunk, pos0 + i * k, use_flash=use_flash)
            return caches, jnp.argmax(logits, -1).astype(jnp.int32)

        return (caches, chunk), body

    verify_ms = timed_loop(mk_verify, min(args.reps, 32))

    # --- end-to-end measured cycle ---
    labels = jnp.arange(b) % 16

    def run_spec(seed):
        return spec.generate_spec(
            tparams, tcfg, dparams, dcfg, labels=labels,
            max_new_tokens=args.new_tokens, k_draft=k, cfg_scale=4.0,
            cache_dtype=cache_dtype, draft_cache_dtype=jnp.bfloat16,
            use_flash=use_flash,
            return_stats=True, rng=jax.random.PRNGKey(seed),
            temperature=1.0, top_k=2000)

    toks, st = run_spec(0)
    jax.device_get(toks)
    acc = float(jax.device_get(st["accepted_per_cycle"]))
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        toks, st = run_spec(i + 1)
        jax.device_get(toks)
        times.append(time.perf_counter() - t0)
    total_s = min(times)
    acc = float(jax.device_get(st["accepted_per_cycle"]))
    # true while-loop iterations: the loop runs until the SLOWEST row
    # finishes, so this exceeds the mean-rate estimate n_new/(acc+1)
    cycles = float(jax.device_get(st["loop_iters"]))
    mean_cycles = args.new_tokens / max(acc + 1.0, 1.0)
    cycle_ms = total_s / max(cycles, 1.0) * 1e3
    theory_ms = k * draft_ms + verify_ms

    out = {
        "workload": {"target": args.target, "draft": args.draft,
                     "mode": args.mode, "k": k, "batch": b,
                     "new_tokens": args.new_tokens, "s_max": s_max},
        "draft_step_ms": draft_ms,
        "target_step_ms": target_step_ms,
        "verify_ms": verify_ms,
        "theory_cycle_ms": theory_ms,
        "measured_total_s": total_s,
        "accepted_per_cycle": acc,
        "loop_iters": cycles,
        "mean_rate_cycles": mean_cycles,
        "measured_cycle_ms": cycle_ms,
        "overhead_ms": cycle_ms - theory_ms,
        "verify_vs_step": verify_ms / max(target_step_ms, 1e-9),
    }
    print(json.dumps(out, indent=1))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
