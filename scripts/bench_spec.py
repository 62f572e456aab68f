"""Speculative-decode wall-clock on the headline serving workload.

Workload matches bench_sweep / ref serve/README.md:8-16: c2i, batch 8,
576 new tokens (384px), CFG 4.0, top-k 2000 sampling. The speculative path
(spec_decode.generate_spec) drafts k tokens with a cheaper model and
verifies them in ONE target chunk-forward; sampling uses the Leviathan
accept/reject (distribution-preserving), greedy is provably target-exact.

Acceptance is weight-dependent, so this script expects TRAINED checkpoints
(scripts/toy_train_quant.py --block-size 576 --ckpt-out ... produces
converged toy models whose confident logits are the realistic sharp-logit
regime; released-zoo weights slot in the same way via --*-ckpt). Random
weights measure the pathological low-acceptance end — pass --random for
that curve point.

Run:
  python scripts/bench_spec.py --target GPT-3B --target-ckpt /tmp/toy_gpt3b.npz \
      --draft GPT-B --draft-ckpt /tmp/toy_gptb576.npz --k 2,4,8 \
      --target-modes bf16,w4 [--greedy] [--json-out BENCH_SPEC.json]
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

REF_VLLM_A100 = {"GPT-B": 2.39, "GPT-L": 3.48, "GPT-XL": 4.84,
                 "GPT-XXL": 6.36, "GPT-3B": 6.26}


def load_or_init(size, ckpt, cfg, seed):
    """Returns the UNSTACKED layout: at GPT-3B (6.2 GB bf16) the stacked
    tree must not coexist with the quantized copies (16 GB HBM)."""
    import jax
    import jax.numpy as jnp
    from controlar_tpu import decode as dec
    from controlar_tpu.models import gpt as jgpt

    if ckpt:
        from controlar_tpu.tools import import_params_npz

        params = import_params_npz(ckpt)
        params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    else:
        print(f"[warn] random {size} weights", file=sys.stderr)
        params = jgpt.init_gpt_params(jax.random.PRNGKey(seed), cfg,
                                      dtype=jnp.bfloat16)
    return dec.unstack_layers(params)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", default="GPT-3B")
    ap.add_argument("--draft", default="GPT-B")
    ap.add_argument("--target-ckpt", default=None)
    ap.add_argument("--draft-ckpt", default=None)
    ap.add_argument("--k", default="2,4,8")
    ap.add_argument("--target-modes", default="bf16,w4",
                    help="comma subset of bf16,int8,w4 (w4 pairs with kv4)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--new-tokens", type=int, default=576)
    ap.add_argument("--cfg-scale", type=float, default=4.0)
    ap.add_argument("--greedy", action="store_true",
                    help="greedy (target-exact) instead of Leviathan sampling")
    ap.add_argument("--random", action="store_true",
                    help="allow random weights without the warning gate")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_serve_cache")

    from controlar_tpu.config import gpt_config
    from controlar_tpu import generate as jgen, decode as dec, quant
    from controlar_tpu import spec_decode as spec

    tcfg = gpt_config(args.target, model_type="c2i", cls_token_num=1,
                      block_size=args.new_tokens, vocab_size=16384,
                      num_classes=1000)
    dcfg = gpt_config(args.draft, model_type="c2i", cls_token_num=1,
                      block_size=args.new_tokens, vocab_size=16384,
                      num_classes=1000)
    if not (args.target_ckpt and args.draft_ckpt) and not args.random:
        ap.error("trained checkpoints required (acceptance is meaningless at "
                 "random weights); pass --random to measure that end anyway")

    tparams = load_or_init(args.target, args.target_ckpt, tcfg, 0)
    dparams = load_or_init(args.draft, args.draft_ckpt, dcfg, 1)
    # trained toy classes are 0..15; random weights don't care
    labels = jnp.arange(args.batch) % 16

    sample_kw = (dict(rng=None) if args.greedy else
                 dict(rng=jax.random.PRNGKey(7), temperature=1.0, top_k=2000))

    def timed(fn):
        jax.device_get(fn(0))
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            jax.device_get(fn(i + 1))
            times.append(time.perf_counter() - t0)
        return min(times)

    results = {"workload": {
        "target": args.target, "draft": args.draft, "batch": args.batch,
        "new_tokens": args.new_tokens, "cfg_scale": args.cfg_scale,
        "sampling": "greedy" if args.greedy else "topk2000",
        "trained": bool(args.target_ckpt and args.draft_ckpt),
        "ref_vllm_a100_s": REF_VLLM_A100.get(args.target)}, "modes": {}}

    for mode in [m.strip() for m in args.target_modes.split(",") if m.strip()]:
        if mode == "bf16":
            tp, cache_dtype = tparams, jnp.bfloat16
        elif mode == "int8":
            tp = quant.quantize_gpt_params(tparams)
            cache_dtype = jnp.int8
        elif mode == "w4":
            tp = quant.quantize_gpt_params_w4(dec.unstack_layers(tparams),
                                              cfg=tcfg)
            cache_dtype = jnp.int4
        else:
            ap.error(f"unknown mode {mode!r}")
        dec._UNSTACK_CACHE.clear()

        def vanilla(seed):
            rng = (jax.random.PRNGKey(seed) if not args.greedy
                   else jax.random.PRNGKey(0))
            return jgen.generate(
                tp, tcfg, labels=labels, max_new_tokens=args.new_tokens,
                cfg_scale=args.cfg_scale, temperature=1.0,
                top_k=(0 if args.greedy else 2000),
                sample_logits=not args.greedy,
                rng=rng, cache_dtype=cache_dtype)

        t_van = timed(vanilla)
        mrow = {"vanilla_s": t_van,
                "vanilla_s_per_image": t_van / args.batch, "k": {}}
        print(f"{args.target} {mode}: vanilla {t_van:.3f} s "
              f"({t_van / args.batch:.3f} s/img)", flush=True)

        # round 5: the kv4 chunk-verify kernel exists (ops/flash_chunk.py
        # flash_chunk_attention_q4), so the spec arm now runs the SAME cache
        # config as its vanilla comparator in every mode. Both dtypes are
        # still recorded in the JSON.
        spec_cache = cache_dtype
        mrow["vanilla_cache"] = np.dtype(cache_dtype).name
        for k in [int(x) for x in args.k.split(",")]:
            stats_holder = {}

            def run_spec(seed):
                kw = dict(sample_kw)
                if not args.greedy:
                    kw["rng"] = jax.random.PRNGKey(seed)
                toks, st = spec.generate_spec(
                    tp, tcfg, dparams, dcfg, labels=labels,
                    max_new_tokens=args.new_tokens, k_draft=k,
                    cfg_scale=args.cfg_scale, cache_dtype=spec_cache,
                    draft_cache_dtype=jnp.bfloat16,
                    return_stats=True, **kw)
                stats_holder["acc"] = st["accepted_per_cycle"]
                return toks

            t_spec = timed(run_spec)
            acc = float(np.mean(jax.device_get(stats_holder["acc"])))
            mrow["k"][k] = {"spec_s": t_spec,
                            "spec_s_per_image": t_spec / args.batch,
                            "accepted_per_cycle": acc,
                            "alpha": acc / k,
                            "spec_cache": np.dtype(spec_cache).name,
                            "speedup_vs_vanilla": t_van / t_spec}
            print(f"  k={k}: {t_spec:.3f} s ({t_spec / args.batch:.3f} s/img), "
                  f"accept {acc:.2f}/{k} (alpha {acc / k:.2f}), "
                  f"{t_van / t_spec:.2f}x vs vanilla", flush=True)
        if mode != "bf16":
            del tp
        results["modes"][mode] = mrow

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=1)
    best = min((kk["spec_s"], m, k) for m, r in results["modes"].items()
               for k, kk in r["k"].items())
    print(json.dumps({"metric": "spec_decode_best_s",
                      "value": best[0], "mode": best[1], "k": best[2]}))


if __name__ == "__main__":
    main()
