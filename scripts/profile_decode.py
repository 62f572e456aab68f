"""Decode-step cost decomposition on the real chip (GPT-3B int8 serving path).

Separates per-step cost into weight streaming (empty cache), KV reads (full
cache delta), and sampling, plus a raw W8A16 matmul stream-rate probe.
Run: python scripts/profile_decode.py [--size GPT-3B] [--steps 64]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")


def timeit(fn, n=3):
    import jax

    fn()  # compile + warm
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        jax.device_get(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="GPT-3B")
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)  # 8 + CFG
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_serve_cache")

    from controlar_tpu.config import gpt_config
    from controlar_tpu.models import gpt as jgpt
    from controlar_tpu import decode as dec, quant

    cfg = gpt_config(args.size, model_type="c2i", cls_token_num=1,
                     block_size=576, vocab_size=16384, num_classes=1000)
    params = jgpt.init_gpt_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    qp = dec.unstack_layers(quant.quantize_gpt_params(params))
    nbytes = sum(x.nbytes for x in jax.tree.leaves(qp))
    del params
    b, s_max, steps = args.batch, 640, args.steps

    def make_steps(pos0):
        @jax.jit
        def run(qp, tok):
            # caches created in-graph: the Pallas RMW append aliases its
            # input buffer, so host-held cache arrays must not be reused
            caches = dec.init_flat_caches(cfg, b, s_max, jnp.int8)
            def body(carry, i):
                caches, tok = carry
                logits, caches = dec.decode_step_flat(
                    qp, cfg, caches, tok, pos0 + i, None, None, use_flash=True)
                return (caches, jnp.argmax(logits, -1).astype(jnp.int32)), ()
            (caches, tok), _ = jax.lax.scan(
                body, (caches, tok), jnp.arange(steps))
            return tok
        return run

    tok = jnp.zeros((b,), jnp.int32)

    t_empty = timeit(lambda: make_steps(1)(qp, tok)) / steps
    print(f"{args.size} int8 b={b}: step(empty cache) {t_empty*1e3:.3f} ms", flush=True)
    t_full = timeit(lambda: make_steps(s_max - steps - 1)(qp, tok)) / steps
    print(f"  step(full cache) {t_full*1e3:.3f} ms, kv delta {(t_full-t_empty)*1e3:.3f} ms", flush=True)
    print(f"  weight bytes {nbytes/1e9:.3f} GB -> empty-cache stream "
          f"{nbytes/t_empty/1e12:.3f} TB/s")

    # sampling cost (top-k 2000 over 16384), CFG mix included
    from controlar_tpu.ops.sampling import top_k_top_p_filter

    logits = jax.random.normal(jax.random.PRNGKey(1), (b, 16384), jnp.float32)

    @jax.jit
    def sample_scan(logits, rng):
        def body(r, i):
            cond, uncond = jnp.split(logits, 2, axis=0)
            mixed = uncond + (cond - uncond) * 4.0
            f = top_k_top_p_filter(mixed, top_k=2000, top_p=1.0)
            t = jax.random.categorical(jax.random.fold_in(r, i), f, axis=-1)
            return r, t
        _, ts = jax.lax.scan(body, rng, jnp.arange(steps))
        return ts

    t_sample = timeit(lambda: sample_scan(logits, jax.random.PRNGKey(2))) / steps
    print(f"  sampling (cfg-mix + top-k 2000): {t_sample*1e3:.3f} ms/step")

    # raw W8A16 stream probe: the 3 FFN mats of one layer, all layers
    ffn = [qp["layers"][l][k] for l in range(cfg.n_layer)
           for k in ("w1", "w3", "w2")]
    hidden = ffn[0]["q"].shape[1]
    x_d = jax.random.normal(jax.random.PRNGKey(3), (b, cfg.dim), jnp.bfloat16)
    x_h = jax.random.normal(jax.random.PRNGKey(4), (b, hidden), jnp.bfloat16)

    @jax.jit
    def stream_all(x_d, x_h, ws):
        acc = jnp.zeros((b,), jnp.float32)
        for w in ws:
            y = quant.wdot(x_d if w["q"].shape[0] == cfg.dim else x_h, w)
            acc = acc + y.astype(jnp.float32).sum(-1)
        return acc

    t_stream = timeit(lambda: stream_all(x_d, x_h, ffn))
    fbytes = sum(w["q"].nbytes + w["s"].nbytes for w in ffn)
    print(f"  FFN-only stream: {fbytes/1e9:.3f} GB in {t_stream*1e3:.2f} ms = "
          f"{fbytes/t_stream/1e12:.3f} TB/s")


if __name__ == "__main__":
    main()
