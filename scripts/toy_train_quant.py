"""Train a model to convergence on-chip (synthetic c2i data), then measure
quantization agreement + spec-decode acceptance on the TRAINED weights.

Why: random-weight logits are near-uniform, so teacher-forced token agreement
under quantization is a worst-case systems bound (VERDICT r3 weak #1:
0.41 GPT-B / 0.05 GPT-XL). A converged model has confident logits; its
agreement is the number that belongs next to the W4 2x headline until the
released zoo is available (verify-zoo --quant-report stays the ship gate).

Task: 16 classes, each with a deterministic pseudo-random token sequence;
10% uniform token noise. Optimal CE ~= 0.1*ln(V) + H(0.1) ~ 1.3; a model
that nails it emits ~0.9-confident tokens — a realistic sharpness regime.

Run: python scripts/toy_train_quant.py [--size GPT-B] [--steps 800]
     [--batch 16] [--optimizer adamw|adafactor] [--param-dtype float32]
     [--ckpt-out /tmp/toy_gptb] [--quant-modes int8,int8+kv8,w4,w4+kv8,w4+kv4]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")


def toy_tokens(rng, labels, block_size, vocab_size, noise=0.1):
    """Deterministic per-class sequence + uniform noise."""
    import numpy as np

    t = np.arange(block_size)[None, :]
    base = (labels[:, None] * 7919 + t * 104729 + labels[:, None] * t * 31) \
        % vocab_size
    noise_mask = rng.random(base.shape) < noise
    rand = rng.integers(0, vocab_size, base.shape)
    return np.where(noise_mask, rand, base).astype(np.int32)


CHAIN_STATES = 512  # deterministic-transition sub-vocab of the chain task


def toy_tokens_chain(rng, labels, block_size, vocab_size, noise=0.25):
    """Markov-chain task with genuinely mixed-entropy positions.

    t_i = f(t_{i-1} % 512, label) deterministically, except with prob
    `noise` the token is uniform over the FULL vocab (and the chain reseeds
    from it). A converged model emits ~(1-noise)-confident tokens on chain
    steps and a flat 16k-tail at every position — the near-tie regime where
    tiny quantization logit shifts flip samples (and sometimes argmax),
    unlike the `basic` task whose converged logits are uniformly sharp.
    """
    import numpy as np

    b = len(labels)
    toks = np.zeros((b, block_size), np.int64)
    prev = (labels.astype(np.int64) * 131) % CHAIN_STATES
    for t in range(block_size):
        det = (prev * 31 + labels * 97 + 7) % CHAIN_STATES
        noisy = rng.random(b) < noise
        rand = rng.integers(0, vocab_size, b)
        tok = np.where(noisy, rand, det)
        toks[:, t] = tok
        prev = tok % CHAIN_STATES
    return toks.astype(np.int32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="GPT-B")
    ap.add_argument("--block-size", type=int, default=256,
                    help="576 = the c2i 384px serving workload")
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--num-classes-used", type=int, default=16)
    ap.add_argument("--noise", type=float, default=0.1)
    ap.add_argument("--task", default="basic", choices=["basic", "chain"],
                    help="chain: Markov task with a flat 16k-vocab noise "
                         "tail at every position (mixed-entropy logits)")
    ap.add_argument("--mid-ckpt-frac", type=float, default=0.0,
                    help="also snapshot params at this fraction of training "
                         "(higher-entropy checkpoint) and report quant "
                         "agreement on it")
    ap.add_argument("--optimizer", default="adamw",
                    choices=["adamw", "adafactor"],
                    help="adafactor: near-zero optimizer state; lets GPT-3B "
                         "train single-chip for this calibration")
    ap.add_argument("--param-dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--opt-state-dtype", default="bfloat16")
    ap.add_argument("--ckpt-out", default=None)
    ap.add_argument("--quant-modes", default="int8,int8+kv8,w4,w4+kv8,w4+kv4")
    ap.add_argument("--max-new-tokens", type=int, default=256)
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--skip-quant", action="store_true")
    ap.add_argument("--load-ckpt", default=None,
                    help="skip training; run the quant report on this "
                         ".npz checkpoint (from a prior --ckpt-out)")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from controlar_tpu.config import gpt_config
    from controlar_tpu.models import gpt as gpt_model
    from controlar_tpu.train.optimizer import make_optimizer, with_state_dtype
    from controlar_tpu.train.step import init_train_state, make_train_step

    cfg = gpt_config(args.size, model_type="c2i", cls_token_num=1,
                     block_size=args.block_size, vocab_size=16384, num_classes=1000,
                     class_dropout_prob=0.1, token_dropout_p=0.0,
                     resid_dropout_p=0.0, ffn_dropout_p=0.0)

    if args.load_ckpt:
        from controlar_tpu.tools import import_params_npz

        params_bf16 = jax.tree.map(
            lambda x: jnp.asarray(x, jnp.bfloat16),
            import_params_npz(args.load_ckpt))
        losses, final_loss = [], None
    else:
        if args.optimizer == "adafactor":
            tx = optax.chain(optax.clip_by_global_norm(1.0),
                             optax.adafactor(learning_rate=args.lr))
        else:
            tx = make_optimizer(lr=args.lr, state_dtype=args.opt_state_dtype)

        rng = jax.random.PRNGKey(0)
        params = gpt_model.init_gpt_params(
            rng, cfg, dtype=jnp.dtype(args.param_dtype))
        state = init_train_state(rng, cfg, tx, params=params)
        step = jax.jit(make_train_step(cfg, tx), donate_argnums=0)

        task_fn = toy_tokens_chain if args.task == "chain" else toy_tokens
        mid_step = (int(args.steps * args.mid_ckpt_frac)
                    if args.mid_ckpt_frac > 0 else -1)
        nprng = np.random.default_rng(0)
        t0 = time.perf_counter()
        losses = []
        for i in range(args.steps):
            labels = nprng.integers(0, args.num_classes_used, args.batch)
            batch = {
                "labels": labels.astype(np.int32),
                "tokens": task_fn(nprng, labels, cfg.block_size,
                                  cfg.vocab_size, args.noise),
            }
            state, m = step(state, batch, jax.random.PRNGKey(1))
            if i == mid_step:
                # host snapshot (no extra HBM) of the higher-entropy model
                mid_params = jax.device_get(
                    jax.tree.map(lambda p: jnp.asarray(p, jnp.bfloat16),
                                 state.params))
                print(f"step {i}: mid-training snapshot taken", flush=True)
            if i % 50 == 0 or i == args.steps - 1:
                l = float(jax.device_get(m["loss"]))
                losses.append(l)
                print(f"step {i}: loss {l:.4f} "
                      f"({time.perf_counter() - t0:.0f}s)", flush=True)
        final_loss = losses[-1]

        params_bf16 = jax.tree.map(
            lambda p: jnp.asarray(p, jnp.bfloat16), state.params)
        del state

    if args.ckpt_out:
        from controlar_tpu.tools import export_params_npz

        os.makedirs(os.path.dirname(args.ckpt_out) or ".", exist_ok=True)
        export_params_npz(jax.device_get(params_bf16), args.ckpt_out)
        print(f"saved trained params to {args.ckpt_out}", flush=True)

    out = {"size": args.size, "steps": args.steps, "final_loss": final_loss,
           "optimizer": args.optimizer, "task": args.task,
           "noise": args.noise, "losses": losses}
    if not args.skip_quant:
        from controlar_tpu import decode as dec
        from controlar_tpu.eval.quant_report import (
            format_report, measure_quant_agreement)

        # rebind to the unstacked layout: drops the stacked tree so the
        # report never holds stacked + unstacked + quantized at once
        params_bf16 = dec.unstack_layers(params_bf16)
        report = measure_quant_agreement(
            params_bf16, cfg, modes=tuple(args.quant_modes.split(",")),
            max_new_tokens=args.max_new_tokens)
        print(format_report(report))
        out["quant_report"] = report

        if args.mid_ckpt_frac > 0 and not args.load_ckpt:
            del params_bf16
            dec._UNSTACK_CACHE.clear()
            if args.ckpt_out:
                from controlar_tpu.tools import export_params_npz

                export_params_npz(mid_params, args.ckpt_out + "_mid")
            mid_tree = dec.unstack_layers(
                jax.tree.map(jnp.asarray, mid_params))
            mid_report = measure_quant_agreement(
                mid_tree, cfg, modes=tuple(args.quant_modes.split(",")),
                max_new_tokens=args.max_new_tokens)
            print(f"mid-training ckpt (step {mid_step}):")
            print(format_report(mid_report))
            out["quant_report_mid"] = mid_report
            out["mid_step"] = mid_step

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "quant_report"}))


if __name__ == "__main__":
    main()
