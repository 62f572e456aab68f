"""Control-training throughput + MFU on one v5e.

The reference reports no training throughput numbers (its 12 trainer scripts
log loss only); this records ours so regressions are visible, and reports MFU
so the number is comparable across chips.

MFU convention (PaLM appendix B): model FLOPs only — rematerialized forward
passes are NOT counted, so remat_policy=full trades reported MFU for memory.
Per step:  B * sum_net( 6 * N_matmul * T_net  +  12 * L * T_net^2 * d )
with N_matmul = params of ndim>=2 (embeddings count: under meshes ours are
one-hot matmuls), for both the GPT and the trained DINOv2 adapter at their
own sequence lengths.

Run: python scripts/bench_train.py [--size GPT-XL] [--image-size 512]
     [--batch 8] [--remat full] [--opt-state-dtype bfloat16]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")

# bf16 peak matmul throughput per chip
_PEAK_TFLOPS = {
    "TPU v5 lite": 197.0,  # v5e
    "TPU v5": 459.0,       # v5p
    "TPU v4": 275.0,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="GPT-B")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--remat", default="full",
                    help="full | dots | none (comma list sweeps)")
    ap.add_argument("--opt-state-dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--peak-tflops", type=float, default=None,
                    help="override chip peak bf16 TFLOPs for MFU")
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--profile-dir", default=None,
                    help="capture a jax.profiler trace of 3 post-warmup "
                         "steps (feed to scripts/analyze_trace.py)")
    args = ap.parse_args()

    results = {}
    for remat in args.remat.split(","):
        results[remat] = _run(args, remat.strip())
    if len(results) > 1:
        print("remat sweep:", {k: f"{v['ms_per_step']:.1f} ms/step"
                               for k, v in results.items()})
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=2)


def _matmul_params(tree):
    import jax
    return sum(x.size for x in jax.tree.leaves(tree) if x.ndim >= 2)


def _model_flops_per_step(trainer, batch_size):
    """PaLM-convention model FLOPs for one fwd+bwd step (no remat recount)."""
    gcfg = trainer.gpt_cfg
    acfg = trainer.adapter_cfg
    import jax
    import numpy as np
    from controlar_tpu.models import gpt as gpt_model
    from controlar_tpu.models import vit as vit_model

    # count matmul params from throwaway init trees
    gp = gpt_model.init_gpt_params(jax.random.PRNGKey(0), gcfg)
    ap_ = vit_model.init_vit_params(jax.random.PRNGKey(1), acfg)
    n_gpt = _matmul_params(gp)
    n_ad = _matmul_params(ap_)
    del gp, ap_

    t_gpt = gcfg.cls_token_num + gcfg.block_size - 1
    # adapter runs on the patch-14 resize of the condition image
    side = int(round(trainer.cfg.image_size / 14)) * 14
    t_ad = (side // acfg.patch_size) ** 2 + 1

    f_gpt = 6 * n_gpt * t_gpt + 12 * gcfg.n_layer * t_gpt ** 2 * gcfg.dim
    f_ad = 6 * n_ad * t_ad + 12 * acfg.n_layer * t_ad ** 2 * acfg.hidden_size
    return batch_size * (f_gpt + f_ad), dict(
        n_gpt=n_gpt, n_adapter=n_ad, t_gpt=t_gpt, t_adapter=t_ad)


def _run(args, remat):
    import numpy as np
    import jax

    from controlar_tpu.train.trainer import Trainer, TrainerConfig

    tcfg = TrainerConfig(
        gpt_model=args.size, model_type="t2i", image_size=args.image_size,
        condition_type="canny", global_batch_size=args.batch,
        results_dir="/tmp/bench_train", remat_policy=remat,
        opt_state_dtype=args.opt_state_dtype,
    )
    trainer = Trainer(tcfg)
    state = trainer.init_state()
    gcfg = trainer.gpt_cfg

    rng_np = np.random.default_rng(0)
    batch = {
        "tokens": rng_np.integers(0, gcfg.vocab_size,
                                  (args.batch, gcfg.block_size)).astype(np.int32),
        "caption_emb": rng_np.standard_normal(
            (args.batch, gcfg.cls_token_num, gcfg.caption_dim)
        ).astype(np.float32),
        "emb_mask": np.ones((args.batch, gcfg.cls_token_num), np.int32),
        "control_image": rng_np.integers(
            0, 255, (args.batch, args.image_size, args.image_size, 3)
        ).astype(np.uint8),
        "valid": np.ones((args.batch,), np.float32),
    }
    rng = jax.random.PRNGKey(0)
    with jax.set_mesh(trainer.mesh):
        db = trainer.put_batch(batch)
        t0 = time.perf_counter()
        # AOT: one compile, and XLA's static memory analysis for free
        # (device.memory_stats() is unavailable on this platform)
        compiled = trainer.step_fn.lower(state, db, rng).compile()
        print(f"compile: {time.perf_counter() - t0:.1f} s", flush=True)
        t0 = time.perf_counter()
        state, m = compiled(state, db, rng)
        jax.device_get(m["loss"])
        print(f"warmup step: {time.perf_counter() - t0:.1f} s", flush=True)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, m = compiled(state, db, rng)
        jax.device_get(m["loss"])
        dt = (time.perf_counter() - t0) / args.steps
        ma = compiled.memory_analysis()
        if args.profile_dir:
            with jax.profiler.trace(args.profile_dir):
                for _ in range(3):
                    state, m = compiled(state, db, rng)
                jax.device_get(m["loss"])

    n_chips = jax.device_count()
    dev = jax.local_devices()[0]
    peak_gb = 0.0
    if ma is not None:
        # arguments alias donated state; XLA's view of live HBM for one step
        peak_gb = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                   + ma.temp_size_in_bytes - ma.alias_size_in_bytes) / 2**30

    flops, detail = _model_flops_per_step(trainer, args.batch)
    peak_tf = args.peak_tflops or _PEAK_TFLOPS.get(dev.device_kind, 197.0)
    mfu = flops / dt / n_chips / (peak_tf * 1e12)

    print(f"{args.size} {args.image_size}px batch {args.batch} "
          f"remat={remat} opt_state={args.opt_state_dtype}: "
          f"{dt * 1e3:.1f} ms/step = {args.batch / dt / n_chips:.1f} imgs/sec/chip; "
          f"MFU {mfu * 100:.1f}% ({flops / 1e12:.2f} model TFLOP/step vs "
          f"{peak_tf:.0f} peak TFLOPs, {dev.device_kind}); "
          f"HBM live (XLA static: args+out+temp-alias) {peak_gb:.2f} GiB",
          flush=True)
    return dict(ms_per_step=dt * 1e3, imgs_per_sec_chip=args.batch / dt / n_chips,
                mfu=mfu, peak_hbm_gib=peak_gb, flops_per_step=flops, **detail)


if __name__ == "__main__":
    main()
