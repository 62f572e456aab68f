"""Control-training throughput on one v5e: GPT-B + DINOv2-small adapter,
t2i canny config at 256px (256 tokens), measured as imgs/sec/chip.

The reference reports no training throughput numbers; this records ours so
regressions are visible. Run: python scripts/bench_train.py [--size GPT-B]
[--batch 16] [--steps 20]"""
import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="GPT-B")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--remat", default="full",
                    help="full | dots | none (comma list sweeps)")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from controlar_tpu.train.trainer import Trainer, TrainerConfig

    results = {}
    for remat in args.remat.split(","):
        results[remat] = _run(args, remat)
    if len(results) > 1:
        print("remat sweep:", {k: f"{v:.1f} ms/step" for k, v in results.items()})


def _run(args, remat):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from controlar_tpu.train.trainer import Trainer, TrainerConfig

    tcfg = TrainerConfig(
        gpt_model=args.size, model_type="t2i", image_size=args.image_size,
        condition_type="canny", global_batch_size=args.batch,
        results_dir="/tmp/bench_train", remat_policy=remat,
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
        state, m = trainer.step_fn(state, db, rng)
        jax.device_get(m["loss"])
        print(f"compile+step0: {time.perf_counter() - t0:.1f} s", flush=True)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, m = trainer.step_fn(state, db, rng)
        jax.device_get(m["loss"])
        dt = (time.perf_counter() - t0) / args.steps
    n_chips = jax.device_count()
    print(f"{args.size} {args.image_size}px batch {args.batch} "
          f"remat={remat}: {dt * 1e3:.1f} ms/step = "
          f"{args.batch / dt / n_chips:.1f} imgs/sec/chip "
          f"({n_chips} chip(s))", flush=True)
    return dt * 1e3


if __name__ == "__main__":
    main()
