"""Multi-host (DCN) training rehearsal on CPU loopback — VERDICT r1 item 8.

Proves the multi-process wiring end to end without a pod: the driver runs the
tiny control-training config single-process (2 CPU devices), then as TWO
jax processes (1 CPU device each, gloo collectives, loopback coordinator)
feeding per-process batch shards through `Trainer.put_batch`'s
`make_array_from_process_local_data` path, and asserts the per-step losses
match. This is the jax equivalent of the reference's env:// rendezvous
smoke (ref utils/distributed.py:20-47); on a real pod the same code path is
entered via `controlar_tpu.parallel.distributed.init()`.

Run: python scripts/rehearse_multihost.py            (driver; prints PASS)
     python scripts/rehearse_multihost.py worker ... (spawned internally)
"""
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 4
GLOBAL_BATCH = 8
COORD = "localhost:12361"


def build_tree(root: str):
    import numpy as np
    import jax

    # the rehearsal is a pure-CPU exercise; without this pin the tree build
    # runs on the default backend (axon TPU here) and a tunnel outage hangs
    # the whole driver before any worker spawns
    jax.config.update("jax_platforms", "cpu")

    from controlar_tpu.config import VQConfig
    from controlar_tpu.models import vq as jvq
    from controlar_tpu.data.extract import extract_tree

    class _FakeT5:
        def get_text_embeddings(self, texts):
            return (np.ones((len(texts), 7, 2048), np.float32),
                    np.ones((len(texts), 7), np.int64))

    vq_cfg = VQConfig(codebook_size=64, codebook_embed_dim=8, z_channels=16, ch=16)
    vq_params = jvq.init_vq_params(jax.random.PRNGKey(0), vq_cfg)
    rng = np.random.default_rng(0)
    samples = [
        {"image": rng.integers(0, 255, (64, 64, 3)).astype(np.uint8),
         "caption": f"s{i}"} for i in range(GLOBAL_BATCH)
    ]
    extract_tree(root, samples, vq_params, vq_cfg, t5_embedder=_FakeT5(),
                 image_size=64)


def run_training(tree: str, out_json: str, num_processes: int, process_id: int):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2 // num_processes)
    if num_processes > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(COORD, num_processes=num_processes,
                                   process_id=process_id)
    assert jax.device_count() == 2  # same global mesh in both runs

    from controlar_tpu.models.vit import ViTConfig
    from controlar_tpu.data.t2i_control import (
        T2IControlCodeDataset, T2IControlConfig)
    from controlar_tpu.data.loader import ShardedLoader
    from controlar_tpu.train.trainer import Trainer, TrainerConfig

    tcfg = TrainerConfig(
        gpt_model="GPT-B", model_type="t2i", image_size=64,
        condition_type="canny", epochs=STEPS, global_batch_size=GLOBAL_BATCH,
        results_dir=os.path.join(os.path.dirname(out_json),
                                 f"results_p{process_id}"),
        log_every=100, ckpt_every=10 ** 9,
        # dropout off: the 2-process loader interleaves the same global batch
        # in a different order, so only order-invariant losses compare equal
        dropout_p=0.0, class_dropout_prob=0.0,
        model_overrides=dict(dim=64, n_layer=3, n_head=2, vocab_size=64),
        adapter_override=ViTConfig(hidden_size=384, n_layer=1, n_head=2,
                                   patch_size=14, pos_grid=4, layerscale=True),
    )
    ds = T2IControlCodeDataset(T2IControlConfig(
        code_path=tree, condition_type="canny", image_size=64))
    loader = ShardedLoader(
        ds, batch_size=GLOBAL_BATCH // num_processes, num_workers=1,
        process_index=process_id, process_count=num_processes,
    )
    trainer = Trainer(tcfg)
    state = trainer.init_state()
    import jax.numpy as jnp  # noqa: F401

    rng = jax.random.PRNGKey(tcfg.seed + 1234)
    losses = []
    with jax.set_mesh(trainer.mesh):
        for epoch in range(STEPS):
            loader.set_epoch(epoch)
            for batch in loader:
                state, metrics = trainer.step_fn(
                    state, trainer.put_batch(batch), rng)
                losses.append(float(jax.device_get(metrics["loss"])))
            if len(losses) >= STEPS:
                break
    if process_id == 0:
        with open(out_json, "w") as f:
            json.dump(losses[:STEPS], f)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        run_training(sys.argv[2], sys.argv[3], int(sys.argv[4]), int(sys.argv[5]))
        return

    tmp = tempfile.mkdtemp(prefix="rehearse_")
    tree = os.path.join(tmp, "tree")
    build_tree(tree)

    def spawn(out, nproc, pid):
        return subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "worker", tree, out,
             str(nproc), str(pid)],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )

    single = os.path.join(tmp, "single.json")
    assert spawn(single, 1, 0).wait() == 0, "single-process run failed"

    multi = os.path.join(tmp, "multi.json")
    p0 = spawn(multi, 2, 0)
    p1 = spawn(os.path.join(tmp, "unused.json"), 2, 1)
    assert p0.wait() == 0 and p1.wait() == 0, "2-process run failed"

    ls = json.load(open(single))
    lm = json.load(open(multi))
    print("single-process losses:", [round(x, 6) for x in ls])
    print("2-process losses:     ", [round(x, 6) for x in lm])
    for a, b in zip(ls, lm):
        assert abs(a - b) / max(abs(a), 1e-9) < 2e-4, (a, b)
    print(f"PASS: {len(ls)} steps, 2-process CPU-loopback losses match "
          "single-process")


if __name__ == "__main__":
    main()
