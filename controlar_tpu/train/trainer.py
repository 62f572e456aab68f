"""Training driver: wires data, sharded step, logging, checkpointing.

One driver replaces the reference's 12 trainer scripts (ref
autoregressive/train/train_*.py — same skeleton each: dist init, exp dir,
model, optimizer, loader, autocast loss, clip, ckpt; SURVEY.md §2.6).
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding

from controlar_tpu.config import GPTConfig, gpt_config
from controlar_tpu.models import gpt as gpt_model
from controlar_tpu.models import vit as vit_model
from controlar_tpu.parallel.mesh import make_mesh
from controlar_tpu.parallel.sharding import batch_spec, control_train_specs
from controlar_tpu.train.optimizer import make_optimizer
from controlar_tpu.train.step import init_train_state
from controlar_tpu.train.control_step import make_control_train_step
from controlar_tpu import checkpoint as ckpt_lib


@dataclasses.dataclass
class TrainerConfig:
    # model
    gpt_model: str = "GPT-XL"
    model_type: str = "t2i"
    image_size: int = 512
    downsample_size: int = 16
    condition_type: str = "canny"
    adapter_size: str = "small"
    cls_token_num: int = 120
    vocab_size: int = 16384
    dropout_p: float = 0.1
    # optimization (ref trainer defaults)
    lr: float = 1e-4
    # StepLR: decay lr by lr_gamma every lr_decay_every steps (the seg trainer
    # uses gamma=0.9 per epoch; 0 disables — matches every other ref trainer)
    lr_gamma: float = 1.0
    lr_decay_every: int = 0
    weight_decay: float = 5e-2
    beta1: float = 0.9
    beta2: float = 0.95
    max_grad_norm: float = 1.0
    global_batch_size: int = 32
    epochs: int = 10
    ema: bool = False
    # backward rematerialization: "full" (recompute whole layers, min HBM),
    # "qkv" (also save rope'd q/k/v), "attn" (save the flash kernel's
    # out/lse residuals - backward never re-runs attention), "qkv_attn"
    # (both), "dots" (save matmul outputs), "none" (save everything)
    remat_policy: str = "full"
    # Adam moment storage: "float32" (exact) or "bfloat16" (halves optimizer
    # HBM; unlocks GPT-XL 512 training on one 16 GB chip — see
    # train/optimizer.with_state_dtype)
    opt_state_dtype: str = "float32"
    ema_decay: float = 0.9999
    class_dropout_prob: float = 0.1
    # mesh
    data_axis: int = -1
    fsdp_axis: int = 1
    tp_axis: int = 1
    # io
    results_dir: str = "results"
    ckpt_every: int = 10000
    log_every: int = 100
    # observability: capture a jax.profiler trace of steps
    # [profile_start_step, profile_start_step + profile_num_steps)
    profile_dir: Optional[str] = None
    profile_start_step: int = 10
    profile_num_steps: int = 5
    # experiment tracking: wandb when available + always a metrics.jsonl
    # (replaces the reference's wandb logging, ref train_c2i_fsdp.py:148-154)
    wandb_project: Optional[str] = None
    wandb_run_name: Optional[str] = None
    # auto-numbered experiment subdirs like the reference's
    # f"{results_dir}/{index:03d}-{model}" (ref train_c2i.py:70-84)
    auto_exp_dir: bool = False
    gpt_ckpt: Optional[str] = None       # init weights (LlamaGen base)
    resume_dir: Optional[str] = None
    seed: int = 0
    # test/custom hooks: override registry dims / adapter config
    model_overrides: Optional[Dict[str, Any]] = None
    adapter_override: Optional[Any] = None

    def build_gpt_config(self) -> GPTConfig:
        block = (self.image_size // self.downsample_size) ** 2
        kw = dict(
            model_type=self.model_type,
            block_size=block,
            cls_token_num=self.cls_token_num,
            vocab_size=self.vocab_size,
            condition_type=self.condition_type,
            adapter_size=self.adapter_size,
            class_dropout_prob=self.class_dropout_prob,
            token_dropout_p=self.dropout_p,
            resid_dropout_p=self.dropout_p,
            ffn_dropout_p=self.dropout_p,
        )
        kw.update(self.model_overrides or {})
        return gpt_config(self.gpt_model, **kw)

    def build_adapter_config(self) -> vit_model.ViTConfig:
        if self.adapter_override is not None:
            return self.adapter_override
        return (
            vit_model.DINOV2_SMALL if self.adapter_size == "small"
            else vit_model.DINOV2_BASE
        )


def next_experiment_dir(root: str, name: str) -> str:
    """results/000-GPT-XL, results/001-GPT-XL, ... (ref train_c2i.py:70-84)."""
    os.makedirs(root, exist_ok=True)
    taken = [
        int(d.split("-")[0]) for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d)) and d.split("-")[0].isdigit()
    ]
    idx = max(taken, default=-1) + 1
    return os.path.join(root, f"{idx:03d}-{name}")


class Trainer:
    def __init__(self, cfg: TrainerConfig, frozen: Optional[Dict[str, Any]] = None):
        self.cfg = cfg
        self.gpt_cfg = cfg.build_gpt_config()
        self.adapter_cfg = cfg.build_adapter_config()
        self.mesh = make_mesh(data=cfg.data_axis, fsdp=cfg.fsdp_axis, tp=cfg.tp_axis)
        from controlar_tpu.train.optimizer import step_lr

        schedule = None
        if cfg.lr_decay_every > 0 and cfg.lr_gamma != 1.0:
            schedule = step_lr(cfg.lr, cfg.lr_decay_every, cfg.lr_gamma)
        self.tx = make_optimizer(
            lr=cfg.lr, weight_decay=cfg.weight_decay, beta1=cfg.beta1,
            beta2=cfg.beta2, max_grad_norm=cfg.max_grad_norm,
            lr_schedule=schedule, state_dtype=cfg.opt_state_dtype,
        )
        self.step_fn = jax.jit(
            make_control_train_step(
                self.gpt_cfg, self.adapter_cfg, self.tx, cfg.condition_type,
                frozen=frozen, ema_decay=cfg.ema_decay if cfg.ema else None,
                remat_policy=cfg.remat_policy,
            ),
            donate_argnums=0,
        )
        self.bspec = NamedSharding(self.mesh, batch_spec())
        if cfg.auto_exp_dir:
            cfg.results_dir = next_experiment_dir(
                cfg.results_dir, cfg.gpt_model.replace("/", "-")
            )
        os.makedirs(cfg.results_dir, exist_ok=True)
        self._log_file = open(os.path.join(cfg.results_dir, "log.txt"), "a")
        self._metrics_file = open(
            os.path.join(cfg.results_dir, "metrics.jsonl"), "a"
        )
        self._wandb = None
        if cfg.wandb_project and jax.process_index() == 0:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=cfg.wandb_project, name=cfg.wandb_run_name,
                    config=dataclasses.asdict(cfg), resume="allow",
                )
            except ImportError:
                self.log("[warn] wandb_project set but wandb is not installed")

    def log(self, msg: str):
        if jax.process_index() == 0:
            print(msg, flush=True)
            self._log_file.write(msg + "\n")
            self._log_file.flush()

    def log_metrics(self, step: int, record: Dict[str, Any]):
        """Structured metrics: one JSON line per log window (always) and a
        wandb point when configured — rank 0 only."""
        if jax.process_index() != 0:
            return
        import json

        self._metrics_file.write(json.dumps({"step": step, **record}) + "\n")
        self._metrics_file.flush()
        if self._wandb is not None:
            self._wandb.log(record, step=step)

    def init_state(self):
        cfg = self.cfg
        rng = jax.random.PRNGKey(cfg.seed)
        with jax.set_mesh(self.mesh):
            gpt_params = gpt_model.init_gpt_params(rng, self.gpt_cfg)
            if cfg.gpt_ckpt:
                loaded = ckpt_lib.load_gpt_checkpoint(cfg.gpt_ckpt, self.gpt_cfg)
                gpt_params = jax.tree.map(
                    lambda cur, new: jnp.asarray(np.asarray(new), cur.dtype),
                    gpt_params, loaded,
                )
            params = {
                "gpt": gpt_params,
                "adapter": vit_model.init_vit_params(
                    jax.random.fold_in(rng, 1), self.adapter_cfg
                ),
            }
            specs = control_train_specs(params, self.gpt_cfg)
            params = jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s)),
                params, specs,
            )
            state = init_train_state(rng, self.gpt_cfg, self.tx, params=params,
                                     use_ema=cfg.ema)
        if cfg.resume_dir:
            latest = ckpt_lib.latest_checkpoint(cfg.resume_dir)
            if latest:
                abstract = jax.tree.map(
                    lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
                    state,
                )
                state = ckpt_lib.restore_train_state(latest, abstract)
                self.log(f"resumed from {latest} at step {int(state.step)}")
        return state

    def put_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
        """Host batch shard -> global device array. Single-process device_put
        places onto the mesh; multi-host assembles each process's LOCAL shard
        into the global array (the jax equivalent of the reference's
        DistributedSampler + per-rank batches, ref utils/distributed.py)."""
        if jax.process_count() > 1:
            def put(v):
                v = np.asarray(v)
                global_shape = (v.shape[0] * jax.process_count(), *v.shape[1:])
                return jax.make_array_from_process_local_data(
                    self.bspec, v, global_shape
                )
        else:
            def put(v):
                return jax.device_put(v, self.bspec)

        return {
            k: put(v) for k, v in batch.items() if not isinstance(v, list)
        }

    def fit(self, loader, state=None, max_steps: Optional[int] = None):
        cfg = self.cfg
        state = state if state is not None else self.init_state()
        rng = jax.random.PRNGKey(cfg.seed + 1234)
        t0 = time.time()
        running = []
        n_chips = jax.device_count()
        first_step_done = False
        profiling = False
        with jax.set_mesh(self.mesh):
            for epoch in range(cfg.epochs):
                loader.set_epoch(epoch)
                for batch in loader:
                    state, metrics = self.step_fn(state, self.put_batch(batch), rng)
                    running.append(metrics)
                    step = int(state.step)
                    if not first_step_done:
                        # first step = trace + compile; keep it out of the
                        # throughput window (SURVEY §5: first-class img/s/chip)
                        jax.device_get(metrics["loss"])  # device_get: real barrier (axon block_until_ready is unreliable)
                        self.log(f"compile+step0 took {time.time() - t0:.1f}s")
                        first_step_done = True
                        running, t0 = [], time.time()
                    if cfg.profile_dir and jax.process_index() == 0:
                        if step == cfg.profile_start_step and not profiling:
                            jax.profiler.start_trace(cfg.profile_dir)
                            profiling = True
                        elif profiling and step >= (
                            cfg.profile_start_step + cfg.profile_num_steps
                        ):
                            jax.device_get(metrics["loss"])  # device_get: real barrier (axon block_until_ready is unreliable)
                            jax.profiler.stop_trace()
                            profiling = False
                            self.log(f"profile trace written to {cfg.profile_dir}")
                    if step % cfg.log_every == 0 and running:
                        losses = np.mean([float(m["loss"]) for m in running])
                        dt = time.time() - t0
                        sps = len(running) / dt
                        ips_chip = sps * cfg.global_batch_size / n_chips
                        self.log(
                            f"step={step:07d} epoch={epoch} loss={losses:.4f} "
                            f"steps/sec={sps:.2f} imgs/sec/chip={ips_chip:.2f}"
                        )
                        self.log_metrics(step, {
                            "epoch": epoch, "loss": float(losses),
                            "steps_per_sec": round(sps, 4),
                            "imgs_per_sec_chip": round(ips_chip, 4),
                        })
                        running, t0 = [], time.time()
                    if step % cfg.ckpt_every == 0:
                        # saving sharded arrays is a collective — ALL processes
                        # must call save (orbax routes writes to the primary
                        # host internally); only the log line is rank-gated
                        path = ckpt_lib.save_train_state(
                            os.path.join(cfg.results_dir, "checkpoints"), state
                        )
                        self.log(f"saved {path}")
                    if max_steps is not None and step >= max_steps:
                        if profiling:
                            jax.profiler.stop_trace()
                        return state
        if profiling:
            jax.profiler.stop_trace()
        return state
