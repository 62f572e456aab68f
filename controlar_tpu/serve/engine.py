"""Continuous-batching serving engine over fixed-shape jitted steps.

TPU-native replacement for the reference's vLLM 0.4.1 fork (ref
autoregressive/serve/: LLMEngine/Scheduler/Worker/ModelRunner/CUDA graphs,
SURVEY.md §2.8). Image generation has fixed-length sequences, so instead of
paged KV blocks there is a static slab per slot; instead of CUDA graphs there
is one compiled decode-quantum program; instead of a worker/IPC control plane
the scheduler is in-process and the device state never leaves HBM.

Layout: `max_slots` requests ride a 2*max_slots batch (rows [0, slots) carry
the conditional branch, rows [slots, 2*slots) the unconditional branch —
CFG pairing inside the engine mirrors the reference sampler's split/mix +
token mirroring, ref serve/sampler.py:54-58,106-108). Each slot advances at
its own position (per-slot pos vector through decode_step_multi / the flash
kernel's per-slot prefetch). Admission runs a batch-2 prefill and scatters
the slot's cache rows; a decode "quantum" of N steps runs as one device
program before the host syncs, collects finished sequences, and refills.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from controlar_tpu.config import GPTConfig, find_multiple
from controlar_tpu import decode as dec
from controlar_tpu.models import gpt as gpt_model
from controlar_tpu.ops.sampling import top_k_top_p_filter


@dataclasses.dataclass
class Request:
    request_id: int
    label: Optional[int] = None                      # c2i
    caption_emb: Optional[np.ndarray] = None         # t2i (T_cls, caption_dim)
    emb_mask: Optional[np.ndarray] = None            # t2i (T_cls,) left-pad mask
    adapter_features: Optional[np.ndarray] = None    # (block, adapter_dim)
    cfg_scale: float = 4.0
    control_strength: float = 1.0
    seed: int = 0
    # filled by the engine
    tokens: Optional[np.ndarray] = None


@dataclasses.dataclass
class ServeConfig:
    max_slots: int = 8
    quantum: int = 64           # decode steps per device program
    temperature: float = 1.0
    top_k: int = 2000
    top_p: float = 1.0
    greedy: bool = False
    cache_dtype: Any = jnp.bfloat16
    use_flash: Optional[bool] = None


class ServeEngine:
    def __init__(self, params, cfg: GPTConfig,
                 serve_cfg: Optional[ServeConfig] = None):
        self.params = dec.unstack_layers(params)
        self.cfg = cfg
        # copy: never mutate a caller's (or a shared default) config
        serve_cfg = dataclasses.replace(serve_cfg or ServeConfig())
        self.scfg = serve_cfg
        if serve_cfg.use_flash is None:
            serve_cfg.use_flash = jax.default_backend() == "tpu"
        n = serve_cfg.max_slots
        s_align = 256 if serve_cfg.use_flash else 8
        self.s_max = find_multiple(cfg.cls_token_num + cfg.block_size, s_align)
        self.caches = dec.init_flat_caches(cfg, 2 * n, self.s_max, serve_cfg.cache_dtype)
        d = cfg.dim
        self.fused = jnp.zeros((3, 2 * n, cfg.block_size, d), jnp.bfloat16)
        self.pos = jnp.zeros((2 * n,), jnp.int32)
        self.cur_tok = jnp.zeros((2 * n,), jnp.int32)
        self.col_mask = jnp.ones((2 * n, self.s_max), bool)
        self.cfg_scales = jnp.ones((n,), jnp.float32)
        self.strengths = jnp.ones((n,), jnp.float32)
        self.seeds = jnp.zeros((n,), jnp.uint32)
        self.active = np.zeros((n,), bool)
        self.emitted = np.zeros((n,), np.int64)
        self.slot_req: List[Optional[Request]] = [None] * n
        self.outputs: Dict[int, List[int]] = {}
        self.waiting: "queue.deque[Request]" = __import__("collections").deque()
        self.finished: List[Request] = []

    # ------------------------------------------------------------------
    def add_request(self, req: Request):
        self.waiting.append(req)

    def has_unfinished(self) -> bool:
        return bool(self.waiting) or self.active.any()

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnames=("self",), donate_argnums=(1, 2))
    def _admit_jit(self, caches, fused, prefix_emb, fused3_req, rows, col_mask_req):
        """Prefill one request (batch 2: cond/uncond) and scatter its slot."""
        small = dec.init_flat_caches(
            self.cfg, 2, self.s_max, self.scfg.cache_dtype
        )
        logits, small = dec.prefill_flat(
            self.params, self.cfg, small, prefix_emb, fused3_req, col_mask_req
        )
        kvs = tuple(
            kv.at[rows].set(skv) for kv, skv in zip(caches, small)
        )
        fused = fused.at[:, rows].set(fused3_req.astype(fused.dtype))
        return logits, kvs, fused

    def _admit(self, req: Request, slot: int):
        cfg = self.cfg
        n = self.scfg.max_slots
        if cfg.model_type == "c2i":
            labels = jnp.asarray([req.label, cfg.num_classes])
            prefix = gpt_model.embed_prefix_c2i(self.params, labels)
        else:
            cap = jnp.asarray(req.caption_emb)[None]
            uncond = self.params["cls_embedding"]["uncond_embedding"][None]
            cap = jnp.concatenate([cap, uncond.astype(cap.dtype)], axis=0)
            prefix = gpt_model.embed_prefix_t2i(self.params, cap)[:, : cfg.cls_token_num]

        if req.adapter_features is not None:
            ct = gpt_model.mlp_gelu(
                self.params["adapter_mlp"], jnp.asarray(req.adapter_features)[None]
            )
            ct = jnp.concatenate([ct, jnp.zeros_like(ct)], axis=0)
            ct = gpt_model.mlp_gelu(self.params["condition_mlp"], ct)
            fused3_req = gpt_model.fusion_projections(self.params, ct)
        else:
            fused3_req = jnp.zeros((3, 2, cfg.block_size, cfg.dim))

        rows = jnp.asarray([slot, slot + n])
        if req.emb_mask is not None:
            cm = jnp.asarray(req.emb_mask, bool)[None]
            col_mask_req = jnp.concatenate([cm, cm], axis=0)  # (2, T_cls)
        else:
            col_mask_req = None
        logits, self.caches, self.fused = self._admit_jit(
            self.caches, self.fused, prefix.astype(jnp.bfloat16), fused3_req, rows,
            col_mask_req,
        )
        full = jnp.ones((self.s_max,), bool)
        if req.emb_mask is not None:
            full = full.at[: self.cfg.cls_token_num].set(
                jnp.asarray(req.emb_mask, bool)
            )
        self.col_mask = self.col_mask.at[rows].set(full)
        mixed = self._mix_host(logits, req.cfg_scale)
        tok = self._sample_host(mixed, req.seed, 0)
        t_cls = cfg.cls_token_num
        self.pos = self.pos.at[rows].set(t_cls)
        self.cur_tok = self.cur_tok.at[rows].set(tok)
        self.cfg_scales = self.cfg_scales.at[slot].set(req.cfg_scale)
        self.strengths = self.strengths.at[slot].set(req.control_strength)
        self.seeds = self.seeds.at[slot].set(np.uint32(req.seed))
        self.active[slot] = True
        self.emitted[slot] = 1
        self.slot_req[slot] = req
        self.outputs[req.request_id] = [int(tok)]

    def _mix_host(self, logits, scale):
        cond, uncond = logits[0], logits[1]
        return (uncond + (cond - uncond) * scale)[None]

    def _sample_host(self, logits, seed, step):
        scfg = self.scfg
        logits = logits.astype(jnp.float32) / max(scfg.temperature, 1e-5)
        if scfg.top_k > 0 or scfg.top_p < 1.0:
            logits = top_k_top_p_filter(logits, scfg.top_k, scfg.top_p)
        if scfg.greedy:
            return jnp.argmax(logits, axis=-1)[0].astype(jnp.int32)
        rng = jax.random.fold_in(jax.random.PRNGKey(seed), step)
        return jax.random.categorical(rng, logits, axis=-1)[0].astype(jnp.int32)

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnames=("self", "n_steps"), donate_argnums=(2,))
    def _quantum_jit(self, n_steps, caches, fused, pos, cur_tok, cfg_scales,
                     strengths, active, seeds, col_mask):
        """Run n_steps lockstep decode steps with per-slot positions.

        Sampling is reproducible per request: token k of a slot is drawn with
        fold_in(PRNGKey(request.seed), k) regardless of engine scheduling
        state (the admit-time prefill token is k=0 via the same derivation)."""
        cfg = self.cfg
        n = self.scfg.max_slots

        def step(carry, i):
            caches, pos, cur = carry
            logits, caches = dec.decode_step_multi(
                self.params, cfg, caches, cur, pos, fused,
                control_strength=jnp.concatenate([strengths, strengths])[:, None, None],
                use_flash=self.scfg.use_flash,
                col_mask_full=col_mask,
            )
            cond, uncond = jnp.split(logits, 2, axis=0)
            mixed = uncond + (cond - uncond) * cfg_scales[:, None]
            lg = mixed.astype(jnp.float32) / max(self.scfg.temperature, 1e-5)
            if self.scfg.top_k > 0 or self.scfg.top_p < 1.0:
                lg = top_k_top_p_filter(lg, self.scfg.top_k, self.scfg.top_p)
            if self.scfg.greedy:
                nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            else:
                # index of the token being sampled for each slot (prefill = 0)
                tok_idx = pos[:n] - cfg.cls_token_num + 1
                keys = jax.vmap(
                    lambda s, c: jax.random.fold_in(jax.random.PRNGKey(s), c)
                )(seeds, tok_idx)
                nxt = jax.vmap(jax.random.categorical)(keys, lg).astype(jnp.int32)
            nxt2 = jnp.concatenate([nxt, nxt])
            # only active slots advance
            pos = jnp.where(active, pos + 1, pos)
            cur = jnp.where(active, nxt2, cur)
            return (caches, pos, cur), nxt

        (caches, pos, cur), toks = jax.lax.scan(
            step, (caches, pos, cur_tok), jnp.arange(n_steps)
        )
        return caches, pos, cur, toks  # toks: (n_steps, slots)

    def step(self):
        """One scheduler iteration: admit -> decode quantum -> collect."""
        n = self.scfg.max_slots
        # admit
        for slot in range(n):
            if not self.active[slot] and self.waiting:
                self._admit(self.waiting.popleft(), slot)
        if not self.active.any():
            return
        # bound the quantum by the smallest remaining budget among active slots
        remaining = np.array(
            [self.cfg.block_size - self.emitted[s] if self.active[s] else 1 << 30
             for s in range(n)]
        )
        q = int(min(self.scfg.quantum, remaining.min()))
        active2 = jnp.asarray(np.concatenate([self.active, self.active]))
        self.caches, self.pos, self.cur_tok, toks = self._quantum_jit(
            q, self.caches, self.fused, self.pos, self.cur_tok,
            self.cfg_scales, self.strengths, active2, self.seeds, self.col_mask,
        )
        toks = jax.device_get(toks)  # (q, slots)
        for s in range(n):
            if not self.active[s]:
                continue
            req = self.slot_req[s]
            take = min(q, self.cfg.block_size - self.emitted[s])
            self.outputs[req.request_id].extend(int(t) for t in toks[:take, s])
            self.emitted[s] += take
            if self.emitted[s] >= self.cfg.block_size:
                req.tokens = np.asarray(self.outputs.pop(req.request_id), np.int32)
                self.finished.append(req)
                self.active[s] = False
                self.slot_req[s] = None

    def run(self, requests: List[Request]) -> List[Request]:
        """Offline batch entry (ref LLM.generate, serve/llm.py:138-219)."""
        for r in requests:
            self.add_request(r)
        while self.has_unfinished():
            self.step()
        done, self.finished = self.finished, []
        return sorted(done, key=lambda r: r.request_id)
