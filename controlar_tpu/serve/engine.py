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
kernel's per-slot prefetch).

Scheduling (one `step()`):
1. GROUP admission — every waiting request that has a free slot is prefilled
   in ONE device program (batch 2K cond/uncond), its first token sampled
   in-graph, and its slot state scattered in-graph. Groups are bucketed to
   powers of two (pad entries replicate request 0 onto slot 0: duplicate
   scatter indices with identical payloads are benign), so at most
   log2(max_slots)+1 admission programs ever compile.
2. A fixed-length decode quantum (ALWAYS `quantum` steps — one compiled
   program, ever). Completed slots freeze in-graph: the advance mask is
   `active & (pos < t_cls + block_size - 1)`; a frozen slot re-decodes its
   last token at its last position, rewriting identical KV bytes, and the
   host discards the surplus samples.
3. Host collects finished sequences and refills.

Sampling is reproducible per request: token k of a request is ALWAYS drawn
with fold_in(PRNGKey(request.seed), k), independent of scheduling state
(admission samples k=0 through the same derivation, in-graph).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, List, Optional, Sequence

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
    t_submit: Optional[float] = None   # set by add_request
    t_done: Optional[float] = None     # set when the last token is emitted


@dataclasses.dataclass
class ServeConfig:
    max_slots: int = 8
    quantum: int = 64           # decode steps per device program (fixed)
    # early quantum exit: compile a small set of shorter quantum programs and
    # pick the smallest one covering the earliest-finishing slot, so a
    # finished slot stops burning full-model steps for up to quantum-1 steps
    # (the frozen-slot tail waste). None = single fixed quantum.
    quantum_buckets: Optional[tuple] = None
    # quantum selection among the buckets:
    #   "early_exit": smallest bucket covering the earliest finisher.
    #   "occupancy":  additionally shrink the quantum in proportion to slot
    #     occupancy — a mostly-empty engine returns to the scheduler sooner,
    #     so mid-quantum arrivals are admitted into the empty slots instead
    #     of waiting out a full quantum (the dominant device-step waste term
    #     under partial Poisson load was empty slots, not the frozen tail).
    quantum_policy: str = "early_exit"
    temperature: float = 1.0
    top_k: int = 2000
    top_p: float = 1.0
    greedy: bool = False
    cache_dtype: Any = jnp.bfloat16
    use_flash: Optional[bool] = None
    # stacked (L, B, S, R) KV cache: per-slot flash kernels over one stacked
    # array + ONE grid-(L,B) append kernel per stream per step, instead of a
    # pallas_call per layer per stream (decode._decode_step_multi_stacked)
    kv_stacked: bool = False
    # Overlapped admission (the vLLM-fork admits every step,
    # ref llm_engine.py:511-583; our quantum batches steps): when True,
    # step() never blocks on the quantum's tokens. Slot completion is
    # length-based and therefore DETERMINISTIC at enqueue time, so the
    # scheduler runs ahead of the device: admission programs and the next
    # quantum are enqueued while the previous quantum executes (sequenced on
    # device by the donated cache dependency), and token buffers are drained
    # lazily via jax.Array.is_ready(). This removes the host round-trip from
    # every quantum boundary, which is what made small quanta (frequent
    # admission opportunities -> low empty-slot waste) expensive on a
    # tunneled host.
    overlap_admission: bool = False
    # max quantum programs in flight before step() blocks on the oldest
    overlap_depth: int = 2
    # persistent XLA compilation cache (cuts the one-time quantum compile to
    # a disk load on every process after the first)
    compilation_cache_dir: Optional[str] = None


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
        if serve_cfg.compilation_cache_dir:
            jax.config.update(
                "jax_compilation_cache_dir", serve_cfg.compilation_cache_dir
            )
        n = serve_cfg.max_slots
        s_align = 256 if serve_cfg.use_flash else 8
        self.s_max = find_multiple(cfg.cls_token_num + cfg.block_size, s_align)
        init_caches = (dec.init_stacked_caches if serve_cfg.kv_stacked
                       else dec.init_flat_caches)
        self.caches = init_caches(cfg, 2 * n, self.s_max, serve_cfg.cache_dtype)
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
        # overlapped-admission pipeline: ("admit"|"quantum", device_array,
        # metadata) in enqueue order; drained lazily (see _drain)
        self._inflight = __import__("collections").deque()
        # device-step accounting: slot_steps counts every (slot, step) the
        # device computed; useful_steps those that emitted a kept token.
        # 1 - useful/slot = combined empty-slot + frozen-tail waste.
        self.stats = {"slot_steps": 0, "useful_steps": 0}

    # ------------------------------------------------------------------
    def add_request(self, req: Request):
        import time as _time

        if req.t_submit is None:
            req.t_submit = _time.time()
        self.waiting.append(req)

    def has_unfinished(self) -> bool:
        return (bool(self.waiting) or bool(self.active.any())
                or bool(self._inflight))

    # ------------------------------------------------------------------
    def _filtered(self, logits):
        lg = logits.astype(jnp.float32) / max(self.scfg.temperature, 1e-5)
        if self.scfg.top_k > 0 or self.scfg.top_p < 1.0:
            lg = top_k_top_p_filter(lg, self.scfg.top_k, self.scfg.top_p)
        return lg

    def _sample(self, logits, seeds, tok_idx):
        """logits (K, vocab); seeds (K,) uint32; tok_idx (K,) int32."""
        lg = self._filtered(logits)
        if self.scfg.greedy:
            return jnp.argmax(lg, axis=-1).astype(jnp.int32)
        keys = jax.vmap(
            lambda s, c: jax.random.fold_in(jax.random.PRNGKey(s), c)
        )(seeds, tok_idx)
        return jax.vmap(jax.random.categorical)(keys, lg).astype(jnp.int32)

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnames=("self",),
             donate_argnums=(1, 2, 3, 4, 5, 6, 7, 8))
    def _admit_group_jit(self, caches, fused, pos, cur_tok, col_mask,
                         cfg_scales, strengths, seeds_state,
                         prefix_src, adapter_feats, emb_mask, slots,
                         scales, strengths_req, seeds_req):
        """Prefill K requests (batch 2K: [cond_0..K, uncond_0..K]), sample
        their first tokens in-graph, scatter every per-slot state array.

        prefix_src: c2i labels (K,) int32 OR t2i caption emb (K, T_cls, Dcap).
        adapter_feats: (K, block, adapter_dim) — zeros when a request has no
        control input (the control MLPs are bias-free, so zeros stay zeros).
        emb_mask: (K, T_cls) bool (all-ones when unused).
        """
        cfg, n = self.cfg, self.scfg.max_slots
        k = slots.shape[0]
        rows = jnp.concatenate([slots, slots + n])  # (2K,)

        if cfg.model_type == "c2i":
            labels2 = jnp.concatenate(
                [prefix_src, jnp.full_like(prefix_src, cfg.num_classes)]
            )
            prefix = gpt_model.embed_prefix_c2i(self.params, labels2)
        else:
            uncond = jnp.broadcast_to(
                self.params["cls_embedding"]["uncond_embedding"][None],
                prefix_src.shape,
            ).astype(prefix_src.dtype)
            cap = jnp.concatenate([prefix_src, uncond], axis=0)
            prefix = gpt_model.embed_prefix_t2i(self.params, cap)[:, : cfg.cls_token_num]

        ct = gpt_model.mlp_gelu(self.params["adapter_mlp"], adapter_feats)
        ct = jnp.concatenate([ct, jnp.zeros_like(ct)], axis=0)
        ct = gpt_model.mlp_gelu(self.params["condition_mlp"], ct)
        fused3_req = gpt_model.fusion_projections(self.params, ct)  # (3,2K,blk,d)

        col_req = jnp.concatenate([emb_mask, emb_mask], axis=0)  # (2K, T_cls)
        init_caches = (dec.init_stacked_caches if self.scfg.kv_stacked
                       else dec.init_flat_caches)
        small = init_caches(cfg, 2 * k, self.s_max, self.scfg.cache_dtype)
        logits, small = dec.prefill_flat(
            self.params, cfg, small, prefix.astype(jnp.bfloat16),
            fused3_req, col_req,
        )

        def scatter(kv, skv):
            if isinstance(kv, dict):  # quantized cache: rows + scale stream
                return {key: kv[key].at[rows].set(skv[key]) for key in kv}
            return kv.at[rows].set(skv)

        if self.scfg.kv_stacked:
            # stacked (L, B, S, R): slots live on dim 1
            if isinstance(caches, dict):
                caches = {key: caches[key].at[:, rows].set(small[key])
                          for key in caches}
            else:
                caches = caches.at[:, rows].set(small)
        else:
            caches = tuple(scatter(kv, skv) for kv, skv in zip(caches, small))
        fused = fused.at[:, rows].set(fused3_req.astype(fused.dtype))
        col_full = jnp.ones((2 * k, self.s_max), bool)
        col_full = col_full.at[:, : cfg.cls_token_num].set(col_req)
        col_mask = col_mask.at[rows].set(col_full)

        cond, uncond_l = jnp.split(logits, 2, axis=0)
        mixed = uncond_l + (cond - uncond_l) * scales[:, None]
        tok = self._sample(mixed, seeds_req, jnp.zeros((k,), jnp.int32))

        pos = pos.at[rows].set(cfg.cls_token_num)
        cur_tok = cur_tok.at[rows].set(jnp.concatenate([tok, tok]))
        cfg_scales = cfg_scales.at[slots].set(scales)
        strengths = strengths.at[slots].set(strengths_req)
        seeds_state = seeds_state.at[slots].set(seeds_req)
        return (caches, fused, pos, cur_tok, col_mask, cfg_scales, strengths,
                seeds_state, tok)

    def _admit_group(self, reqs: Sequence[Request], slots: Sequence[int]):
        cfg = self.cfg
        k_real = len(reqs)
        k = 1 << (k_real - 1).bit_length()  # power-of-two bucket
        pad = k - k_real
        # padding replicates request 0 onto slot 0: duplicate scatter indices
        # with identical payloads write identical bytes
        reqs = list(reqs) + [reqs[0]] * pad
        slot_idx = np.asarray(list(slots) + [slots[0]] * pad, np.int32)

        if cfg.model_type == "c2i":
            prefix_src = jnp.asarray([r.label for r in reqs], jnp.int32)
        else:
            prefix_src = jnp.asarray(
                np.stack([np.asarray(r.caption_emb, np.float32) for r in reqs])
            )
        feats = np.stack([
            np.asarray(r.adapter_features, np.float32)
            if r.adapter_features is not None
            else np.zeros((cfg.block_size, cfg.adapter_dim), np.float32)
            for r in reqs
        ])
        masks = np.stack([
            np.asarray(r.emb_mask, bool) if r.emb_mask is not None
            else np.ones((cfg.cls_token_num,), bool)
            for r in reqs
        ])
        (self.caches, self.fused, self.pos, self.cur_tok, self.col_mask,
         self.cfg_scales, self.strengths, self.seeds, tok) = self._admit_group_jit(
            self.caches, self.fused, self.pos, self.cur_tok, self.col_mask,
            self.cfg_scales, self.strengths, self.seeds,
            prefix_src, jnp.asarray(feats), jnp.asarray(masks),
            jnp.asarray(slot_idx),
            jnp.asarray([r.cfg_scale for r in reqs], jnp.float32),
            jnp.asarray([r.control_strength for r in reqs], jnp.float32),
            jnp.asarray([np.uint32(r.seed) for r in reqs], jnp.uint32),
        )
        for i in range(k_real):
            req, slot = reqs[i], int(slot_idx[i])
            self.active[slot] = True
            self.emitted[slot] = 1
            self.slot_req[slot] = req
            self.outputs[req.request_id] = []
        meta = [(reqs[i], i) for i in range(k_real)]
        if self.scfg.overlap_admission:
            self._inflight.append(("admit", tok, meta))
        else:
            self._collect("admit", jax.device_get(tok), meta)

    # ------------------------------------------------------------------
    def _collect(self, kind, arr, meta):
        """Apply a drained device buffer to host-side outputs."""
        import time as _time

        if kind == "admit":
            for req, i in meta:
                self.outputs[req.request_id].append(int(arr[i]))
        else:  # quantum: arr (q, slots), meta [(slot, req, take, done)]
            for slot, req, take, done in meta:
                self.outputs[req.request_id].extend(
                    int(t) for t in arr[:take, slot])
                if done:
                    req.tokens = np.asarray(
                        self.outputs.pop(req.request_id), np.int32)
                    req.t_done = _time.time()
                    self.finished.append(req)

    def _drain(self, block: bool):
        """Collect inflight device buffers: all that are already ready, plus
        (when block=True) at least the oldest one."""
        while self._inflight:
            kind, arr, meta = self._inflight[0]
            if not block and not arr.is_ready():
                return
            self._inflight.popleft()
            self._collect(kind, jax.device_get(arr), meta)
            block = False  # only the oldest is forced

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnames=("self", "q"), donate_argnums=(1,))
    def _quantum_jit(self, caches, fused, pos, cur_tok, cfg_scales,
                     strengths, active, seeds, col_mask, q=None):
        """Run EXACTLY q (default scfg.quantum) lockstep decode steps — one
        compiled program per distinct q for the engine's lifetime. Slots
        freeze in-graph once their block is emitted; frozen slots rewrite
        identical KV bytes in place."""
        cfg = self.cfg
        n = self.scfg.max_slots
        q = q or self.scfg.quantum
        stop = cfg.cls_token_num + cfg.block_size - 1

        def step(carry, i):
            caches, pos, cur = carry
            # never-admitted slots sit at pos 0; the stacked step clamps
            # them to garbage row 1 itself (overwritten at admission)
            logits, caches = dec.decode_step_multi(
                self.params, cfg, caches, cur, pos, fused,
                control_strength=jnp.concatenate([strengths, strengths])[:, None, None],
                use_flash=self.scfg.use_flash,
                col_mask_full=col_mask,
            )
            cond, uncond = jnp.split(logits, 2, axis=0)
            mixed = uncond + (cond - uncond) * cfg_scales[:, None]
            # index of the token being sampled for each slot (prefill = 0)
            tok_idx = pos[:n] - cfg.cls_token_num + 1
            nxt = self._sample(mixed, seeds, tok_idx)
            nxt2 = jnp.concatenate([nxt, nxt])
            # only active, not-yet-complete slots advance
            alive = active & (pos < stop)
            pos = jnp.where(alive, pos + 1, pos)
            cur = jnp.where(alive, nxt2, cur)
            return (caches, pos, cur), nxt

        (caches, pos, cur), toks = jax.lax.scan(
            step, (caches, pos, cur_tok), jnp.arange(q)
        )
        return caches, pos, cur, toks  # toks: (q, slots)

    def _pick_quantum(self) -> int:
        """Smallest bucket covering the earliest-finishing active slot (the
        early-exit policy); the fixed quantum when buckets are off. Under the
        "occupancy" policy the quantum additionally shrinks with slot
        occupancy so free slots get refilled from new arrivals sooner."""
        buckets = self.scfg.quantum_buckets
        if not buckets:
            return self.scfg.quantum
        srt = sorted(buckets)
        n = self.scfg.max_slots
        remaining = [self.cfg.block_size - int(self.emitted[s])
                     for s in range(n) if self.active[s]]
        need = min(remaining) if remaining else max(buckets)
        q = next((b for b in srt if b >= need), srt[-1])
        if self.scfg.quantum_policy == "occupancy":
            n_active = len(remaining)
            if n_active < n:
                target = max(1, (srt[-1] * n_active + n - 1) // n)
                q = min(q, next((b for b in srt if b >= target), srt[-1]))
        return q

    def step(self):
        """One scheduler iteration: group-admit -> decode quantum ->
        collect.

        Slot state (active/emitted) advances EAGERLY at enqueue time — image
        generation emits exactly block_size tokens, so completion is known
        without looking at the sampled values. In overlap mode the token
        buffers are fetched lazily (bounded by overlap_depth) and step()
        returns as soon as the device programs are enqueued.
        """
        overlap = self.scfg.overlap_admission
        n = self.scfg.max_slots
        if overlap:
            self._drain(block=False)
        free = [s for s in range(n) if not self.active[s]]
        group, slots = [], []
        while free and self.waiting:
            group.append(self.waiting.popleft())
            slots.append(free.pop(0))
        if group:
            self._admit_group(group, slots)
        if not self.active.any():
            if overlap:
                self._drain(block=bool(self._inflight))
            return
        if overlap:
            n_quanta = sum(1 for k, _, _ in self._inflight if k == "quantum")
            if n_quanta >= self.scfg.overlap_depth:
                self._drain(block=True)
        q = self._pick_quantum()
        active2 = jnp.asarray(np.concatenate([self.active, self.active]))
        self.caches, self.pos, self.cur_tok, toks = self._quantum_jit(
            self.caches, self.fused, self.pos, self.cur_tok,
            self.cfg_scales, self.strengths, active2, self.seeds, self.col_mask,
            q=q,
        )
        self.stats["slot_steps"] += q * n
        meta = []
        for s in range(n):
            if not self.active[s]:
                continue
            req = self.slot_req[s]
            take = min(q, self.cfg.block_size - self.emitted[s])
            self.stats["useful_steps"] += take
            self.emitted[s] += take
            done = self.emitted[s] >= self.cfg.block_size
            meta.append((s, req, take, done))
            if done:
                self.active[s] = False
                self.slot_req[s] = None
        if overlap:
            self._inflight.append(("quantum", toks, meta))
        else:
            self._collect("quantum", jax.device_get(toks), meta)

    def flush(self):
        """Block until every inflight device buffer is collected."""
        self._drain(block=True)
        while self._inflight:
            self._drain(block=True)

    def run(self, requests: List[Request]) -> List[Request]:
        """Offline batch entry (ref LLM.generate, serve/llm.py:138-219)."""
        for r in requests:
            self.add_request(r)
        while self.has_unfinished():
            self.step()
        done, self.finished = self.finished, []
        return sorted(done, key=lambda r: r.request_id)
