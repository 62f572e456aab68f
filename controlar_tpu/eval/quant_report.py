"""Quantization accuracy gate: bf16 vs int8/W4 token agreement + logit
divergence.

The serving modes (--quant int8, W4) claim near-losslessness; this measures
it on the repo's own two paths (the comparison is weight-value agnostic, so
random converted weights give a meaningful systems-level bound, and real
released weights get the same report through verify-zoo).

Metrics per mode:
- teacher-forced argmax agreement: fraction of positions where the
  quantized model's greedy choice matches bf16, conditioning both on the
  SAME (bf16-greedy) history. This is also the acceptance-rate estimate for
  precision self-drafting in spec_decode.
- free-running prefix survival: mean number of tokens until the quantized
  greedy rollout first diverges from the bf16 rollout (divergence compounds
  autoregressively, so this is the stricter, noisier number).
- max relative logit error over the teacher-forced positions.
- SAMPLED agreement (matched noise): serving samples at temperature/top-k,
  so greedy-only evidence is too soft — a tiny logit perturbation near a
  50/50 top-2 tie never flips argmax order but does flip samples. Shared
  Gumbel noise (the coupling that maximizes agreement between the two
  distributions) is added to both logit sets and the argmaxes compared:
  teacher-forced `sampled_agreement` plus a matched-seed free-running
  sampled rollout (`sampled_free_match` / `sampled_survival`).
- per-position profile: agreement over the first/middle/last thirds of the
  sequence plus the worst position (`pos_agree_thirds`, `pos_agree_min`) —
  mid-sequence positions on real data have flatter margins and fail first.

Ship threshold (docs/quant_stress.md): a mode ships by default only if
teacher-forced agreement >= 0.99 AND sampled agreement >= 0.95 on trained
weights at the serving workload; verify-zoo --quant-report applies the same
bar to released checkpoints.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from controlar_tpu.config import GPTConfig
from controlar_tpu import decode as dec
from controlar_tpu import generate as jgen
from controlar_tpu import spec_decode
from controlar_tpu.models import gpt as gpt_model
from controlar_tpu import quant


def _teacher_forced_logits(params, cfg: GPTConfig, prefix_emb, tokens,
                           use_flash: bool = False,
                           cache_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Logits at every position of `tokens` (B, N) given the prefix.

    Runs prefill on the prefix then ONE forward_chunk over the whole
    sequence (the chunked-prefill primitive doubles as a scoring pass)."""
    b, n = tokens.shape
    t_cls = prefix_emb.shape[1]
    s_max = ((t_cls + n + 72) // 8 + 1) * 8
    caches = dec.init_flat_caches(cfg, b, s_max, cache_dtype)
    logits0, caches = dec.prefill_flat(params, cfg, caches, prefix_emb,
                                       None, None)
    # feed [tok_0 .. tok_{N-2}]; logits_j predicts tok_{j+1}
    chunk = tokens[:, : n - 1]
    logits_rest, _ = spec_decode.forward_chunk(
        params, cfg, caches, chunk, jnp.full((b,), t_cls, jnp.int32),
        use_flash=use_flash)
    return jnp.concatenate([logits0[:, None], logits_rest], axis=1)  # (B,N,V)


def measure_quant_agreement(
    params,
    cfg: GPTConfig,
    *,
    labels: Optional[jnp.ndarray] = None,
    modes: Sequence[str] = ("int8", "int8+kv8", "w4", "w4+kv8"),
    max_new_tokens: Optional[int] = None,
    cfg_scale: float = 1.0,
    sample_temperature: float = 1.0,
    sample_top_k: int = 2000,
) -> Dict[str, Dict[str, float]]:
    """params: bf16 GPT params (stacked). Returns {mode: metrics}.

    cfg_scale=1.0 scores the conditional branch only (agreement on the raw
    model); CFG mixing is a linear map of two logit vectors so its agreement
    tracks the raw number closely. Sampled metrics use the serving defaults
    (temperature 1.0, top-k 2000, ref generate.py:59-74 semantics).
    """
    from controlar_tpu.ops.sampling import top_k_top_p_filter

    n_new = max_new_tokens or cfg.block_size
    if labels is None:
        labels = jnp.arange(4) % max(cfg.num_classes, 1)
    assert cfg.model_type == "c2i", "gate runs on the c2i surface"

    def sampled_argmax(logits, gumbel):
        f = top_k_top_p_filter(
            logits.astype(jnp.float32) / max(sample_temperature, 1e-5),
            top_k=sample_top_k, top_p=1.0)
        return jnp.argmax(f + gumbel, axis=-1)

    # Work entirely on the unstacked tree: pass an already-unstacked tree
    # (decode.unstack_layers) from the caller and the stacked copy never
    # has to coexist with a quantized one — at GPT-3B (6.2 GB bf16) that
    # margin decides whether the report fits 16 GB HBM.
    base = dec.unstack_layers(params)
    del params
    prefix = gpt_model.embed_prefix_c2i(base, labels)

    ref_tokens = jgen.generate(
        base, cfg, labels=labels, max_new_tokens=n_new,
        cfg_scale=cfg_scale, sample_logits=False,
        rng=jax.random.PRNGKey(0), use_flash=False)
    ref_logits = _teacher_forced_logits(base, cfg, prefix, ref_tokens)
    ref_arg = jnp.argmax(ref_logits, -1)
    # shared Gumbel noise: the maximal coupling of the two sampling
    # distributions — agreement gaps are genuine distribution shifts
    gumbel = jax.random.gumbel(jax.random.PRNGKey(17), ref_logits.shape,
                               jnp.float32)
    ref_samp = sampled_argmax(ref_logits, gumbel)
    sample_rng = jax.random.PRNGKey(7)
    ref_roll = jgen.generate(
        base, cfg, labels=labels, max_new_tokens=n_new,
        cfg_scale=cfg_scale, sample_logits=True,
        temperature=sample_temperature, top_k=sample_top_k,
        rng=sample_rng, use_flash=False)

    out: Dict[str, Dict[str, float]] = {}
    for mode in modes:
        wmode, _, kvmode = mode.partition("+")
        cache_dtype = {"kv8": jnp.int8, "kv4": jnp.int4}.get(
            kvmode, jnp.bfloat16)
        if wmode == "int8":
            qp = quant.quantize_gpt_params(base)
        elif wmode == "w4":
            qp = quant.quantize_gpt_params_w4(base)
        else:
            raise ValueError(mode)

        q_logits = _teacher_forced_logits(qp, cfg, prefix, ref_tokens,
                                          cache_dtype=cache_dtype)
        agree = float((jnp.argmax(q_logits, -1) == ref_arg).mean())
        denom = float(jnp.abs(ref_logits).max())
        logit_rel = float(jnp.abs(q_logits - ref_logits).max()) / max(denom, 1e-9)

        # per-position teacher-forced agreement: mid/late positions have
        # flatter margins on real data and fail first
        pos_agree = np.asarray(
            (jnp.argmax(q_logits, -1) == ref_arg).mean(axis=0))  # (N,)
        third = max(len(pos_agree) // 3, 1)
        thirds = [float(pos_agree[i * third:(i + 1) * third or None].mean())
                  for i in range(3)]

        samp_agree = float((sampled_argmax(q_logits, gumbel)
                            == ref_samp).mean())

        q_tokens = jgen.generate(
            qp, cfg, labels=labels, max_new_tokens=n_new,
            cfg_scale=cfg_scale, sample_logits=False,
            rng=jax.random.PRNGKey(0), use_flash=False,
            cache_dtype=cache_dtype)
        eq = np.asarray(q_tokens) == np.asarray(ref_tokens)

        q_roll = jgen.generate(
            qp, cfg, labels=labels, max_new_tokens=n_new,
            cfg_scale=cfg_scale, sample_logits=True,
            temperature=sample_temperature, top_k=sample_top_k,
            rng=sample_rng, use_flash=False, cache_dtype=cache_dtype)
        eq_s = np.asarray(q_roll) == np.asarray(ref_roll)

        def survival(m):
            # tokens until first divergence, per row
            return float(np.argmin(np.concatenate(
                [m, np.zeros((m.shape[0], 1), bool)], axis=1), axis=1).mean())

        out[mode] = {
            "teacher_forced_agreement": agree,
            "max_rel_logit_err": logit_rel,
            "mean_prefix_survival": survival(eq),
            "free_running_match": float(eq.mean()),
            "sampled_agreement": samp_agree,
            "sampled_free_match": float(eq_s.mean()),
            "sampled_survival": survival(eq_s),
            "pos_agree_thirds": thirds,
            "pos_agree_min": float(pos_agree.min()),
        }
        del qp, q_logits, q_tokens, q_roll  # free before the next mode
    return out


def format_report(report: Dict[str, Dict[str, float]]) -> str:
    lines = ["mode     tf-agree  samp-agree  logit-rel-err  prefix-surv"
             "  free-match  samp-match  pos-thirds"]
    for mode, m in report.items():
        thirds = "/".join(f"{x:.2f}" for x in m.get("pos_agree_thirds", []))
        lines.append(
            f"{mode:8s} {m['teacher_forced_agreement']:8.3f} "
            f"{m.get('sampled_agreement', float('nan')):10.3f} "
            f"{m['max_rel_logit_err']:13.4f} "
            f"{m['mean_prefix_survival']:11.1f} "
            f"{m['free_running_match']:10.3f} "
            f"{m.get('sampled_free_match', float('nan')):10.3f}  {thirds}")
    return "\n".join(lines)
