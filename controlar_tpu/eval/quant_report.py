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
) -> Dict[str, Dict[str, float]]:
    """params: bf16 GPT params (stacked). Returns {mode: metrics}.

    cfg_scale=1.0 scores the conditional branch only (agreement on the raw
    model); CFG mixing is a linear map of two logit vectors so its agreement
    tracks the raw number closely.
    """
    n_new = max_new_tokens or cfg.block_size
    if labels is None:
        labels = jnp.arange(4) % max(cfg.num_classes, 1)
    assert cfg.model_type == "c2i", "gate runs on the c2i surface"

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

        q_tokens = jgen.generate(
            qp, cfg, labels=labels, max_new_tokens=n_new,
            cfg_scale=cfg_scale, sample_logits=False,
            rng=jax.random.PRNGKey(0), use_flash=False,
            cache_dtype=cache_dtype)
        eq = np.asarray(q_tokens) == np.asarray(ref_tokens)
        # tokens until first divergence, per row
        survival = np.argmin(np.concatenate(
            [eq, np.zeros((eq.shape[0], 1), bool)], axis=1), axis=1)
        out[mode] = {
            "teacher_forced_agreement": agree,
            "max_rel_logit_err": logit_rel,
            "mean_prefix_survival": float(survival.mean()),
            "free_running_match": float(eq.mean()),
        }
        del qp, q_logits, q_tokens  # free before quantizing the next mode
    return out


def format_report(report: Dict[str, Dict[str, float]]) -> str:
    lines = ["mode  tf-agree  logit-rel-err  prefix-survival  free-match"]
    for mode, m in report.items():
        lines.append(
            f"{mode:5s} {m['teacher_forced_agreement']:8.3f} "
            f"{m['max_rel_logit_err']:13.4f} "
            f"{m['mean_prefix_survival']:15.1f} "
            f"{m['free_running_match']:10.3f}")
    return "\n".join(lines)
