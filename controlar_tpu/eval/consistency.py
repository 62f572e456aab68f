"""Conditional-consistency evaluation: generate, re-extract the control
signal from the generated image, score against the input condition.

(ref autoregressive/test/test_c2i.py:203-231 / test_t2i.py:184-237 and the
offline scripts evaluations/{canny_f1score,hed_ssim,lineart_ssim,depth_rmse}.py
— all re-run the detector on generated images.)
"""
from __future__ import annotations

from typing import Dict, Iterable

import numpy as np
import jax.numpy as jnp

from controlar_tpu.eval.metrics import F1score, RMSE, SSIM
from controlar_tpu.ops.canny import canny
from controlar_tpu.models import control_nets


def make_metric(condition_type: str):
    """Metric per condition (ref test_c2i.py metric dispatch)."""
    if condition_type == "canny":
        return F1score(threshold=128)
    if condition_type in ("hed", "lineart"):
        return SSIM()
    if condition_type == "depth":
        return RMSE()
    raise ValueError(condition_type)


def reextract(condition_type: str, images_u8: np.ndarray,
              hed_params=None, lineart_params=None, depth_fn=None) -> np.ndarray:
    """Generated RGB uint8 (B,H,W,3) -> control map (B,H,W) in 0..255."""
    x = jnp.asarray(images_u8)
    if condition_type == "canny":
        return np.asarray(canny(x, 100, 200))
    if condition_type == "hed":
        return np.asarray(control_nets.hed_forward(hed_params, x.astype(jnp.float32)))
    if condition_type == "lineart":
        return np.asarray(
            control_nets.lineart_forward(lineart_params, x.astype(jnp.float32)) * 255.0
        )
    if condition_type == "depth":
        return np.asarray(depth_fn(images_u8))
    raise ValueError(condition_type)


def consistency_eval(
    pipe,
    batches: Iterable[Dict[str, np.ndarray]],
    condition_type: str,
    cfg_scale: float = 4.0,
    top_k: int = 2000,
    seed: int = 0,
    **extract_kw,
) -> float:
    """Each batch: {'condition_images': uint8 RGB, ...generation inputs}.
    Returns the averaged consistency metric."""
    metric = make_metric(condition_type)
    for i, batch in enumerate(batches):
        cond_in = batch["condition_images"]
        out = pipe.generate(
            labels=batch.get("labels"),
            caption_emb=batch.get("caption_emb"),
            emb_masks=batch.get("emb_masks"),
            condition_images=cond_in,
            cfg_scale=cfg_scale,
            top_k=top_k,
            seed=seed + i,
        )
        gt_map = reextract(condition_type, cond_in, **extract_kw)
        gen_map = reextract(condition_type, out, **extract_kw)
        for a, b in zip(gt_map, gen_map):
            metric.update(a, b)
    return metric.calculate()
