"""VQ tokenizer reconstruction evaluation (rFID prep).

(ref tokenizer/tokenizer_image/reconstruction_vq_ddp.py: encode->decode val
images, per-image PSNR/SSIM, dump PNG + npz batches for the FID evaluator.)
"""
from __future__ import annotations

import os
from typing import Dict, Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from controlar_tpu.config import VQConfig
from controlar_tpu.models import vq as vq_model
from controlar_tpu.eval.metrics import _ssim_pair, ms_ssim
from controlar_tpu.pipeline import to_uint8_image


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 255.0) -> float:
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range ** 2 / mse))


def reconstruction_eval(
    vq_params,
    cfg: VQConfig,
    batches: Iterable[np.ndarray],
    out_dir: Optional[str] = None,
) -> Dict[str, float]:
    """batches: uint8 RGB (B, H, W, 3). Returns mean PSNR/MS-SSIM and (when
    out_dir is set) writes originals/reconstructions PNG-pairs + samples.npz
    for the FID tooling (ref create_npz.py:8-29)."""

    @jax.jit
    def roundtrip(x):
        zq, _ = vq_model.encode(vq_params, cfg, x)
        return vq_model.decode(vq_params, cfg, zq)

    psnrs, ssims = [], []
    all_recons = []
    idx = 0
    for imgs in batches:
        x = jnp.asarray(imgs, jnp.float32) / 127.5 - 1.0
        rec = to_uint8_image(roundtrip(x))
        for a, b in zip(imgs, rec):
            psnrs.append(psnr(a, b))
            aj = jnp.asarray(a, jnp.float32)[None] / 255.0
            bj = jnp.asarray(b, jnp.float32)[None] / 255.0
            if min(a.shape[:2]) >= 176:  # 5 MS-SSIM scales need >= 11*2^4
                s = ms_ssim(aj, bj)
            else:  # single-scale SSIM fallback for small eval images
                s, _ = _ssim_pair(aj, bj)
            ssims.append(float(jnp.ravel(s)[0]))
            if out_dir:
                from PIL import Image

                os.makedirs(os.path.join(out_dir, "orig"), exist_ok=True)
                os.makedirs(os.path.join(out_dir, "recon"), exist_ok=True)
                Image.fromarray(a).save(os.path.join(out_dir, "orig", f"{idx}.png"))
                Image.fromarray(b).save(os.path.join(out_dir, "recon", f"{idx}.png"))
            idx += 1
        if out_dir:
            all_recons.append(rec)
    if out_dir and all_recons:
        np.savez(
            os.path.join(out_dir, "samples.npz"),
            arr_0=np.concatenate(all_recons, axis=0),
        )
    return {"psnr": float(np.mean(psnrs)), "ms_ssim": float(np.mean(ssims)),
            "count": idx}
