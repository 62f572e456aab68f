"""Sharded batch samplers for FID dumps.

(ref autoregressive/sample/sample_c2i_ddp.py / sample_t2i_ddp.py: DDP loops
that generate per-rank sample shards and assemble an npz for the TF FID
evaluator, npz builder sample_c2i_ddp.py:21-35.)

TPU version: each jax process generates its index shard with the single
jitted loop; results collect into {out_dir}/images/*.png and samples.npz.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax

from controlar_tpu.pipeline import ControlARPipeline


def sample_c2i_fid(
    pipe: ControlARPipeline,
    num_images: int,
    *,
    batch_size: int = 8,
    num_classes: int = 1000,
    cfg_scale: float = 4.0,
    top_k: int = 2000,
    out_dir: Optional[str] = None,
    seed: int = 0,
    condition_images: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Generate `num_images` class-balanced samples (this process's shard).

    Returns the uint8 (N, H, W, 3) shard; writes PNGs + samples.npz when
    out_dir is given (ref create_npz.py:8-29 format: key 'arr_0')."""
    pidx, pcount = jax.process_index(), jax.process_count()
    all_idx = np.arange(num_images)
    shard = all_idx[pidx::pcount]
    rng = np.random.default_rng(seed + pidx)

    outs = []
    for start in range(0, len(shard), batch_size):
        idx = shard[start: start + batch_size]
        if len(idx) < batch_size:  # pad the tail batch, drop extras after
            idx = np.concatenate([idx, idx[: batch_size - len(idx)]])
        labels = idx % num_classes  # class-balanced like the DDP sampler
        cond = None
        if condition_images is not None:
            cond = condition_images[idx % len(condition_images)]
        imgs = pipe.generate(
            labels=labels, condition_images=cond, cfg_scale=cfg_scale,
            top_k=top_k, seed=int(rng.integers(0, 1 << 31)),
        )
        outs.append(imgs[: len(shard[start: start + batch_size])])
    shard_imgs = np.concatenate(outs, axis=0) if outs else np.zeros((0,))

    if out_dir is not None:
        img_dir = os.path.join(out_dir, "images")
        os.makedirs(img_dir, exist_ok=True)
        from PIL import Image

        for i, img in zip(shard, shard_imgs):
            Image.fromarray(img).save(os.path.join(img_dir, f"{i}.png"))
        if pcount == 1:
            np.savez(os.path.join(out_dir, "samples.npz"), arr_0=shard_imgs)
    return shard_imgs
