"""Offline dataset extraction: images + captions -> code trees.

Builds the tree the datasets consume (ref extract_file_multigen.py:96-203 /
extract_file_imagenet.py / extract_codes_c2i.py):
    out/code/{i}.npy, out/caption_emb/{i}.npz, out/image/{i}.png,
    out/control[_depth]/{i}.png, out/label/{i}.png

TPU-first: VQ encoding and control extraction run batched on device; T5
features come from the JAX encoder. Sharding across hosts uses the
rank-strided file naming the reference uses (extract_file_multigen.py:175,
198-199) so trees from multiple processes interleave.
"""
from __future__ import annotations

import os
from typing import Callable, Iterable, Optional

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from controlar_tpu.config import VQConfig
from controlar_tpu.models import vq as vq_model
from controlar_tpu.data.augmentation import center_crop_arr


def extract_tree(
    out_dir: str,
    samples: Iterable[dict],
    vq_params,
    vq_cfg: VQConfig,
    t5_embedder=None,
    image_size: int = 512,
    process_index: int = 0,
    process_count: int = 1,
    save_control: Optional[Callable] = None,
):
    """samples: iterable of {'image': PIL/ndarray, 'caption': str,
    'control': optional ndarray, 'label': optional ndarray}."""
    for sub in ("code", "caption_emb", "image", "control", "label"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

    @jax.jit
    def encode(img):
        _, codes = vq_model.encode(vq_params, vq_cfg, img)
        return codes

    idx = process_index
    for sample in samples:
        img = sample["image"]
        if not isinstance(img, Image.Image):
            img = Image.fromarray(np.asarray(img))
        img = center_crop_arr(img.convert("RGB"), image_size)
        arr = np.asarray(img, np.uint8)

        x = jnp.asarray(arr, jnp.float32)[None] / 127.5 - 1.0
        codes = np.asarray(encode(x))[0]
        np.save(os.path.join(out_dir, "code", f"{idx}.npy"), codes.astype(np.int32))
        img.save(os.path.join(out_dir, "image", f"{idx}.png"))

        if t5_embedder is not None and "caption" in sample:
            emb, mask = t5_embedder.get_text_embeddings([sample["caption"]])
            valid = int(mask[0].sum())
            np.savez(
                os.path.join(out_dir, "caption_emb", f"{idx}.npz"),
                caption_emb=emb[:, :valid],
                prompt=np.asarray([sample["caption"]]),
            )
        if "control" in sample and sample["control"] is not None:
            Image.fromarray(np.asarray(sample["control"], np.uint8)).save(
                os.path.join(out_dir, "control", f"{idx}.png")
            )
        if "label" in sample and sample["label"] is not None:
            Image.fromarray(np.asarray(sample["label"], np.uint8)).save(
                os.path.join(out_dir, "label", f"{idx}.png")
            )
        idx += process_count
    return idx
