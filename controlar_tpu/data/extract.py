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
from controlar_tpu.ops.canny import canny as canny_op


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
    batch_images: int = 8,
):
    """samples: iterable of {'image': PIL/ndarray, 'caption': str,
    'control': optional ndarray, 'label': optional ndarray}.

    Device-batched: `batch_images` center-cropped images go to the VQ encoder
    as one (B, S, S, 3) batch and captions to the T5 encoder as one padded
    batch (the reference loops batch-1 through a DataLoader)."""
    for sub in ("code", "caption_emb", "image", "control", "label"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

    @jax.jit
    def encode(u8):
        x = u8.astype(jnp.float32) / 127.5 - 1.0
        _, codes = vq_model.encode(vq_params, vq_cfg, x)
        return codes

    idx = process_index
    count = 0
    buf = []

    def flush():
        nonlocal idx, count
        if not buf:
            return
        arrs = np.stack([np.asarray(s["image"], np.uint8) for s in buf])
        codes = np.asarray(encode(jnp.asarray(arrs)))
        caps = [s.get("caption") for s in buf]
        embs = None
        if t5_embedder is not None and any(c is not None for c in caps):
            embs, masks = t5_embedder.get_text_embeddings(
                [c or "" for c in caps])
        for j, sample in enumerate(buf):
            np.save(os.path.join(out_dir, "code", f"{idx}.npy"),
                    codes[j].astype(np.int32))
            sample["image"].save(os.path.join(out_dir, "image", f"{idx}.png"))
            if embs is not None and caps[j] is not None:
                valid = int(masks[j].sum())
                np.savez(
                    os.path.join(out_dir, "caption_emb", f"{idx}.npz"),
                    caption_emb=embs[j:j + 1, :valid],
                    prompt=np.asarray([caps[j]]),
                )
            if sample.get("control") is not None:
                Image.fromarray(np.asarray(sample["control"], np.uint8)).save(
                    os.path.join(out_dir, "control", f"{idx}.png")
                )
            if sample.get("label") is not None:
                Image.fromarray(np.asarray(sample["label"], np.uint8)).save(
                    os.path.join(out_dir, "label", f"{idx}.png")
                )
            idx += process_count
            count += 1
        buf.clear()

    for sample in samples:
        img = sample["image"]
        if not isinstance(img, Image.Image):
            img = Image.fromarray(np.asarray(img))
        sample = dict(sample, image=center_crop_arr(img.convert("RGB"),
                                                    image_size))
        buf.append(sample)
        if len(buf) >= batch_images:
            flush()
    flush()
    return count


# --- ImageNet c2i extraction -------------------------------------------------


def ten_crop(arr: np.ndarray, size: int) -> np.ndarray:
    """torchvision TenCrop order on an HWC array: tl, tr, bl, br, center,
    then the same five from the horizontally flipped image (the transform
    stack in ref extract_codes_c2i.py:59-65)."""
    h, w = arr.shape[:2]
    if h < size or w < size:
        raise ValueError(f"image {h}x{w} smaller than crop {size}")

    def five(a):
        ct = (h - size) // 2, (w - size) // 2
        return [
            a[:size, :size], a[:size, w - size:], a[h - size:, :size],
            a[h - size:, w - size:],
            a[ct[0]:ct[0] + size, ct[1]:ct[1] + size],
        ]

    return np.stack(five(arr) + five(arr[:, ::-1]))


def c2i_crops(img, image_size: int, use_ten_crop: bool,
              crop_range: float = 1.1) -> np.ndarray:
    """One image -> (A, S, S, 3) uint8 crops. ten_crop: center-crop to
    S*crop_range then TenCrop(S) (A=10, ref extract_codes_c2i.py:58-65);
    else center-crop to S and add the horizontal flip (A=2, ref :96-101)."""
    if not isinstance(img, Image.Image):
        img = Image.fromarray(np.asarray(img))
    img = img.convert("RGB")
    if use_ten_crop:
        big = np.asarray(center_crop_arr(img, int(image_size * crop_range)),
                         np.uint8)
        return ten_crop(big, image_size)
    base = np.asarray(center_crop_arr(img, image_size), np.uint8)
    return np.stack([base, base[:, ::-1]])


def extract_c2i_tree(
    out_root: str,
    samples: Iterable[dict],
    vq_params,
    vq_cfg: VQConfig,
    *,
    dataset: str = "imagenet",
    image_size: int = 256,
    use_ten_crop: bool = False,
    crop_range: float = 1.1,
    conditions: tuple = (),
    canny_low: int = 100,
    canny_high: int = 200,
    depth_params=None,
    depth_cfg=None,
    batch_images: int = 8,
    process_index: int = 0,
    process_count: int = 1,
) -> int:
    """ImageNet-style c2i extraction (ref extract_codes_c2i.py +
    extract_file_imagenet.py:100-146): per sample i (rank-strided), write
        {out}/{dataset}{S}_codes/{i}.npy        (1, A, (S/16)^2) int
        {out}/{dataset}{S}_labels/{i}.npy       (1,)
        {out}/{dataset}{S}_{cond}_imagesnpy/{i}.npy   (A, 1, S, S) uint8
        {out}/{dataset}{S}_{cond}_images/{i}.png      (crop 0 preview)
    exactly the tree C2ICodeDataset reads. A = 10 (ten-crop) or 2 (flip).

    TPU-first: the reference encodes batch-1 through a DataLoader; here
    `batch_images` samples' crops are stacked to one (B*A, S, S, 3) device
    batch for the VQ encoder / canny / MiDaS, so the MXU sees real batches.

    samples: iterable of {'image': PIL/ndarray, 'label': int}.
    """
    prefix = os.path.join(out_root, f"{dataset}{image_size}")
    os.makedirs(f"{prefix}_codes", exist_ok=True)
    os.makedirs(f"{prefix}_labels", exist_ok=True)
    for cond in conditions:
        os.makedirs(f"{prefix}_{cond}_imagesnpy", exist_ok=True)
        os.makedirs(f"{prefix}_{cond}_images", exist_ok=True)

    @jax.jit
    def encode_batch(u8):
        x = u8.astype(jnp.float32) / 127.5 - 1.0
        _, codes = vq_model.encode(vq_params, vq_cfg, x)
        return codes.reshape(codes.shape[0], -1)

    @jax.jit
    def canny_batch(u8):
        return canny_op(u8, canny_low, canny_high).astype(jnp.uint8)

    depth_batch = None
    if "depth" in conditions:
        if depth_params is None:
            raise ValueError("depth extraction needs MiDaS params "
                             "(ref extract_file_imagenet.py MidasDetector)")
        from controlar_tpu.models import midas as midas_model

        dcfg = depth_cfg or midas_model.MIDAS_HYBRID

        @jax.jit
        def depth_batch(u8):
            return midas_model.midas_depth_condition(
                depth_params, dcfg, u8).astype(jnp.uint8)

    idx = process_index
    count = 0
    buf_crops, buf_labels = [], []

    def flush():
        nonlocal idx, count
        if not buf_crops:
            return
        b, a = len(buf_crops), buf_crops[0].shape[0]
        s = image_size
        flat = jnp.asarray(np.concatenate(buf_crops, 0))  # (B*A, S, S, 3)
        codes = np.asarray(encode_batch(flat)).reshape(b, a, -1)
        conds = {}
        if "canny" in conditions:
            conds["canny"] = np.asarray(canny_batch(flat)).reshape(b, a, 1, s, s)
        if "depth" in conditions:
            conds["depth"] = np.asarray(depth_batch(flat)).reshape(b, a, 1, s, s)
        for j in range(b):
            np.save(f"{prefix}_codes/{idx}.npy",
                    codes[j][None].astype(np.int64))  # (1, A, T), ref layout
            np.save(f"{prefix}_labels/{idx}.npy",
                    np.asarray([buf_labels[j]], np.int64))
            for cond, arr in conds.items():
                np.save(f"{prefix}_{cond}_imagesnpy/{idx}.npy", arr[j])
                Image.fromarray(arr[j][0, 0]).save(
                    f"{prefix}_{cond}_images/{idx}.png")
            idx += process_count
            count += 1
        buf_crops.clear()
        buf_labels.clear()

    for sample in samples:
        buf_crops.append(
            c2i_crops(sample["image"], image_size, use_ten_crop, crop_range))
        buf_labels.append(int(sample["label"]))
        if len(buf_crops) >= batch_images:
            flush()
    flush()
    return count
