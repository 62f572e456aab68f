"""Task label transforms + grouped crops for reward/consistency flows.

Port of the reference's dataset/utils.py transform helpers (ref
dataset/utils.py:76-188): color-palette seg-map decoding, per-task label
transforms feeding reward losses, and group_random_crop. The reward *models*
live elsewhere (eval/segmenter.py, models/control_nets.py, models/dpt.py);
this module is the label-side math.

Design notes (TPU-first):
- all transforms are pure jax-numpy on NHWC batches (the reference loops
  torchvision functional calls over NCHW tensors); everything here jits.
- nearest resize reproduces torch's F.interpolate(mode="nearest") index
  convention exactly (floor(dst * src/dst)) so seg label grids match the
  reference pixel-for-pixel; bilinear uses jax.image.resize with antialias,
  the same triangle filter torchvision applies on tensors.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

ADE20K_DATASET = "limingcv/Captioned_ADE20K"
COCOSTUFF_DATASET = "limingcv/Captioned_COCOStuff"


def _size2d(size) -> Tuple[int, int]:
    if isinstance(size, int):
        return (size, size)
    h, w = size
    return (int(h), int(w))


def nearest_resize(labels: jnp.ndarray, output_size) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') on the trailing two dims.

    src index = floor(dst * src/dst) — torch's convention (and NOT
    jax.image.resize's rounded half-pixel centers), so resized label grids
    are bit-identical to the reference pipeline (ref dataset/utils.py:132).
    """
    oh, ow = _size2d(output_size)
    h, w = labels.shape[-2], labels.shape[-1]
    rows = (np.arange(oh) * h // oh).astype(np.int32)
    cols = (np.arange(ow) * w // ow).astype(np.int32)
    return labels[..., rows[:, None], cols[None, :]]


def bilinear_resize(labels: jnp.ndarray, output_size) -> jnp.ndarray:
    """Antialiased bilinear resize on the trailing two dims (torchvision
    F.resize(..., BILINEAR, antialias=True) equivalent)."""
    oh, ow = _size2d(output_size)
    shape = labels.shape[:-2] + (oh, ow)
    return jax.image.resize(labels.astype(jnp.float32), shape, method="linear",
                            antialias=True)


def map_color_to_index(
    image: jnp.ndarray, palette: Union[np.ndarray, jnp.ndarray]
) -> jnp.ndarray:
    """RGB seg maps -> palette indices by nearest color (ref utils.py:76-101).

    image: (N, 3, H, W) float in [0, 1] (the reference multiplies by 255 and
    takes an L2 argmin against the palette rows).
    palette: (K, 3) color table (ade20k_palette.npy / coco_stuff_palette.npy
    in the reference; pass any (K,3) array here).
    """
    pal = jnp.asarray(palette, jnp.float32)  # (K, 3)
    img = image.astype(jnp.float32) * 255.0
    flat = jnp.moveaxis(img, 1, -1)  # (N, H, W, 3)
    # argmin ||x - p||: expand distance to avoid a (NHW, K, 3) blowup
    x2 = jnp.sum(flat * flat, axis=-1, keepdims=True)        # (N,H,W,1)
    p2 = jnp.sum(pal * pal, axis=-1)                         # (K,)
    xp = jnp.einsum("nhwc,kc->nhwk", flat, pal)              # (N,H,W,K)
    d2 = x2 + p2[None, None, None, :] - 2.0 * xp
    return jnp.argmin(d2, axis=-1)


def seg_label_transform(
    labels: jnp.ndarray,
    dataset_name: str = ADE20K_DATASET,
    output_size=(64, 64),
    palette: Optional[np.ndarray] = None,
) -> jnp.ndarray:
    """Adapt seg maps for loss computation (ref dataset/utils.py:103-140):
    decode RGB -> indices (ADE20K), resize NEAREST to the model's output
    grid, and unify the background id to 255 (ADE20K stores background as 0,
    so indices shift down by one and 0 becomes 255).

    labels: (N, 3, H, W) RGB in [0,1] for ADE20K; (N, H, W) indices for
    COCO-Stuff.
    """
    if dataset_name == ADE20K_DATASET:
        if palette is None:
            raise ValueError("ADE20K seg_label_transform needs the (K,3) palette "
                             "(the reference loads ade20k_palette.npy)")
        labels = map_color_to_index(labels, palette)
        labels = nearest_resize(labels, output_size)
        labels = labels - 1
        labels = jnp.where(labels == -1, 255, labels)
    elif dataset_name == COCOSTUFF_DATASET:
        labels = nearest_resize(labels, output_size)
    else:
        raise NotImplementedError(f"unknown dataset {dataset_name!r}")
    return labels.astype(jnp.int32)


def depth_label_transform(
    labels: jnp.ndarray, dataset_name: str = "", output_size=None
) -> jnp.ndarray:
    """(ref dataset/utils.py:142-153): optional antialiased bilinear resize."""
    if output_size is not None:
        labels = bilinear_resize(labels, output_size)
    return labels


def edge_label_transform(labels: jnp.ndarray, dataset_name: str = "") -> jnp.ndarray:
    """(ref dataset/utils.py:156-157): identity."""
    return labels


def label_transform(labels, task: str, dataset_name: str = "", **kw):
    """Dispatcher (ref dataset/utils.py:160-168)."""
    if task == "segmentation":
        return seg_label_transform(labels, dataset_name, **kw)
    if task == "depth":
        return depth_label_transform(labels, dataset_name, **kw)
    if task in ("canny", "lineart", "hed"):
        return edge_label_transform(labels, dataset_name, **kw)
    raise NotImplementedError(f"unknown task {task!r}")


def reward_loss(predictions: jnp.ndarray, labels: jnp.ndarray, task: str,
                ignore_index: int = 255) -> jnp.ndarray:
    """Per-task reward losses (ref dataset/utils.py:43-61).

    segmentation: CE over class logits (N, K, H, W) vs index labels with
    ignore_index masking; canny: per-pixel MSE averaged to (N,) after the
    reference's .mean(2).mean((-1,-2)) chain; depth/lineart/hed: elementwise
    MSE (returned unreduced, as the reference does with reduction defaults
    left to the caller's **args — here full-tensor mean per sample).
    """
    if task == "segmentation":
        n, k = predictions.shape[:2]
        logp = jax.nn.log_softmax(predictions, axis=1)
        valid = labels != ignore_index
        safe = jnp.where(valid, labels, 0)
        nll = -jnp.take_along_axis(logp, safe[:, None].astype(jnp.int32), axis=1)[:, 0]
        return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)
    if task == "canny":
        se = (predictions.astype(jnp.float32) - labels.astype(jnp.float32)) ** 2
        return se.mean(axis=2).mean(axis=(-1, -2))
    if task in ("depth", "lineart", "hed"):
        se = (predictions.astype(jnp.float32) - labels.astype(jnp.float32)) ** 2
        return se.reshape(se.shape[0], -1).mean(axis=-1)
    raise NotImplementedError(f"unknown task {task!r}")


def group_random_crop(
    images: Sequence[np.ndarray], resolution, rng: np.random.Generator
) -> List[np.ndarray]:
    """Random-crop each image in the list to `resolution` (ref
    dataset/utils.py:171-188 — note the reference samples crop params PER
    IMAGE despite the name; we mirror that). Host-side numpy: this runs in
    dataloader workers on HWC uint8 arrays, padding short sides like
    torchvision RandomCrop would reject — images must be >= resolution.
    """
    oh, ow = _size2d(resolution)
    out = []
    for img in images:
        h, w = img.shape[0], img.shape[1]
        if h < oh or w < ow:
            raise ValueError(f"image {h}x{w} smaller than crop {oh}x{ow}")
        i = int(rng.integers(0, h - oh + 1))
        j = int(rng.integers(0, w - ow + 1))
        out.append(img[i:i + oh, j:j + ow])
    return out


def image_grid(imgs, rows: int, cols: int):
    """Paste PIL images into a rows x cols grid (ref dataset/utils.py:64-73)."""
    assert len(imgs) == rows * cols
    from PIL import Image

    w, h = imgs[0].size
    grid = Image.new("RGB", size=(cols * w, rows * h))
    for i, img in enumerate(imgs):
        grid.paste(img, box=(i % cols * w, i // cols * h))
    return grid
