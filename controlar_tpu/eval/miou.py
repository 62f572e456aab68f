"""Segmentation-consistency mIoU (ref evaluations/ade20k_mIoU.py:10-61,
cocostuff_mIoU.py:10-51: confusion-matrix mIoU between labels predicted on
generated images and ground-truth label maps).

The reference scores with mmseg reward models (Mask2Former-SwinL for
ADE20K-150, DeepLabV3-R101 for COCOStuff-171) — external checkpoints the
user supplies; pass any callable `segmenter(images_u8) -> (B, H, W) int
labels`. The metric math lives here and is exact.
"""
from __future__ import annotations

from typing import Callable, Iterable, Tuple

import numpy as np


class ConfusionMatrix:
    def __init__(self, num_classes: int, ignore_index: int = 255):
        self.num_classes = num_classes
        self.ignore_index = ignore_index
        self.mat = np.zeros((num_classes, num_classes), np.int64)

    def update(self, gt: np.ndarray, pred: np.ndarray):
        gt = np.asarray(gt).ravel()
        pred = np.asarray(pred).ravel()
        keep = (gt != self.ignore_index) & (gt < self.num_classes)
        gt, pred = gt[keep], pred[keep]
        idx = gt.astype(np.int64) * self.num_classes + pred.astype(np.int64)
        self.mat += np.bincount(
            idx, minlength=self.num_classes ** 2
        ).reshape(self.num_classes, self.num_classes)

    def miou(self) -> Tuple[float, np.ndarray]:
        tp = np.diag(self.mat).astype(np.float64)
        fp = self.mat.sum(0) - tp
        fn = self.mat.sum(1) - tp
        denom = tp + fp + fn
        iou = np.where(denom > 0, tp / np.maximum(denom, 1), np.nan)
        return float(np.nanmean(iou)), iou


def miou_eval(
    segmenter: Callable[[np.ndarray], np.ndarray],
    pairs: Iterable[Tuple[np.ndarray, np.ndarray]],
    num_classes: int,
    ignore_index: int = 255,
) -> float:
    """pairs: iterable of (generated uint8 RGB batch, gt label batch)."""
    cm = ConfusionMatrix(num_classes, ignore_index)
    for images, labels in pairs:
        preds = segmenter(images)
        cm.update(labels, preds)
    return cm.miou()[0]
