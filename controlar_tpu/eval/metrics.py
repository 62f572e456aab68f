"""Evaluation metrics with the reference's definitions
(ref autoregressive/test/metric.py:7-66 and evaluations/*).

- F1score: binarize at threshold 128, sklearn-definition binary F1
  (ref metric.py:25-45; also canny consistency, evaluations/canny_f1score.py)
- RMSE: plain numpy RMSE on raw maps (ref metric.py:48-65, depth_rmse.py)
- MS-SSIM: multi-scale SSIM, torchmetrics defaults (gaussian kernel 11,
  sigma 1.5, betas (0.0448, 0.2856, 0.3001, 0.2363, 0.1333), k1=0.01,
  k2=0.03) — jittable JAX implementation (ref hed_ssim.py / lineart_ssim.py)
- FID statistics helpers: mu/sigma accumulation + Frechet distance for a
  pluggable feature extractor (the reference uses the OpenAI TF InceptionV3
  graph, evaluations/c2i/evaluator.py — run host-side where its weights are
  available; the formula here is identical)
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Streaming scalar metrics
# ---------------------------------------------------------------------------

class F1score:
    def __init__(self, threshold: int = 128):
        self.threshold = threshold
        self.total = 0.0
        self.count = 0

    def update(self, img_true: np.ndarray, img_pred: np.ndarray):
        yt = (np.asarray(img_true) > self.threshold).astype(np.int64).ravel()
        yp = (np.asarray(img_pred) > self.threshold).astype(np.int64).ravel()
        tp = np.sum((yt == 1) & (yp == 1))
        fp = np.sum((yt == 0) & (yp == 1))
        fn = np.sum((yt == 1) & (yp == 0))
        denom = 2 * tp + fp + fn
        self.total += (2 * tp / denom) if denom > 0 else 0.0
        self.count += 1

    def calculate(self) -> float:
        return self.total / max(self.count, 1)


class RMSE:
    def __init__(self):
        self.total = 0.0
        self.count = 0

    def update(self, a: np.ndarray, b: np.ndarray):
        diff = np.asarray(a, np.float64) - np.asarray(b, np.float64)
        self.total += float(np.sqrt(np.mean(diff ** 2)))
        self.count += 1

    def calculate(self) -> float:
        return self.total / max(self.count, 1)


# ---------------------------------------------------------------------------
# MS-SSIM (jittable)
# ---------------------------------------------------------------------------

_MSSSIM_BETAS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def _ssim_pair(x: jnp.ndarray, y: jnp.ndarray, data_range: float = 1.0,
               k1: float = 0.01, k2: float = 0.03):
    """x, y: (B, H, W, C). Returns (mean ssim, mean contrast-structure)."""
    kern = jnp.asarray(_gaussian_kernel())[:, :, None, None]
    c = x.shape[-1]
    kern = jnp.tile(kern, (1, 1, 1, c))

    def filt(a):
        return jax.lax.conv_general_dilated(
            a, kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_x, mu_y = filt(x), filt(y)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sig_x = filt(x * x) - mu_x2
    sig_y = filt(y * y) - mu_y2
    sig_xy = filt(x * y) - mu_xy
    cs = (2 * sig_xy + c2) / (sig_x + sig_y + c2)
    ssim = ((2 * mu_xy + c1) / (mu_x2 + mu_y2 + c1)) * cs
    return jnp.mean(ssim, axis=(1, 2, 3)), jnp.mean(cs, axis=(1, 2, 3))


def _avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


def ms_ssim(x: jnp.ndarray, y: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Multi-scale SSIM per batch element. x, y: (B, H, W, C) floats in
    [0, data_range]; needs H, W >= 176 for the 5 default scales."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    mcs = []
    sim = None
    for i, beta in enumerate(_MSSSIM_BETAS):
        sim, cs = _ssim_pair(x, y, data_range)
        if i < len(_MSSSIM_BETAS) - 1:
            mcs.append(jnp.maximum(cs, 0.0))
            x = _avg_pool2(x)
            y = _avg_pool2(y)
    out = jnp.maximum(sim, 0.0) ** _MSSSIM_BETAS[-1]
    for beta, cs in zip(_MSSSIM_BETAS[:-1], mcs):
        out = out * (cs ** beta)
    return out


class SSIM:
    """Streaming MS-SSIM on uint8 maps (ref metric.py:7-22: inputs /255)."""

    def __init__(self):
        self.total = 0.0
        self.count = 0

    def update(self, a: np.ndarray, b: np.ndarray):
        a = np.asarray(a, np.float32) / 255.0
        b = np.asarray(b, np.float32) / 255.0
        if a.ndim == 2:
            a, b = a[None, :, :, None], b[None, :, :, None]
        elif a.ndim == 3:
            a, b = a[None], b[None]
        val = float(ms_ssim(jnp.clip(a, 0, 1), jnp.clip(b, 0, 1)).mean())
        self.total += val
        self.count += 1

    def calculate(self) -> float:
        return self.total / max(self.count, 1)


# ---------------------------------------------------------------------------
# FID
# ---------------------------------------------------------------------------

class FIDStats:
    """Streaming mean/covariance of feature batches (ref evaluator.py
    FeatureStats equivalent)."""

    def __init__(self, dim: int):
        self.n = 0
        self.sum = np.zeros(dim, np.float64)
        self.outer = np.zeros((dim, dim), np.float64)

    def update(self, feats: np.ndarray):
        f = np.asarray(feats, np.float64)
        self.n += f.shape[0]
        self.sum += f.sum(0)
        self.outer += f.T @ f

    def finalize(self) -> Tuple[np.ndarray, np.ndarray]:
        mu = self.sum / self.n
        sigma = self.outer / self.n - np.outer(mu, mu)
        sigma *= self.n / max(self.n - 1, 1)
        return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """FID between two Gaussians (standard Frechet formula, as in the
    reference's TF evaluator, evaluations/c2i/evaluator.py:55-63)."""
    import scipy.linalg

    diff = mu1 - mu2
    covmean, _ = scipy.linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))
