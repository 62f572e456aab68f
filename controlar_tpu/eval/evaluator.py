"""Full c2i sample evaluator: FID / sFID / Inception Score / Precision / Recall.

One command replaces the reference's TF-session evaluator
(ref evaluations/c2i/evaluator.py:27-72): given a reference batch npz and a
sample batch npz (both `arr_0` NHWC uint8, the eval/sampler.py format), it
prints all five numbers. Feature extraction runs the JAX InceptionV3
(eval/inception.py) in jitted fixed-size batches on the accelerator; the
kNN precision/recall distance blocks are jitted matmuls as well (the
reference pushed those through a TF session for the same reason,
evaluator.py:454-500).

Reference batches that already carry mu/sigma/mu_s/sigma_s are honored
(evaluator.py:178-185).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from controlar_tpu.eval.inception import inception_features
from controlar_tpu.eval.metrics import frechet_distance


@dataclasses.dataclass
class FIDStatistics:
    mu: np.ndarray
    sigma: np.ndarray

    def frechet_distance(self, other: "FIDStatistics", eps: float = 1e-6) -> float:
        return frechet_distance(self.mu, self.sigma, other.mu, other.sigma, eps)


def compute_statistics(acts: np.ndarray) -> FIDStatistics:
    return FIDStatistics(np.mean(acts, axis=0), np.cov(acts, rowvar=False))


def _batches(arr: np.ndarray, batch_size: int) -> Iterable[np.ndarray]:
    for i in range(0, len(arr), batch_size):
        yield arr[i : i + batch_size]


class Evaluator:
    """Activation + metric computation over npz batches of images."""

    def __init__(self, inception_params, batch_size: int = 64,
                 compute_dtype=jnp.bfloat16):
        self.params = inception_params
        self.batch_size = batch_size
        self._feat = jax.jit(
            lambda p, im: inception_features(p, im, compute_dtype=compute_dtype)
        )

    def compute_activations(
        self, images: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """images: NHWC uint8 [0,255]. Returns (pool (N,2048),
        spatial (N,2023), logits (N,1008)) float32, padding-safe."""
        pools, spatials, logits = [], [], []
        bs = self.batch_size
        for batch in _batches(images, bs):
            n = len(batch)
            if n < bs:  # pad to the jit bucket, then drop
                batch = np.concatenate(
                    [batch, np.zeros((bs - n, *batch.shape[1:]), batch.dtype)]
                )
            p, s, l = self._feat(self.params, jnp.asarray(batch))
            pools.append(np.asarray(p[:n]))
            spatials.append(np.asarray(s[:n]))
            logits.append(np.asarray(l[:n]))
        return (
            np.concatenate(pools), np.concatenate(spatials), np.concatenate(logits)
        )

    # -- Inception Score (evaluator.py:193-207) --
    @staticmethod
    def inception_score(logits: np.ndarray, split_size: int = 5000) -> float:
        preds = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1), np.float64)
        scores = []
        for i in range(0, len(preds), split_size):
            part = preds[i : i + split_size]
            kl = part * (np.log(part) - np.log(np.mean(part, axis=0, keepdims=True)))
            scores.append(np.exp(np.mean(np.sum(kl, axis=1))))
        return float(np.mean(scores))

    # -- precision / recall (evaluator.py:216-224, ManifoldEstimator) --
    def compute_prec_recall(
        self, ref_acts: np.ndarray, sample_acts: np.ndarray, nhood_size: int = 3,
        row_batch: int = 10000, col_batch: int = 10000,
    ) -> Tuple[float, float]:
        radii_ref = manifold_radii(ref_acts, nhood_size, row_batch, col_batch)
        radii_smp = manifold_radii(sample_acts, nhood_size, row_batch, col_batch)
        precision = manifold_fraction(ref_acts, radii_ref, sample_acts,
                                      row_batch, col_batch)
        recall = manifold_fraction(sample_acts, radii_smp, ref_acts,
                                   row_batch, col_batch)
        return precision, recall


@jax.jit
def _pairwise_sq_dists(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distances, f32 accumulate (the reference tries f16
    and falls back, evaluator.py:466-474; f32 on TPU is both exact and fast)."""
    nu = jnp.sum(u * u, axis=1)[:, None]
    nv = jnp.sum(v * v, axis=1)[None, :]
    return jnp.maximum(nu - 2.0 * (u @ v.T) + nv, 0.0)


def manifold_radii(feats: np.ndarray, nhood_size: int = 3,
                   row_batch: int = 10000, col_batch: int = 10000) -> np.ndarray:
    """Distance to the k-th nearest neighbor (k=nhood_size, self included as
    the 0th) per sample — the hypersphere radii (evaluator.py:262-297)."""
    n = len(feats)
    f = jnp.asarray(feats, jnp.float32)
    radii = np.zeros((n,), np.float32)
    for r0 in range(0, n, row_batch):
        r1 = min(r0 + row_batch, n)
        dists = np.zeros((r1 - r0, n), np.float32)
        for c0 in range(0, n, col_batch):
            c1 = min(c0 + col_batch, n)
            dists[:, c0:c1] = np.asarray(_pairwise_sq_dists(f[r0:r1], f[c0:c1]))
        part = np.partition(dists, nhood_size, axis=1)
        radii[r0:r1] = part[:, nhood_size]
    return radii


def manifold_fraction(feats: np.ndarray, radii: np.ndarray,
                      eval_feats: np.ndarray,
                      row_batch: int = 10000, col_batch: int = 10000) -> float:
    """Fraction of eval_feats inside any hypersphere of (feats, radii)
    (evaluator.py:344-371 evaluate_pr)."""
    f = jnp.asarray(feats, jnp.float32)
    e = jnp.asarray(eval_feats, jnp.float32)
    r = jnp.asarray(radii, jnp.float32)
    inside = np.zeros((len(eval_feats),), bool)
    for r0 in range(0, len(eval_feats), row_batch):
        r1 = min(r0 + row_batch, len(eval_feats))
        hit = np.zeros((r1 - r0,), bool)
        for c0 in range(0, len(feats), col_batch):
            c1 = min(c0 + col_batch, len(feats))
            d = _pairwise_sq_dists(e[r0:r1], f[c0:c1])
            hit |= np.asarray(jnp.any(d <= r[None, c0:c1], axis=1))
        inside[r0:r1] = hit
    return float(np.mean(inside))


def load_batch(npz_path: str) -> np.ndarray:
    with np.load(npz_path) as obj:
        return obj["arr_0"]


def _maybe_precomputed_stats(
    npz_path: str,
) -> Optional[Tuple[FIDStatistics, FIDStatistics]]:
    with np.load(npz_path) as obj:
        if "mu" in obj.files:
            return (
                FIDStatistics(obj["mu"], obj["sigma"]),
                FIDStatistics(obj["mu_s"], obj["sigma_s"]),
            )
    return None


def evaluate_all(
    inception_params, ref_npz: str, sample_npz: str, batch_size: int = 64,
) -> Dict[str, float]:
    """The reference's main() protocol (evaluator.py:27-72): all 5 metrics."""
    ev = Evaluator(inception_params, batch_size=batch_size)

    sample_pool, sample_spatial, sample_logits = ev.compute_activations(
        load_batch(sample_npz)
    )
    pre = _maybe_precomputed_stats(ref_npz)
    if pre is not None:
        ref_stats, ref_stats_sp = pre
        ref_pool = None
    else:
        ref_pool, ref_spatial, _ = ev.compute_activations(load_batch(ref_npz))
        ref_stats = compute_statistics(ref_pool)
        ref_stats_sp = compute_statistics(ref_spatial)

    out = {
        "inception_score": ev.inception_score(sample_logits),
        "fid": compute_statistics(sample_pool).frechet_distance(ref_stats),
        "sfid": compute_statistics(sample_spatial).frechet_distance(ref_stats_sp),
    }
    if ref_pool is not None:
        prec, rec = ev.compute_prec_recall(ref_pool, sample_pool)
        out["precision"], out["recall"] = prec, rec
    return out
