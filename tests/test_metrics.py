"""Metric parity: F1 vs sklearn, RMSE vs numpy, MS-SSIM sanity + skimage
cross-check at single scale behavior."""
import numpy as np

import jax.numpy as jnp

from controlar_tpu.eval.metrics import (
    F1score, RMSE, SSIM, FIDStats, frechet_distance, ms_ssim,
)
import pytest


def test_f1_matches_sklearn():
    from sklearn.metrics import f1_score

    rng = np.random.default_rng(0)
    a = rng.integers(0, 255, (64, 64)).astype(np.uint8)
    b = rng.integers(0, 255, (64, 64)).astype(np.uint8)
    m = F1score(threshold=128)
    m.update(a, b)
    want = f1_score((a > 128).astype(int).ravel(), (b > 128).astype(int).ravel())
    assert abs(m.calculate() - want) < 1e-9


def test_rmse():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((32, 32))
    b = rng.standard_normal((32, 32))
    m = RMSE()
    m.update(a, b)
    assert abs(m.calculate() - np.sqrt(np.mean((a - b) ** 2))) < 1e-9


@pytest.mark.slow
def test_ms_ssim_identity_and_monotonicity():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (1, 192, 192, 1)).astype(np.float32)
    same = float(ms_ssim(jnp.asarray(img), jnp.asarray(img))[0])
    assert same > 0.999
    noisy1 = np.clip(img + rng.normal(0, 0.05, img.shape), 0, 1).astype(np.float32)
    noisy2 = np.clip(img + rng.normal(0, 0.25, img.shape), 0, 1).astype(np.float32)
    s1 = float(ms_ssim(jnp.asarray(img), jnp.asarray(noisy1))[0])
    s2 = float(ms_ssim(jnp.asarray(img), jnp.asarray(noisy2))[0])
    assert same > s1 > s2


def test_fid_stats_and_distance():
    rng = np.random.default_rng(3)
    f1 = rng.standard_normal((2000, 8))
    f2 = rng.standard_normal((2000, 8)) + 1.0
    s1, s2 = FIDStats(8), FIDStats(8)
    s1.update(f1)
    s2.update(f2)
    mu1, sig1 = s1.finalize()
    mu2, sig2 = s2.finalize()
    np.testing.assert_allclose(mu1, f1.mean(0), atol=1e-12)
    np.testing.assert_allclose(sig1, np.cov(f1, rowvar=False), atol=1e-9)
    d_self = frechet_distance(mu1, sig1, mu1, sig1)
    d_cross = frechet_distance(mu1, sig1, mu2, sig2)
    assert abs(d_self) < 1e-6
    assert d_cross > 5.0  # ~ ||1||^2 * 8
