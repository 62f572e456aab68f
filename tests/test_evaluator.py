"""FID/sFID/IS/Precision/Recall evaluator (eval/evaluator.py + eval/inception.py).

No released Inception weights exist in this environment, so the feature
extractor runs under random weights here; the metric math is pinned against
closed forms / sklearn-style fixtures, and the converter is exercised through
an export->convert round trip (the same harness runs unchanged the moment the
pytorch-fid checkpoint is on disk)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from controlar_tpu.eval import evaluator as ev
from controlar_tpu.eval import inception as inc
from controlar_tpu.convert.torch_inception import (

    convert_inception_state_dict,
    export_inception_state_dict,
)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def params():
    return inc.init_inception_params(jax.random.PRNGKey(0))


def test_inception_shapes(params):
    imgs = np.random.default_rng(0).integers(0, 256, (2, 64, 64, 3), np.uint8)
    pool, spatial, logits = jax.jit(inc.inception_features)(params, jnp.asarray(imgs))
    assert pool.shape == (2, inc.POOL_DIM)
    assert spatial.shape == (2, inc.SPATIAL_DIM)
    assert logits.shape == (2, inc.NUM_LOGITS)
    assert np.isfinite(np.asarray(pool)).all()


def test_resize_bilinear_tf1_convention():
    # identity at same size; exact legacy sampling src = dst * in/out
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    np.testing.assert_allclose(
        np.asarray(inc.resize_bilinear_tf1(x, 4, 4)), np.asarray(x)
    )
    # upsample 2 -> 4 along one axis: src positions 0, 0.5, 1.0, 1.5(clamped)
    r = jnp.asarray([[0.0, 2.0]]).reshape(1, 1, 2, 1)
    out = np.asarray(inc.resize_bilinear_tf1(r, 1, 4)).ravel()
    np.testing.assert_allclose(out, [0.0, 1.0, 2.0, 2.0])


def test_converter_roundtrip(params):
    sd = export_inception_state_dict(params)
    # torch-style shape check on a known conv: OIHW
    assert sd["Mixed_5b.branch5x5_2.conv.weight"].shape == (64, 48, 5, 5)
    assert sd["fc.weight"].shape == (inc.NUM_LOGITS, inc.POOL_DIM)
    back = convert_inception_state_dict(sd)
    a = jax.tree.leaves(params)
    b = jax.tree.leaves(back)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_inception_score_closed_forms():
    # uniform predictions -> IS = 1
    n, c = 60, 10
    logits = np.zeros((n, c))
    assert ev.Evaluator.inception_score(logits) == pytest.approx(1.0, abs=1e-5)
    # perfectly confident, perfectly diverse (equal class counts) -> IS = c
    logits = np.eye(c)[np.arange(n) % c] * 60.0
    assert ev.Evaluator.inception_score(logits) == pytest.approx(c, rel=1e-3)


def test_frechet_identical_and_shifted():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(2000, 8))
    sa = ev.compute_statistics(a)
    assert sa.frechet_distance(sa) == pytest.approx(0.0, abs=1e-6)
    b = a + 3.0  # pure mean shift: FID = ||dmu||^2 = 8 * 9
    sb = ev.compute_statistics(b)
    assert sa.frechet_distance(sb) == pytest.approx(72.0, abs=1e-6)


def test_precision_recall_extremes():
    rng = np.random.default_rng(2)
    ref = rng.normal(size=(200, 4)).astype(np.float32)
    # identical sets: P = R = 1 (every point inside its own sphere)
    p, r = ev.Evaluator.__dict__["compute_prec_recall"](None, ref, ref.copy())
    assert p == pytest.approx(1.0)
    assert r == pytest.approx(1.0)
    # far-disjoint sets: P = R = 0
    far = ref + 1000.0
    p, r = ev.Evaluator.__dict__["compute_prec_recall"](None, ref, far)
    assert p == pytest.approx(0.0)
    assert r == pytest.approx(0.0)


def test_manifold_radii_matches_bruteforce():
    rng = np.random.default_rng(3)
    f = rng.normal(size=(50, 6)).astype(np.float32)
    radii = ev.manifold_radii(f, nhood_size=3, row_batch=16, col_batch=16)
    d = ((f[:, None] - f[None]) ** 2).sum(-1)
    expect = np.sort(d, axis=1)[:, 3]
    np.testing.assert_allclose(radii, expect, rtol=1e-4, atol=1e-4)


def test_evaluate_all_end_to_end(tmp_path, params):
    """Full protocol on tiny random image batches: all five numbers come out
    finite, FID(batch, itself) == 0, and precomputed mu/sigma refs are used."""
    rng = np.random.default_rng(4)
    imgs = rng.integers(0, 256, (8, 32, 32, 3), np.uint8)
    ref_p, smp_p = tmp_path / "ref.npz", tmp_path / "smp.npz"
    np.savez(ref_p, arr_0=imgs)
    np.savez(smp_p, arr_0=imgs)
    out = ev.evaluate_all(params, str(ref_p), str(smp_p), batch_size=4)
    assert set(out) == {"inception_score", "fid", "sfid", "precision", "recall"}
    assert out["fid"] == pytest.approx(0.0, abs=1e-2)
    assert out["sfid"] == pytest.approx(0.0, abs=1e-2)
    assert out["precision"] == 1.0 and out["recall"] == 1.0

    # precomputed-stats reference path (ref evaluator.py:178-185)
    e = ev.Evaluator(params, batch_size=4)
    pool, spatial, _ = e.compute_activations(imgs)
    s, ss = ev.compute_statistics(pool), ev.compute_statistics(spatial)
    np.savez(tmp_path / "ref_stats.npz", arr_0=np.zeros(1),
             mu=s.mu, sigma=s.sigma, mu_s=ss.mu, sigma_s=ss.sigma)
    out2 = ev.evaluate_all(params, str(tmp_path / "ref_stats.npz"), str(smp_p),
                           batch_size=4)
    assert out2["fid"] == pytest.approx(0.0, abs=1e-2)
    assert "precision" not in out2  # needs raw ref activations
