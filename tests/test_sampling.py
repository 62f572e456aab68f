"""Sampling filter semantics vs the reference's top-k/top-p definitions."""
import numpy as np

import jax
import jax.numpy as jnp

from controlar_tpu.ops.sampling import top_k_top_p_filter, sample_tokens


def test_top_k_matches_exact_topk():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((8, 16384)).astype(np.float32))
    got = top_k_top_p_filter(logits, top_k=2000)
    kth = jnp.sort(logits, axis=-1)[:, -2000][:, None]
    want = jnp.where(logits < kth, -jnp.inf, logits)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_top_p_keeps_first_crossing_token():
    # reference semantics: the token that crosses the threshold is kept
    # (shift-right trick, ref generate.py:45-51)
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    out = np.asarray(top_k_top_p_filter(logits, top_p=0.6))
    assert np.isfinite(out[0, 0]) and np.isfinite(out[0, 1])
    assert out[0, 2] == -np.inf and out[0, 3] == -np.inf


def test_sample_tokens_greedy_and_range():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((4, 128)).astype(np.float32))
    greedy = sample_tokens(jax.random.PRNGKey(0), logits, sample_logits=False)
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(jnp.argmax(logits, -1)))
    sampled = sample_tokens(jax.random.PRNGKey(0), logits, top_k=10)
    assert ((np.asarray(sampled) >= 0) & (np.asarray(sampled) < 128)).all()
    # top-k constraint holds: sampled token must be within top-10
    topk_sets = np.argsort(np.asarray(logits), axis=-1)[:, -10:]
    for b, t in enumerate(np.asarray(sampled)):
        assert t in topk_sets[b]

