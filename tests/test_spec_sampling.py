"""Leviathan speculative SAMPLING: the accept/reject must preserve the
target distribution exactly (Leviathan et al. 2023), and the generate path
must degenerate to the provably-lossless greedy sequence at top_k=1.
"""
import jax
import jax.numpy as jnp
import numpy as np

from controlar_tpu import decode as dec
from controlar_tpu import spec_decode as sd
from controlar_tpu.config import gpt_config
from controlar_tpu.models import gpt as jgpt


def test_accept_preserves_target_distribution():
    """K=2 (one draft): the emitted first token's distribution must equal
    the target p REGARDLESS of the draft q. 200k vectorized trials per
    (p, q) pair; chi-square-style tolerance on a 6-way categorical."""
    v, n = 6, 200_000
    rng = np.random.default_rng(0)
    for trial in range(3):
        p = rng.dirichlet(np.ones(v)).astype(np.float32)
        q = rng.dirichlet(np.ones(v) * (0.3 + trial)).astype(np.float32)

        key = jax.random.PRNGKey(trial)
        kd, ka = jax.random.split(key)
        drafts = jax.random.categorical(
            kd, jnp.log(jnp.asarray(q))[None, :].repeat(n, 0), axis=-1
        ).astype(jnp.int32)[:, None]                     # (n, 1) ~ q
        qprobs = jnp.broadcast_to(jnp.asarray(q), (n, 1, v))
        # pprobs position 0 = target for the drafted token; position 1 (the
        # all-accepted bonus) is arbitrary here — use p as well
        pprobs = jnp.broadcast_to(jnp.asarray(p), (n, 2, v))
        m, tokens_row, cur = sd.speculative_accept(drafts, qprobs, pprobs, ka)
        emitted = np.asarray(tokens_row[np.arange(n), 0])  # first emitted
        freq = np.bincount(emitted, minlength=v) / n
        # tolerance ~4 sigma of a binomial at n=200k
        tol = 4 * np.sqrt(p * (1 - p) / n) + 1e-4
        assert np.all(np.abs(freq - p) <= tol), (freq, p, tol)
        # acceptance rate must match sum(min(p, q))
        acc = float(np.asarray(m).mean())
        exp_acc = float(np.minimum(p, q).sum())
        assert abs(acc - exp_acc) < 0.01, (acc, exp_acc)


def test_accept_identical_dists_accepts_everything():
    v, n, km1 = 8, 4096, 3
    p = np.full(v, 1.0 / v, np.float32)
    key = jax.random.PRNGKey(1)
    drafts = jax.random.randint(key, (n, km1), 0, v, jnp.int32)
    probs = jnp.broadcast_to(jnp.asarray(p), (n, km1, v))
    pp = jnp.broadcast_to(jnp.asarray(p), (n, km1 + 1, v))
    m, tokens_row, cur = sd.speculative_accept(drafts, probs, pp, key)
    # p == q -> ratio 1 -> all drafts accepted
    assert int(np.asarray(m).min()) == km1
    np.testing.assert_array_equal(np.asarray(tokens_row[:, :km1]),
                                  np.asarray(drafts))


def _tiny():
    return gpt_config(
        "GPT-B", model_type="c2i", cls_token_num=1, block_size=64,
        vocab_size=128, num_classes=10, n_layer=2, dim=128, n_head=2,
    )


def test_topk1_sampling_equals_greedy():
    """top_k=1 sampling collapses to argmax: must emit the exact greedy
    sequence (which is itself provably the vanilla target sequence)."""
    cfg = _tiny()
    params = jgpt.init_gpt_params(jax.random.PRNGKey(0), cfg,
                                  dtype=jnp.float32)
    labels = jnp.arange(4) % cfg.num_classes

    greedy = sd.generate_spec(
        params, cfg, params, labels=labels, max_new_tokens=12, k_draft=3,
        use_flash=False)
    sampled = sd.generate_spec(
        params, cfg, params, labels=labels, max_new_tokens=12, k_draft=3,
        use_flash=False, rng=jax.random.PRNGKey(7), top_k=1)
    np.testing.assert_array_equal(np.asarray(sampled), np.asarray(greedy))


def test_sampling_runs_and_accepts_with_self_draft():
    """Self-draft at equal precision: p == q at every position, so every
    draft must be accepted (acceptance == k)."""
    cfg = _tiny()
    params = jgpt.init_gpt_params(jax.random.PRNGKey(2), cfg,
                                  dtype=jnp.float32)
    labels = jnp.arange(4) % cfg.num_classes
    toks, stats = sd.generate_spec(
        params, cfg, params, labels=labels, max_new_tokens=12, k_draft=3,
        use_flash=False, rng=jax.random.PRNGKey(3), temperature=1.0,
        top_k=0, return_stats=True)
    assert toks.shape == (4, 12)
    a = np.asarray(toks)
    assert a.min() >= 0 and a.max() < cfg.vocab_size
    acc = float(stats["accepted_per_cycle"])
    assert acc == 3.0, acc
    # different seed -> different sequence (it really samples)
    toks2 = sd.generate_spec(
        params, cfg, params, labels=labels, max_new_tokens=12, k_draft=3,
        use_flash=False, rng=jax.random.PRNGKey(4))
    assert np.any(np.asarray(toks2) != a)
