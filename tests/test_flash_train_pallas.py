"""Pallas training flash attention (ops/flash_train_pallas.py) parity.

Runs in interpret mode on CPU. The kernel omits the XLA path's diagonal
exception for masked-key rows (loss-invariant, see module docstring), so
output comparisons are restricted to rows whose own key column is valid and
gradient comparisons use a loss that reads only those rows — exactly the set
that determines the training loss.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from controlar_tpu.ops.flash_train import flash_attention_train
from controlar_tpu.ops.flash_train_pallas import flash_attention_train_pallas


def _naive(q, k, v, key_valid=None):
    b, t, h, d = q.shape
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) / np.sqrt(d)
    rows = np.arange(t)[:, None]
    cols = np.arange(k.shape[1])[None, :]
    allow = jnp.asarray(rows >= cols)[None, None]
    if key_valid is not None:
        allow = allow & key_valid[:, None, None, :]
    s = jnp.where(allow, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))


def test_fwd_matches_naive_causal():
    rng = np.random.default_rng(0)
    b, t, h, d = 2, 70, 3, 16
    q = rng.standard_normal((b, t, h, d)).astype(np.float32)
    k = rng.standard_normal((b, t, h, d)).astype(np.float32)
    v = rng.standard_normal((b, t, h, d)).astype(np.float32)
    got = flash_attention_train_pallas(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        q_block=32, k_block=16, interpret=True)
    want = _naive(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_fwd_matches_blockwise_on_valid_rows():
    rng = np.random.default_rng(1)
    b, t, h, d = 2, 48, 2, 8
    q = rng.standard_normal((b, t, h, d)).astype(np.float32)
    k = rng.standard_normal((b, t, h, d)).astype(np.float32)
    v = rng.standard_normal((b, t, h, d)).astype(np.float32)
    kv = np.ones((b, t), bool)
    kv[0, :7] = False  # left-padded caption columns
    kv[1, :3] = False
    got = flash_attention_train_pallas(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(kv),
        q_block=16, k_block=16, interpret=True)
    want = flash_attention_train(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(kv),
        q_block=16, k_block=16)
    mask = kv[:, :, None, None]
    np.testing.assert_allclose(np.asarray(got) * mask,
                               np.asarray(want) * mask,
                               rtol=2e-2, atol=2e-2)


def test_grads_match_blockwise_with_mask():
    """Parameter-relevant gradients: the loss reads only valid-row outputs
    (mirroring forward_train, which slices prefix logits away and masks
    padded key columns everywhere)."""
    rng = np.random.default_rng(2)
    b, t, h, d = 2, 40, 2, 8
    q = rng.standard_normal((b, t, h, d)).astype(np.float32)
    k = rng.standard_normal((b, t, h, d)).astype(np.float32)
    v = rng.standard_normal((b, t, h, d)).astype(np.float32)
    kv = np.ones((b, t), bool)
    kv[0, :5] = False
    kv[1, :9] = False
    w = jnp.asarray(kv)[:, :, None, None].astype(jnp.float32)
    co = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))

    def loss_pallas(q, k, v):
        out = flash_attention_train_pallas(
            q, k, v, jnp.asarray(kv), q_block=16, k_block=16, interpret=True)
        return jnp.sum(out * w * co)

    def loss_block(q, k, v):
        out = flash_attention_train(
            q, k, v, jnp.asarray(kv), q_block=16, k_block=16)
        return jnp.sum(out * w * co)

    args = (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    lp, gp = jax.value_and_grad(loss_pallas, argnums=(0, 1, 2))(*args)
    lb, gb = jax.value_and_grad(loss_block, argnums=(0, 1, 2))(*args)
    np.testing.assert_allclose(float(lp), float(lb), rtol=2e-2)
    for a, bq, name in zip(gp, gb, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bq),
                                   rtol=4e-2, atol=4e-2,
                                   err_msg=f"d{name}")


def test_odd_shapes_and_padding():
    rng = np.random.default_rng(3)
    b, t, h, d = 1, 37, 1, 8
    q = rng.standard_normal((b, t, h, d)).astype(np.float32)
    k = rng.standard_normal((b, t, h, d)).astype(np.float32)
    v = rng.standard_normal((b, t, h, d)).astype(np.float32)
    got = flash_attention_train_pallas(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        q_block=16, k_block=16, interpret=True)
    assert got.shape == (b, t, h, d)
    want = _naive(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_remat_composes():
    """jax.checkpoint around the custom-vjp kernel (the layer-scan remat)."""
    rng = np.random.default_rng(4)
    b, t, h, d = 1, 32, 1, 8
    q = rng.standard_normal((b, t, h, d)).astype(np.float32)
    k = rng.standard_normal((b, t, h, d)).astype(np.float32)
    v = rng.standard_normal((b, t, h, d)).astype(np.float32)

    def f(q, k, v):
        out = flash_attention_train_pallas(
            q, k, v, q_block=16, k_block=16, interpret=True)
        return jnp.sum(out ** 2)

    g1 = jax.grad(f)(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    g2 = jax.grad(jax.checkpoint(f))(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-5)
