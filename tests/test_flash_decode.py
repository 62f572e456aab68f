"""Flash-decode kernel correctness (interpret mode, CPU) vs naive attention."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from controlar_tpu.ops.flash_decode2 import flash_decode_attention2


def _naive(kc, vc, q, pos, H):
    B, S, HD = kc.shape
    D = HD // H
    k4 = kc.reshape(B, S, H, D)
    v4 = vc.reshape(B, S, H, D)
    q4 = q.reshape(B, H, D)
    out = np.zeros((B, H, D), np.float32)
    for b in range(B):
        for h in range(H):
            s = (k4[b, :, h] @ q4[b, h]) / np.sqrt(D)
            s[pos + 1:] = -np.inf
            p = np.exp(s - s.max())
            p /= p.sum()
            out[b, h] = p @ v4[b, :, h]
    return out.reshape(B, HD)


def _interleave(kc, vc):
    return np.concatenate([kc, vc], axis=-1)


@pytest.mark.parametrize("pos", [0, 1, 63, 200, 511])
def test_flash_decode_matches_naive(pos):
    B, S, H, D = 2, 512, 4, 64
    HD = H * D
    rng = np.random.default_rng(pos)
    kc = np.zeros((B, S, HD), np.float32)
    vc = np.zeros((B, S, HD), np.float32)
    kc[:, : pos + 1] = rng.standard_normal((B, pos + 1, HD))
    vc[:, : pos + 1] = rng.standard_normal((B, pos + 1, HD))
    q = (rng.standard_normal((B, HD)) * 0.3).astype(np.float32)

    kcb = np.asarray(jnp.asarray(kc, jnp.bfloat16), np.float32)
    vcb = np.asarray(jnp.asarray(vc, jnp.bfloat16), np.float32)
    qb = np.asarray(jnp.asarray(q, jnp.bfloat16), np.float32)
    want = _naive(kcb, vcb, qb, pos, H)

    out = flash_decode_attention2(
        jnp.asarray(q),
        jnp.asarray(_interleave(kc, vc), jnp.bfloat16),
        jnp.asarray(pos),
        n_head=H,
        block=128,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out, np.float32), want, atol=2e-2)


def test_flash_decode_per_slot_positions():
    """Distinct per-slot depths (the serving engine's case)."""
    B, S, H, D = 4, 256, 4, 64
    HD = H * D
    rng = np.random.default_rng(7)
    kc = rng.standard_normal((B, S, HD)).astype(np.float32) * 0.3
    vc = rng.standard_normal((B, S, HD)).astype(np.float32) * 0.3
    q = (rng.standard_normal((B, HD)) * 0.3).astype(np.float32)
    pos = np.array([0, 120, 128, 255], np.int32)

    kcb = np.asarray(jnp.asarray(kc, jnp.bfloat16), np.float32)
    vcb = np.asarray(jnp.asarray(vc, jnp.bfloat16), np.float32)
    qb = np.asarray(jnp.asarray(q, jnp.bfloat16), np.float32)
    want = np.stack([
        _naive(kcb[b: b + 1], vcb[b: b + 1], qb[b: b + 1], int(pos[b]), H)[0]
        for b in range(B)
    ])
    out = flash_decode_attention2(
        jnp.asarray(q), jnp.asarray(_interleave(kc, vc), jnp.bfloat16),
        jnp.asarray(pos), n_head=H, block=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out, np.float32), want, atol=2e-2)


def test_flash_decode_column_bias():
    """Prefix column masking via additive bias (left-padded t2i captions)."""
    B, S, H, D = 2, 256, 4, 64
    HD = H * D
    rng = np.random.default_rng(9)
    kc = rng.standard_normal((B, S, HD)).astype(np.float32) * 0.3
    vc = rng.standard_normal((B, S, HD)).astype(np.float32) * 0.3
    q = (rng.standard_normal((B, HD)) * 0.3).astype(np.float32)
    pos = 200
    masked = np.zeros((B, S), bool)
    masked[0, :40] = True  # left-pad of sequence 0 excluded
    bias = np.where(masked, -1e9, 0.0).astype(np.float32)

    kcb = np.asarray(jnp.asarray(kc, jnp.bfloat16), np.float32)
    vcb = np.asarray(jnp.asarray(vc, jnp.bfloat16), np.float32)
    qb = np.asarray(jnp.asarray(q, jnp.bfloat16), np.float32)
    want = np.zeros((B, HD), np.float32)
    for b in range(B):
        k4 = kcb[b].reshape(S, H, D)
        v4 = vcb[b].reshape(S, H, D)
        q4 = qb[b].reshape(H, D)
        for h in range(H):
            s = (k4[:, h] @ q4[h]) / np.sqrt(D)
            s[pos + 1:] = -np.inf
            s = s + bias[b]
            p = np.exp(s - s.max())
            p /= p.sum()
            want[b, h * D:(h + 1) * D] = p @ v4[:, h]

    out = flash_decode_attention2(
        jnp.asarray(q), jnp.asarray(_interleave(kc, vc), jnp.bfloat16),
        jnp.asarray(pos), jnp.asarray(bias), n_head=H, block=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out, np.float32), want, atol=2e-2)
