"""Flash training attention (ops/flash_train.py) parity vs the einsum path.

The reference trains through F.scaled_dot_product_attention flash kernels
(ref autoregressive/models/gpt_t2i.py:282-286); our einsum path materializes
(B,H,T,S) fp32 scores and exists only for parity. These tests pin the
blockwise flash path to it: raw op vs naive attention (forward + gradients),
then full forward_train teacher-forced logits + parameter gradients,
including t2i emb-mask batches where caption columns are masked with the
diagonal exception.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controlar_tpu.config import gpt_config
from controlar_tpu.models import gpt as jgpt
from controlar_tpu.ops.flash_train import flash_attention_train
from controlar_tpu.train.control_step import build_t2i_attn_mask, t2i_key_valid


def _naive(q, k, v, key_valid=None, q_offset=0):
    b, t, h, d = q.shape
    s = k.shape[1]
    sc = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                    preferred_element_type=jnp.float32) / np.sqrt(d)
    qa = q_offset + np.arange(t)[:, None]
    sa = np.arange(s)[None, :]
    m = jnp.asarray(qa >= sa)[None, None]
    if key_valid is not None:
        m = m & (key_valid[:, None, None, :] | jnp.asarray(qa == sa)[None, None])
    sc = jnp.where(m, sc, -jnp.inf)
    p = jax.nn.softmax(sc, -1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@pytest.mark.parametrize(
    "b,t,h,d,qb,kb,maskp,off",
    [
        (2, 64, 4, 16, 16, 32, None, 0),
        (2, 100, 3, 8, 32, 16, 0.3, 0),
        (1, 7, 2, 4, 256, 512, 0.5, 0),      # single padded block
        (2, 37, 2, 8, 16, 16, 0.4, 0),       # odd T, padded tail
        (1, 33, 2, 8, 8, 8, None, 21),       # q_offset (prefill-style)
    ],
)
def test_flash_matches_naive(b, t, h, d, qb, kb, maskp, off):
    rng = np.random.default_rng(0)
    s = t + off
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    key_valid = None
    if maskp is not None:
        kvm = rng.random((b, s)) > maskp
        kvm[:, s // 2:] = True  # image columns always valid
        key_valid = jnp.asarray(kvm)

    out_ref = _naive(q, k, v, key_valid, off)
    out = flash_attention_train(q, k, v, key_valid, q_offset=off,
                                q_block=qb, k_block=kb)
    np.testing.assert_allclose(out, out_ref, atol=2e-5, rtol=1e-5)

    g_ref = jax.grad(lambda *a: jnp.sum(jnp.sin(_naive(*a, key_valid, off))),
                     argnums=(0, 1, 2))(q, k, v)
    g = jax.grad(
        lambda *a: jnp.sum(jnp.sin(flash_attention_train(
            *a, key_valid, q_offset=off, q_block=qb, k_block=kb))),
        argnums=(0, 1, 2))(q, k, v)
    for a, bb in zip(g, g_ref):
        np.testing.assert_allclose(a, bb, atol=5e-5, rtol=1e-4)


def test_fully_masked_prefix_is_nan_free():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((2, 40, 2, 8)), jnp.float32)
    kvm = np.zeros((2, 40), bool)
    kvm[:, 20:] = True  # every caption column dropped -> diagonal exception
    out = flash_attention_train(q, q, q, jnp.asarray(kvm),
                                q_block=8, k_block=8)
    grad = jax.grad(lambda x: jnp.sum(flash_attention_train(
        x, x, x, jnp.asarray(kvm), q_block=8, k_block=8)))(q)
    assert not bool(jnp.any(jnp.isnan(out)))
    assert not bool(jnp.any(jnp.isnan(grad)))


def _t2i_setup(seed=0, b=2, code_len=36, t_cls=12):
    cfg = gpt_config(
        "GPT-B", n_layer=3, n_head=4, dim=64, model_type="t2i",
        cls_token_num=t_cls, block_size=code_len, vocab_size=128,
        caption_dim=32, token_dropout_p=0.0, resid_dropout_p=0.0,
        ffn_dropout_p=0.0,
    )
    params = jgpt.init_gpt_params(jax.random.PRNGKey(seed), cfg)
    rng = np.random.default_rng(seed)
    cap = jnp.asarray(rng.standard_normal((b, t_cls, 32)), jnp.float32)
    emb_mask = np.ones((b, t_cls), bool)
    emb_mask[0, :7] = False  # left-padded caption
    emb_mask[1, :3] = False
    emb_mask = jnp.asarray(emb_mask)
    tokens = jnp.asarray(rng.integers(0, 128, (b, code_len)), jnp.int32)
    feats = jnp.asarray(
        rng.standard_normal((b, code_len, cfg.adapter_dim)), jnp.float32)
    return cfg, params, cap, emb_mask, tokens, feats


def _t2i_loss(params, cfg, cap, emb_mask, tokens, feats, impl):
    prefix = jgpt.embed_prefix_t2i(params, cap)
    cond = jgpt.control_tokens(params, cfg, feats)
    kwargs = {}
    if impl == "einsum_mask":
        kwargs["mask"] = build_t2i_attn_mask(emb_mask, tokens.shape[1])
    elif impl == "einsum_kv":
        kwargs["key_valid"] = t2i_key_valid(emb_mask, tokens.shape[1])
        kwargs["attn_impl"] = "einsum"
    else:
        kwargs["key_valid"] = t2i_key_valid(emb_mask, tokens.shape[1])
        kwargs["attn_impl"] = "blockwise"
    logits, loss = jgpt.forward_train(
        params, cfg, prefix, tokens[:, :-1], cond_tokens=cond,
        targets=tokens, **kwargs)
    return logits, loss


def test_forward_train_blockwise_matches_einsum_t2i():
    """Teacher-forced logits + loss grads match across all three mask forms."""
    cfg, params, cap, emb_mask, tokens, feats = _t2i_setup()
    lg_mask, ls_mask = _t2i_loss(params, cfg, cap, emb_mask, tokens, feats,
                                 "einsum_mask")
    lg_kv, ls_kv = _t2i_loss(params, cfg, cap, emb_mask, tokens, feats,
                             "einsum_kv")
    lg_fl, ls_fl = _t2i_loss(params, cfg, cap, emb_mask, tokens, feats,
                             "blockwise")
    # key_valid-materialized einsum mask == the reference-style dense mask
    np.testing.assert_allclose(lg_kv, lg_mask, atol=1e-5, rtol=1e-5)
    # flash == einsum
    np.testing.assert_allclose(lg_fl, lg_mask, atol=3e-4, rtol=1e-4)
    np.testing.assert_allclose(float(ls_fl), float(ls_mask), atol=1e-5)

    g_ein = jax.grad(
        lambda p: _t2i_loss(p, cfg, cap, emb_mask, tokens, feats,
                            "einsum_mask")[1])(params)
    g_fl = jax.grad(
        lambda p: _t2i_loss(p, cfg, cap, emb_mask, tokens, feats,
                            "blockwise")[1])(params)
    flat_e, _ = jax.flatten_util.ravel_pytree(g_ein)
    flat_f, _ = jax.flatten_util.ravel_pytree(g_fl)
    np.testing.assert_allclose(flat_f, flat_e, atol=5e-5, rtol=1e-3)


def test_forward_train_blockwise_matches_einsum_c2i():
    cfg = gpt_config(
        "GPT-B", n_layer=3, n_head=4, dim=64, model_type="c2i",
        cls_token_num=1, block_size=49, vocab_size=128, grid_hw=(7, 7),
        token_dropout_p=0.0, resid_dropout_p=0.0, ffn_dropout_p=0.0,
    )
    params = jgpt.init_gpt_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(3)
    labels = jnp.asarray([5, 9], jnp.int32)
    tokens = jnp.asarray(rng.integers(0, 128, (2, 49)), jnp.int32)
    prefix = jgpt.embed_prefix_c2i(params, labels)

    def run(impl):
        return jgpt.forward_train(params, cfg, prefix, tokens[:, :-1],
                                  targets=tokens, attn_impl=impl)

    lg_e, ls_e = run("einsum")
    lg_f, ls_f = run("blockwise")
    np.testing.assert_allclose(lg_f, lg_e, atol=3e-4, rtol=1e-4)

    def loss(p, impl):
        pre = jgpt.embed_prefix_c2i(p, labels)
        return jgpt.forward_train(p, cfg, pre, tokens[:, :-1],
                                  targets=tokens, attn_impl=impl)[1]

    ge, _ = jax.flatten_util.ravel_pytree(jax.grad(loss)(params, "einsum"))
    gf, _ = jax.flatten_util.ravel_pytree(jax.grad(loss)(params, "blockwise"))
    np.testing.assert_allclose(gf, ge, atol=5e-5, rtol=1e-3)


def test_blockwise_rejects_dense_mask():
    cfg, params, cap, emb_mask, tokens, feats = _t2i_setup()
    prefix = jgpt.embed_prefix_t2i(params, cap)
    with pytest.raises(ValueError):
        jgpt.forward_train(
            params, cfg, prefix, tokens[:, :-1],
            mask=build_t2i_attn_mask(emb_mask, tokens.shape[1]),
            attn_impl="blockwise")


def test_blockwise_composes_with_remat():
    """jax.checkpoint in the layer scan must compose with the custom VJP."""
    cfg, params, cap, emb_mask, tokens, feats = _t2i_setup()

    def loss(p, policy):
        prefix = jgpt.embed_prefix_t2i(p, cap)
        cond = jgpt.control_tokens(p, cfg, feats)
        _, l = jgpt.forward_train(
            p, cfg, prefix, tokens[:, :-1], cond_tokens=cond,
            key_valid=t2i_key_valid(emb_mask, tokens.shape[1]),
            targets=tokens, rng=jax.random.PRNGKey(0),
            deterministic=False, remat_policy=policy)
        return l

    g_full, _ = jax.flatten_util.ravel_pytree(
        jax.grad(lambda p: loss(p, "full"))(params))
    g_none, _ = jax.flatten_util.ravel_pytree(
        jax.grad(lambda p: loss(p, "none"))(params))
    np.testing.assert_allclose(g_full, g_none, atol=1e-5, rtol=1e-4)
    assert not bool(jnp.any(jnp.isnan(g_full)))
