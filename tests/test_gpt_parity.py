"""End-to-end numerical parity of the JAX GPT vs the torch reference.

Reference modules are imported from /root/reference and run with random
weights (fp32, CPU); the converted JAX model must reproduce training-mode
logits, prefill logits, and greedy decode tokens.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from controlar_tpu.config import GPTConfig
from controlar_tpu.convert.torch_gpt import convert_gpt_state_dict
from controlar_tpu.models import gpt as jgpt
from controlar_tpu import generate as jgen
from tests.ref_utils import (
    load_ref_gpt_module,
    accept_control_strength,
    disable_cfg_dropout,
    force_fp32_condition_mlp,
    randomize_zero_mlps,
    state_dict_numpy,
)


def small_cfgs(t2i: bool):
    """Tiny but structurally faithful config: 6 layers -> fusion at 0, 2, 4.

    t2i uses cls_token_num=120 because the reference CaptionEmbedder hardcodes
    a 120-row uncond embedding (gpt_t2i.py:137-140).
    """
    import torch

    ref_mod = load_ref_gpt_module(t2i=t2i)
    common = dict(
        n_layer=6,
        n_head=2,
        dim=64,
        block_size=64,
        vocab_size=512,
        num_classes=16,
        caption_dim=96,
        token_dropout_p=0.0,
        resid_dropout_p=0.0,
        ffn_dropout_p=0.0,
        drop_path_rate=0.0,
    )
    if t2i:
        ref_args = ref_mod.ModelArgs(
            model_type="t2i", cls_token_num=120, adapter_size="small", **common
        )
        cfg = GPTConfig(model_type="t2i", cls_token_num=120, adapter_size="small", **common)
    else:
        ref_args = ref_mod.ModelArgs(
            model_type="c2i", cls_token_num=1, condition_token_num=0,
            image_size=128, **common
        )
        cfg = GPTConfig(model_type="c2i", cls_token_num=1, adapter_size="small", **common)
    torch.manual_seed(0)
    model = ref_mod.Transformer(ref_args).float()
    randomize_zero_mlps(model)
    disable_cfg_dropout(model)
    if not t2i:
        force_fp32_condition_mlp(model)
        accept_control_strength(model)
    params = convert_gpt_state_dict(state_dict_numpy(model), cfg)
    params = jax.tree.map(jnp.asarray, params)
    return ref_mod, model, cfg, params


@pytest.fixture(scope="module")
def t2i_setup():
    return small_cfgs(t2i=True)


@pytest.fixture(scope="module")
def c2i_setup():
    return small_cfgs(t2i=False)


@pytest.mark.slow
def test_train_forward_t2i(t2i_setup):
    import torch

    ref_mod, model, cfg, params = t2i_setup
    rng = np.random.default_rng(1)
    b = 2
    cap = rng.standard_normal((b, cfg.cls_token_num, cfg.caption_dim)).astype(np.float32)
    idx = rng.integers(0, cfg.vocab_size, (b, cfg.block_size - 1)).astype(np.int64)
    cond_feats = rng.standard_normal((b, cfg.block_size, 384)).astype(np.float32)
    targets = rng.integers(0, cfg.vocab_size, (b, cfg.block_size)).astype(np.int64)

    model.train()
    with torch.no_grad():
        ref_logits, ref_loss = model(
            idx=torch.from_numpy(idx),
            cond_idx=torch.from_numpy(cap),
            targets=torch.from_numpy(targets),
            condition=torch.from_numpy(cond_feats),
        )

    prefix = jgpt.embed_prefix_t2i(params, jnp.asarray(cap))
    ct = jgpt.control_tokens(params, cfg, jnp.asarray(cond_feats), drop_ids=jnp.zeros(b, bool))
    logits, loss = jgpt.forward_train(
        params, cfg, prefix, jnp.asarray(idx), cond_tokens=ct,
        targets=jnp.asarray(targets),
    )
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(), atol=2e-4)
    np.testing.assert_allclose(float(loss), float(ref_loss), atol=1e-4)


def test_train_forward_c2i(c2i_setup):
    import torch

    ref_mod, model, cfg, params = c2i_setup
    rng = np.random.default_rng(2)
    b = 2
    labels = rng.integers(0, cfg.num_classes, (b,)).astype(np.int64)
    idx = rng.integers(0, cfg.vocab_size, (b, cfg.block_size - 1)).astype(np.int64)
    cond_feats = rng.standard_normal((b, cfg.block_size, 384)).astype(np.float32)
    targets = rng.integers(0, cfg.vocab_size, (b, cfg.block_size)).astype(np.int64)

    model.train()
    with torch.no_grad():
        ref_logits, ref_loss = model(
            idx=torch.from_numpy(idx),
            cond_idx=torch.from_numpy(labels),
            targets=torch.from_numpy(targets),
            condition=torch.from_numpy(cond_feats),
        )

    prefix = jgpt.embed_prefix_c2i(params, jnp.asarray(labels))
    ct = jgpt.control_tokens(params, cfg, jnp.asarray(cond_feats), drop_ids=jnp.zeros(b, bool))
    logits, loss = jgpt.forward_train(
        params, cfg, prefix, jnp.asarray(idx), cond_tokens=ct,
        targets=jnp.asarray(targets),
    )
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(), atol=2e-4)
    np.testing.assert_allclose(float(loss), float(ref_loss), atol=1e-4)


def _ref_generate(model, cond, max_new, cfg_scale, condition, emb_masks=None,
                  control_strength=None):
    import importlib
    import torch

    gen_mod = importlib.import_module("autoregressive.models.generate")
    model.eval()
    kwargs = {}
    if control_strength is not None:
        kwargs["control_strength"] = control_strength
    with torch.no_grad():
        return gen_mod.generate(
            model, cond, max_new, emb_masks=emb_masks, cfg_scale=cfg_scale,
            condition=condition, temperature=1.0, top_k=0, top_p=1.0,
            sample_logits=False, **kwargs,
        ).numpy()


def test_greedy_generate_t2i_cfg(t2i_setup):
    import torch

    ref_mod, model, cfg, params = t2i_setup
    rng = np.random.default_rng(3)
    b = 2
    cap = rng.standard_normal((b, cfg.cls_token_num, cfg.caption_dim)).astype(np.float32)
    cond_feats = rng.standard_normal((b, cfg.block_size, 384)).astype(np.float32)
    emb = np.ones((b, cfg.cls_token_num), dtype=np.float32)
    emb[0, :17] = 0  # left-padded caption
    max_new = cfg.block_size

    want = _ref_generate(
        model, torch.from_numpy(cap), max_new, 2.0,
        torch.from_numpy(cond_feats), emb_masks=torch.from_numpy(emb),
        control_strength=0.7,
    )

    got = np.asarray(jgen.generate(
        params, cfg,
        caption_emb=jnp.asarray(cap),
        emb_masks=jnp.asarray(emb),
        adapter_features=jnp.asarray(cond_feats),
        max_new_tokens=max_new, cfg_scale=2.0, sample_logits=False,
        control_strength=0.7, cache_dtype=jnp.float32,
    ))
    frac = (got == want).mean()
    assert frac == 1.0, f"greedy token mismatch: agreement {frac:.3f}"


def test_greedy_generate_c2i_cfg(c2i_setup):
    import torch

    ref_mod, model, cfg, params = c2i_setup
    rng = np.random.default_rng(4)
    b = 2
    labels = rng.integers(0, cfg.num_classes, (b,)).astype(np.int64)
    cond_feats = rng.standard_normal((b, cfg.block_size, 384)).astype(np.float32)
    max_new = cfg.block_size

    want = _ref_generate(
        model, torch.from_numpy(labels), max_new, 1.75,
        torch.from_numpy(cond_feats),
    )
    got = np.asarray(jgen.generate(
        params, cfg, labels=jnp.asarray(labels),
        adapter_features=jnp.asarray(cond_feats),
        max_new_tokens=max_new, cfg_scale=1.75, sample_logits=False,
        cache_dtype=jnp.float32,
    ))
    frac = (got == want).mean()
    assert frac == 1.0, f"greedy token mismatch: agreement {frac:.3f}"


def test_greedy_generate_t2i_no_cfg(t2i_setup):
    import torch

    ref_mod, model, cfg, params = t2i_setup
    rng = np.random.default_rng(5)
    b = 2
    cap = rng.standard_normal((b, cfg.cls_token_num, cfg.caption_dim)).astype(np.float32)
    cond_feats = rng.standard_normal((b, cfg.block_size, 384)).astype(np.float32)
    max_new = 16

    want = _ref_generate(
        model, torch.from_numpy(cap), max_new, 1.0, torch.from_numpy(cond_feats)
    )
    got = np.asarray(jgen.generate(
        params, cfg, caption_emb=jnp.asarray(cap),
        adapter_features=jnp.asarray(cond_feats),
        max_new_tokens=max_new, cfg_scale=1.0, sample_logits=False,
        cache_dtype=jnp.float32,
    ))
    assert (got == want).all()
