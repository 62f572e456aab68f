"""Multiscale training: bucket sampling respects the token budget; the step
runs at two different bucket shapes with online VQ encoding."""
import pytest
import numpy as np

import jax
import jax.numpy as jnp

from controlar_tpu.config import GPTConfig, VQConfig
from controlar_tpu.models import gpt as gpt_model, vit as vit_model, vq as vq_model
from controlar_tpu.train.optimizer import make_optimizer
from controlar_tpu.train.step import init_train_state
from controlar_tpu.train.multiscale import (

    make_multiscale_train_step,
    resolution_buckets,
    sample_bucket,
)

pytestmark = pytest.mark.slow


def test_buckets_respect_budget():
    buckets = resolution_buckets(384, 1024, 64, 2304, 16)
    assert (1024, 576) in buckets  # 64*36 = 2304 exactly
    assert (1024, 1024) not in buckets  # 4096 tokens over budget
    for h, w in buckets:
        assert (h // 16) * (w // 16) <= 2304
    rng = np.random.default_rng(0)
    hs = {sample_bucket(rng, buckets) for _ in range(50)}
    assert len(hs) > 5  # actually varies (the reference's guard never fired)


def test_multiscale_step_two_buckets():
    gpt_cfg = GPTConfig(
        model_type="t2i", dim=64, n_layer=6, n_head=2, block_size=16,
        vocab_size=64, cls_token_num=120, caption_dim=48, condition_type="canny",
    )
    ad = vit_model.ViTConfig(hidden_size=384, n_layer=1, n_head=2, patch_size=14,
                             pos_grid=4, layerscale=True)
    vq_cfg = VQConfig(codebook_size=64, codebook_embed_dim=8, z_channels=16, ch=16)
    rng = jax.random.PRNGKey(0)
    params = {
        "gpt": gpt_model.init_gpt_params(rng, gpt_cfg),
        "adapter": vit_model.init_vit_params(rng, ad),
    }
    frozen = {"vq": vq_model.init_vq_params(rng, vq_cfg)}
    tx = make_optimizer(lr=1e-3)
    state = init_train_state(rng, gpt_cfg, tx, params=params)
    step = jax.jit(
        make_multiscale_train_step(gpt_cfg, ad, vq_cfg, tx, "canny", frozen=frozen)
    )
    nprng = np.random.default_rng(1)
    for hw in [(64, 64), (64, 96)]:
        batch = {
            "images": nprng.uniform(-1, 1, (2, *hw, 3)).astype(np.float32),
            "caption_emb": nprng.standard_normal((2, 120, 48)).astype(np.float32),
            "emb_mask": np.ones((2, 120), bool),
            "valid": np.ones((2,), np.float32),
        }
        state, m = step(state, {k: jnp.asarray(v) for k, v in batch.items()},
                        jax.random.PRNGKey(2))
        assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 2
