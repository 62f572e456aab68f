"""Full control-training step + trainer loop on the virtual mesh (CPU)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from controlar_tpu.config import GPTConfig
from controlar_tpu.models import gpt as gpt_model, vit as vit_model
from controlar_tpu.train.optimizer import make_optimizer
from controlar_tpu.train.step import init_train_state
from controlar_tpu.train.control_step import (

    build_t2i_attn_mask,
    extract_condition_on_device,
    make_control_train_step,
)

pytestmark = pytest.mark.slow

IMG = 64
CFG = GPTConfig(
    model_type="t2i", dim=64, n_layer=6, n_head=2, block_size=(IMG // 16) ** 2,
    vocab_size=128, cls_token_num=120, caption_dim=48, condition_type="canny",
)
# hidden must equal cfg.adapter_dim (384 for 'small')
AD = vit_model.ViTConfig(hidden_size=384, n_layer=2, n_head=2, patch_size=14,
                         pos_grid=4, layerscale=True)


def _batch(b=2, img=IMG):
    rng = np.random.default_rng(0)
    return {
        "caption_emb": rng.standard_normal((b, 120, 48)).astype(np.float32),
        "emb_mask": np.concatenate(
            [np.zeros((b, 30), bool), np.ones((b, 90), bool)], axis=1
        ),
        "tokens": rng.integers(0, 128, (b, CFG.block_size)).astype(np.int32),
        "control_image": rng.integers(0, 255, (b, img, img, 3)).astype(np.uint8),
        "valid": np.ones((b,), np.float32),
    }


def test_control_train_step_runs_and_loss_decreases():
    tx = make_optimizer(lr=3e-3)
    rng = jax.random.PRNGKey(0)
    params = {
        "gpt": gpt_model.init_gpt_params(rng, CFG),
        "adapter": vit_model.init_vit_params(rng, AD),
    }
    state = init_train_state(rng, CFG, tx, params=params)
    step = jax.jit(make_control_train_step(CFG, AD, tx, "canny"), donate_argnums=0)
    batch = {k: jnp.asarray(v) for k, v in _batch().items()}
    losses = []
    for _ in range(6):
        state, m = step(state, batch, jax.random.PRNGKey(3))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_t2i_attn_mask_matches_reference_construction():
    """Mirror ref t2i_control.py:125-139 + train slice [:-1,:-1]."""
    import torch

    b, t_cls, code_len = 2, 120, 16
    feat_lens = [90, 120]
    emb_mask = np.zeros((b, t_cls), bool)
    for i, fl in enumerate(feat_lens):
        emb_mask[i, -fl:] = True

    max_seq = t_cls + code_len
    want = []
    for i, fl in enumerate(feat_lens):
        em = torch.zeros(t_cls)
        em[-fl:] = 1
        m = torch.tril(torch.ones(max_seq, max_seq))
        m[:, :t_cls] = m[:, :t_cls] * em.unsqueeze(0)
        eye = torch.eye(max_seq)
        m = m * (1 - eye) + eye
        want.append(m.to(torch.bool)[: max_seq - 1, : max_seq - 1].numpy())
    want = np.stack(want)[:, None]

    got = np.asarray(build_t2i_attn_mask(jnp.asarray(emb_mask), code_len))
    np.testing.assert_array_equal(got, want)


def test_condition_extraction_matches_dataset_normalization():
    """Canny path: on-device map equals 2*(cv2/255-0.5) on 3 channels
    (ref t2i_control.py:144-145 + collate repeat, :78-79)."""
    import cv2

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (1, 64, 64, 3)).astype(np.uint8)
    img[0, 20:40, 20:40] = 250
    got = np.asarray(
        extract_condition_on_device({"control_image": jnp.asarray(img)}, "canny")
    )
    want_map = cv2.Canny(img[0], 100, 200)
    want = 2 * (np.repeat(want_map[..., None], 3, -1) / 255.0 - 0.5)
    agree = (np.abs(got[0] - want) < 1e-6).mean()
    assert agree > 0.99
