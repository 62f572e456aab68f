"""DPT depth estimator parity vs HF DPTForDepthEstimation (tiny random cfg)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from controlar_tpu.models.dpt import DPTConfig, dpt_depth
from controlar_tpu.convert.torch_dpt import convert_dpt_state_dict

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def dpt_setup():
    import torch
    from transformers import DPTConfig as HFDPTConfig, DPTForDepthEstimation

    hf_cfg = HFDPTConfig(
        hidden_size=32, num_hidden_layers=4, num_attention_heads=2,
        intermediate_size=64, image_size=64, patch_size=16,
        backbone_out_indices=(0, 1, 2, 3),
        neck_hidden_sizes=[16, 24, 32, 32],
        reassemble_factors=[4, 2, 1, 0.5],
        fusion_hidden_size=24,
        readout_type="project",
        is_hybrid=False,
    )
    torch.manual_seed(0)
    model = DPTForDepthEstimation(hf_cfg).float().eval()
    cfg = DPTConfig(
        hidden_size=32, n_layer=4, n_head=2, mlp_dim=64, patch_size=16,
        pos_grid=4, out_indices=(0, 1, 2, 3),
        neck_hidden_sizes=(16, 24, 32, 32), reassemble_factors=(4, 2, 1, 0.5),
        fusion_hidden_size=24,
    )
    params = jax.tree.map(
        jnp.asarray, convert_dpt_state_dict(model.state_dict(), cfg)
    )
    return model, cfg, params


def test_dpt_depth_parity(dpt_setup):
    import torch

    model, cfg, params = dpt_setup
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x)).predicted_depth.numpy()
    got = np.asarray(dpt_depth(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_dpt_depth_parity_resized(dpt_setup):
    """Non-native (square) size exercises the pos-embed bilinear
    interpolation. (HF's own non-hybrid DPT asserts square inputs in its
    reassemble stage, so rectangular parity can't be cross-checked.)"""
    import torch

    model, cfg, params = dpt_setup
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 3, 96, 96)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x)).predicted_depth.numpy()
    got = np.asarray(dpt_depth(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)
