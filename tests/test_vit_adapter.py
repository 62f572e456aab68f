"""Control-encoder (DINOv2/ViT) parity vs HF torch models at random init,
plus torch-interpolate parity of the resize ops."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from controlar_tpu.models.vit import ViTConfig, vit_forward
from controlar_tpu.convert.torch_vit import convert_hf_vit_state_dict
from controlar_tpu.ops.resize import resize2d, to_patch14


@pytest.mark.parametrize("mode,align", [
    ("nearest", False), ("bilinear", False), ("bilinear", True),
    ("bicubic", False), ("bicubic", True),
])
def test_resize_matches_torch(mode, align):
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 13, 17, 3)).astype(np.float32)
    out_hw = (28, 9)
    kwargs = {} if mode == "nearest" else {"align_corners": align}
    want = F.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), size=out_hw, mode=mode, **kwargs
    ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(resize2d(jnp.asarray(x), *out_hw, mode=mode, align_corners=align))
    np.testing.assert_allclose(got, want, atol=1e-5)


def _tiny_dinov2():
    from transformers import Dinov2Config, Dinov2Model

    hf_cfg = Dinov2Config(
        hidden_size=32, num_hidden_layers=3, num_attention_heads=2,
        mlp_ratio=4, image_size=70, patch_size=14, layerscale_value=1.0,
    )
    import torch

    torch.manual_seed(0)
    model = Dinov2Model(hf_cfg).eval()
    cfg = ViTConfig(hidden_size=32, n_layer=3, n_head=2, patch_size=14,
                    pos_grid=5, layerscale=True, layer_norm_eps=1e-6)
    params = jax.tree.map(
        jnp.asarray, convert_hf_vit_state_dict(model.state_dict(), cfg, "dinov2")
    )
    return model, cfg, params


def test_dinov2_parity_native_grid():
    import torch

    model, cfg, params = _tiny_dinov2()
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, 70, 70)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x)).last_hidden_state[:, 1:].numpy()
    got = np.asarray(vit_forward(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_dinov2_parity_interpolated_grid():
    """Non-native grid exercises the pos-embed bicubic interpolation — the
    path the adapter always hits at 512px (448x448 /14 = 32x32 vs native 5x5
    here)."""
    import torch

    model, cfg, params = _tiny_dinov2()
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 3, 42, 98)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x)).last_hidden_state[:, 1:].numpy()
    got = np.asarray(vit_forward(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_vit_small_flavor_parity():
    import torch
    from transformers import ViTConfig as HFViTConfig, ViTModel

    hf_cfg = HFViTConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, image_size=32, patch_size=16,
    )
    torch.manual_seed(0)
    model = ViTModel(hf_cfg, add_pooling_layer=False).eval()
    cfg = ViTConfig(hidden_size=32, n_layer=2, n_head=2, patch_size=16,
                    pos_grid=2, layerscale=False, layer_norm_eps=1e-12)
    params = jax.tree.map(
        jnp.asarray, convert_hf_vit_state_dict(model.state_dict(), cfg, "vit")
    )
    rng = np.random.default_rng(3)
    # non-native size with interpolate_pos_encoding=True (ref vit_adapter.py:14)
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = model(
            torch.from_numpy(x), interpolate_pos_encoding=True
        ).last_hidden_state[:, 1:].numpy()
    got = np.asarray(vit_forward(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_to_patch14_matches_reference_adapter_resize():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    xt = torch.from_numpy(x)
    # ref dinov2_adapter.py:16-24
    want_nearest = F.interpolate(xt, size=(56, 56), mode="nearest").numpy()
    want_bicubic = F.interpolate(
        xt, size=(56, 56), mode="bicubic", align_corners=True
    ).numpy()
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    got_n = np.asarray(to_patch14(xj, "canny")).transpose(0, 3, 1, 2)
    got_b = np.asarray(to_patch14(xj, "depth")).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_n, want_nearest, atol=1e-4)
    np.testing.assert_allclose(got_b, want_bicubic, atol=1e-4)
