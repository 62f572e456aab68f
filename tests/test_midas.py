"""MiDaS DPT-Hybrid parity vs the reference's vendored model
(condition/midas/midas/dpt_depth.py), with timm stubbed by a tests-only
structural replica (tests/midas_timm_stub.py). Covers square 384x384 and the
rectangular 448x768 multi-resolution case the depth-MR checkpoints use
(ref depth.py:210-213), plus the detector normalization."""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import add_reference_path

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def ref_and_jax():
    import torch

    from tests import midas_timm_stub

    sys.modules.setdefault("timm", midas_timm_stub)
    add_reference_path()
    from condition.midas.midas.dpt_depth import DPTDepthModel

    torch.manual_seed(0)
    model = DPTDepthModel(path=None, backbone="vitb_rn50_384",
                          non_negative=True).float().eval()
    # randomize with small weights so depth magnitudes stay tame; cls/pos
    # embeds are zeros by construction — give them signal too
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    from controlar_tpu.convert.torch_midas import convert_midas_state_dict
    from controlar_tpu.models.midas import MIDAS_HYBRID

    params = jax.tree.map(jnp.asarray, convert_midas_state_dict(sd))
    return model, params, MIDAS_HYBRID


@pytest.mark.parametrize("hw", [(96, 96), (96, 160)])
def test_depth_parity(ref_and_jax, hw):
    import torch

    model, params, cfg = ref_and_jax
    h, w = hw
    rng = np.random.default_rng(2)
    img = rng.uniform(-1, 1, (1, h, w, 3)).astype(np.float32)

    with torch.no_grad():
        want = model(torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()

    from controlar_tpu.models.midas import midas_hybrid_depth

    got = np.asarray(midas_hybrid_depth(params, cfg, jnp.asarray(img)))
    assert got.shape == want.shape == (1, h, w)
    scale = np.abs(want).max() + 1e-9
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-4)


def test_detector_normalization(ref_and_jax):
    import torch

    model, params, cfg = ref_and_jax
    rng = np.random.default_rng(3)
    img_u8 = rng.integers(0, 256, (1, 96, 96, 3)).astype(np.float32)

    # reference MidasDetector.__call__ math (depth.py:180-190); the class
    # itself is not importable here (its module imports torchvision)
    x = img_u8 / 127.5 - 1.0
    with torch.no_grad():
        d = model(torch.from_numpy(x.transpose(0, 3, 1, 2)))[0]
    d = d - d.min()
    d = d / d.max()
    want = (d.numpy() * 255.0).clip(0, 255)

    from controlar_tpu.models.midas import midas_depth_condition

    got = np.asarray(midas_depth_condition(params, cfg, jnp.asarray(img_u8)))[0]
    np.testing.assert_allclose(got, want, atol=0.1)


def test_converter_roundtrip():
    from controlar_tpu.convert.torch_midas import (
        convert_midas_state_dict, export_midas_state_dict)
    from controlar_tpu.models.midas import init_midas_params

    params = init_midas_params(jax.random.PRNGKey(0))
    sd = export_midas_state_dict(params)
    assert sd["pretrained.model.pos_embed"].shape == (1, 577, 768)
    assert sd["pretrained.model.patch_embed.backbone.stem.conv.weight"].shape \
        == (64, 3, 7, 7)
    back = convert_midas_state_dict(sd)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
