"""StyleGAN discriminator parity vs the reference module (kornia's filter2d
is stubbed with its documented semantics: normalized kernel, reflect pad)."""
import pytest
import sys
import types

import numpy as np

import jax
import jax.numpy as jnp

from controlar_tpu.models.discriminators import (
    convert_stylegan_disc_state_dict,
    init_stylegan_disc_params,
    stylegan_disc_forward,
)
from tests.conftest import add_reference_path

pytestmark = pytest.mark.slow


def _stub_kornia():
    import torch
    import torch.nn.functional as F

    def filter2d(x, kernel, normalized=False):
        k = kernel
        if normalized:
            k = k / k.sum(dim=(-1, -2), keepdim=True)
        c = x.shape[1]
        k = k.expand(c, 1, -1, -1)
        x = F.pad(x, (1, 1, 1, 1), mode="reflect")
        return F.conv2d(x, k, groups=c)

    mod = types.ModuleType("kornia")
    filters = types.ModuleType("kornia.filters")
    filters.filter2d = filter2d
    mod.filters = filters
    sys.modules["kornia"] = mod
    sys.modules["kornia.filters"] = filters


def test_stylegan_disc_parity():
    add_reference_path()
    _stub_kornia()
    import importlib
    import torch

    ref = importlib.import_module("tokenizer.tokenizer_image.discriminator_stylegan")
    importlib.reload(ref)

    torch.manual_seed(0)
    net = ref.Discriminator(input_nc=3, image_size=64).float().eval()
    params = jax.tree.map(
        jnp.asarray, convert_stylegan_disc_state_dict(net.state_dict())
    )
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()
    got = np.asarray(
        stylegan_disc_forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    )
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_stylegan_disc_init_and_forward():
    params = init_stylegan_disc_params(jax.random.PRNGKey(0), image_size=64)
    x = jnp.zeros((2, 64, 64, 3))
    out = stylegan_disc_forward(params, x)
    assert out.shape == (2, 1)
