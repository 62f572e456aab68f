"""VQGAN tokenizer parity vs the torch reference (random weights)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from controlar_tpu.config import vq_config
from controlar_tpu.convert.torch_vq import convert_vq_state_dict
from controlar_tpu.models import vq as jvq
from tests.conftest import add_reference_path


@pytest.fixture(scope="module")
def vq_setup():
    add_reference_path()
    import torch
    from tokenizer.tokenizer_image.vq_model import VQ_16

    torch.manual_seed(0)
    # small-but-faithful: 2 res levels of downsampling, tiny channels
    model = VQ_16(codebook_size=64, codebook_embed_dim=8, z_channels=32).float().eval()
    # shrink: reference VQ_16 is fixed [1,1,2,2,4]@ch=128 — use it as-is but at
    # tiny spatial size to keep CPU runtime low.
    cfg = vq_config("VQ-16", codebook_size=64, codebook_embed_dim=8, z_channels=32)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_vq_state_dict(sd, cfg))
    return model, cfg, params


@pytest.mark.slow
def test_encode_indices_match(vq_setup):
    import torch

    model, cfg, params = vq_setup
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)

    with torch.no_grad():
        _, _, (_, _, ref_idx) = model.encode(torch.from_numpy(x))
    ref_idx = ref_idx.numpy().reshape(2, 2, 2)

    _, idx = jvq.encode(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)


def test_decode_code_matches(vq_setup):
    import torch

    model, cfg, params = vq_setup
    rng = np.random.default_rng(1)
    idx = rng.integers(0, cfg.codebook_size, (2, 2, 2)).astype(np.int64)

    with torch.no_grad():
        ref = model.decode_code(
            torch.from_numpy(idx.reshape(2, -1)), shape=(2, 8, 2, 2)
        ).numpy()

    img = jvq.decode_code(params, cfg, jnp.asarray(idx))
    got = np.asarray(img).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_roundtrip_reconstruction_close(vq_setup):
    import torch

    model, cfg, params = vq_setup
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32)

    with torch.no_grad():
        ref_out, _ = model(torch.from_numpy(x))
    ref_out = ref_out.numpy()

    zq, idx = jvq.encode(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)))
    out = jvq.decode(params, cfg, zq)
    got = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref_out, atol=5e-4)
