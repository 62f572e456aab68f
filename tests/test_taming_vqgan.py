"""Taming VQGAN parity vs the reference's vendored implementation
(tokenizer/vqgan/{layer,quantize}.py, loaded by file path — no package
__init__ exists there). Covers encode indices, quantizer loss, decode_code,
the remap path, and full reconstruction at a tiny config."""
import importlib.util
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow

REF = "/root/reference/tokenizer/vqgan"


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_mods():
    layer = _load("taming_layer", f"{REF}/layer.py")
    quant = _load("taming_quantize", f"{REF}/quantize.py")
    return layer, quant


TINY = dict(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
            attn_resolutions=(8,), in_channels=3, resolution=16,
            z_channels=8, double_z=False)


@pytest.fixture(scope="module")
def models(ref_mods):
    import torch

    layer, quant = ref_mods
    from controlar_tpu.models.taming_vqgan import TamingVQConfig
    from controlar_tpu.convert.torch_taming import convert_taming_state_dict

    torch.manual_seed(0)
    enc = layer.Encoder(**TINY)
    dec = layer.Decoder(**TINY)
    vq = quant.VectorQuantizer2(n_e=32, e_dim=8, beta=0.25,
                                sane_index_shape=True)
    qc = torch.nn.Conv2d(8, 8, 1)
    pqc = torch.nn.Conv2d(8, 8, 1)

    sd = {}
    for prefix, m in [("encoder", enc), ("decoder", dec), ("quantize", vq),
                      ("quant_conv", qc), ("post_quant_conv", pqc)]:
        for k, v in m.state_dict().items():
            sd[f"{prefix}.{k}"] = v.numpy()

    cfg = TamingVQConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                         attn_resolutions=(8,), resolution=16, z_channels=8,
                         n_embed=32, embed_dim=8)
    params = jax.tree.map(jnp.asarray, convert_taming_state_dict(sd, cfg))
    return (enc, dec, vq, qc, pqc), params, cfg


def test_encode_decode_parity(models):
    import torch

    (enc, dec, vq, qc, pqc), params, cfg = models
    from controlar_tpu.models import taming_vqgan as T

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

    with torch.no_grad():
        h = qc(enc(xt))
        zq_t, loss_t, (_, _, idx_t) = vq(h)
        rec_t = dec(pqc(zq_t))

    zq, loss, idx = T.encode(params, cfg, jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(idx), idx_t.numpy())
    np.testing.assert_allclose(float(loss), float(loss_t), rtol=1e-5)
    rec = T.decode(params, cfg, zq)
    np.testing.assert_allclose(
        np.asarray(rec), rec_t.numpy().transpose(0, 2, 3, 1), atol=2e-5
    )

    # decode_code round trip (model.py:80-83)
    h2, w2 = idx.shape[1:]
    rec2 = T.decode_code(params, cfg, np.asarray(idx).reshape(2, -1), (h2, w2))
    with torch.no_grad():
        zq_b = vq.get_codebook_entry(
            idx_t.reshape(-1), (2, 8, h2, w2), channel_first=True)
        rec2_t = dec(pqc(zq_b))
    np.testing.assert_allclose(
        np.asarray(rec2), rec2_t.numpy().transpose(0, 2, 3, 1), atol=2e-5
    )


def test_remap_parity(ref_mods, models, tmp_path):
    """The openimages-f8-256 style remap: indices land in the used-subset id
    space and unmap back for decode (quantize.py:144-166)."""
    import torch

    layer, quant = ref_mods
    (_, _, vq, _, _), params, cfg = models
    import dataclasses

    used = np.sort(np.random.default_rng(1).choice(32, size=8, replace=False))
    np.save(tmp_path / "used.npy", used.astype(np.int64))
    vq_remap = quant.VectorQuantizer2(
        n_e=32, e_dim=8, beta=0.25, remap=str(tmp_path / "used.npy"),
        unknown_index="extra", sane_index_shape=True,
    )
    with torch.no_grad():
        vq_remap.embedding.weight.copy_(vq.embedding.weight)

    cfg_r = dataclasses.replace(cfg, remap=tuple(int(u) for u in used),
                                unknown_index="extra")
    from controlar_tpu.models import taming_vqgan as T

    rng = np.random.default_rng(2)
    z = rng.normal(size=(2, 4, 4, 8)).astype(np.float32) * 0.1
    with torch.no_grad():
        _, _, (_, _, idx_t) = vq_remap(
            torch.from_numpy(z.transpose(0, 3, 1, 2)))
    _, _, idx = T.quantize(params, cfg_r, jnp.asarray(z))
    np.testing.assert_array_equal(np.asarray(idx), idx_t.numpy())

    # unmap: codebook_entry(remapped ids) equals embedding[used[ids]]
    ze = T.codebook_entry(params, cfg_r, np.asarray(idx).reshape(2, -1), (4, 4))
    with torch.no_grad():
        ze_t = vq_remap.get_codebook_entry(
            idx_t.reshape(-1), (2, 8, 4, 4), channel_first=True)
    np.testing.assert_allclose(
        np.asarray(ze), ze_t.numpy().transpose(0, 2, 3, 1), atol=1e-6
    )


def test_registry_configs():
    from controlar_tpu.models.taming_vqgan import TAMING_CONFIGS

    assert set(TAMING_CONFIGS) == {
        "vqgan_imagenet_f16_1024", "vqgan_imagenet_f16_16384",
        "vqgan_openimage_f8_256", "vqgan_openimage_f8_16384",
    }
    f8 = TAMING_CONFIGS["vqgan_openimage_f8_16384"]
    assert 2 ** (f8.num_resolutions - 1) == 8
    f16 = TAMING_CONFIGS["vqgan_imagenet_f16_1024"]
    assert 2 ** (f16.num_resolutions - 1) == 16
