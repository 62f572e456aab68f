"""Extraction round trip: build a code tree from images, read it back with
the dataset, verify tokens match direct VQ encoding."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from controlar_tpu.config import VQConfig
from controlar_tpu.models import vq as jvq
from controlar_tpu.data.extract import extract_tree
from controlar_tpu.data.t2i_control import T2IControlCodeDataset, T2IControlConfig


class _FakeT5:
    def get_text_embeddings(self, texts):
        n = len(texts)
        emb = np.ones((n, 7, 2048), np.float32)
        return emb, np.ones((n, 7), np.int64)


def test_extract_and_load(tmp_path):
    cfg = VQConfig(codebook_size=64, codebook_embed_dim=8, z_channels=16, ch=16)
    rng = jax.random.PRNGKey(0)
    vq_params = jvq.init_vq_params(rng, cfg)
    nprng = np.random.default_rng(0)
    img_size = 64
    samples = [
        {"image": nprng.integers(0, 255, (img_size, img_size, 3)).astype(np.uint8),
         "caption": f"a photo number {i}"}
        for i in range(3)
    ]
    out = str(tmp_path / "tree")
    extract_tree(out, samples, vq_params, cfg, t5_embedder=_FakeT5(),
                 image_size=img_size)
    assert len(os.listdir(os.path.join(out, "code"))) == 3

    ds = T2IControlCodeDataset(T2IControlConfig(
        code_path=out, condition_type="canny", image_size=img_size,
    ))
    assert len(ds) == 3
    item = ds[0]
    assert item["valid"] == 1.0
    assert item["tokens"].shape == ((img_size // 16) ** 2,)
    # left-padded caption: first 120-7 rows zero, mask matches
    assert item["emb_mask"].sum() == 7
    assert (item["caption_emb"][:-7] == 0).all()
    assert (item["caption_emb"][-7:] == 1).all()

    # tokens equal direct encode of the saved image
    from PIL import Image

    img = np.asarray(Image.open(os.path.join(out, "image", "0.png")))
    x = jnp.asarray(img, jnp.float32)[None] / 127.5 - 1.0
    _, codes = jvq.encode(vq_params, cfg, x)
    np.testing.assert_array_equal(item["tokens"], np.asarray(codes).reshape(-1))
