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


def test_ten_crop_matches_torchvision_semantics():
    """tl, tr, bl, br, center + same five of the h-flip — the TenCrop order
    torchvision documents (ref extract_codes_c2i.py:62)."""
    from controlar_tpu.data.extract import ten_crop

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (40, 48, 3)).astype(np.uint8)
    crops = ten_crop(arr, 32)
    assert crops.shape == (10, 32, 32, 3)
    np.testing.assert_array_equal(crops[0], arr[:32, :32])
    np.testing.assert_array_equal(crops[1], arr[:32, 16:])
    np.testing.assert_array_equal(crops[2], arr[8:, :32])
    np.testing.assert_array_equal(crops[3], arr[8:, 16:])
    np.testing.assert_array_equal(crops[4], arr[4:36, 8:40])
    flip = arr[:, ::-1]
    np.testing.assert_array_equal(crops[5], flip[:32, :32])
    np.testing.assert_array_equal(crops[9], flip[4:36, 8:40])
    with pytest.raises(ValueError):
        ten_crop(arr, 64)


def test_extract_c2i_roundtrip(tmp_path):
    """c2i extraction writes the reference tree layout; C2ICodeDataset reads
    it back; codes match direct VQ encode of the crops; canny maps match the
    device op (ref extract_codes_c2i.py:94-109 + extract_file_imagenet.py:
    100-146 output contract)."""
    from controlar_tpu.data.extract import extract_c2i_tree, c2i_crops
    from controlar_tpu.data.t2i_control import C2ICodeDataset
    from controlar_tpu.ops.canny import canny

    cfg = VQConfig(codebook_size=64, codebook_embed_dim=8, z_channels=16, ch=16)
    vq_params = jvq.init_vq_params(jax.random.PRNGKey(0), cfg)
    nprng = np.random.default_rng(1)
    S = 32
    samples = [
        {"image": nprng.integers(0, 255, (48, 56, 3)).astype(np.uint8),
         "label": 7 + i}
        for i in range(5)
    ]
    out = str(tmp_path / "c2i")
    n = extract_c2i_tree(
        out, iter(samples), vq_params, cfg, dataset="imagenet", image_size=S,
        use_ten_crop=True, conditions=("canny",), batch_images=2,
    )
    assert n == 5
    prefix = os.path.join(out, f"imagenet{S}")

    codes0 = np.load(f"{prefix}_codes/0.npy")
    assert codes0.shape == (1, 10, (S // 16) ** 2)  # ref (1, A, T) layout
    assert np.load(f"{prefix}_labels/0.npy").tolist() == [7]
    cond0 = np.load(f"{prefix}_canny_imagesnpy/0.npy")
    assert cond0.shape == (10, 1, S, S) and cond0.dtype == np.uint8
    assert os.path.exists(f"{prefix}_canny_images/0.png")

    # codes match direct per-crop encoding
    crops = c2i_crops(samples[0]["image"], S, True)
    x = jnp.asarray(crops, jnp.float32) / 127.5 - 1.0
    _, want = jvq.encode(vq_params, cfg, x)
    np.testing.assert_array_equal(codes0[0], np.asarray(want).reshape(10, -1))
    # canny maps match the device op at the script's default thresholds
    want_c = np.asarray(canny(jnp.asarray(crops), 100, 200)).astype(np.uint8)
    np.testing.assert_array_equal(cond0[:, 0], want_c)

    # dataset reads the tree back
    ds = C2ICodeDataset(f"{prefix}_codes", f"{prefix}_labels",
                        f"{prefix}_canny_imagesnpy")
    assert len(ds) == 5
    item = ds[1]
    assert item["labels"] == 8
    assert item["tokens"].shape == ((S // 16) ** 2,)
    assert item["control_map"].shape == (S, S)
    # the selected aug's tokens come from the saved file
    codes1 = np.load(f"{prefix}_codes/1.npy")[0]
    assert any(np.array_equal(item["tokens"], c) for c in codes1)


def test_extract_c2i_flip_mode_and_rank_striding(tmp_path):
    from controlar_tpu.data.extract import extract_c2i_tree

    cfg = VQConfig(codebook_size=64, codebook_embed_dim=8, z_channels=16, ch=16)
    vq_params = jvq.init_vq_params(jax.random.PRNGKey(0), cfg)
    nprng = np.random.default_rng(2)
    S = 32
    samples = [
        {"image": nprng.integers(0, 255, (S, S, 3)).astype(np.uint8), "label": i}
        for i in range(3)
    ]
    out = str(tmp_path / "c2i")
    n = extract_c2i_tree(out, iter(samples), vq_params, cfg, image_size=S,
                         use_ten_crop=False, batch_images=8,
                         process_index=1, process_count=2)
    # returns the per-rank SAMPLE COUNT (not the next strided index)
    assert n == 3
    prefix = os.path.join(out, f"imagenet{S}")
    assert sorted(os.listdir(f"{prefix}_codes")) == ["1.npy", "3.npy", "5.npy"]
    c = np.load(f"{prefix}_codes/1.npy")
    assert c.shape == (1, 2, (S // 16) ** 2)  # center + flip
