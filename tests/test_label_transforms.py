"""Parity for data/label_transforms.py vs the reference's dataset/utils.py
semantics (ref dataset/utils.py:43-188).

torchvision is not in this image; the reference's F.resize / F.crop /
cross_entropy calls are reproduced with torch-core equivalents
(torch.nn.functional.interpolate drives torchvision resize on tensors)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from controlar_tpu.data import label_transforms as LT


def _palette(k=8, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (k, 3)).astype(np.float64)


def test_map_color_to_index_matches_reference_math():
    # ref dataset/utils.py:76-101: image*255, L2 argmin over palette rows
    pal = _palette(11)
    rng = np.random.default_rng(1)
    img = rng.random((2, 3, 16, 16)).astype(np.float32)

    t_img = torch.tensor(img) * 255
    t_pal = torch.tensor(pal, dtype=t_img.dtype)
    flat = t_img.permute(0, 2, 3, 1).reshape(-1, 3)
    want = torch.argmin(torch.norm(flat[:, None, :] - t_pal, dim=-1), dim=-1)
    want = want.view(2, 16, 16).numpy()

    got = np.asarray(LT.map_color_to_index(jnp.asarray(img), pal))
    np.testing.assert_array_equal(got, want)


def test_nearest_resize_matches_torch_interpolate():
    rng = np.random.default_rng(2)
    for (h, w), (oh, ow) in [((37, 53), (64, 64)), ((128, 96), (64, 48)),
                             ((64, 64), (64, 64)), ((100, 100), (7, 13))]:
        x = rng.integers(0, 200, (2, h, w)).astype(np.float32)
        want = TF.interpolate(torch.tensor(x)[:, None], size=(oh, ow),
                              mode="nearest")[:, 0].numpy()
        got = np.asarray(LT.nearest_resize(jnp.asarray(x), (oh, ow)))
        np.testing.assert_array_equal(got, want)


def test_bilinear_resize_matches_torch_antialias():
    rng = np.random.default_rng(3)
    x = rng.random((2, 1, 97, 83)).astype(np.float32)
    want = TF.interpolate(torch.tensor(x), size=(48, 64), mode="bilinear",
                          antialias=True, align_corners=False).numpy()
    got = np.asarray(LT.bilinear_resize(jnp.asarray(x), (48, 64)))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_seg_label_transform_ade_background_unification():
    # ref dataset/utils.py:129-137: decode, resize NEAREST, shift -1, -1->255
    pal = _palette(5)
    rng = np.random.default_rng(4)
    idx = rng.integers(0, 5, (1, 32, 32))
    rgb = pal[idx].transpose(0, 3, 1, 2).astype(np.float32) / 255.0

    out = np.asarray(LT.seg_label_transform(
        jnp.asarray(rgb), LT.ADE20K_DATASET, output_size=(16, 16), palette=pal))
    assert out.shape == (1, 16, 16) and out.dtype == np.int32
    # exact-palette colors decode exactly, so output = resize(idx) - 1 with 0->255
    resized = TF.interpolate(torch.tensor(idx).float()[:, None], size=(16, 16),
                             mode="nearest")[:, 0].long().numpy()
    want = resized - 1
    want[want == -1] = 255
    np.testing.assert_array_equal(out, want)


def test_seg_label_transform_cocostuff_resize_only():
    rng = np.random.default_rng(5)
    idx = rng.integers(0, 171, (2, 30, 30)).astype(np.int32)
    out = np.asarray(LT.seg_label_transform(
        jnp.asarray(idx), LT.COCOSTUFF_DATASET, output_size=(10, 10)))
    want = TF.interpolate(torch.tensor(idx).float()[:, None], size=(10, 10),
                          mode="nearest")[:, 0].long().numpy()
    np.testing.assert_array_equal(out, want)


def test_label_transform_dispatch():
    rng = np.random.default_rng(6)
    depth = rng.random((2, 1, 20, 20)).astype(np.float32)
    out = LT.label_transform(jnp.asarray(depth), "depth", "any",
                             output_size=(10, 10))
    assert out.shape == (2, 1, 10, 10)
    edge = jnp.asarray(rng.random((2, 20, 20)).astype(np.float32))
    assert LT.label_transform(edge, "canny", "any") is edge
    with pytest.raises(NotImplementedError):
        LT.label_transform(edge, "pose", "any")


def test_reward_loss_segmentation_matches_torch_ce_ignore_index():
    # ref dataset/utils.py:52-53: cross_entropy(ignore_index=255)
    rng = np.random.default_rng(7)
    logits = rng.standard_normal((2, 6, 8, 8)).astype(np.float32)
    labels = rng.integers(0, 6, (2, 8, 8))
    labels[0, :2] = 255
    want = TF.cross_entropy(torch.tensor(logits), torch.tensor(labels).long(),
                            ignore_index=255).item()
    got = float(LT.reward_loss(jnp.asarray(logits), jnp.asarray(labels),
                               "segmentation"))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_reward_loss_canny_reduction_chain():
    # ref dataset/utils.py:55-56: mse.mean(2) then .mean((-1,-2)) -> (N,)
    rng = np.random.default_rng(8)
    pred = rng.random((3, 5, 4, 8, 8)).astype(np.float32)
    lab = rng.random((3, 5, 4, 8, 8)).astype(np.float32)
    want = ((torch.tensor(pred) - torch.tensor(lab)) ** 2).mean(2).mean((-1, -2))
    got = np.asarray(LT.reward_loss(jnp.asarray(pred), jnp.asarray(lab), "canny"))
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-5)
    d = np.asarray(LT.reward_loss(jnp.asarray(pred[:, 0]), jnp.asarray(lab[:, 0]),
                                  "depth"))
    assert d.shape == (3,)


def test_group_random_crop_per_image_params():
    rng = np.random.default_rng(9)
    imgs = [rng.integers(0, 255, (40, 50, 3)).astype(np.uint8) for _ in range(4)]
    out = LT.group_random_crop(imgs, 32, np.random.default_rng(0))
    assert all(o.shape == (32, 32, 3) for o in out)
    # crops come from the source images
    for src, o in zip(imgs, out):
        found = False
        for i in range(9):
            for j in range(19):
                if np.array_equal(src[i:i + 32, j:j + 32], o):
                    found = True
        assert found
    with pytest.raises(ValueError):
        LT.group_random_crop([np.zeros((16, 16, 3), np.uint8)], 32,
                             np.random.default_rng(0))
