"""Image-folder builders and condition utils (HWC3, x64-multiple resize)."""
import os

import numpy as np

from controlar_tpu.data.image_folder import (
    ImageFolderDataset, hwc3, resize_to_multiple,
)


def test_hwc3_variants():
    g = np.zeros((4, 4), np.uint8) + 7
    assert hwc3(g).shape == (4, 4, 3)
    rgba = np.zeros((4, 4, 4), np.uint8)
    rgba[..., 3] = 0  # fully transparent -> white
    out = hwc3(rgba)
    assert (out == 255).all()
    rgb = np.zeros((4, 4, 3), np.uint8)
    assert hwc3(rgb) is rgb


def test_resize_to_multiple():
    img = np.zeros((300, 500, 3), np.uint8)
    out = resize_to_multiple(img, 512, 64)
    assert out.shape[0] % 64 == 0 and out.shape[1] % 64 == 0
    assert min(out.shape[:2]) in (448, 512, 576)  # near 512 short side


def test_image_folder(tmp_path):
    from PIL import Image

    for cls in ("a", "b"):
        os.makedirs(tmp_path / cls)
        for i in range(2):
            Image.fromarray(
                np.zeros((8, 8, 3), np.uint8) + i
            ).save(tmp_path / cls / f"{i}.png")
    ds = ImageFolderDataset(str(tmp_path), with_labels=True)
    assert len(ds) == 4
    assert ds.class_names == ["a", "b"]
    item = ds[3]
    assert item["label"] == 1
    batch = ds.make_batch([ds[0], ds[1]])
    assert batch["image"].shape == (2, 8, 8, 3)
