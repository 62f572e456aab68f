"""XLA Canny vs cv2.Canny (the exact detector the reference uses,
condition/canny.py:14, and that the eval re-runs, evaluations/canny_f1score.py)."""
import numpy as np
import pytest

import jax.numpy as jnp

from controlar_tpu.ops.canny import canny


def _structured_image(rng, h=96, w=128, ch=3):
    """Smooth-ish random image with real edges (boxes + gradients + noise)."""
    import cv2

    img = np.zeros((h, w, ch), np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    img[..., 0] = 128 + 80 * np.sin(xx / 9.0)
    img[..., 1] = 128 + 80 * np.cos(yy / 7.0)
    img[..., 2] = (xx + yy) % 255
    for _ in range(6):
        y0, x0 = rng.integers(0, h - 20), rng.integers(0, w - 20)
        img[y0:y0 + 15, x0:x0 + 18] += rng.integers(-90, 90)
    img += rng.standard_normal((h, w, ch)) * 6
    img = np.clip(img, 0, 255).astype(np.uint8)
    img = cv2.GaussianBlur(img, (5, 5), 1.2)
    return img


@pytest.mark.parametrize("lo,hi", [(100, 200), (200, 400), (50, 150)])
def test_canny_matches_opencv(lo, hi):
    import cv2

    rng = np.random.default_rng(0)
    img = _structured_image(rng)
    want = cv2.Canny(img, lo, hi)
    got = np.asarray(canny(jnp.asarray(img)[None], lo, hi))[0]
    agree = (got == want).mean()
    assert agree >= 0.995, f"agreement {agree:.4f}"
    # edge pixels specifically (not just background agreement)
    if want.sum() > 0:
        edge_iou = ((got > 0) & (want > 0)).sum() / max(((got > 0) | (want > 0)).sum(), 1)
        assert edge_iou >= 0.97, f"edge IoU {edge_iou:.4f}"


def test_canny_grayscale_input():
    import cv2

    rng = np.random.default_rng(1)
    img = _structured_image(rng)[:, :, 0]
    want = cv2.Canny(img, 100, 200)
    got = np.asarray(canny(jnp.asarray(img)[None], 100, 200))[0]
    assert (got == want).mean() >= 0.995


def test_canny_batched():
    rng = np.random.default_rng(2)
    imgs = np.stack([_structured_image(rng) for _ in range(3)])
    out = np.asarray(canny(jnp.asarray(imgs), 100, 200))
    assert out.shape == (3, 96, 128)
    assert set(np.unique(out)) <= {0, 255}
