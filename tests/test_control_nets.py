"""HED / Lineart network parity vs the reference torch modules (random init)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from controlar_tpu.convert.torch_control import (
    convert_hed_state_dict,
    convert_lineart_state_dict,
)
from controlar_tpu.models.control_nets import hed_forward, lineart_forward
from tests.conftest import add_reference_path


def test_hed_parity():
    add_reference_path()
    import torch
    from condition.hed import ControlNetHED_Apache2

    torch.manual_seed(0)
    net = ControlNetHED_Apache2().float().eval()
    # random-ish weights instead of all-default init
    with torch.no_grad():
        for p in net.parameters():
            p.add_(torch.randn_like(p) * 0.05)

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 255, (1, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        projections = net(torch.from_numpy(x))
        import torch.nn.functional as F

        edges = [
            F.interpolate(e, size=(64, 96), mode="bilinear", align_corners=False).squeeze(1)
            for e in projections
        ]
        edges = torch.stack(edges, dim=1)
        want = (1 / (1 + torch.exp(-torch.mean(edges, dim=1))) * 255.0).clamp(0, 255).numpy()

    params = jax.tree.map(jnp.asarray, convert_hed_state_dict(net.state_dict()))
    got = np.asarray(hed_forward(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    # fp32 accumulation-order differences get amplified by sigmoid*255 in a
    # handful of pixels; require tight agreement almost everywhere
    diff = np.abs(got - want)
    assert np.mean(diff) < 1e-3
    assert (diff < 5e-2).mean() > 0.999, (diff.max(), (diff >= 5e-2).sum())


def test_lineart_parity():
    add_reference_path()
    import sys
    import types

    if "controlnet_aux" not in sys.modules:  # unused-at-runtime import in ref
        m = types.ModuleType("controlnet_aux")
        m.LineartDetector = object
        sys.modules["controlnet_aux"] = m
    import torch
    from condition.lineart import LineArt

    torch.manual_seed(1)
    net = LineArt().float().eval()
    with torch.no_grad():
        for p in net.parameters():
            p.add_(torch.randn_like(p) * 0.05)

    rng = np.random.default_rng(1)
    x = rng.uniform(0, 255, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()[:, 0]

    params = jax.tree.map(jnp.asarray, convert_lineart_state_dict(net.state_dict()))
    got = np.asarray(lineart_forward(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_hed_nms_parity():
    """hed_nms matches the reference cv2 implementation (condition/hed.py:84-99)."""
    add_reference_path()
    from condition.hed import nms as ref_nms

    from controlar_tpu.models.control_nets import hed_nms

    rng = np.random.default_rng(0)
    # smooth-ish synthetic edge map in 0..255 (blurred noise + ridges)
    base = rng.uniform(0, 255, size=(64, 80)).astype(np.float32)
    for sigma, t in [(3.0, 64.0), (2.0, 128.0)]:
        ref = ref_nms(base.copy(), t, sigma)
        ours = np.asarray(hed_nms(jnp.asarray(base), t, sigma))
        assert ours.dtype == np.uint8 and ours.shape == ref.shape
        # float blur rounding can flip pixels sitting exactly at threshold /
        # max-tie boundaries; demand near-exact agreement
        mismatch = (ours != ref).mean()
        assert mismatch < 5e-3, mismatch

    # batched input round-trips shape
    out = np.asarray(hed_nms(jnp.asarray(np.stack([base, base])), 64.0, 3.0))
    assert out.shape == (2, 64, 80)
    np.testing.assert_array_equal(out[0], out[1])
