"""Parity of 2D RoPE tables and rotation vs the torch reference."""
import numpy as np
import pytest

from controlar_tpu.ops.rope import precompute_rope_2d, apply_rope
from tests.ref_utils import load_ref_gpt_module


@pytest.mark.parametrize("grid,hd,cls", [(16, 64, 120), (8, 32, 1), (24, 64, 120)])
def test_rope_table_matches_reference(grid, hd, cls):
    ref = load_ref_gpt_module(t2i=True)
    want = ref.precompute_freqs_cis_2d(grid, hd, 10000, cls).numpy()
    got = precompute_rope_2d(grid, hd, 10000.0, cls)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_apply_rope_matches_reference():
    import torch

    ref = load_ref_gpt_module(t2i=True)
    rng = np.random.default_rng(0)
    b, t, h, d = 2, 17, 3, 64
    x = rng.standard_normal((b, t, h, d)).astype(np.float32)
    table = ref.precompute_freqs_cis_2d(8, d, 10000, 1)[:t]
    want = ref.apply_rotary_emb(torch.from_numpy(x), table).numpy()
    got = np.asarray(apply_rope(x, table.numpy()))
    np.testing.assert_allclose(got, want, atol=1e-5)
