"""Arbitrary-resolution generation: exact rectangular RoPE tables and
end-to-end rect-grid generation."""
import numpy as np

import jax
import jax.numpy as jnp

from controlar_tpu.config import GPTConfig
from controlar_tpu.models import gpt as jgpt
from controlar_tpu import generate as jgen
from controlar_tpu.ops.rope import precompute_rope_2d, precompute_rope_2d_rect


def test_rect_rope_equals_square_prefix_rows():
    """When grid_w equals the square grid, the rect table must equal the
    square table's leading rows (the only case where the reference's
    slice-from-48x48 approach is correct, sample_t2i_MR.py)."""
    sq = precompute_rope_2d(8, 64, 10000.0, 120)
    rect = precompute_rope_2d_rect(3, 8, 64, 10000.0, 120)
    np.testing.assert_allclose(rect, sq[: 120 + 24], atol=0)


def test_rect_rope_differs_from_naive_slice_when_w_differs():
    """For W != 48-equivalent the reference's slicing is misaligned; our
    exact table must differ from the sliced square one."""
    sq = precompute_rope_2d(8, 64, 10000.0, 0)
    rect = precompute_rope_2d_rect(4, 6, 64, 10000.0, 0)
    sliced = sq[: 24]
    assert not np.allclose(rect, sliced)


def test_generate_rect_grid():
    base = GPTConfig(
        model_type="c2i", dim=64, n_layer=4, n_head=2, cls_token_num=1,
        block_size=64, vocab_size=128, num_classes=10,
    )
    cfg = base.with_resolution(4, 10)  # 40 tokens, rectangular
    assert cfg.block_size == 40 and cfg.grid == (4, 10)
    params = jgpt.init_gpt_params(jax.random.PRNGKey(0), base)
    toks = jgen.generate(
        params, cfg, labels=jnp.asarray([1, 2]),
        adapter_features=jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 40, 384)), jnp.float32
        ),
        max_new_tokens=40, cfg_scale=2.0, sample_logits=False,
    )
    assert np.asarray(toks).shape == (2, 40)
