"""End-to-end pipeline smoke: condition image -> tokens -> decoded image,
random weights, tiny shapes (CPU)."""
import numpy as np

import jax
import jax.numpy as jnp

from controlar_tpu.config import GPTConfig, VQConfig
from controlar_tpu.models import gpt as jgpt
from controlar_tpu.models import vq as jvq
from controlar_tpu.models import vit as jvit
from controlar_tpu.pipeline import ControlARPipeline


def test_c2i_pipeline_smoke():
    rng = jax.random.PRNGKey(0)
    img = 64
    gpt_cfg = GPTConfig(
        model_type="c2i", dim=64, n_layer=6, n_head=2, cls_token_num=1,
        block_size=(img // 16) ** 2, vocab_size=128, num_classes=10,
        adapter_size="small",
    )
    vq_cfg = VQConfig(codebook_size=128, codebook_embed_dim=8, z_channels=16, ch=16)
    ad_cfg = jvit.ViTConfig(hidden_size=384, n_layer=2, n_head=2, patch_size=14,
                            pos_grid=4, layerscale=True)
    pipe = ControlARPipeline(
        gpt_cfg=gpt_cfg,
        gpt_params=jgpt.init_gpt_params(rng, gpt_cfg),
        vq_cfg=vq_cfg,
        vq_params=jvq.init_vq_params(rng, vq_cfg),
        adapter_cfg=ad_cfg,
        adapter_params=jvit.init_vit_params(rng, ad_cfg),
        condition_type="canny",
    )
    nprng = np.random.default_rng(0)
    cond_imgs = nprng.integers(0, 255, (2, img, img, 3)).astype(np.uint8)
    out = pipe.generate(
        labels=np.array([3, 7]), condition_images=cond_imgs,
        cfg_scale=2.0, top_k=50, seed=1,
    )
    assert out.shape == (2, img, img, 3)
    assert out.dtype == np.uint8


def test_mr_rect_pipeline_smoke():
    """Arbitrary-resolution (MR) path: rectangular grid through condition
    extraction, adapter, rect RoPE decode, and VQ decode (ref
    sample_t2i_MR.py protocol at tiny scale)."""
    rng = jax.random.PRNGKey(0)
    ih, iw = 48, 80  # 3x5 token grid
    gpt_cfg = GPTConfig(
        model_type="c2i", dim=64, n_layer=4, n_head=2, cls_token_num=1,
        block_size=(ih // 16) * (iw // 16), grid_hw=(ih // 16, iw // 16),
        vocab_size=128, num_classes=10, adapter_size="small",
    )
    vq_cfg = VQConfig(codebook_size=128, codebook_embed_dim=8, z_channels=16, ch=16)
    ad_cfg = jvit.ViTConfig(hidden_size=384, n_layer=2, n_head=2, patch_size=14,
                            pos_grid=4, layerscale=True)
    pipe = ControlARPipeline(
        gpt_cfg=gpt_cfg,
        gpt_params=jgpt.init_gpt_params(rng, gpt_cfg),
        vq_cfg=vq_cfg,
        vq_params=jvq.init_vq_params(rng, vq_cfg),
        adapter_cfg=ad_cfg,
        adapter_params=jvit.init_vit_params(rng, ad_cfg),
        condition_type="canny",
    )
    cond = np.random.default_rng(1).integers(0, 255, (2, ih, iw, 3), np.uint8)
    out = pipe.generate(labels=np.array([1, 2]), condition_images=cond,
                        cfg_scale=2.0, top_k=20, seed=0)
    assert out.shape == (2, ih, iw, 3)
