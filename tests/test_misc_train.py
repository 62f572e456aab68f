"""Seg-condition training path, drop_path stochastic depth, reconstruction
eval round trip."""
import numpy as np

import jax
import jax.numpy as jnp

from controlar_tpu.config import GPTConfig, VQConfig
from controlar_tpu.models import gpt as gpt_model, vit as vit_model, vq as jvq
from controlar_tpu.train.optimizer import make_optimizer
from controlar_tpu.train.step import init_train_state
from controlar_tpu.train.control_step import make_control_train_step
from controlar_tpu.eval.reconstruction import reconstruction_eval
import pytest


def test_seg_condition_training_path():
    img = 64
    cfg = GPTConfig(
        model_type="t2i", dim=64, n_layer=6, n_head=2, block_size=(img // 16) ** 2,
        vocab_size=64, cls_token_num=120, caption_dim=48, condition_type="seg",
    )
    ad = vit_model.ViTConfig(hidden_size=384, n_layer=1, n_head=2, patch_size=14,
                             pos_grid=4, layerscale=True)
    rng = jax.random.PRNGKey(0)
    params = {
        "gpt": gpt_model.init_gpt_params(rng, cfg),
        "adapter": vit_model.init_vit_params(rng, ad),
    }
    tx = make_optimizer()
    state = init_train_state(rng, cfg, tx, params=params)
    step = jax.jit(make_control_train_step(cfg, ad, tx, "seg"), donate_argnums=0)
    nprng = np.random.default_rng(0)
    batch = {
        "caption_emb": jnp.asarray(nprng.standard_normal((2, 120, 48)), jnp.float32),
        "emb_mask": jnp.ones((2, 120), bool),
        "tokens": jnp.asarray(nprng.integers(0, 64, (2, cfg.block_size)), jnp.int32),
        # seg control arrives as a rendered 3-channel map (ref t2i_control.py:109-111)
        "control_map": jnp.asarray(nprng.integers(0, 255, (2, img, img, 3)), jnp.uint8),
        "valid": jnp.ones((2,), jnp.float32),
    }
    state, m = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))


def test_drop_path_changes_training_forward_only():
    cfg = GPTConfig(
        model_type="c2i", dim=64, n_layer=4, n_head=2, cls_token_num=1,
        block_size=16, vocab_size=64, num_classes=10,
        drop_path_rate=0.5, token_dropout_p=0.0, resid_dropout_p=0.0,
        ffn_dropout_p=0.0,
    )
    params = gpt_model.init_gpt_params(jax.random.PRNGKey(0), cfg)
    prefix = gpt_model.embed_prefix_c2i(params, jnp.asarray([1, 2]))
    idx = jnp.zeros((2, cfg.block_size - 1), jnp.int32)
    det, _ = gpt_model.forward_train(params, cfg, prefix, idx, deterministic=True)
    a, _ = gpt_model.forward_train(
        params, cfg, prefix, idx, rng=jax.random.PRNGKey(1), deterministic=False
    )
    b, _ = gpt_model.forward_train(
        params, cfg, prefix, idx, rng=jax.random.PRNGKey(2), deterministic=False
    )
    assert not np.allclose(np.asarray(a), np.asarray(det))
    assert not np.allclose(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_reconstruction_eval(tmp_path):
    cfg = VQConfig(codebook_size=64, codebook_embed_dim=8, z_channels=16, ch=16)
    params = jvq.init_vq_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batches = [rng.integers(0, 255, (2, 192, 192, 3)).astype(np.uint8)]
    out = reconstruction_eval(params, cfg, batches, out_dir=str(tmp_path))
    assert out["count"] == 2
    assert np.isfinite(out["psnr"]) and 0 <= out["ms_ssim"] <= 1
    import os

    assert os.path.exists(tmp_path / "samples.npz")
    assert len(os.listdir(tmp_path / "recon")) == 2


def test_hub_folder_round_trip(tmp_path):
    """save_hub_folder/load_hub_folder: flat safetensors + config survive a
    round trip including list-valued subtrees (the hub-push surface,
    ref vq_model_hf.py:1-5)."""
    import numpy as np
    import jax.numpy as jnp

    from controlar_tpu.tools import load_hub_folder, save_hub_folder

    params = {
        "a": jnp.arange(6.0).reshape(2, 3),
        "layers": [
            {"w": jnp.ones((2, 2))}, {"w": jnp.zeros((2, 2))},
        ],
        "nested": {"b": jnp.asarray([1, 2, 3])},
    }
    out = save_hub_folder(params, {"size": "GPT-TEST", "n": 2}, str(tmp_path / "hub"))
    import os
    assert os.path.exists(os.path.join(out, "params.safetensors"))
    back, cfg = load_hub_folder(out)
    assert cfg == {"size": "GPT-TEST", "n": 2}
    np.testing.assert_array_equal(back["a"], np.asarray(params["a"]))
    assert isinstance(back["layers"], list) and len(back["layers"]) == 2
    np.testing.assert_array_equal(back["layers"][1]["w"], 0)
    np.testing.assert_array_equal(back["nested"]["b"], [1, 2, 3])


def test_next_experiment_dir(tmp_path):
    from controlar_tpu.train.trainer import next_experiment_dir

    root = str(tmp_path / "results")
    d0 = next_experiment_dir(root, "GPT-B")
    assert d0.endswith("000-GPT-B")
    import os
    os.makedirs(d0)
    d1 = next_experiment_dir(root, "GPT-B")
    assert d1.endswith("001-GPT-B")


def test_pre_extracted_control_map_fast_path():
    """c2i trains from offline condition trees: a batch carrying control_map
    bypasses the on-device extractor for ANY condition type (the ref c2i
    trainers consume precomputed canny npy maps, dataset/imagenet.py:60-77)."""
    import jax.numpy as jnp

    from controlar_tpu.train.control_step import extract_condition_on_device

    cm = (np.arange(2 * 4 * 4, dtype=np.uint8).reshape(2, 4, 4) * 3) % 255
    out = extract_condition_on_device({"control_map": jnp.asarray(cm)}, "canny")
    assert out.shape == (2, 4, 4, 3)
    np.testing.assert_allclose(
        np.asarray(out[..., 0]), 2.0 * (cm / 255.0 - 0.5), atol=1e-6
    )


def test_hub_folder_quantized_tree(tmp_path):
    """A W8A16-quantized GPT tree (int8 q + f32 s dict leaves) survives the
    hub safetensors round trip — a quantized serving artifact is portable."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from controlar_tpu import quant
    from controlar_tpu.config import GPTConfig
    from controlar_tpu.models import gpt as jgpt
    from controlar_tpu.tools import load_hub_folder, save_hub_folder

    cfg = GPTConfig(model_type="c2i", dim=32, n_layer=2, n_head=2,
                    cls_token_num=1, block_size=4, vocab_size=64, num_classes=4)
    qp = quant.quantize_gpt_params(
        jgpt.init_gpt_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16))
    out = save_hub_folder(qp, {"size": "tiny", "quant": "w8a16"},
                          str(tmp_path / "hub"))
    back, meta = load_hub_folder(out)
    assert meta["quant"] == "w8a16"
    assert back["layers"]["wqkv"]["q"].dtype == np.int8
    np.testing.assert_array_equal(
        back["layers"]["wqkv"]["q"], np.asarray(qp["layers"]["wqkv"]["q"]))
    np.testing.assert_allclose(
        back["output"]["s"], np.asarray(qp["output"]["s"]))
