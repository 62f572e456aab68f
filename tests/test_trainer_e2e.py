"""Trainer end to end: extract a tiny tree -> loader -> fit 3 steps ->
checkpoint written -> resume restores the step counter."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from controlar_tpu.config import VQConfig
from controlar_tpu.models import vq as jvq
from controlar_tpu.models.vit import ViTConfig
from controlar_tpu.data.extract import extract_tree
from controlar_tpu.data.t2i_control import T2IControlCodeDataset, T2IControlConfig
from controlar_tpu.data.loader import ShardedLoader
from controlar_tpu.train.trainer import Trainer, TrainerConfig

pytestmark = pytest.mark.slow


class _FakeT5:
    def get_text_embeddings(self, texts):
        return np.ones((len(texts), 7, 2048), np.float32), np.ones((len(texts), 7), np.int64)


def test_trainer_fit_and_resume(tmp_path):
    img = 64
    vq_cfg = VQConfig(codebook_size=64, codebook_embed_dim=8, z_channels=16, ch=16)
    vq_params = jvq.init_vq_params(jax.random.PRNGKey(0), vq_cfg)
    rng = np.random.default_rng(0)
    samples = [
        {"image": rng.integers(0, 255, (img, img, 3)).astype(np.uint8),
         "caption": f"s{i}"} for i in range(8)
    ]
    tree = str(tmp_path / "tree")
    extract_tree(tree, samples, vq_params, vq_cfg, t5_embedder=_FakeT5(),
                 image_size=img)

    tcfg = TrainerConfig(
        gpt_model="GPT-B", model_type="t2i", image_size=img,
        condition_type="canny", epochs=6, global_batch_size=8,
        results_dir=str(tmp_path / "results"), ckpt_every=3, log_every=1,
        model_overrides=dict(dim=64, n_layer=3, n_head=2, vocab_size=64),
        adapter_override=ViTConfig(hidden_size=384, n_layer=1, n_head=2,
                                   patch_size=14, pos_grid=4, layerscale=True),
    )
    ds = T2IControlCodeDataset(T2IControlConfig(
        code_path=tree, condition_type="canny", image_size=img,
    ))
    loader = ShardedLoader(ds, batch_size=8, num_workers=2)
    trainer = Trainer(tcfg)
    state = trainer.fit(loader, max_steps=3)
    assert int(state.step) == 3
    ckpt_dir = os.path.join(tcfg.results_dir, "checkpoints")
    assert os.path.isdir(ckpt_dir) and len(os.listdir(ckpt_dir)) >= 1
    assert os.path.exists(os.path.join(tcfg.results_dir, "log.txt"))

    # resume: a fresh trainer restores the saved step
    tcfg2 = TrainerConfig(**{**tcfg.__dict__, "resume_dir": ckpt_dir})
    trainer2 = Trainer(tcfg2)
    state2 = trainer2.init_state()
    assert int(state2.step) == 3
