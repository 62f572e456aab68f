"""Checkpointing: orbax train-state round trip, reference .pt/.safetensors
loaders, latest-checkpoint discovery."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from controlar_tpu.config import GPTConfig
from controlar_tpu.models import gpt as jgpt
from controlar_tpu.train.optimizer import make_optimizer
from controlar_tpu.train.step import init_train_state
from controlar_tpu import checkpoint as ckpt_lib

CFG = GPTConfig(model_type="c2i", dim=32, n_layer=2, n_head=2, cls_token_num=1,
                block_size=16, vocab_size=64, num_classes=4)


@pytest.mark.slow
def test_orbax_train_state_roundtrip(tmp_path):
    tx = make_optimizer()
    rng = jax.random.PRNGKey(0)
    state = init_train_state(rng, CFG, tx, use_ema=True)
    state = state.__class__(
        step=jnp.asarray(7, jnp.int32), params=state.params,
        opt_state=state.opt_state, ema_params=state.ema_params,
    )
    path = ckpt_lib.save_train_state(str(tmp_path / "ckpts"), state)
    assert path.endswith("step_00000007")

    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state
    )
    restored = ckpt_lib.restore_train_state(path, abstract)
    assert int(restored.step) == 7
    a = jax.tree.leaves(state.params)
    b = jax.tree.leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert ckpt_lib.latest_checkpoint(str(tmp_path / "ckpts")) == path


def test_torch_pt_loader_roundtrip(tmp_path):
    """A reference-style {'model': sd} .pt loads into the param pytree."""
    import torch

    from tests.ref_utils import (
        load_ref_gpt_module, disable_cfg_dropout, state_dict_numpy,
    )
    from controlar_tpu.convert.torch_gpt import convert_gpt_state_dict

    ref_mod = load_ref_gpt_module(t2i=False)
    torch.manual_seed(0)
    model = ref_mod.Transformer(ref_mod.ModelArgs(
        model_type="c2i", n_layer=2, n_head=2, dim=32, block_size=16,
        vocab_size=64, num_classes=4, cls_token_num=1,
        condition_token_num=0, image_size=64,
    )).float()
    pt_path = str(tmp_path / "ref.pt")
    torch.save({"model": model.state_dict()}, pt_path)

    params = ckpt_lib.load_gpt_checkpoint(pt_path, CFG)
    want = convert_gpt_state_dict(state_dict_numpy(model), CFG)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(want)):
        np.testing.assert_array_equal(a, b)


def test_safetensors_loader(tmp_path):
    from safetensors.numpy import save_file

    sd = {"x": np.arange(6, dtype=np.float32).reshape(2, 3)}
    path = str(tmp_path / "w.safetensors")
    save_file(sd, path)
    out = ckpt_lib.load_torch_file(path)
    np.testing.assert_array_equal(out["x"], sd["x"])
