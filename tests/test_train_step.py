"""Sharded training step: compiles on an 8-device (data,fsdp,tp) mesh,
loss decreases, EMA tracks, decay mask follows the reference's ndim>=2 rule."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding

from controlar_tpu.config import GPTConfig
from controlar_tpu.models import gpt as jgpt
from controlar_tpu.parallel.mesh import make_mesh
from controlar_tpu.parallel.sharding import batch_spec, shard_params
from controlar_tpu.train.optimizer import make_optimizer, decay_mask
from controlar_tpu.train.step import init_train_state, make_train_step

pytestmark = pytest.mark.slow


CFG = GPTConfig(
    model_type="t2i", dim=64, n_layer=6, n_head=2, block_size=16,
    vocab_size=128, cls_token_num=120, caption_dim=48,
    token_dropout_p=0.1, resid_dropout_p=0.1, ffn_dropout_p=0.1,
)


def _batch(b, rng):
    return {
        "caption_emb": rng.standard_normal((b, 120, CFG.caption_dim)).astype(np.float32),
        "tokens": rng.integers(0, CFG.vocab_size, (b, CFG.block_size)).astype(np.int32),
        "adapter_features": rng.standard_normal((b, CFG.block_size, 384)).astype(np.float32),
        "valid": np.ones((b,), np.float32),
    }


def test_train_step_sharded_loss_decreases():
    mesh = make_mesh(data=2, fsdp=2, tp=2)
    tx = make_optimizer(lr=2e-3)
    rng = jax.random.PRNGKey(0)
    with jax.set_mesh(mesh):
        params = shard_params(jgpt.init_gpt_params(rng, CFG), mesh, CFG)
        state = init_train_state(rng, CFG, tx, params=params, use_ema=True)
        step = jax.jit(make_train_step(CFG, tx, ema_decay=0.99), donate_argnums=0)

        bspec = NamedSharding(mesh, batch_spec())
        nprng = np.random.default_rng(0)
        batch = jax.tree.map(lambda x: jax.device_put(x, bspec), _batch(8, nprng))

        losses = []
        for i in range(8):
            state, metrics = step(state, batch, jax.random.PRNGKey(1))
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        # same batch every step: loss must trend down
        assert losses[-1] < losses[0], losses
        assert int(state.step) == 8
        # EMA is a lagged copy, not equal to params, not the init
        d = jax.tree.leaves(
            jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), state.params, state.ema_params)
        )
        assert max(d) > 0


def test_decay_mask_rule():
    params = jgpt.init_gpt_params(jax.random.PRNGKey(0), CFG)
    mask = decay_mask(params)
    assert mask["norm"] is False  # 1-D norm weight: no decay
    assert mask["layers"]["wqkv"] is True
    assert mask["layers"]["attention_norm"] is False  # (L, dim) stacked norms...

def test_stacked_norms_not_decayed_matches_reference_intent():
    """Reference decay split is by tensor dim on *unstacked* tensors
    (train_c2i.py:35-40): per-layer norm weights are 1-D -> no decay. Our
    stacked (L, dim) layout would flip them to ndim=2; assert the mask
    handles this correctly (see optimizer.decay_mask)."""
    params = jgpt.init_gpt_params(jax.random.PRNGKey(0), CFG)
    mask = decay_mask(params)
    assert mask["layers"]["attention_norm"] is False
    assert mask["layers"]["ffn_norm"] is False
