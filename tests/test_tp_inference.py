"""Multi-chip INFERENCE: the full generate() decode loop under a tensor/
data-parallel mesh produces the exact tokens of the single-device run.

This substantiates the multi-chip serving path the reference implements via
its vLLM fork's TP worker group (ref serve/worker.py:282-319; its TP never
actually shards weights, serve/gpt_model.py:138-139 — here GSPMD does):
params carry megatron shardings (parallel/sharding.gpt_param_specs), the
batch shards over data, and XLA inserts the collectives inside the jitted
scan. 8 virtual CPU devices, (2, 2, 2) (data, fsdp, tp) mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from controlar_tpu.config import GPTConfig
from controlar_tpu.models import gpt as jgpt
from controlar_tpu import generate as jgen
from controlar_tpu.parallel.mesh import make_mesh
from controlar_tpu.parallel.sharding import gpt_param_specs

pytestmark = pytest.mark.slow


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_generate_tp_sharded_matches_single_device():
    cfg = GPTConfig(
        model_type="c2i", dim=64, n_layer=4, n_head=4, cls_token_num=1,
        block_size=16, vocab_size=128, num_classes=10,
    )
    params = jgpt.init_gpt_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    labels = jnp.arange(4)
    kw = dict(labels=labels, max_new_tokens=cfg.block_size, cfg_scale=2.0,
              sample_logits=False, rng=jax.random.PRNGKey(1), use_flash=False)

    want = np.asarray(jgen.generate(params, cfg, **kw))

    mesh = make_mesh(data=2, fsdp=2, tp=2)
    specs = gpt_param_specs(cfg)
    sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
    with jax.set_mesh(mesh):
        got = np.asarray(jgen.generate(sharded, cfg, **kw))
    np.testing.assert_array_equal(got, want)

    # and through the quantized tree (int8 weights ride the same specs on
    # their q/s leaves via tree structure: quantize AFTER device_put works
    # on replicated scales)
    from controlar_tpu import quant

    qp = quant.quantize_gpt_params(params)
    want_q = np.asarray(jgen.generate(qp, cfg, **kw))
    with jax.set_mesh(mesh):
        got_q = np.asarray(jgen.generate(qp, cfg, **kw))
    np.testing.assert_array_equal(got_q, want_q)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_generate_stacked_cache_tp_sharded_matches_single_device():
    """The stacked (L, B, S, R) deferred-append cache under the same mesh:
    GSPMD must propagate shardings through the stacked DUS and the in-flight
    row math to the same tokens as the single-device stacked run."""
    cfg = GPTConfig(
        model_type="c2i", dim=64, n_layer=4, n_head=4, cls_token_num=1,
        block_size=16, vocab_size=128, num_classes=10,
    )
    params = jgpt.init_gpt_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    labels = jnp.arange(4)
    kw = dict(labels=labels, max_new_tokens=cfg.block_size, cfg_scale=2.0,
              sample_logits=False, rng=jax.random.PRNGKey(1), use_flash=False,
              kv_stacked=True)

    want = np.asarray(jgen.generate(params, cfg, **kw))
    mesh = make_mesh(data=2, fsdp=2, tp=2)
    specs = gpt_param_specs(cfg)
    sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
    with jax.set_mesh(mesh):
        got = np.asarray(jgen.generate(sharded, cfg, **kw))
    np.testing.assert_array_equal(got, want)
