"""Round-2 fix coverage: control-MLP init, converter fallback, StepLR,
ImageNet label table, canny max_iters bound, serve seed reproducibility."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controlar_tpu.config import gpt_config


def _tiny_cfg(**kw):
    base = dict(
        model_type="t2i", block_size=16, cls_token_num=4, vocab_size=64,
        caption_dim=32, dim=32, n_layer=3, n_head=2, multiple_of=32,
    )
    base.update(kw)
    return gpt_config("GPT-B", **base)


def test_control_mlps_receive_gradient():
    """The control branch must not be a zero-gradient fixed point at init
    (ref gpt_t2i.py:372-389 normal-inits every linear)."""
    from controlar_tpu.models import gpt as gpt_model

    # c2i: the t2i output head is (correctly) zero-init, which blocks all
    # upstream grads at step 0 — c2i's normal-init head exposes the branch.
    cfg = _tiny_cfg(model_type="c2i", cls_token_num=1)
    params = gpt_model.init_gpt_params(jax.random.PRNGKey(0), cfg)
    for name in ("adapter_mlp", "condition_mlp", "condition_layers"):
        for k, w in params[name].items():
            assert float(jnp.abs(w).max()) > 0, f"{name}.{k} is zero at init"

    # gradient actually flows into the adapter branch
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.block_size, cfg.adapter_dim))
    prefix = jax.random.normal(jax.random.PRNGKey(2), (2, cfg.cls_token_num, cfg.dim))
    idx = jnp.zeros((2, cfg.block_size - 1), jnp.int32)
    tgt = jnp.zeros((2, cfg.block_size), jnp.int32)

    def loss_fn(p):
        ct = gpt_model.control_tokens(p, cfg, feats)
        _, loss = gpt_model.forward_train(p, cfg, prefix, idx, cond_tokens=ct, targets=tgt)
        return loss

    grads = jax.grad(loss_fn)(params)
    gnorm = jnp.sqrt(
        sum(jnp.sum(g ** 2) for g in jax.tree.leaves(grads["adapter_mlp"]))
    )
    assert float(gnorm) > 0, "adapter_mlp gradient is identically zero"


def test_converter_falls_back_for_base_checkpoint():
    """A base LlamaGen state dict (no ControlAR modules) must convert, with
    fresh control-MLP weights (ADVICE r1: KeyError blocked fine-tune init)."""
    from controlar_tpu.convert.torch_gpt import convert_gpt_state_dict
    from controlar_tpu.models import gpt as gpt_model

    cfg = _tiny_cfg(model_type="c2i", cls_token_num=1)
    full = jax.tree.map(np.asarray, gpt_model.init_gpt_params(jax.random.PRNGKey(3), cfg))

    sd = {"tok_embeddings.weight": full["tok_embeddings"],
          "cls_embedding.embedding_table.weight": full["cls_embedding"]["embedding"],
          "norm.weight": full["norm"],
          "output.weight": full["output"].T}
    for i in range(cfg.n_layer):
        lp = full["layers"]
        sd[f"layers.{i}.attention_norm.weight"] = lp["attention_norm"][i]
        sd[f"layers.{i}.ffn_norm.weight"] = lp["ffn_norm"][i]
        sd[f"layers.{i}.attention.wqkv.weight"] = lp["wqkv"][i].T
        sd[f"layers.{i}.attention.wo.weight"] = lp["wo"][i].T
        sd[f"layers.{i}.feed_forward.w1.weight"] = lp["w1"][i].T
        sd[f"layers.{i}.feed_forward.w3.weight"] = lp["w3"][i].T
        sd[f"layers.{i}.feed_forward.w2.weight"] = lp["w2"][i].T

    out = convert_gpt_state_dict(sd, cfg, init_rng_seed=7)
    np.testing.assert_allclose(out["layers"]["wqkv"], full["layers"]["wqkv"], rtol=1e-6)
    # control modules came from fresh init, non-zero, right shapes
    assert out["adapter_mlp"]["fc1"].shape == (cfg.adapter_dim, cfg.dim)
    assert np.abs(out["adapter_mlp"]["fc1"]).max() > 0
    assert out["condition_layers"]["fc1"].shape == (3, cfg.dim, cfg.dim)
    assert np.abs(out["condition_layers"]["fc2"]).max() > 0


def test_step_lr_schedule():
    from controlar_tpu.train.optimizer import step_lr

    sched = step_lr(1e-4, decay_every_steps=10, gamma=0.9)
    assert np.isclose(float(sched(0)), 1e-4)
    assert np.isclose(float(sched(9)), 1e-4)
    assert np.isclose(float(sched(10)), 0.9e-4)
    assert np.isclose(float(sched(25)), 0.81e-4)


def test_imagenet_label_table():
    from controlar_tpu.data.imagenet_labels import (
        class_name, english_names, imagenet_classes, lookup_class,
    )

    assert len(imagenet_classes()) == 1000
    assert class_name(1, english_only=True).startswith("goldfish")
    assert "goldfish" in english_names(1)
    assert lookup_class("goldfish") == 1
    assert lookup_class("207") == 207
    assert lookup_class("golden retriever") == 207
    with pytest.raises(ValueError):
        lookup_class("zzzz-not-a-class")
    with pytest.raises(ValueError):
        lookup_class("1001")


def test_canny_max_iters_bounds_loop():
    """max_iters must genuinely bound the hysteresis loop (r1 VERDICT: the
    counter wasn't threaded through the carry)."""
    from controlar_tpu.ops.canny import canny

    img = (np.random.RandomState(0).rand(1, 32, 32, 3) * 255).astype(np.uint8)
    full = np.asarray(canny(jnp.asarray(img), 50, 150))
    one = np.asarray(canny(jnp.asarray(img), 50, 150, max_iters=0))
    # max_iters=0 keeps only strong edges -> never more pixels than fixpoint
    assert one.sum() <= full.sum()


def test_serve_seed_reproducible_across_scheduling():
    """A request's sampled tokens depend only on its seed, not on which other
    requests share the engine (ADVICE r1)."""
    from controlar_tpu.models import gpt as gpt_model
    from controlar_tpu.serve.engine import Request, ServeConfig, ServeEngine

    cfg = _tiny_cfg(model_type="c2i", cls_token_num=1)
    params = gpt_model.init_gpt_params(jax.random.PRNGKey(0), cfg)

    def run(reqs, slots):
        eng = ServeEngine(
            params, cfg,
            ServeConfig(max_slots=slots, quantum=8, top_k=0, use_flash=False),
        )
        return {r.request_id: r.tokens for r in eng.run(reqs)}

    solo = run([Request(request_id=0, label=5, cfg_scale=2.0, seed=123)], 2)
    mixed = run(
        [Request(request_id=0, label=5, cfg_scale=2.0, seed=123),
         Request(request_id=1, label=9, cfg_scale=3.0, seed=77),
         Request(request_id=2, label=2, cfg_scale=1.5, seed=9)],
        2,
    )
    np.testing.assert_array_equal(solo[0], mixed[0])
