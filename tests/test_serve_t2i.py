"""t2i serving with left-padded captions matches the offline generate loop."""
import pytest
import numpy as np

import jax
import jax.numpy as jnp

from controlar_tpu.config import GPTConfig
from controlar_tpu.models import gpt as jgpt
from controlar_tpu import generate as jgen
from controlar_tpu.serve.engine import Request, ServeConfig, ServeEngine

pytestmark = pytest.mark.slow

CFG = GPTConfig(
    model_type="t2i", dim=64, n_layer=4, n_head=2, cls_token_num=120,
    block_size=16, vocab_size=128, caption_dim=48,
)


def test_t2i_engine_matches_offline_greedy():
    params = jgpt.init_gpt_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    n_req = 3
    caps = rng.standard_normal((n_req, 120, 48)).astype(np.float32)
    masks = np.ones((n_req, 120), bool)
    masks[0, :50] = False
    masks[2, :100] = False
    feats = rng.standard_normal((n_req, CFG.block_size, 384)).astype(np.float32) * 0.1

    offline = []
    for i in range(n_req):
        toks = jgen.generate(
            params, CFG, caption_emb=jnp.asarray(caps[i: i + 1]),
            emb_masks=jnp.asarray(masks[i: i + 1]),
            adapter_features=jnp.asarray(feats[i: i + 1]),
            max_new_tokens=CFG.block_size, cfg_scale=2.0, sample_logits=False,
            use_flash=False,
        )
        offline.append(np.asarray(toks)[0])

    eng = ServeEngine(
        params, CFG,
        ServeConfig(max_slots=2, quantum=7, greedy=True, top_k=0,
                    cache_dtype=jnp.float32, use_flash=False),
    )
    reqs = [
        Request(request_id=i, caption_emb=caps[i], emb_mask=masks[i],
                adapter_features=feats[i], cfg_scale=2.0)
        for i in range(n_req)
    ]
    done = eng.run(reqs)
    for i, r in enumerate(done):
        np.testing.assert_array_equal(r.tokens, offline[i])


def test_t2i_engine_int8_cache_matches_offline_int8():
    """Left-padded caption masks + the quantized KV cache together: engine
    greedy tokens equal the offline int8-cache generate loop."""
    params = jgpt.init_gpt_params(jax.random.PRNGKey(5), CFG)
    rng = np.random.default_rng(7)
    n = 3
    caps = rng.standard_normal((n, CFG.cls_token_num, CFG.caption_dim)).astype(
        np.float32)
    masks = np.ones((n, CFG.cls_token_num), np.float32)
    masks[0, :30] = 0
    masks[2, :77] = 0
    feats = rng.standard_normal((n, CFG.block_size, 384)).astype(np.float32) * 0.1

    offline = []
    for i in range(n):
        toks = jgen.generate(
            params, CFG, caption_emb=jnp.asarray(caps[i : i + 1]),
            emb_masks=jnp.asarray(masks[i : i + 1]),
            adapter_features=jnp.asarray(feats[i : i + 1]),
            max_new_tokens=CFG.block_size, cfg_scale=2.0, sample_logits=False,
            use_flash=False, cache_dtype=jnp.int8,
        )
        offline.append(np.asarray(toks)[0])

    eng = ServeEngine(
        params, CFG,
        ServeConfig(max_slots=2, quantum=5, greedy=True, top_k=0,
                    cache_dtype=jnp.int8, use_flash=False),
    )
    done = eng.run([
        Request(request_id=i, caption_emb=caps[i], emb_mask=masks[i],
                adapter_features=feats[i], cfg_scale=2.0)
        for i in range(n)
    ])
    for i, r in enumerate(done):
        np.testing.assert_array_equal(r.tokens, offline[i])
