"""Continuous-batching engine: greedy outputs match the offline generate loop
even with more requests than slots and staggered admission (CPU/XLA path)."""
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
    model_type="c2i", dim=64, n_layer=4, n_head=2, cls_token_num=1,
    block_size=16, vocab_size=128, num_classes=10,
)


def test_engine_matches_offline_greedy():
    params = jgpt.init_gpt_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    n_req = 5
    labels = rng.integers(0, 10, n_req)
    feats = rng.standard_normal((n_req, CFG.block_size, 384)).astype(np.float32) * 0.1

    # offline references (one request at a time)
    offline = []
    for i in range(n_req):
        toks = jgen.generate(
            params, CFG, labels=jnp.asarray(labels[i: i + 1]),
            adapter_features=jnp.asarray(feats[i: i + 1]),
            max_new_tokens=CFG.block_size, cfg_scale=2.0, sample_logits=False,
            use_flash=False,
        )
        offline.append(np.asarray(toks)[0])

    # 2 slots, 5 requests, quantum smaller than the sequence
    eng = ServeEngine(
        params, CFG,
        ServeConfig(max_slots=2, quantum=5, greedy=True, top_k=0,
                    cache_dtype=jnp.float32, use_flash=False),
    )
    reqs = [
        Request(request_id=i, label=int(labels[i]), adapter_features=feats[i],
                cfg_scale=2.0)
        for i in range(n_req)
    ]
    done = eng.run(reqs)
    assert len(done) == n_req
    for i, r in enumerate(done):
        assert r.request_id == i
        assert r.tokens.shape == (CFG.block_size,)
        np.testing.assert_array_equal(r.tokens, offline[i])


def test_engine_int8_cache_matches_offline_int8():
    """Continuous batching over the quantized KV cache: greedy tokens equal
    the offline generate() loop run with the same cache_dtype=int8."""
    params = jgpt.init_gpt_params(jax.random.PRNGKey(1), CFG)
    rng = np.random.default_rng(3)
    labels = rng.integers(0, 10, 3)
    offline = []
    for i in range(3):
        toks = jgen.generate(
            params, CFG, labels=jnp.asarray(labels[i: i + 1]),
            max_new_tokens=CFG.block_size, cfg_scale=2.0, sample_logits=False,
            use_flash=False, cache_dtype=jnp.int8,
        )
        offline.append(np.asarray(toks)[0])
    eng = ServeEngine(
        params, CFG,
        ServeConfig(max_slots=2, quantum=5, greedy=True, top_k=0,
                    cache_dtype=jnp.int8, use_flash=False),
    )
    done = eng.run([Request(request_id=i, label=int(labels[i]), cfg_scale=2.0)
                    for i in range(3)])
    for i, r in enumerate(done):
        np.testing.assert_array_equal(r.tokens, offline[i])


def test_quantum_buckets_and_waste_stats():
    """Early quantum exit picks shorter programs near completion; the waste
    accounting exposes the frozen-tail + empty-slot fraction."""
    cfg = CFG
    params = jgpt.init_gpt_params(jax.random.PRNGKey(0), cfg)
    scfg = ServeConfig(max_slots=2, quantum=8, greedy=True,
                       quantum_buckets=(8, 4, 2), use_flash=False)
    eng = ServeEngine(params, cfg, scfg)
    reqs = [Request(request_id=i, label=i, cfg_scale=2.0, seed=i)
            for i in range(3)]
    done = eng.run(reqs)
    assert len(done) == 3
    assert all(r.tokens is not None and len(r.tokens) == cfg.block_size
               for r in done)
    assert all(r.t_done is not None and r.t_done >= r.t_submit for r in done)
    st = eng.stats
    # the first token of each request is emitted at admission (prefill)
    assert st["useful_steps"] == 3 * (cfg.block_size - 1)
    assert st["slot_steps"] >= st["useful_steps"]

    # bucketed output must equal the fixed-quantum output
    eng2 = ServeEngine(params, cfg, ServeConfig(
        max_slots=2, quantum=8, greedy=True, use_flash=False))
    done2 = eng2.run([Request(request_id=10 + i, label=i, cfg_scale=2.0,
                              seed=i) for i in range(3)])
    for a, b in zip(done, done2):
        np.testing.assert_array_equal(a.tokens, b.tokens)
    # early exit should not be wasteful-er
    assert eng.stats["slot_steps"] <= eng2.stats["slot_steps"]


def test_engine_stacked_cache_matches_per_layer():
    """kv_stacked=True (stacked cache + deferred grid-(L,B) appends) emits
    the same greedy tokens as the per-layer engine."""
    params = jgpt.init_gpt_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(3)
    n_req = 4
    labels = rng.integers(0, 10, n_req)

    def run(stacked):
        eng = ServeEngine(
            params, CFG,
            ServeConfig(max_slots=2, quantum=5, greedy=True, top_k=0,
                        cache_dtype=jnp.float32, use_flash=False,
                        kv_stacked=stacked),
        )
        reqs = [Request(request_id=i, label=int(labels[i]), cfg_scale=2.0)
                for i in range(n_req)]
        return eng.run(reqs)

    base = run(False)
    stk = run(True)
    for a, b in zip(base, stk):
        np.testing.assert_array_equal(a.tokens, b.tokens)


def test_engine_stacked_int8_matches_per_layer_int8():
    params = jgpt.init_gpt_params(jax.random.PRNGKey(0), CFG)
    labels = [1, 2, 3]

    def run(stacked):
        eng = ServeEngine(
            params, CFG,
            ServeConfig(max_slots=2, quantum=6, greedy=True, top_k=0,
                        cache_dtype=jnp.int8, use_flash=False,
                        kv_stacked=stacked),
        )
        return eng.run([Request(request_id=i, label=l, cfg_scale=2.0)
                        for i, l in enumerate(labels)])

    for a, b in zip(run(False), run(True)):
        np.testing.assert_array_equal(a.tokens, b.tokens)


def test_engine_stacked_flash_kernels_slot_isolation():
    """The REAL stacked kernel composition (flash attention + grid-(L,B)
    append + pos>=1 clamp for empty slots), interpret mode: each slot's
    numerics are independent of its neighbors, so request 0's tokens must
    be BIT-IDENTICAL between a 1-request run (slot 1 empty all along —
    exercising the clamp every step) and a 2-request run (slot 1 busy).
    Any cross-slot append/clamp corruption breaks the equality."""
    from controlar_tpu.ops import cache_append as ca
    from controlar_tpu.ops import flash_decode_stacked as fds

    params = jgpt.init_gpt_params(jax.random.PRNGKey(0), CFG,
                                  dtype=jnp.bfloat16)

    def run(reqs):
        eng = ServeEngine(
            params, CFG,
            ServeConfig(max_slots=2, quantum=6, greedy=True, top_k=0,
                        cache_dtype=jnp.bfloat16, use_flash=True,
                        kv_stacked=True),
        )
        return eng.run(reqs)

    fds.INTERPRET = True
    ca.INTERPRET = True
    try:
        solo = run([Request(request_id=0, label=3, cfg_scale=2.0)])
        duo = run([Request(request_id=0, label=3, cfg_scale=2.0),
                   Request(request_id=1, label=7, cfg_scale=2.0)])
    finally:
        fds.INTERPRET = False
        ca.INTERPRET = False
    assert solo[0].tokens.shape == (CFG.block_size,)
    np.testing.assert_array_equal(solo[0].tokens, duo[0].tokens)
    # and the busy neighbor actually decoded something different
    assert not np.array_equal(duo[0].tokens, duo[1].tokens)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_engine_tp_sharded_matches_single_device():
    """Multi-chip SERVING: the continuous-batching engine under a
    (data, fsdp, tp) mesh with megatron-sharded params emits the exact
    tokens of the single-device engine (GSPMD inserts the collectives in
    the admission and quantum programs; the reference's vLLM TP worker
    group never actually shards weights, serve/gpt_model.py:138-139)."""
    from jax.sharding import NamedSharding
    from controlar_tpu.parallel.mesh import make_mesh
    from controlar_tpu.parallel.sharding import gpt_param_specs

    params = jgpt.init_gpt_params(jax.random.PRNGKey(0), CFG)
    labels = [1, 5, 7]

    def run(params, mesh=None):
        eng = ServeEngine(
            params, CFG,
            ServeConfig(max_slots=2, quantum=5, greedy=True, top_k=0,
                        cache_dtype=jnp.float32, use_flash=False),
        )
        reqs = [Request(request_id=i, label=l, cfg_scale=2.0)
                for i, l in enumerate(labels)]
        if mesh is None:
            return eng.run(reqs)
        with jax.set_mesh(mesh):
            return eng.run(reqs)

    want = run(params)
    mesh = make_mesh(data=2, fsdp=2, tp=2)
    specs = gpt_param_specs(CFG)
    sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)
    got = run(sharded, mesh)
    for a, b in zip(want, got):
        np.testing.assert_array_equal(a.tokens, b.tokens)


def test_occupancy_quantum_policy():
    """Occupancy policy shrinks the quantum when slots are mostly empty
    (VERDICT r3 #7) and never changes generated tokens (sampling is
    scheduling-independent)."""
    cfg = CFG
    params = jgpt.init_gpt_params(jax.random.PRNGKey(0), cfg)
    scfg = ServeConfig(max_slots=4, quantum=8, greedy=True,
                       quantum_buckets=(8, 4, 2), quantum_policy="occupancy",
                       use_flash=False)
    eng = ServeEngine(params, cfg, scfg)

    # selection math, directly: 1/4 occupancy -> bucket covering 8*1/4=2
    eng.active[:] = False
    eng.active[0] = True
    eng.emitted[0] = 0
    assert eng._pick_quantum() == 2
    eng.active[1] = True
    eng.emitted[1] = 0
    assert eng._pick_quantum() == 4          # 8*2/4 = 4
    eng.active[:] = True
    for s in range(4):
        eng.emitted[s] = 0
    assert eng._pick_quantum() == 8          # full: no shrink
    eng.emitted[2] = cfg.block_size - 3      # near finisher: early exit wins
    assert eng._pick_quantum() == 4
    eng.active[:] = False

    # end-to-end: tokens identical to the fixed-quantum engine
    done = eng.run([Request(request_id=i, label=i, cfg_scale=2.0, seed=i)
                    for i in range(6)])
    eng2 = ServeEngine(params, cfg, ServeConfig(
        max_slots=4, quantum=8, greedy=True, use_flash=False))
    done2 = eng2.run([Request(request_id=10 + i, label=i, cfg_scale=2.0,
                              seed=i) for i in range(6)])
    for a, b in zip(done, done2):
        np.testing.assert_array_equal(a.tokens, b.tokens)


def test_overlap_admission_matches_sync():
    """overlap_admission=True pipelines enqueue/drain but must produce
    token-identical outputs and identical device-step accounting to the
    synchronous engine (sampling is per-request-seed, scheduling-state
    independent)."""
    params = jgpt.init_gpt_params(jax.random.PRNGKey(1), CFG)
    rng = np.random.default_rng(3)
    n_req = 7
    labels = rng.integers(0, 10, n_req)

    def run(overlap):
        eng = ServeEngine(
            params, CFG,
            ServeConfig(max_slots=2, quantum=5, top_k=8,
                        cache_dtype=jnp.float32, use_flash=False,
                        overlap_admission=overlap, overlap_depth=2),
        )
        reqs = [Request(request_id=i, label=int(labels[i]), cfg_scale=2.0,
                        seed=100 + i) for i in range(n_req)]
        # staggered: half up front, the rest added mid-flight
        for r in reqs[:3]:
            eng.add_request(r)
        steps = 0
        while eng.has_unfinished():
            eng.step()
            steps += 1
            if steps == 2:
                for r in reqs[3:]:
                    eng.add_request(r)
        if overlap:
            eng.flush()
        done = sorted(eng.finished, key=lambda r: r.request_id)
        return done, dict(eng.stats)

    done_s, stats_s = run(False)
    done_o, stats_o = run(True)
    assert len(done_o) == n_req == len(done_s)
    for a, b in zip(done_s, done_o):
        assert a.request_id == b.request_id
        np.testing.assert_array_equal(a.tokens, b.tokens)
    assert stats_s == stats_o
