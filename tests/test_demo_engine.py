"""DemoEngine (demo.py) without gradio: pipeline caching, per-condition
checkpoint hot-swap (ref demo/model.py:66-75), and the c2i process() path
with class-name lookup."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from controlar_tpu.config import GPTConfig, VQConfig
from controlar_tpu.models import gpt as jgpt
from controlar_tpu.models import vq as jvq
from controlar_tpu.models import vit as jvit
from controlar_tpu.pipeline import ControlARPipeline
from controlar_tpu.demo import DemoEngine


def _tiny_pipe(condition_type):
    rng = jax.random.PRNGKey(0)
    img = 64
    gpt_cfg = GPTConfig(
        model_type="c2i", dim=64, n_layer=4, n_head=2, cls_token_num=1,
        block_size=(img // 16) ** 2, vocab_size=128, num_classes=1000,
        adapter_size="small",
    )
    vq_cfg = VQConfig(codebook_size=128, codebook_embed_dim=8, z_channels=16, ch=16)
    ad_cfg = jvit.ViTConfig(hidden_size=384, n_layer=1, n_head=2, patch_size=14,
                            pos_grid=4, layerscale=True)
    return ControlARPipeline(
        gpt_cfg=gpt_cfg,
        gpt_params=jgpt.init_gpt_params(rng, gpt_cfg),
        vq_cfg=vq_cfg,
        vq_params=jvq.init_vq_params(rng, vq_cfg),
        adapter_cfg=ad_cfg,
        adapter_params=jvit.init_vit_params(rng, ad_cfg),
        condition_type=condition_type,
    )


@pytest.mark.slow
def test_process_and_pipe_cache():
    eng = DemoEngine(_tiny_pipe)
    img = np.random.default_rng(0).integers(0, 255, (48, 48, 3), np.uint8)
    out = eng.process(img, "canny", label="golden retriever", cfg_scale=2.0,
                      top_k=20, seed=1)
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8
    assert eng.get_pipe("canny") is eng.get_pipe("canny")  # cached


@pytest.mark.slow
def test_ckpt_hot_swap(tmp_path):
    """A per-condition checkpoint replaces the GPT weights at pipe build
    (the reference's load_gpt_weight safetensors reload)."""
    import torch

    from tests.ref_utils import load_ref_gpt_module

    # save a tiny torch reference checkpoint the converter can ingest
    ref_mod = load_ref_gpt_module(t2i=False)
    torch.manual_seed(3)
    args = ref_mod.ModelArgs(
        model_type="c2i", cls_token_num=1, condition_token_num=0,
        image_size=128, n_layer=4, n_head=2, dim=64, block_size=16,
        vocab_size=128, num_classes=1000, caption_dim=96,
    )
    model = ref_mod.Transformer(args).float()
    path = tmp_path / "swap.pt"
    torch.save({"model": model.state_dict()}, str(path))

    eng = DemoEngine(_tiny_pipe, ckpt_map={"canny": str(path)})
    pipe = eng.get_pipe("canny")
    base = _tiny_pipe("canny")
    a = np.asarray(pipe.gpt_params["tok_embeddings"])
    b = np.asarray(base.gpt_params["tok_embeddings"])
    assert not np.allclose(a, b)  # weights actually swapped
    want = model.state_dict()["tok_embeddings.weight"].numpy()
    np.testing.assert_allclose(a, want, atol=1e-6)


class _FakeComponent:
    def __init__(self, kind, *args, **kwargs):
        self.kind = kind
        self.args = args
        self.kwargs = kwargs
        self.clicks = []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def click(self, fn, inputs, outputs):
        self.clicks.append((fn, inputs, outputs))
        _FakeGradio.last.clicks.append((fn, inputs, outputs))


class _FakeGradio:
    """Minimal gradio stand-in recording component construction, so the
    Blocks UI renders end-to-end without gradio installed."""

    last = None

    def __init__(self):
        self.components = []
        self.clicks = []
        _FakeGradio.last = self

    def _make(self, kind):
        def ctor(*a, **k):
            c = _FakeComponent(kind, *a, **k)
            self.components.append(c)
            return c
        return ctor

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        return self._make(name)


def test_blocks_ui_renders_and_runs():
    """Two-tab UI (ref demo/app.py:20-31) renders against the gradio stub and
    its click handler drives DemoEngine.process end to end."""
    from controlar_tpu.demo import build_demo

    eng = DemoEngine(_tiny_pipe)
    gr = _FakeGradio()
    demo = build_demo(eng, "c2i", _gr=gr)
    assert demo is not None

    kinds = [c.kind for c in gr.components]
    assert kinds.count("TabItem") == 2
    assert kinds.count("Tabs") == 1
    assert kinds.count("Button") == 2
    # edge tab has the canny threshold sliders (ref app_edge.py:46-57)
    labels = [c.kwargs.get("label") for c in gr.components]
    assert "Canny low threshold" in labels and "Canny high threshold" in labels

    assert len(gr.clicks) == 2
    img = np.zeros((24, 24, 3), np.uint8)
    for fn, inputs, out in gr.clicks:
        is_edge = len(inputs) == 12  # + canny threshold sliders
        args = [img, "207", "Canny" if is_edge else "Depth",
                4.0, 1.0, 16, 1.0, 1.0, 0, False]
        if is_edge:
            args += [100, 200]
        else:
            continue  # depth pipe needs a depth net; edge path covers run()
        res = fn(*args)
        assert res.shape[-1] == 3

    # "No preprocess" routes through the tab's default checkpoint
    fn, inputs, _ = [c for c in gr.clicks if len(c[1]) == 12][0]
    res = fn(img, "207", "No preprocess", 4.0, 1.0, 16, 1.0, 1.0, 0, False,
             100, 200)
    assert res.shape[-1] == 3
