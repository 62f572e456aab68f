"""Released-checkpoint parity gate: convert -> greedy token equality.

BASELINE.md's north star is bit-for-bit greedy-token parity against the
released ControlAR checkpoints (ref README.md:60-67 zoo; loaders
sample_t2i.py:64-69 / sample_c2i.py:59-77). No released weights exist in this
environment, so this module is the ready-to-run gate: the moment a
`.pt`/`.safetensors` checkpoint is on disk,

    python -m controlar_tpu.cli verify-zoo CKPT --size GPT-XL --model-type t2i

loads it into BOTH the imported torch reference (/root/reference, stubbed
adapter backbones) and this repo's converter+decode path, runs greedy
generation on identical inputs, and reports PASS/FAIL on exact token equality.

`--self-test` proves the machinery end-to-end without released weights: it
builds a tiny random reference model, saves its state_dict to a temp file,
and pushes it through the exact same gate path (this is what
tests/test_verify_zoo.py runs in CI).

Scope: the gate verifies the TRANSFORMER weights (embedders, control MLPs,
fusion layers, attention/FFN stacks, head) — both sides consume the same
pre-computed adapter features, bypassing the HF DINOv2/ViT backbone, whose
conversion is parity-tested separately (tests/test_vit_adapter.py vs HF).
Both sides run fp32 (the reference's in-model bf16 condition cast is undone,
ref gpt.py:443) so argmax ties cannot diverge on rounding.
"""
from __future__ import annotations

import dataclasses
import sys
import types
from typing import Any, Dict, Optional

import numpy as np

REFERENCE_ROOT = "/root/reference"


# ---------------------------------------------------------------------------
# Reference import (mirrors tests/ref_utils.py, but usable outside pytest)
# ---------------------------------------------------------------------------

def _add_reference_path():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def load_ref_gpt_module(t2i: bool):
    _add_reference_path()
    import torch.nn as nn

    class _IdentityAdapter(nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

        def forward(self, x):
            return x

    for adapter_mod, cls in [
        ("autoregressive.models.vit_adapter", "ViT_Adapter"),
        ("autoregressive.models.dinov2_adapter", "Dinov2_Adapter"),
    ]:
        if adapter_mod not in sys.modules:
            m = types.ModuleType(adapter_mod)
            setattr(m, cls, _IdentityAdapter)
            sys.modules[adapter_mod] = m

    import importlib

    name = "autoregressive.models.gpt_t2i" if t2i else "autoregressive.models.gpt"
    mod = importlib.import_module(name)
    if t2i:
        mod.Dinov2_Adapter = _IdentityAdapter
    else:
        mod.ViT_Adapter = _IdentityAdapter
    return mod


def _patch_ref_model(model, t2i: bool):
    """fp32 condition path + control_strength pass-through for c2i (the
    in-tree c2i Transformer.forward does not accept the kwarg the shared
    generate.py always sends, ref generate.py:87)."""
    if t2i:
        return
    cm = model.condition_mlp
    orig_cm = cm.forward

    def cm_fwd(caption, train=False, force_drop_ids=None, drop_ids=None):
        return orig_cm(caption.float(), train, force_drop_ids, drop_ids)

    cm.forward = cm_fwd
    orig = model.forward

    def fwd(*args, control_strength=1, **kw):
        return orig(*args, **kw)

    model.forward = fwd


# the released checkpoint zoo (ref README.md:60-67): file name -> gate
# configuration. `verify-zoo --all DIR` runs every file found in DIR.
ZOO = {
    "canny_MR.safetensors": dict(size="GPT-XL", model_type="t2i",
                                 adapter_size="small", block_size=1024),
    "depth_MR.safetensors": dict(size="GPT-XL", model_type="t2i",
                                 adapter_size="small", block_size=1024),
    "hed.safetensors": dict(size="GPT-XL", model_type="t2i",
                            adapter_size="small", block_size=1024),
    "seg_cocostuff.safetensors": dict(size="GPT-XL", model_type="t2i",
                                      adapter_size="small", block_size=1024),
    "edge_base.safetensors": dict(size="GPT-XL", model_type="t2i",
                                  adapter_size="base", block_size=1024),
    "depth_base.safetensors": dict(size="GPT-XL", model_type="t2i",
                                   adapter_size="base", block_size=1024),
}


def verify_zoo_dir(zoo_dir: str, max_new_tokens: Optional[int] = 64):
    """Gate every known zoo file present in zoo_dir. Returns GateResults."""
    import os

    results = []
    for name, kw in ZOO.items():
        path = os.path.join(zoo_dir, name)
        if os.path.exists(path):
            results.append(verify_checkpoint(
                path, name=name, max_new_tokens=max_new_tokens, **kw))
    return results


@dataclasses.dataclass
class GateResult:
    name: str
    agreement: float
    n_tokens: int
    passed: bool
    quant: Optional[Dict[str, Dict[str, float]]] = None  # eval/quant_report

    def line(self) -> str:
        status = "PASS" if self.passed else "FAIL"
        out = (f"[{status}] {self.name}: {self.agreement*100:.2f}% of "
               f"{self.n_tokens} greedy tokens match")
        if self.quant:
            for mode, m in self.quant.items():
                out += (f"\n    quant {mode}: teacher-forced agreement "
                        f"{m['teacher_forced_agreement']*100:.1f}%, max rel "
                        f"logit err {m['max_rel_logit_err']:.4f}")
        return out


def _build_ref_model(size: str, model_type: str, cfg, overrides: Dict[str, Any]):
    import torch

    t2i = model_type == "t2i"
    ref_mod = load_ref_gpt_module(t2i)
    common = dict(
        n_layer=cfg.n_layer, n_head=cfg.n_head, dim=cfg.dim,
        block_size=cfg.block_size, vocab_size=cfg.vocab_size,
        num_classes=cfg.num_classes, caption_dim=cfg.caption_dim,
        token_dropout_p=0.0, resid_dropout_p=0.0, ffn_dropout_p=0.0,
        drop_path_rate=0.0,
    )
    common.update(overrides)
    if t2i:
        args = ref_mod.ModelArgs(
            model_type="t2i", cls_token_num=cfg.cls_token_num,
            adapter_size=cfg.adapter_size, **common,
        )
    else:
        args = ref_mod.ModelArgs(
            model_type="c2i", cls_token_num=cfg.cls_token_num,
            condition_token_num=0, **common,
        )
    torch.manual_seed(0)
    model = ref_mod.Transformer(args).float()
    return ref_mod, model


def verify_checkpoint(
    ckpt_path: str,
    size: str,
    model_type: str = "t2i",
    adapter_size: str = "small",
    max_new_tokens: Optional[int] = None,
    cls_token_num: Optional[int] = None,
    block_size: int = 1024,
    cfg_scale: float = 2.0,
    batch: int = 2,
    seed: int = 0,
    name: Optional[str] = None,
    cfg_overrides: Optional[Dict[str, Any]] = None,
    ref_overrides: Optional[Dict[str, Any]] = None,
    quant_report: bool = False,
) -> GateResult:
    """Run the parity gate on one checkpoint file. Returns a GateResult.

    quant_report=True additionally measures the int8/W4 serving modes'
    token agreement against the converted bf16 weights (c2i only), so real
    released weights get a quantization-quality verdict in the same run."""
    import torch
    import jax
    import jax.numpy as jnp

    from controlar_tpu import generate as jgen
    from controlar_tpu.checkpoint import load_torch_file
    from controlar_tpu.config import gpt_config
    from controlar_tpu.convert.torch_gpt import convert_gpt_state_dict

    t2i = model_type == "t2i"
    if cls_token_num is None:
        cls_token_num = 120 if t2i else 1
    cfg = gpt_config(
        size, model_type=model_type, cls_token_num=cls_token_num,
        block_size=block_size, adapter_size=adapter_size,
        token_dropout_p=0.0, resid_dropout_p=0.0, ffn_dropout_p=0.0,
        **(cfg_overrides or {}),
    )
    max_new = max_new_tokens or cfg.block_size

    sd = load_torch_file(ckpt_path)
    ref_mod, model = _build_ref_model(size, model_type, cfg, ref_overrides or {})
    tensors = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    missing, unexpected = model.load_state_dict(tensors, strict=False)
    # stubbed adapter backbones legitimately miss their weights; anything else
    # missing means the checkpoint does not match the claimed size/type
    bad_missing = [k for k in missing if not k.startswith("adapter.")]
    if bad_missing:
        raise ValueError(
            f"checkpoint lacks {len(bad_missing)} model keys "
            f"(first: {bad_missing[:3]}) — wrong --size/--model-type?"
        )
    _patch_ref_model(model, t2i)
    model.eval()

    params = convert_gpt_state_dict(sd, cfg)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)

    rng = np.random.default_rng(seed)
    cond_feats = rng.standard_normal(
        (batch, cfg.block_size, cfg.adapter_dim)
    ).astype(np.float32)

    import importlib

    gen_mod = importlib.import_module("autoregressive.models.generate")
    if t2i:
        cap = rng.standard_normal(
            (batch, cfg.cls_token_num, cfg.caption_dim)
        ).astype(np.float32)
        emb = np.ones((batch, cfg.cls_token_num), np.float32)
        emb[0, : cfg.cls_token_num // 4] = 0  # left-padded caption
        with torch.no_grad():
            want = gen_mod.generate(
                model, torch.from_numpy(cap), max_new,
                emb_masks=torch.from_numpy(emb), cfg_scale=cfg_scale,
                condition=torch.from_numpy(cond_feats),
                temperature=1.0, top_k=0, top_p=1.0, sample_logits=False,
                control_strength=1.0,
            ).numpy()
        got = np.asarray(jgen.generate(
            params, cfg, caption_emb=jnp.asarray(cap), emb_masks=jnp.asarray(emb),
            adapter_features=jnp.asarray(cond_feats), max_new_tokens=max_new,
            cfg_scale=cfg_scale, sample_logits=False, control_strength=1.0,
            cache_dtype=jnp.float32, use_flash=False,
        ))
    else:
        labels = rng.integers(0, cfg.num_classes, (batch,)).astype(np.int64)
        with torch.no_grad():
            want = gen_mod.generate(
                model, torch.from_numpy(labels), max_new, cfg_scale=cfg_scale,
                condition=torch.from_numpy(cond_feats),
                temperature=1.0, top_k=0, top_p=1.0, sample_logits=False,
            ).numpy()
        got = np.asarray(jgen.generate(
            params, cfg, labels=jnp.asarray(labels),
            adapter_features=jnp.asarray(cond_feats), max_new_tokens=max_new,
            cfg_scale=cfg_scale, sample_logits=False,
            cache_dtype=jnp.float32, use_flash=False,
        ))

    agreement = float((got == want).mean())
    qrep = None
    if quant_report and not t2i:
        from controlar_tpu.eval.quant_report import measure_quant_agreement

        qrep = measure_quant_agreement(
            jax.tree.map(lambda a: a.astype(jnp.bfloat16), params), cfg,
            max_new_tokens=min(max_new, 128))
    return GateResult(
        name=name or ckpt_path, agreement=agreement,
        n_tokens=int(np.prod(want.shape)), passed=agreement == 1.0,
        quant=qrep,
    )


def self_test(model_type: str = "t2i", tmp_dir: Optional[str] = None) -> GateResult:
    """Prove the gate machinery without released weights: tiny random
    reference model -> state_dict on disk -> the exact verify_checkpoint path."""
    import os
    import tempfile

    import torch

    from controlar_tpu.config import gpt_config, _GPT_SIZES

    t2i = model_type == "t2i"
    # register a tiny size so verify_checkpoint can name it
    _GPT_SIZES.setdefault("GPT-TEST", dict(n_layer=6, n_head=2, dim=64))
    cfg = gpt_config(
        "GPT-TEST", model_type=model_type, cls_token_num=120 if t2i else 1,
        block_size=64, vocab_size=512, num_classes=16, caption_dim=96,
    )
    overrides = dict(image_size=128) if not t2i else {}
    ref_mod, model = _build_ref_model("GPT-TEST", model_type, cfg, overrides)
    # give the zero-init control MLPs random weights so fusion parity is a
    # non-trivial check (ref zero-inits them at construction, gpt_t2i.py:174)
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for _, p in model.named_parameters():
            if p.abs().sum() == 0 and p.ndim == 2:
                p.copy_(torch.randn(p.shape, generator=g) * 0.02)

    tmp_dir = tmp_dir or tempfile.mkdtemp()
    path = os.path.join(tmp_dir, f"selftest_{model_type}.pt")
    torch.save({"model": model.state_dict()}, path)
    return verify_checkpoint(
        path, "GPT-TEST", model_type=model_type, block_size=64,
        cls_token_num=120 if t2i else 1, max_new_tokens=64,
        name=f"self-test ({model_type})",
        cfg_overrides=dict(vocab_size=512, num_classes=16, caption_dim=96),
        ref_overrides=overrides,
    )
