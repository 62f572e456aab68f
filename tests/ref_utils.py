"""Helpers for numerical-parity tests against the torch reference.

The reference repo (read-only, /root/reference) is imported — never copied —
and exercised with random weights; outputs are compared against the JAX
implementation after weight conversion. Adapter backbones (DINOv2/ViT) are
stubbed with Identity so the control path can be driven with precomputed
adapter features.
"""
import sys
import types

import numpy as np

from tests.conftest import add_reference_path


def load_ref_gpt_module(t2i: bool = True):
    """Import the reference gpt module with HF adapter constructors stubbed."""
    add_reference_path()
    import torch.nn as nn

    class _IdentityAdapter(nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

        def forward(self, x):
            return x

    # pre-stub the adapter modules so importing gpt doesn't pull HF weights
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


def disable_cfg_dropout(model):
    """Make the reference train-mode forward deterministic: CFG drop_ids all
    False for the label/caption embedder (shared with the condition embedder)."""
    import torch

    emb = model.cls_embedding

    def no_drop(x, force_drop_ids=None):
        return x, torch.zeros(x.shape[0], dtype=torch.bool)

    emb.token_drop = no_drop


def force_fp32_condition_mlp(model):
    """The c2i reference hard-casts the condition to bf16 at prefill
    (ref gpt.py:443 `condition.to(torch.bfloat16)`), which breaks fp32 parity
    runs; undo the cast inside condition_mlp for test purposes."""
    cm = model.condition_mlp
    orig = cm.forward

    def fwd(caption, train=False, force_drop_ids=None, drop_ids=None):
        return orig(caption.float(), train, force_drop_ids, drop_ids)

    cm.forward = fwd


def accept_control_strength(model):
    """The reference's shared generate.py always forwards control_strength to
    the model (generate.py:87), but the c2i Transformer.forward (gpt.py) does
    not accept it — in-tree c2i sampling is broken against this generate.py.
    Patch the ref model to accept-and-ignore it (gpt.py applies no strength
    scaling in its fusion, gpt.py:446-466), matching strength=1 semantics."""
    orig = model.forward

    def fwd(*args, control_strength=1, **kw):
        return orig(*args, **kw)

    model.forward = fwd


def randomize_zero_mlps(model, seed=0):
    """The reference zero-inits control MLPs (gpt_t2i.py:174-175); give them
    random weights so fusion-path parity is a non-trivial check."""
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if p.abs().sum() == 0 and p.ndim == 2:
                p.copy_(torch.randn(p.shape, generator=g) * 0.02)


def state_dict_numpy(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
