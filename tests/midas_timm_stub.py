"""Tests-only torch stand-in for timm's `vit_base_resnet50_384`.

The environment has no timm, but the reference's MiDaS code only needs the
model object's structure (patch_embed.backbone.stages / .proj, cls_token,
pos_embed, blocks, norm) — the flexible-pos-embed forward is injected by the
reference itself (condition/midas/midas/vit.py forward_flex). This module
reproduces timm's documented hybrid architecture (BiT ResNetV2-50 stem +
stages with StdConv2dSame(eps=1e-8)/GroupNorm(32) non-preact bottlenecks,
ViT-B/16 blocks) with timm's parameter names, so the reference DPTDepthModel
can be instantiated, randomized, exported, and compared against the JAX
implementation. Install as `sys.modules["timm"] = this_module` before
importing the reference midas package.
"""
import math
import types

import torch
import torch.nn as nn
import torch.nn.functional as F


def _same_pad(x, k, s):
    ih, iw = x.shape[-2:]
    ph = max((math.ceil(ih / s) - 1) * s + k - ih, 0)
    pw = max((math.ceil(iw / s) - 1) * s + k - iw, 0)
    return F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))


class StdConv2dSame(nn.Conv2d):
    def __init__(self, *a, eps=1e-8, **kw):
        kw.setdefault("bias", False)
        super().__init__(*a, **kw)
        self.eps = eps

    def forward(self, x):
        w = self.weight
        var, mean = torch.var_mean(w, dim=[1, 2, 3], keepdim=True, unbiased=False)
        w = (w - mean) / torch.sqrt(var + self.eps)
        x = _same_pad(x, self.kernel_size[0], self.stride[0])
        return F.conv2d(x, w, self.bias, self.stride, 0)


class GroupNormAct(nn.GroupNorm):
    def __init__(self, ch, apply_act=True):
        super().__init__(32, ch)
        self.apply_act = apply_act

    def forward(self, x):
        x = super().forward(x)
        return F.relu(x) if self.apply_act else x


class Downsample(nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv = StdConv2dSame(cin, cout, 1, stride=stride)
        self.norm = GroupNormAct(cout, apply_act=False)

    def forward(self, x):
        return self.norm(self.conv(x))


class Bottleneck(nn.Module):
    def __init__(self, cin, cout, mid, stride):
        super().__init__()
        self.downsample = (
            Downsample(cin, cout, stride) if (cin != cout or stride != 1) else None
        )
        self.conv1 = StdConv2dSame(cin, mid, 1)
        self.norm1 = GroupNormAct(mid)
        self.conv2 = StdConv2dSame(mid, mid, 3, stride=stride)
        self.norm2 = GroupNormAct(mid)
        self.conv3 = StdConv2dSame(mid, cout, 1)
        self.norm3 = GroupNormAct(cout, apply_act=False)

    def forward(self, x):
        shortcut = self.downsample(x) if self.downsample is not None else x
        x = self.norm1(self.conv1(x))
        x = self.norm2(self.conv2(x))
        x = self.norm3(self.conv3(x))
        return F.relu(x + shortcut)


class Stage(nn.Module):
    def __init__(self, cin, cout, n, stride):
        super().__init__()
        blocks = []
        for i in range(n):
            blocks.append(Bottleneck(cin if i == 0 else cout, cout, cout // 4,
                                     stride if i == 0 else 1))
        self.blocks = nn.Sequential(*blocks)

    def forward(self, x):
        return self.blocks(x)


class Stem(nn.Module):
    def __init__(self, width=64):
        super().__init__()
        self.conv = StdConv2dSame(3, width, 7, stride=2)
        self.norm = GroupNormAct(width)

    def forward(self, x):
        x = self.norm(self.conv(x))
        return F.max_pool2d(_same_pad(x, 3, 2).clamp_min(-1e30), 3, 2)


class ResNetV2(nn.Module):
    def __init__(self, layers=(3, 4, 9), width=64):
        super().__init__()
        self.stem = Stem(width)
        chs = (256, 512, 1024)
        stages = []
        cin = width
        for i, n in enumerate(layers):
            stages.append(Stage(cin, chs[i], n, 1 if i == 0 else 2))
            cin = chs[i]
        self.stages = nn.Sequential(*stages)

    def forward(self, x):
        return self.stages(self.stem(x))


class Attention(nn.Module):
    def __init__(self, dim=768, heads=12):
        super().__init__()
        self.heads = heads
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        b, t, c = x.shape
        hd = c // self.heads
        q, k, v = self.qkv(x).reshape(b, t, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
        a = (q @ k.transpose(-2, -1)) * hd ** -0.5
        a = a.softmax(dim=-1)
        return self.proj((a @ v).transpose(1, 2).reshape(b, t, c))


class Mlp(nn.Module):
    def __init__(self, dim=768, hidden=3072):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class Block(nn.Module):
    def __init__(self, dim=768):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = Attention(dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class PatchEmbed(nn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = ResNetV2()
        self.proj = nn.Conv2d(1024, 768, 1)


class ViTHybrid(nn.Module):
    def __init__(self, depth=12, dim=768, grid=24):
        super().__init__()
        self.patch_embed = PatchEmbed()
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, grid * grid + 1, dim))
        self.pos_drop = nn.Identity()
        self.blocks = nn.ModuleList([Block(dim) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)


def create_model(name, pretrained=False, **kw):
    assert name == "vit_base_resnet50_384", name
    torch.manual_seed(0)
    m = ViTHybrid()
    return m


# the reference only uses timm.create_model
models = types.SimpleNamespace(create_model=create_model)
