"""mmseg reward-model converter fixtures (ref evaluations/ade20k_mIoU.py:10-14,
cocostuff_mIoU.py:10-14).

No mmseg and no released weights exist in this environment, so these tests
pin the converter against SYNTHETIC state dicts written in the mmseg
dev-1.x / mmdet 3.x key layout (tiny shapes):
  - every key must be consumed (no unmatched / missing keys on either side),
  - the numerically non-trivial remappings (fused qkv split, PatchMerging
    unfold-vs-position channel order) are verified against the actual math,
  - the end-to-end segment callable runs on both kinds.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from controlar_tpu.convert import mmseg_seg  # noqa: E402


# ------------------------------------------------------------ deeplabv3 sd


def _bn_keys(sd, prefix, c):
    g = torch.Generator().manual_seed(len(sd))
    sd[f"{prefix}.weight"] = torch.rand(c, generator=g) + 0.5
    sd[f"{prefix}.bias"] = torch.randn(c, generator=g) * 0.1
    sd[f"{prefix}.running_mean"] = torch.randn(c, generator=g) * 0.1
    sd[f"{prefix}.running_var"] = torch.rand(c, generator=g) + 0.5
    sd[f"{prefix}.num_batches_tracked"] = torch.tensor(10)


def _conv_key(sd, key, cout, cin, k):
    g = torch.Generator().manual_seed(len(sd))
    sd[key] = torch.randn(cout, cin, k, k, generator=g) * 0.05


def make_mmseg_deeplabv3_sd(num_classes=7, base=8, head=16, depth=50):
    """Tiny ResNetV1c-d8 + ASPPHead state dict in mmseg key layout."""
    blocks = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[depth]
    sd = {}
    # deep stem: conv/bn at Sequential indices 0/1, 3/4, 6/7
    _conv_key(sd, "backbone.stem.0.weight", base // 2, 3, 3)
    _bn_keys(sd, "backbone.stem.1", base // 2)
    _conv_key(sd, "backbone.stem.3.weight", base // 2, base // 2, 3)
    _bn_keys(sd, "backbone.stem.4", base // 2)
    _conv_key(sd, "backbone.stem.6.weight", base, base // 2, 3)
    _bn_keys(sd, "backbone.stem.7", base)
    cin = base
    for i, n in enumerate(blocks, start=1):
        planes = base * (2 ** (i - 1))
        for j in range(n):
            p = f"backbone.layer{i}.{j}"
            _conv_key(sd, f"{p}.conv1.weight", planes, cin, 1)
            _bn_keys(sd, f"{p}.bn1", planes)
            _conv_key(sd, f"{p}.conv2.weight", planes, planes, 3)
            _bn_keys(sd, f"{p}.bn2", planes)
            _conv_key(sd, f"{p}.conv3.weight", planes * 4, planes, 1)
            _bn_keys(sd, f"{p}.bn3", planes * 4)
            if j == 0:
                _conv_key(sd, f"{p}.downsample.0.weight", planes * 4, cin, 1)
                _bn_keys(sd, f"{p}.downsample.1", planes * 4)
            cin = planes * 4
    for m, d in enumerate((1, 12, 24, 36)):
        _conv_key(sd, f"decode_head.aspp_modules.{m}.conv.weight",
                  head, cin, 1 if d == 1 else 3)
        _bn_keys(sd, f"decode_head.aspp_modules.{m}.bn", head)
    _conv_key(sd, "decode_head.image_pool.1.conv.weight", head, cin, 1)
    _bn_keys(sd, "decode_head.image_pool.1.bn", head)
    _conv_key(sd, "decode_head.bottleneck.conv.weight", head, head * 5, 3)
    _bn_keys(sd, "decode_head.bottleneck.bn", head)
    _conv_key(sd, "decode_head.conv_seg.weight", num_classes, head, 1)
    sd["decode_head.conv_seg.bias"] = torch.zeros(num_classes)
    # training-only head, must be ignored
    _conv_key(sd, "auxiliary_head.convs.0.conv.weight", head, cin // 2, 3)
    return sd


def test_deeplabv3_identity_load_and_forward():
    sd = make_mmseg_deeplabv3_sd()
    model, ncls = mmseg_seg.load_mmseg_deeplabv3(sd)
    assert ncls == 7
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        y = model(x)
    assert y.shape == (1, 7, 64, 64)
    # d8: stride-8 feature map before the final resize
    feat = model.backbone(x)
    assert feat.shape[2:] == (8, 8)


def test_deeplabv3_rejects_layout_drift():
    sd = make_mmseg_deeplabv3_sd()
    sd["decode_head.new_module.weight"] = torch.zeros(3)
    with pytest.raises(ValueError, match="unmatched"):
        mmseg_seg.load_mmseg_deeplabv3(sd)


# ----------------------------------------------------------- mask2former sd


def _lin(sd, prefix, o, i, bias=True):
    g = torch.Generator().manual_seed(len(sd))
    sd[f"{prefix}.weight"] = torch.randn(o, i, generator=g) * 0.05
    if bias:
        sd[f"{prefix}.bias"] = torch.randn(o, generator=g) * 0.05


def _norm(sd, prefix, c):
    g = torch.Generator().manual_seed(len(sd))
    sd[f"{prefix}.weight"] = torch.rand(c, generator=g) + 0.5
    sd[f"{prefix}.bias"] = torch.randn(c, generator=g) * 0.1


def make_mmseg_mask2former_sd(embed=32, depths=(1, 1, 1, 1), heads=(1, 1, 1, 1),
                              window=4, dim=32, queries=5, labels=7,
                              enc_layers=2, dec_layers=2):
    sd = {}
    g = torch.Generator().manual_seed(0)
    _conv = lambda key, co, ci, k: sd.__setitem__(
        key, torch.randn(co, ci, k, k, generator=g) * 0.05)
    _conv("backbone.patch_embed.projection.weight", embed, 3, 4)
    sd["backbone.patch_embed.projection.bias"] = torch.zeros(embed)
    _norm(sd, "backbone.patch_embed.norm", embed)
    for i, (depth, nh) in enumerate(zip(depths, heads)):
        c = embed * (2 ** i)
        for j in range(depth):
            p = f"backbone.stages.{i}.blocks.{j}"
            _norm(sd, f"{p}.norm1", c)
            _norm(sd, f"{p}.norm2", c)
            sd[f"{p}.attn.w_msa.relative_position_bias_table"] = (
                torch.randn((2 * window - 1) ** 2, nh, generator=g))
            idx = torch.arange(window * window)
            sd[f"{p}.attn.w_msa.relative_position_index"] = (
                idx[:, None] - idx[None, :]) % ((2 * window - 1) ** 2)
            _lin(sd, f"{p}.attn.w_msa.qkv", 3 * c, c)
            _lin(sd, f"{p}.attn.w_msa.proj", c, c)
            _lin(sd, f"{p}.ffn.layers.0.0", 4 * c, c)
            _lin(sd, f"{p}.ffn.layers.1", c, 4 * c)
        if i < len(depths) - 1:
            _norm(sd, f"backbone.stages.{i}.downsample.norm", 4 * c)
            _lin(sd, f"backbone.stages.{i}.downsample.reduction",
                 2 * c, 4 * c, bias=False)
        _norm(sd, f"backbone.norm{i}", c)
    # pixel decoder: 3 encoder levels + 1 lateral level
    pd = "decode_head.pixel_decoder"
    for i in range(3):
        cin = embed * (2 ** (3 - i))  # stage4, stage3, stage2
        _conv(f"{pd}.input_convs.{i}.conv.weight", dim, cin, 1)
        sd[f"{pd}.input_convs.{i}.conv.bias"] = torch.zeros(dim)
        _norm(sd, f"{pd}.input_convs.{i}.gn", dim)
    sd[f"{pd}.level_encoding.weight"] = torch.randn(3, dim, generator=g)
    for i in range(enc_layers):
        p = f"{pd}.encoder.layers.{i}"
        _lin(sd, f"{p}.self_attn.sampling_offsets", 2 * 2 * 3 * 4, dim)
        _lin(sd, f"{p}.self_attn.attention_weights", 2 * 3 * 4, dim)
        _lin(sd, f"{p}.self_attn.value_proj", dim, dim)
        _lin(sd, f"{p}.self_attn.output_proj", dim, dim)
        _norm(sd, f"{p}.norms.0", dim)
        _norm(sd, f"{p}.norms.1", dim)
        _lin(sd, f"{p}.ffn.layers.0.0", 1024, dim)
        _lin(sd, f"{p}.ffn.layers.1", dim, 1024)
    _conv(f"{pd}.lateral_convs.0.conv.weight", dim, embed, 1)
    _norm(sd, f"{pd}.lateral_convs.0.gn", dim)
    _conv(f"{pd}.output_convs.0.conv.weight", dim, dim, 3)
    _norm(sd, f"{pd}.output_convs.0.gn", dim)
    _conv(f"{pd}.mask_feature.weight", dim, dim, 1)
    sd[f"{pd}.mask_feature.bias"] = torch.zeros(dim)
    # transformer decoder
    sd["decode_head.query_embed.weight"] = torch.randn(queries, dim, generator=g)
    sd["decode_head.query_feat.weight"] = torch.randn(queries, dim, generator=g)
    sd["decode_head.level_embed.weight"] = torch.randn(3, dim, generator=g)
    td = "decode_head.transformer_decoder"
    for i in range(dec_layers):
        p = f"{td}.layers.{i}"
        for attn in ("self_attn", "cross_attn"):
            sd[f"{p}.{attn}.attn.in_proj_weight"] = (
                torch.randn(3 * dim, dim, generator=g) * 0.05)
            sd[f"{p}.{attn}.attn.in_proj_bias"] = torch.zeros(3 * dim)
            _lin(sd, f"{p}.{attn}.attn.out_proj", dim, dim)
        for n in range(3):
            _norm(sd, f"{p}.norms.{n}", dim)
        _lin(sd, f"{p}.ffn.layers.0.0", 2 * dim, dim)
        _lin(sd, f"{p}.ffn.layers.1", dim, 2 * dim)
    _norm(sd, f"{td}.post_norm", dim)
    _lin(sd, "decode_head.cls_embed", labels + 1, dim)
    for m in (0, 2, 4):
        _lin(sd, f"decode_head.mask_embed.{m}", dim, dim)
    return sd


def test_mask2former_full_conversion_and_forward():
    sd = make_mmseg_mask2former_sd()
    model, num_labels = mmseg_seg.load_mmseg_mask2former(
        sd, num_attention_heads=2)
    assert num_labels == 7
    cfg = model.config
    assert cfg.backbone_config.depths == [1, 1, 1, 1]
    assert cfg.num_queries == 5 and cfg.hidden_dim == 32
    with torch.no_grad():
        out = model(pixel_values=torch.randn(1, 3, 64, 64))
    assert out.class_queries_logits.shape == (1, 5, 8)
    assert out.masks_queries_logits.shape[:2] == (1, 5)


def test_mask2former_every_key_consumed():
    sd = make_mmseg_mask2former_sd()
    hf_sd, unmatched = mmseg_seg.convert_mask2former_state(sd)
    assert unmatched == []
    # and a drifted layout is loud
    sd["decode_head.pixel_decoder.bogus.weight"] = torch.zeros(2)
    with pytest.raises(ValueError, match="unmatched"):
        mmseg_seg.load_mmseg_mask2former(sd, num_attention_heads=2)


def test_patch_merging_permutation_math():
    """The converted reduction/norm must make HF's position-major PatchMerging
    equal to mmcv's unfold-based (channel-major) one on the same input."""
    torch.manual_seed(0)
    C, H, W = 3, 4, 4
    x = torch.randn(1, C, H, W)
    red = torch.randn(2 * C, 4 * C) * 0.1
    nw = torch.rand(4 * C) + 0.5
    nb = torch.randn(4 * C) * 0.1

    # mmcv PatchMerging: unfold (channel-major: c*4 + dy*2+dx) -> LN -> Linear
    unf = torch.nn.functional.unfold(x, kernel_size=2, stride=2)  # (1,4C,L)
    unf = unf.transpose(1, 2)  # (1, L, 4C)
    mm_out = torch.nn.functional.layer_norm(
        unf, (4 * C,), weight=nw, bias=nb) @ red.T

    # HF/microsoft: x0=(0,0), x1=(1,0), x2=(0,1), x3=(1,1), concat last dim
    xp = x.permute(0, 2, 3, 1)  # B,H,W,C
    hf_in = torch.cat([xp[:, 0::2, 0::2], xp[:, 1::2, 0::2],
                       xp[:, 0::2, 1::2], xp[:, 1::2, 1::2]], dim=-1)
    hf_in = hf_in.reshape(1, -1, 4 * C)
    perm = torch.as_tensor(mmseg_seg._merge_perm(C))
    hf_out = torch.nn.functional.layer_norm(
        hf_in, (4 * C,), weight=nw[perm], bias=nb[perm]) @ red[:, perm].T

    torch.testing.assert_close(hf_out, mm_out, rtol=1e-5, atol=1e-5)


def test_qkv_split_matches_multihead_attention():
    """Splitting a fused in_proj into q/k/v thirds reproduces
    nn.MultiheadAttention's packed projection (the torch convention both
    mmseg's w_msa.qkv and the decoder's in_proj_weight follow)."""
    torch.manual_seed(1)
    dim, nh = 8, 2
    mha = torch.nn.MultiheadAttention(dim, nh, batch_first=True)
    q = torch.randn(1, 5, dim)
    with torch.no_grad():
        ref, _ = mha(q, q, q, need_weights=False)
    w = mha.in_proj_weight
    b = mha.in_proj_bias
    qw, kw, vw = torch.chunk(w, 3, 0)
    qb, kb, vb = torch.chunk(b, 3, 0)

    def attn(x):
        qh = (x @ qw.T + qb).view(1, 5, nh, dim // nh).transpose(1, 2)
        kh = (x @ kw.T + kb).view(1, 5, nh, dim // nh).transpose(1, 2)
        vh = (x @ vw.T + vb).view(1, 5, nh, dim // nh).transpose(1, 2)
        a = torch.softmax(qh @ kh.transpose(-1, -2) / (dim // nh) ** 0.5, -1)
        o = (a @ vh).transpose(1, 2).reshape(1, 5, dim)
        return o @ mha.out_proj.weight.T + mha.out_proj.bias

    with torch.no_grad():
        torch.testing.assert_close(attn(q), ref, rtol=1e-5, atol=1e-5)


def test_segmenter_frontend_dispatch(tmp_path):
    """load_mmseg_segmenter end-to-end on a .pth for both kinds."""
    p1 = tmp_path / "dlv3.pth"
    torch.save({"state_dict": make_mmseg_deeplabv3_sd(),
                "meta": {"mmseg_version": "1.0.0rc2"}}, p1)
    seg = mmseg_seg.load_mmseg_segmenter(str(p1))
    imgs = np.random.default_rng(0).integers(
        0, 255, (2, 64, 64, 3)).astype(np.uint8)
    out = seg(imgs)
    assert out.shape == (2, 64, 64) and out.min() >= 0 and out.max() < 7

    p2 = tmp_path / "m2f.pth"
    torch.save({"state_dict": make_mmseg_mask2former_sd()}, p2)
    seg2 = mmseg_seg.load_mmseg_segmenter(str(p2), label_offset=0)
    out2 = seg2(imgs)
    assert out2.shape == (2, 64, 64) and out2.max() < 7
