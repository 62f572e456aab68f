"""mIoU reward-model harness (eval/segmenter.py): the transformers
integration drives eval/miou.miou_eval end to end with a tiny random-weight
SegFormer saved to disk (the same loader path a real ADE20K/COCOStuff
checkpoint takes, ref evaluations/ade20k_mIoU.py protocol)."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_segformer_dir(tmp_path_factory):
    import torch
    from transformers import (SegformerConfig, SegformerForSemanticSegmentation,
                              SegformerImageProcessor)

    torch.manual_seed(0)
    cfg = SegformerConfig(
        num_channels=3, num_encoder_blocks=2, depths=[1, 1],
        sr_ratios=[2, 1], hidden_sizes=[8, 16], patch_sizes=[7, 3],
        strides=[4, 2], num_attention_heads=[1, 2], decoder_hidden_size=16,
        num_labels=5,
    )
    model = SegformerForSemanticSegmentation(cfg)
    d = tmp_path_factory.mktemp("segformer")
    model.save_pretrained(d)
    SegformerImageProcessor(size={"height": 32, "width": 32}).save_pretrained(d)
    return str(d)


def test_segmenter_contract(tiny_segformer_dir):
    from controlar_tpu.eval.segmenter import make_segmenter

    seg = make_segmenter(tiny_segformer_dir)
    imgs = np.random.default_rng(0).integers(0, 256, (3, 32, 32, 3), np.uint8)
    labels = seg(imgs)
    assert labels.shape == (3, 32, 32)
    assert labels.dtype == np.int64
    assert labels.min() >= 0 and labels.max() < 5


def test_miou_eval_end_to_end(tiny_segformer_dir):
    from controlar_tpu.eval.miou import miou_eval
    from controlar_tpu.eval.segmenter import make_segmenter

    seg = make_segmenter(tiny_segformer_dir)
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (2, 32, 32, 3), np.uint8)
    # gt == the model's own predictions -> perfect mIoU over present classes
    gt = seg(imgs)
    score = miou_eval(seg, [(imgs, gt)], num_classes=5)
    assert score == pytest.approx(1.0)
    # shuffled gt -> strictly worse
    worse = miou_eval(seg, [(imgs, (gt + 1) % 5)], num_classes=5)
    assert worse < 1.0


def test_ade20k_offset_autodetect(tmp_path):
    """150-class configs get the ADE20K +1 prediction offset automatically."""
    import json

    from controlar_tpu.eval import segmenter as S

    calls = {}

    def fake_hf(model_dir, device="cpu", label_offset=0, batch_size=4):
        calls["offset"] = label_offset
        return lambda imgs: np.zeros(imgs.shape[:3], np.int64)

    (tmp_path / "config.json").write_text(json.dumps(
        {"id2label": {str(i): f"c{i}" for i in range(150)}}))
    orig = S.hf_semantic_segmenter
    S.hf_semantic_segmenter = fake_hf
    try:
        S.make_segmenter(str(tmp_path))
        assert calls["offset"] == 1
        S.make_segmenter(str(tmp_path), label_offset=0)
        assert calls["offset"] == 0
    finally:
        S.hf_semantic_segmenter = orig


def test_ade20k_binning_covers_class_150():
    """With the +1 offset, ADE20K labels span 1..150; 151 bins score class
    150 correctly (150 bins would alias it into the wrong rows)."""
    from controlar_tpu.eval.miou import ConfusionMatrix

    cm = ConfusionMatrix(num_classes=151, ignore_index=0)
    gt = np.array([[150, 150, 3, 0]])   # one ignored pixel
    pred = np.array([[150, 3, 3, 150]])
    cm.update(gt, pred)
    miou, iou = cm.miou()
    assert iou[150] == pytest.approx(0.5)   # 1 TP, 1 FN
    assert iou[3] == pytest.approx(0.5)     # 1 TP, 1 FP
    assert np.isnan(iou[0])                 # ignore bin untouched
    assert miou == pytest.approx(0.5)
