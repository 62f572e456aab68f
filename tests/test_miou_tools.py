"""mIoU confusion matrix + tools round trips."""
import numpy as np

import jax

from controlar_tpu.eval.miou import ConfusionMatrix, miou_eval
from controlar_tpu.tools import export_params_npz, import_params_npz


def test_confusion_matrix_miou():
    cm = ConfusionMatrix(num_classes=3)
    gt = np.array([0, 0, 1, 1, 2, 2, 255])  # 255 ignored
    pred = np.array([0, 1, 1, 1, 2, 0, 0])
    cm.update(gt, pred)
    miou, iou = cm.miou()
    # class0: tp=1 fp=1 fn=1 -> 1/3; class1: tp=2 fp=1 fn=0 -> 2/3;
    # class2: tp=1 fp=0 fn=1 -> 1/2
    np.testing.assert_allclose(iou, [1 / 3, 2 / 3, 1 / 2])
    np.testing.assert_allclose(miou, np.mean([1 / 3, 2 / 3, 1 / 2]))


def test_miou_eval_perfect_segmenter():
    labels = np.random.default_rng(0).integers(0, 5, (2, 8, 8))
    score = miou_eval(
        segmenter=lambda imgs: labels, pairs=[(np.zeros((2, 8, 8, 3)), labels)],
        num_classes=5,
    )
    assert score == 1.0


def test_params_npz_roundtrip(tmp_path):
    from controlar_tpu.config import GPTConfig
    from controlar_tpu.models import gpt as jgpt

    cfg = GPTConfig(model_type="c2i", dim=32, n_layer=2, n_head=2,
                    cls_token_num=1, block_size=16, vocab_size=32, num_classes=4)
    params = jgpt.init_gpt_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "p.npz")
    export_params_npz(params, path)
    back = import_params_npz(path)
    flat_a = jax.tree.leaves(jax.device_get(params))
    flat_b = jax.tree.leaves(back)
    assert len(flat_a) == len(flat_b)
    np.testing.assert_allclose(
        sum(float(np.sum(x)) for x in flat_a),
        sum(float(np.sum(x)) for x in flat_b),
        rtol=1e-6,
    )


def test_params_npz_roundtrip_bfloat16(tmp_path):
    """np.savez stores bf16 as raw V2 void; import must re-view it
    (regression: trained-ckpt quant-report load failed with
    'No cast function available')."""
    import jax.numpy as jnp

    tree = {"w": jnp.full((3, 4), 1.5, jnp.bfloat16),
            "b": {"0": jnp.arange(4, dtype=jnp.float32)}}
    path = str(tmp_path / "bf16.npz")
    export_params_npz(tree, path)
    back = import_params_npz(path)
    assert back["w"].dtype == jnp.bfloat16
    assert back["b"]["0"].dtype == np.float32
    np.testing.assert_array_equal(np.asarray(tree["w"]), back["w"])
    # and it casts cleanly into a jax array (the failing op)
    assert jnp.asarray(back["w"], jnp.bfloat16).dtype == jnp.bfloat16


def test_reference_miou_matches_reference_script_math():
    """Fixture parity with ref evaluations/ade20k_mIoU.py:42-66 — the exact
    numpy accounting (incl. the pos_gt-numerator / iou_valid-denominator
    quirk), replicated inline here since mmseg is not importable."""
    from controlar_tpu.eval.miou import (
        reference_confusion_update, reference_miou)

    rng = np.random.default_rng(0)
    K, ignore = 7, 0
    conf_ref = np.zeros((K + 1, K + 1), np.int64)
    conf_our = np.zeros((K + 1, K + 1), np.int64)
    for _ in range(5):
        gt_raw = rng.integers(0, K + 1, (16, 16))       # 1-based w/ 0=ignore
        pred = rng.integers(0, K, (16, 16))             # model classes 0..K-1
        # --- verbatim reference math (ade20k_mIoU.py:42-50) ---
        gt = gt_raw.copy()
        p = pred.copy() + 1
        gt[gt == ignore] = K
        conf_ref += np.bincount(
            (K + 1) * p.reshape(-1) + gt.reshape(-1),
            minlength=conf_ref.size,
        ).reshape(conf_ref.shape)
        # --- ours ---
        reference_confusion_update(conf_our, pred, gt_raw, K,
                                   ignore_label=ignore, pred_offset=1)
    np.testing.assert_array_equal(conf_our, conf_ref)

    # --- verbatim reference math (ade20k_mIoU.py:54-66) ---
    iou = np.full(K, np.nan, dtype=np.float64)
    tp = conf_ref.diagonal()[:-1].astype(np.float64)
    pos_gt = np.sum(conf_ref[:-1, :-1], axis=0).astype(np.float64)
    pos_pred = np.sum(conf_ref[:-1, :-1], axis=1).astype(np.float64)
    acc_valid = pos_gt > 0
    iou_valid = (pos_gt + pos_pred) > 0
    union = pos_gt + pos_pred - tp
    iou[acc_valid] = tp[acc_valid] / union[acc_valid]
    want = np.sum(iou[acc_valid]) / np.sum(iou_valid)
    got = reference_miou(conf_ref, K)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_reference_miou_quirk_hallucinated_class_dilutes():
    """A class never in gt but predicted counts in the denominator only."""
    from controlar_tpu.eval.miou import (
        reference_confusion_update, reference_miou)

    K = 3
    conf = np.zeros((K + 1, K + 1), np.int64)
    gt = np.array([[0, 0], [1, 1]])      # classes 0 and 1 in gt
    pred = np.array([[0, 0], [2, 2]])    # class 2 hallucinated
    reference_confusion_update(conf, pred, gt, K, ignore_label=255)
    # IoU(0)=1, IoU(1)=0, class 2 in denominator: (1+0)/3
    np.testing.assert_allclose(reference_miou(conf, K), 1.0 / 3.0)


def test_protocol_wrappers_perfect_segmenter():
    from controlar_tpu.eval.miou import ade20k_miou, cocostuff_miou

    rng = np.random.default_rng(1)
    # ADE: gt 1-based (0=ignore); a perfect scorer predicts gt-1
    gt = rng.integers(0, 151, (2, 8, 8))
    imgs = np.zeros((2, 8, 8, 3), np.uint8)

    holder = {}

    def seg_ade(images):
        return np.maximum(holder["gt"] - 1, 0)

    holder["gt"] = gt
    assert ade20k_miou(seg_ade, [(imgs, gt)]) == 1.0

    gt2 = rng.integers(0, 171, (2, 8, 8))
    gt2[0, 0] = 255  # ignore pixels don't break perfection

    def seg_coco(images):
        return np.where(holder2["gt"] == 255, 0, holder2["gt"])

    holder2 = {"gt": gt2}
    assert cocostuff_miou(seg_coco, [(imgs, gt2)]) == 1.0
