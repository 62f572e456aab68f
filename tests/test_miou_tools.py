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
