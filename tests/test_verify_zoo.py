"""The released-checkpoint parity gate (verify_zoo.py) proven on the
random-weight path: a tiny reference model's state_dict goes to disk, then
through the exact convert -> dual greedy-generate -> compare pipeline the
real zoo run will use (VERDICT r1 item 4)."""
import pytest


@pytest.mark.parametrize("model_type", ["c2i", "t2i"])
def test_self_gate_passes(tmp_path, model_type):
    from controlar_tpu import verify_zoo

    r = verify_zoo.self_test(model_type=model_type, tmp_dir=str(tmp_path))
    assert r.passed, r.line()
    assert r.agreement == 1.0
    assert r.n_tokens == 2 * 64


def test_wrong_size_rejected(tmp_path):
    """A checkpoint that does not match the claimed size fails loudly."""
    import torch

    from controlar_tpu import verify_zoo

    path = tmp_path / "bogus.pt"
    torch.save({"model": {"tok_embeddings.weight": torch.zeros(4, 4)}}, str(path))
    with pytest.raises((ValueError, KeyError, RuntimeError)):
        verify_zoo.verify_checkpoint(
            str(path), "GPT-TEST", model_type="c2i", block_size=64,
            max_new_tokens=4,
            cfg_overrides=dict(vocab_size=512, num_classes=16, caption_dim=96),
            ref_overrides=dict(image_size=128),
        )
