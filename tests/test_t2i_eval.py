"""t2i CLIP-score metric (eval/t2i_eval.py) driven end to end with a tiny
random-weight transformers CLIP saved to disk (the loader path a real
clip-vit-base-patch32 checkout takes; ref evaluations/t2i/evaluation.py
GigaGAN protocol incl. the 'A photo depicts ' prepend)."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_clip_dir(tmp_path_factory):
    import torch
    from transformers import CLIPConfig, CLIPModel, CLIPImageProcessor

    torch.manual_seed(0)
    cfg = CLIPConfig(
        text_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, max_position_embeddings=77,
            vocab_size=49408),
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=32, patch_size=16),
        projection_dim=16,
    )
    model = CLIPModel(cfg)
    d = tmp_path_factory.mktemp("clip")
    model.save_pretrained(d)
    CLIPImageProcessor(size={"shortest_edge": 32},
                       crop_size={"height": 32, "width": 32}).save_pretrained(d)
    # CLIPProcessor needs a tokenizer; build a minimal offline CLIP-BPE
    # vocab on disk (no network in this image)
    import json
    import os

    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for i, w in enumerate(["a</w>", "photo</w>", "depicts</w>", "cat</w>",
                           "dog</w>", "red</w>", "blue</w>"]):
        vocab[w] = 2 + i
    with open(os.path.join(d, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(d, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    return str(d)


def test_clip_score_runs_and_bounds(tiny_clip_dir):
    from controlar_tpu.eval.t2i_eval import clip_score

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (4, 32, 32, 3), np.uint8)
    texts = ["a cat", "a dog", "red", "blue"]
    s = clip_score(imgs, texts, tiny_clip_dir)
    assert -1.0 <= s <= 1.0
    # identical image/text pairs give a deterministic score; how_many caps
    s2 = clip_score(imgs, texts, tiny_clip_dir, how_many=2)
    assert np.isfinite(s2)


def test_clean_fid_gated():
    from controlar_tpu.eval.t2i_eval import clean_fid

    with pytest.raises(ImportError, match="cleanfid"):
        clean_fid("/tmp/a", "/tmp/b")
