"""carpack packed-dataset format: native C++ reader vs writer round trip,
Python-reader equivalence, tree packing."""
import os
import numpy as np
import pytest

from controlar_tpu.data.carpack import (
    CarpackReader, CarpackWriter, _build_native, pack_tree,
)


def _write_sample_pack(path, n=5):
    rng = np.random.default_rng(0)
    records = []
    with CarpackWriter(str(path)) as w:
        for i in range(n):
            rec = {
                "tokens": rng.integers(0, 1000, (64,)).astype(np.int32),
                "image": rng.integers(0, 255, (16, 16, 3)).astype(np.uint8),
                "caption_emb": rng.standard_normal((7, 32)).astype(np.float32),
                "blob": bytes([i] * 10),
            }
            records.append(rec)
            w.write(rec)
    return records


def test_native_reader_roundtrip(tmp_path):
    path = tmp_path / "data.carpack"
    records = _write_sample_pack(path)
    r = CarpackReader(str(path))
    assert r.native, "C++ carpack reader failed to build"
    assert len(r) == len(records)
    for i, want in enumerate(records):
        got = r[i]
        assert set(got) == set(want)
        for k in ("tokens", "image", "caption_emb"):
            np.testing.assert_array_equal(got[k], want[k])
        assert got["blob"] == want["blob"]
    r.close()


def test_python_reader_matches_native(tmp_path):
    path = tmp_path / "data.carpack"
    records = _write_sample_pack(path)
    rp = CarpackReader(str(path), force_python=True)
    assert not rp.native
    for i, want in enumerate(records):
        got = rp[i]
        for k in ("tokens", "image", "caption_emb"):
            np.testing.assert_array_equal(got[k], want[k])
        assert got["blob"] == want["blob"]


def test_pack_tree(tmp_path):
    import os
    from PIL import Image

    tree = tmp_path / "tree"
    rng = np.random.default_rng(1)
    for sub in ("code", "caption_emb", "image"):
        os.makedirs(tree / sub)
    for i in range(3):
        np.save(tree / "code" / f"{i}.npy", rng.integers(0, 64, (4, 4)))
        np.savez(tree / "caption_emb" / f"{i}.npz",
                 caption_emb=rng.standard_normal((1, 5, 32)).astype(np.float32),
                 prompt=np.asarray(["x"]))
        Image.fromarray(
            rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
        ).save(tree / "image" / f"{i}.png")

    out = tmp_path / "packed.carpack"
    n = pack_tree(str(tree), str(out))
    assert n == 3
    r = CarpackReader(str(out))
    assert len(r) == 3
    item = r[0]
    assert item["tokens"].shape == (4, 4)
    assert item["image"].shape == (16, 16, 3)


@pytest.mark.slow
def test_pack_then_train_matches_tree(tmp_path):
    """The production claim: pack -> train == tree -> train, loss-for-loss."""
    import jax
    from controlar_tpu.config import VQConfig
    from controlar_tpu.models import vq as jvq
    from controlar_tpu.models.vit import ViTConfig
    from controlar_tpu.data.extract import extract_tree
    from controlar_tpu.data.t2i_control import (
        T2IControlCodeDataset, T2IControlConfig)
    from controlar_tpu.data.carpack import (
        CarpackControlDataset, pack_control_dataset)
    from controlar_tpu.data.loader import ShardedLoader
    from controlar_tpu.train.trainer import Trainer, TrainerConfig

    class _FakeT5:
        def get_text_embeddings(self, texts):
            return (np.ones((len(texts), 7, 2048), np.float32),
                    np.ones((len(texts), 7), np.int64))

    img = 64
    vq_cfg = VQConfig(codebook_size=64, codebook_embed_dim=8, z_channels=16,
                      ch=16)
    vq_params = jvq.init_vq_params(jax.random.PRNGKey(0), vq_cfg)
    rng = np.random.default_rng(0)
    samples = [
        {"image": rng.integers(0, 255, (img, img, 3)).astype(np.uint8),
         "caption": f"s{i}"} for i in range(8)
    ]
    tree = str(tmp_path / "tree")
    extract_tree(tree, samples, vq_params, vq_cfg, t5_embedder=_FakeT5(),
                 image_size=img)

    ds_tree = T2IControlCodeDataset(T2IControlConfig(
        code_path=tree, condition_type="canny", image_size=img))
    car = str(tmp_path / "packed.car")
    n = pack_control_dataset(ds_tree, car)
    assert n == 8
    ds_car = CarpackControlDataset(car)
    assert len(ds_car) == 8

    # item-for-item equality
    for i in range(8):
        a, b = ds_tree[i], ds_car[i]
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))

    def losses(ds, results):
        tcfg = TrainerConfig(
            gpt_model="GPT-B", model_type="t2i", image_size=img,
            condition_type="canny", epochs=2, global_batch_size=8,
            results_dir=str(tmp_path / results), ckpt_every=100, log_every=1,
            model_overrides=dict(dim=64, n_layer=2, n_head=2, vocab_size=64),
            adapter_override=ViTConfig(hidden_size=384, n_layer=1, n_head=2,
                                       patch_size=14, pos_grid=4,
                                       layerscale=True),
        )
        loader = ShardedLoader(ds, batch_size=8, num_workers=2, seed=5)
        tr = Trainer(tcfg)
        tr.fit(loader, max_steps=2)
        import json
        with open(os.path.join(tcfg.results_dir, "metrics.jsonl")) as f:
            return [json.loads(l)["loss"] for l in f]

    l_tree = losses(ds_tree, "r_tree")
    l_car = losses(ds_car, "r_car")
    assert len(l_tree) == len(l_car) >= 1
    np.testing.assert_allclose(l_tree, l_car, rtol=1e-6)
