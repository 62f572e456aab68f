"""t2i jsonl dataset semantics + sharded FID sampler + loader shards."""
import json
import os

import numpy as np

import jax

from controlar_tpu.data.t2i_jsonl import T2IJsonlConfig, Text2ImgJsonlDataset
from controlar_tpu.data.loader import ShardedLoader
import pytest


def _make_tree(tmp_path, n=4, image_size=32):
    from PIL import Image

    os.makedirs(tmp_path / "lists", exist_ok=True)
    os.makedirs(tmp_path / "t5" / "part0", exist_ok=True)
    rng = np.random.default_rng(0)
    recs = []
    for i in range(n):
        p = tmp_path / f"img_{i}.png"
        Image.fromarray(
            rng.integers(0, 255, (image_size, image_size, 3)).astype(np.uint8)
        ).save(p)
        recs.append({"image_path": str(p)})
        np.save(tmp_path / "t5" / "part0" / f"{i}.npy",
                rng.standard_normal((1, 9, 2048)).astype(np.float32))
    # one broken path -> dummy fallback
    recs.append({"image_path": str(tmp_path / "missing.png")})
    with open(tmp_path / "lists" / "part0.jsonl", "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")
    return n


def test_jsonl_dataset(tmp_path):
    n = _make_tree(tmp_path)
    ds = Text2ImgJsonlDataset(T2IJsonlConfig(
        data_path=str(tmp_path / "lists"),
        t5_feat_path=str(tmp_path / "t5"),
        image_size=32,
    ))
    assert len(ds) == n + 1
    item = ds[0]
    assert item["valid"] == 1.0
    assert item["emb_mask"].sum() == 9
    assert (item["caption_emb"][:-9] == 0).all()
    bad = ds[n]  # broken path
    assert bad["valid"] == 0.0

    batch = ds.make_batch([ds[i] for i in range(3)])
    assert batch["image"].shape == (3, 32, 32, 3)


def test_sharded_loader_partitions():
    class DS:
        def __len__(self):
            return 20

        def __getitem__(self, i):
            return {"x": np.asarray([i])}

        def make_batch(self, items):
            return {"x": np.stack([it["x"] for it in items])}

    seen = []
    for pidx in range(2):
        loader = ShardedLoader(DS(), batch_size=2, shuffle=False,
                               process_index=pidx, process_count=2,
                               num_workers=2)
        for batch in loader:
            seen.extend(batch["x"].ravel().tolist())
    assert sorted(seen) == list(range(20))


@pytest.mark.slow
def test_fid_sampler_shapes(tmp_path):
    from controlar_tpu.config import GPTConfig, VQConfig
    from controlar_tpu.models import gpt as jgpt, vq as jvq, vit as jvit
    from controlar_tpu.pipeline import ControlARPipeline
    from controlar_tpu.eval.sampler import sample_c2i_fid

    rng = jax.random.PRNGKey(0)
    gpt_cfg = GPTConfig(model_type="c2i", dim=32, n_layer=2, n_head=2,
                        cls_token_num=1, block_size=4, vocab_size=32,
                        num_classes=5)
    vq_cfg = VQConfig(codebook_size=32, codebook_embed_dim=8, z_channels=8, ch=8)
    ad_cfg = jvit.ViTConfig(hidden_size=384, n_layer=1, n_head=2, patch_size=14,
                            pos_grid=2, layerscale=True)
    pipe = ControlARPipeline(
        gpt_cfg=gpt_cfg, gpt_params=jgpt.init_gpt_params(rng, gpt_cfg),
        vq_cfg=vq_cfg, vq_params=jvq.init_vq_params(rng, vq_cfg),
        adapter_cfg=ad_cfg, adapter_params=jvit.init_vit_params(rng, ad_cfg),
    )
    out = sample_c2i_fid(pipe, 5, batch_size=2, num_classes=5,
                         cfg_scale=1.5, top_k=8, out_dir=str(tmp_path))
    assert out.shape == (5, 32, 32, 3)
    assert os.path.exists(tmp_path / "samples.npz")
    assert len(os.listdir(tmp_path / "images")) == 5


def test_c2i_code_dataset_aug_dir_mixing(tmp_path):
    """ten_crop_105 sibling trees are mixed in with p=0.5
    (ref dataset/imagenet.py:16-27,53-61)."""
    from controlar_tpu.data.t2i_control import C2ICodeDataset

    base = tmp_path / "ten_crop"
    aug = tmp_path / "ten_crop_105"
    n = 8
    for root, marker in [(base, 0), (aug, 1000)]:
        for sub in ["codes", "labels", "cond"]:
            os.makedirs(root / sub, exist_ok=True)
        for i in range(n):
            np.save(root / "codes" / f"{i}.npy",
                    np.full((1, 2, 16), marker + i, dtype=np.int64))
            np.save(root / "labels" / f"{i}.npy", np.array([marker + i]))
            np.save(root / "cond" / f"{i}.npy",
                    np.full((2, 4, 4), marker % 255, dtype=np.uint8))

    ds = C2ICodeDataset(str(base / "codes"), str(base / "labels"),
                        condition_imgs_dir=str(base / "cond"), seed=3)
    assert ds.aug_code_dir == str(aug / "codes")
    labels = [int(ds[i % n]["labels"]) for i in range(200)]
    frac_aug = np.mean([l >= 1000 for l in labels])
    assert 0.3 < frac_aug < 0.7, frac_aug
    # code/label/cond stay consistent per item (same tree)
    for i in range(50):
        item = ds[i % n]
        from_aug = item["labels"] >= 1000
        assert (item["tokens"][0] >= 1000) == from_aug
        assert (item["control_map"][0, 0] == (1000 % 255 if from_aug else 0)).all()

    # no aug sibling -> always base
    import shutil

    shutil.rmtree(aug)
    ds3 = C2ICodeDataset(str(base / "codes"), str(base / "labels"), seed=0)
    assert ds3.aug_code_dir is None
    assert all(int(ds3[i]["labels"]) < 1000 for i in range(n))
