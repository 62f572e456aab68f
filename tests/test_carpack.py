"""carpack packed-dataset format: native C++ reader vs writer round trip,
Python-reader equivalence, tree packing."""
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
