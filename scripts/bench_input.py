"""Input-pipeline throughput: carpack (.car, native mmap reader) vs the
reference-style tiny-file tree (per-item .npy/.npz/.png reads).

Builds a synthetic extracted tree (N items at the given image size), packs
it, then measures items/sec through ShardedLoader for both paths (and the
pure-python carpack reader for reference). This quantifies what
csrc/carpack.cpp exists for: the reference's per-sample tiny-file input
(ref dataset/t2i_control.py:104-121) is metadata-bound.

Run: python scripts/bench_input.py [--n 512] [--image-size 256] [--batch 32]
"""
import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=3)
    args = ap.parse_args()

    import numpy as np
    from PIL import Image

    from controlar_tpu.data.carpack import (
        CarpackControlDataset, pack_control_dataset)
    from controlar_tpu.data.loader import ShardedLoader
    from controlar_tpu.data.t2i_control import (
        T2IControlCodeDataset, T2IControlConfig)

    root = tempfile.mkdtemp(prefix="bench_input_")
    try:
        img = args.image_size
        code_len = (img // 16) ** 2
        rng = np.random.default_rng(0)
        for sub in ("code", "caption_emb", "image"):
            os.makedirs(os.path.join(root, sub))
        for i in range(args.n):
            np.save(os.path.join(root, "code", f"{i}.npy"),
                    rng.integers(0, 16384, (code_len,)).astype(np.int64))
            np.savez(os.path.join(root, "caption_emb", f"{i}.npz"),
                     caption_emb=rng.standard_normal((1, 20, 2048))
                     .astype(np.float32),
                     prompt=np.asarray([f"p{i}"]))
            Image.fromarray(
                rng.integers(0, 255, (img, img, 3)).astype(np.uint8)
            ).save(os.path.join(root, "image", f"{i}.png"))

        ds_tree = T2IControlCodeDataset(T2IControlConfig(
            code_path=root, condition_type="canny", image_size=img))
        car = os.path.join(root, "packed.car")
        t0 = time.perf_counter()
        pack_control_dataset(ds_tree, car)
        t_pack = time.perf_counter() - t0
        size_mb = os.path.getsize(car) / 1e6
        print(f"packed {args.n} items ({size_mb:.0f} MB) in {t_pack:.1f} s")

        def pump(ds, tag):
            loader = ShardedLoader(ds, batch_size=args.batch, num_workers=4)
            # warm one epoch (page cache parity between candidates)
            for _ in loader:
                pass
            t0 = time.perf_counter()
            seen = 0
            for ep in range(args.epochs):
                loader.set_epoch(ep)
                for b in loader:
                    seen += len(b["tokens"])
            dt = time.perf_counter() - t0
            print(f"{tag}: {seen / dt:8.1f} items/s "
                  f"({seen} items in {dt:.2f} s)")
            return seen / dt

        r_tree = pump(ds_tree, "tree (tiny files)     ")
        ds_car = CarpackControlDataset(car)
        assert ds_car.native, "native carpack reader did not build"
        r_car = pump(ds_car, "carpack (native mmap)  ")
        ds_car_py = CarpackControlDataset(car, force_python=True)
        pump(ds_car_py, "carpack (python reader)")
        print(f"carpack native vs tree: {r_car / r_tree:.2f}x")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
