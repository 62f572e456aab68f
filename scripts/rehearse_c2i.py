"""Full c2i pipeline dress rehearsal: one composed user journey, end to end.

Every CLI stage is tested in isolation elsewhere; this drives the COMPOSED
flow a user actually runs (ref workflow README.md:251-271) on synthetic
ImageNet-like data, on whatever backend is live (the real chip under the
session env), timing each stage:

  0. synthesize a class-subfolder image tree (structured images: class-keyed
     shapes on gradients — plenty of canny edges)
  1. train-vq           tokenizer from scratch (short run)
  2. extract --task c2i VQ codes + canny maps with the TRAINED tokenizer
  3. pack-data          tree -> one .car record file
  4. train-c2i          control fine-tune on the .car (native orbax ckpt)
  5. sample-fid         class-balanced generation FROM THE TRAINING RUN'S
                        checkpoint dir (native-ckpt loading path)
  6. eval-c2i           FID-like metrics vs the dataset (random-init
                        Inception in this zero-egress image: numbers are
                        relative, the sanity bar is split-vs-split ~ 0 and
                        gen-vs-real in its vicinity rather than blowing up)
  7. test-consistency   generate from stored canny maps, re-extract, F1

Writes docs/rehearsal_c2i.json. Run: python scripts/rehearse_c2i.py
[--workdir /tmp/rehearsal] [--classes 8] [--per-class 24] [--image-size 128]
[--vq-steps 240] [--gpt-steps 400]
"""
import argparse
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, ".")

import numpy as np
from PIL import Image


def synth_image(rng, cls: int, size: int) -> np.ndarray:
    """Structured synthetic image: class-keyed gradient + shapes."""
    y, x = np.mgrid[0:size, 0:size].astype(np.float32) / size
    base = np.stack([
        (cls * 37 % 255) / 255 * (0.4 + 0.6 * x),
        (cls * 83 % 255) / 255 * (0.4 + 0.6 * y),
        (cls * 151 % 255) / 255 * np.ones_like(x),
    ], axis=-1)
    img = (base * 160).astype(np.float32)
    # class-determined shape count/type, instance-random placement
    n_shapes = 2 + cls % 3
    for s in range(n_shapes):
        cx, cy = rng.uniform(0.2, 0.8, 2) * size
        r = rng.uniform(0.08, 0.22) * size
        color = np.array([(cls * 13 + s * 59) % 200 + 55,
                          (cls * 29 + s * 17) % 200 + 55,
                          (cls * 7 + s * 101) % 200 + 55], np.float32)
        if (cls + s) % 2 == 0:  # disc
            m = ((np.mgrid[0:size, 0:size][0] - cy) ** 2
                 + (np.mgrid[0:size, 0:size][1] - cx) ** 2) < r ** 2
        else:  # square
            m = (np.abs(np.mgrid[0:size, 0:size][0] - cy) < r) & \
                (np.abs(np.mgrid[0:size, 0:size][1] - cx) < r)
        img[m] = color
    noise = rng.normal(0, 6, img.shape)
    return np.clip(img + noise, 0, 255).astype(np.uint8)


def run(cmd, log_path):
    t0 = time.perf_counter()
    with open(log_path, "w") as f:
        p = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT)
    dt = time.perf_counter() - t0
    if p.returncode != 0:
        print(open(log_path).read()[-4000:])
        raise SystemExit(f"stage failed ({' '.join(cmd[:6])}...): "
                         f"exit {p.returncode}, log {log_path}")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/rehearsal")
    ap.add_argument("--classes", type=int, default=8)
    ap.add_argument("--per-class", type=int, default=24)
    ap.add_argument("--image-size", type=int, default=128)
    ap.add_argument("--vq-steps", type=int, default=240)
    ap.add_argument("--gpt-steps", type=int, default=400)
    ap.add_argument("--gpt-model", default="GPT-B")
    ap.add_argument("--fid-images", type=int, default=64)
    ap.add_argument("--json-out", default="docs/rehearsal_c2i.json")
    args = ap.parse_args()

    wd = args.workdir
    if os.path.isdir(wd):
        shutil.rmtree(wd)
    os.makedirs(wd)
    cli = [sys.executable, "-m", "controlar_tpu.cli"]
    report = {"config": vars(args), "stages": {}}

    # ---- 0. synthesize dataset (class tree + flat copy for train-vq)
    t0 = time.perf_counter()
    rng = np.random.default_rng(0)
    tree, flat = os.path.join(wd, "images"), os.path.join(wd, "flat")
    os.makedirs(flat)
    refs = []
    for c in range(args.classes):
        cdir = os.path.join(tree, f"class{c:03d}")
        os.makedirs(cdir)
        for i in range(args.per_class):
            img = synth_image(rng, c, args.image_size)
            Image.fromarray(img).save(os.path.join(cdir, f"{i:03d}.png"))
            Image.fromarray(img).save(
                os.path.join(flat, f"c{c:03d}_{i:03d}.png"))
            refs.append(img)
    refs = np.stack(refs)
    half = len(refs) // 2
    np.savez(os.path.join(wd, "ref.npz"), arr_0=refs)
    np.savez(os.path.join(wd, "ref_a.npz"), arr_0=refs[:half])
    np.savez(os.path.join(wd, "ref_b.npz"), arr_0=refs[half:])
    report["stages"]["synth"] = {"s": time.perf_counter() - t0,
                                 "images": int(len(refs))}
    print(f"[0] synth: {len(refs)} images", flush=True)

    # ---- 1. train-vq
    vq_dir = os.path.join(wd, "vq_run")
    dt = run(cli + ["train-vq", "--images", flat,
                    "--image-size", str(args.image_size),
                    "--batch-size", "8", "--max-steps", str(args.vq_steps),
                    "--disc-start", str(args.vq_steps * 10),  # recon-only
                    "--ckpt-every", str(args.vq_steps),
                    "--eval-after", "8",
                    "--results-dir", vq_dir],
             os.path.join(wd, "train_vq.log"))
    vq_ckpt = os.path.join(vq_dir, "vq_checkpoints")
    report["stages"]["train_vq"] = {"s": dt, "steps": args.vq_steps}
    print(f"[1] train-vq: {dt:.0f}s", flush=True)

    # ---- 2. extract c2i tree with the trained tokenizer
    ex_dir = os.path.join(wd, "extracted")
    dt = run(cli + ["extract", "--task", "c2i", "--images", tree,
                    "--vq-ckpt", vq_ckpt,
                    "--image-size", str(args.image_size),
                    "--output-dir", ex_dir, "--dataset", "synth",
                    "--conditions", "canny"],
             os.path.join(wd, "extract.log"))
    prefix = os.path.join(ex_dir, f"synth{args.image_size}")
    report["stages"]["extract"] = {"s": dt}
    print(f"[2] extract: {dt:.0f}s", flush=True)

    # ---- 3. pack-data -> .car
    car = os.path.join(wd, "train.car")
    dt = run(cli + ["pack-data", "--format", "c2i",
                    "--code-path", f"{prefix}_codes",
                    "--label-dir", f"{prefix}_labels",
                    "--condition-dir", f"{prefix}_canny_imagesnpy",
                    "--image-size", str(args.image_size), "--out", car],
             os.path.join(wd, "pack.log"))
    report["stages"]["pack_data"] = {"s": dt,
                                     "car_mb": os.path.getsize(car) / 2**20}
    print(f"[3] pack-data: {dt:.0f}s", flush=True)

    # ---- 4. train-c2i on the .car
    run_dir = os.path.join(wd, "gpt_run")
    dt = run(cli + ["train-c2i", "--gpt-model", args.gpt_model,
                    "--image-size", str(args.image_size),
                    "--condition-type", "canny", "--code-dir", car,
                    "--global-batch-size", "16", "--epochs", "10000",
                    "--max-steps", str(args.gpt_steps),
                    "--opt-state-dtype", "bfloat16",
                    "--results-dir", run_dir],
             os.path.join(wd, "train_c2i.log"))
    report["stages"]["train_c2i"] = {"s": dt, "steps": args.gpt_steps}
    # last logged loss
    for line in reversed(open(os.path.join(wd, "train_c2i.log")).readlines()):
        if "loss" in line:
            report["stages"]["train_c2i"]["last_log"] = line.strip()
            break
    print(f"[4] train-c2i: {dt:.0f}s", flush=True)

    # ---- 5. sample-fid from the training run's native checkpoint dir
    samp_dir = os.path.join(wd, "samples")
    dt = run(cli + ["sample-fid", "--gpt-model", args.gpt_model,
                    "--gpt-ckpt", run_dir, "--vq-ckpt", vq_ckpt,
                    "--image-size", str(args.image_size),
                    "--condition-type", "canny",
                    "--num-images", str(args.fid_images),
                    "--batch-size", "16", "--cfg-scale", "2.0",
                    "--output-dir", samp_dir],
             os.path.join(wd, "sample.log"))
    report["stages"]["sample_fid"] = {
        "s": dt, "img_per_s": args.fid_images / dt}
    print(f"[5] sample-fid: {dt:.0f}s", flush=True)

    # ---- 6. eval-c2i: gen-vs-real plus the split-vs-split floor
    def fid_of(a, b, log):
        run(cli + ["eval-c2i", a, b], log)
        for line in reversed(open(log).readlines()):
            line = line.strip()
            if line.startswith("{") and "fid" in line:
                return json.loads(line)
        raise SystemExit(f"no eval-c2i json in {log}")

    t0 = time.perf_counter()
    floor = fid_of(os.path.join(wd, "ref_a.npz"), os.path.join(wd, "ref_b.npz"),
                   os.path.join(wd, "eval_floor.log"))
    gen = fid_of(os.path.join(wd, "ref.npz"),
                 os.path.join(samp_dir, "samples.npz"),
                 os.path.join(wd, "eval_gen.log"))
    report["stages"]["eval_c2i"] = {
        "s": time.perf_counter() - t0,
        "note": "random-init Inception (no ckpt in this image): relative only",
        "fid_split_floor": floor.get("fid"),
        "fid_gen_vs_real": gen.get("fid"),
        "is_gen": gen.get("inception_score"),
    }
    print(f"[6] eval-c2i: floor {floor.get('fid'):.3f} "
          f"gen {gen.get('fid'):.3f}", flush=True)

    # ---- 7. test-consistency (canny F1 against stored maps)
    dt = run(cli + ["test-consistency", "--gpt-model", args.gpt_model,
                    "--gpt-ckpt", run_dir, "--vq-ckpt", vq_ckpt,
                    "--image-size", str(args.image_size),
                    "--condition-type", "canny",
                    "--condition-dir", f"{prefix}_canny_images",
                    "--batch-size", "8", "--max-images", "16",
                    "--cfg-scale", "2.0",
                    "--output-dir", os.path.join(wd, "consistency")],
             os.path.join(wd, "consistency.log"))
    f1 = None
    for line in reversed(open(os.path.join(wd, "consistency.log")).readlines()):
        line = line.strip()
        if line.startswith("{"):
            f1 = json.loads(line)
            break
    report["stages"]["test_consistency"] = {"s": dt, **(f1 or {})}
    print(f"[7] test-consistency: {dt:.0f}s {f1}", flush=True)

    report["total_s"] = sum(v["s"] for v in report["stages"].values())
    os.makedirs(os.path.dirname(args.json_out) or ".", exist_ok=True)
    with open(args.json_out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"total_s": report["total_s"],
                      "out": args.json_out}))


if __name__ == "__main__":
    main()
