"""Unified CLI: `python -m controlar_tpu.cli <command>`.

One entry point replaces the reference's 30+ argparse scripts
(ref scripts/*.sh wrapping autoregressive/{sample,train,test}/*.py).
Commands:
    sample-c2i        class-conditional generation (+ control images, --quant,
                      class names)
    sample-t2i        text-conditional generation (T5 assets; MR via
                      --image-height/--image-width)
    train-c2i         class-conditional control training over ImageNet codes
    train-t2i         control fine-tuning over an extracted code tree
    train-vq          VQGAN tokenizer training (+ rFID smoke gate)
    serve             continuous-batching engine (--quant for int8)
    extract           build code trees from image folders
    verify-zoo        released-checkpoint greedy-token parity gate
    test-consistency  generate -> re-extract -> F1/SSIM/RMSE loop
    eval-c2i          FID / sFID / IS / Precision / Recall over npz batches
    eval-t2i          CLIP score over generated images + prompts
    eval-miou         segmentation mIoU via a local reward model
    eval-vq           VQ round-trip reconstruction metrics
    sample-fid        class-balanced FID dump (images + samples.npz)
    bench             the standard benchmark (same as bench.py)
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _add_model_args(p: argparse.ArgumentParser):
    p.add_argument("--gpt-model", default="GPT-XL")
    p.add_argument("--gpt-ckpt", default=None, help=".pt/.safetensors GPT weights")
    p.add_argument("--vq-ckpt", default=None, help="VQ tokenizer weights")
    p.add_argument("--adapter-ckpt", default=None, help="DINOv2/ViT weights dir or file")
    p.add_argument("--midas-ckpt", default=None,
                   help="MiDaS dpt_hybrid-midas-*.pt for depth conditioning")
    p.add_argument("--image-size", type=int, default=512)
    p.add_argument("--downsample-size", type=int, default=16)
    p.add_argument("--condition-type", default="canny",
                   choices=["canny", "hed", "lineart", "depth", "seg", "none"])
    p.add_argument("--adapter-size", default="small", choices=["small", "base"])
    p.add_argument("--cfg-scale", type=float, default=4.0)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top-k", type=int, default=2000)
    p.add_argument("--top-p", type=float, default=1.0)
    p.add_argument("--control-strength", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output-dir", default="samples")
    p.add_argument("--quant", action="store_true",
                   help="int8 weight streaming (+ int8 KV cache where applicable)")
    p.add_argument("--spec-draft", default=None,
                   choices=["int8", "w4", "model", "model-int8"],
                   help="speculative decode (Leviathan accept/reject; "
                        "samples from the same warped target distribution "
                        "as vanilla decoding). int8/w4: quantized "
                        "self-draft; model[-int8]: the cross-size draft "
                        "from --draft-gpt-model/--draft-gpt-ckpt")
    p.add_argument("--draft-gpt-model", default=None,
                   help="smaller family member used as the speculative "
                        "draft (e.g. GPT-B drafting GPT-3B)")
    p.add_argument("--draft-gpt-ckpt", default=None,
                   help="weights for --draft-gpt-model")


def _build_pipeline(args, model_type: str):
    import jax
    import jax.numpy as jnp

    from controlar_tpu.config import gpt_config, vq_config
    from controlar_tpu.models import gpt as gpt_model, vq as vq_model, vit as vit_model
    from controlar_tpu.pipeline import ControlARPipeline
    from controlar_tpu import checkpoint as ckpt_lib

    # arbitrary-resolution (MR): an explicit HxW token grid with exact
    # rectangular RoPE (ref sample_t2i_MR.py; SURVEY §5) — the model weights
    # are resolution-independent
    ih = getattr(args, "image_height", None) or args.image_size
    iw = getattr(args, "image_width", None) or args.image_size
    gh, gw = ih // args.downsample_size, iw // args.downsample_size
    cls_token_num = 1 if model_type == "c2i" else 120
    gcfg = gpt_config(
        args.gpt_model, model_type=model_type, block_size=gh * gw,
        cls_token_num=cls_token_num, condition_type=args.condition_type,
        adapter_size=args.adapter_size,
        **({"grid_hw": (gh, gw)} if gh != gw else {}),
    )
    vcfg = vq_config("VQ-16")
    rng = jax.random.PRNGKey(args.seed)

    native_adapter = None
    if args.gpt_ckpt:
        gpt_params = jax.tree.map(
            jnp.asarray, ckpt_lib.load_gpt_checkpoint(args.gpt_ckpt, gcfg)
        )
        # a native training checkpoint carries the fine-tuned adapter too;
        # use it unless --adapter-ckpt overrides
        if ckpt_lib._is_native(args.gpt_ckpt) and not args.adapter_ckpt:
            tree = ckpt_lib.load_native_checkpoint(args.gpt_ckpt)
            params = (tree.get("ema_params") or tree.get("params") or tree
                      if isinstance(tree, dict) else tree)
            if isinstance(params, dict) and params.get("adapter") is not None:
                native_adapter = jax.tree.map(jnp.asarray, params["adapter"])
    else:
        print("[warn] no --gpt-ckpt: using random GPT weights", file=sys.stderr)
        gpt_params = gpt_model.init_gpt_params(rng, gcfg, dtype=jnp.bfloat16)
    if getattr(args, "quant", False):
        from controlar_tpu import quant

        gpt_params = quant.quantize_gpt_params(gpt_params)

    if args.vq_ckpt:
        vq_params = jax.tree.map(
            jnp.asarray, ckpt_lib.load_vq_checkpoint(args.vq_ckpt, vcfg)
        )
    else:
        print("[warn] no --vq-ckpt: using random VQ weights", file=sys.stderr)
        vq_params = vq_model.init_vq_params(rng, vcfg)

    acfg = (vit_model.DINOV2_SMALL if args.adapter_size == "small"
            else vit_model.DINOV2_BASE)
    if native_adapter is not None:
        adapter_params = native_adapter
    elif args.adapter_ckpt:
        from controlar_tpu.convert.torch_vit import convert_hf_vit_state_dict

        sd = ckpt_lib.load_torch_file(args.adapter_ckpt)
        adapter_params = jax.tree.map(
            jnp.asarray, convert_hf_vit_state_dict(sd, acfg, "dinov2")
        )
    else:
        print("[warn] no --adapter-ckpt: using random adapter weights", file=sys.stderr)
        adapter_params = vit_model.init_vit_params(rng, acfg)

    midas_params = None
    if getattr(args, "midas_ckpt", None):
        from controlar_tpu.convert.torch_midas import load_midas_checkpoint

        midas_params = jax.tree.map(
            jnp.asarray, load_midas_checkpoint(args.midas_ckpt)
        )

    draft_cfg = draft_params = None
    if getattr(args, "draft_gpt_model", None):
        draft_cfg = gpt_config(
            args.draft_gpt_model, model_type=model_type,
            block_size=gh * gw, cls_token_num=cls_token_num,
            condition_type=args.condition_type,
            adapter_size=args.adapter_size,
            **({"grid_hw": (gh, gw)} if gh != gw else {}),
        )
        if getattr(args, "draft_gpt_ckpt", None):
            draft_params = jax.tree.map(
                jnp.asarray,
                ckpt_lib.load_gpt_checkpoint(args.draft_gpt_ckpt, draft_cfg))
        else:
            print("[warn] no --draft-gpt-ckpt: random draft weights",
                  file=sys.stderr)
            draft_params = gpt_model.init_gpt_params(rng, draft_cfg,
                                                     dtype=jnp.bfloat16)

    return ControlARPipeline(
        gpt_cfg=gcfg, gpt_params=gpt_params,
        vq_cfg=vcfg, vq_params=vq_params,
        adapter_cfg=acfg, adapter_params=adapter_params,
        condition_type=args.condition_type,
        midas_params=midas_params,
        draft_gpt_cfg=draft_cfg, draft_gpt_params=draft_params,
    )


def cmd_sample_c2i(args):
    from PIL import Image

    pipe = _build_pipeline(args, "c2i")
    from controlar_tpu.data.imagenet_labels import lookup_class

    labels = np.array([lookup_class(x) for x in args.class_labels.split(",")])
    cond = None
    if args.condition_images:
        imgs = [
            np.asarray(Image.open(p).convert("RGB").resize(
                (args.image_size, args.image_size)))
            for p in args.condition_images.split(",")
        ]
        cond = np.stack(imgs).astype(np.uint8)
        if len(imgs) == 1 and len(labels) > 1:
            cond = np.repeat(cond, len(labels), axis=0)
    import jax.numpy as jnp

    out = pipe.generate(
        labels=labels, condition_images=cond, cfg_scale=args.cfg_scale,
        temperature=args.temperature, top_k=args.top_k, top_p=args.top_p,
        control_strength=args.control_strength, seed=args.seed,
        spec_draft=getattr(args, 'spec_draft', None),
        cache_dtype=jnp.int8 if args.quant else None,
    )
    os.makedirs(args.output_dir, exist_ok=True)
    for i, img in enumerate(out):
        Image.fromarray(img).save(os.path.join(args.output_dir, f"sample_{i}.png"))
    print(f"saved {len(out)} images to {args.output_dir}")


def cmd_train_t2i(args):
    from controlar_tpu.parallel import distributed

    # multi-host rendezvous BEFORE any jax device use (TPU pods auto-detect;
    # explicit flags cover DCN/loopback; no-op single host). Replaces the
    # reference's env://-or-SLURM init (ref utils/distributed.py:20-47).
    distributed.init(args.dist_coordinator, args.dist_num_processes,
                     args.dist_process_id)

    from controlar_tpu.data.t2i_control import T2IControlCodeDataset, T2IControlConfig
    from controlar_tpu.data.loader import ShardedLoader
    from controlar_tpu.train.trainer import Trainer, TrainerConfig
    import jax

    tcfg = TrainerConfig(
        gpt_model=args.gpt_model, model_type="t2i", image_size=args.image_size,
        condition_type=args.condition_type, adapter_size=args.adapter_size,
        lr=args.lr, global_batch_size=args.global_batch_size, epochs=args.epochs,
        results_dir=args.results_dir, gpt_ckpt=args.gpt_ckpt,
        resume_dir=args.resume_dir, ema=args.ema,
        remat_policy=args.remat_policy, opt_state_dtype=args.opt_state_dtype,
    )
    if args.code_path.endswith(".car"):
        from controlar_tpu.data.carpack import CarpackControlDataset

        ds = CarpackControlDataset(args.code_path)
    else:
        ds = T2IControlCodeDataset(T2IControlConfig(
            code_path=args.code_path, condition_type=args.condition_type,
            image_size=args.image_size,
        ))
    loader = ShardedLoader(
        ds, batch_size=args.global_batch_size // jax.process_count(),
        process_index=jax.process_index(), process_count=jax.process_count(),
    )
    Trainer(tcfg).fit(loader, max_steps=args.max_steps)


def cmd_train_c2i(args):
    """Class-conditional control training over ImageNet code trees
    (ref autoregressive/train/train_c2i*.py; the c2i branch of the one
    unified trainer)."""
    from controlar_tpu.parallel import distributed

    distributed.init(args.dist_coordinator, args.dist_num_processes,
                     args.dist_process_id)

    from controlar_tpu.data.t2i_control import C2ICodeDataset
    from controlar_tpu.data.loader import ShardedLoader
    from controlar_tpu.train.trainer import Trainer, TrainerConfig
    import jax

    tcfg = TrainerConfig(
        gpt_model=args.gpt_model, model_type="c2i", image_size=args.image_size,
        condition_type=args.condition_type, adapter_size=args.adapter_size,
        cls_token_num=1, lr=args.lr, global_batch_size=args.global_batch_size,
        epochs=args.epochs, results_dir=args.results_dir,
        gpt_ckpt=args.gpt_ckpt, resume_dir=args.resume_dir, ema=args.ema,
        remat_policy=args.remat_policy, opt_state_dtype=args.opt_state_dtype,
    )
    if args.code_dir.endswith(".car"):
        from controlar_tpu.data.carpack import CarpackControlDataset

        ds = CarpackControlDataset(args.code_dir)
    else:
        if not args.label_dir:
            raise SystemExit("--label-dir is required for tree input")
        ds = C2ICodeDataset(
            code_dir=args.code_dir, label_dir=args.label_dir,
            condition_imgs_dir=args.condition_dir, flip_aug=not args.no_flip_aug,
        )
    loader = ShardedLoader(
        ds, batch_size=args.global_batch_size // jax.process_count(),
        process_index=jax.process_index(), process_count=jax.process_count(),
    )
    Trainer(tcfg).fit(loader, max_steps=args.max_steps)


def cmd_serve_warmup(args):
    """Deploy-time cache priming: compile every serving program (admission
    buckets 1/2/4/8 and all quantum lengths) into the persistent compilation
    cache, so production processes start at disk-load speed instead of
    paying the one-time XLA compiles (cold-to-first-image measured 404 s
    with an empty cache vs 95 s primed on the remote-compile tunnel)."""
    import jax
    import jax.numpy as jnp

    from controlar_tpu.config import gpt_config
    from controlar_tpu.models import gpt as gpt_model
    from controlar_tpu.serve.engine import Request, ServeConfig, ServeEngine
    from controlar_tpu import checkpoint as ckpt_lib, quant

    cfg = gpt_config(args.gpt_model, model_type=args.model_type,
                     cls_token_num=1 if args.model_type == "c2i" else 120,
                     block_size=(args.image_size // args.downsample_size) ** 2,
                     vocab_size=16384, num_classes=1000)
    if args.gpt_ckpt:
        params = jax.tree.map(
            lambda a: jnp.asarray(a, jnp.bfloat16),
            ckpt_lib.load_gpt_checkpoint(args.gpt_ckpt, cfg))
    else:
        params = gpt_model.init_gpt_params(jax.random.PRNGKey(0), cfg,
                                           dtype=jnp.bfloat16)
    if args.quant:
        params = quant.quantize_gpt_params(params)
    buckets = (tuple(int(x) for x in args.quantum_buckets.split(","))
               if args.quantum_buckets else None)
    scfg = ServeConfig(max_slots=args.max_slots, quantum=args.quantum,
                       top_k=args.top_k, quantum_buckets=buckets,
                       cache_dtype=jnp.int8 if args.quant else jnp.bfloat16,
                       compilation_cache_dir=args.cache_dir)
    eng = ServeEngine(params, cfg, scfg)
    import numpy as np

    def mk(i):
        if args.model_type == "c2i":
            return Request(request_id=i, label=0, cfg_scale=4.0, seed=0)
        rng = np.random.default_rng(0)
        cap = rng.standard_normal((120, cfg.caption_dim)).astype(np.float32)
        return Request(request_id=i, caption_emb=cap,
                       emb_mask=np.ones((120,), np.int64), cfg_scale=7.5)

    for j, nw in enumerate((args.max_slots, 4, 2, 1)):
        eng.run([mk(100 * (j + 1) + i) for i in range(min(nw, args.max_slots))])
    print(f"warmed serving programs into {args.cache_dir}")


def cmd_quant_report(args):
    """Quantization accuracy gate (eval/quant_report.py): bf16 vs int8/W4
    teacher-forced token agreement, logit divergence, free-running prefix
    survival. Runs on --gpt-ckpt weights, or random weights for the
    systems-level bound."""
    import jax
    import jax.numpy as jnp

    from controlar_tpu.config import gpt_config
    from controlar_tpu.models import gpt as gpt_model
    from controlar_tpu import checkpoint as ckpt_lib
    from controlar_tpu.eval.quant_report import (
        format_report, measure_quant_agreement)

    cfg = gpt_config(args.gpt_model, model_type="c2i", cls_token_num=1,
                     block_size=(args.image_size // args.downsample_size) ** 2,
                     vocab_size=16384, num_classes=1000)
    if args.gpt_ckpt:
        params = jax.tree.map(
            lambda a: jnp.asarray(a, jnp.bfloat16),
            ckpt_lib.load_gpt_checkpoint(args.gpt_ckpt, cfg))
    else:
        print("[warn] no --gpt-ckpt: random weights (systems-level bound)",
              file=sys.stderr)
        params = gpt_model.init_gpt_params(
            jax.random.PRNGKey(args.seed), cfg, dtype=jnp.bfloat16)
    report = measure_quant_agreement(
        params, cfg, modes=tuple(args.modes.split(",")),
        max_new_tokens=args.max_new_tokens, cfg_scale=args.cfg_scale)
    print(format_report(report))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(report, f, indent=1)


def cmd_pack_data(args):
    """Pack an extracted control tree into one .car file (csrc/carpack.cpp
    reader) for the production input pipeline: replaces per-sample tiny-file
    reads (ref dataset/t2i_control.py:104-121) with one mmap'd record file.
    `train-t2i --code-path x.car` / `train-c2i --code-dir x.car` consume it."""
    from controlar_tpu.data.carpack import pack_control_dataset

    if args.format == "t2i":
        from controlar_tpu.data.t2i_control import (
            T2IControlCodeDataset, T2IControlConfig)

        ds = T2IControlCodeDataset(T2IControlConfig(
            code_path=args.code_path, condition_type=args.condition_type,
            image_size=args.image_size))
    else:
        from controlar_tpu.data.t2i_control import C2ICodeDataset

        ds = C2ICodeDataset(code_dir=args.code_path, label_dir=args.label_dir,
                            condition_imgs_dir=args.condition_dir)
    n = pack_control_dataset(ds, args.out, limit=args.limit)
    print(f"packed {n} records -> {args.out}")


def cmd_sample_t2i(args):
    """Text-conditional sampling (ref sample_t2i.py:34-183): prompt -> T5
    features -> control extraction -> CFG generate -> VQ decode."""
    from PIL import Image
    import numpy as np

    from controlar_tpu.text.embedder import T5Embedder

    pipe = _build_pipeline(args, "t2i")
    if not args.t5_path:
        raise SystemExit("--t5-path (local flan-t5-xl checkout) is required")
    t5 = T5Embedder.from_pretrained(args.t5_path)
    prompts = [args.prompt or "a high-quality image"] * args.num_images
    caption_emb, emb_masks = t5.get_text_embeddings(prompts)

    cond = None
    if args.condition_image:
        ih = args.image_height or args.image_size
        iw = args.image_width or args.image_size
        img = Image.open(args.condition_image).convert("RGB").resize((iw, ih))
        cond = np.repeat(np.asarray(img, np.uint8)[None], args.num_images, 0)

    import jax.numpy as jnp

    out = pipe.generate(
        caption_emb=caption_emb, emb_masks=emb_masks, condition_images=cond,
        cfg_scale=args.cfg_scale, temperature=args.temperature,
        top_k=args.top_k, top_p=args.top_p,
        control_strength=args.control_strength, seed=args.seed,
        spec_draft=getattr(args, 'spec_draft', None),
        cache_dtype=jnp.int8 if args.quant else None,
    )
    os.makedirs(args.output_dir, exist_ok=True)
    for i, img in enumerate(out):
        Image.fromarray(img).save(os.path.join(args.output_dir, f"t2i_{i}.png"))
    print(f"saved {len(out)} images to {args.output_dir}")


def cmd_train_vq(args):
    """VQGAN tokenizer training over an image folder (ref vq_train.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from controlar_tpu.config import vq_config
    from controlar_tpu.models import vq as vq_model
    from controlar_tpu.models.discriminators import (
        init_patchgan_params, init_stylegan_disc_params)
    from controlar_tpu.models.lpips import init_lpips_params
    from controlar_tpu.train.optimizer import make_optimizer
    from controlar_tpu.train.vq_step import init_vq_train_state, make_vq_train_step
    from controlar_tpu.data.augmentation import center_crop_arr
    from controlar_tpu import checkpoint as ckpt_lib

    vcfg = vq_config(args.vq_model)
    rng = jax.random.PRNGKey(args.seed)
    vq_params = vq_model.init_vq_params(rng, vcfg)
    if args.disc_type == "stylegan":
        disc_params = init_stylegan_disc_params(
            jax.random.fold_in(rng, 1), image_size=args.image_size)
    else:
        disc_params = init_patchgan_params(jax.random.fold_in(rng, 1))
    if args.lpips_vgg and args.lpips_lin:
        from controlar_tpu.convert.torch_lpips import convert_lpips_state_dicts

        lp = jax.tree.map(jnp.asarray, convert_lpips_state_dicts(
            ckpt_lib.load_torch_file(args.lpips_vgg),
            ckpt_lib.load_torch_file(args.lpips_lin),
        ))
    else:
        print("[warn] random LPIPS weights (pass --lpips-vgg/--lpips-lin)",
              file=sys.stderr)
        lp = init_lpips_params(rng)
    tx_g = make_optimizer(lr=args.lr, beta1=0.9, beta2=0.95)
    tx_d = make_optimizer(lr=args.lr, beta1=0.9, beta2=0.95)
    state = init_vq_train_state(vq_params, disc_params, tx_g, tx_d,
                                use_ema=args.ema)
    step = jax.jit(make_vq_train_step(
        vcfg, tx_g, tx_d, lp, disc_start=args.disc_start,
        ema_decay=0.9999 if args.ema else None,
        disc_type=args.disc_type,
        disc_adaptive_weight=args.disc_adaptive_weight,
        disc_loss_type=args.disc_loss,
    ))

    files = [f for f in sorted(os.listdir(args.images))
             if f.lower().endswith((".png", ".jpg", ".jpeg"))]
    rng_np = np.random.default_rng(args.seed)
    for it in range(args.max_steps):
        idx = rng_np.integers(0, len(files), args.batch_size)
        batch = np.stack([
            np.asarray(center_crop_arr(
                Image.open(os.path.join(args.images, files[i])).convert("RGB"),
                args.image_size,
            ), np.float32) / 127.5 - 1.0
            for i in idx
        ])
        state, m = step(state, jnp.asarray(batch))
        if it % args.log_every == 0:
            print(f"step={it} " + " ".join(
                f"{k}={float(v):.4f}" for k, v in m.items()))
        if (it + 1) % args.ckpt_every == 0:
            path = ckpt_lib.save_train_state(
                os.path.join(args.results_dir, "vq_checkpoints"), state, step=it + 1
            )
            print(f"saved {path}")

    # rFID smoke gate (VERDICT r1 item 7): round-trip reconstruction metrics
    # on training images; samples.npz feeds `eval-c2i` for the full rFID when
    # an Inception checkpoint is available
    if args.eval_after > 0:
        from controlar_tpu.eval.reconstruction import reconstruction_eval

        def eval_batches():
            for i in range(0, min(args.eval_after, len(files)), args.batch_size):
                chunk = files[i : i + args.batch_size]
                yield np.stack([
                    np.asarray(center_crop_arr(
                        Image.open(os.path.join(args.images, f)).convert("RGB"),
                        args.image_size,
                    ), np.uint8)
                    for f in chunk
                ])

        out = reconstruction_eval(
            state.vq_params, vcfg, eval_batches(),
            out_dir=os.path.join(args.results_dir, "recon_eval"),
        )
        print("reconstruction gate: " + json.dumps(out))


def cmd_serve(args):
    """Offline batch serving through the continuous-batching engine
    (the reference's serve/sample_c2i.py equivalent)."""
    import jax.numpy as jnp
    from PIL import Image

    from controlar_tpu.serve.engine import Request, ServeConfig, ServeEngine
    from controlar_tpu.models import vq as vq_model

    pipe = _build_pipeline(args, "c2i")  # --quant already quantized weights
    gpt_params = pipe.gpt_params
    cache_dtype = jnp.int8 if args.quant else jnp.bfloat16
    eng = ServeEngine(
        gpt_params, pipe.gpt_cfg,
        ServeConfig(max_slots=args.max_slots, quantum=args.quantum,
                    temperature=args.temperature, top_k=args.top_k,
                    top_p=args.top_p, cache_dtype=cache_dtype,
                    compilation_cache_dir=args.compile_cache),
    )
    from controlar_tpu.data.imagenet_labels import lookup_class

    labels = [lookup_class(x) for x in args.class_labels.split(",")]
    reqs = [Request(request_id=i, label=l, cfg_scale=args.cfg_scale, seed=args.seed + i)
            for i, l in enumerate(labels)]
    import time

    t0 = time.perf_counter()
    done = eng.run(reqs)
    dt = time.perf_counter() - t0
    print(f"{len(done)} requests in {dt:.2f}s = {len(done)/dt:.2f} img/s")
    os.makedirs(args.output_dir, exist_ok=True)
    gh, gw = pipe.gpt_cfg.grid
    for r in done:
        img = vq_model.decode_code(
            pipe.vq_params, pipe.vq_cfg, jnp.asarray(r.tokens).reshape(1, gh, gw)
        )
        from controlar_tpu.pipeline import to_uint8_image

        Image.fromarray(to_uint8_image(img)[0]).save(
            os.path.join(args.output_dir, f"serve_{r.request_id}.png")
        )


def cmd_eval_vq(args):
    """VQ round-trip reconstruction metrics over a folder of images."""
    from PIL import Image
    import jax, jax.numpy as jnp

    from controlar_tpu.config import vq_config
    from controlar_tpu.models import vq as vq_model
    from controlar_tpu import checkpoint as ckpt_lib
    from controlar_tpu.eval.reconstruction import reconstruction_eval
    from controlar_tpu.data.augmentation import center_crop_arr

    vcfg = vq_config("VQ-16")
    if args.vq_ckpt:
        params = jax.tree.map(jnp.asarray, ckpt_lib.load_vq_checkpoint(args.vq_ckpt, vcfg))
    else:
        params = vq_model.init_vq_params(jax.random.PRNGKey(0), vcfg)

    files = sorted(
        f for f in os.listdir(args.images) if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )

    def batches():
        batch = []
        for f in files:
            img = center_crop_arr(
                Image.open(os.path.join(args.images, f)).convert("RGB"),
                args.image_size,
            )
            batch.append(np.asarray(img, np.uint8))
            if len(batch) == args.batch_size:
                yield np.stack(batch)
                batch = []
        if batch:
            yield np.stack(batch)

    out = reconstruction_eval(params, vcfg, batches(), out_dir=args.output_dir)
    print(json.dumps(out))


def cmd_verify_zoo(args):
    """Released-checkpoint parity gate (BASELINE.md bit-for-bit claim):
    convert each checkpoint, run greedy generation through both the imported
    torch reference and this repo, report PASS/FAIL on exact token equality."""
    from controlar_tpu import verify_zoo

    results = []
    if args.self_test:
        for mt in ("c2i", "t2i"):
            results.append(verify_zoo.self_test(model_type=mt))
    if args.zoo_dir:
        results.extend(verify_zoo.verify_zoo_dir(
            args.zoo_dir, max_new_tokens=args.max_new_tokens or 64))
    for ck in args.checkpoints:
        results.append(verify_zoo.verify_checkpoint(
            ck, args.size, model_type=args.model_type,
            adapter_size=args.adapter_size, block_size=args.block_size,
            max_new_tokens=args.max_new_tokens, cfg_scale=args.cfg_scale,
            quant_report=args.quant_report,
        ))
    ok = True
    for r in results:
        print(r.line())
        ok &= r.passed
    if not ok:
        sys.exit(1)


def cmd_eval_miou(args):
    """Segmentation-consistency mIoU between generated images and ground-
    truth label maps (ref evaluations/ade20k_mIoU.py / cocostuff_mIoU.py),
    scored by a local transformers reward model (Mask2Former / SegFormer)."""
    from PIL import Image

    from controlar_tpu.eval.miou import miou_eval
    from controlar_tpu.eval.segmenter import make_segmenter

    seg = make_segmenter(args.segmenter, device=args.device,
                         label_offset=args.label_offset)
    img_fns = sorted(f for f in os.listdir(args.images) if f.endswith(".png"))

    def pairs():
        for i in range(0, len(img_fns), args.batch_size):
            chunk = img_fns[i : i + args.batch_size]
            imgs = np.stack([
                np.asarray(Image.open(os.path.join(args.images, f)).convert("RGB"))
                for f in chunk
            ])
            anns = np.stack([
                np.asarray(Image.open(os.path.join(args.annotations, f)))
                for f in chunk
            ])
            yield imgs, anns

    score = miou_eval(pairs=pairs(), segmenter=seg,
                      num_classes=args.num_classes,
                      ignore_index=args.ignore_index)
    print(json.dumps({"miou": round(score, 5), "images": len(img_fns)}))


def cmd_sample_fid(args):
    """Class-balanced FID sample dump (ref sample_c2i_ddp.py + create_npz.py):
    generates N images and writes images/*.png + samples.npz — the input of
    `eval-c2i`."""
    from controlar_tpu.eval.sampler import sample_c2i_fid

    pipe = _build_pipeline(args, "c2i")
    shard = sample_c2i_fid(
        pipe, args.num_images, batch_size=args.batch_size,
        cfg_scale=args.cfg_scale, top_k=args.top_k,
        out_dir=args.output_dir, seed=args.seed,
    )
    print(json.dumps({"generated": int(shard.shape[0]),
                      "out": args.output_dir}))


def cmd_test_consistency(args):
    """Conditional-consistency loop (ref autoregressive/test/test_c2i.py:203-231
    / test_t2i.py: generate from condition images, re-extract the control
    signal, score F1/SSIM/RMSE against the input)."""
    from PIL import Image

    from controlar_tpu.eval.consistency import consistency_eval

    pipe = _build_pipeline(args, "c2i")
    files = sorted(
        f for f in os.listdir(args.condition_dir)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    if args.max_images:
        files = files[: args.max_images]
    rng = np.random.default_rng(args.seed)

    def batches():
        for i in range(0, len(files), args.batch_size):
            chunk = files[i : i + args.batch_size]
            imgs = np.stack([
                np.asarray(Image.open(os.path.join(args.condition_dir, f))
                           .convert("RGB")
                           .resize((args.image_size, args.image_size)))
                for f in chunk
            ]).astype(np.uint8)
            yield {"condition_images": imgs,
                   "labels": rng.integers(0, 1000, len(chunk))}

    kw = {}
    if args.condition_type == "depth":
        kw["depth_fn"] = pipe.depth_fn or (
            lambda imgs: np.asarray(imgs, np.float32).mean(-1))
    elif args.condition_type == "hed":
        kw["hed_params"] = pipe.hed_params
    elif args.condition_type == "lineart":
        kw["lineart_params"] = pipe.lineart_params
    score = consistency_eval(
        pipe, batches(), args.condition_type, cfg_scale=args.cfg_scale,
        top_k=args.top_k, seed=args.seed, **kw,
    )
    metric = {"canny": "f1", "hed": "ms_ssim", "lineart": "ms_ssim",
              "depth": "rmse"}[args.condition_type]
    print(json.dumps({metric: round(float(score), 5), "images": len(files)}))


def cmd_eval_t2i(args):
    """t2i CLIP score over a generated-images dir + prompts file (the
    reference's GigaGAN-protocol eval, evaluations/t2i/evaluation.py:130-178).
    clean-FID remains available via eval/t2i_eval.clean_fid when the
    cleanfid package is installed."""
    from PIL import Image

    from controlar_tpu.eval.t2i_eval import clip_score

    prompts = [line.strip() for line in open(args.prompts) if line.strip()]
    files = sorted(
        f for f in os.listdir(args.images)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )[: len(prompts)]
    imgs = np.stack([
        np.asarray(Image.open(os.path.join(args.images, f)).convert("RGB"))
        for f in files
    ])
    score = clip_score(imgs, prompts[: len(files)], args.clip_model,
                       device=args.device, how_many=args.how_many)
    print(json.dumps({"clip_score": round(score, 5), "images": len(files)}))


def cmd_eval_c2i(args):
    """FID / sFID / IS / Precision / Recall between two npz image batches
    (the reference's evaluations/c2i/evaluator.py protocol, all 5 metrics)."""
    import jax

    from controlar_tpu.eval.evaluator import evaluate_all
    from controlar_tpu.eval.inception import init_inception_params

    if args.inception_ckpt:
        from controlar_tpu.convert.torch_inception import load_torch_inception

        params = load_torch_inception(args.inception_ckpt)
    else:
        print("[warn] random Inception weights — metric values are NOT "
              "meaningful without the pytorch-fid checkpoint "
              "(pt_inception-2015-12-05-*.pth)", file=sys.stderr)
        params = init_inception_params(jax.random.PRNGKey(0))

    out = evaluate_all(params, args.ref_batch, args.sample_batch,
                       batch_size=args.batch_size)
    print(json.dumps({k: round(float(v), 5) for k, v in out.items()}))


def cmd_extract(args):
    """Build a code tree from an image folder (+ optional captions jsonl)."""
    import jax, jax.numpy as jnp
    from PIL import Image

    from controlar_tpu.config import vq_config
    from controlar_tpu.models import vq as vq_model
    from controlar_tpu import checkpoint as ckpt_lib
    from controlar_tpu.data.extract import extract_tree, extract_c2i_tree

    vcfg = vq_config("VQ-16")
    if args.vq_ckpt:
        vq_params = jax.tree.map(jnp.asarray, ckpt_lib.load_vq_checkpoint(args.vq_ckpt, vcfg))
    else:
        print("[warn] random VQ weights", file=sys.stderr)
        vq_params = vq_model.init_vq_params(jax.random.PRNGKey(0), vcfg)

    if args.task == "c2i":
        conditions = tuple(c for c in args.conditions.split(",") if c)
        depth_params = None
        if "depth" in conditions:
            from controlar_tpu.models import midas as midas_model

            if args.midas_ckpt:
                from controlar_tpu.convert.torch_midas import load_midas_checkpoint

                depth_params = load_midas_checkpoint(args.midas_ckpt)
            else:
                print("[warn] random MiDaS weights", file=sys.stderr)
                depth_params = midas_model.init_midas_params(jax.random.PRNGKey(1))

        def c2i_samples():
            classes = sorted(
                d for d in os.listdir(args.images)
                if os.path.isdir(os.path.join(args.images, d))
            )
            if classes:  # ImageNet-style class subfolders
                for label, cls in enumerate(classes):
                    cdir = os.path.join(args.images, cls)
                    for f in sorted(os.listdir(cdir)):
                        if f.lower().endswith((".png", ".jpg", ".jpeg")):
                            yield {"image": Image.open(os.path.join(cdir, f)),
                                   "label": label}
            else:  # flat folder, label 0
                for f in sorted(os.listdir(args.images)):
                    if f.lower().endswith((".png", ".jpg", ".jpeg")):
                        yield {"image": Image.open(os.path.join(args.images, f)),
                               "label": 0}

        n = extract_c2i_tree(
            args.output_dir, c2i_samples(), vq_params, vcfg,
            dataset=args.dataset, image_size=args.image_size,
            use_ten_crop=args.ten_crop, crop_range=args.crop_range,
            conditions=conditions, canny_low=args.min_threshold,
            canny_high=args.max_threshold, depth_params=depth_params,
            batch_images=args.batch_images,
        )
        print(f"extracted {n} c2i samples to {args.output_dir}")
        return

    captions = {}
    if args.captions:
        for line in open(args.captions):
            rec = json.loads(line)
            captions[rec["image"]] = rec["caption"]

    t5 = None
    if args.t5_path:
        from controlar_tpu.text.embedder import T5Embedder

        t5 = T5Embedder.from_pretrained(args.t5_path)

    def samples():
        for f in sorted(os.listdir(args.images)):
            if not f.lower().endswith((".png", ".jpg", ".jpeg")):
                continue
            yield {
                "image": Image.open(os.path.join(args.images, f)),
                "caption": captions.get(f, ""),
            }

    n = extract_tree(args.output_dir, samples(), vq_params, vcfg,
                     t5_embedder=t5, image_size=args.image_size)
    print(f"extracted {n} samples to {args.output_dir}")


def main(argv=None):
    parser = argparse.ArgumentParser(prog="controlar")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("sample-c2i")
    _add_model_args(p)
    p.add_argument("--class-labels", default="207,360,387,974",
                   help="comma-separated class ids or names (e.g. 'golden retriever')")
    p.add_argument("--condition-images", default=None, help="comma-separated paths")
    p.set_defaults(fn=cmd_sample_c2i)

    p = sub.add_parser("train-t2i")
    _add_model_args(p)
    p.add_argument("--code-path", required=True)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--global-batch-size", type=int, default=32)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--results-dir", default="results")
    p.add_argument("--resume-dir", default=None)
    p.add_argument("--ema", action="store_true")
    p.add_argument("--remat-policy", default="full",
                   choices=["full", "qkv", "attn", "qkv_attn", "dots", "none"])
    p.add_argument("--opt-state-dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="Adam moment storage; bfloat16 halves optimizer HBM "
                        "(unlocks GPT-XL 512 on one 16 GB chip)")
    p.add_argument("--dist-coordinator", default=None,
                   help="multi-host coordinator address (host:port); "
                        "auto-detected on TPU pods")
    p.add_argument("--dist-num-processes", type=int, default=None)
    p.add_argument("--dist-process-id", type=int, default=None)
    p.set_defaults(fn=cmd_train_t2i)

    p = sub.add_parser("serve-warmup")
    _add_model_args(p)
    p.add_argument("--model-type", default="c2i", choices=["c2i", "t2i"])
    p.add_argument("--max-slots", type=int, default=8)
    p.add_argument("--quantum", type=int, default=72)
    p.add_argument("--quantum-buckets", default=None,
                   help="comma list, e.g. 72,36,18")
    p.add_argument("--cache-dir", default="/tmp/jax_serve_cache")
    p.set_defaults(fn=cmd_serve_warmup)

    p = sub.add_parser("quant-report")
    _add_model_args(p)
    p.add_argument("--modes", default="int8,int8+kv8,w4,w4+kv8")
    p.add_argument("--max-new-tokens", type=int, default=128)
    p.add_argument("--json-out", default=None)
    p.set_defaults(fn=cmd_quant_report)

    p = sub.add_parser("pack-data")
    p.add_argument("--format", choices=["t2i", "c2i"], default="t2i")
    p.add_argument("--code-path", required=True,
                   help="extracted tree root (t2i) or codes dir (c2i)")
    p.add_argument("--label-dir", default=None, help="c2i labels dir")
    p.add_argument("--condition-dir", default=None)
    p.add_argument("--condition-type", default="canny")
    p.add_argument("--image-size", type=int, default=512)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--out", required=True, help="output .car path")
    p.set_defaults(fn=cmd_pack_data)

    p = sub.add_parser("train-c2i")
    _add_model_args(p)
    p.add_argument("--code-dir", required=True, help="imagenet{S}_codes dir")
    p.add_argument("--label-dir", default=None,
                   help="imagenet{S}_labels dir (not needed for .car input)")
    p.add_argument("--condition-dir", default=None,
                   help="imagenet{S}_<cond>_imagesnpy dir (None: on-device "
                        "extraction from control images in the batch)")
    p.add_argument("--no-flip-aug", action="store_true")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--global-batch-size", type=int, default=32)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--results-dir", default="results")
    p.add_argument("--resume-dir", default=None)
    p.add_argument("--ema", action="store_true")
    p.add_argument("--remat-policy", default="full",
                   choices=["full", "qkv", "attn", "qkv_attn", "dots", "none"])
    p.add_argument("--opt-state-dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--dist-coordinator", default=None)
    p.add_argument("--dist-num-processes", type=int, default=None)
    p.add_argument("--dist-process-id", type=int, default=None)
    p.set_defaults(fn=cmd_train_c2i)

    p = sub.add_parser("sample-t2i")
    p.add_argument("--image-height", type=int, default=None,
                   help="MR: explicit output height (pairs with --image-width; "
                        "exact rectangular RoPE, ref sample_t2i_MR.py)")
    p.add_argument("--image-width", type=int, default=None)
    _add_model_args(p)
    p.add_argument("--prompt", default=None)
    p.add_argument("--t5-path", default=None)
    p.add_argument("--condition-image", default=None)
    p.add_argument("--num-images", type=int, default=4)
    p.set_defaults(fn=cmd_sample_t2i)

    p = sub.add_parser("train-vq")
    p.add_argument("--vq-model", default="VQ-16")
    p.add_argument("--images", required=True)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--max-steps", type=int, default=100000)
    p.add_argument("--disc-start", type=int, default=20000)
    p.add_argument("--disc-type", default="patchgan",
                   choices=["patchgan", "stylegan"])
    p.add_argument("--disc-loss", default="hinge",
                   choices=["hinge", "vanilla", "non-saturating"])
    p.add_argument("--disc-adaptive-weight", action="store_true",
                   help="grad-norm-ratio adaptive disc weight (ref vq_loss.py)")
    p.add_argument("--lpips-vgg", default=None)
    p.add_argument("--lpips-lin", default=None)
    p.add_argument("--ema", action="store_true")
    p.add_argument("--log-every", type=int, default=100)
    p.add_argument("--ckpt-every", type=int, default=5000)
    p.add_argument("--eval-after", type=int, default=64,
                   help="run the reconstruction rFID smoke gate on this many "
                        "images after training (0 disables)")
    p.add_argument("--results-dir", default="results")
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_train_vq)

    p = sub.add_parser("serve")
    p.add_argument("--compile-cache", default="/tmp/jax_serve_cache",
                   help="persistent XLA compilation cache dir")
    _add_model_args(p)
    p.add_argument("--class-labels", default="207,360,387,974,88,979,417,279")
    p.add_argument("--max-slots", type=int, default=8)
    p.add_argument("--quantum", type=int, default=64)
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("eval-vq")
    p.add_argument("--vq-ckpt", default=None)
    p.add_argument("--images", required=True)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--output-dir", default=None)
    p.set_defaults(fn=cmd_eval_vq)

    p = sub.add_parser("verify-zoo")
    p.add_argument("checkpoints", nargs="*", help=".pt/.safetensors paths")
    p.add_argument("--size", default="GPT-XL")
    p.add_argument("--model-type", default="t2i", choices=["c2i", "t2i"])
    p.add_argument("--adapter-size", default="small", choices=["small", "base"])
    p.add_argument("--block-size", type=int, default=1024,
                   help="image tokens (1024 = 512px t2i, 576 = 384px c2i)")
    p.add_argument("--max-new-tokens", type=int, default=None,
                   help="cap decode steps (full block by default; the torch "
                        "reference runs on CPU here, so long decodes are slow)")
    p.add_argument("--cfg-scale", type=float, default=2.0)
    p.add_argument("--self-test", action="store_true",
                   help="run the gate on a tiny random reference checkpoint")
    p.add_argument("--quant-report", action="store_true",
                   help="also measure int8/W4 serving-mode token agreement "
                        "against the converted bf16 weights (c2i)")
    p.add_argument("--zoo-dir", default=None,
                   help="gate every released zoo file found in this dir "
                        "(canny_MR/depth_MR/hed/seg_cocostuff/edge_base/"
                        "depth_base .safetensors, ref README.md:60-67)")
    p.set_defaults(fn=cmd_verify_zoo)

    p = sub.add_parser("eval-miou")
    p.add_argument("--images", required=True, help="generated images dir")
    p.add_argument("--annotations", required=True, help="gt label maps dir")
    p.add_argument("--segmenter", required=True,
                   help="local transformers seg checkpoint dir "
                        "(e.g. mask2former-swin-large-ade-semantic)")
    p.add_argument("--num-classes", type=int, default=151,
                   help="label bins incl. the offset (ADE20K: gt/preds are "
                        "1..150 with 0 = ignore, so 151 bins; the reference "
                        "conflates class 150 with its remapped ignore label, "
                        "ade20k_mIoU.py:44-48 — here class 150 is scored)")
    p.add_argument("--ignore-index", type=int, default=0)
    p.add_argument("--label-offset", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--device", default="cpu")
    p.set_defaults(fn=cmd_eval_miou)

    p = sub.add_parser("sample-fid")
    _add_model_args(p)
    p.add_argument("--num-images", type=int, default=50000)
    p.add_argument("--batch-size", type=int, default=8)
    p.set_defaults(fn=cmd_sample_fid)

    p = sub.add_parser("test-consistency")
    _add_model_args(p)
    p.add_argument("--condition-dir", required=True,
                   help="directory of condition source images")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-images", type=int, default=None)
    p.set_defaults(fn=cmd_test_consistency)

    p = sub.add_parser("eval-t2i")
    p.add_argument("--images", required=True)
    p.add_argument("--prompts", required=True, help="one prompt per line")
    p.add_argument("--clip-model", required=True,
                   help="local transformers CLIP dir (clip-vit-base-patch32)")
    p.add_argument("--how-many", type=int, default=5000)
    p.add_argument("--device", default="cpu")
    p.set_defaults(fn=cmd_eval_t2i)

    p = sub.add_parser("eval-c2i")
    p.add_argument("ref_batch", help="reference npz (arr_0 NHWC uint8, or mu/sigma stats)")
    p.add_argument("sample_batch", help="samples npz from eval/sampler.py")
    p.add_argument("--inception-ckpt", default=None,
                   help="pytorch-fid pt_inception-2015-12-05-*.pth")
    p.add_argument("--batch-size", type=int, default=64)
    p.set_defaults(fn=cmd_eval_c2i)

    p = sub.add_parser("extract")
    p.add_argument("--task", default="t2i", choices=["t2i", "c2i"],
                   help="t2i: code/caption_emb/image tree; c2i: ImageNet "
                        "{codes,labels,cond_imagesnpy} trees "
                        "(ref extract_codes_c2i.py / extract_file_imagenet.py)")
    p.add_argument("--vq-ckpt", default=None)
    p.add_argument("--t5-path", default=None)
    p.add_argument("--images", required=True,
                   help="image folder; for c2i, an ImageNet-style "
                        "class-subfolder tree (label = sorted folder index)")
    p.add_argument("--captions", default=None, help="jsonl with image/caption")
    p.add_argument("--image-size", type=int, default=512)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--dataset", default="imagenet", help="c2i tree prefix")
    p.add_argument("--ten-crop", action="store_true",
                   help="c2i: 10 crops/image instead of center+flip")
    p.add_argument("--crop-range", type=float, default=1.1)
    p.add_argument("--conditions", default="",
                   help="c2i: comma subset of canny,depth")
    p.add_argument("--min-threshold", type=int, default=100)
    p.add_argument("--max-threshold", type=int, default=200)
    p.add_argument("--midas-ckpt", default=None,
                   help="MiDaS dpt_hybrid checkpoint for depth extraction")
    p.add_argument("--batch-images", type=int, default=8)
    p.set_defaults(fn=cmd_extract)

    p = sub.add_parser("bench")
    p.set_defaults(fn=lambda a: __import__("bench").main())

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
