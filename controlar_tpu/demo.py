"""Gradio demo (ref demo/app.py + demo/model.py: Canny/Depth tabs over a
shared pipeline). Gated on gradio availability; the CLI is the primary UI.

Run: python -m controlar_tpu.demo --gpt-ckpt ... --vq-ckpt ...
"""
from __future__ import annotations

import numpy as np


def build_demo(pipe_factory):
    """pipe_factory(condition_type) -> ControlARPipeline."""
    try:
        import gradio as gr
    except ImportError as e:  # pragma: no cover
        raise SystemExit(
            "gradio is not installed in this image; use the CLI "
            "(python -m controlar_tpu.cli sample-c2i / sample-t2i)"
        ) from e

    pipes = {}

    def get_pipe(ct):
        if ct not in pipes:
            pipes[ct] = pipe_factory(ct)
        return pipes[ct]

    def process(image, condition_type, cfg_scale, control_strength, seed):
        pipe = get_pipe(condition_type)
        size = pipe.gpt_cfg.grid[0] * 16
        from PIL import Image

        img = np.asarray(
            Image.fromarray(image).convert("RGB").resize((size, size))
        )[None]
        out = pipe.generate(
            labels=np.asarray([0]), condition_images=img,
            cfg_scale=float(cfg_scale), control_strength=float(control_strength),
            seed=int(seed),
        )
        return out[0]

    with gr.Blocks(title="ControlAR-TPU") as demo:
        gr.Markdown("# ControlAR-TPU — controllable AR image generation")
        with gr.Row():
            inp = gr.Image(label="condition image")
            out = gr.Image(label="generated")
        ct = gr.Radio(["canny", "depth", "hed", "lineart"], value="canny",
                      label="condition")
        cfg = gr.Slider(1.0, 10.0, value=4.0, label="CFG scale")
        strength = gr.Slider(0.0, 2.0, value=1.0, label="control strength")
        seed = gr.Number(value=0, label="seed")
        btn = gr.Button("Generate")
        btn.click(process, [inp, ct, cfg, strength, seed], out)
    return demo


def main():
    import argparse

    from controlar_tpu import cli as _cli

    parser = argparse.ArgumentParser()
    _cli._add_model_args(parser)
    args = parser.parse_args()

    def factory(ct):
        args.condition_type = ct
        return _cli._build_pipeline(args, "c2i")

    build_demo(factory).launch()


if __name__ == "__main__":
    main()
