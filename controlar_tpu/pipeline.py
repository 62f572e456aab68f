"""End-to-end generation pipeline: condition image -> control tokens ->
CFG decode -> VQ decode -> image.

Replaces the reference's per-script wiring (ref autoregressive/sample/
sample_c2i.py:27-123, sample_t2i.py:34-183) with one reusable object.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from controlar_tpu.config import GPTConfig, VQConfig
from controlar_tpu import generate as jgen
from controlar_tpu.models import vq as vq_model
from controlar_tpu.models import vit as vit_model
from controlar_tpu.models import control_nets
from controlar_tpu.ops.canny import canny
from controlar_tpu.ops.resize import to_patch14


def normalize_condition(x: jnp.ndarray) -> jnp.ndarray:
    """uint8-range control map -> [-1, 1] (ref sample_t2i.py:140-141,
    dataset/t2i_control.py:110-115)."""
    return 2.0 * (x.astype(jnp.float32) / 255.0 - 0.5)


def to_uint8_image(x: jnp.ndarray) -> np.ndarray:
    """[-1,1] NHWC float -> uint8 (torchvision save_image semantics:
    clamp then scale)."""
    x = jnp.clip(x, -1.0, 1.0)
    return np.asarray((255.0 * (x + 1.0) / 2.0) + 0.5).astype(np.uint8)


@dataclasses.dataclass
class ControlARPipeline:
    gpt_cfg: GPTConfig
    gpt_params: Any
    vq_cfg: VQConfig
    vq_params: Any
    adapter_cfg: vit_model.ViTConfig
    adapter_params: Any
    condition_type: str = "canny"
    hed_params: Any = None
    lineart_params: Any = None
    dpt_params: Any = None
    dpt_cfg: Any = None
    midas_params: Any = None  # MiDaS dpt_hybrid (the MR-checkpoint detector)
    midas_cfg: Any = None
    depth_fn: Any = None  # optional override: (B,H,W,3) uint8 -> (B,H,W) 0..255
    # cross-size speculative draft (e.g. GPT-B drafting GPT-3B): a smaller
    # family member's weights; used by generate(spec_draft="model"[...-int8])
    draft_gpt_cfg: Any = None
    draft_gpt_params: Any = None

    # ------------------------------------------------------------------
    def extract_condition(self, images_u8: np.ndarray, *,
                          canny_low: int = 100, canny_high: int = 200,
                          preprocess: bool = True) -> jnp.ndarray:
        """RGB uint8 (B,H,W,3) -> normalized 3-channel control map
        (ref sample_t2i.py:106-141 dispatch). preprocess=False treats the
        input as an already-rendered map (the demo's "No preprocess" choice,
        ref demo/app_edge.py:36-44)."""
        x = jnp.asarray(images_u8)
        ct = self.condition_type
        if not preprocess:
            cond = x.astype(jnp.float32).mean(-1)
        elif ct == "canny":
            cond = canny(x, canny_low, canny_high).astype(jnp.float32)
        elif ct == "hed":
            cond = control_nets.hed_forward(self.hed_params, x.astype(jnp.float32))
        elif ct == "lineart":
            cond = control_nets.lineart_forward(
                self.lineart_params, x.astype(jnp.float32)
            ) * 255.0
        elif ct == "depth":
            if self.depth_fn is not None:
                cond = jnp.asarray(self.depth_fn(images_u8))
            elif self.midas_params is not None:
                # MR/depth checkpoints were trained against the MiDaS
                # dpt_hybrid detector (ref sample_t2i_MR.py:133, depth.py):
                # raw native-resolution image, min-max-normalized output
                from controlar_tpu.models import midas as midas_model

                cond = midas_model.midas_depth_condition(
                    self.midas_params, self.midas_cfg or midas_model.MIDAS_HYBRID, x
                )
            else:
                assert self.dpt_params is not None, "depth estimator not configured"
                from controlar_tpu.models import dpt as dpt_model

                pre = dpt_model.preprocess_depth_input(x, size=x.shape[1])
                depth = dpt_model.dpt_depth(self.dpt_params, self.dpt_cfg, pre)
                cond = dpt_model.depth_to_condition(depth)
        elif ct == "seg":
            cond = x.astype(jnp.float32).mean(-1)  # seg maps arrive pre-rendered
        else:
            raise ValueError(ct)
        cond3 = jnp.repeat(cond[..., None], 3, axis=-1)
        return normalize_condition(cond3)

    def control_features(self, condition: jnp.ndarray) -> jnp.ndarray:
        """Normalized condition (B,H,W,3) -> adapter tokens (B, hw/256, C)
        (ref Dinov2_Adapter.forward: dinov2_adapter.py:26-29)."""
        x = to_patch14(condition, self.condition_type)
        return vit_model.vit_forward(self.adapter_params, self.adapter_cfg, x)

    # ------------------------------------------------------------------
    def generate(
        self,
        *,
        labels: Optional[np.ndarray] = None,
        caption_emb: Optional[np.ndarray] = None,
        emb_masks: Optional[np.ndarray] = None,
        condition_images: Optional[np.ndarray] = None,
        cfg_scale: float = 4.0,
        temperature: float = 1.0,
        top_k: int = 2000,
        top_p: float = 1.0,
        control_strength: float = 1.0,
        seed: int = 0,
        cache_dtype=None,
        canny_low: int = 100,
        canny_high: int = 200,
        preprocess_condition: bool = True,
        spec_draft: Optional[str] = None,
    ) -> np.ndarray:
        """Returns generated images as uint8 (B, H, W, 3). cache_dtype
        jnp.int8/int4 selects the quantized KV cache (pairs with the
        quantized weight modes on gpt_params). spec_draft decodes
        speculatively — Leviathan accept/reject preserves the same warped
        (temperature/top-k/top-p) target distribution the non-speculative
        sampler draws from:
          "int8" | "w4"          quantized SELF-draft (same architecture)
          "model" | "model-int8" the loaded cross-size draft
                                 (draft_gpt_params/draft_gpt_cfg), e.g.
                                 GPT-B drafting GPT-3B — the config that
                                 pays when the target dominates the step"""
        adapter_feats = None
        if condition_images is not None:
            cond = self.extract_condition(
                condition_images, canny_low=canny_low, canny_high=canny_high,
                preprocess=preprocess_condition,
            )
            adapter_feats = self.control_features(cond)

        extra = {} if cache_dtype is None else {"cache_dtype": cache_dtype}
        common = dict(
            labels=None if labels is None else jnp.asarray(labels),
            caption_emb=None if caption_emb is None else jnp.asarray(caption_emb),
            emb_masks=None if emb_masks is None else jnp.asarray(emb_masks),
            adapter_features=adapter_feats,
            max_new_tokens=self.gpt_cfg.block_size,
            cfg_scale=cfg_scale,
            control_strength=control_strength,
        )
        if spec_draft is not None:
            from controlar_tpu import decode as _dec
            from controlar_tpu import quant as _quant
            from controlar_tpu import spec_decode as _spec

            draft_cfg = None
            if spec_draft in ("model", "model-int8"):
                if self.draft_gpt_params is None:
                    raise ValueError(
                        "spec_draft=%r needs draft_gpt_params/draft_gpt_cfg "
                        "on the pipeline" % spec_draft)
                draft_cfg = self.draft_gpt_cfg
                draft = self.draft_gpt_params
                if spec_draft == "model-int8":
                    draft = _quant.quantize_gpt_params(draft)
                draft = _dec.unstack_layers(draft)
            elif spec_draft == "w4":
                base = _dec.unstack_layers(self.gpt_params)
                draft = _quant.quantize_gpt_params_w4(base)
            elif spec_draft == "int8":
                draft = _dec.unstack_layers(
                    _quant.quantize_gpt_params(self.gpt_params))
            else:
                raise ValueError(spec_draft)
            tokens = _spec.generate_spec(
                self.gpt_params, self.gpt_cfg, draft, draft_cfg,
                **extra, **common,
                temperature=temperature, top_k=top_k, top_p=top_p,
                rng=jax.random.PRNGKey(seed))
        else:
            tokens = jgen.generate(
                self.gpt_params,
                self.gpt_cfg,
                **extra,
                **common,
                temperature=temperature,
                top_k=top_k,
                top_p=top_p,
                rng=jax.random.PRNGKey(seed),
            )
        gh, gw = self.gpt_cfg.grid
        codes = tokens.reshape(-1, gh, gw)
        imgs = vq_model.decode_code(self.vq_params, self.vq_cfg, codes)
        return to_uint8_image(imgs)
