"""Comparison continuous-latent autoencoders: SD-VAE and the OpenAI
consistency decoder.

The reference's comparison scripts are thin wrappers over diffusers models
(ref tokenizer/vae/reconstruction_vae_ddp.py:19 `AutoencoderKL`,
tokenizer/consistencydecoder/reconstruction_cd_ddp.py:19
`ConsistencyDecoderVAE`) — it implements nothing itself, so the parity
surface here is the same: load the diffusers model when the package + local
weights exist, expose `reconstruct(images_u8) -> images_u8` with the exact
reference pre/post (x/127.5-1, sample -> decode, clamp to uint8), and feed
eval/reconstruction.py's rFID/PSNR/SSIM harness. Everything degrades to a
clear error message when diffusers is absent (this image does not ship it).
"""
from __future__ import annotations

from typing import Callable

import numpy as np


def _require_diffusers():
    try:
        import diffusers  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "the SD-VAE / consistency-decoder comparison tokenizers need the "
            "`diffusers` package (not shipped in this image); the first-party "
            "tokenizers (models/vq.py, models/taming_vqgan.py) cover the "
            "framework's own paths"
        ) from e


def sd_vae_reconstructor(model_dir: str, device: str = "cpu",
                         sample_posterior: bool = False
                         ) -> Callable[[np.ndarray], np.ndarray]:
    """AutoencoderKL round trip (ref reconstruction_vae_ddp.py protocol:
    encode -> (mode|sample) latent -> decode)."""
    _require_diffusers()
    import torch
    from diffusers.models import AutoencoderKL

    vae = AutoencoderKL.from_pretrained(model_dir).to(device).eval()

    def reconstruct(images_u8: np.ndarray) -> np.ndarray:
        x = np.asarray(images_u8, np.float32) / 127.5 - 1.0
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2)).to(device)
        with torch.no_grad():
            post = vae.encode(xt).latent_dist
            z = post.sample() if sample_posterior else post.mode()
            rec = vae.decode(z).sample
        rec = rec.clamp(-1, 1).cpu().numpy().transpose(0, 2, 3, 1)
        return ((rec + 1) * 127.5).round().astype(np.uint8)

    return reconstruct


def consistency_decoder_reconstructor(model_dir: str, device: str = "cpu"
                                      ) -> Callable[[np.ndarray], np.ndarray]:
    """ConsistencyDecoderVAE round trip (ref reconstruction_cd_ddp.py)."""
    _require_diffusers()
    import torch
    from diffusers.models import ConsistencyDecoderVAE

    vae = ConsistencyDecoderVAE.from_pretrained(model_dir).to(device).eval()

    def reconstruct(images_u8: np.ndarray) -> np.ndarray:
        x = np.asarray(images_u8, np.float32) / 127.5 - 1.0
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2)).to(device)
        with torch.no_grad():
            z = vae.encode(xt).latent_dist.mode()
            rec = vae.decode(z).sample
        rec = rec.clamp(-1, 1).cpu().numpy().transpose(0, 2, 3, 1)
        return ((rec + 1) * 127.5).round().astype(np.uint8)

    return reconstruct
