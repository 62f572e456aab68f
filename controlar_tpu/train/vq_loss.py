"""VQGAN training losses (ref tokenizer/tokenizer_image/vq_loss.py).

Generator: rec (l1/l2) + LPIPS + adversarial (delayed by disc_start, optional
adaptive weight) + codebook (vq + commit + entropy).
Discriminator: hinge / vanilla / non-saturating on real-vs-reconstruction.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from controlar_tpu.config import VQConfig
from controlar_tpu.models import vq as vq_model
from controlar_tpu.models.discriminators import patchgan_forward
from controlar_tpu.models.lpips import lpips


# ---------------------------------------------------------------------------
# Quantizer losses (ref VectorQuantizer.forward: vq_model.py:248-252, 400-413)
# ---------------------------------------------------------------------------

def quantize_with_losses(params, cfg: VQConfig, z: jnp.ndarray):
    """Returns (z_q_ste, indices, (vq_loss, commit_loss, entropy_loss))."""
    emb = params["codebook"]
    if cfg.codebook_l2_norm:
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        zn = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
    else:
        zn = z
    d = (
        jnp.sum(zn * zn, axis=-1, keepdims=True)
        + jnp.sum(emb * emb, axis=-1)[None, None, None, :]
        - 2.0 * jnp.einsum("bhwd,nd->bhwn", zn, emb, preferred_element_type=jnp.float32)
    )
    indices = jnp.argmin(d, axis=-1)
    z_q = emb[indices]
    vq_loss = jnp.mean((z_q - jax.lax.stop_gradient(zn)) ** 2)
    commit_loss = cfg.commit_loss_beta * jnp.mean(
        (jax.lax.stop_gradient(z_q) - zn) ** 2
    )
    entropy_loss = 0.0
    if cfg.entropy_loss_ratio > 0:
        entropy_loss = cfg.entropy_loss_ratio * _entropy_loss(-d)
    z_q = zn + jax.lax.stop_gradient(z_q - zn)
    return z_q, indices, (vq_loss, commit_loss, entropy_loss)


def _entropy_loss(affinity: jnp.ndarray, temperature: float = 0.01) -> jnp.ndarray:
    flat = affinity.reshape(-1, affinity.shape[-1]) / temperature
    probs = jax.nn.softmax(flat, axis=-1)
    log_probs = jax.nn.log_softmax(flat + 1e-5, axis=-1)
    avg_probs = jnp.mean(probs, axis=0)
    avg_entropy = -jnp.sum(avg_probs * jnp.log(avg_probs + 1e-5))
    sample_entropy = -jnp.mean(jnp.sum(probs * log_probs, axis=-1))
    return sample_entropy - avg_entropy


# ---------------------------------------------------------------------------
# GAN losses (ref vq_loss.py:14-46)
# ---------------------------------------------------------------------------

def hinge_d_loss(real, fake):
    return 0.5 * (jnp.mean(jax.nn.relu(1.0 - real)) + jnp.mean(jax.nn.relu(1.0 + fake)))


def vanilla_d_loss(real, fake):
    return 0.5 * (jnp.mean(jax.nn.softplus(-real)) + jnp.mean(jax.nn.softplus(fake)))


def non_saturating_d_loss(real, fake):
    return 0.5 * (
        jnp.mean(optax_sigmoid_ce(real, jnp.ones_like(real)))
        + jnp.mean(optax_sigmoid_ce(fake, jnp.zeros_like(fake)))
    )


def optax_sigmoid_ce(logits, labels):
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def hinge_gen_loss(fake):
    return -jnp.mean(fake)


def non_saturating_gen_loss(fake):
    return jnp.mean(optax_sigmoid_ce(fake, jnp.ones_like(fake)))


def adopt_weight(weight, global_step, threshold: int = 0, value: float = 0.0):
    return jnp.where(global_step < threshold, value, weight)


# ---------------------------------------------------------------------------
# Combined generator / discriminator objectives
# ---------------------------------------------------------------------------

def generator_loss(
    vq_params,
    disc_params,
    lpips_params,
    cfg: VQConfig,
    images: jnp.ndarray,       # (B,H,W,3) in [-1,1]
    global_step: jnp.ndarray,
    disc_start: int,
    disc_weight: float = 0.5,
    rec_weight: float = 1.0,
    perceptual_weight: float = 1.0,
    rec_loss_type: str = "l2",
    gen_adv_loss_type: str = "hinge",
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    h = vq_model.encoder_forward(vq_params["encoder"], cfg, images)
    from controlar_tpu.ops.conv import conv2d

    h = conv2d(h, vq_params["quant_conv"]["w"], vq_params["quant_conv"]["b"])
    z_q, indices, (vq_l, commit_l, ent_l) = quantize_with_losses(vq_params, cfg, h)
    recon = vq_model.decode(vq_params, cfg, z_q)

    if rec_loss_type == "l1":
        rec = jnp.mean(jnp.abs(images - recon))
    else:
        rec = jnp.mean((images - recon) ** 2)
    p_loss = jnp.mean(lpips(lpips_params, images, recon))

    logits_fake = patchgan_forward(disc_params, recon)
    gen_adv = (hinge_gen_loss if gen_adv_loss_type == "hinge"
               else non_saturating_gen_loss)(logits_fake)
    dw = adopt_weight(disc_weight, global_step, disc_start)

    loss = (rec_weight * rec + perceptual_weight * p_loss + dw * gen_adv
            + vq_l + commit_l + ent_l)
    metrics = {
        "rec_loss": rec, "perceptual_loss": p_loss, "vq_loss": vq_l,
        "commit_loss": commit_l, "gen_adv_loss": gen_adv,
    }
    return loss, (metrics, recon)


def discriminator_loss(
    disc_params,
    images: jnp.ndarray,
    recon: jnp.ndarray,
    global_step: jnp.ndarray,
    disc_start: int,
    disc_weight: float = 0.5,
    disc_loss_type: str = "hinge",
) -> jnp.ndarray:
    logits_real = patchgan_forward(disc_params, jax.lax.stop_gradient(images))
    logits_fake = patchgan_forward(disc_params, jax.lax.stop_gradient(recon))
    fn = {"hinge": hinge_d_loss, "vanilla": vanilla_d_loss,
          "non-saturating": non_saturating_d_loss}[disc_loss_type]
    return adopt_weight(disc_weight, global_step, disc_start) * fn(
        logits_real, logits_fake
    )
