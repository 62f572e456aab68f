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

def _disc_forward(disc_params, disc_type: str, x: jnp.ndarray) -> jnp.ndarray:
    if disc_type == "stylegan":
        from controlar_tpu.models.discriminators import stylegan_disc_forward as stylegan_forward

        return stylegan_forward(disc_params, x)
    return patchgan_forward(disc_params, x)


def calculate_adaptive_weight(nll_of, gadv_of, w_last) -> jnp.ndarray:
    """Adaptive discriminator weight (ref vq_loss.py:109-115): the ratio of
    gradient norms of the NLL (rec + perceptual) and generator-adversarial
    losses w.r.t. the decoder's LAST layer weight, clipped to [0, 1e4] and
    detached. `nll_of`/`gadv_of` are scalar functions of that weight alone
    (the decoder trunk is closed over, so each grad is one conv backward)."""
    nll_g = jax.grad(nll_of)(w_last)
    adv_g = jax.grad(gadv_of)(w_last)
    d_weight = jnp.linalg.norm(nll_g.ravel()) / (
        jnp.linalg.norm(adv_g.ravel()) + 1e-4
    )
    return jax.lax.stop_gradient(jnp.clip(d_weight, 0.0, 1e4))


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
    disc_type: str = "patchgan",
    disc_adaptive_weight: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    from controlar_tpu.ops.conv import conv2d

    h = vq_model.encoder_forward(vq_params["encoder"], cfg, images)
    h = conv2d(h, vq_params["quant_conv"]["w"], vq_params["quant_conv"]["b"])
    z_q, indices, (vq_l, commit_l, ent_l) = quantize_with_losses(vq_params, cfg, h)

    # decode through the trunk once; the final conv is a function of its
    # weight so the adaptive weight can take per-loss grads at the last layer
    zp = conv2d(z_q, vq_params["post_quant_conv"]["w"],
                vq_params["post_quant_conv"]["b"])
    trunk = vq_model.decoder_trunk(vq_params["decoder"], cfg, zp)
    w_out = vq_params["decoder"]["conv_out"]["w"]
    b_out = vq_params["decoder"]["conv_out"]["b"]

    def recon_of(w):
        return conv2d(trunk, w, b_out)

    recon = recon_of(w_out)

    def rec_fn(r):
        if rec_loss_type == "l1":
            return jnp.mean(jnp.abs(images - r))
        return jnp.mean((images - r) ** 2)

    gen_adv_fn = (hinge_gen_loss if gen_adv_loss_type == "hinge"
                  else non_saturating_gen_loss)

    rec = rec_fn(recon)
    p_loss = jnp.mean(lpips(lpips_params, images, recon))
    gen_adv = gen_adv_fn(_disc_forward(disc_params, disc_type, recon))

    if disc_adaptive_weight:
        adaptive = calculate_adaptive_weight(
            lambda w: rec_weight * rec_fn(recon_of(w))
            + perceptual_weight * jnp.mean(lpips(lpips_params, images, recon_of(w))),
            lambda w: gen_adv_fn(_disc_forward(disc_params, disc_type, recon_of(w))),
            w_out,
        )
    else:
        adaptive = jnp.asarray(1.0)
    dw = adopt_weight(disc_weight, global_step, disc_start)

    loss = (rec_weight * rec + perceptual_weight * p_loss
            + adaptive * dw * gen_adv + vq_l + commit_l + ent_l)
    metrics = {
        "rec_loss": rec, "perceptual_loss": p_loss, "vq_loss": vq_l,
        "commit_loss": commit_l, "gen_adv_loss": gen_adv,
        "disc_adaptive_weight": adaptive,
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
    disc_type: str = "patchgan",
) -> jnp.ndarray:
    logits_real = _disc_forward(disc_params, disc_type,
                                jax.lax.stop_gradient(images))
    logits_fake = _disc_forward(disc_params, disc_type,
                                jax.lax.stop_gradient(recon))
    fn = {"hinge": hinge_d_loss, "vanilla": vanilla_d_loss,
          "non-saturating": non_saturating_d_loss}[disc_loss_type]
    return adopt_weight(disc_weight, global_step, disc_start) * fn(
        logits_real, logits_fake
    )
