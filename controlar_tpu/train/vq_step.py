"""VQGAN training step: alternating generator/discriminator updates.

(ref tokenizer/tokenizer_image/vq_train.py:37-120+: two AdamW optimizers,
loss per vq_loss.py, EMA option; GradScaler is unnecessary under bf16.)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from controlar_tpu.config import VQConfig
from controlar_tpu.train import vq_loss as L
from controlar_tpu.train.optimizer import update_ema


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class VQTrainState:
    step: jnp.ndarray
    vq_params: Any
    disc_params: Any
    vq_opt: Any
    disc_opt: Any
    ema_params: Any = None


def init_vq_train_state(vq_params, disc_params, tx_g, tx_d, use_ema=False):
    return VQTrainState(
        step=jnp.zeros((), jnp.int32),
        vq_params=vq_params,
        disc_params=disc_params,
        vq_opt=tx_g.init(vq_params),
        disc_opt=tx_d.init(disc_params),
        ema_params=jax.tree.map(jnp.copy, vq_params) if use_ema else None,
    )


def make_vq_train_step(
    cfg: VQConfig,
    tx_g: optax.GradientTransformation,
    tx_d: optax.GradientTransformation,
    lpips_params,
    disc_start: int = 20000,
    disc_weight: float = 0.5,
    rec_loss_type: str = "l2",
    ema_decay: Optional[float] = None,
    disc_type: str = "patchgan",
    disc_adaptive_weight: bool = False,
    disc_loss_type: str = "hinge",
):
    def train_step(state: VQTrainState, images: jnp.ndarray):
        # generator update
        def g_loss(vq_params):
            return L.generator_loss(
                vq_params, state.disc_params, lpips_params, cfg, images,
                state.step, disc_start, disc_weight,
                rec_loss_type=rec_loss_type, disc_type=disc_type,
                disc_adaptive_weight=disc_adaptive_weight,
            )

        (gl, (metrics, recon)), g_grads = jax.value_and_grad(g_loss, has_aux=True)(
            state.vq_params
        )
        g_updates, vq_opt = tx_g.update(g_grads, state.vq_opt, state.vq_params)
        vq_params = optax.apply_updates(state.vq_params, g_updates)

        # discriminator update
        def d_loss(disc_params):
            return L.discriminator_loss(
                disc_params, images, recon, state.step, disc_start,
                disc_weight, disc_loss_type=disc_loss_type, disc_type=disc_type,
            )

        dl, d_grads = jax.value_and_grad(d_loss)(state.disc_params)
        d_updates, disc_opt = tx_d.update(d_grads, state.disc_opt, state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_updates)

        ema = state.ema_params
        if ema is not None and ema_decay is not None:
            ema = update_ema(ema, vq_params, ema_decay)
        metrics = dict(metrics, g_loss=gl, d_loss=dl)
        return (
            VQTrainState(
                step=state.step + 1, vq_params=vq_params, disc_params=disc_params,
                vq_opt=vq_opt, disc_opt=disc_opt, ema_params=ema,
            ),
            metrics,
        )

    return train_step
