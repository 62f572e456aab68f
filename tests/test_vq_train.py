"""VQ training: PatchGAN parity vs reference module, quantizer losses parity,
full gen/disc step runs and reduces reconstruction loss."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from controlar_tpu.config import VQConfig
from controlar_tpu.models import vq as jvq
from controlar_tpu.models.discriminators import (
    convert_patchgan_state_dict,
    init_patchgan_params,
    patchgan_forward,
)
from controlar_tpu.models.lpips import init_lpips_params, lpips
from controlar_tpu.train.optimizer import make_optimizer
from controlar_tpu.train.vq_loss import quantize_with_losses
from controlar_tpu.train.vq_step import init_vq_train_state, make_vq_train_step
from tests.conftest import add_reference_path

pytestmark = pytest.mark.slow


def test_patchgan_parity():
    add_reference_path()
    import torch
    from tokenizer.tokenizer_image.discriminator_patchgan import NLayerDiscriminator

    torch.manual_seed(0)
    net = NLayerDiscriminator(input_nc=3, ndf=16, n_layers=3).float().train()
    params = jax.tree.map(
        jnp.asarray, convert_patchgan_state_dict(net.state_dict(), n_layers=3)
    )
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()
    got = np.asarray(patchgan_forward(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=2e-4)


def test_quantizer_losses_match_reference():
    add_reference_path()
    import torch
    from tokenizer.tokenizer_image.vq_model import VectorQuantizer

    torch.manual_seed(1)
    q = VectorQuantizer(n_e=32, e_dim=8, beta=0.25, entropy_loss_ratio=0.0,
                        l2_norm=True, show_usage=False).train()
    cfg = VQConfig(codebook_size=32, codebook_embed_dim=8)
    params = {"codebook": jnp.asarray(q.embedding.weight.detach().numpy())}
    rng = np.random.default_rng(2)
    z = rng.standard_normal((2, 4, 4, 8)).astype(np.float32)

    zt = torch.from_numpy(z.transpose(0, 3, 1, 2))
    zq_ref, (vq_l, commit_l, _, _), (_, _, idx_ref) = q(zt)

    z_q, idx, (vq_j, commit_j, _) = quantize_with_losses(params, cfg, jnp.asarray(z))
    np.testing.assert_array_equal(np.asarray(idx).reshape(-1), idx_ref.numpy())
    np.testing.assert_allclose(float(vq_j), float(vq_l), atol=1e-5)
    np.testing.assert_allclose(float(commit_j), float(commit_l), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(z_q).transpose(0, 3, 1, 2), zq_ref.detach().numpy(), atol=1e-5
    )


def test_vq_train_step_runs():
    cfg = VQConfig(codebook_size=64, codebook_embed_dim=8, z_channels=16, ch=16)
    rng = jax.random.PRNGKey(0)
    vq_params = jvq.init_vq_params(rng, cfg)
    disc_params = init_patchgan_params(rng, ndf=16)
    lp = init_lpips_params(rng)
    tx_g = make_optimizer(lr=2e-3)
    tx_d = make_optimizer(lr=2e-3)
    state = init_vq_train_state(vq_params, disc_params, tx_g, tx_d)
    step = jax.jit(
        make_vq_train_step(cfg, tx_g, tx_d, lp, disc_start=2, disc_weight=0.5)
    )
    imgs = jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    )
    recs = []
    for _ in range(5):
        state, m = step(state, imgs)
        recs.append(float(m["rec_loss"]))
        assert np.isfinite(list(m.values())).all()
    assert recs[-1] < recs[0]


def test_adaptive_disc_weight_matches_direct_grads():
    """calculate_adaptive_weight through the trunk split equals the grad-norm
    ratio computed by differentiating the FULL decode path w.r.t. the last
    decoder conv weight (the torch reference's autograd.grad semantics,
    ref vq_loss.py:109-115), and it reacts to loss scaling as 1/s."""
    from controlar_tpu.train import vq_loss as L
    from controlar_tpu.ops.conv import conv2d

    cfg = VQConfig(codebook_size=64, codebook_embed_dim=8, z_channels=16, ch=16)
    rng = jax.random.PRNGKey(3)
    vq_params = jvq.init_vq_params(rng, cfg)
    disc_params = init_patchgan_params(rng, ndf=16)
    lp = init_lpips_params(rng)
    imgs = jnp.asarray(
        np.random.default_rng(5).uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    )

    # repo path: inside generator_loss with disc_adaptive_weight=True
    _, (metrics, _) = L.generator_loss(
        vq_params, disc_params, lp, cfg, imgs, jnp.asarray(10), disc_start=0,
        disc_adaptive_weight=True,
    )
    got = float(metrics["disc_adaptive_weight"])

    # direct check: differentiate the FULL decode w.r.t. conv_out weight only
    z_q, _, _ = L.quantize_with_losses(
        vq_params, cfg,
        conv2d(jvq.encoder_forward(vq_params["encoder"], cfg, imgs),
               vq_params["quant_conv"]["w"], vq_params["quant_conv"]["b"]),
    )

    def full_decode(w):
        import copy
        p2 = jax.tree.map(lambda a: a, vq_params)  # shallow-rebuild the tree
        dec = dict(p2["decoder"])
        dec["conv_out"] = dict(dec["conv_out"], w=w)
        p2 = dict(p2, decoder=dec)
        return jvq.decode(p2, cfg, z_q)

    from controlar_tpu.models.lpips import lpips as lpips_fn
    from controlar_tpu.models.discriminators import patchgan_forward

    def nll(w):
        r = full_decode(w)
        return jnp.mean((imgs - r) ** 2) + jnp.mean(lpips_fn(lp, imgs, r))

    def gadv(w):
        return L.hinge_gen_loss(patchgan_forward(disc_params, full_decode(w)))

    w0 = vq_params["decoder"]["conv_out"]["w"]
    expect = float(
        jnp.linalg.norm(jax.grad(nll)(w0).ravel())
        / (jnp.linalg.norm(jax.grad(gadv)(w0).ravel()) + 1e-4)
    )
    np.testing.assert_allclose(got, expect, rtol=1e-4)

    # scaling the adversarial logits scales the weight inversely; clip holds
    w = L.calculate_adaptive_weight(lambda w: 2.0 * nll(w), gadv, w0)
    np.testing.assert_allclose(float(w), 2 * expect, rtol=1e-4)
    w = L.calculate_adaptive_weight(lambda w: 1e9 * nll(w), gadv, w0)
    assert float(w) == 1e4  # clipped (ref clamp 0..1e4)


def test_vq_train_step_stylegan_adaptive_runs():
    """StyleGAN discriminator + adaptive weight through a jitted train step."""
    from controlar_tpu.models.discriminators import init_stylegan_disc_params

    cfg = VQConfig(codebook_size=64, codebook_embed_dim=8, z_channels=16, ch=16)
    rng = jax.random.PRNGKey(0)
    vq_params = jvq.init_vq_params(rng, cfg)
    disc_params = init_stylegan_disc_params(rng, image_size=32)
    lp = init_lpips_params(rng)
    tx_g = make_optimizer(lr=1e-3)
    tx_d = make_optimizer(lr=1e-3)
    state = init_vq_train_state(vq_params, disc_params, tx_g, tx_d)
    step = jax.jit(make_vq_train_step(
        cfg, tx_g, tx_d, lp, disc_start=1, disc_weight=0.5,
        disc_type="stylegan", disc_adaptive_weight=True,
    ))
    imgs = jnp.asarray(
        np.random.default_rng(2).uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    )
    for _ in range(3):
        state, m = step(state, imgs)
        assert np.isfinite(list(m.values())).all()
    assert float(m["disc_adaptive_weight"]) > 0
