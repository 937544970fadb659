"""Poisson GAN: patch discriminator + adversarial training utilities.

Capability parity with the reference's legacy GAN experiment
(`poisson_CNN/models/legacy/Poisson_GAN.py:10-106`: a conv discriminator over
[solution, rhs] pairs and a trainer combining supervised and adversarial
losses). Usable with any generator in the model zoo (HPNN, UNet, ...).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

from ..layers import PadConv, spatial_pyramid_pool


@dataclasses.dataclass(frozen=True)
class DiscriminatorConfig:
    filters: Tuple[int, ...] = (16, 32, 64)
    kernel_size: int = 4
    spp_levels: Tuple = (2, 4)
    mlp_units: Tuple[int, ...] = (64,)


class PoissonDiscriminator(nn.Module):
    """Conv + SPP discriminator over [candidate solution, rhs] pairs; SPP makes
    it variable-grid capable like the rest of the framework. Returns logits."""

    cfg: DiscriminatorConfig = DiscriminatorConfig()

    @nn.compact
    def __call__(self, soln: jax.Array, rhs: jax.Array) -> jax.Array:
        h = jnp.concatenate([soln, rhs], axis=-1)
        for f in self.cfg.filters:
            h = PadConv(f, self.cfg.kernel_size, "leaky_relu", strides=2)(h)
        feats = spatial_pyramid_pool(h, self.cfg.spp_levels)
        for u in self.cfg.mlp_units:
            feats = jax.nn.leaky_relu(nn.Dense(u)(feats))
        return nn.Dense(1)(feats)[:, 0]  # (B,) logits


def gan_loss_fns(adversarial_weight: float = 1e-2):
    """Non-saturating GAN losses (generator: supervised + adversarial)."""

    def generator_loss(disc_logits_fake, pred, target):
        supervised = jnp.mean((pred - target) ** 2)
        adv = jnp.mean(
            optax.sigmoid_binary_cross_entropy(
                disc_logits_fake, jnp.ones_like(disc_logits_fake)
            )
        )
        return supervised + adversarial_weight * adv

    def discriminator_loss(logits_real, logits_fake):
        real = optax.sigmoid_binary_cross_entropy(
            logits_real, jnp.ones_like(logits_real)
        )
        fake = optax.sigmoid_binary_cross_entropy(
            logits_fake, jnp.zeros_like(logits_fake)
        )
        return jnp.mean(real) + jnp.mean(fake)

    return generator_loss, discriminator_loss


def make_gan_train_step(
    generator_apply: Callable,
    discriminator: PoissonDiscriminator,
    gen_tx: optax.GradientTransformation,
    disc_tx: optax.GradientTransformation,
    adversarial_weight: float = 1e-2,
):
    """Alternating GAN step: ((gen_params, gen_opt), (disc_params, disc_opt),
    batch) -> updated states + metrics. batch: {'rhs', 'soln', 'dx'}."""
    gen_loss_fn, disc_loss_fn = gan_loss_fns(adversarial_weight)

    @jax.jit
    def step(gen_params, gen_opt, disc_params, disc_opt, batch):
        rhs, soln, dx = batch["rhs"], batch["soln"], batch["dx"]

        def d_loss(dp):
            pred = generator_apply(gen_params, rhs, dx)
            logits_real = discriminator.apply(dp, soln, rhs)
            logits_fake = discriminator.apply(dp, jax.lax.stop_gradient(pred), rhs)
            return disc_loss_fn(logits_real, logits_fake)

        dl, dgrads = jax.value_and_grad(d_loss)(disc_params)
        dupdates, disc_opt = disc_tx.update(dgrads, disc_opt, disc_params)
        disc_params = optax.apply_updates(disc_params, dupdates)

        def g_loss(gp):
            pred = generator_apply(gp, rhs, dx)
            logits_fake = discriminator.apply(disc_params, pred, rhs)
            return gen_loss_fn(logits_fake, pred, soln)

        gl, ggrads = jax.value_and_grad(g_loss)(gen_params)
        gupdates, gen_opt = gen_tx.update(ggrads, gen_opt, gen_params)
        gen_params = optax.apply_updates(gen_params, gupdates)
        return gen_params, gen_opt, disc_params, disc_opt, {
            "gen_loss": gl, "disc_loss": dl,
        }

    return step
