"""Adversarial VAE training: patch discriminator, adaptive weight, R1.

Rewrite of the reference GAN machinery
(``nsr/losses/builder.py:866`` ``E3DGE_with_AdvLoss``,
``nsr/losses/disc.py``, ``dnnlib/util.py:41`` ``calculate_adaptive_weight``,
``nsr/train_util_cvD.py`` / ``nsr/cvD/nvsD_canoD.py`` dual-discriminator
loops, ``nsr/dual_discriminator.py``).  The reference's separate
discriminator DDP/optimizer stack collapses into a second TrainState and
two pure loss functions; R1 uses plain JAX autodiff (no
``conv2d_gradfix`` double-backward workaround needed).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..models.stylegan import DiscriminatorConfig, StyleGANDiscriminator
from .augment import AugmentConfig, augment_pipe, update_ada_p
from .train_state import TrainState, create_train_state, make_optimizer


@dataclasses.dataclass(frozen=True)
class GANConfig:
    disc: DiscriminatorConfig = DiscriminatorConfig()
    disc_lr: float = 2e-4
    adv_lambda: float = 0.01          # reference nv_patchD lambda
    r1_gamma: float = 1.0
    disc_start_step: int = 0          # delay (reference delay iter)
    adaptive_weight: bool = False     # scale by grad-norm ratio
    # Adaptive discriminator augmentation (reference vendors
    # nsr/augment.py for this; see training/augment.py).  None = off.
    ada: AugmentConfig | None = None
    ada_target: float = 0.6
    ada_interval: int = 4
    ada_kimg: float = 500.0


def hinge_d_loss(logits_real: jax.Array, logits_fake: jax.Array):
    """Hinge discriminator loss (reference disc.py)."""
    return (jnp.mean(jax.nn.relu(1.0 - logits_real))
            + jnp.mean(jax.nn.relu(1.0 + logits_fake)))


def vanilla_g_loss(logits_fake: jax.Array):
    """Non-saturating generator loss: -E[D(fake)] (hinge-G)."""
    return -jnp.mean(logits_fake)


def r1_penalty(disc_apply: Callable, disc_params, real: jax.Array):
    """R1 gradient penalty via JAX autodiff (the reference needs
    conv2d_gradfix for the same double-backward on CUDA)."""
    def d_sum(img):
        return jnp.sum(disc_apply(disc_params, img))

    grads = jax.grad(d_sum)(real)
    return jnp.mean(jnp.sum(jnp.square(grads), axis=(1, 2, 3)))


def calculate_adaptive_weight(nll_grad_norm, g_grad_norm,
                              max_weight: float = 1e4):
    """reference ``dnnlib/util.py:41``: balance adversarial vs rec loss by
    last-layer gradient norms."""
    w = nll_grad_norm / (g_grad_norm + 1e-4)
    return jnp.clip(w, 0.0, max_weight)


class AdversarialHead:
    """Owns the discriminator state and exposes the two loss terms.

    Usage inside a trainer:
      g_adv = head.generator_loss(d_state, fake_imgs)   # add to rec loss
      d_state, d_metrics = head.disc_step(d_state, real, fake)
    """

    def __init__(self, cfg: GANConfig = GANConfig(), seed: int = 0):
        self.cfg = cfg
        self.model = StyleGANDiscriminator(cfg.disc)
        key = jax.random.PRNGKey(seed)
        dummy = jnp.zeros((1, cfg.disc.img_resolution,
                           cfg.disc.img_resolution, cfg.disc.img_channels))
        params = jax.jit(self.model.init)(key, dummy)['params']
        tx = make_optimizer(cfg.disc_lr, weight_decay=0.0, grad_clip=None,
                            betas=(0.0, 0.99))
        self.state = create_train_state(params, tx)
        # ADA controller state (host side): current strength + running
        # mean of sign(D(real)) between controller updates.
        self.ada_p = 0.0
        self._ada_signs: list = []
        self._ada_key = jax.random.PRNGKey(seed + 1)
        self._num_d_steps = 0

        def maybe_aug(key, img, p):
            if cfg.ada is None:
                return img
            return augment_pipe(key, img, cfg.ada, p)

        def apply(params, img):
            return self.model.apply({'params': params}, img)

        self._apply = apply

        def g_loss_fn(params, fake, key, p):
            # G trains through the same augmented D it is judged by.
            return vanilla_g_loss(apply(params, maybe_aug(key, fake, p)))

        self._g_loss = jax.jit(g_loss_fn)

        def d_loss_fn(params, real, fake, key, p):
            kr, kf = jax.random.split(key)
            real = maybe_aug(kr, real, p)
            lr = apply(params, real)
            lf = apply(params, maybe_aug(
                kf, jax.lax.stop_gradient(fake), p))
            loss = hinge_d_loss(lr, lf)
            r1 = r1_penalty(apply, params, real)
            total = loss + 0.5 * cfg.r1_gamma * r1
            return total, {'d_loss': loss, 'r1': r1,
                           'logits_real': lr.mean(),
                           'logits_fake': lf.mean(),
                           'real_sign': jnp.sign(lr).mean()}

        self._d_step = jax.jit(
            lambda state, real, fake, key, p: _apply_d_step(
                state, real, fake, key, p, d_loss_fn))

    def _next_key(self):
        self._ada_key, sub = jax.random.split(self._ada_key)
        return sub

    def generator_loss(self, fake: jax.Array) -> jax.Array:
        """Adversarial term for the VAE/generator update (uses the current
        discriminator params, stop-gradient on D)."""
        return self.cfg.adv_lambda * self._g_loss(
            jax.lax.stop_gradient(self.state.params), fake,
            self._next_key(), self.ada_p)

    def disc_step(self, real: jax.Array, fake: jax.Array):
        self.state, metrics = self._d_step(self.state, real, fake,
                                           self._next_key(), self.ada_p)
        self._num_d_steps += 1
        if self.cfg.ada is not None:
            self._ada_signs.append(metrics['real_sign'])
            if self._num_d_steps % self.cfg.ada_interval == 0:
                r_t = float(jnp.mean(jnp.stack(self._ada_signs)))
                self.ada_p = float(update_ada_p(
                    self.ada_p, r_t, batch_size=real.shape[0],
                    ada_target=self.cfg.ada_target,
                    ada_interval=self.cfg.ada_interval,
                    ada_kimg=self.cfg.ada_kimg))
                self._ada_signs = []
            metrics = dict(metrics, ada_p=self.ada_p)
        return metrics


def _apply_d_step(state: TrainState, real, fake, key, p, d_loss_fn):
    (loss, metrics), grads = jax.value_and_grad(
        d_loss_fn, has_aux=True)(state.params, real, fake, key, p)
    new_state = state.apply_gradients(grads)
    return new_state, dict(metrics, d_total=loss)
