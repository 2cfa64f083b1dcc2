"""Adversarial head + adversarial VAE trainer tests."""

import numpy as np
import jax
import jax.numpy as jnp

from ln3diff_tpu.models.stylegan import (DiscriminatorConfig,
                                         PixelUnshuffleUpsample,
                                         filtered_lrelu)
from ln3diff_tpu.training.gan import (AdversarialHead, GANConfig,
                                      calculate_adaptive_weight,
                                      hinge_d_loss, r1_penalty)


class TestGANLosses:

    def test_hinge_loss_separates(self):
        good = hinge_d_loss(jnp.full((4, 1), 5.0), jnp.full((4, 1), -5.0))
        bad = hinge_d_loss(jnp.full((4, 1), -5.0), jnp.full((4, 1), 5.0))
        assert float(good) < float(bad)
        assert float(good) == 0.0

    def test_adaptive_weight_clipped(self):
        w = calculate_adaptive_weight(jnp.asarray(1e9), jnp.asarray(1e-9))
        assert float(w) <= 1e4

    def test_adversarial_head_steps(self):
        head = AdversarialHead(GANConfig(
            disc=DiscriminatorConfig(img_resolution=16, base_channels=8,
                                     max_channels=16),
            disc_lr=1e-3, r1_gamma=0.1))
        rng = np.random.default_rng(0)
        real = jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 3)
                                       ).astype(np.float32))
        fake = jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 3)
                                       ).astype(np.float32))
        g_loss0 = float(head.generator_loss(fake))
        metrics = head.disc_step(real, fake)
        assert np.isfinite(float(metrics['d_total']))
        assert np.isfinite(float(metrics['r1']))
        # D update changed params → generator loss changes
        g_loss1 = float(head.generator_loss(fake))
        assert g_loss0 != g_loss1

    def test_adversarial_head_with_ada(self):
        from ln3diff_tpu.training.augment import bgc_config
        head = AdversarialHead(GANConfig(
            disc=DiscriminatorConfig(img_resolution=16, base_channels=8,
                                     max_channels=16),
            disc_lr=1e-3, r1_gamma=0.1,
            ada=bgc_config(), ada_interval=2, ada_kimg=0.01))
        head.ada_p = 0.5
        rng = np.random.default_rng(2)
        real = jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 3)
                                       ).astype(np.float32))
        fake = jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 3)
                                       ).astype(np.float32))
        assert np.isfinite(float(head.generator_loss(fake)))
        m1 = head.disc_step(real, fake)
        assert np.isfinite(float(m1['d_total']))
        p_before = m1['ada_p']
        m2 = head.disc_step(real, fake)   # controller fires (interval=2)
        # tiny ada_kimg → p moves on the first controller update
        assert m2['ada_p'] != p_before
        assert 0.0 <= m2['ada_p'] <= 1.0

    def test_r1_positive(self):
        head = AdversarialHead(GANConfig(
            disc=DiscriminatorConfig(img_resolution=16, base_channels=8,
                                     max_channels=16)))
        real = jnp.asarray(np.random.default_rng(1).uniform(
            -1, 1, (2, 16, 16, 3)).astype(np.float32))
        r1 = r1_penalty(head._apply, head.state.params, real)
        assert float(r1) > 0


class TestNewOps:

    def test_filtered_lrelu_shapes(self):
        x = jnp.ones((1, 8, 8, 4))
        y = filtered_lrelu(x, up=2, down=2)
        assert y.shape == (1, 8, 8, 4)
        y2 = filtered_lrelu(x, up=2, down=1)
        assert y2.shape == (1, 16, 16, 4)

    def test_pixel_unshuffle_upsample(self):
        m = PixelUnshuffleUpsample(num_feat=8, num_out_ch=3, sr_ratio=4)
        x = jnp.ones((1, 8, 8, 6))
        params = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(params, x)
        assert y.shape == (1, 32, 32, 3)
