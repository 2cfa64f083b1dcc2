"""FFHQ-mode TriplaneVAE: fg/bg split renderer + StyleGAN-modulated SR.

Covers the BASELINE config[2] model family (reference
``Triplane_fg_bg_plane`` + ``SuperresolutionHybrid``): mono encoder,
channel-split planes, NeRF++ background composite, w-modulated SR head.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from ln3diff_tpu.models.vae import TriplaneVAE
from ln3diff_tpu.render.renderer import RenderOptions
from tests.test_models import small_vae_cfg


def ffhq_small_cfg():
    return small_vae_cfg(
        encoder_in_channels=3, num_views=0, plane_channels=8,
        decoder_output_dim=8, use_sr=True, sr_ratio=2,
        sr_module='stylegan', use_background=True, bg_depth_resolution=4)


class TestFFHQVAE:

    def test_autoencode_with_bg_and_stylegan_sr(self):
        cfg = ffhq_small_cfg()
        vae = TriplaneVAE(cfg)
        rng = np.random.default_rng(0)
        B = 2
        imgs = jnp.asarray(rng.uniform(-1, 1, (B, 32, 32, 3)), jnp.float32)
        cam = jnp.zeros((B, 25)).at[:, [0, 5, 10, 15]].set(1.0) \
            .at[:, [16, 20, 24]].set(1.0).at[:, 11].set(2.7)
        opts = RenderOptions(depth_resolution=4,
                             depth_resolution_importance=4,
                             ray_start=2.25, ray_end=3.3, box_warp=1.0,
                             white_back=False, deterministic=True)
        variables = vae.init(jax.random.PRNGKey(0), imgs, cam, opts, 8)
        out = vae.apply(variables, imgs, cam, opts, 8,
                        jax.random.PRNGKey(1))
        assert out['image_raw'].shape == (B, 8, 8, 3)
        assert out['image_sr'].shape == (B, 16, 16, 3)
        for k in ('image_raw', 'image_sr', 'image_depth', 'image_mask'):
            assert np.isfinite(np.asarray(out[k])).all(), k
        # planes carry fg|bg split channels
        assert out['planes'].shape[-1] == cfg.plane_channels

    def test_query_points_uses_fg_half(self):
        cfg = ffhq_small_cfg()
        vae = TriplaneVAE(cfg)
        rng = np.random.default_rng(1)
        planes = jnp.asarray(rng.standard_normal((1, 3, 8, 8, 8)),
                             jnp.float32)
        coords = jnp.asarray(rng.uniform(-0.4, 0.4, (1, 16, 3)),
                             jnp.float32)
        variables = vae.init(jax.random.PRNGKey(0), planes, coords, 1.0,
                             method=vae.query_points)
        rgb, sigma = vae.apply(variables, planes, coords, 1.0,
                               method=vae.query_points)
        assert rgb.shape[:2] == (1, 16) and sigma.shape == (1, 16, 1)
        # fg-only: zeroing the bg half must not change the query
        planes_bgzero = planes.at[..., 4:].set(0.0)
        rgb2, sigma2 = vae.apply(variables, planes_bgzero, coords, 1.0,
                                 method=vae.query_points)
        np.testing.assert_allclose(np.asarray(rgb2), np.asarray(rgb),
                                   atol=1e-6)

    def test_ffhq_preset_shapes(self):
        from ln3diff_tpu.config import vae_preset
        from ln3diff_tpu.models.vae_shapenet import FFHQVAEConfig
        cfg = vae_preset('ffhq')     # released 4XC_final arch
        assert isinstance(cfg, FFHQVAEConfig)
        assert cfg.latent_size == 16 and cfg.latent_channels == 12
        assert cfg.sr_module == 'stylegan-8xdc'
        # fg/bg split capability kept under its own preset
        fgbg = vae_preset('ffhq-fgbg')
        assert fgbg.use_background and fgbg.sr_module == 'stylegan'
        assert fgbg.plane_channels == 64 and fgbg.num_views == 0
