"""LGM MVUNet family: shapes, view mixing, and the TriplaneVAE
'lgm' encoder path."""

import numpy as np
import jax
import jax.numpy as jnp

from ln3diff_tpu.models.mv_unet import (LGMMVEncoder, MVAttention,
                                        MVUNet, MVUNetConfig)


class TestMVUNet:

    def test_unet_asymmetric_shapes(self):
        cfg = MVUNetConfig(in_channels=9, out_channels=14,
                           down_channels=(32, 64, 128),
                           down_attention=(False, False, True),
                           up_channels=(128, 64),
                           up_attention=(True, False),
                           layers_per_block=1, num_frames=2)
        m = MVUNet(cfg)
        x = jnp.ones((2 * 2, 32, 32, 9))
        params = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(params, x)
        # 2 downsamples, 1 upsample -> half the input resolution
        assert y.shape == (4, 16, 16, 14)
        assert jnp.isfinite(y).all()

    def test_mv_attention_mixes_views(self):
        m = MVAttention(dim=32, num_heads=4, num_frames=2)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 32)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(1), x)
        y0 = m.apply(params, x)
        # perturb ONLY view 1 (non-constant — a constant offset would be
        # cancelled by GroupNorm); view 0's output must change (joint attn)
        bump = jnp.asarray(rng.normal(size=(8, 8, 32)).astype(np.float32))
        x2 = x.at[1].add(bump)
        y1 = m.apply(params, x2)
        assert float(jnp.abs(y1[0] - y0[0]).max()) > 1e-4

    def test_lgm_encoder_moments_shape(self):
        cfg = MVUNetConfig(in_channels=10, down_channels=(32, 64, 128),
                           down_attention=(False, False, True),
                           num_frames=4)
        enc = LGMMVEncoder(cfg, z_channels=12, double_z=True)
        x = jnp.ones((1 * 4, 64, 64, 10))
        params = enc.init(jax.random.PRNGKey(0), x)
        y = enc.apply(params, x)
        # 2 downsamples; views fused away; 2*z moment channels
        assert y.shape == (1, 16, 16, 24)
        assert jnp.isfinite(y).all()

    def test_triplane_vae_lgm_encoder(self):
        from test_models import small_vae_cfg
        from ln3diff_tpu.models.vae import TriplaneVAE
        cfg = small_vae_cfg(encoder_type='lgm',
                            lgm_down_channels=(32, 64),
                            lgm_down_attention=(False, True))
        model = TriplaneVAE(cfg)
        imgs = jnp.ones((2 * 2, 32, 32, 10)) * 0.1
        params = model.init(jax.random.PRNGKey(0), imgs,
                            method=TriplaneVAE.encode)
        moments = model.apply(params, imgs, method=TriplaneVAE.encode)
        assert moments.shape == (2, 16, 16, 8, 3)
        assert jnp.isfinite(moments).all()
