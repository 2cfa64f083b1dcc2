"""fg/bg renderer tests."""

import numpy as np
import jax
import jax.numpy as jnp

from ln3diff_tpu.render.background import (depth2pts_outside,
                                           render_rays_fg_bg)
from ln3diff_tpu.render.renderer import RenderOptions


class TestDepth2Pts:

    def test_points_on_unit_sphere_at_depth1(self):
        """depth=1 (sphere surface): xyz part has unit norm and real depth
        equals the sphere-intersection distance."""
        o = jnp.asarray([[0.0, 0, -0.5]])
        d = jnp.asarray([[0.0, 0, 1.0]])
        pts, depth_real = depth2pts_outside(o, d, jnp.asarray([1.0]))
        xyz = np.asarray(pts)[0, :3]
        np.testing.assert_allclose(np.linalg.norm(xyz), 1.0, atol=1e-5)

    def test_smaller_depth_is_farther(self):
        o = jnp.asarray([[0.0, 0, -0.5]])
        d = jnp.asarray([[0.0, 0, 1.0]])
        _, d1 = depth2pts_outside(o, d, jnp.asarray([0.9]))
        _, d2 = depth2pts_outside(o, d, jnp.asarray([0.3]))
        assert float(d2[0]) > float(d1[0])


class TestFgBg:

    def test_composition_shapes_and_background_fill(self):
        B, R, C = 1, 16, 8
        planes = jnp.asarray(np.random.default_rng(0).standard_normal(
            (B, 3, 8, 8, 2 * C)).astype(np.float32) * 0.1)
        o = jnp.concatenate([jnp.zeros((B, R, 2)),
                             -2 * jnp.ones((B, R, 1))], -1)
        d = jnp.broadcast_to(jnp.asarray([0.0, 0, 1.0]), (B, R, 3))
        opts = RenderOptions(depth_resolution=8,
                             depth_resolution_importance=8,
                             ray_start=1.0, ray_end=3.0, box_warp=1.0,
                             white_back=False, deterministic=True)

        def fg_decoder(feats, dirs):
            x = jnp.mean(feats, axis=1)
            # empty foreground: huge negative sigma
            return jax.nn.sigmoid(x[..., 1:]), x[..., :1] - 100.0

        def bg_decoder(feats, dirs):
            x = jnp.mean(feats, axis=1)
            # solid background
            return jnp.ones_like(x[..., 1:]) * 0.75, x[..., :1] + 50.0

        out = render_rays_fg_bg(None, planes, fg_decoder, bg_decoder, o, d,
                                opts)
        assert out.feature_samples.shape == (B, R, C - 1)
        img = np.asarray(out.feature_samples)
        # fg empty → composite ≈ bg color (0.75 → *2-1 = 0.5)
        np.testing.assert_allclose(img, 0.5, atol=0.05)


def test_fgbg_fused_osg_matches_plain():
    """use_fused_osg on the fg/bg split: the fused fg pipeline (reference
    fallback math on CPU) must match the plain decoder path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ln3diff_tpu.config import vae_preset
    from ln3diff_tpu.models.vae import TriplaneVAE, TriplaneVAEConfig
    from ln3diff_tpu.models.dit import DiT2Config
    from ln3diff_tpu.render.renderer import RenderOptions

    cfg = TriplaneVAEConfig(
        encoder_in_channels=10, encoder_ch=8, encoder_ch_mult=(1, 2),
        encoder_res_blocks=1, img_resolution=32, num_views=2,
        ldm_z_channels=4, latent_size=16,
        dit2=DiT2Config(tokens_per_plane=64, hidden_size=32, depth=2,
                        num_heads=2, dtype=jnp.float32),
        patch_size=2, conv_sr_ch=8, conv_sr_ch_mult=(1, 2),
        conv_sr_res_blocks=1, plane_channels=16, decoder_output_dim=8,
        use_background=True, bg_depth_resolution=4, dtype=jnp.float32)
    vae = TriplaneVAE(cfg)
    opts = RenderOptions(depth_resolution=4, depth_resolution_importance=4,
                         ray_start=2.25, ray_end=3.3, box_warp=1.0,
                         white_back=False, deterministic=True)
    planes = jax.random.normal(jax.random.PRNGKey(0),
                               (1, 3, 16, 16, 16)) * 0.3
    cam = jnp.zeros((1, 25)).at[:, 0].set(1).at[:, 5].set(1) \
        .at[:, 10].set(1).at[:, 15].set(1).at[:, 16].set(1) \
        .at[:, 20].set(1).at[:, 11].set(2.7).at[:, 24].set(1)
    variables = vae.init(jax.random.PRNGKey(1), planes, cam, opts, 8, None,
                         method=vae.render)
    plain = vae.apply(variables, planes, cam, opts, 8, None,
                      use_fused_osg=False, method=vae.render)
    fused = vae.apply(variables, planes, cam, opts, 8, None,
                      use_fused_osg=True, method=vae.render)
    np.testing.assert_allclose(np.asarray(fused['image_raw']),
                               np.asarray(plain['image_raw']),
                               rtol=1e-4, atol=1e-5)
