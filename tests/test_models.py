"""Model-stack tests: shapes, init, forward, roll-out equivariance."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ln3diff_tpu.models.dit import (DiT2, DiT2Config, DiT_TriLatent,
                                    DiTConfig, dit_registry, dit2_registry,
                                    get_2d_sincos_pos_embed)
from ln3diff_tpu.models.sd_vae import (AutoencoderConfig, Decoder, Encoder,
                                       MVEncoder)
from ln3diff_tpu.models.vae import TriplaneVAE, TriplaneVAEConfig
from ln3diff_tpu.models.dit import DiT2Config
from ln3diff_tpu.render.renderer import RenderOptions
from ln3diff_tpu.render.ray_sampler import pack_25d_camera


def small_vae_cfg(**kw):
    defaults = dict(
        encoder_in_channels=10, encoder_ch=8, encoder_ch_mult=(1, 2),
        encoder_res_blocks=1, img_resolution=32, num_views=2,
        ldm_z_channels=4, latent_size=16,
        dit2=DiT2Config(tokens_per_plane=64, hidden_size=32, depth=2,
                        num_heads=2, dtype=jnp.float32),
        patch_size=2, conv_sr_ch=8, conv_sr_ch_mult=(1, 2),
        conv_sr_res_blocks=1, plane_channels=8, decoder_output_dim=8,
        dtype=jnp.float32)
    defaults.update(kw)
    return TriplaneVAEConfig(**defaults)


class TestSDVAE:

    def test_encoder_shapes(self):
        cfg = AutoencoderConfig(ch=8, ch_mult=(1, 2, 4), num_res_blocks=1,
                                resolution=64, z_channels=12)
        enc = Encoder(cfg)
        x = jnp.zeros((2, 64, 64, 10))
        params = enc.init(jax.random.PRNGKey(0), x)
        y = enc.apply(params, x)
        assert y.shape == (2, 16, 16, 24)  # /4 downsample, 2z

    def test_decoder_shapes(self):
        cfg = AutoencoderConfig(ch=8, ch_mult=(1, 2, 2), num_res_blocks=1,
                                resolution=64, z_channels=16, out_ch=32)
        dec = Decoder(cfg)
        z = jnp.zeros((2, 16, 16, 16))
        params = dec.init(jax.random.PRNGKey(0), z)
        y = dec.apply(params, z)
        assert y.shape == (2, 64, 64, 32)  # x4 upsample

    def test_mv_encoder_fuses_views(self):
        cfg = AutoencoderConfig(ch=8, ch_mult=(1, 2), num_res_blocks=1,
                                resolution=32, z_channels=12)
        enc = MVEncoder(cfg, num_frames=4)
        x = jnp.zeros((8, 32, 32, 10))  # B=2, V=4
        params = enc.init(jax.random.PRNGKey(0), x)
        y = enc.apply(params, x)
        assert y.shape == (2, 16, 16, 24)


class TestDiT:

    def _ctx(self, B, variant, hidden):
        ctx = {}
        if variant in ('text', 'pixelart-text'):
            ctx['crossattn'] = jnp.ones((B, 77, 768))
        if variant == 'image-pixelart':
            ctx['crossattn'] = jnp.ones((B, 257, 1024))
            ctx['dino'] = jnp.ones((B, 10, 768))
        if variant in ('pixelart-text', 'image-pixelart'):
            ctx['vector'] = jnp.ones((B, 768))
        return ctx

    @pytest.mark.parametrize('variant', ['text', 'pixelart-text',
                                         'image-pixelart'])
    def test_denoiser_forward(self, variant):
        cfg = DiTConfig(input_size=8, patch_size=2, in_channels=4,
                        hidden_size=64, depth=2, num_heads=2,
                        variant=variant,
                        context_dim=1024 if variant == 'image-pixelart'
                        else 768,
                        pooled_vector_dim=768 if variant != 'text' else 0,
                        t2i_final=variant != 'text', dtype=jnp.float32)
        model = DiT_TriLatent(cfg)
        B = 2
        x = jnp.ones((B, 8, 8, 12))
        t = jnp.array([0.5, 0.9])
        ctx = self._ctx(B, variant, 64)
        variables = model.init(jax.random.PRNGKey(0), x, t, ctx)
        y = model.apply(variables, x, t, ctx)
        assert y.shape == x.shape
        assert y.dtype == jnp.float32
        assert np.isfinite(np.asarray(y)).all()

    def test_zero_init_final_layer(self):
        """adaLN-zero: at init the final output must be exactly zero."""
        cfg = DiTConfig(input_size=8, patch_size=2, in_channels=4,
                        hidden_size=64, depth=2, num_heads=2, variant='text',
                        dtype=jnp.float32)
        model = DiT_TriLatent(cfg)
        x = jnp.ones((2, 8, 8, 12))
        t = jnp.array([0.1, 0.2])
        ctx = {'crossattn': jnp.ones((2, 77, 768))}
        variables = model.init(jax.random.PRNGKey(0), x, t, ctx)
        y = model.apply(variables, x, t, ctx)
        np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-6)

    @pytest.mark.parametrize('policy', ['full', 'dots'])
    def test_remat_gradients_identical(self, policy):
        """Scanned-block remat (both policies) must be a pure memory
        trade: gradients bitwise-equal to the non-remat model.  Params
        are perturbed off the adaLN-zero saddle first."""
        import dataclasses
        cfg = DiTConfig(input_size=8, patch_size=2, in_channels=4,
                        hidden_size=64, depth=4, num_heads=2,
                        variant='text', dtype=jnp.float32)
        m0 = DiT_TriLatent(cfg)
        m1 = DiT_TriLatent(dataclasses.replace(cfg, remat=True,
                                               remat_policy=policy))
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 12))
        t = jnp.array([3.0, 7.0])
        ctx = {'crossattn': jax.random.normal(jax.random.PRNGKey(1),
                                              (2, 77, 768))}
        v = m0.init(jax.random.PRNGKey(2), x, t, ctx)
        v = jax.tree_util.tree_map(
            lambda a: a + 0.01 * jnp.ones_like(a), v)

        g0 = jax.grad(lambda p: jnp.sum(m0.apply(p, x, t, ctx) ** 2))(v)
        g1 = jax.grad(lambda p: jnp.sum(m1.apply(p, x, t, ctx) ** 2))(v)
        # the recompute fuses differently, reassociating a few f32 ops —
        # agreement is ulp-level, not bitwise
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-8)

    def test_dit2_forward(self):
        cfg = DiT2Config(tokens_per_plane=16, hidden_size=32, depth=4,
                         num_heads=2, dtype=jnp.float32)
        model = DiT2(cfg)
        c = jnp.ones((2, 48, 32))
        variables = model.init(jax.random.PRNGKey(0), c)
        y = model.apply(variables, c)
        assert y.shape == (2, 48, 32)

    def test_sincos_pos_embed_tuple_grid(self):
        pe = get_2d_sincos_pos_embed(64, (3, 16))
        assert pe.shape == (48, 64)
        # plane axis varies slower than token axis; rows within a plane
        # share the plane-half embedding.
        assert not np.allclose(pe[0], pe[16])


class TestTriplaneVAE:

    def test_end_to_end_shapes(self):
        cfg = small_vae_cfg()
        model = TriplaneVAE(cfg)
        B, V = 2, 2
        imgs = jnp.ones((B * V, 32, 32, 10)) * 0.1
        c2w = np.eye(4, dtype=np.float32)[None].repeat(B, 0)
        c2w[:, 2, 3] = -2.0
        intr = np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]],
                        np.float32)[None].repeat(B, 0)
        cam = pack_25d_camera(jnp.asarray(c2w), jnp.asarray(intr))
        opts = RenderOptions(depth_resolution=8, depth_resolution_importance=8,
                             ray_start='auto', ray_end='auto', box_warp=1.0)

        variables = model.init(jax.random.PRNGKey(0), imgs, cam, opts, 16,
                               jax.random.PRNGKey(1))
        out = model.apply(variables, imgs, cam, opts, 16,
                          jax.random.PRNGKey(1))
        assert out['latent'].shape == (B, 16, 16, 12)
        # plane resolution: (16/2 tokens) * 2^(2-1) = 16
        assert out['planes'].shape == (B, 3, 16, 16, 8)
        assert out['image_raw'].shape == (B, 16, 16, 3)
        assert out['posterior_kl'].shape == (B,)
        assert np.isfinite(np.asarray(out['image_raw'])).all()

    def test_jit_and_grad(self):
        cfg = small_vae_cfg()
        model = TriplaneVAE(cfg)
        B, V = 1, 2
        imgs = jnp.ones((B * V, 32, 32, 10)) * 0.1
        c2w = np.eye(4, dtype=np.float32)[None]
        c2w[:, 2, 3] = -2.0
        intr = np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]],
                        np.float32)[None]
        cam = pack_25d_camera(jnp.asarray(c2w), jnp.asarray(intr))
        opts = RenderOptions(depth_resolution=6, depth_resolution_importance=6,
                             ray_start='auto', ray_end='auto', box_warp=1.0)
        variables = model.init(jax.random.PRNGKey(0), imgs, cam, opts, 8,
                               jax.random.PRNGKey(1))
        target = jnp.zeros((B, 8, 8, 3))

        @jax.jit
        def loss_fn(params):
            out = model.apply({'params': params, **{k: v for k, v in
                                                    variables.items()
                                                    if k != 'params'}},
                              imgs, cam, opts, 8, jax.random.PRNGKey(1))
            return jnp.mean((out['image_raw'] - target)**2) \
                + 1e-6 * jnp.mean(out['posterior_kl'])

        g = jax.grad(loss_fn)(variables['params'])
        flat = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in flat)
        total = sum(float(jnp.abs(x).sum()) for x in flat)
        assert total > 0


class TestMVDiT:

    def test_mv_pixelart_forward(self):
        """mv23d release arch (DiT-PixArt-MV): flattened multi-view DINO
        tokens via cross-attn, rmsnorm + qk_norm, no CLIP towers."""
        from ln3diff_tpu.models.dit import DiT_TriLatent, dit_registry
        cfg = dit_registry('DiT-PixArt-MV-B/2', input_size=8,
                           in_channels=4, depth=2, hidden_size=32,
                           num_heads=2, context_dim=16,
                           dtype=jnp.float32)
        model = DiT_TriLatent(cfg)
        x = jnp.ones((2, 8, 8, 12))
        ctx = {'concat': jnp.ones((2, 4, 6, 16))}   # (B, V, L, C) MV dino
        variables = model.init(jax.random.PRNGKey(0), x, jnp.ones((2,)),
                               ctx)
        # nudge off the adaLN-zero init saddle (zero final layer makes
        # the output constant at init, as in the reference)
        leaves, treedef = jax.tree_util.tree_flatten(variables)
        keys = jax.random.split(jax.random.PRNGKey(9), len(leaves))
        variables = treedef.unflatten([
            l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
            if jnp.issubdtype(l.dtype, jnp.floating) else l
            for l, k in zip(leaves, keys)])
        out = model.apply(variables, x, jnp.ones((2,)), ctx)
        assert out.shape == x.shape and out.dtype == jnp.float32
        assert np.isfinite(np.asarray(out)).all()
        # conditioning reaches the output (cross-attn live)
        out2 = model.apply(variables, x, jnp.ones((2,)),
                           {'concat': jnp.zeros((2, 4, 6, 16))})
        assert not np.allclose(np.asarray(out), np.asarray(out2))


class TestReleasePresets:

    def test_render_preset_table_matches_reference_names(self):
        """Every named cfg branch of the reference
        ``rendering_options_defaults`` (nsr/script_util.py:466-931) has a
        same-named RenderOptions preset."""
        from ln3diff_tpu.config import RENDER_PRESETS, RENDER_PRESET_SR
        from ln3diff_tpu.render.renderer import RenderOptions
        reference_names = [
            'ffhq', 'afhq', 'shapenet',
            'eg3d_shapenet_aug_resolution',
            'eg3d_shapenet_aug_resolution_chair',
            'eg3d_shapenet_aug_resolution_chair_128',
            'eg3d_shapenet_aug_resolution_chair_64',
            'srn_shapenet_aug_resolution_chair_128',
            'eg3d_shapenet_aug_resolution_chair_128_residualSR',
            'shapenet_tuneray',
            'shapenet_tuneray_aug_resolution',
            'shapenet_tuneray_aug_resolution_64',
            'shapenet_tuneray_aug_resolution_64_96',
            'shapenet_tuneray_aug_resolution_64_96_nearestSR',
            'shapenet_tuneray_aug_resolution_64_64_nearestSR',
            'shapenet_tuneray_aug_resolution_64_64_nearestSR_patch',
            'objverse_tuneray_aug_resolution_64_64_nearestSR',
            'objverse_tuneray_aug_resolution_64_64_auto',
            'objverse_tuneray_aug_resolution_128_128_auto',
            'objverse_tuneray_aug_resolution_96_96_auto',
            'shapenet_tuneray_aug_resolution_64_96_nearestResidualSR',
            'shapenet_tuneray_aug_resolution_64_64_nearestResidualSR',
            'shapenet_tuneray_aug_resolution_64_104',
        ]
        for name in reference_names:
            assert name in RENDER_PRESETS, name
            opts = RENDER_PRESETS[name]
            assert isinstance(opts, RenderOptions)
            assert opts.samples_total > 0
            # fixed-ray presets must carry a numeric near < far
            if opts.ray_start != 'auto':
                assert float(opts.ray_start) < float(opts.ray_end), name
        assert set(RENDER_PRESET_SR) <= set(RENDER_PRESETS)

    def test_all_release_presets_resolve(self):
        from ln3diff_tpu.config import (RELEASE_PRESETS, denoiser_preset,
                                        release_preset, vae_preset,
                                        RENDER_PRESETS)
        assert len(RELEASE_PRESETS) >= 15
        for name in RELEASE_PRESETS:
            cfg = release_preset(name)
            assert cfg.cfg in RENDER_PRESETS, (name, cfg.cfg)
            vae_preset(cfg.vae)              # must construct
            if cfg.objective != 'reconstruction':
                denoiser_preset(cfg.denoiser)
