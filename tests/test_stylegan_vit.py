"""StyleGAN ops + ViT family tests (torch oracle for upfirdn2d)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from ln3diff_tpu.models.stylegan import (DiscriminatorConfig,
                                         DualDiscriminator,
                                         StyleGANDiscriminator,
                                         SuperresolutionHybrid,
                                         downsample2d, modulated_conv2d,
                                         setup_filter, upfirdn2d, upsample2d)
from ln3diff_tpu.models.vit import (TriplaneFusionBlock,
                                    TriplaneViTDecoder,
                                    TriplaneViTDecoderConfig, ViTConfig,
                                    VisionTransformer, unpatchify_triplane,
                                    vit_registry)


def _torch_upfirdn2d(x_nhwc, f, up, down, pad):
    """Reference impl (_upfirdn2d_ref logic) in torch."""
    x = torch.from_numpy(x_nhwc).permute(0, 3, 1, 2)
    B, C, H, W = x.shape
    fh, fw = f.shape
    px0, px1, py0, py1 = pad
    # upsample by zero insertion
    x = x.reshape(B, C, H, 1, W, 1)
    x = F.pad(x, [0, up - 1, 0, 0, 0, up - 1])
    x = x.reshape(B, C, H * up, W * up)
    x = F.pad(x, [max(px0, 0), max(px1, 0), max(py0, 0), max(py1, 0)])
    x = x[:, :, max(-py0, 0):x.shape[2] - max(-py1, 0),
          max(-px0, 0):x.shape[3] - max(-px1, 0)]
    fk = torch.from_numpy((f * (up**2))[::-1, ::-1].copy())
    fk = fk[None, None].repeat(C, 1, 1, 1)
    x = F.conv2d(x, fk, groups=C)
    x = x[:, :, ::down, ::down]
    return x.permute(0, 2, 3, 1).numpy()


class TestUpfirdn2d:

    @pytest.mark.parametrize('up,down,pad', [
        (1, 1, (1, 1, 1, 1)), (2, 1, (2, 1, 2, 1)), (1, 2, (1, 1, 1, 1)),
    ])
    def test_matches_reference_math(self, up, down, pad):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
        f = np.asarray(setup_filter())
        ours = upfirdn2d(jnp.asarray(x), jnp.asarray(f), up=up, down=down,
                         padding=pad)
        ref = _torch_upfirdn2d(x, f.astype(np.float64).astype(np.float32),
                               up, down, pad)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4,
                                   atol=1e-5)

    def test_up_down_roundtrip_shapes(self):
        x = jnp.ones((1, 16, 16, 4))
        f = setup_filter()
        up = upsample2d(x, f, up=2)
        assert up.shape == (1, 32, 32, 4)
        down = downsample2d(up, f, down=2)
        assert down.shape == (1, 16, 16, 4)
        # constant image preserved away from the border (DC gain 1;
        # zero-padding darkens the 1-px rim as in the reference impl)
        np.testing.assert_allclose(np.asarray(down)[:, 2:-2, 2:-2], 1.0,
                                   atol=1e-4)


class TestModulatedConv:

    def test_matches_loop_reference(self):
        rng = np.random.default_rng(1)
        B, H, W, Ci, Co, k = 3, 8, 8, 4, 5, 3
        x = rng.standard_normal((B, H, W, Ci)).astype(np.float32)
        wgt = rng.standard_normal((k, k, Ci, Co)).astype(np.float32)
        styles = rng.standard_normal((B, Ci)).astype(np.float32)

        ours = modulated_conv2d(jnp.asarray(x), jnp.asarray(wgt),
                                jnp.asarray(styles))
        # loop reference via torch conv per sample
        outs = []
        for b in range(B):
            w = wgt * styles[b][None, None, :, None]
            d = 1.0 / np.sqrt((w**2).sum(axis=(0, 1, 2)) + 1e-8)
            w = w * d[None, None, None, :]
            xt = torch.from_numpy(x[b:b + 1]).permute(0, 3, 1, 2)
            wt = torch.from_numpy(w).permute(3, 2, 0, 1)
            o = F.conv2d(xt, wt, padding=k // 2)
            outs.append(o.permute(0, 2, 3, 1).numpy()[0])
        np.testing.assert_allclose(np.asarray(ours), np.stack(outs),
                                   rtol=1e-3, atol=1e-4)

    def test_sr_head_shapes(self):
        sr = SuperresolutionHybrid(sr_ratio=4, hidden=16)
        feat = jnp.ones((2, 16, 16, 8))
        rgb = jnp.ones((2, 16, 16, 3))
        ws = jnp.ones((2, 512))
        params = sr.init(jax.random.PRNGKey(0), feat, rgb, ws)
        out = sr.apply(params, feat, rgb, ws)
        assert out.shape == (2, 64, 64, 3)
        assert np.isfinite(np.asarray(out)).all()


class TestDiscriminators:

    def test_stylegan_d(self):
        d = StyleGANDiscriminator(DiscriminatorConfig(img_resolution=32,
                                                      base_channels=8,
                                                      max_channels=32))
        img = jnp.ones((3, 32, 32, 3))
        params = d.init(jax.random.PRNGKey(0), img)
        out = d.apply(params, img)
        assert out.shape == (3, 1)

    def test_dual_d(self):
        d = DualDiscriminator(DiscriminatorConfig(img_resolution=32,
                                                  base_channels=8,
                                                  max_channels=32))
        sr = jnp.ones((2, 32, 32, 3))
        raw = jnp.ones((2, 16, 16, 3))
        params = d.init(jax.random.PRNGKey(0), sr, raw)
        out = d.apply(params, sr, raw)
        assert out.shape == (2, 1)


class TestViT:

    def test_vit_tokens(self):
        cfg = vit_registry('vit-s/16', img_size=32, embed_dim=32, depth=2,
                           num_heads=2)
        vit = VisionTransformer(cfg)
        x = jnp.ones((2, 32, 32, 3))
        params = vit.init(jax.random.PRNGKey(0), x)
        tok = vit.apply(params, x)
        assert tok.shape == (2, 5, 32)  # 4 patches + cls

    def test_fusion_block(self):
        blk = TriplaneFusionBlock(num_heads=2)
        x = jnp.ones((2, 3, 16, 32))
        params = blk.init(jax.random.PRNGKey(0), x)
        y = blk.apply(params, x)
        assert y.shape == x.shape

    def test_triplane_decoder_uvit(self):
        cfg = TriplaneViTDecoderConfig(tokens_per_plane=16, embed_dim=32,
                                       depth=4, num_heads=2)
        dec = TriplaneViTDecoder(cfg)
        x = jnp.ones((1, 3, 16, 32))
        params = dec.init(jax.random.PRNGKey(0), x)
        y = dec.apply(params, x)
        assert y.shape == x.shape
        assert any('skip_linear' in k for k in params['params'])

    def test_unpatchify_triplane(self):
        x = jnp.arange(1 * 3 * 4 * 8.0).reshape(1, 3, 4, 8)
        planes = unpatchify_triplane(x, patch_size=2, out_channels=2)
        assert planes.shape == (1, 3, 4, 4, 2)


class TestTriPlaneGenerator:

    def test_z_to_render(self):
        """EG3D-compat generator: z (+ camera label) → planes → render
        (reference nsr/triplane.py:29-300 capability assembly)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from ln3diff_tpu.models.eg3d import (TriPlaneGenerator,
                                             TriPlaneGeneratorConfig)
        from ln3diff_tpu.render.renderer import RenderOptions

        cfg = TriPlaneGeneratorConfig(z_dim=16, c_dim=25, w_dim=32,
                                      plane_resolution=32,
                                      plane_channels=8,
                                      decoder_output_dim=8)
        gen = TriPlaneGenerator(cfg)
        opts = RenderOptions(depth_resolution=4,
                             depth_resolution_importance=4,
                             ray_start=2.25, ray_end=3.3, box_warp=1.0,
                             white_back=False)
        z = jax.random.normal(jax.random.PRNGKey(0), (2, 16))
        cam = jnp.zeros((2, 25)).at[:, 0].set(1).at[:, 5].set(1) \
            .at[:, 10].set(1).at[:, 15].set(1).at[:, 16].set(1) \
            .at[:, 20].set(1).at[:, 11].set(2.7).at[:, 24].set(1)
        variables = gen.init(jax.random.PRNGKey(1), z, cam, opts, 8,
                             c=cam)
        out = gen.apply(variables, z, cam, opts, 8, c=cam)
        assert out['planes'].shape == (2, 3, 32, 32, 8)
        assert out['image_raw'].shape == (2, 8, 8, 3)
        assert np.isfinite(np.asarray(out['image_raw'])).all()
        # different z → different planes (mapping is live)
        z2 = jax.random.normal(jax.random.PRNGKey(2), (2, 16))
        out2 = gen.apply(variables, z2, cam, opts, 8, c=cam)
        assert not np.allclose(np.asarray(out['planes']),
                               np.asarray(out2['planes']))
