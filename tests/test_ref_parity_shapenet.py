"""Numeric parity for the released ShapeNet VAE arch (fusionv5):
xygrid 3D-aware cross-attention, DINOv2-pair fusion blocks, uvit-skip
fusion decoder and the RodinConv 4X SR — all against the REAL reference
modules on CPU (tests/ref_compat.py stubs).

The hub-DINOv2 blocks the reference wraps are reconstructed here as a
minimal torch module with the hub's exact state-dict naming (norm1 /
attn.qkv / attn.proj / ls1.gamma / mlp.fc1-fc2 / ls2.gamma) since
torch.hub is unavailable offline; the fusion wrapper itself
(``TriplaneFusionBlockv4_nested_init_from_dino``) is imported from the
reference verbatim.

Note: the reference ``xformer_Conv3D_Aware_CrossAttention_xygrid`` fills
its query/context buffers plane-major (``q_x[B*i*N:...]``) but reshapes
the attention output batch-major (``.reshape(B, 3, N, C)``,
``vit/vision_transformer.py:520-526``) — for B>1 this scrambles samples
across the batch (verified empirically).  The release inference path
decodes per-sample, so parity is asserted at B=1, where the two
orderings coincide; our implementation is batch-correct for any B.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
import ref_compat

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not ref_compat.reference_available(),
                                reason='reference repo not present')]

import jax
import jax.numpy as jnp


def _torch():
    import torch
    torch.manual_seed(0)
    return torch


def _mini_dinov2_block(dim, heads):
    """Minimal torch DINOv2 block with hub state-dict naming."""
    import torch
    import torch.nn as nn

    class LayerScale(nn.Module):
        def __init__(self, d):
            super().__init__()
            self.gamma = nn.Parameter(torch.ones(d))

        def forward(self, x):
            return x * self.gamma

    class Attn(nn.Module):
        def __init__(self, d, nh):
            super().__init__()
            self.num_heads = nh
            self.qkv = nn.Linear(d, 3 * d, bias=True)
            self.proj = nn.Linear(d, d)

        def forward(self, x):
            B, N, C = x.shape
            qkv = self.qkv(x).reshape(B, N, 3, self.num_heads,
                                      C // self.num_heads)
            q, k, v = qkv.permute(2, 0, 3, 1, 4)
            a = (q @ k.transpose(-2, -1)) * (C // self.num_heads)**-0.5
            x = (a.softmax(-1) @ v).transpose(1, 2).reshape(B, N, C)
            return self.proj(x)

    class Mlp(nn.Module):
        def __init__(self, d):
            super().__init__()
            self.fc1 = nn.Linear(d, 4 * d)
            self.act = nn.GELU()
            self.fc2 = nn.Linear(4 * d, d)

        def forward(self, x):
            return self.fc2(self.act(self.fc1(x)))

    class Block(nn.Module):
        def __init__(self, d, nh):
            super().__init__()
            self.norm1 = nn.LayerNorm(d, eps=1e-6)
            self.attn = Attn(d, nh)
            self.ls1 = LayerScale(d)
            self.norm2 = nn.LayerNorm(d, eps=1e-6)
            self.mlp = Mlp(d)
            self.ls2 = LayerScale(d)

        def forward(self, x):
            x = x + self.ls1(self.attn(self.norm1(x)))
            return x + self.ls2(self.mlp(self.norm2(x)))

    return Block(dim, heads)


def _randomize(torch, module, scale=0.05):
    with torch.no_grad():
        for q in module.parameters():
            q.copy_(torch.randn_like(q) * scale)


class TestXYGridAttention:

    def test_xygrid_cross_attention_b1(self):
        torch = _torch()
        from vit.vision_transformer import \
            xformer_Conv3D_Aware_CrossAttention_xygrid as RefXY

        C, heads, p = 32, 4, 4
        ref = RefXY(C, num_heads=heads, qkv_bias=True).eval()
        _randomize(torch, ref)
        sd = ref.state_dict()

        from ln3diff_tpu.conditioning.convert import linear
        from ln3diff_tpu.models.vit import XYGridCrossAttention

        ours = XYGridCrossAttention(heads, dtype=jnp.float32)
        x = torch.randn(1, 3, p * p, C)
        with torch.no_grad():
            ref_out = ref(x).numpy()
        x_j = jnp.asarray(x.numpy())
        ours.init(jax.random.PRNGKey(0), x_j)
        params = {'wq': linear(sd, 'wq'), 'w_kv': linear(sd, 'w_kv'),
                  'proj': linear(sd, 'proj')}
        got = np.asarray(ours.apply({'params': params}, x_j))
        np.testing.assert_allclose(got, ref_out, rtol=2e-4, atol=2e-4)


class TestDinoFusionParity:

    def _build_ref_fusion(self, torch, dim, heads):
        import torch.nn as nn
        from vit.vision_transformer import \
            TriplaneFusionBlockv4_nested_init_from_dino as RefFusion
        blks = nn.ModuleList([_mini_dinov2_block(dim, heads)
                              for _ in range(2)])
        fb = RefFusion(blks, heads, dim, use_fusion_blk=True,
                       init_from_dino=True).eval()
        _randomize(torch, fb)
        return fb

    def test_fusion_block(self):
        torch = _torch()
        dim, heads, p = 32, 4, 4
        fb = self._build_ref_fusion(torch, dim, heads)
        sd = fb.state_dict()

        from ln3diff_tpu.conditioning.convert_ln3diff import \
            convert_dino_fusion_block
        from ln3diff_tpu.models.vit import DinoFusionBlock

        ours = DinoFusionBlock(heads, dtype=jnp.float32)
        x = torch.randn(1, 3, p * p, dim)
        with torch.no_grad():
            ref_out = fb(x).numpy()
        x_j = jnp.asarray(x.numpy())
        ours.init(jax.random.PRNGKey(0), x_j)
        # our blocks are flat module params; re-root the converted tree
        conv = convert_dino_fusion_block({f'x.{k}': v
                                          for k, v in sd.items()}, 'x')
        got = np.asarray(ours.apply({'params': conv}, x_j))
        np.testing.assert_allclose(got, ref_out, rtol=2e-4, atol=2e-4)

    def test_fusion_decoder_uvit(self):
        """Full fused vit_decoder: pos_embed → in/mid/out(+skip_linear)
        fusion blocks → norm, exactly ``forward_vit_decoder``
        (``vit/vit_triplane.py:1076-1120``)."""
        torch = _torch()
        import torch.nn as nn
        dim, heads, p, depth = 32, 4, 4, 6
        L = p * p

        class Harness(nn.Module):
            def __init__(self):
                super().__init__()
                self.blocks = nn.ModuleList(
                    [TestDinoFusionParity._build_ref_fusion(
                        self_outer, torch, dim, heads)
                     for _ in range(depth)])
                for blk in self.blocks[depth // 2:]:
                    blk.skip_linear = nn.Linear(2 * dim, dim)
                self.pos_embed = nn.Parameter(
                    torch.randn(1, 3 * L, dim) * 0.02)
                self.norm = nn.LayerNorm(dim, eps=1e-6)

            def forward(self, x):
                x = x + self.pos_embed
                B, L3, C = x.shape
                x = x.view(B, 3, L3 // 3, C)
                skips = [x]
                for blk in self.blocks[0:depth // 2 - 1]:
                    x = blk(x)
                    skips.append(x)
                for blk in self.blocks[depth // 2 - 1:depth // 2]:
                    x = blk(x)
                for blk in self.blocks[depth // 2:]:
                    x = x + blk.skip_linear(
                        torch.cat([x, skips.pop()], dim=-1))
                    x = blk(x)
                x = self.norm(x)
                return x.view(B, L3, C)

        self_outer = self
        ref = Harness().eval()
        _randomize(torch, ref)
        sd = ref.state_dict()

        from ln3diff_tpu.conditioning.convert_ln3diff import \
            convert_dino_fusion_decoder
        from ln3diff_tpu.models.vit import DinoFusionDecoder

        ours = DinoFusionDecoder(depth=depth, num_heads=heads,
                                 tokens_per_plane=L, dtype=jnp.float32)
        x = torch.randn(1, 3 * L, dim)
        with torch.no_grad():
            ref_out = ref(x).numpy()
        x_j = jnp.asarray(x.numpy())
        ours.init(jax.random.PRNGKey(0), x_j)
        params = convert_dino_fusion_decoder(sd, depth=depth)
        got = np.asarray(ours.apply({'params': params}, x_j))
        np.testing.assert_allclose(got, ref_out, rtol=3e-4, atol=3e-4)


class TestShapeNetEncodeParity:

    def test_encode_chain(self):
        """fusionv5 encode path: hub-DINOv2 encoder (``AE.encode_dinov2``,
        ``nsr/script_util.py:136-153``) → ldm_downsample → unpatchify3D →
        grouped quant_conv → DiagonalGaussian mode → 2D latent
        (``vae_reparameterization``, ``vit/vit_triplane.py:935-994``)."""
        torch = _torch()
        import torch.nn as nn

        D_enc, heads, ps, img = 32, 2, 14, 28   # 2x2 token grid
        t, p, z = 2, 2, 2                       # token_size, vae_p, z_ch

        class MiniDino(nn.Module):
            def __init__(self):
                super().__init__()
                class PE(nn.Module):
                    def __init__(self):
                        super().__init__()
                        self.proj = nn.Conv2d(3, D_enc, ps, ps)
                self.patch_embed = PE()
                self.cls_token = nn.Parameter(torch.zeros(1, 1, D_enc))
                self.pos_embed = nn.Parameter(
                    torch.randn(1, 1 + t * t, D_enc) * 0.02)
                self.blocks = nn.ModuleList(
                    [_mini_dinov2_block(D_enc, heads) for _ in range(2)])
                self.norm = nn.LayerNorm(D_enc, eps=1e-6)

            def forward(self, x):
                x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
                cls = self.cls_token.expand(x.shape[0], -1, -1)
                x = torch.cat([cls, x], dim=1) + self.pos_embed
                for blk in self.blocks:
                    x = blk(x)
                return self.norm(x)[:, 1:]       # drop cls

        enc = MiniDino().eval()
        ldm_down = nn.Linear(D_enc, p * p * 3 * z * 2)
        quant = nn.Conv2d(2 * 3 * z, 2 * 3 * z, 1, groups=3)
        _randomize(torch, enc)
        _randomize(torch, ldm_down)
        _randomize(torch, quant)

        x = torch.randn(2, 3, img, img)
        with torch.no_grad():
            tokens = enc(x)                      # (B, 4, D)
            lat = ldm_down(tokens)               # (B, 4, 24)
            B = lat.shape[0]
            # unpatchify3D (vit_triplane.py:889-914)
            lat = lat.reshape(B, t, t, p, p, 3, 2 * z)
            lat = torch.einsum('nhwpqdc->ndhpwqc', lat).reshape(
                B, 3, t * p, t * p, 2 * z)
            lat = lat.permute(0, 1, 4, 2, 3).reshape(B, -1, t * p, t * p)
            moments = quant(lat)                 # (B, 12, 4, 4)
            # vae_encode view (C, 3) + mode = mean (vit_triplane:917-933)
            m = moments.reshape(B, 2 * z, 3, (t * p)**2)
            mean = m[:, :z]                      # (B, z, 3, L)
            ref_latent = mean.reshape(B, z * 3, t * p, t * p).numpy()

        from ln3diff_tpu.conditioning.convert_ln3diff import (
            convert_hub_dinov2)
        from ln3diff_tpu.conditioning.convert import conv2d, linear
        from ln3diff_tpu.models.vae_shapenet import (ShapeNetVAE,
                                                     ShapeNetVAEConfig)
        from ln3diff_tpu.models.vit import vit_registry

        cfg = ShapeNetVAEConfig(
            encoder_vit=vit_registry('dinov2-s/14', img_size=img,
                                     patch_size=ps, embed_dim=D_enc,
                                     depth=2, num_heads=heads),
            ldm_z_channels=z, vae_p=p, token_size=t, patch_size=2,
            decoder_embed_dim=16, decoder_fusion_depth=2,
            decoder_num_heads=2, channel_multiplier=2, unpatchify_p=4,
            plane_channels=6, triplane_resolution=8,
            decoder_output_dim=6, use_sr=False)
        vae = ShapeNetVAE(cfg)

        x_j = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
        variables = vae.init(jax.random.PRNGKey(0), x_j,
                             method=vae.encode)
        params = dict(variables['params'])
        params['encoder'] = convert_hub_dinov2(enc.state_dict(), depth=2)
        params['ldm_downsample'] = linear(
            {f'd.{k}': v for k, v in ldm_down.state_dict().items()}, 'd')
        params['quant_conv'] = conv2d(
            {f'q.{k}': v for k, v in quant.state_dict().items()}, 'q')
        moments_j = vae.apply({'params': params}, x_j, method=vae.encode)
        latent_j, _ = vae.apply({'params': params}, moments_j, None, False,
                                method=vae.reparameterize)
        # ours: (B, H, W, z*3) channels-last, channel = z*3+p
        got = np.asarray(latent_j).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, ref_latent, rtol=2e-4, atol=2e-4)


class TestRodinSRParity:

    def test_rodin_4x_lite_residual(self):
        torch = _torch()
        from vit.vision_transformer import \
            RodinConv3D4X_lite_mlp_as_residual_lite as RefRodin

        in_ch, out_ch, res = 24, 12, 8
        ref = RefRodin(in_ch, out_ch, input_resolution=res).eval()
        _randomize(torch, ref)
        sd = ref.state_dict()

        from ln3diff_tpu.conditioning.convert_ln3diff import convert_rodin_sr
        from ln3diff_tpu.models.rodin import RodinConv3D4XResidual

        ours = RodinConv3D4XResidual(in_channels=in_ch, out_channels=out_ch,
                                     input_resolution=res, lite=True,
                                     dtype=jnp.float32)
        x = torch.randn(2, in_ch, 4, 4)
        with torch.no_grad():
            ref_out = ref(x).numpy()
        x_j = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
        ours.init(jax.random.PRNGKey(0), x_j)
        params = convert_rodin_sr(sd)
        got = np.asarray(ours.apply({'params': params}, x_j))
        got = got.transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, ref_out, rtol=2e-4, atol=2e-4)


class TestNearestConvSRParity:

    def test_nearest_conv_sr(self):
        torch = _torch()
        from utils.torch_utils.components import NearestConvSR as RefSR

        ref = RefSR(output_dim=8, num_feat=16, num_out_ch=3,
                    sr_ratio=2).eval()
        _randomize(torch, ref)
        sd = ref.state_dict()

        from ln3diff_tpu.conditioning.convert_ln3diff import \
            convert_nearest_conv_sr
        from ln3diff_tpu.models.sr import NearestConvSR

        ours = NearestConvSR(num_feat=16, num_out_ch=3, sr_ratio=2,
                             dtype=jnp.float32)
        x = torch.randn(2, 8, 8, 8)
        with torch.no_grad():
            ref_out = ref(x).numpy()
        x_j = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
        ours.init(jax.random.PRNGKey(0), x_j)
        params = convert_nearest_conv_sr(sd)
        got = np.asarray(ours.apply({'params': params}, x_j))
        got = got.transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, ref_out, rtol=2e-4, atol=2e-4)
