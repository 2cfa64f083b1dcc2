"""Numeric parity for the FFHQ released SR head
(``SuperresolutionHybrid8XDC``) against the real reference on CPU
(StyleGAN2 ops fall back to their ``impl='ref'`` paths without CUDA).
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


class TestFusionV3Parity:

    def test_fusion_block_v3(self):
        """FFHQ decoder block: TriplaneFusionBlockv3 — two intact DINOv2
        blocks + one residual xygrid fusion attention
        (``vit/vision_transformer.py:1940-1953``)."""
        import torch
        torch.manual_seed(0)
        import torch.nn as nn
        from test_ref_parity_shapenet import _mini_dinov2_block, _randomize
        from vit.vision_transformer import TriplaneFusionBlockv3 as RefV3

        dim, heads, p = 32, 4, 4
        blks = nn.ModuleList([_mini_dinov2_block(dim, heads)
                              for _ in range(2)])
        fb = RefV3(blks, heads, dim, use_fusion_blk=True).eval()
        _randomize(torch, fb)
        sd = fb.state_dict()

        from ln3diff_tpu.conditioning.convert_ln3diff import \
            convert_dino_fusion_block_v3
        from ln3diff_tpu.models.vit import DinoFusionBlockV3

        ours = DinoFusionBlockV3(heads, dtype=jnp.float32)
        x = torch.randn(1, 3, p * p, dim)
        with torch.no_grad():
            ref_out = fb(x).numpy()
        x_j = jnp.asarray(x.numpy())
        ours.init(jax.random.PRNGKey(0), x_j)
        conv = convert_dino_fusion_block_v3(
            {f'x.{k}': v for k, v in sd.items()}, 'x')
        got = np.asarray(ours.apply({'params': conv}, x_j))
        np.testing.assert_allclose(got, ref_out, rtol=2e-4, atol=2e-4)


class TestSR8XDCParity:

    def test_superresolution_hybrid_8xdc(self):
        import torch
        torch.manual_seed(0)
        from nsr.superresolution import SuperresolutionHybrid8XDC as RefSR

        ref = RefSR(channels=8, img_resolution=512, sr_num_fp16_res=0,
                    sr_antialias=True).eval()
        with torch.no_grad():
            for q in ref.parameters():
                q.copy_(torch.randn_like(q) * 0.05)
        sd = ref.state_dict()

        from ln3diff_tpu.conditioning.convert_ln3diff import \
            convert_sr_hybrid_8xdc
        from ln3diff_tpu.models.stylegan import SuperresolutionHybrid8XDC

        ours = SuperresolutionHybrid8XDC(noise_mode='const')

        B = 2
        x = torch.randn(B, 8, 64, 64)
        rgb = torch.randn(B, 3, 64, 64)
        ws = torch.randn(B, 1, 512)
        with torch.no_grad():
            ref_out = ref(rgb, x, ws, noise_mode='const').numpy()

        x_j = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
        rgb_j = jnp.asarray(rgb.numpy().transpose(0, 2, 3, 1))
        ws_j = jnp.asarray(ws.numpy()[:, 0])
        ours.init(jax.random.PRNGKey(0), x_j, rgb_j, ws_j)
        params = convert_sr_hybrid_8xdc(sd)
        got = np.asarray(ours.apply({'params': params}, x_j, rgb_j, ws_j))
        got = got.transpose(0, 3, 1, 2)
        assert got.shape == ref_out.shape == (B, 3, 512, 512)
        np.testing.assert_allclose(got, ref_out, rtol=3e-4, atol=3e-4)


class TestMappingNetworkParity:

    def test_mapping_matches_reference(self):
        """MappingNetwork vs the real reference module, shared weights,
        incl. truncation toward a nonzero tracked w_avg."""
        import torch
        ref_compat.install()
        import importlib
        sg2 = importlib.import_module('nsr.networks_stylegan2')

        torch.manual_seed(0)
        ref = sg2.MappingNetwork(z_dim=16, c_dim=0, w_dim=32, num_ws=5,
                                 num_layers=2).eval()
        with torch.no_grad():
            for p in ref.parameters():
                p.copy_(torch.randn_like(p) * 0.5)
            ref.w_avg.copy_(torch.randn(32) * 0.3)

        from ln3diff_tpu.conditioning.convert_ln3diff import \
            convert_mapping_network
        from ln3diff_tpu.models.stylegan import MappingNetwork

        sd = {k: v for k, v in ref.state_dict().items()}
        params = convert_mapping_network(sd, num_layers=2)
        w_avg = params.pop('_w_avg')
        model = MappingNetwork(z_dim=16, c_dim=0, w_dim=32, num_ws=5,
                               num_layers=2)

        z = np.random.default_rng(1).standard_normal((3, 16)).astype(
            np.float32)
        for psi in (1.0, 0.7):
            got = model.apply({'params': params,
                               'stats': {'w_avg': jnp.asarray(w_avg)}},
                              jnp.asarray(z), truncation_psi=psi)
            with torch.no_grad():
                want = ref(torch.from_numpy(z), None, truncation_psi=psi)
            np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                       rtol=2e-4, atol=2e-5)


class TestEG3DGeneratorConversion:

    def test_reference_state_dict_converts_to_generator_structure(self):
        """``convert_eg3d_generator`` against the REAL reference modules:
        a ``StyleGAN2Backbone`` + ``OSGDecoder`` state_dict (the layout a
        legacy EG3D pickle extracts to) must convert into exactly our
        ``TriPlaneGenerator`` param/stats structure and run a ψ<1
        forward.  (The self-inverse oracle in test_eg3d_warmup can't
        catch a layout mistake shared by converter and oracle — this
        pins the torch side to the reference's own modules.)"""
        import importlib

        import torch
        ref_compat.install()
        sg2 = importlib.import_module('nsr.networks_stylegan2')
        tri = importlib.import_module('nsr.triplane')

        torch.manual_seed(0)
        # the reference's StyleGAN2Backbone IS networks_stylegan2.Generator
        # (``nsr/triplane.py:15``)
        backbone = sg2.Generator(
            z_dim=16, c_dim=25, w_dim=16, img_resolution=16,
            img_channels=24).eval()
        dec = tri.OSGDecoder(
            8, {'decoder_lr_mul': 1, 'decoder_output_dim': 8}).eval()
        sd = {f'G_ema.backbone.{k}': v.detach().numpy()
              for k, v in backbone.state_dict().items()}
        sd.update({f'G_ema.decoder.{k}': v.detach().numpy()
                   for k, v in dec.state_dict().items()})
        sd['G_ema.backbone.mapping.w_avg'] = \
            np.full((16,), 0.25, np.float32)

        from ln3diff_tpu.conditioning.convert_ln3diff import \
            convert_eg3d_generator
        params, stats = convert_eg3d_generator(sd)

        from ln3diff_tpu.models.eg3d import (TriPlaneGenerator,
                                             TriPlaneGeneratorConfig)
        from ln3diff_tpu.render.renderer import RenderOptions
        gen = TriPlaneGenerator(TriPlaneGeneratorConfig(
            z_dim=16, c_dim=25, w_dim=16, plane_resolution=16,
            plane_channels=8, decoder_output_dim=8))
        opts = RenderOptions(depth_resolution=4,
                             depth_resolution_importance=4,
                             ray_start=2.25, ray_end=3.3, box_warp=1.0)
        z = jnp.zeros((1, 16))
        cam = jnp.zeros((1, 25)).at[:, (0, 5, 10, 15, 16, 20, 24)].set(1)
        c = jnp.zeros((1, 25))
        target = jax.eval_shape(
            lambda k: gen.init(k, z, cam, opts, 8, c),
            jax.random.PRNGKey(0))

        def shapes(tree):
            return {jax.tree_util.keystr(p): tuple(np.shape(v))
                    for p, v in jax.tree_util.tree_leaves_with_path(tree)}

        got = shapes(params)
        want = shapes(target['params'])
        assert got == want, (
            sorted(set(got) ^ set(want)),
            {k: (got.get(k), want.get(k)) for k in got if
             got.get(k) != want.get(k)})
        assert tuple(np.shape(stats['mapping']['w_avg'])) == \
            tuple(target['stats']['mapping']['w_avg'].shape)

        variables = {
            'params': jax.tree_util.tree_map(jnp.asarray, params),
            'stats': jax.tree_util.tree_map(jnp.asarray, stats)}
        out = gen.apply(variables, z, cam, opts, 8, c,
                        truncation_psi=0.7)
        assert np.isfinite(np.asarray(out['image_raw'])).all()
