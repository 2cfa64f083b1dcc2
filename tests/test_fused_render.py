"""Fused Pallas point pipeline vs the stock jnp render path.

Follows the reference's ``impl='ref'`` numerical ground-truth pattern
(SURVEY §4): the Pallas kernel (interpret mode on CPU) and the FusedOSG
wrapper must match ``sample_packed_planes`` + ``OSGDecoder`` exactly.
"""

import sys
import os

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from ln3diff_tpu.ops.fused_render import (FusedOSG, fused_osg_from_params,
                                          osg_pointwise_fused,
                                          osg_pointwise_reference)
from ln3diff_tpu.render.renderer import (RenderOptions, pack_corner_table,
                                         packed_gather, project_onto_planes,
                                         render_rays, run_decoder,
                                         sample_packed_planes)


def _setup(B=1, M=300, C=32, H=16):
    rng = np.random.default_rng(0)
    planes = jnp.asarray(rng.standard_normal((B, 3, H, H, C)),
                         jnp.float32) * 0.3
    coords = jnp.asarray(rng.uniform(-0.6, 0.6, (B, M, 3)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((C, 64)), jnp.float32) * 0.2
    b1 = jnp.asarray(rng.standard_normal(64), jnp.float32) * 0.1
    w2 = jnp.asarray(rng.standard_normal((64, 33)), jnp.float32) * 0.2
    b2 = jnp.asarray(rng.standard_normal(33), jnp.float32) * 0.1
    return planes, coords, w1, b1, w2, b2


class TestFusedPointPipeline:

    def test_reference_matches_jnp_path(self):
        planes, coords, w1, b1, w2, b2 = _setup()
        B, _, H, W, C = planes.shape
        packed = pack_corner_table(planes)
        proj = project_onto_planes(coords * (2.0 / 0.9))

        feats = sample_packed_planes(packed, proj, H, W)
        x = jnp.mean(feats, axis=1)
        h = jax.nn.softplus(x @ w1 + b1)
        out = h @ w2 + b2
        want_sigma = out[..., :1]
        want_rgb = jax.nn.sigmoid(out[..., 1:]) * 1.002 - 0.001

        rows, tx, ty, live = packed_gather(packed, proj, H, W)
        rgb, sigma = osg_pointwise_reference(rows[0], tx[0], ty[0], live[0],
                                             w1, b1, w2, b2)
        np.testing.assert_allclose(np.asarray(rgb), np.asarray(want_rgb[0]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(sigma),
                                   np.asarray(want_sigma[0]), atol=1e-5)

    def test_pallas_interpret_matches_reference(self):
        planes, coords, w1, b1, w2, b2 = _setup(M=700)  # non-TILE multiple
        B, _, H, W, C = planes.shape
        packed = pack_corner_table(planes)
        proj = project_onto_planes(coords * (2.0 / 0.9))
        rows, tx, ty, live = packed_gather(packed, proj, H, W)

        want_rgb, want_sigma = osg_pointwise_reference(
            rows[0], tx[0], ty[0], live[0], w1, b1, w2, b2)
        rgb, sigma = osg_pointwise_fused(rows[0], tx[0], ty[0], live[0],
                                         w1, b1, w2, b2, interpret=True)
        np.testing.assert_allclose(np.asarray(rgb), np.asarray(want_rgb),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(sigma), np.asarray(want_sigma),
                                   atol=1e-5)

    def test_render_rays_fused_matches_stock(self):
        planes, coords, w1, b1, w2, b2 = _setup()
        opts = RenderOptions(depth_resolution=8,
                             depth_resolution_importance=8,
                             ray_start='auto', ray_end='auto', box_warp=0.9,
                             filter_out_of_bbox=True, deterministic=True)

        def decoder(feats, dirs):
            x = jnp.mean(feats, axis=1)
            h = jax.nn.softplus(x @ w1 + b1)
            out = h @ w2 + b2
            return jax.nn.sigmoid(out[..., 1:]) * 1.002 - 0.001, out[..., :1]

        fused = FusedOSG(w1=w1, b1=b1, w2=w2, b2=b2)  # CPU → jnp fallback
        o = jnp.asarray([[[0.0, 0.0, -1.8]]]).repeat(16, axis=1)
        d = jnp.tile(jnp.asarray([[[0.05, -0.03, 1.0]]]), (1, 16, 1))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

        stock = render_rays(None, planes, decoder, o, d, opts)
        got = render_rays(None, planes, decoder, o, d, opts, fused_osg=fused)
        np.testing.assert_allclose(np.asarray(got.feature_samples),
                                   np.asarray(stock.feature_samples),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(got.depth_samples),
                                   np.asarray(stock.depth_samples), atol=1e-4)

    def test_fused_osg_from_params_folding(self):
        rng = np.random.default_rng(1)
        C = 8
        params = {
            'EqualDense_0': {
                'kernel': jnp.asarray(rng.standard_normal((C, 64)),
                                      jnp.float32),
                'bias': jnp.zeros(64)},
            'EqualDense_1': {
                'kernel': jnp.asarray(rng.standard_normal((64, 33)),
                                      jnp.float32),
                'bias': jnp.zeros(33)},
        }
        fused = fused_osg_from_params(params, lr_multiplier=2.0)
        np.testing.assert_allclose(
            np.asarray(fused.w1),
            np.asarray(params['EqualDense_0']['kernel']) * (2.0 / np.sqrt(C)),
            rtol=1e-6)

    def test_vae_query_points_fused(self):
        from ln3diff_tpu.models.vae import TriplaneVAE
        from tests.test_models import small_vae_cfg

        cfg = small_vae_cfg()
        vae = TriplaneVAE(cfg)
        B = 1
        planes = jnp.asarray(np.random.default_rng(0).standard_normal(
            (B, 3, 8, 8, cfg.plane_channels)), jnp.float32) * 0.2
        coords = jnp.asarray(np.random.default_rng(1).uniform(
            -0.4, 0.4, (B, 50, 3)), jnp.float32)
        variables = vae.init(jax.random.PRNGKey(0), planes, coords, 0.9,
                             method=vae.query_points)
        rgb0, sig0 = vae.apply(variables, planes, coords, 0.9,
                               method=vae.query_points)
        rgb1, sig1 = vae.apply(variables, planes, coords, 0.9, True,
                               method=vae.query_points)
        np.testing.assert_allclose(np.asarray(rgb1), np.asarray(rgb0),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(sig1), np.asarray(sig0),
                                   atol=1e-5)
