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

    def test_backward_matches_reference_grads(self):
        """The custom-VJP Pallas backward (interpret mode) must equal
        jax.grad of the jnp reference for EVERY input — including the
        live/inbox masks — under both activations and with a
        non-tile-multiple M (padded-tail grads must not leak)."""
        rng = np.random.default_rng(3)
        M, C, H, C_out = 300, 16, 32, 3
        rows = jnp.asarray(rng.normal(size=(3, M, 4 * C)), jnp.float32)
        tx = jnp.asarray(rng.uniform(size=(3, M)), jnp.float32)
        ty = jnp.asarray(rng.uniform(size=(3, M)), jnp.float32)
        live = jnp.asarray(rng.integers(0, 2, (3, M)), jnp.float32)
        inbox = jnp.asarray(rng.integers(0, 2, (M,)), jnp.float32)
        w1 = jnp.asarray(rng.normal(size=(C, H)) * 0.2, jnp.float32)
        b1 = jnp.asarray(rng.normal(size=(H,)) * 0.1, jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(H, 1 + C_out)) * 0.2, jnp.float32)
        b2 = jnp.asarray(rng.normal(size=(1 + C_out,)) * 0.1, jnp.float32)
        c_rgb = jnp.asarray(rng.normal(size=(M, C_out)), jnp.float32)
        c_sig = jnp.asarray(rng.normal(size=(M, 1)), jnp.float32)

        for act in ('sigmoid', 'lrelu'):
            for use_inbox in (False, True):
                ib = inbox if use_inbox else None
                # tanh bounds the -1e10 culled sigmas so the loss (and
                # its grads) stay finite; grads through them are 0 both
                # sides.
                def loss(fn, *args):
                    rgb, sig = fn(*args)
                    return (jnp.sum(rgb * c_rgb)
                            + jnp.sum(jnp.tanh(sig) * c_sig))

                def f_fused(rows, tx, ty, live, w1, b1, w2, b2, ib=ib):
                    return loss(lambda *a: osg_pointwise_fused(
                        *a, activation=act, interpret=True, inbox=ib,
                        tile=128), rows, tx, ty, live, w1, b1, w2, b2)

                def f_ref(rows, tx, ty, live, w1, b1, w2, b2, ib=ib):
                    return loss(lambda r, x, y, l, a1, a2, a3, a4:
                                osg_pointwise_reference(
                                    r, x, y, l, a1, a2.reshape(1, -1),
                                    a3, a4.reshape(1, -1),
                                    activation=act, inbox=ib),
                                rows, tx, ty, live, w1, b1, w2, b2)

                args = (rows, tx, ty, live, w1, b1, w2, b2)
                got = jax.grad(f_fused, argnums=tuple(range(8)))(*args)
                want = jax.grad(f_ref, argnums=tuple(range(8)))(*args)
                for name, g, w in zip(
                        ('rows', 'tx', 'ty', 'live', 'w1', 'b1', 'w2',
                         'b2'), got, want):
                    scale = float(jnp.max(jnp.abs(w))) + 1e-12
                    np.testing.assert_allclose(
                        np.asarray(g), np.asarray(w), atol=1e-5 * scale,
                        err_msg=f'{act} inbox={use_inbox} grad({name})')

    def test_backward_vmap_and_bf16_cotangents(self):
        """B>1 goes through vmap-of-custom_vjp; bf16 rows must get bf16
        row-cotangents (JAX dtype contract) while weight grads stay at
        the weights' dtype."""
        rng = np.random.default_rng(4)
        B, M, C, H, C_out = 2, 256, 16, 32, 3
        rows = jnp.asarray(rng.normal(size=(B, 3, M, 4 * C)), jnp.bfloat16)
        tx = jnp.asarray(rng.uniform(size=(B, 3, M)), jnp.float32)
        ty = jnp.asarray(rng.uniform(size=(B, 3, M)), jnp.float32)
        live = jnp.ones((B, 3, M), jnp.float32)
        w1 = jnp.asarray(rng.normal(size=(C, H)) * 0.2, jnp.float32)
        b1 = jnp.zeros((H,), jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(H, 1 + C_out)) * 0.2, jnp.float32)
        b2 = jnp.zeros((1 + C_out,), jnp.float32)

        def make(interpret):
            return FusedOSG(w1=w1, b1=b1, w2=w2, b2=b2,
                            interpret=interpret)

        def loss(interpret, rows, w1_in):
            f = FusedOSG(w1=w1_in, b1=b1, w2=w2, b2=b2,
                         interpret=interpret)
            rgb, sig = f(rows, tx, ty, live)
            return jnp.sum(jnp.sin(rgb)) + jnp.sum(jnp.tanh(sig))

        g_rows_f, g_w1_f = jax.grad(lambda r, w: loss(True, r, w),
                                    argnums=(0, 1))(rows, w1)
        # interpret=False on CPU dispatches FusedOSG's jnp fallback —
        # plain autodiff of the reference math.
        g_rows_r, g_w1_r = jax.grad(lambda r, w: loss(False, r, w),
                                    argnums=(0, 1))(rows, w1)
        assert g_rows_f.dtype == jnp.bfloat16
        assert g_w1_f.dtype == w1.dtype
        np.testing.assert_allclose(
            np.asarray(g_rows_f, np.float32),
            np.asarray(g_rows_r, np.float32), atol=2e-2)
        np.testing.assert_allclose(np.asarray(g_w1_f), np.asarray(g_w1_r),
                                   atol=1e-2 * float(jnp.max(
                                       jnp.abs(g_w1_r))))

    def test_render_rays_fused_grad_matches_stock(self):
        """Grad parity of the FULL composition: d(render)/d(planes)
        through render_rays with the fused op (interpret kernel) vs the
        stock jnp path — the VAE training hot loop (reference
        renderer.py:81-104 + triplane.py:356-375)."""
        planes, coords, w1, b1, w2, b2 = _setup(C=16, H=8)
        w1 = w1[:16]
        opts = RenderOptions(depth_resolution=6,
                             depth_resolution_importance=6,
                             ray_start='auto', ray_end='auto', box_warp=0.9,
                             filter_out_of_bbox=True, deterministic=True)

        def decoder(feats, dirs):
            x = jnp.mean(feats, axis=1)
            h = jax.nn.softplus(x @ w1 + b1)
            out = h @ w2 + b2
            return (jax.nn.sigmoid(out[..., 1:]) * 1.002 - 0.001,
                    out[..., :1])

        fused = FusedOSG(w1=w1, b1=b1, w2=w2, b2=b2, interpret=True)
        o = jnp.asarray([[[0.0, 0.0, -1.8]]]).repeat(16, axis=1)
        d = jnp.tile(jnp.asarray([[[0.05, -0.03, 1.0]]]), (1, 16, 1))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

        def loss(planes, use_fused):
            out = render_rays(None, planes, decoder, o, d, opts,
                              fused_osg=fused if use_fused else None)
            return jnp.sum(jnp.sin(out.feature_samples * 3.0))

        g_fused = jax.grad(lambda p: loss(p, True))(planes)
        g_stock = jax.grad(lambda p: loss(p, False))(planes)
        scale = float(jnp.max(jnp.abs(g_stock))) + 1e-12
        np.testing.assert_allclose(np.asarray(g_fused),
                                   np.asarray(g_stock),
                                   atol=2e-5 * scale)

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
