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
