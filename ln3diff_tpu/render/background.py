"""Foreground/background composition renderer (FFHQ/car path).

Rewrite of ``ImportanceRendererfg_bg`` (reference ``renderer.py:555-637``)
and the NeRF++ inverted-sphere parameterization ``depth2pts_outside``
(``ray_sampler.py:27-57``): the plane channels split into fg/bg halves;
the background renders on inverted-sphere coordinates with no importance
sampling, and composites behind the foreground by its residual
transmittance (reference composition in ``Triplane_fg_bg_plane``,
``nsr/triplane.py:753-946``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .ray_marcher import march_rays
from .renderer import (DecoderFn, RenderOptions, RenderOutput, render_rays,
                       run_decoder, sample_stratified)

TINY = 1e-6


def depth2pts_outside(ray_o: jax.Array, ray_d: jax.Array,
                      depth: jax.Array):
    """NeRF++ inverted sphere points.

    ray_o/ray_d: (..., 3); depth: (...) = inverse distance in [0, 1].
    Returns (pts (..., 4), depth_real (...)).
    """
    d1 = -jnp.sum(ray_d * ray_o, axis=-1) / jnp.sum(ray_d * ray_d, axis=-1)
    p_mid = ray_o + d1[..., None] * ray_d
    p_mid_norm = jnp.linalg.norm(p_mid, axis=-1)
    ray_d_cos = 1.0 / jnp.linalg.norm(ray_d, axis=-1)
    d2 = jnp.sqrt(jnp.maximum(1.0 - p_mid_norm**2, TINY)) * ray_d_cos
    p_sphere = ray_o + (d1 + d2)[..., None] * ray_d

    rot_axis = jnp.cross(ray_o, p_sphere)
    rot_axis = rot_axis / (jnp.linalg.norm(rot_axis, axis=-1,
                                           keepdims=True) + TINY)
    phi = jnp.arcsin(jnp.clip(p_mid_norm, -1, 1))
    theta = jnp.arcsin(jnp.clip(p_mid_norm * depth, -1, 1))
    rot_angle = (phi - theta)[..., None]

    cos_a = jnp.cos(rot_angle)
    sin_a = jnp.sin(rot_angle)
    p_new = (p_sphere * cos_a
             + jnp.cross(rot_axis, p_sphere) * sin_a
             + rot_axis * jnp.sum(rot_axis * p_sphere, axis=-1,
                                  keepdims=True) * (1.0 - cos_a))
    p_new = p_new / (jnp.linalg.norm(p_new, axis=-1, keepdims=True) + TINY)
    pts = jnp.concatenate([p_new, depth[..., None]], axis=-1)

    depth_real = (1.0 / (depth + TINY) * jnp.cos(theta) * ray_d_cos + d1)
    return pts, depth_real


def render_background(key, bg_planes: jax.Array, decoder: DecoderFn,
                      ray_origins: jax.Array, ray_directions: jax.Array,
                      opts: RenderOptions, bg_depth_resolution: int = 16):
    """Background pass: stratified inverse-depth samples on the inverted
    sphere, single march (reference ``forward_background:562-605``)."""
    B, R, _ = ray_origins.shape
    depths = sample_stratified(key, ray_origins, 0.0, 1.0,
                               bg_depth_resolution,
                               deterministic=opts.deterministic or
                               key is None)[..., 0]           # (B, R, S)
    S = bg_depth_resolution
    o = jnp.broadcast_to(ray_origins[:, :, None, :], (B, R, S, 3))
    d = jnp.broadcast_to(ray_directions[:, :, None, :], (B, R, S, 3))
    bg_pts, _ = depth2pts_outside(o, d, depths)   # (B, R, S, 4)

    # sample planes with the sphere-surface xyz (first 3 dims)
    coords = bg_pts[..., :3].reshape(B, -1, 3)
    dirs = d.reshape(B, -1, 3)
    rgb, sigma = run_decoder(bg_planes, decoder, coords, dirs,
                             opts if not opts.filter_out_of_bbox else
                             _no_bbox(opts))
    rgb = rgb.reshape(B, R, S, -1)
    sigma = sigma.reshape(B, R, S, 1)
    out = march_rays(rgb, sigma, depths[..., None],
                     white_back=opts.white_back)
    return out


def _no_bbox(opts: RenderOptions) -> RenderOptions:
    import dataclasses
    return dataclasses.replace(opts, filter_out_of_bbox=False)


def render_rays_fg_bg(key, planes: jax.Array, decoder: DecoderFn,
                      bg_decoder: DecoderFn, ray_origins: jax.Array,
                      ray_directions: jax.Array, opts: RenderOptions,
                      bg_depth_resolution: int = 16,
                      fused_osg=None) -> RenderOutput:
    """Full fg/bg render: channel-split planes, composite bg behind fg by
    residual transmittance (reference ``ImportanceRendererfg_bg.forward``
    + composition in ``Triplane_fg_bg_plane``).

    ``fused_osg`` applies to the FOREGROUND pass only (the bg decoder is
    a different arch; its inverted-sphere pass is 16 samples/ray and
    cheap)."""
    C = planes.shape[-1]
    fg_planes = planes[..., :C // 2]
    bg_planes = planes[..., C // 2:]

    if key is not None:
        k_fg, k_bg = jax.random.split(key)
    else:
        k_fg = k_bg = None

    fg = render_rays(k_fg, fg_planes, decoder, ray_origins, ray_directions,
                     opts, fused_osg=fused_osg)
    bg = render_background(k_bg, bg_planes, bg_decoder, ray_origins,
                           ray_directions, opts, bg_depth_resolution)

    # Composite in premultiplied [0,1] space: with white_back=False the
    # marcher's (rgb+1)/2 IS the premultiplied Σ w·c, so
    # out01 = fg01 + (1 - w_total)·bg01.  (The reference composites the
    # [-1,1] images directly, which carries a -(1-w_total) bias the mask
    # loss hides; we keep the mathematically consistent form.)
    fg01 = (fg.feature_samples + 1.0) * 0.5
    bg01 = (bg.rgb + 1.0) * 0.5
    out01 = fg01 + (1.0 - fg.weights_samples) * bg01
    feature = out01 * 2.0 - 1.0
    return RenderOutput(feature_samples=feature,
                        depth_samples=fg.depth_samples,
                        weights_samples=fg.weights_samples,
                        visibility=fg.visibility)
