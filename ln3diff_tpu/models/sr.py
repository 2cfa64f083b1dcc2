"""Render-space super-resolution heads.

TPU-native rewrite of ``utils/torch_utils/components.py``:
``NearestConvSR:367`` (default SR for Objaverse/ShapeNet),
``NearestConvSR_Residual:402``, ``PixelUnshuffleUpsample:323``.
The StyleGAN-modulated FFHQ SR lives in ``stylegan.py``.
Channels-last NHWC; plain convs — XLA fuses the lrelu chains.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _up2(x):
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), method='nearest')


class NearestConvSR(nn.Module):
    """Nearest-upsample + conv SR (anti-checkerboard)."""
    num_feat: int = 128
    num_out_ch: int = 3
    sr_ratio: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        C = x.shape[-1]
        x = nn.Conv(C, (3, 3), dtype=dt, name='conv_after_body')(x) + x
        # reference: conv_before_upsample's own LeakyReLU uses the torch
        # default slope 0.01 (components.py:379), unlike the 0.2 elsewhere
        x = nn.leaky_relu(
            nn.Conv(self.num_feat, (3, 3), dtype=dt,
                    name='conv_before_upsample')(x), 0.01)
        x = lrelu(nn.Conv(self.num_feat, (3, 3), dtype=dt,
                          name='conv_up1')(_up2(x)))
        if self.sr_ratio == 4:
            x = lrelu(nn.Conv(self.num_feat, (3, 3), dtype=dt,
                              name='conv_up2')(_up2(x)))
        x = lrelu(nn.Conv(self.num_feat, (3, 3), dtype=dt, name='conv_hr')(x))
        return nn.Conv(self.num_out_ch, (3, 3), dtype=dt, name='conv_last')(x)


class NearestConvSRResidual(NearestConvSR):
    """tanh-normalized residual on top of the bilinear-upsampled render."""

    @nn.compact
    def __call__(self, x, base_x):
        r = jnp.tanh(NearestConvSR.__call__(self, x))
        B, H, W, C = base_x.shape
        scale = r.shape[1] // H
        up = jax.image.resize(base_x, (B, H * scale, W * scale, C),
                              method='bilinear')
        return r + up
