"""Rodin roll-out convolution super-resolution (ShapeNet/FFHQ VAE heads).

TPU-native rewrite of the reference's Rodin-style triplane SR stack
(``vit/vision_transformer.py``: ``RodinRollOutConv3D_GroupConv:639``,
``RodinRollOut_GroupConv_noConv3D:709``,
``RodinConv3D4X_lite_mlp_as_residual:1047`` and ``_lite:1202``).

Channels-last NHWC with plane-major 3C channels.  The reference forward
carries two absorbed quirks that the released weights depend on and that
are therefore reproduced exactly rather than cleaned up:

  * the conv path transposes H and W before the convs
    (``x.permute(0, 1, 3, 2)`` on (B, 3C, h, w), components at
    ``vision_transformer.py:1138-1140``) while the residual path does
    not;
  * the linear shortcut views the (plane-major) 3C channels as (C, 3)
    with plane fastest (``shortcut_unpatchify_triplane:1082-1108``).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _roll_out_3d(x: jax.Array) -> jax.Array:
    """(B, H, W, 3C) plane-major → (B, H, W, 9C): for each plane i,
    concat [plane_i, mean_W(plane_{i+1}) bcast, mean_H(plane_{i+2})
    bcast] (reference ``RodinRollOutConv3D_GroupConv.forward``)."""
    B, H, W, C3 = x.shape
    C = C3 // 3
    planes = x.reshape(B, H, W, 3, C)
    groups = []
    for i in range(3):
        xy = planes[..., i, :]
        yz = planes[..., (i + 1) % 3, :].mean(axis=2, keepdims=True)
        yz = jnp.broadcast_to(yz, (B, H, W, C))
        zx = planes[..., (i + 2) % 3, :].mean(axis=1, keepdims=True)
        zx = jnp.broadcast_to(zx, (B, H, W, C))
        groups.append(jnp.concatenate([xy, yz, zx], axis=-1))
    return jnp.concatenate(groups, axis=-1)


class RodinRollOutConv3D(nn.Module):
    """Grouped conv over the 3D-rolled-out planes (groups=3)."""
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = _roll_out_3d(x)
        return nn.Conv(self.out_channels, (3, 3), feature_group_count=3,
                       dtype=self.dtype, name='conv')(h)


class RodinGroupConv(nn.Module):
    """Per-plane grouped conv, no 3D pooling
    (``RodinRollOut_GroupConv_noConv3D``)."""
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.out_channels, (3, 3), feature_group_count=3,
                       dtype=self.dtype, name='conv')(x)


def _resize_bilinear(x: jax.Array, res: int) -> jax.Array:
    B, H, W, C = x.shape
    if H == res and W == res:
        return x
    # torch F.interpolate(..., 'bilinear', align_corners=False,
    # antialias=True): antialias is inactive when upsampling, which is
    # the only direction exercised here (64 → 256).
    return jax.image.resize(x, (B, res, res, C), method='bilinear')


class RodinConv3D4XResidual(nn.Module):
    """``RodinConv3D4X_lite_mlp_as_residual`` (``lite=True`` replaces the
    first 3D conv with a per-plane grouped conv, the released ShapeNet
    conv_sr — ``vit_triplane.py:858``).  in (B, h, w, 3Cin) → out
    (B, R, R, 3Cout) at ``input_resolution`` R."""
    in_channels: int                  # 3*Cin
    out_channels: int                 # 3*Cout
    input_resolution: int = 256
    lite: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, h, w, C3 = x.shape
        cin, cout = self.in_channels // 3, self.out_channels // 3

        if self.in_channels != self.out_channels:
            # linear shortcut: channels viewed (Cin, 3) plane-fastest
            s = x.reshape(B, h * w, cin, 3)
            s = jnp.transpose(s, (0, 3, 1, 2))          # B 3 L Cin
            s = nn.Dense(cout, dtype=self.dtype, name='short_cut')(s)
            s = jnp.transpose(s, (0, 1, 3, 2))          # B 3 Cout L
            s = s.reshape(B, 3 * cout, h, w)            # plane-major chans
            s = jnp.transpose(s, (0, 2, 3, 1))          # back to NHWC
            res = _resize_bilinear(s, self.input_resolution)
        else:
            res = _resize_bilinear(x, self.input_resolution)

        # conv path: reference transposes H/W before the convs
        xt = jnp.transpose(x, (0, 2, 1, 3))
        xt = _resize_bilinear(xt, self.input_resolution)

        conv0 = (RodinGroupConv(self.out_channels, dtype=self.dtype,
                                name='conv3D_0') if self.lite else
                 RodinRollOutConv3D(self.out_channels, dtype=self.dtype,
                                    name='conv3D_0'))
        x0 = res + nn.leaky_relu(conv0(xt), 0.01)
        x1 = RodinRollOutConv3D(self.out_channels, dtype=self.dtype,
                                name='conv3D_1')(x0)
        return x0 + nn.leaky_relu(x1, 0.01)
