"""LGM-style multi-view U-Net and encoder (alt VAE encoder family).

TPU-native re-design of the reference's LGM path
(`/root/reference/ldm/modules/diffusionmodules/mv_unet.py:16-456`,
selected by ``'lgm' in dino_version`` at
`/root/reference/nsr/script_util.py:1297-1305`):

- ``MVAttention`` — joint attention over all views' spatial tokens
  (fold (B·V, H, W, C) → (B, V·H·W, C), one flash-SDPA call).
- ``ResnetBlock`` / ``DownBlock`` / ``MidBlock`` / ``UpBlock`` with the
  LGM ``skip_scale = sqrt(0.5)`` residual scaling.
- ``MVUNet`` — the full (possibly asymmetric) U-Net.
- ``LGMMVEncoder`` — encoder-only variant: down path + mid block →
  per-view ``conv_out`` to 2·z moments → concat views → ``fusion_layer``
  conv pooling (pixel-NeRF-style aggregation).

Everything is NHWC and jit-friendly (static view count folded into the
batch axis).

Note on reference fidelity: the reference ``LGM_MVEncoder.forward`` is
*unfinished* — it contains a leftover ``pdb.set_trace()`` and never
applies ``conv_out``, so its ``fusion_layer`` (declared for
``2·z·num_frames`` input channels) cannot receive the 1024-channel mid
features it is handed (`mv_unet.py:438-456`).  This implementation
realizes the evident intent (conv_out per view, then conv-pool fusion
across views), which is the only channel-consistent reading.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def swish(x):
    return x * jax.nn.sigmoid(x)


class MVAttention(nn.Module):
    """Self-attention jointly over every view's spatial tokens.

    Reference ``MVAttention`` (`mv_unet.py:16-61`): GroupNorm → fold
    views into the sequence axis → MHA → residual, all scaled by
    ``skip_scale``.
    """
    dim: int
    num_heads: int = 16
    num_frames: int = 4
    skip_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        BV, H, W, C = x.shape
        B = BV // self.num_frames
        res = x
        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype)(x)
        tokens = h.reshape(B, self.num_frames * H * W, C)
        qkv = nn.DenseGeneral((3, self.num_heads, C // self.num_heads),
                              use_bias=False, dtype=self.dtype,
                              name='qkv')(tokens)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        o = jax.nn.dot_product_attention(q, k, v)
        o = nn.DenseGeneral(C, axis=(-2, -1), use_bias=True,
                            dtype=self.dtype, name='proj')(o)
        o = o.reshape(BV, H, W, C)
        return (o + res) * self.skip_scale


class ResnetBlock(nn.Module):
    """GN → silu → (resample) → conv ×2 with scaled skip
    (reference `mv_unet.py:64-135`)."""
    out_channels: int
    resample: str = 'default'          # 'default' | 'up' | 'down'
    skip_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        res = x
        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype)(x)
        h = swish(h)
        if self.resample == 'up':
            def up2(t):
                B, H, W, C = t.shape
                return jax.image.resize(t, (B, 2 * H, 2 * W, C), 'nearest')
            res, h = up2(res), up2(h)
        elif self.resample == 'down':
            def down2(t):
                return nn.avg_pool(t, (2, 2), strides=(2, 2))
            res, h = down2(res), down2(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                    name='conv1')(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype)(h)
        h = swish(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                    name='conv2')(h)
        if res.shape[-1] != self.out_channels:
            res = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                          name='shortcut')(res)
        return (h + res) * self.skip_scale


class DownBlock(nn.Module):
    """num_layers × (resnet [+ mv-attn]) then strided-conv downsample.
    Returns (x, per-layer skips) like the reference (`mv_unet.py:138-189`)."""
    out_channels: int
    num_layers: int = 1
    downsample: bool = True
    attention: bool = True
    attention_heads: int = 16
    num_frames: int = 4
    skip_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        skips = []
        for i in range(self.num_layers):
            x = ResnetBlock(self.out_channels, skip_scale=self.skip_scale,
                            dtype=self.dtype, name=f'net{i}')(x)
            if self.attention:
                x = MVAttention(self.out_channels, self.attention_heads,
                                self.num_frames, self.skip_scale,
                                dtype=self.dtype, name=f'attn{i}')(x)
            skips.append(x)
        if self.downsample:
            x = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                        dtype=self.dtype, name='downsample')(x)
            skips.append(x)
        return x, skips


class MidBlock(nn.Module):
    """resnet, then num_layers × (mv-attn? → resnet)
    (reference `mv_unet.py:192-229`)."""
    channels: int
    num_layers: int = 1
    attention: bool = True
    attention_heads: int = 16
    num_frames: int = 4
    skip_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ResnetBlock(self.channels, skip_scale=self.skip_scale,
                        dtype=self.dtype, name='net0')(x)
        for i in range(self.num_layers):
            if self.attention:
                x = MVAttention(self.channels, self.attention_heads,
                                self.num_frames, self.skip_scale,
                                dtype=self.dtype, name=f'attn{i}')(x)
            x = ResnetBlock(self.channels, skip_scale=self.skip_scale,
                            dtype=self.dtype, name=f'net{i + 1}')(x)
        return x


class UpBlock(nn.Module):
    """num_layers × (concat skip → resnet [+ mv-attn]) then nearest-2×
    upsample + conv (reference `mv_unet.py:232-288`)."""
    out_channels: int
    num_layers: int = 1
    upsample: bool = True
    attention: bool = True
    attention_heads: int = 16
    num_frames: int = 4
    skip_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skips):
        for i in range(self.num_layers):
            x = jnp.concatenate([x, skips[-1 - i]], axis=-1)
            x = ResnetBlock(self.out_channels, skip_scale=self.skip_scale,
                            dtype=self.dtype, name=f'net{i}')(x)
            if self.attention:
                x = MVAttention(self.out_channels, self.attention_heads,
                                self.num_frames, self.skip_scale,
                                dtype=self.dtype, name=f'attn{i}')(x)
        if self.upsample:
            B, H, W, C = x.shape
            x = jax.image.resize(x, (B, 2 * H, 2 * W, C), 'nearest')
            x = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                        name='upsample')(x)
        return x


@dataclasses.dataclass(frozen=True)
class MVUNetConfig:
    in_channels: int = 9               # LGM: RGB + Plücker
    out_channels: int = 3
    down_channels: Tuple[int, ...] = (64, 128, 256, 512, 1024)
    down_attention: Tuple[bool, ...] = (False, False, False, True, True)
    mid_attention: bool = True
    up_channels: Tuple[int, ...] = (1024, 512, 256)
    up_attention: Tuple[bool, ...] = (True, True, False)
    layers_per_block: int = 2
    skip_scale: float = float(np.sqrt(0.5))
    num_frames: int = 4
    dtype: Any = jnp.float32


class MVUNet(nn.Module):
    """Full multi-view U-Net (reference `mv_unet.py:292-397`).

    Asymmetric: fewer up stages than down stages is allowed (the LGM
    splat generator decodes at a lower resolution than the input).
    Input/output are view-folded: (B·V, H, W, C).
    """
    cfg: MVUNetConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        x = nn.Conv(cfg.down_channels[0], (3, 3), dtype=cfg.dtype,
                    name='conv_in')(x)
        skips = [x]
        for i, ch in enumerate(cfg.down_channels):
            last = i == len(cfg.down_channels) - 1
            x, s = DownBlock(ch, cfg.layers_per_block, downsample=not last,
                             attention=cfg.down_attention[i],
                             num_frames=cfg.num_frames,
                             skip_scale=cfg.skip_scale, dtype=cfg.dtype,
                             name=f'down{i}')(x)
            skips.extend(s)
        x = MidBlock(cfg.down_channels[-1], attention=cfg.mid_attention,
                     num_frames=cfg.num_frames, skip_scale=cfg.skip_scale,
                     dtype=cfg.dtype, name='mid')(x)
        for i, ch in enumerate(cfg.up_channels):
            last = i == len(cfg.up_channels) - 1
            n = cfg.layers_per_block + 1
            x = UpBlock(ch, n, upsample=not last,
                        attention=cfg.up_attention[i],
                        num_frames=cfg.num_frames,
                        skip_scale=cfg.skip_scale, dtype=cfg.dtype,
                        name=f'up{i}')(x, skips[-n:])
            skips = skips[:-n]
        x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=cfg.dtype)(x)
        x = swish(x)
        return nn.Conv(cfg.out_channels, (3, 3), dtype=cfg.dtype,
                       name='conv_out')(x)


class LGMMVEncoder(nn.Module):
    """Encoder-only MVUNet with pixel-NeRF-style cross-view conv pooling
    (reference `mv_unet.py:400-456`; see module docstring for the
    reference-bug note).

    (B·V, H, W, C_in) → (B, H/2^(D-1), W/2^(D-1), 2·z_channels) moments,
    drop-in for the SD ``MVEncoder`` in ``TriplaneVAE``.
    """
    cfg: MVUNetConfig
    z_channels: int = 12
    double_z: bool = True

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        zc = 2 * self.z_channels if self.double_z else self.z_channels
        x = nn.Conv(cfg.down_channels[0], (3, 3), dtype=cfg.dtype,
                    name='conv_in')(x)
        for i, ch in enumerate(cfg.down_channels):
            last = i == len(cfg.down_channels) - 1
            x, _ = DownBlock(ch, cfg.layers_per_block, downsample=not last,
                             attention=cfg.down_attention[i],
                             num_frames=cfg.num_frames,
                             skip_scale=cfg.skip_scale, dtype=cfg.dtype,
                             name=f'down{i}')(x)
        x = MidBlock(cfg.down_channels[-1], attention=cfg.mid_attention,
                     num_frames=cfg.num_frames, skip_scale=cfg.skip_scale,
                     dtype=cfg.dtype, name='mid')(x)
        # per-view moments, then conv pooling across the view group
        x = nn.Conv(zc, (3, 3), dtype=cfg.dtype, name='conv_out')(x)
        BV, H, W, C = x.shape
        V = cfg.num_frames
        x = x.reshape(BV // V, V, H, W, C)
        x = jnp.moveaxis(x, 1, 3).reshape(BV // V, H, W, V * C)
        return nn.Conv(zc, (3, 3), dtype=cfg.dtype, name='fusion_layer')(x)
