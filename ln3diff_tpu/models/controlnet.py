"""ControlNet: zero-conv controlled U-Net branch.

Rewrite of ``cldm/cldm.py`` (``ControlNet`` + ``ControlledUnetModel``,
:1-456): a trainable copy of the U-Net's down/middle path consumes a hint
image through a conv hint-encoder; its per-level outputs pass through
zero-initialized 1x1 convs and are added to the frozen base U-Net's skip
activations.  Used for the image-conditioned ShapeNet experiment.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import timestep_embedding
from .unet import (Downsample, ResBlock, SpatialTransformer, UNetConfig,
                   _norm)


def _zero_conv(ch, dtype, name):
    return nn.Conv(ch, (1, 1), dtype=dtype,
                   kernel_init=nn.initializers.zeros,
                   bias_init=nn.initializers.zeros, name=name)


class HintEncoder(nn.Module):
    """8-layer conv encoder mapping the hint image (B, H, W, C) down to
    the latent resolution (reference ``input_hint_block``)."""
    model_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hint):
        chans = (16, 16, 32, 32, 96, 96, 256)
        x = hint.astype(self.dtype)
        for i, ch in enumerate(chans):
            stride = 2 if i in (2, 4, 6) else 1
            x = nn.Conv(ch, (3, 3), strides=(stride, stride),
                        dtype=self.dtype, name=f'conv_{i}')(x)
            x = nn.silu(x)
        return _zero_conv(self.model_channels, self.dtype, 'conv_out')(x)


class ControlNet(nn.Module):
    """Control branch: U-Net down+middle path with zero-conv taps.

    Returns the list of control residuals (one per skip activation plus
    the middle block), to be added inside ``UNetModel`` via its
    ``control`` argument.
    """
    cfg: UNetConfig

    @nn.compact
    def __call__(self, x, hint, timesteps, context=None):
        cfg = self.cfg
        dt = cfg.dtype
        if isinstance(context, dict):
            context = context.get('crossattn')

        t_emb = timestep_embedding(timesteps, cfg.model_channels).astype(dt)
        emb = nn.Dense(4 * cfg.model_channels, dtype=dt, name='time_fc1')(
            t_emb)
        emb = nn.Dense(4 * cfg.model_channels, dtype=dt,
                       name='time_fc2')(nn.silu(emb))

        if cfg.roll_out:
            B, H, W, C3 = x.shape
            n = 3
            c = C3 // n
            x = x.reshape(B, H, W, n, c)
            x = jnp.transpose(x, (0, 1, 3, 2, 4)).reshape(B, H, n * W, c)
            if hint.shape[2] != n * W:
                hint = jnp.tile(hint, (1, 1, n, 1))

        x = x.astype(dt)
        guided = HintEncoder(cfg.model_channels, dtype=dt,
                             name='hint_encoder')(hint)
        if guided.shape[1:3] != x.shape[1:3]:
            guided = jax.image.resize(
                guided, (guided.shape[0], x.shape[1], x.shape[2],
                         guided.shape[-1]), 'bilinear')

        h = nn.Conv(cfg.model_channels, (3, 3), dtype=dt, name='conv_in')(x)
        h = h + guided
        controls = [_zero_conv(h.shape[-1], dt, 'zero_0')(h)]
        ds = 1
        ch = cfg.model_channels
        zi = 1
        for level, mult in enumerate(cfg.channel_mult):
            for i in range(cfg.num_res_blocks):
                ch = cfg.model_channels * mult
                h = ResBlock(ch, cfg.use_scale_shift_norm, dtype=dt,
                             name=f'down_{level}_res_{i}')(h, emb)
                if ds in cfg.attention_resolutions:
                    heads = cfg.num_heads
                    h = SpatialTransformer(heads, cfg.context_dim,
                                           cfg.transformer_depth, dtype=dt,
                                           name=f'down_{level}_attn_{i}')(
                                               h, context)
                controls.append(_zero_conv(ch, dt, f'zero_{zi}')(h))
                zi += 1
            if level != len(cfg.channel_mult) - 1:
                if cfg.resblock_updown:
                    h = ResBlock(ch, cfg.use_scale_shift_norm, down=True,
                                 dtype=dt,
                                 name=f'down_{level}_downsample')(h, emb)
                else:
                    h = Downsample(ch, dtype=dt,
                                   name=f'down_{level}_downsample')(h)
                controls.append(_zero_conv(ch, dt, f'zero_{zi}')(h))
                zi += 1
                ds *= 2

        h = ResBlock(ch, cfg.use_scale_shift_norm, dtype=dt,
                     name='mid_res_1')(h, emb)
        h = SpatialTransformer(cfg.num_heads, cfg.context_dim,
                               cfg.transformer_depth, dtype=dt,
                               name='mid_attn')(h, context)
        h = ResBlock(ch, cfg.use_scale_shift_norm, dtype=dt,
                     name='mid_res_2')(h, emb)
        controls.append(_zero_conv(ch, dt, 'zero_mid')(h))
        return controls
