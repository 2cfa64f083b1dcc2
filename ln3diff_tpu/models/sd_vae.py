"""Stable-Diffusion-style conv Encoder/Decoder + multi-view encoder.

TPU-native rewrite of ``ldm/modules/diffusionmodules/model.py``:
``ResnetBlock:95``, ``AttnBlock``/``make_attn:284``, ``Encoder:459``,
``Decoder:625``, ``MVEncoder:563`` (4-view conv-pool fusion) and
``MVEncoderGSDynamicInp:603`` (mean-pool over dynamic view counts).

Channels-last NHWC; GroupNorm(32, eps=1e-6); swish nonlinearity.  The
multi-view attention (reference ``SpatialTransformer3D`` selected by
``attn_type='mv-vanilla'``) becomes joint self-attention over all views'
tokens, which XLA fuses on the MXU.

Flagship (Objaverse) encoder config — reference ``nsr/script_util.py:1321``:
ch=64, ch_mult=(1,2,4,4), num_res_blocks=1, attn_resolutions=(),
z_channels=12, double_z=True, in 256x256 → moments 32x32x24.
The VAE's ``conv_sr`` upsampler reuses ``Decoder`` (reference
``vit/vit_triplane.py:1554``: ch=32, ch_mult=(1,2,2,4), num_res_blocks=1).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def swish(x):
    return x * jax.nn.sigmoid(x)


class GroupNorm32(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        groups = min(32, x.shape[-1])
        while x.shape[-1] % groups:
            groups -= 1
        return nn.GroupNorm(num_groups=groups, epsilon=1e-6,
                            dtype=self.dtype)(x)


class ResnetBlock(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = GroupNorm32(self.dtype, name='norm1')(x)
        h = swish(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                    name='conv1')(h)
        h = GroupNorm32(self.dtype, name='norm2')(h)
        h = swish(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                    name='conv2')(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name='nin_shortcut')(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention with 1x1 convs (reference
    ``AttnBlock``, the SD 'vanilla' attention used in ``Decoder`` and
    plain ``Encoder``)."""
    num_views: int = 1   # joint-view tokens (legacy; release archs use MVAttn)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = GroupNorm32(self.dtype, name='norm')(x)
        q = nn.Conv(C, (1, 1), dtype=self.dtype, name='q')(h)
        k = nn.Conv(C, (1, 1), dtype=self.dtype, name='k')(h)
        v = nn.Conv(C, (1, 1), dtype=self.dtype, name='v')(h)

        V = self.num_views
        # tokens per attention group: V*H*W (joint over views)
        def tokens(t):
            return t.reshape(B // V, V * H * W, 1, C)

        out = jax.nn.dot_product_attention(tokens(q), tokens(k), tokens(v))
        out = out.reshape(B, H, W, C)
        out = nn.Conv(C, (1, 1), dtype=self.dtype, name='proj_out')(out)
        return x + out


class MVAttn(nn.Module):
    """Multi-view transformer attention — the reference's 'mv-vanilla'
    ``SpatialTransformer3D`` (``ldm/modules/attention.py:405-463``) with
    ``BasicTransformerBlock3D`` blocks (:390-402): attn1 jointly over all
    views' tokens, attn2 per-view self-attention, GEGLU feed-forward.
    ``inner_dim = num_heads * dim_head`` (8*64 for the release encoders),
    1x1 proj_in/out with zero-init proj_out, residual."""
    num_views: int
    num_heads: int = 8
    dim_head: int = 64
    depth: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        inner = self.num_heads * self.dim_head
        V = self.num_views
        h = GroupNorm32(self.dtype, name='norm')(x)
        h = nn.Conv(inner, (1, 1), dtype=self.dtype, name='proj_in')(h)
        h = h.reshape(B, H * W, inner)

        def mha(q_in, kv_in, name):
            q = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                         name=f'{name}_q')(q_in)
            k = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                         name=f'{name}_k')(kv_in)
            v = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                         name=f'{name}_v')(kv_in)
            n = q_in.shape[0]
            out = jax.nn.dot_product_attention(
                q.reshape(n, -1, self.num_heads, self.dim_head),
                k.reshape(n, -1, self.num_heads, self.dim_head),
                v.reshape(n, -1, self.num_heads, self.dim_head))
            return nn.Dense(inner, dtype=self.dtype, name=f'{name}_out')(
                out.reshape(n, -1, inner))

        for d in range(self.depth):
            blk = f'block_{d}'
            # attn1: joint over views — (b f) l c -> b (f l) c
            hj = h.reshape(B // V, V * H * W, inner)
            hn = nn.LayerNorm(dtype=self.dtype, name=f'{blk}_norm1')(hj)
            hj = hj + mha(hn, hn, f'{blk}_attn1')
            h = hj.reshape(B, H * W, inner)
            # attn2: per-view self-attention
            hn = nn.LayerNorm(dtype=self.dtype, name=f'{blk}_norm2')(h)
            h = h + mha(hn, hn, f'{blk}_attn2')
            hn = nn.LayerNorm(dtype=self.dtype, name=f'{blk}_norm3')(h)
            ff = nn.Dense(8 * inner, dtype=self.dtype,
                          name=f'{blk}_ff_proj')(hn)
            val, gate = jnp.split(ff, 2, axis=-1)
            ff = val * nn.gelu(gate, approximate=False)
            h = h + nn.Dense(inner, dtype=self.dtype,
                             name=f'{blk}_ff_out')(ff)

        h = h.reshape(B, H, W, inner)
        h = nn.Conv(C, (1, 1), dtype=self.dtype,
                    kernel_init=nn.initializers.zeros, name='proj_out')(h)
        return x + h


class Downsample(nn.Module):
    """Conv stride-2 with the reference's asymmetric (0,1,0,1) pad."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(C, (3, 3), strides=(2, 2), padding='VALID',
                       dtype=self.dtype, name='conv')(x)


class Upsample(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, 2 * H, 2 * W, C), method='nearest')
        return nn.Conv(C, (3, 3), dtype=self.dtype, name='conv')(x)


@dataclasses.dataclass(frozen=True)
class AutoencoderConfig:
    ch: int = 64
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 1
    attn_resolutions: Sequence[int] = ()
    resolution: int = 256
    z_channels: int = 12
    double_z: bool = True
    out_ch: int = 3
    num_views: int = 1            # >1 → multi-view attention in the mid block
    attn_heads: int = 8           # mv-vanilla SpatialTransformer3D heads
    attn_dim_head: int = 64       # reference nsr/script_util.py:1311-1314
    dtype: Any = jnp.float32


class Encoder(nn.Module):
    """SD conv encoder (reference ``Encoder:459``). Input (B, H, W, C_in);
    output moments (B, H/8, W/8, 2*z) when double_z."""
    cfg: AutoencoderConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dt = cfg.dtype
        num_resolutions = len(cfg.ch_mult)
        curr_res = cfg.resolution

        h = nn.Conv(cfg.ch, (3, 3), dtype=dt, name='conv_in')(x)
        for i_level in range(num_resolutions):
            block_out = cfg.ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks):
                h = ResnetBlock(block_out, dtype=dt,
                                name=f'down_{i_level}_block_{i_block}')(h)
                if curr_res in cfg.attn_resolutions:
                    if cfg.num_views > 1:
                        h = MVAttn(cfg.num_views, cfg.attn_heads,
                                   cfg.attn_dim_head, dtype=dt,
                                   name=f'down_{i_level}_attn_{i_block}')(h)
                    else:
                        h = AttnBlock(1, dtype=dt,
                                      name=f'down_{i_level}_attn_{i_block}')(h)
            if i_level != num_resolutions - 1:
                h = Downsample(dtype=dt, name=f'down_{i_level}_downsample')(h)
                curr_res //= 2

        h = ResnetBlock(h.shape[-1], dtype=dt, name='mid_block_1')(h)
        if cfg.num_views > 1:
            h = MVAttn(cfg.num_views, cfg.attn_heads, cfg.attn_dim_head,
                       dtype=dt, name='mid_attn_1')(h)
        else:
            h = AttnBlock(1, dtype=dt, name='mid_attn_1')(h)
        h = ResnetBlock(h.shape[-1], dtype=dt, name='mid_block_2')(h)

        h = GroupNorm32(dt, name='norm_out')(h)
        h = swish(h)
        out_c = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return nn.Conv(out_c, (3, 3), dtype=dt, name='conv_out')(h)


class Decoder(nn.Module):
    """SD conv decoder (reference ``Decoder:625``); upsamples by
    2^(len(ch_mult)-1).  Input (B, h, w, z_channels)."""
    cfg: AutoencoderConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        dt = cfg.dtype
        num_resolutions = len(cfg.ch_mult)
        block_in = cfg.ch * cfg.ch_mult[-1]

        h = nn.Conv(block_in, (3, 3), dtype=dt, name='conv_in')(z)
        h = ResnetBlock(block_in, dtype=dt, name='mid_block_1')(h)
        h = AttnBlock(1, dtype=dt, name='mid_attn_1')(h)
        h = ResnetBlock(block_in, dtype=dt, name='mid_block_2')(h)

        for i_level in reversed(range(num_resolutions)):
            block_out = cfg.ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks + 1):
                h = ResnetBlock(block_out, dtype=dt,
                                name=f'up_{i_level}_block_{i_block}')(h)
            if i_level != 0:
                h = Upsample(dtype=dt, name=f'up_{i_level}_upsample')(h)

        h = GroupNorm32(dt, name='norm_out')(h)
        h = swish(h)
        return nn.Conv(cfg.out_ch, (3, 3), dtype=dt, name='conv_out')(h)


class MVEncoder(nn.Module):
    """Multi-view encoder: shared conv encoder per view with joint
    mid-attention, then 4-view conv-pool fusion (reference
    ``MVEncoder:563-578``).  Input (B*V, H, W, C); output (B, h, w, 2z)."""
    cfg: AutoencoderConfig
    num_frames: int = 4

    @nn.compact
    def __call__(self, x):
        cfg = dataclasses.replace(self.cfg, num_views=self.num_frames)
        h = Encoder(cfg, name='encoder')(x)
        BV, hh, ww, C = h.shape
        V = self.num_frames
        # Fuse views by channel concat + conv (conv pooling).
        h = h.reshape(BV // V, V, hh, ww, C)
        h = jnp.transpose(h, (0, 2, 3, 1, 4)).reshape(BV // V, hh, ww, V * C)
        return nn.Conv(C, (3, 3), dtype=cfg.dtype, name='fusion_layer')(h)


class MVEncoderDynamic(nn.Module):
    """Dynamic-view-count encoder: mean-pool view features (reference
    ``MVEncoderGSDynamicInp:603-624``)."""
    cfg: AutoencoderConfig
    num_frames: int = 8

    @nn.compact
    def __call__(self, x):
        cfg = dataclasses.replace(self.cfg, num_views=self.num_frames)
        h = Encoder(cfg, name='encoder')(x)
        BV, hh, ww, C = h.shape
        V = self.num_frames
        return h.reshape(BV // V, V, hh, ww, C).mean(axis=1)
