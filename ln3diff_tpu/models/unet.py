"""LDM/ADM U-Net denoiser with triplane roll-out and LSGM mixing logit.

TPU-native rewrite of ``guided_diffusion/unet.py`` (``UNetModel:427-1024``):
ResBlocks with FiLM scale-shift norm, LDM ``SpatialTransformer``
cross-attention blocks (GEGLU feed-forward, ``ldm/modules/attention.py:
343-386``; context_dim 768 — the ShapeNet/FFHQ text-conditioned path),
strided-conv ``Downsample`` / nearest+conv ``Upsample`` between levels
(reference ``resblock_updown=False`` default, ``unet.py:102-160``), and
the triplane ``roll_out`` mode where the three planes are concatenated
along width (reference ``'b (n c) h w -> b c h (n w)'``, :768-790) so
convs and attention see all planes jointly.  The LSGM ``mixing_logit``
parameter (:488-534) is exposed via a dedicated param.

Structurally 1:1 with the reference so the released ShapeNet/FFHQ joint
checkpoints convert directly (see ``conditioning/convert_ln3diff.py``
``convert_unet``); numerically verified in ``tests/test_ref_parity.py``.

Channels-last NHWC throughout.  Gradient checkpointing is the caller's
choice via ``jax.checkpoint`` around the apply (XLA remat), not baked in.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import timestep_embedding


def _norm(x, dtype, name=None, eps=1e-5):
    groups = min(32, x.shape[-1])
    while x.shape[-1] % groups:
        groups -= 1
    return nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=dtype,
                        name=name)(x)


def _conv_cls(quantized: bool):
    """nn.Conv, or the W8A8 int8 drop-in (``ops/int8.py``) for the
    opt-in quantized serving mode (weights per-out-channel, activations
    per-sample dynamic)."""
    if quantized:
        from ..ops.int8 import Int8Conv
        return Int8Conv
    return nn.Conv


def _dense_cls(quantized: bool):
    if quantized:
        from ..ops.int8 import Int8Dense
        return Int8Dense
    return nn.Dense


class ResBlock(nn.Module):
    out_channels: int
    use_scale_shift_norm: bool = True
    up: bool = False
    down: bool = False
    quantized: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        conv = _conv_cls(self.quantized)
        in_ch = x.shape[-1]
        h = _norm(x, self.dtype, 'in_norm')
        h = nn.silu(h)

        def resample(v):
            B, H, W, C = v.shape
            if self.up:
                return jax.image.resize(v, (B, 2 * H, 2 * W, C), 'nearest')
            if self.down:
                return nn.avg_pool(v, (2, 2), (2, 2))
            return v

        h = resample(h)
        x = resample(x)
        h = conv(self.out_channels, (3, 3), dtype=self.dtype,
                 name='in_conv')(h)

        emb_out = nn.Dense(
            2 * self.out_channels if self.use_scale_shift_norm
            else self.out_channels, dtype=self.dtype,
            name='emb_proj')(nn.silu(emb))[:, None, None, :]

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = _norm(h, self.dtype, 'out_norm') * (1 + scale) + shift
            h = nn.silu(h)
        else:
            h = h + emb_out
            h = nn.silu(_norm(h, self.dtype, 'out_norm'))
        h = conv(self.out_channels, (3, 3), dtype=self.dtype,
                 kernel_init=nn.initializers.zeros, name='out_conv')(h)

        if in_ch != self.out_channels:
            x = conv(self.out_channels, (1, 1), dtype=self.dtype,
                     name='skip')(x)
        return x + h


class Downsample(nn.Module):
    """Strided-conv downsample (reference ``Downsample`` with
    ``use_conv=True``): 3x3 stride-2 conv with torch's (1,1) padding."""
    out_channels: int
    quantized: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return _conv_cls(self.quantized)(
            self.out_channels, (3, 3), strides=(2, 2),
            padding=((1, 1), (1, 1)), dtype=self.dtype, name='op')(x)


class Upsample(nn.Module):
    """Nearest x2 + 3x3 conv (reference ``Upsample``)."""
    out_channels: int
    quantized: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, 2 * H, 2 * W, C), 'nearest')
        return _conv_cls(self.quantized)(
            self.out_channels, (3, 3), dtype=self.dtype, name='conv')(x)


class SelfAttention2D(nn.Module):
    """ADM AttentionBlock (used when ``use_spatial_transformer=False``)."""
    num_head_channels: int = 64
    quantized: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        conv = _conv_cls(self.quantized)
        heads = max(1, C // self.num_head_channels)
        h = _norm(x, self.dtype, 'norm')
        qkv = conv(3 * C, (1, 1), dtype=self.dtype, name='qkv')(h)
        q, k, v = jnp.split(qkv.reshape(B, H * W, 3 * C), 3, axis=-1)

        def split_heads(t):
            return t.reshape(B, H * W, heads, C // heads)

        out = jax.nn.dot_product_attention(split_heads(q), split_heads(k),
                                           split_heads(v))
        out = out.reshape(B, H, W, C)
        out = conv(C, (1, 1), dtype=self.dtype,
                   kernel_init=nn.initializers.zeros, name='proj')(out)
        return x + out


class TransformerBlock(nn.Module):
    """LDM ``BasicTransformerBlock``: self-attn, cross-attn, GEGLU ff
    (``ldm/modules/attention.py:311-341``, ``gated_ff=True``)."""
    num_heads: int
    quantized: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, context):
        B, L, C = h.shape
        dense = _dense_cls(self.quantized)
        head_dim = C // self.num_heads

        def mha(q_in, kv_in, name):
            q = dense(C, use_bias=False, dtype=self.dtype,
                      name=f'{name}_q')(q_in)
            k = dense(C, use_bias=False, dtype=self.dtype,
                      name=f'{name}_k')(kv_in)
            v = dense(C, use_bias=False, dtype=self.dtype,
                      name=f'{name}_v')(kv_in)
            out = jax.nn.dot_product_attention(
                q.reshape(B, -1, self.num_heads, head_dim),
                k.reshape(B, -1, self.num_heads, head_dim),
                v.reshape(B, -1, self.num_heads, head_dim))
            return dense(C, dtype=self.dtype, name=f'{name}_out')(
                out.reshape(B, -1, C))

        hn = nn.LayerNorm(dtype=self.dtype, name='norm1')(h)
        h = h + mha(hn, hn, 'attn1')
        hn = nn.LayerNorm(dtype=self.dtype, name='norm2')(h)
        kv = context.astype(self.dtype) if context is not None else hn
        h = h + mha(hn, kv, 'attn2')
        hn = nn.LayerNorm(dtype=self.dtype, name='norm3')(h)
        # GEGLU: proj to 2*(4C), gate with exact gelu
        ff = dense(8 * C, dtype=self.dtype, name='ff_proj')(hn)
        val, gate = jnp.split(ff, 2, axis=-1)
        ff = val * nn.gelu(gate, approximate=False)
        return h + dense(C, dtype=self.dtype, name='ff_out')(ff)


class SpatialTransformer(nn.Module):
    """LDM ``SpatialTransformer`` (``ldm/modules/attention.py:343-386``):
    GroupNorm(eps 1e-6) → 1x1 proj_in → transformer blocks → zero 1x1
    proj_out, residual.  ``inner_dim == channels`` (reference legacy
    head sizing: dim_head = ch // num_heads)."""
    num_heads: int
    context_dim: int
    depth: int = 1
    quantized: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        B, H, W, C = x.shape
        conv = _conv_cls(self.quantized)
        h = _norm(x, self.dtype, 'norm', eps=1e-6)
        h = conv(C, (1, 1), dtype=self.dtype, name='proj_in')(h)
        h = h.reshape(B, H * W, C)
        for d in range(self.depth):
            h = TransformerBlock(self.num_heads,
                                 quantized=self.quantized,
                                 dtype=self.dtype,
                                 name=f'block_{d}')(h, context)
        h = h.reshape(B, H, W, C)
        h = conv(C, (1, 1), dtype=self.dtype,
                 kernel_init=nn.initializers.zeros, name='proj_out')(h)
        return x + h


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4              # per-plane latent channels
    model_channels: int = 320
    out_channels: int = 4             # 2x for learned_range variance
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (8,)   # downsample rates
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_heads: int = 8
    num_head_channels: int = -1
    use_spatial_transformer: bool = True
    context_dim: int = 768
    transformer_depth: int = 1
    use_scale_shift_norm: bool = True
    resblock_updown: bool = False     # False → conv Down/Upsample (ref default)
    roll_out: bool = True
    mixed_prediction: bool = True
    mixing_logit_init: float = -6.0
    # serving mode: W8A8 int8 ResBlock/attention/transformer compute
    # (ops/int8.py); conv_in/conv_out and the time MLP stay bf16.
    # Opt-in -- the parity default stays bf16.
    quantized: bool = False
    dtype: Any = jnp.bfloat16


class UNetModel(nn.Module):
    cfg: UNetConfig

    def _attn(self, ds, ch, name):
        cfg = self.cfg
        if cfg.use_spatial_transformer:
            heads = cfg.num_heads if cfg.num_head_channels == -1 \
                else max(1, ch // cfg.num_head_channels)
            return SpatialTransformer(heads, cfg.context_dim,
                                      cfg.transformer_depth,
                                      quantized=cfg.quantized,
                                      dtype=cfg.dtype, name=name)
        return SelfAttention2D(
            cfg.num_head_channels if cfg.num_head_channels > 0 else
            max(1, ch // cfg.num_heads), quantized=cfg.quantized,
            dtype=cfg.dtype, name=name)

    @nn.compact
    def __call__(self, x, timesteps, context=None, control=None):
        """x: (B, H, W, 3*in_channels) when roll_out (plane-outer channel
        layout '(n c)'), else (B, H, W, in_channels).

        control: optional list of ControlNet residuals ordered
        [conv_in, *down_blocks, middle]; added to the matching skip
        activations and the middle output (reference
        ``ControlledUnetModel.forward``)."""
        cfg = self.cfg
        dt = cfg.dtype

        if cfg.mixed_prediction:
            # exposed for the trainer; not used in the forward pass itself.
            self.param('mixing_logit',
                       nn.initializers.constant(cfg.mixing_logit_init),
                       (1, 1, 1, cfg.in_channels * 3 if cfg.roll_out
                        else cfg.in_channels))

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
            # '(n c)' channel layout → concat planes along width
            x = x.reshape(B, H, W, n, c)
            x = jnp.transpose(x, (0, 1, 3, 2, 4)).reshape(B, H, n * W, c)

        x = x.astype(dt)
        h = nn.Conv(cfg.model_channels, (3, 3), dtype=dt, name='conv_in')(x)
        hs = [h]
        ds = 1
        ch = cfg.model_channels
        # down
        for level, mult in enumerate(cfg.channel_mult):
            for i in range(cfg.num_res_blocks):
                ch = cfg.model_channels * mult
                h = ResBlock(ch, cfg.use_scale_shift_norm,
                             quantized=cfg.quantized, dtype=dt,
                             name=f'down_{level}_res_{i}')(h, emb)
                if ds in cfg.attention_resolutions:
                    h = self._attn(ds, ch, f'down_{level}_attn_{i}')(
                        h, context) if cfg.use_spatial_transformer else \
                        self._attn(ds, ch, f'down_{level}_attn_{i}')(h)
                hs.append(h)
            if level != len(cfg.channel_mult) - 1:
                if cfg.resblock_updown:
                    h = ResBlock(ch, cfg.use_scale_shift_norm, down=True,
                                 quantized=cfg.quantized, dtype=dt,
                                 name=f'down_{level}_downsample')(h, emb)
                else:
                    h = Downsample(ch, quantized=cfg.quantized, dtype=dt,
                                   name=f'down_{level}_downsample')(h)
                hs.append(h)
                ds *= 2

        # middle
        h = ResBlock(ch, cfg.use_scale_shift_norm,
                     quantized=cfg.quantized, dtype=dt,
                     name='mid_res_1')(h, emb)
        h = self._attn(ds, ch, 'mid_attn')(h, context) \
            if cfg.use_spatial_transformer else \
            self._attn(ds, ch, 'mid_attn')(h)
        h = ResBlock(ch, cfg.use_scale_shift_norm,
                     quantized=cfg.quantized, dtype=dt,
                     name='mid_res_2')(h, emb)

        if control is not None:
            assert len(control) == len(hs) + 1, (len(control), len(hs))
            h = h + control[-1].astype(h.dtype)
            hs = [s + c.astype(s.dtype) for s, c in zip(hs, control[:-1])]

        # up
        for level in reversed(range(len(cfg.channel_mult))):
            for i in range(cfg.num_res_blocks + 1):
                ch = cfg.model_channels * cfg.channel_mult[level]
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = ResBlock(ch, cfg.use_scale_shift_norm,
                             quantized=cfg.quantized, dtype=dt,
                             name=f'up_{level}_res_{i}')(h, emb)
                if ds in cfg.attention_resolutions:
                    h = self._attn(ds, ch, f'up_{level}_attn_{i}')(
                        h, context) if cfg.use_spatial_transformer else \
                        self._attn(ds, ch, f'up_{level}_attn_{i}')(h)
                if level and i == cfg.num_res_blocks:
                    if cfg.resblock_updown:
                        h = ResBlock(ch, cfg.use_scale_shift_norm, up=True,
                                     quantized=cfg.quantized, dtype=dt,
                                     name=f'up_{level}_upsample')(h, emb)
                    else:
                        h = Upsample(ch, quantized=cfg.quantized,
                                     dtype=dt,
                                     name=f'up_{level}_upsample')(h)
                    ds //= 2

        h = nn.silu(_norm(h, dt, 'out_norm'))
        h = nn.Conv(cfg.out_channels, (3, 3), dtype=dt,
                    kernel_init=nn.initializers.zeros, name='conv_out')(h)

        if cfg.roll_out:
            B, H, nW, c = h.shape
            n = 3
            W = nW // n
            h = h.reshape(B, H, n, W, c)
            h = jnp.transpose(h, (0, 1, 3, 2, 4)).reshape(B, H, W, n * c)

        return h.astype(jnp.float32)
