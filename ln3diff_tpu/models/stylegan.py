"""StyleGAN2 building blocks: upfirdn2d, modulated conv, SR heads,
discriminators.

TPU-native rewrite of the reference's StyleGAN lineage — the CUDA ops
(``utils/torch_utils/ops/upfirdn2d.cu``, ``bias_act.cu``,
``conv2d_gradfix``) become plain jnp convolutions that XLA fuses; JAX
autodiff replaces the hand-written double-backward tricks (needed there
only for the R1 penalty under cuDNN):

  * ``upfirdn2d`` / ``upsample2d`` / ``downsample2d`` — FIR resampling
    (reference ``upfirdn2d.py:132-473``).
  * ``modulated_conv2d`` — style-modulated, demodulated conv
    (reference ``nsr/networks_stylegan2.py``).
  * ``SynthesisBlockLite`` / ``SuperresolutionHybrid`` — the FFHQ
    render-space SR heads (reference ``nsr/superresolution.py:181-446``).
  * ``StyleGANDiscriminator`` — conv discriminator with minibatch stddev,
    used by the GAN VAE trainer (reference ``nsr/dual_discriminator.py``).

Channels-last NHWC.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import EqualDense


def setup_filter(f=(1, 3, 3, 1), normalize=True) -> jnp.ndarray:
    """2D separable FIR filter from 1D taps (reference
    ``upfirdn2d.setup_filter``)."""
    f = np.asarray(f, np.float32)
    if f.ndim == 1:
        f = np.outer(f, f)
    if normalize:
        f = f / f.sum()
    return jnp.asarray(f)


def upfirdn2d(x: jax.Array, f: jax.Array, up: int = 1, down: int = 1,
              padding=(0, 0, 0, 0), gain: float = 1.0) -> jax.Array:
    """Upsample (zero-stuff) → FIR filter → downsample.

    x: (B, H, W, C); f: (fh, fw); padding: (px0, px1, py0, py1).
    Matches reference ``_upfirdn2d_ref`` semantics (filter applied
    flipped, i.e. correlation with the flipped kernel = convolution).
    """
    B, H, W, C = x.shape
    px0, px1, py0, py1 = padding

    if up > 1:
        z = jnp.zeros((B, H, up, W, up, C), x.dtype)
        z = z.at[:, :, 0, :, 0, :].set(x)
        x = z.reshape(B, H * up, W * up, C)
    x = jnp.pad(x, ((0, 0), (max(py0, 0), max(py1, 0)),
                    (max(px0, 0), max(px1, 0)), (0, 0)))
    if min(px0, px1, py0, py1) < 0:
        x = x[:, max(-py0, 0):x.shape[1] - max(-py1, 0),
              max(-px0, 0):x.shape[2] - max(-px1, 0)]

    fh, fw = f.shape
    kernel = (f * (gain * (up**2)))[::-1, ::-1]
    kernel = jnp.tile(kernel[:, :, None, None].astype(x.dtype), (1, 1, 1, C))
    x = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), 'VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'), feature_group_count=C)
    if down > 1:
        x = x[:, ::down, ::down]
    return x


def upsample2d(x, f, up: int = 2, gain: float = 1.0):
    fh, fw = f.shape
    p = ((fw + up - 1) // 2, (fw - up) // 2, (fh + up - 1) // 2,
         (fh - up) // 2)
    return upfirdn2d(x, f, up=up, padding=p, gain=gain)


def downsample2d(x, f, down: int = 2, gain: float = 1.0):
    fh, fw = f.shape
    p = ((fw - down + 1) // 2, (fw - down) // 2, (fh - down + 1) // 2,
         (fh - down) // 2)
    return upfirdn2d(x, f, down=down, padding=p, gain=gain)


def filtered_resizing(img: jax.Array, size: int, f: jax.Array) -> jax.Array:
    """Antialiased resize to ``size`` (reference ``dual_discriminator.py:
    filtered_resizing`` — used to match real/fake resolutions)."""
    H = img.shape[1]
    if size == H:
        return img
    if size > H and size % H == 0:
        return upsample2d(img, f, up=size // H)
    if size < H and H % size == 0:
        return downsample2d(img, f, down=H // size)
    return jax.image.resize(img, (img.shape[0], size, size, img.shape[-1]),
                            'bilinear')


def modulated_conv2d(x: jax.Array, weight: jax.Array, styles: jax.Array,
                     demodulate: bool = True, up: int = 1,
                     f: Optional[jax.Array] = None) -> jax.Array:
    """Style-modulated conv (reference ``networks_stylegan2.py``
    ``modulated_conv2d`` + ``conv2d_resample`` up-path), grouped-batch
    formulation.

    x: (B, H, W, Cin); weight: (kh, kw, Cin, Cout); styles: (B, Cin).

    ``up=2`` reproduces the reference exactly (verified vs
    ``conv2d_resample(up=2, padding=k//2)``): input-dilated *flipped*
    convolution followed by the FIR filter with gain up².
    """
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape

    w = weight[None] * styles[:, None, None, :, None]       # (B,kh,kw,Ci,Co)
    if demodulate:
        d = jax.lax.rsqrt(jnp.sum(w**2, axis=(1, 2, 3)) + 1e-8)  # (B, Co)
        w = w * d[:, None, None, None, :]

    # grouped conv: fold batch into channels (group b = sample b)
    xg = jnp.transpose(x, (1, 2, 0, 3)).reshape(1, H, W, B * Cin)
    # HWIO grouped kernel: (kh, kw, Cin_per_group, B*Cout) with the output
    # channel axis ordered (B major, Cout minor).
    if up > 1:
        w = w[:, ::-1, ::-1]    # true convolution on the transpose path
    wg = jnp.transpose(w, (1, 2, 3, 0, 4)).reshape(kh, kw, Cin, B * Cout)

    if up > 1:
        assert up == 2 and kh == kw == 3
        out = jax.lax.conv_general_dilated(
            xg, wg, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(up, up),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            feature_group_count=B)
        out = out.reshape(out.shape[1], out.shape[2], B, Cout)
        out = jnp.transpose(out, (2, 0, 1, 3))
        return upfirdn2d(out, f if f is not None else setup_filter(),
                         padding=(1, 1, 1, 1), gain=float(up * up))

    out = jax.lax.conv_general_dilated(
        xg, wg, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=B)
    out = out.reshape(out.shape[1], out.shape[2], B, Cout)
    return jnp.transpose(out, (2, 0, 1, 3))


class SynthesisLayerLite(nn.Module):
    """Modulated conv + lrelu (+optional 2x upsample)."""
    out_channels: int
    w_dim: int = 512
    kernel: int = 3
    up: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, w_latent):
        Cin = x.shape[-1]
        styles = EqualDense(Cin, bias_init=1.0, name='affine')(w_latent)
        weight = self.param('weight', nn.initializers.normal(1.0),
                            (self.kernel, self.kernel, Cin,
                             self.out_channels))
        weight = weight * (1.0 / math.sqrt(Cin * self.kernel**2))
        y = modulated_conv2d(x.astype(jnp.float32), weight, styles,
                             up=self.up)
        b = self.param('bias', nn.initializers.zeros, (self.out_channels,))
        return nn.leaky_relu(y + b, 0.2) * math.sqrt(2)


class ToRGB(nn.Module):
    w_dim: int = 512
    out_channels: int = 3

    @nn.compact
    def __call__(self, x, w_latent):
        Cin = x.shape[-1]
        styles = EqualDense(Cin, bias_init=1.0, name='affine')(w_latent)
        weight = self.param('weight', nn.initializers.normal(1.0),
                            (1, 1, Cin, self.out_channels)) / math.sqrt(Cin)
        y = modulated_conv2d(x.astype(jnp.float32), weight, styles,
                             demodulate=False)
        b = self.param('bias', nn.initializers.zeros, (self.out_channels,))
        return y + b


class SuperresolutionHybrid(nn.Module):
    """FFHQ render-space SR: two modulated synthesis blocks upsampling
    2x/4x with skip ToRGB (reference ``SuperresolutionHybrid4X/8X/8XDC``,
    ``nsr/superresolution.py:181-446``).  Input feature image
    (B, H, W, C=32) + rgb skip, conditioned on a w latent."""
    sr_ratio: int = 4             # 4 → two 2x blocks
    hidden: int = 128
    w_dim: int = 512

    @nn.compact
    def __call__(self, feature_image, rgb_image, ws):
        # ws: (B, w_dim) — reference uses the last mapping layer's w.
        x = feature_image
        rgb = rgb_image
        n_blocks = int(math.log2(self.sr_ratio))
        f = setup_filter()
        for i in range(n_blocks):
            x = SynthesisLayerLite(self.hidden, up=2,
                                   name=f'conv0_{i}')(x, ws)
            x = SynthesisLayerLite(self.hidden, name=f'conv1_{i}')(x, ws)
            rgb = upsample2d(rgb, f, up=2)
            rgb = rgb + ToRGB(name=f'torgb_{i}')(x, ws)
        return rgb


# ---------------------------------------------------------------------------
# discriminator
# ---------------------------------------------------------------------------

class SynthesisLayerSG2(nn.Module):
    """Exact StyleGAN2 ``SynthesisLayer`` (``nsr/networks_stylegan2.py:
    343-427``): affine style, modulated conv (optional 2x up with FIR),
    optional const noise, bias + lrelu(gain √2) + clamp."""
    out_channels: int
    resolution: int               # output resolution (noise_const shape)
    up: int = 1
    kernel: int = 3
    conv_clamp: Optional[float] = 256.0
    use_noise: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, w_latent, noise_mode: str = 'none'):
        Cin = x.shape[-1]
        styles = EqualDense(Cin, bias_init=1.0, name='affine')(w_latent)
        weight = self.param('weight', nn.initializers.normal(1.0),
                            (self.kernel, self.kernel, Cin,
                             self.out_channels))
        y = modulated_conv2d(x.astype(jnp.float32), weight, styles,
                             up=self.up)
        if self.use_noise:
            strength = self.param('noise_strength', nn.initializers.zeros,
                                  ())
            noise_const = self.param(
                'noise_const', nn.initializers.normal(1.0),
                (self.resolution, self.resolution))
            if noise_mode == 'const':
                y = y + (noise_const * strength)[None, :, :, None]
        b = self.param('bias', nn.initializers.zeros, (self.out_channels,))
        y = nn.leaky_relu(y + b, 0.2) * math.sqrt(2)
        if self.conv_clamp is not None:
            y = jnp.clip(y, -self.conv_clamp, self.conv_clamp)
        return y


class ToRGBSG2(nn.Module):
    """Exact ``ToRGBLayer`` (``networks_stylegan2.py:432-468``): styles
    scaled by 1/sqrt(Cin·k²), 1x1 modulated conv without demodulation."""
    out_channels: int = 3
    conv_clamp: Optional[float] = 256.0

    @nn.compact
    def __call__(self, x, w_latent):
        Cin = x.shape[-1]
        styles = EqualDense(Cin, bias_init=1.0, name='affine')(w_latent)
        styles = styles / math.sqrt(Cin)
        weight = self.param('weight', nn.initializers.normal(1.0),
                            (1, 1, Cin, self.out_channels))
        y = modulated_conv2d(x.astype(jnp.float32), weight, styles,
                             demodulate=False)
        b = self.param('bias', nn.initializers.zeros, (self.out_channels,))
        y = y + b
        if self.conv_clamp is not None:
            y = jnp.clip(y, -self.conv_clamp, self.conv_clamp)
        return y


class SynthesisBlockSG2(nn.Module):
    """Skip-architecture ``SynthesisBlock`` (``networks_stylegan2.py:
    471-623``): conv0(up2) → conv1 → img-skip FIR upsample + ToRGB."""
    out_channels: int
    resolution: int
    img_channels: int = 3            # ToRGB width (EG3D backbone uses 96)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, img, w_latent, noise_mode: str = 'none'):
        x = SynthesisLayerSG2(self.out_channels, self.resolution, up=2,
                              name='conv0')(x, w_latent, noise_mode)
        x = SynthesisLayerSG2(self.out_channels, self.resolution,
                              name='conv1')(x, w_latent, noise_mode)
        if img is not None:
            img = upsample2d(img, setup_filter(), up=2)
        y = ToRGBSG2(self.img_channels, name='torgb')(x, w_latent)
        img = img + y if img is not None else y
        return x, img


class SuperresolutionHybrid8XDC(nn.Module):
    """FFHQ released SR head (``nsr/superresolution.py:384-446``):
    bilinear resize to 128 → SynthesisBlock(→256 @256) →
    SynthesisBlock(→128 @512); returns the 512² rgb skip."""
    noise_mode: str = 'none'      # FFHQ cfg uses 'random' in training

    @nn.compact
    def __call__(self, feature_image, rgb_image, ws):
        x, rgb = feature_image, rgb_image
        if x.shape[1] != 128:
            B, H, W, C = x.shape
            x = jax.image.resize(x, (B, 128, 128, C), 'bilinear')
            rgb = jax.image.resize(rgb, (B, 128, 128, rgb.shape[-1]),
                                   'bilinear')
        x, rgb = SynthesisBlockSG2(256, 256, name='block0')(
            x, rgb, ws, self.noise_mode)
        x, rgb = SynthesisBlockSG2(128, 512, name='block1')(
            x, rgb, ws, self.noise_mode)
        return rgb


class MappingNetwork(nn.Module):
    """z (+ optional label c) → broadcast w latents (reference
    ``nsr/networks_stylegan2.py:246-334``): 2nd-moment-normalized inputs,
    ``num_layers`` equalized-lr lrelu FCs at lr_mul 0.01, tracked ``w_avg``
    for truncation.  ``w_avg`` lives in the 'stats' collection; call with
    ``mutable=['stats']`` and ``update_emas=True`` during training."""
    z_dim: int = 512
    c_dim: int = 0
    w_dim: int = 512
    num_ws: Optional[int] = 14
    num_layers: int = 8
    lr_multiplier: float = 0.01
    w_avg_beta: float = 0.998

    @nn.compact
    def __call__(self, z, c=None, truncation_psi: float = 1.0,
                 truncation_cutoff: Optional[int] = None,
                 update_emas: bool = False):
        def norm2(v):
            return v * jax.lax.rsqrt(
                jnp.mean(jnp.square(v), axis=-1, keepdims=True) + 1e-8)

        parts = []
        if self.z_dim > 0:
            parts.append(norm2(z.astype(jnp.float32)))
        if self.c_dim > 0:
            y = EqualDense(self.w_dim, name='embed')(c.astype(jnp.float32))
            parts.append(norm2(y))
        x = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]

        act = lambda v: jax.nn.leaky_relu(v, 0.2) * math.sqrt(2.0)
        for i in range(self.num_layers):
            feats = self.w_dim
            x = EqualDense(feats, lr_multiplier=self.lr_multiplier,
                           activation=act, name=f'fc{i}')(x)

        w_avg = self.variable('stats', 'w_avg',
                              lambda: jnp.zeros((self.w_dim,)))
        if update_emas and not self.is_initializing():
            w_avg.value = (jnp.mean(jax.lax.stop_gradient(x), axis=0)
                           + self.w_avg_beta
                           * (w_avg.value - jnp.mean(
                               jax.lax.stop_gradient(x), axis=0)))

        if self.num_ws is not None:
            x = jnp.repeat(x[:, None], self.num_ws, axis=1)
        if truncation_psi != 1.0:
            if self.num_ws is None or truncation_cutoff is None:
                x = w_avg.value + truncation_psi * (x - w_avg.value)
            else:
                head = w_avg.value + truncation_psi * (
                    x[:, :truncation_cutoff] - w_avg.value)
                x = jnp.concatenate([head, x[:, truncation_cutoff:]],
                                    axis=1)
        return x


def minibatch_stddev(x: jax.Array, group_size: int = 4) -> jax.Array:
    B, H, W, C = x.shape
    g = min(group_size, B)
    while B % g:
        g -= 1
    y = x.reshape(g, B // g, H, W, C)
    y = y - y.mean(axis=0, keepdims=True)
    y = jnp.sqrt(jnp.mean(y**2, axis=0) + 1e-8)
    y = y.mean(axis=(1, 2, 3), keepdims=True)           # (B//g, 1, 1, 1)
    y = jnp.tile(y, (g, H, W, 1))
    return jnp.concatenate([x, y], axis=-1)


@dataclasses.dataclass(frozen=True)
class DiscriminatorConfig:
    img_resolution: int = 128
    img_channels: int = 3
    base_channels: int = 64
    max_channels: int = 512
    dtype: Any = jnp.float32


class StyleGANDiscriminator(nn.Module):
    """Residual conv discriminator (StyleGAN2-style) with minibatch
    stddev; serves both the patchGAN and dual-discriminator roles of the
    reference's GAN VAE training (``nsr/dual_discriminator.py:22-479``,
    ``nsr/losses/disc.py``)."""
    cfg: DiscriminatorConfig

    @nn.compact
    def __call__(self, img):
        cfg = self.cfg
        f = setup_filter()
        n_down = int(math.log2(cfg.img_resolution)) - 2
        ch = cfg.base_channels
        x = nn.Conv(ch, (1, 1), dtype=cfg.dtype, name='from_rgb')(img)
        x = nn.leaky_relu(x, 0.2)
        for i in range(n_down):
            cout = min(ch * 2, cfg.max_channels)
            y = downsample2d(x, f)
            y = nn.Conv(cout, (1, 1), use_bias=False, dtype=cfg.dtype,
                        name=f'skip_{i}')(y)
            x = nn.leaky_relu(nn.Conv(ch, (3, 3), dtype=cfg.dtype,
                                      name=f'conv0_{i}')(x), 0.2)
            x = nn.Conv(cout, (3, 3), strides=(2, 2), dtype=cfg.dtype,
                        name=f'conv1_{i}')(x)
            x = (nn.leaky_relu(x, 0.2) + y) / math.sqrt(2)
            ch = cout
        x = minibatch_stddev(x)
        x = nn.leaky_relu(nn.Conv(ch, (3, 3), dtype=cfg.dtype,
                                  name='final_conv')(x), 0.2)
        x = x.reshape(x.shape[0], -1)
        x = nn.leaky_relu(nn.Dense(ch, dtype=cfg.dtype, name='fc')(x), 0.2)
        return nn.Dense(1, dtype=cfg.dtype, name='out')(x)


class DualDiscriminator(nn.Module):
    """EG3D dual discriminator: concatenates the raw neural render
    (filter-resized) with the SR image (reference
    ``nsr/dual_discriminator.py:22-180``)."""
    cfg: DiscriminatorConfig

    @nn.compact
    def __call__(self, img_sr, img_raw):
        f = setup_filter()
        raw_up = filtered_resizing(img_raw, img_sr.shape[1], f)
        x = jnp.concatenate([img_sr, raw_up], axis=-1)
        cfg = dataclasses.replace(self.cfg,
                                  img_channels=2 * self.cfg.img_channels)
        return StyleGANDiscriminator(cfg, name='d')(x)


def filtered_lrelu(x: jax.Array, fu: Optional[jax.Array] = None,
                   fd: Optional[jax.Array] = None,
                   bias: Optional[jax.Array] = None,
                   up: int = 2, down: int = 2, gain: float = math.sqrt(2),
                   slope: float = 0.2, clamp: Optional[float] = None
                   ) -> jax.Array:
    """Fused upsample → bias → leaky-ReLU → clamp → downsample
    (reference ``utils/torch_utils/ops/filtered_lrelu.py:66-377``, the
    StyleGAN3 antialiased nonlinearity).  Plain jnp ops — XLA fuses the
    chain; the CUDA sign-caching trick is unnecessary under JAX autodiff.
    """
    if fu is None:
        fu = setup_filter()
    if fd is None:
        fd = setup_filter()
    if bias is not None:
        x = x + bias.astype(x.dtype)
    x = upsample2d(x, fu, up=up)
    x = nn.leaky_relu(x, slope) * gain
    if clamp is not None:
        x = jnp.clip(x, -clamp, clamp)
    return downsample2d(x, fd, down=down)


class PixelUnshuffleUpsample(nn.Module):
    """Pixel-shuffle SR head (reference
    ``utils/torch_utils/components.py:323-344``)."""
    num_feat: int = 128
    num_out_ch: int = 3
    sr_ratio: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, input_skip_connection: bool = True):
        C = x.shape[-1]
        h = nn.Conv(C, (3, 3), dtype=self.dtype, name='conv_after_body')(x)
        x = h + x if input_skip_connection else h
        x = nn.leaky_relu(
            nn.Conv(self.num_feat, (3, 3), dtype=self.dtype,
                    name='conv_before_upsample')(x), 0.01)
        # pixel shuffle: conv to r^2*feat then depth-to-space, per 2x stage
        r = 2
        stages = int(math.log2(self.sr_ratio))
        for i in range(stages):
            x = nn.Conv(self.num_feat * r * r, (3, 3), dtype=self.dtype,
                        name=f'up_conv_{i}')(x)
            B, H, W, _ = x.shape
            x = x.reshape(B, H, W, r, r, self.num_feat)
            x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
                B, H * r, W * r, self.num_feat)
        return nn.Conv(self.num_out_ch, (3, 3), dtype=self.dtype,
                       name='conv_last')(x)
