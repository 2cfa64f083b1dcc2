"""StyleGAN3 alias-free generator (reference ``nsr/networks_stylegan3.py``).

The reference's CUDA ``filtered_lrelu`` op (``utils/torch_utils/ops/
filtered_lrelu.{cu,cpp,h}``, sign-caching custom grads) becomes a plain
``upfirdn → leaky-relu → upfirdn`` chain here: XLA fuses the elementwise
middle into the surrounding convolutions, and JAX autodiff supplies the
second-order grads the CUDA op hand-implements.  All layer design math
(cutoff/stopband geometric progressions, Kaiser/jinc filter synthesis,
padding arithmetic — reference ``networks_stylegan3.py:474-599``) is
static numpy evaluated at trace time, so the compiled program sees only
constant filters.

Layout is channels-last NHWC throughout (reference is NCHW).  The random
Fourier frequencies/phases of ``SynthesisInput`` live in the ``'stats'``
collection (not ``'params'``) exactly because the reference registers
them as buffers: they are never trained, and tests/converters can inject
the reference's draws for numeric parity.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import EqualDense
from .stylegan import upfirdn2d, MappingNetwork


def design_lowpass_filter(numtaps: int, cutoff: float, width: float,
                          fs: float, radial: bool = False
                          ) -> Optional[np.ndarray]:
    """Kaiser-windowed low-pass FIR (reference
    ``networks_stylegan3.py:474-499``).  Returns 1D taps for separable
    filters, a 2D jinc-based kernel for radial ones, ``None`` = identity.
    """
    assert numtaps >= 1
    if numtaps == 1:
        return None
    import scipy.signal
    if not radial:
        return scipy.signal.firwin(numtaps=numtaps, cutoff=cutoff,
                                   width=width, fs=fs).astype(np.float32)
    import scipy.special
    x = (np.arange(numtaps) - (numtaps - 1) / 2) / fs
    r = np.hypot(*np.meshgrid(x, x))
    with np.errstate(divide='ignore', invalid='ignore'):
        f = scipy.special.j1(2 * cutoff * (np.pi * r)) / (np.pi * r)
    f[r == 0] = cutoff  # lim_{r->0} j1(2πc·r)/(π·r) = c  (j1(x) ≈ x/2)
    beta = scipy.signal.kaiser_beta(
        scipy.signal.kaiser_atten(numtaps, width / (fs / 2)))
    w = np.kaiser(numtaps, beta)
    f = f * np.outer(w, w)
    f = f / f.sum()
    return f.astype(np.float32)


def _as_2d(f: Optional[np.ndarray]) -> np.ndarray:
    if f is None:
        return np.ones((1, 1), np.float32)
    f = np.asarray(f, np.float32)
    return np.outer(f, f) if f.ndim == 1 else f


def filtered_lrelu(x: jax.Array, fu: Optional[np.ndarray],
                   fd: Optional[np.ndarray], bias: Optional[jax.Array],
                   up: int, down: int, padding: Tuple[int, int, int, int],
                   gain: float, slope: float,
                   clamp: Optional[float]) -> jax.Array:
    """bias → zero-stuff ``up`` → pad → FIR ``fu`` (gain up²) →
    leaky-relu(slope)·gain → clamp → FIR ``fd`` → keep every ``down``-th.

    Matches the reference ``_filtered_lrelu_ref`` pipeline
    (``utils/torch_utils/ops/filtered_lrelu.py:161-216``); padding is the
    SG3 layer's precomputed (px0, px1, py0, py1) w.r.t. the upsampled
    grid.  ``x``: (B, H, W, C).
    """
    if bias is not None:
        x = x + bias.astype(x.dtype)
    # upfirdn2d's internal gain is `gain·up²` — the reference passes up²
    # explicitly to its upfirdn, so gain=1 here reproduces it.
    x = upfirdn2d(x, jnp.asarray(_as_2d(fu)), up=up,
                  padding=(padding[0], padding[1], padding[2], padding[3]))
    x = nn.leaky_relu(x, slope) * gain
    if clamp is not None:
        x = jnp.clip(x, -clamp, clamp)
    return upfirdn2d(x, jnp.asarray(_as_2d(fd)), down=down)


def modulated_conv2d_sg3(x: jax.Array, weight: jax.Array,
                         styles: jax.Array, demodulate: bool = True,
                         padding: int = 0,
                         input_gain: Optional[jax.Array] = None
                         ) -> jax.Array:
    """SG3-flavor modulated conv (reference
    ``networks_stylegan3.py:28-72``): pre-normalizes weight and styles to
    unit second moment before modulation (keeps magnitudes stable without
    the SG2 noise-strength dance), then demodulates per output channel.

    x: (B, H, W, Cin); weight: (kh, kw, Cin, Cout); styles: (B, Cin);
    ``padding`` is symmetric per-side (the SG3 layer uses k-1 = full
    correlation padding so the filtered crop happens in filtered_lrelu).
    """
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape

    if demodulate:
        weight = weight * jax.lax.rsqrt(
            jnp.mean(jnp.square(weight), axis=(0, 1, 2), keepdims=True))
        styles = styles * jax.lax.rsqrt(jnp.mean(jnp.square(styles)))

    w = weight[None] * styles[:, None, None, :, None]       # (B,kh,kw,Ci,Co)
    if demodulate:
        d = jax.lax.rsqrt(jnp.sum(jnp.square(w), axis=(1, 2, 3)) + 1e-8)
        w = w * d[:, None, None, None, :]
    if input_gain is not None:
        w = w * jnp.broadcast_to(input_gain, (B, Cin)
                                 )[:, None, None, :, None]

    xg = jnp.transpose(x, (1, 2, 0, 3)).reshape(1, H, W, B * Cin)
    wg = jnp.transpose(w, (1, 2, 3, 0, 4)).reshape(kh, kw, Cin, B * Cout)
    out = jax.lax.conv_general_dilated(
        xg, wg.astype(x.dtype), (1, 1),
        ((padding, padding), (padding, padding)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'), feature_group_count=B)
    out = out.reshape(out.shape[1], out.shape[2], B, Cout)
    return jnp.transpose(out, (2, 0, 1, 3))


class SynthesisInput(nn.Module):
    """Fourier-feature input plane (reference
    ``networks_stylegan3.py:201-293``): random in-band frequencies, a
    w-conditioned rotation/translation of the frequency plane, and a
    trainable channel mixing.

    ``freqs``/``phases`` are drawn once with a fixed numpy seed (the
    reference draws from the torch global RNG at construction — a buffer
    either way) and live in ``'stats'`` so converters can overwrite them.
    ``transform`` is the user-controllable inverse output transform
    (identity by default; tests use it for equivariance checks).
    """
    w_dim: int
    channels: int
    size: int
    sampling_rate: float
    bandwidth: float

    @nn.compact
    def __call__(self, w: jax.Array) -> jax.Array:
        def _draw():
            rng = np.random.RandomState(0)
            f = rng.randn(self.channels, 2).astype(np.float32)
            radii = np.sqrt((f ** 2).sum(1, keepdims=True))
            f = f / (radii * np.exp(radii ** 2) ** 0.25)
            return f * self.bandwidth

        freqs = self.variable('stats', 'freqs', lambda: jnp.asarray(_draw()))
        phases = self.variable(
            'stats', 'phases', lambda: jnp.asarray(
                np.random.RandomState(1).rand(self.channels)
                .astype(np.float32) - 0.5))
        transform = self.variable('stats', 'transform',
                                  lambda: jnp.eye(3, dtype=jnp.float32))
        weight = self.param('weight', nn.initializers.normal(1.0),
                            (self.channels, self.channels))
        # affine: weight_init=0, bias_init=(1,0,0,0) → identity at init.
        aff_w = self.param('affine_kernel', nn.initializers.zeros,
                           (self.w_dim, 4))
        aff_b = self.param(
            'affine_bias',
            lambda key, shape: jnp.array([1., 0., 0., 0.]), (4,))

        B = w.shape[0]
        t = w.astype(jnp.float32) @ (aff_w / math.sqrt(self.w_dim)) + aff_b
        t = t / jnp.linalg.norm(t[:, :2], axis=1, keepdims=True)
        rc, rs, tx, ty = t[:, 0], t[:, 1], t[:, 2], t[:, 3]
        zeros = jnp.zeros_like(rc)
        ones = jnp.ones_like(rc)
        m_r = jnp.stack([rc, -rs, zeros, rs, rc, zeros,
                         zeros, zeros, ones], -1).reshape(B, 3, 3)
        m_t = jnp.stack([ones, zeros, -tx, zeros, ones, -ty,
                         zeros, zeros, ones], -1).reshape(B, 3, 3)
        transforms = m_r @ m_t @ transform.value[None]

        f = freqs.value[None] @ transforms[:, :2, :2]          # (B, C, 2)
        ph = phases.value[None] + jnp.squeeze(
            freqs.value[None] @ transforms[:, :2, 2:], -1)     # (B, C)
        amp = jnp.clip(
            1 - (jnp.linalg.norm(f, axis=2) - self.bandwidth)
            / (self.sampling_rate / 2 - self.bandwidth), 0, 1)

        # pixel-center grid in sampling-rate units (torch affine_grid with
        # theta = diag(size/2s), align_corners=False).
        g = (np.arange(self.size, dtype=np.float32) + 0.5
             - self.size / 2) / self.sampling_rate
        gx = jnp.asarray(g)[None, None, :]                     # (1,1,S)
        gy = jnp.asarray(g)[None, :, None]                     # (1,S,1)
        arg = (gx[..., None] * f[:, None, None, :, 0]
               + gy[..., None] * f[:, None, None, :, 1]
               + ph[:, None, None, :])                         # (B,S,S,C)
        x = jnp.sin(arg * (2 * np.pi)) * amp[:, None, None, :]
        return x @ (weight.T / math.sqrt(self.channels))


class SynthesisLayerSG3(nn.Module):
    """One alias-free layer (reference ``networks_stylegan3.py:306-472``):
    w→style affine, modulated 3×3 (or 1×1 ToRGB) conv at the input rate,
    then the filtered nonlinearity resampling to the output rate with
    per-layer Kaiser filters.  All rates/cutoffs are static design
    parameters computed by :class:`SynthesisNetworkSG3`."""
    w_dim: int
    is_torgb: bool
    is_critically_sampled: bool
    out_channels: int
    in_size: int
    out_size: int
    in_sampling_rate: float
    out_sampling_rate: float
    in_cutoff: float
    out_cutoff: float
    in_half_width: float
    out_half_width: float
    conv_kernel: int = 3
    filter_size: int = 6
    lrelu_upsampling: int = 2
    use_radial_filters: bool = False
    conv_clamp: Optional[float] = 256.0
    magnitude_ema_beta: float = 0.999

    @nn.compact
    def __call__(self, x: jax.Array, w: jax.Array,
                 update_emas: bool = False) -> jax.Array:
        Cin = x.shape[-1]
        k = 1 if self.is_torgb else self.conv_kernel
        tmp_rate = max(self.in_sampling_rate, self.out_sampling_rate) * (
            1 if self.is_torgb else self.lrelu_upsampling)

        up = int(round(tmp_rate / self.in_sampling_rate))
        up_taps = (self.filter_size * up
                   if up > 1 and not self.is_torgb else 1)
        fu = design_lowpass_filter(up_taps, self.in_cutoff,
                                   self.in_half_width * 2, tmp_rate)
        down = int(round(tmp_rate / self.out_sampling_rate))
        down_taps = (self.filter_size * down
                     if down > 1 and not self.is_torgb else 1)
        fd = design_lowpass_filter(
            down_taps, self.out_cutoff, self.out_half_width * 2, tmp_rate,
            radial=self.use_radial_filters
            and not self.is_critically_sampled)

        # Appendix C.3 symmetric-interpretation padding.
        pad_total = ((self.out_size - 1) * down + 1
                     - (self.in_size + k - 1) * up
                     + up_taps + down_taps - 2)
        pad_lo = (pad_total + up) // 2
        pad_hi = pad_total - pad_lo
        padding = (pad_lo, pad_hi, pad_lo, pad_hi)

        mag_ema = self.variable('stats', 'magnitude_ema',
                                lambda: jnp.ones(()))
        if update_emas and not self.is_initializing():
            cur = jnp.mean(jnp.square(
                jax.lax.stop_gradient(x).astype(jnp.float32)))
            mag_ema.value = (cur + self.magnitude_ema_beta
                             * (mag_ema.value - cur))
        input_gain = jax.lax.rsqrt(mag_ema.value)

        styles = EqualDense(Cin, bias_init=1.0, name='affine')(
            w.astype(jnp.float32))
        if self.is_torgb:
            styles = styles / math.sqrt(Cin * k * k)
        weight = self.param('weight', nn.initializers.normal(1.0),
                            (k, k, Cin, self.out_channels))
        y = modulated_conv2d_sg3(x.astype(jnp.float32), weight, styles,
                                 demodulate=not self.is_torgb,
                                 padding=k - 1, input_gain=input_gain)
        b = self.param('bias', nn.initializers.zeros, (self.out_channels,))
        return filtered_lrelu(
            y, fu, fd, b, up, down, padding,
            gain=1.0 if self.is_torgb else math.sqrt(2.0),
            slope=1.0 if self.is_torgb else 0.2, clamp=self.conv_clamp)


class SynthesisNetworkSG3(nn.Module):
    """Alias-free synthesis stack (reference
    ``networks_stylegan3.py:517-628``): geometric cutoff/stopband
    progression over ``num_layers`` layers with ``num_critical``
    critically-sampled layers at the end, margin-padded intermediate
    planes, Fourier-feature input, final ToRGB."""
    w_dim: int = 512
    img_resolution: int = 256
    img_channels: int = 3
    channel_base: int = 32768
    channel_max: int = 512
    num_layers: int = 14
    num_critical: int = 2
    first_cutoff: float = 2.0
    first_stopband: float = 2 ** 2.1
    last_stopband_rel: float = 2 ** 0.3
    margin_size: int = 10
    output_scale: float = 0.25
    conv_kernel: int = 3
    use_radial_filters: bool = False

    @property
    def num_ws(self) -> int:
        return self.num_layers + 2

    def _design(self):
        last_cutoff = self.img_resolution / 2
        last_stopband = last_cutoff * self.last_stopband_rel
        exponents = np.minimum(
            np.arange(self.num_layers + 1)
            / (self.num_layers - self.num_critical), 1)
        cutoffs = self.first_cutoff * (
            last_cutoff / self.first_cutoff) ** exponents
        stopbands = self.first_stopband * (
            last_stopband / self.first_stopband) ** exponents
        sampling_rates = np.exp2(np.ceil(np.log2(
            np.minimum(stopbands * 2, self.img_resolution))))
        half_widths = np.maximum(
            stopbands, sampling_rates / 2) - cutoffs
        sizes = (sampling_rates + self.margin_size * 2).astype(np.int64)
        sizes[-2:] = self.img_resolution
        channels = np.rint(np.minimum(
            (self.channel_base / 2) / cutoffs, self.channel_max)
        ).astype(np.int64)
        channels[-1] = self.img_channels
        return cutoffs, sampling_rates, half_widths, sizes, channels

    @nn.compact
    def __call__(self, ws: jax.Array,
                 update_emas: bool = False) -> jax.Array:
        assert ws.shape[1] == self.num_ws
        cutoffs, rates, half_widths, sizes, channels = self._design()

        x = SynthesisInput(self.w_dim, int(channels[0]), int(sizes[0]),
                           float(rates[0]), float(cutoffs[0]),
                           name='input')(ws[:, 0])
        for idx in range(self.num_layers + 1):
            prev = max(idx - 1, 0)
            is_torgb = idx == self.num_layers
            layer = SynthesisLayerSG3(
                w_dim=self.w_dim, is_torgb=is_torgb,
                is_critically_sampled=(
                    idx >= self.num_layers - self.num_critical),
                out_channels=int(channels[idx]),
                in_size=int(sizes[prev]), out_size=int(sizes[idx]),
                in_sampling_rate=float(rates[prev]),
                out_sampling_rate=float(rates[idx]),
                in_cutoff=float(cutoffs[prev]),
                out_cutoff=float(cutoffs[idx]),
                in_half_width=float(half_widths[prev]),
                out_half_width=float(half_widths[idx]),
                conv_kernel=self.conv_kernel,
                use_radial_filters=self.use_radial_filters,
                name=f'L{idx}_{int(sizes[idx])}_{int(channels[idx])}')
            x = layer(x, ws[:, idx + 1], update_emas=update_emas)
        if self.output_scale != 1:
            x = x * self.output_scale
        return x.astype(jnp.float32)


class GeneratorSG3(nn.Module):
    """z (+ label) → mapping → alias-free synthesis (reference
    ``networks_stylegan3.py:635-678``)."""
    z_dim: int = 512
    c_dim: int = 0
    w_dim: int = 512
    img_resolution: int = 256
    img_channels: int = 3
    num_layers: int = 14
    channel_base: int = 32768
    channel_max: int = 512
    conv_kernel: int = 3
    use_radial_filters: bool = False

    @nn.compact
    def __call__(self, z, c=None, truncation_psi: float = 1.0,
                 truncation_cutoff: Optional[int] = None,
                 update_emas: bool = False):
        synthesis = SynthesisNetworkSG3(
            w_dim=self.w_dim, img_resolution=self.img_resolution,
            img_channels=self.img_channels, num_layers=self.num_layers,
            channel_base=self.channel_base, channel_max=self.channel_max,
            conv_kernel=self.conv_kernel,
            use_radial_filters=self.use_radial_filters, name='synthesis')
        ws = MappingNetwork(
            z_dim=self.z_dim, c_dim=self.c_dim, w_dim=self.w_dim,
            num_ws=synthesis.num_ws, name='mapping')(
                z, c, truncation_psi=truncation_psi,
                truncation_cutoff=truncation_cutoff,
                update_emas=update_emas)
        return synthesis(ws, update_emas=update_emas)
