"""Adaptive discriminator augmentation (ADA) pipeline, TPU-native.

Re-designs the reference ``nsr/augment.py`` ``AugmentPipe`` (the
StyleGAN2-ADA "Training GANs with Limited Data" pipeline, reference
`/root/reference/nsr/augment.py:117-436`) as a pure jittable function:

- **No module state / no CUDA ops**: one function ``augment_pipe(key,
  images, cfg, p)`` where ``p`` is a traced scalar — a single compiled
  program serves every ADA strength, and the per-image randomness comes
  from an explicit ``jax.random`` key instead of global torch RNG.
- **Static shapes**: the reference reflect-pads the geometric warp input
  by a *data-dependent* margin computed from the transformed image
  corners and clamped to ``dim - 1``.  Data-dependent shapes don't jit,
  so we always pad by the clamp bound ``dim - 1`` (also numpy's reflect
  limit).  This is numerically identical: the reference margin covers
  every sampled position up to the same clamp, reflected content agrees
  wherever both pads cover it, and both samplers return zero beyond the
  shared ``dim - 1`` extent.
- Geometric params compose into one inverse 3x3 affine per image
  (batched matmuls), executed as filtered 2x upsample -> one bilinear
  warp (``ops.grid_sample``) -> filtered 2x downsample, exactly the
  reference's anti-aliased resampling scheme (sym6 wavelet lowpass).
- Color params compose into one 4x4 homogeneous matrix per image,
  applied as a single einsum.
- Image-space filtering folds the batch into the channel axis and runs
  two depthwise convs with per-image separable kernels.

``debug_percentile`` replaces all randomness with deterministic
percentiles exactly like the reference — used by the parity tests to
compare against the torch implementation output-for-output.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.stylegan import setup_filter, upfirdn2d, upsample2d
from ..ops.grid_sample import grid_sample_2d_batched

# Orthogonal wavelet taps (standard symlet coefficients; public
# constants, same families the reference uses).
_SYM2 = np.array([-0.12940952255092145, 0.22414386804185735,
                  0.836516303737469, 0.48296291314469025])
_SYM6 = np.array([
    0.015404109327027373, 0.0034907120842174702, -0.11799011114819057,
    -0.048311742585633, 0.4910559419267466, 0.787641141030194,
    0.3379294217276218, -0.07263752278646252, -0.021060292512300564,
    0.04472490177066578, 0.0017677118642428036, -0.007800708325034148,
])


def _filter_bank(num_bands: int = 4) -> np.ndarray:
    """Wavelet frequency-band filter bank for image-space filtering.

    Band 0 is the lowpass autocorrelation; each further band adds the
    highpass autocorrelation one octave down (rows are symmetric FIR
    kernels, reference `/root/reference/nsr/augment.py:169-179`).
    """
    lo = _SYM2
    hi = lo * ((-1.0) ** np.arange(lo.size))
    lo2 = np.convolve(lo, lo[::-1]) / 2.0   # symmetric lowpass
    hi2 = np.convolve(hi, hi[::-1]) / 2.0   # symmetric highpass
    bank = np.eye(num_bands, 1)
    for i in range(1, num_bands):
        # dilate existing rows by 2 (zero interleave), smooth, then drop
        # the new octave's highpass into row i.
        dilated = np.zeros((num_bands, bank.shape[1] * 2 - 1))
        dilated[:, ::2] = bank
        bank = np.stack([np.convolve(row, lo2) for row in dilated])
        lo_off = (bank.shape[1] - hi2.size) // 2
        bank[i, lo_off:lo_off + hi2.size] += hi2
    return bank.astype(np.float32)


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Probability multipliers + parameter ranges (reference defaults).

    A multiplier of 0 removes the augmentation from the compiled
    program; the effective per-image probability is ``multiplier * p``.
    The released 'brit' ADA preset sets the blit + geometric + color
    multipliers to 1.
    """
    xflip: float = 0.0
    rotate90: float = 0.0
    xint: float = 0.0
    xint_max: float = 0.125
    scale: float = 0.0
    rotate: float = 0.0
    aniso: float = 0.0
    xfrac: float = 0.0
    scale_std: float = 0.2
    rotate_max: float = 1.0
    aniso_std: float = 0.2
    xfrac_std: float = 0.125
    brightness: float = 0.0
    contrast: float = 0.0
    lumaflip: float = 0.0
    hue: float = 0.0
    saturation: float = 0.0
    brightness_std: float = 0.2
    contrast_std: float = 0.5
    hue_max: float = 1.0
    saturation_std: float = 1.0
    imgfilter: float = 0.0
    imgfilter_bands: tuple = (1.0, 1.0, 1.0, 1.0)
    imgfilter_std: float = 1.0
    noise: float = 0.0
    cutout: float = 0.0
    noise_std: float = 0.1
    cutout_size: float = 0.5

    @property
    def any_geometric(self) -> bool:
        return max(self.xflip, self.rotate90, self.xint, self.scale,
                   self.rotate, self.aniso, self.xfrac) > 0

    @property
    def any_color(self) -> bool:
        return max(self.brightness, self.contrast, self.lumaflip,
                   self.hue, self.saturation) > 0


def bgc_config() -> AugmentConfig:
    """blit + geometric + color — the standard ADA 'bgc' preset."""
    return AugmentConfig(xflip=1, rotate90=1, xint=1, scale=1, rotate=1,
                         aniso=1, xfrac=1, brightness=1, contrast=1,
                         lumaflip=1, hue=1, saturation=1)


# --- 3x3 / 4x4 homogeneous transform constructors (batched) -------------

def _t2d(tx, ty):
    b = jnp.broadcast_shapes(jnp.shape(tx), jnp.shape(ty))
    tx, ty = jnp.broadcast_to(tx, b), jnp.broadcast_to(ty, b)
    eye = jnp.broadcast_to(jnp.eye(3), b + (3, 3))
    return eye.at[..., 0, 2].set(tx).at[..., 1, 2].set(ty)


def _s2d(sx, sy):
    b = jnp.broadcast_shapes(jnp.shape(sx), jnp.shape(sy))
    sx, sy = jnp.broadcast_to(sx, b), jnp.broadcast_to(sy, b)
    eye = jnp.broadcast_to(jnp.eye(3), b + (3, 3))
    return eye.at[..., 0, 0].set(sx).at[..., 1, 1].set(sy)


def _r2d(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    eye = jnp.broadcast_to(jnp.eye(3), jnp.shape(theta) + (3, 3))
    return (eye.at[..., 0, 0].set(c).at[..., 0, 1].set(-s)
            .at[..., 1, 0].set(s).at[..., 1, 1].set(c))


_LUMA = np.array([1.0, 1.0, 1.0, 0.0]) / np.sqrt(3.0)


def _rotate3d_luma(theta):
    """Rotation of RGB space around the luma axis (homogeneous 4x4)."""
    vx, vy, vz = _LUMA[0], _LUMA[1], _LUMA[2]
    s, c = jnp.sin(theta), jnp.cos(theta)
    cc = 1.0 - c
    m = jnp.zeros(jnp.shape(theta) + (4, 4))
    rows = [
        (0, 0, vx * vx * cc + c), (0, 1, vx * vy * cc - vz * s),
        (0, 2, vx * vz * cc + vy * s),
        (1, 0, vy * vx * cc + vz * s), (1, 1, vy * vy * cc + c),
        (1, 2, vy * vz * cc - vx * s),
        (2, 0, vz * vx * cc - vy * s), (2, 1, vz * vy * cc + vx * s),
        (2, 2, vz * vz * cc + c),
    ]
    for i, j, val in rows:
        m = m.at[..., i, j].set(val)
    return m.at[..., 3, 3].set(1.0)


# --- parameter draws -----------------------------------------------------

def _gate(key, mult, p, value, identity, dp, dp_value):
    """Apply ``value`` with probability ``mult * p``, else ``identity``.

    With ``dp`` (debug percentile) set, returns the deterministic
    ``dp_value`` like the reference's ``debug_percentile`` mode.
    """
    if dp is not None:
        return dp_value
    u = jax.random.uniform(key, jnp.shape(value))
    return jnp.where(u < mult * p, value, identity)


def _erfinv(x):
    return jax.scipy.special.erfinv(x)


def augment_pipe(key: jax.Array, images: jax.Array, cfg: AugmentConfig,
                 p, debug_percentile: float | None = None) -> jax.Array:
    """Apply the ADA pipeline to a batch of images.

    Args:
      key: PRNG key (per-step).
      images: ``(B, H, W, C)`` with C in {1, 3}, any float dtype.
      cfg: static :class:`AugmentConfig` (multipliers select the program).
      p: global augmentation probability — python float or traced scalar.
    Returns:
      Augmented images, same shape/dtype.
    """
    B, H, W, C = images.shape
    dp = debug_percentile
    in_dtype = images.dtype
    x = images.astype(jnp.float32)
    keys = iter(jax.random.split(key, 48))

    # ---- geometric: compose the inverse pixel-space affine ------------
    if cfg.any_geometric:
        g = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
        if cfg.xflip > 0:
            i = jnp.floor(jax.random.uniform(next(keys), (B,)) * 2)
            i = _gate(next(keys), cfg.xflip, p, i, jnp.zeros_like(i), dp,
                      jnp.full((B,), np.floor(dp * 2) if dp is not None
                               else 0.0))
            g = g @ _s2d(1.0 / (1 - 2 * i), 1.0)
        if cfg.rotate90 > 0:
            i = jnp.floor(jax.random.uniform(next(keys), (B,)) * 4)
            i = _gate(next(keys), cfg.rotate90, p, i, jnp.zeros_like(i),
                      dp, jnp.full((B,), np.floor(dp * 4) if dp is not None
                                   else 0.0))
            g = g @ _r2d(np.pi / 2 * i)
        if cfg.xint > 0:
            t = (jax.random.uniform(next(keys), (B, 2)) * 2 - 1) * cfg.xint_max
            t = _gate(next(keys), cfg.xint, p, t, jnp.zeros_like(t), dp,
                      jnp.full((B, 2), (dp * 2 - 1) * cfg.xint_max
                               if dp is not None else 0.0))
            g = g @ _t2d(-jnp.round(t[:, 0] * W), -jnp.round(t[:, 1] * H))
        if cfg.scale > 0:
            s = jnp.exp2(jax.random.normal(next(keys), (B,)) * cfg.scale_std)
            s = _gate(next(keys), cfg.scale, p, s, jnp.ones_like(s), dp,
                      jnp.full((B,), 2.0 ** (float(_erfinv(dp * 2 - 1))
                                             * cfg.scale_std)
                               if dp is not None else 1.0))
            g = g @ _s2d(1.0 / s, 1.0 / s)
        # pre/post rotation each fire with p_rot: P(pre OR post) = p.
        p_rot = 1 - jnp.sqrt(jnp.clip(1 - cfg.rotate * p, 0, 1))
        if cfg.rotate > 0:
            th = (jax.random.uniform(next(keys), (B,)) * 2 - 1) \
                * np.pi * cfg.rotate_max
            th = _gate(next(keys), 1.0, p_rot, th, jnp.zeros_like(th), dp,
                       jnp.full((B,), (dp * 2 - 1) * np.pi * cfg.rotate_max
                                if dp is not None else 0.0))
            g = g @ _r2d(th)      # rotate2d_inv(-th) == rotate2d(th)
        if cfg.aniso > 0:
            s = jnp.exp2(jax.random.normal(next(keys), (B,)) * cfg.aniso_std)
            s = _gate(next(keys), cfg.aniso, p, s, jnp.ones_like(s), dp,
                      jnp.full((B,), 2.0 ** (float(_erfinv(dp * 2 - 1))
                                             * cfg.aniso_std)
                               if dp is not None else 1.0))
            g = g @ _s2d(1.0 / s, s)
        if cfg.rotate > 0:
            th = (jax.random.uniform(next(keys), (B,)) * 2 - 1) \
                * np.pi * cfg.rotate_max
            th = _gate(next(keys), 1.0, p_rot, th, jnp.zeros_like(th), dp,
                       jnp.zeros((B,)))
            g = g @ _r2d(th)
        if cfg.xfrac > 0:
            t = jax.random.normal(next(keys), (B, 2)) * cfg.xfrac_std
            t = _gate(next(keys), cfg.xfrac, p, t, jnp.zeros_like(t), dp,
                      jnp.full((B, 2), float(_erfinv(dp * 2 - 1))
                               * cfg.xfrac_std if dp is not None else 0.0))
            g = g @ _t2d(-t[:, 0] * W, -t[:, 1] * H)

        x = _execute_geometric(x, g)

    # ---- color: compose one homogeneous 4x4 per image ------------------
    if cfg.any_color:
        cmat = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))

        def lead(m):    # left-multiply batched
            return m @ cmat

        if cfg.brightness > 0:
            b = jax.random.normal(next(keys), (B,)) * cfg.brightness_std
            b = _gate(next(keys), cfg.brightness, p, b, jnp.zeros_like(b),
                      dp, jnp.full((B,), float(_erfinv(dp * 2 - 1))
                                   * cfg.brightness_std
                                   if dp is not None else 0.0))
            t = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))
            t = t.at[:, 0, 3].set(b).at[:, 1, 3].set(b).at[:, 2, 3].set(b)
            cmat = lead(t)
        if cfg.contrast > 0:
            c = jnp.exp2(jax.random.normal(next(keys), (B,))
                         * cfg.contrast_std)
            c = _gate(next(keys), cfg.contrast, p, c, jnp.ones_like(c), dp,
                      jnp.full((B,), 2.0 ** (float(_erfinv(dp * 2 - 1))
                                             * cfg.contrast_std)
                               if dp is not None else 1.0))
            t = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))
            t = (t.at[:, 0, 0].set(c).at[:, 1, 1].set(c)
                 .at[:, 2, 2].set(c))
            cmat = lead(t)
        vv = jnp.asarray(np.outer(_LUMA, _LUMA), jnp.float32)
        if cfg.lumaflip > 0:
            i = jnp.floor(jax.random.uniform(next(keys), (B, 1, 1)) * 2)
            i = _gate(next(keys), cfg.lumaflip, p, i, jnp.zeros_like(i),
                      dp, jnp.full((B, 1, 1), np.floor(dp * 2)
                                   if dp is not None else 0.0))
            cmat = (jnp.eye(4) - 2.0 * vv * i) @ cmat  # Householder
        if cfg.hue > 0 and C > 1:
            th = (jax.random.uniform(next(keys), (B,)) * 2 - 1) \
                * np.pi * cfg.hue_max
            th = _gate(next(keys), cfg.hue, p, th, jnp.zeros_like(th), dp,
                       jnp.full((B,), (dp * 2 - 1) * np.pi * cfg.hue_max
                                if dp is not None else 0.0))
            cmat = _rotate3d_luma(th) @ cmat
        if cfg.saturation > 0 and C > 1:
            s = jnp.exp2(jax.random.normal(next(keys), (B, 1, 1))
                         * cfg.saturation_std)
            s = _gate(next(keys), cfg.saturation, p, s, jnp.ones_like(s),
                      dp, jnp.full((B, 1, 1),
                                   2.0 ** (float(_erfinv(dp * 2 - 1))
                                           * cfg.saturation_std)
                                   if dp is not None else 1.0))
            cmat = (vv + (jnp.eye(4) - vv) * s) @ cmat

        if C == 3:
            x = jnp.einsum('bij,bhwj->bhwi', cmat[:, :3, :3], x) \
                + cmat[:, :3, 3][:, None, None, :]
        elif C == 1:
            cm = cmat[:, :3, :].mean(axis=1)               # (B, 4)
            x = x * cm[:, :3].sum(-1)[:, None, None, None] \
                + cm[:, 3][:, None, None, None]
        else:
            raise ValueError('color transforms need 1 or 3 channels')

    # ---- image-space filtering -----------------------------------------
    if cfg.imgfilter > 0:
        assert len(cfg.imgfilter_bands) == 4, \
            'expected-power table is defined for 4 bands'
        fbank = jnp.asarray(_filter_bank(len(cfg.imgfilter_bands)))
        num_bands, taps = fbank.shape
        # expected 1/f power spectrum over the bands
        expected = jnp.asarray(np.array([10, 1, 1, 1], np.float32) / 13)
        gain = jnp.ones((B, num_bands))
        for i, band in enumerate(cfg.imgfilter_bands):
            t_i = jnp.exp2(jax.random.normal(next(keys), (B,))
                           * cfg.imgfilter_std)
            t_i = _gate(next(keys), cfg.imgfilter * band, p, t_i,
                        jnp.ones_like(t_i), dp,
                        jnp.full((B,), 2.0 ** (float(_erfinv(dp * 2 - 1))
                                               * cfg.imgfilter_std)
                                 if (dp is not None and band > 0) else 1.0))
            t = jnp.ones((B, num_bands)).at[:, i].set(t_i)
            t = t / jnp.sqrt((expected * t ** 2).sum(-1, keepdims=True))
            gain = gain * t
        kern = gain @ fbank                                 # (B, taps)
        # per-image separable filter: fold batch into channels and run
        # two depthwise convs (horizontal then vertical).
        kern = jnp.repeat(kern, C, axis=0)                  # (B*C, taps)
        pad = taps // 2
        xf = jnp.transpose(x, (1, 2, 0, 3)).reshape(1, H, W, B * C)
        xf = jnp.pad(xf, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                     mode='reflect')
        kh = kern.T[None, :, None, :]                       # (1,taps,1,B*C)
        kv = kern.T[:, None, None, :]                       # (taps,1,1,B*C)
        dn = ('NHWC', 'HWIO', 'NHWC')
        xf = jax.lax.conv_general_dilated(xf, kh, (1, 1), 'VALID',
                                          dimension_numbers=dn,
                                          feature_group_count=B * C)
        xf = jax.lax.conv_general_dilated(xf, kv, (1, 1), 'VALID',
                                          dimension_numbers=dn,
                                          feature_group_count=B * C)
        x = jnp.transpose(xf.reshape(H, W, B, C), (2, 0, 1, 3))

    # ---- corruptions -----------------------------------------------------
    if cfg.noise > 0:
        sig = jnp.abs(jax.random.normal(next(keys), (B, 1, 1, 1))) \
            * cfg.noise_std
        sig = _gate(next(keys), cfg.noise, p, sig, jnp.zeros_like(sig),
                    dp, jnp.full((B, 1, 1, 1), float(_erfinv(dp))
                                 * cfg.noise_std if dp is not None else 0.0))
        x = x + jax.random.normal(next(keys), x.shape) * sig
    if cfg.cutout > 0:
        size = jnp.full((B, 2), cfg.cutout_size)
        size = _gate(next(keys), cfg.cutout, p, size, jnp.zeros_like(size),
                     dp, jnp.full((B, 2), cfg.cutout_size
                                  if dp is not None else 0.0))
        center = jax.random.uniform(next(keys), (B, 2))
        if dp is not None:
            center = jnp.full((B, 2), dp)
        cx_ = (jnp.arange(W) + 0.5) / W
        cy_ = (jnp.arange(H) + 0.5) / H
        mask_x = jnp.abs(cx_[None, :] - center[:, 0:1]) >= size[:, 0:1] / 2
        mask_y = jnp.abs(cy_[None, :] - center[:, 1:2]) >= size[:, 1:2] / 2
        mask = (mask_x[:, None, :] | mask_y[:, :, None]).astype(x.dtype)
        x = x * mask[..., None]

    return x.astype(in_dtype)


def _execute_geometric(x: jax.Array, g_inv: jax.Array) -> jax.Array:
    """Anti-aliased affine warp: reflect-pad -> filtered 2x upsample ->
    bilinear warp by ``g_inv`` (centered-pixel coords) -> filtered 2x
    downsample back to the input resolution."""
    B, H, W, C = x.shape
    f = setup_filter(_SYM6)
    hz_pad = f.shape[0] // 4

    # static worst-case reflect pad (see module docstring)
    px, py = W - 1, H - 1
    x = jnp.pad(x, ((0, 0), (py, py), (px, px), (0, 0)), mode='reflect')
    x = upsample2d(x, f, up=2)
    in_h, in_w = x.shape[1], x.shape[2]
    out_h, out_w = (H + hz_pad * 2) * 2, (W + hz_pad * 2) * 2

    # rescale the affine into align_corners=False normalized coords:
    # upsample shift, then pixel->normalized on both sides.
    g = _s2d(2.0, 2.0)[None] @ g_inv @ _s2d(0.5, 0.5)[None]
    g = _t2d(-0.5, -0.5)[None] @ g @ _t2d(0.5, 0.5)[None]
    g = _s2d(2.0 / in_w, 2.0 / in_h)[None] @ g \
        @ _s2d(out_w / 2.0, out_h / 2.0)[None]

    ox = (2.0 * jnp.arange(out_w) + 1.0) / out_w - 1.0
    oy = (2.0 * jnp.arange(out_h) + 1.0) / out_h - 1.0
    grid = jnp.stack(jnp.meshgrid(ox, oy, indexing='xy'), -1)  # (oh,ow,2)
    pts = jnp.concatenate([grid.reshape(-1, 2),
                           jnp.ones((out_h * out_w, 1))], -1)  # (P,3)
    coords = jnp.einsum('bij,pj->bpi', g[:, :2, :], pts)       # (B,P,2)
    x = grid_sample_2d_batched(x, coords).reshape(B, out_h, out_w, C)

    # downsample2d(..., padding=-hz_pad*2, flip_filter=True): crop the
    # filter transient; pre-flip cancels upfirdn2d's convolution flip.
    fw = f.shape[1]
    pad0 = (fw - 2 + 1) // 2 - hz_pad * 2
    pad1 = (fw - 2) // 2 - hz_pad * 2
    return upfirdn2d(x, f[::-1, ::-1], down=2,
                     padding=(pad0, pad1, pad0, pad1))


def update_ada_p(p, real_sign_mean, batch_size: int, *,
                 ada_target: float = 0.6, ada_interval: int = 4,
                 ada_kimg: float = 500.0):
    """StyleGAN2-ADA controller: nudge ``p`` toward the target
    discriminator-overfitting heuristic ``r_t = E[sign(D(real))]``.

    Call every ``ada_interval`` steps with the running mean of
    ``sign(D_real_logits)``; returns the clipped new ``p``.
    """
    adjust = jnp.sign(real_sign_mean - ada_target) \
        * (batch_size * ada_interval) / (ada_kimg * 1000.0)
    return jnp.clip(p + adjust, 0.0, 1.0)
