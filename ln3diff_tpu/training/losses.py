"""Reconstruction loss suite for stage-1 VAE training.

Rewrite of the reference ``nsr/losses/builder.py`` (``E3DGELossClass:354``):
fg-masked L2/L1, alpha/mask loss, two-stage depth loss (scale-invariant
SILog), KL with linear anneal (``kl_coeff:192``), SSIM, and an LPIPS hook.

LPIPS: the reference uses the ``lpips`` pip package (pretrained VGG).  Here
``lpips_fn`` is injectable — ``ln3diff_tpu.conditioning.lpips`` provides a
JAX VGG-LPIPS whose weights come from the torch checkpoint via the weight
converter; when absent the term is skipped (weight 0).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LossConfig:
    l2_lambda: float = 1.0
    l1_lambda: float = 0.0
    mask_lambda: float = 1.0        # alpha/silhouette loss
    depth_lambda: float = 0.5
    kl_lambda: float = 1e-6
    kl_anneal_steps: int = 0        # 0 → constant
    lpips_lambda: float = 0.8
    ssim_lambda: float = 0.0
    fg_mask_loss: bool = True       # weight rgb loss by foreground mask


def masked_mse(pred, target, mask=None):
    if mask is None:
        return jnp.mean((pred - target)**2)
    w = mask / (mask.mean() + 1e-8)  # conf-style normalization
    return jnp.mean(w * (pred - target)**2)


def masked_l1(pred, target, mask=None):
    if mask is None:
        return jnp.mean(jnp.abs(pred - target))
    w = mask / (mask.mean() + 1e-8)
    return jnp.mean(w * jnp.abs(pred - target))


def silog_depth_loss(pred_depth, gt_depth, fg_mask, lambd: float = 0.5):
    """Scale-invariant log depth loss over the foreground (reference
    2-stage depth loss, ``nsr/losses/sdfstudio_losses.py`` SILog)."""
    valid = (fg_mask > 0.5) & (gt_depth > 1e-3)
    d = jnp.where(valid,
                  jnp.log(jnp.maximum(pred_depth, 1e-3))
                  - jnp.log(jnp.maximum(gt_depth, 1e-3)), 0.0)
    n = jnp.maximum(jnp.sum(valid), 1.0)
    mean_sq = jnp.sum(d**2) / n
    sq_mean = (jnp.sum(d) / n)**2
    return mean_sq - lambd * sq_mean


def scale_shift_invariant_depth_loss(pred, gt, mask):
    """Least-squares align pred to gt in scale+shift over the fg, then L2
    (reference uses this for ShapeNet depth supervision)."""
    m = (mask > 0.5).astype(pred.dtype)
    n = jnp.maximum(m.sum(), 1.0)
    p_mean = (pred * m).sum() / n
    g_mean = (gt * m).sum() / n
    p_c = pred - p_mean
    g_c = gt - g_mean
    scale = (m * p_c * g_c).sum() / jnp.maximum((m * p_c**2).sum(), 1e-6)
    aligned = scale * p_c + g_mean
    return (m * (aligned - gt)**2).sum() / n


def ssim(img1, img2, window_size: int = 11, sigma: float = 1.5,
         val_range: float = 2.0):
    """SSIM over NHWC images (gaussian window, per-channel, averaged)."""
    half = window_size // 2
    coords = jnp.arange(window_size, dtype=jnp.float32) - half
    g = jnp.exp(-(coords**2) / (2 * sigma**2))
    g = g / g.sum()
    kernel = jnp.outer(g, g)  # (K, K)

    def filt(x):
        # depthwise conv via conv_general_dilated, NHWC
        C = x.shape[-1]
        k = jnp.tile(kernel[:, :, None, None], (1, 1, 1, C))
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            feature_group_count=C)

    mu1, mu2 = filt(img1), filt(img2)
    mu1_sq, mu2_sq, mu12 = mu1**2, mu2**2, mu1 * mu2
    s1 = filt(img1**2) - mu1_sq
    s2 = filt(img2**2) - mu2_sq
    s12 = filt(img1 * img2) - mu12
    C1 = (0.01 * val_range)**2
    C2 = (0.03 * val_range)**2
    ssim_map = ((2 * mu12 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return ssim_map.mean()


def kl_coeff(step, total_steps, constant_step, min_kl_coeff, max_kl_coeff):
    """Linear KL anneal (reference ``builder.py:192``)."""
    if total_steps <= constant_step:
        return jnp.asarray(max_kl_coeff)
    frac = jnp.clip((step - constant_step)
                    / max(total_steps - constant_step, 1), 0.0, 1.0)
    return min_kl_coeff + (max_kl_coeff - min_kl_coeff) * frac


def reconstruction_losses(pred: dict, target: dict, cfg: LossConfig,
                          kl: Optional[jax.Array] = None,
                          step: Optional[jax.Array] = None,
                          lpips_fn: Optional[Callable] = None):
    """Compute the weighted VAE loss dict.

    pred: dict with image_raw (B,H,W,3), image_mask, image_depth, and
      optionally image_sr.
    target: dict with img (B,H,W,3 in [-1,1]), depth_mask, depth.
    Returns (total_loss, dict of unweighted terms).
    """
    terms = {}
    total = 0.0

    gt_img = target['img']
    fg_mask = target.get('depth_mask')
    rgb_mask = None
    if cfg.fg_mask_loss and fg_mask is not None:
        rgb_mask = fg_mask
        if rgb_mask.ndim == 3:
            rgb_mask = rgb_mask[..., None]

    pred_img = pred['image_raw']
    if cfg.l2_lambda:
        terms['l2'] = masked_mse(pred_img, gt_img, rgb_mask)
        total += cfg.l2_lambda * terms['l2']
    if cfg.l1_lambda:
        terms['l1'] = masked_l1(pred_img, gt_img, rgb_mask)
        total += cfg.l1_lambda * terms['l1']

    if 'image_sr' in pred and 'img_sr' in target:
        terms['l2_sr'] = masked_mse(pred['image_sr'], target['img_sr'], None)
        total += cfg.l2_lambda * terms['l2_sr']

    if cfg.mask_lambda and fg_mask is not None and 'image_mask' in pred:
        m = fg_mask if fg_mask.ndim == 4 else fg_mask[..., None]
        terms['mask'] = jnp.mean((pred['image_mask'] - m)**2)
        total += cfg.mask_lambda * terms['mask']

    if (cfg.depth_lambda and 'depth' in target
            and 'image_depth' in pred and fg_mask is not None):
        gt_d = target['depth']
        if gt_d.ndim == 3:
            gt_d = gt_d[..., None]
        m = fg_mask if fg_mask.ndim == 4 else fg_mask[..., None]
        terms['depth'] = scale_shift_invariant_depth_loss(
            pred['image_depth'], gt_d, m)
        total += cfg.depth_lambda * terms['depth']

    if cfg.ssim_lambda:
        terms['ssim'] = 1.0 - ssim(pred_img, gt_img)
        total += cfg.ssim_lambda * terms['ssim']

    if cfg.lpips_lambda and lpips_fn is not None:
        terms['lpips'] = lpips_fn(pred_img, gt_img)
        total += cfg.lpips_lambda * terms['lpips']

    if kl is not None and cfg.kl_lambda:
        terms['kl'] = jnp.mean(kl)
        coeff = cfg.kl_lambda
        if cfg.kl_anneal_steps and step is not None:
            coeff = kl_coeff(step, cfg.kl_anneal_steps,
                             cfg.kl_anneal_steps // 2, cfg.kl_lambda * 1e-2,
                             cfg.kl_lambda)
        total += coeff * terms['kl']

    return total, terms
