"""Confidence network (unsup3d-style) for confidence-weighted rec losses.

Rewrite of ``nsr/confnet.py`` (62 LoC): a small conv encoder-decoder
predicting per-pixel confidence maps; the loss divides residuals by the
confidence and regularizes log-confidence (aleatoric weighting).
Optional (off the released paths) — kept for inventory parity.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConfNet(nn.Module):
    base_ch: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) image in [-1, 1] → confidence (B, H, W, 1) > 0."""
        dt = self.dtype
        h = x.astype(dt)
        skips = []
        for i, ch in enumerate((self.base_ch, 2 * self.base_ch)):
            h = nn.Conv(ch, (4, 4), strides=(2, 2), dtype=dt,
                        name=f'down_{i}')(h)
            h = nn.gelu(nn.GroupNorm(num_groups=8, dtype=dt,
                                     name=f'gn_{i}')(h))
            skips.append(h)
        for i, ch in enumerate((self.base_ch, self.base_ch)):
            B, H, W, C = h.shape
            h = jax.image.resize(h, (B, 2 * H, 2 * W, C), 'nearest')
            h = nn.gelu(nn.Conv(ch, (3, 3), dtype=dt, name=f'up_{i}')(h))
        out = nn.Conv(1, (3, 3), dtype=dt, name='out')(h)
        return jax.nn.softplus(out) + 1e-6


def confidence_weighted_l2(pred, target, conf):
    """Aleatoric L2: |e|²/(2σ²) + log σ (unsup3d eq. 2)."""
    err = jnp.square(pred - target).mean(axis=-1, keepdims=True)
    return (err / (2 * jnp.square(conf)) + jnp.log(conf)).mean()
