"""MipNeRF-style midpoint-quadrature ray marcher.

TPU-native rewrite of ``nsr/volumetric_rendering/ray_marcher.py:26-68``
(``MipRayMarcher2.run_forward``): midpoint colors/densities/depths,
``softplus(sigma - 1)`` density activation, alpha compositing with
transmittance cumprod, optional white background, RGB rescaled to [-1, 1].
Pure function; fuses fully under XLA.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MarchResult(NamedTuple):
    rgb: jax.Array          # (B, R, C) in [-1, 1]
    depth: jax.Array        # (B, R, 1)
    visibility: jax.Array   # (B, R, 1) — background lambda T[..., -1]
    weights: jax.Array      # (B, R, S-1, 1)


def march_rays(colors: jax.Array, densities: jax.Array, depths: jax.Array,
               white_back: bool = True) -> MarchResult:
    """Composite samples along rays.

    Args:
      colors: ``(B, R, S, C)`` raw decoder features (first C dims rendered).
      densities: ``(B, R, S, 1)`` raw densities (pre-activation).
      depths: ``(B, R, S, 1)`` sorted sample depths.
    """
    deltas = depths[:, :, 1:] - depths[:, :, :-1]
    colors_mid = (colors[:, :, :-1] + colors[:, :, 1:]) * 0.5
    densities_mid = (densities[:, :, :-1] + densities[:, :, 1:]) * 0.5
    depths_mid = (depths[:, :, :-1] + depths[:, :, 1:]) * 0.5

    # Activation bias of -1 initializes better (reference ray_marcher.py:33).
    densities_mid = jax.nn.softplus(densities_mid - 1.0)

    density_delta = densities_mid * deltas
    alpha = 1.0 - jnp.exp(-density_delta)

    alpha_shifted = jnp.concatenate(
        [jnp.ones_like(alpha[:, :, :1]), 1.0 - alpha + 1e-10], axis=-2)
    transmittance = jnp.cumprod(alpha_shifted, axis=-2)
    weights = alpha * transmittance[:, :, :-1]
    visibility = transmittance[:, :, -1]

    composite_rgb = jnp.sum(weights * colors_mid, axis=-2)
    weight_total = jnp.sum(weights, axis=2)
    composite_depth = jnp.sum(weights * depths_mid, axis=-2)

    composite_depth = jnp.nan_to_num(composite_depth, nan=jnp.inf)
    composite_depth = jnp.clip(composite_depth, jnp.min(depths),
                               jnp.max(depths))

    if white_back:
        composite_rgb = composite_rgb + 1.0 - weight_total

    composite_rgb = composite_rgb * 2.0 - 1.0
    return MarchResult(composite_rgb, composite_depth, visibility, weights)
