"""Point MLP decoders mapping sampled triplane features → (rgb, sigma).

TPU-native rewrite of the reference decoders:
  * ``OSGDecoder`` — mean-pool over planes → FC(64) → softplus → FC(1+C),
    sigmoid RGB clamping (reference ``nsr/triplane.py:338-375``).
  * ``LRMOSGDecoder`` — concat planes → 4-layer ReLU MLP
    (reference ``nsr/triplane.py:378-420``).

Both return raw features suitable for the renderer; the first channel is
density, the rest are color/features.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import EqualDense


def _sigmoid_clamp(rgb: jax.Array) -> jax.Array:
    """MipNeRF sigmoid clamping: sigmoid(x)*(1+2*0.001)-0.001."""
    return jax.nn.sigmoid(rgb) * 1.002 - 0.001


class OSGDecoder(nn.Module):
    """EG3D-style decoder. Input features ``(B, n_planes, M, C)``."""
    decoder_output_dim: int = 32
    hidden_dim: int = 64
    decoder_lr_mul: float = 1.0
    activation: str = 'sigmoid'   # 'sigmoid' | 'lrelu'

    @nn.compact
    def __call__(self, sampled_features: jax.Array, ray_directions=None):
        x = jnp.mean(sampled_features, axis=1)  # aggregate planes
        x = EqualDense(self.hidden_dim, lr_multiplier=self.decoder_lr_mul)(x)
        x = jax.nn.softplus(x)
        x = EqualDense(1 + self.decoder_output_dim,
                       lr_multiplier=self.decoder_lr_mul)(x)
        sigma = x[..., 0:1]
        rgb = x[..., 1:]
        if self.activation == 'sigmoid':
            rgb = _sigmoid_clamp(rgb)
        elif self.activation == 'lrelu':
            rgb = nn.leaky_relu(rgb, 0.2) * math.sqrt(2)
        return rgb, sigma


class LRMOSGDecoder(nn.Module):
    """LRM-style decoder: concat plane features, deeper ReLU MLP."""
    hidden_dim: int = 64
    num_layers: int = 4
    decoder_output_dim: int = 3

    @nn.compact
    def __call__(self, sampled_features: jax.Array, ray_directions=None):
        B, n_planes, M, C = sampled_features.shape
        x = jnp.transpose(sampled_features, (0, 2, 1, 3)).reshape(
            B, M, n_planes * C)
        x = nn.Dense(self.hidden_dim)(x)
        x = nn.relu(x)
        for _ in range(self.num_layers - 2):
            x = nn.Dense(self.hidden_dim)(x)
            x = nn.relu(x)
        x = nn.Dense(1 + self.decoder_output_dim)(x)
        sigma = x[..., 0:1]
        rgb = _sigmoid_clamp(x[..., 1:])
        return rgb, sigma
