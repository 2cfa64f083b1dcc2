"""Common layers shared across the model zoo.

Includes TPU-native equivalents of the reference's fused CUDA helpers:
``FullyConnectedLayer`` with StyleGAN lr-multiplier semantics
(reference ``nsr/networks_stylegan2.py`` + ``utils/torch_utils/ops/bias_act``)
and the sinusoidal timestep embedding (``guided_diffusion/nn.py:103-123``).
bias+activation fusion is left to XLA — no custom kernel needed.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class EqualDense(nn.Module):
    """Dense layer with runtime weight scaling (StyleGAN "equalized lr").

    Matches reference ``FullyConnectedLayer``: params are initialized
    ~N(0, 1/lr_multiplier); at call time the weight is multiplied by
    ``lr_multiplier / sqrt(fan_in)`` and the bias by ``lr_multiplier``.
    """
    features: int
    lr_multiplier: float = 1.0
    use_bias: bool = True
    bias_init: float = 0.0
    activation: Optional[Callable[[jax.Array], jax.Array]] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        w = self.param(
            'kernel',
            lambda key, shape: jax.random.normal(key, shape)
            / self.lr_multiplier, (in_features, self.features))
        y = x @ (w * (self.lr_multiplier / math.sqrt(in_features))).astype(
            x.dtype)
        if self.use_bias:
            b = self.param('bias', nn.initializers.constant(self.bias_init),
                           (self.features,))
            y = y + (b * self.lr_multiplier).astype(x.dtype)
        if self.activation is not None:
            y = self.activation(y)
        return y


def timestep_embedding(timesteps: jax.Array, dim: int,
                       max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal timestep embeddings (reference ``guided_diffusion/nn.py``).

    Args:
      timesteps: ``(N,)`` float or int timesteps.
    Returns:
      ``(N, dim)``.
    """
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class MLP(nn.Module):
    """Simple MLP with configurable activation (used by DiT blocks)."""
    hidden_features: int
    out_features: int
    activation: Callable = nn.gelu

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_features)(x)
        x = self.activation(x)
        return nn.Dense(self.out_features)(x)


def modulate(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    """adaLN modulation: x * (1 + scale) + shift (DiT convention)."""
    return x * (1.0 + scale[:, None]) + shift[:, None]
