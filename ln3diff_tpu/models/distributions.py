"""Diagonal Gaussian posterior math (pure functions).

Rewrite of ``utils/torch_utils/distributions/distributions.py:44-138``
(``DiagonalGaussianDistribution`` with the LSGM soft-clamp).  Works on
channels-last moments; mean/logvar are the caller's split.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

_LOG_2PI = math.log(2.0 * math.pi)


def soft_clamp20(x: jax.Array) -> jax.Array:
    """Differentiable clamp to [-20, 20] (LSGM)."""
    return jnp.tanh(x / 20.0) * 20.0


class DiagonalGaussian(NamedTuple):
    mean: jax.Array
    logvar: jax.Array

    @property
    def std(self):
        return jnp.exp(0.5 * self.logvar)

    @property
    def var(self):
        return jnp.exp(self.logvar)

    def sample(self, key: jax.Array) -> jax.Array:
        return self.mean + self.std * jax.random.normal(
            key, self.mean.shape, self.mean.dtype)

    def mode(self) -> jax.Array:
        return self.mean

    def kl(self) -> jax.Array:
        """KL to N(0, I), summed over non-batch dims."""
        axes = tuple(range(1, self.mean.ndim))
        return 0.5 * jnp.sum(
            jnp.square(self.mean) + self.var - 1.0 - self.logvar, axis=axes)

    def log_p(self, samples: jax.Array) -> jax.Array:
        """Elementwise log density surrogate (reference ``log_p`` — note the
        reference normalizes by var, not std; kept for parity)."""
        normalized = (samples - self.mean) / self.var
        return (-0.5 * normalized * normalized - 0.5 * _LOG_2PI - self.logvar)

    def normal_entropy(self) -> jax.Array:
        return self.logvar + 0.5 * (_LOG_2PI + 1.0)

    def nll(self, sample: jax.Array) -> jax.Array:
        axes = tuple(range(1, self.mean.ndim))
        return 0.5 * jnp.sum(
            _LOG_2PI + self.logvar
            + jnp.square(sample - self.mean) / self.var, axis=axes)


def make_gaussian(moments_mean: jax.Array, moments_logvar: jax.Array,
                  soft_clamp: bool = True) -> DiagonalGaussian:
    if soft_clamp:
        logvar = soft_clamp20(moments_logvar)
    else:
        logvar = jnp.clip(moments_logvar, -30.0, 20.0)
    return DiagonalGaussian(moments_mean, logvar)
