"""Timestep samplers for discrete diffusion training.

Rewrite of ``guided_diffusion/resample.py``: uniform sampling and the
loss-second-moment importance resampler.  The reference synchronizes
per-rank loss history with ``dist.all_gather`` (:71-106); here history
updates run under pjit so a ``jax.lax.all_gather`` over the data axis (or
simple full-batch updates on single host) replaces the collective
plumbing.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def uniform_timesteps(key, batch: int, num_timesteps: int):
    """UniformSampler: t ~ U{0..T-1}, weights = 1."""
    t = jax.random.randint(key, (batch,), 0, num_timesteps)
    return t, jnp.ones((batch,))


@dataclasses.dataclass
class LossSecondMomentResampler:
    """Importance-sample t ∝ sqrt(E[loss²]) with uniform mixing
    (reference ``LossSecondMomentResampler:124``).  History lives in host
    numpy (it changes slowly; no need to keep it on device)."""
    num_timesteps: int
    history_per_term: int = 10
    uniform_prob: float = 0.001

    def __post_init__(self):
        self._loss_history = np.zeros(
            (self.num_timesteps, self.history_per_term), np.float64)
        self._loss_counts = np.zeros(self.num_timesteps, np.int64)

    def _warmed_up(self) -> bool:
        return bool((self._loss_counts == self.history_per_term).all())

    def weights(self) -> np.ndarray:
        if not self._warmed_up():
            return np.ones(self.num_timesteps, np.float64)
        w = np.sqrt(np.mean(self._loss_history**2, axis=-1))
        w /= w.sum()
        w *= 1 - self.uniform_prob
        w += self.uniform_prob / len(w)
        return w

    def sample(self, rng: np.random.Generator, batch: int):
        """Returns (t (batch,), importance weights (batch,)) as numpy."""
        p = self.weights()
        p = p / p.sum()
        t = rng.choice(self.num_timesteps, size=batch, p=p)
        weights = 1.0 / (self.num_timesteps * p[t])
        return t.astype(np.int32), weights.astype(np.float32)

    def update_with_losses(self, ts: np.ndarray, losses: np.ndarray):
        """Feed back per-sample losses (already gathered across hosts by
        the caller when running multi-host)."""
        for t, loss in zip(np.asarray(ts), np.asarray(losses)):
            if self._loss_counts[t] == self.history_per_term:
                self._loss_history[t, :-1] = self._loss_history[t, 1:]
                self._loss_history[t, -1] = loss
            else:
                self._loss_history[t, self._loss_counts[t]] = loss
                self._loss_counts[t] += 1
