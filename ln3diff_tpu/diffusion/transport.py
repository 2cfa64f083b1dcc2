"""Flow-matching / stochastic-interpolant transport (SiT).

TPU-native rewrite of the reference ``transport/`` package:
path plans (``path.py:18-200`` — Linear/GVP/VP interpolants), training
losses with uniform or lognormal t-sampling (``transport.py:126-190``),
and the ODE sampler (``integrators.py:78-120``) as fixed-step Euler/Heun
``lax.scan``s — the 250-step ODE compiles to a single XLA program instead
of torchdiffeq's host-looped odeint.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp

ModelFn = Callable[..., jax.Array]


def _expand(t, x):
    return t.reshape(t.shape + (1,) * (x.ndim - 1))


@dataclasses.dataclass(frozen=True)
class PathPlan:
    """Interpolant x_t = α(t)·x1 + σ(t)·x0 with velocity u = α'·x1 + σ'·x0."""
    kind: str = 'linear'          # 'linear' | 'gvp' | 'vp'
    sigma_min: float = 0.1        # vp only
    sigma_max: float = 20.0

    def alpha(self, t):
        if self.kind == 'linear':
            return t, jnp.ones_like(t)
        if self.kind == 'gvp':
            return (jnp.sin(t * math.pi / 2),
                    math.pi / 2 * jnp.cos(t * math.pi / 2))
        # vp
        lmc = (-0.25 * (1 - t)**2 * (self.sigma_max - self.sigma_min)
               - 0.5 * (1 - t) * self.sigma_min)
        dlmc = (0.5 * (1 - t) * (self.sigma_max - self.sigma_min)
                + 0.5 * self.sigma_min)
        a = jnp.exp(lmc)
        return a, a * dlmc

    def sigma(self, t):
        if self.kind == 'linear':
            return 1 - t, -jnp.ones_like(t)
        if self.kind == 'gvp':
            return (jnp.cos(t * math.pi / 2),
                    -math.pi / 2 * jnp.sin(t * math.pi / 2))
        lmc = (-0.25 * (1 - t)**2 * (self.sigma_max - self.sigma_min)
               - 0.5 * (1 - t) * self.sigma_min)
        dlmc = (0.5 * (1 - t) * (self.sigma_max - self.sigma_min)
                + 0.5 * self.sigma_min)
        p = 2 * lmc
        s = jnp.sqrt(1 - jnp.exp(p))
        ds = jnp.exp(p) * (2 * dlmc) / (-2 * s)
        return s, ds

    def plan(self, t, x0, x1):
        te = _expand(t, x1)
        a, da = self.alpha(te)
        s, ds = self.sigma(te)
        xt = a * x1 + s * x0
        ut = da * x1 + ds * x0
        return xt, ut

    def score_from_velocity(self, velocity, x, t):
        te = _expand(t, x)
        a, da = self.alpha(te)
        s, ds = self.sigma(te)
        r = a / da
        var = s**2 - r * ds * s
        return (r * velocity - x) / var


@dataclasses.dataclass(frozen=True)
class TransportSpec:
    path: str = 'linear'
    prediction: str = 'velocity'     # only velocity on released paths
    t_sampling: str = 'lognorm'      # 'uniform' | 'lognorm'
    train_eps: float = 0.0
    sample_eps: float = 0.0


class Transport:
    """Functional transport object (reference ``Transport``)."""

    def __init__(self, spec: TransportSpec = TransportSpec()):
        self.spec = spec
        self.path = PathPlan(kind=spec.path)

    def sample_t(self, key, batch):
        t0, t1 = self.spec.train_eps, 1.0 - self.spec.train_eps
        if self.spec.t_sampling == 'lognorm':
            u = jax.random.normal(key, (batch,))
            t = jax.nn.sigmoid(u) * (t1 - t0) + t0
        else:
            t = jax.random.uniform(key, (batch,)) * (t1 - t0) + t0
        return t

    def training_losses(self, model_fn: ModelFn, x1, key, model_kwargs=None):
        """Velocity-matching loss with lognorm t (reference
        ``transport.py:148-190`` + ``FMLoss``)."""
        model_kwargs = model_kwargs or {}
        k_t, k_noise = jax.random.split(key)
        t = self.sample_t(k_t, x1.shape[0])
        x0 = jax.random.normal(k_noise, x1.shape, x1.dtype)
        xt, ut = self.path.plan(t, x0, x1)
        pred = model_fn(xt, t, **model_kwargs)
        axes = tuple(range(1, x1.ndim))
        loss = jnp.mean((pred - ut)**2, axis=axes)
        return {'loss': loss, 'pred': pred, 't': t, 'xt': xt}

    # -- ODE samplers ------------------------------------------------------

    def sample_ode(self, model_fn: ModelFn, shape, key, num_steps: int = 250,
                   method: str = 'euler', model_kwargs=None,
                   reverse: bool = False):
        """Fixed-step probability-flow ODE from noise (t=0) to data (t=1)."""
        model_kwargs = model_kwargs or {}
        x = jax.random.normal(key, shape)
        t0, t1 = self.spec.sample_eps, 1.0
        if reverse:
            t0, t1 = 1.0, self.spec.sample_eps
        dt = (t1 - t0) / num_steps
        ts = t0 + dt * jnp.arange(num_steps, dtype=jnp.float32)

        def velocity(x, t_scalar):
            t = jnp.full((shape[0],), t_scalar, jnp.float32)
            return model_fn(x, t, **model_kwargs)

        if method == 'euler':
            def step(x, t_scalar):
                return x + dt * velocity(x, t_scalar), None
        elif method == 'heun':
            def step(x, t_scalar):
                v1 = velocity(x, t_scalar)
                x_e = x + dt * v1
                v2 = velocity(x_e, t_scalar + dt)
                return x + 0.5 * dt * (v1 + v2), None
        else:
            raise NotImplementedError(method)

        x, _ = jax.lax.scan(step, x, ts)
        return x

    def sample_sde(self, model_fn: ModelFn, shape, key, num_steps: int = 250,
                   diffusion_norm: float = 1.0, model_kwargs=None,
                   last_step_size: float = 0.04):
        """Euler–Maruyama SDE sampler (reference ``Sampler.sample_sde``):
        dx = [v + w·s/2? ] — we follow the score-augmented drift
        v(x,t) + g(t)²/2·score with constant diffusion form, plus a final
        deterministic Euler step ("Mean" last step)."""
        model_kwargs = model_kwargs or {}
        key, k0 = jax.random.split(key)
        x = jax.random.normal(k0, shape)
        t0 = self.spec.sample_eps
        t1 = 1.0 - last_step_size
        dt = (t1 - t0) / num_steps
        ts = t0 + dt * jnp.arange(num_steps, dtype=jnp.float32)

        def drift_score(x, t_vec):
            v = model_fn(x, t_vec, **model_kwargs)
            s = self.path.score_from_velocity(v, x, t_vec)
            return v, s

        def step(carry, t_scalar):
            x, key = carry
            t = jnp.full((shape[0],), t_scalar, jnp.float32)
            v, s = drift_score(x, t)
            g2 = diffusion_norm
            key, k = jax.random.split(key)
            noise = jax.random.normal(k, shape)
            x = x + (v + 0.5 * g2 * s) * dt \
                + jnp.sqrt(g2 * dt) * noise
            return (x, key), None

        (x, key), _ = jax.lax.scan(step, (x, key), ts)
        # final deterministic step
        t = jnp.full((shape[0],), t1, jnp.float32)
        v = model_fn(x, t, **model_kwargs)
        return x + last_step_size * v


def create_transport(path_type: str = 'Linear',
                     prediction: str = 'velocity',
                     snr_type: str = 'lognorm') -> Transport:
    """Factory mirroring reference ``transport/__init__.py:3-71``."""
    return Transport(TransportSpec(path=path_type.lower(),
                                   prediction=prediction,
                                   t_sampling=snr_type))
