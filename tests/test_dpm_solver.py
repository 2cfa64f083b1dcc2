"""DPM-Solver++(2M) vs DDIM on an analytically-known diffusion.

For Gaussian data N(μ, s²I) the optimal eps-predictor has the closed
form eps*(x,t) = σ_t (x − a_t μ) / (a_t² s² + σ_t²) (a = √ᾱ).  Both
250-step DDIM (η=0) and 20-step DPM-Solver++ integrate the same
probability-flow ODE, so from the same initial noise their outputs must
agree per-sample, and the sample statistics must match (μ, s).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from ln3diff_tpu.diffusion.dpm_solver import (dpm_solver_sample_loop,
                                              dpm_solver_timesteps)
from ln3diff_tpu.diffusion.gaussian import make_diffusion

MU, S = 0.7, 0.3


def analytic_eps_fn(diffusion):
    acp = diffusion.alphas_cumprod

    def model_fn(x, t_scaled):
        t = t_scaled.astype(jnp.int32)
        a2 = jnp.take(acp, t).reshape((-1,) + (1,) * (x.ndim - 1))
        a = jnp.sqrt(a2)
        s2 = 1.0 - a2
        return jnp.sqrt(s2) * (x - a * MU) / (a2 * S**2 + s2)

    return model_fn


class TestDPMSolver:

    def test_timestep_grid(self):
        ts = dpm_solver_timesteps(1000, 20)
        assert ts[0] == 999 and ts[-1] == 0 and len(ts) == 21
        assert (np.diff(ts) < 0).all()

    def test_matches_ddim_and_statistics(self):
        diffusion = make_diffusion(steps=1000, mean_type='eps')
        model_fn = analytic_eps_fn(diffusion)
        shape = (256, 4)
        noise = jax.random.normal(jax.random.PRNGKey(0), shape)

        x_ddim = np.asarray(jax.jit(lambda n: diffusion.ddim_sample_loop(
            model_fn, shape, jax.random.PRNGKey(1), eta=0.0,
            x_init=n))(noise))

        errs = {}
        for n_steps in (10, 20, 40):
            x = np.asarray(jax.jit(
                lambda n, s=n_steps: dpm_solver_sample_loop(
                    diffusion, model_fn, shape, None, num_steps=s,
                    noise=n))(noise))
            assert np.isfinite(x).all()
            errs[n_steps] = np.max(np.abs(x - x_ddim))
            if n_steps >= 20:
                # distribution statistics recover (μ, s)
                assert abs(x.mean() - MU) < 0.05, (n_steps, x.mean())
                assert abs(x.std() - S) < 0.07, (n_steps, x.std())
        # same probability-flow ODE → converges to the 1000-step DDIM
        # solution.  Regression bounds for the round-2 fixes (logSNR grid
        # + the h_cur/(2·h_prev) 2M coefficient): the uniform-t grid with
        # the inverted coefficient scored errs[10]=0.32, errs[40]=0.17.
        assert errs[10] < 0.08, errs
        assert errs[20] < errs[10]
        assert errs[40] < errs[20]
        assert errs[40] < 0.02, errs

    def test_v_prediction_path(self):
        diffusion = make_diffusion(steps=1000, mean_type='v')
        acp = diffusion.alphas_cumprod

        def v_model(x, t_scaled):
            t = t_scaled.astype(jnp.int32)
            a2 = jnp.take(acp, t).reshape((-1,) + (1,) * (x.ndim - 1))
            a = jnp.sqrt(a2)
            s2 = 1.0 - a2
            eps = jnp.sqrt(s2) * (x - a * MU) / (a2 * S**2 + s2)
            x0 = (x - jnp.sqrt(s2) * eps) / a
            return a * eps - jnp.sqrt(s2) * x0            # v = a·eps − σ·x0

        shape = (128, 2)
        noise = jax.random.normal(jax.random.PRNGKey(2), shape)
        x = np.asarray(jax.jit(lambda n: dpm_solver_sample_loop(
            diffusion, v_model, shape, None, num_steps=20, noise=n))(noise))
        assert abs(x.mean() - MU) < 0.08
        assert abs(x.std() - S) < 0.08
