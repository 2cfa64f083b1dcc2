"""VPSDE + resampler tests (closed-form checks)."""

import numpy as np
import jax
import jax.numpy as jnp

from ln3diff_tpu.diffusion.resample import (LossSecondMomentResampler,
                                            uniform_timesteps)
from ln3diff_tpu.diffusion.vpsde import (VPSDE, get_mixed_prediction,
                                         vpsde_training_losses)


class TestVPSDE:

    def test_var_monotone_and_bounds(self):
        sde = VPSDE()
        t = jnp.linspace(0.01, 1.0, 50)
        v = np.asarray(sde.var(t))
        assert (np.diff(v) > 0).all()
        assert v[0] < 0.01 and v[-1] > 0.99

    def test_inv_var_roundtrip(self):
        sde = VPSDE()
        t = jnp.linspace(0.02, 0.98, 20)
        v = sde.var(t)
        t_rec = sde.inv_var(v)
        np.testing.assert_allclose(np.asarray(t_rec), np.asarray(t),
                                   rtol=1e-4, atol=1e-5)

    def test_mean_var_consistency(self):
        """α² + σ² = 1 for the VPSDE (sigma2_0=0)."""
        sde = VPSDE()
        t = jnp.linspace(0.01, 1.0, 30)
        total = np.asarray(sde.e2int_f(t)**2 + sde.var(t))
        np.testing.assert_allclose(total, 1.0, atol=1e-6)

    def test_eps_x0_conversions(self):
        sde = VPSDE()
        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (4, 8))
        noise = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
        t = jnp.full((4,), 0.5)
        var_t = sde.var(t)[:, None]
        m_t = sde.e2int_f(t)[:, None]
        z = sde.sample_q(x0, noise, var_t, m_t)
        logsnr = sde.log_snr(m_t, var_t)
        x0_rec = sde.predict_x0_from_eps(z, noise, logsnr)
        np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0),
                                   rtol=1e-4, atol=1e-5)
        eps_rec = sde.predict_eps_from_x0(z, x0, logsnr)
        np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(noise),
                                   rtol=1e-4, atol=1e-5)

    def test_iw_modes_shapes(self):
        sde = VPSDE()
        for mode in ['ll_uniform', 'll_iw', 'drop_all_uniform',
                     'drop_sigma2t_iw', 'drop_sigma2t_uniform',
                     'rescale_iw']:
            iw = sde.iw_quantities(jax.random.PRNGKey(0), 16, mode)
            t = np.asarray(iw.t)
            assert t.shape == (16,)
            assert (t >= sde.time_eps - 1e-6).all() and (t <= 1.0 + 1e-6).all()
            assert np.isfinite(np.asarray(iw.obj_weight_t)).all()

    def test_mixed_prediction_blend(self):
        p = jnp.ones((2, 4))
        mix = jnp.zeros((2, 4))
        out = get_mixed_prediction(True, p, jnp.zeros((1, 4)), mix)
        np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-6)
        out2 = get_mixed_prediction(False, p, None, mix)
        np.testing.assert_allclose(np.asarray(out2), 1.0)

    def test_training_loss_perfect_gaussian_model(self):
        """For x0 ~ N(0,I), eps* = sqrt(var)·x_t achieves the minimal loss;
        with mixing enabled and a zero network + logit→-inf... instead:
        check the analytic eps beats a zero prediction."""
        sde = VPSDE()
        x0 = jax.random.normal(jax.random.PRNGKey(0), (256, 8, 8, 4))

        def eps_opt(x_t, t):
            var_t = sde.var(t).reshape(-1, 1, 1, 1)
            return jnp.sqrt(var_t) * x_t

        def eps_zero(x_t, t):
            return jnp.zeros_like(x_t)

        l_opt = float(vpsde_training_losses(
            sde, eps_opt, x0, jax.random.PRNGKey(1))['loss'].mean())
        l_zero = float(vpsde_training_losses(
            sde, eps_zero, x0, jax.random.PRNGKey(1))['loss'].mean())
        assert l_opt < l_zero

    def test_ode_sampler_gaussian(self):
        """With the analytic N(0,I) eps model the ODE must keep standard
        normal marginals."""
        sde = VPSDE()

        def eps_opt(x, t):
            var_t = sde.var(t).reshape(-1, 1, 1, 1)
            return jnp.sqrt(var_t) * x

        x = sde.sample_ode(eps_opt, (512, 2, 2, 2), jax.random.PRNGKey(0),
                           num_steps=100)
        xn = np.asarray(x)
        assert abs(xn.mean()) < 0.1
        assert abs(xn.std() - 1.0) < 0.1


class TestResampler:

    def test_uniform(self):
        t, w = uniform_timesteps(jax.random.PRNGKey(0), 100, 10)
        assert (np.asarray(t) < 10).all()
        np.testing.assert_allclose(np.asarray(w), 1.0)

    def test_loss_aware_warmup_and_bias(self):
        rs = LossSecondMomentResampler(num_timesteps=4, history_per_term=2)
        rng = np.random.default_rng(0)
        t, w = rs.sample(rng, 32)
        np.testing.assert_allclose(w, 1.0)  # uniform during warmup
        # feed losses: t=3 always high loss
        for _ in range(8):
            ts = np.arange(4)
            losses = np.array([0.1, 0.1, 0.1, 10.0])
            rs.update_with_losses(ts, losses)
        assert rs._warmed_up()
        t, w = rs.sample(rng, 50000)
        frac3 = (t == 3).mean()
        assert frac3 > 0.5  # strongly oversampled
        # importance weights must compensate: E[w * 1{t=i}] = 1/T
        for i in range(4):
            est = w[t == i].sum() / len(t)
            np.testing.assert_allclose(est, 0.25, rtol=0.25)


class TestKLBalancer:

    def test_plain_and_balanced(self):
        import jax.numpy as jnp
        import numpy as np
        from ln3diff_tpu.diffusion.vpsde import kl_balancer, kl_per_group
        kl = jnp.asarray([[1.0, 3.0], [1.0, 3.0]])
        plain = float(kl_balancer(kl, kl_coeff=0.5))
        assert abs(plain - 0.5 * 4.0) < 1e-6
        balanced = float(kl_balancer(kl, balance=True))
        # group coeffs sum to n_groups; heavier group upweighted
        mean, alpha = kl_per_group(kl)
        assert np.allclose(np.asarray(mean), [1.0, 3.0])
        assert balanced > plain / 0.5 * 0.5  # finite, reweighted
        assert np.isfinite(balanced)
