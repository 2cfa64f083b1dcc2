"""Diffusion-process tests: golden values vs torch-free closed forms and
the reference's published schedule math."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ln3diff_tpu.diffusion.edm import (DiscreteDenoiser, edm_training_loss,
                                       euler_edm_sample, legacy_ddpm_sigmas)
from ln3diff_tpu.diffusion.gaussian import (GaussianDiffusion, DiffusionSpec,
                                            get_named_beta_schedule,
                                            make_cfg_model_fn, make_diffusion,
                                            space_timesteps)
from ln3diff_tpu.diffusion.transport import PathPlan, Transport, TransportSpec

pytestmark = pytest.mark.slow


class TestSchedules:

    def test_linear_schedule_endpoints(self):
        b = get_named_beta_schedule('linear', 1000)
        assert abs(b[0] - 1e-4) < 1e-10
        assert abs(b[-1] - 0.02) < 1e-10

    def test_space_timesteps_ddim(self):
        s = space_timesteps(1000, 'ddim250')
        assert len(s) == 250
        assert s[0] == 0 and s[1] - s[0] == 4

    def test_respaced_alphas_match(self):
        """Respaced diffusion must preserve ᾱ at the retained steps."""
        full = make_diffusion(steps=1000)
        spaced = make_diffusion(steps=1000, timestep_respacing='ddim250')
        keep = space_timesteps(1000, 'ddim250')
        np.testing.assert_allclose(
            np.asarray(spaced.alphas_cumprod),
            np.asarray(full.alphas_cumprod)[keep], rtol=1e-5)

    def test_qsample_snr(self):
        d = make_diffusion(steps=1000)
        x0 = jnp.ones((4, 8))
        noise = jnp.zeros((4, 8))
        t = jnp.array([0, 10, 500, 999])
        xt = d.q_sample(x0, t, noise)
        expected = np.sqrt(np.asarray(d.alphas_cumprod)[np.asarray(t)])
        np.testing.assert_allclose(np.asarray(xt)[:, 0], expected, rtol=1e-5)


class TestConversions:

    def test_v_roundtrip(self):
        d = make_diffusion(steps=100)
        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (3, 5))
        noise = jax.random.normal(jax.random.PRNGKey(1), (3, 5))
        t = jnp.array([5, 50, 95])
        xt = d.q_sample(x0, t, noise)
        v = d.predict_v(x0, t, noise)
        x0_rec = d.predict_xstart_from_v(xt, t, v)
        eps_rec = d.predict_eps_from_v(xt, t, v)
        np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(noise),
                                   rtol=1e-4, atol=1e-5)

    def test_eps_xstart_roundtrip(self):
        d = make_diffusion(steps=100)
        x0 = jax.random.normal(jax.random.PRNGKey(0), (3, 5))
        noise = jax.random.normal(jax.random.PRNGKey(1), (3, 5))
        t = jnp.array([1, 40, 98])
        xt = d.q_sample(x0, t, noise)
        x0_rec = d.predict_xstart_from_eps(xt, t, noise)
        np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0),
                                   rtol=1e-4, atol=1e-5)
        eps_rec = d.predict_eps_from_xstart(xt, t, x0)
        np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(noise),
                                   rtol=1e-3, atol=1e-4)


class TestSampling:

    def test_ddim_gaussian_exact(self):
        """With a linear-score model for N(0, I) data, DDIM must keep the
        marginals standard normal: the analytic eps for x_t ~ N(0,1) data is
        eps = sqrt(1-ᾱ)·x_t (score matching), and DDIM maps N(0,I)→N(0,I)."""
        d = make_diffusion(steps=100, timestep_respacing='25')

        def model_fn(x, t_scaled):
            # eps*(x,t) = sqrt(1-ᾱ_t)·x for unit-Gaussian data
            acp_full = np.cumprod(
                1 - get_named_beta_schedule('linear', 100))
            table = jnp.asarray(np.sqrt(1 - acp_full), jnp.float32)
            coef = jnp.take(table, t_scaled).reshape(-1, 1)
            return coef * x

        x = d.ddim_sample_loop(model_fn, (512, 16), jax.random.PRNGKey(0))
        xn = np.asarray(x)
        assert abs(xn.mean()) < 0.1
        assert abs(xn.std() - 1.0) < 0.1

    def test_ddpm_loop_runs(self):
        d = make_diffusion(steps=50, timestep_respacing='10')

        def model_fn(x, t):
            return jnp.zeros_like(x)

        x = d.p_sample_loop(model_fn, (2, 4), jax.random.PRNGKey(0))
        assert np.isfinite(np.asarray(x)).all()

    def test_cfg_wrapper_mixes(self):
        def model_fn(x, t, ctx=None):
            # conditioned half returns ctx value, "uncond" returns 0
            return jnp.broadcast_to(ctx[:, None], x.shape)

        guided = make_cfg_model_fn(model_fn, cfg_scale=2.0,
                                   uncond_kwargs={'ctx': jnp.zeros((3,))})
        x = jnp.ones((3, 4))
        out = guided(x, jnp.zeros((3,), jnp.int32), ctx=jnp.ones((3,)))
        # uncond=0, cond=1 → 0 + 2*(1-0) = 2
        np.testing.assert_allclose(np.asarray(out), 2.0, atol=1e-6)

    def test_training_losses_eps_zero_model(self):
        d = make_diffusion(steps=100)
        x0 = jax.random.normal(jax.random.PRNGKey(0), (8, 16))
        t = jnp.array([10] * 8)
        out = d.training_losses(lambda x, tt: jnp.zeros_like(x), x0, t,
                                jax.random.PRNGKey(1))
        # target is the noise; E[noise²]=1
        assert abs(float(out['loss'].mean()) - 1.0) < 0.3


class TestTransport:

    def test_linear_path_plan(self):
        p = PathPlan('linear')
        t = jnp.array([0.25])
        x0 = jnp.ones((1, 4))
        x1 = jnp.full((1, 4), 3.0)
        xt, ut = p.plan(t, x0, x1)
        np.testing.assert_allclose(np.asarray(xt), 0.25 * 3 + 0.75 * 1,
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(ut), 3.0 - 1.0, rtol=1e-6)

    def test_gvp_path_unit_norm(self):
        p = PathPlan('gvp')
        t = jnp.array([0.3])
        a, _ = p.alpha(t)
        s, _ = p.sigma(t)
        np.testing.assert_allclose(np.asarray(a**2 + s**2), 1.0, rtol=1e-6)

    def test_ode_recovers_shifted_gaussian(self):
        """Velocity for x1 ~ N(m, I), x0 ~ N(0,I), linear path:
        u*(x,t) = E[x1-x0 | x_t].  For Gaussians this is linear; use the
        exact posterior mean to verify the Euler scan converges to mean m."""
        m = 3.0
        tr = Transport(TransportSpec(path='linear', t_sampling='uniform'))

        def velocity(x, t, **kw):
            t = t.reshape(-1, 1)
            # joint Gaussian: x_t = t x1 + (1-t) x0 →
            # E[x1|x_t] = (m σ² + t(x_t - (1-t)·0… )) — derive directly:
            # Var(x_t) = t² + (1-t)², Cov(x1, x_t) = t
            var = t**2 + (1 - t)**2
            e_x1 = m + t * (x - t * m) / var
            e_x0 = (1 - t) * (x - t * m) / var
            return e_x1 - e_x0

        x = tr.sample_ode(velocity, (2048, 2), jax.random.PRNGKey(0),
                          num_steps=100)
        xn = np.asarray(x)
        assert abs(xn.mean() - m) < 0.15
        assert abs(xn.std() - 1.0) < 0.15

    def test_lognorm_t_sampling_range(self):
        tr = Transport(TransportSpec(t_sampling='lognorm'))
        t = tr.sample_t(jax.random.PRNGKey(0), 1000)
        tn = np.asarray(t)
        assert (tn > 0).all() and (tn < 1).all()
        assert 0.4 < np.median(tn) < 0.6

    def test_training_loss_perfect_model(self):
        tr = Transport(TransportSpec(path='linear'))
        x1 = jax.random.normal(jax.random.PRNGKey(0), (16, 8))

        # cheat: a model that returns the exact ut is impossible without
        # knowing x0; instead check loss of the mean-velocity model beats a
        # zero model for concentrated data
        x1_const = jnp.full((64, 8), 2.0)
        out_zero = tr.training_losses(lambda x, t: jnp.zeros_like(x),
                                      x1_const, jax.random.PRNGKey(1))
        out_mean = tr.training_losses(
            lambda x, t: jnp.full_like(x, 2.0), x1_const,
            jax.random.PRNGKey(1))
        assert float(out_mean['loss'].mean()) < float(out_zero['loss'].mean())


class TestEDM:

    def test_legacy_sigmas_descending(self):
        s = legacy_ddpm_sigmas(250)
        assert (np.diff(s) < 0).all()
        assert s[-1] < 0.05 and s[0] > 10  # LegacyDDPM σ_max ≈ 14.6

    def test_discrete_denoiser_eps_identity(self):
        """With F ≡ 0 and EpsScaling, D(x;σ) = x (c_skip=1, c_out·0)."""
        den = DiscreteDenoiser(num_idx=100, scaling='eps')
        x = jnp.ones((2, 4))
        sigma = jnp.array([1.0, 5.0])
        out = den(lambda xx, cn, cond: jnp.zeros_like(xx), x, sigma, None)
        np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)

    def test_euler_sampler_zero_denoiser(self):
        """If the network predicts eps = x/σ-ish such that denoised ≡ 0,
        Euler steps contract x to 0."""
        den = DiscreteDenoiser(num_idx=100, scaling='eps')

        def network(x, cn, cond):
            # choose F so that c_out*F + c_skip*x = 0 → F = x/σ... but σ is
            # folded in; easier: denoised ≈ 0 means d=(x-0)/σ; x decays to 0.
            return x / jnp.sqrt(1.0)  # not exact; just finite

        x = euler_edm_sample(den, lambda x, cn, cond: x, (2, 4),
                             jax.random.PRNGKey(0),
                             cond={'v': jnp.ones((2, 1))},
                             uc={'v': jnp.zeros((2, 1))},
                             num_steps=20, cfg_scale=1.0)
        assert np.isfinite(np.asarray(x)).all()

    def test_edm_training_loss_finite(self):
        den = DiscreteDenoiser(num_idx=100, scaling='eps')
        x0 = jax.random.normal(jax.random.PRNGKey(0), (4, 8))
        loss = edm_training_loss(den, lambda x, cn, cond: jnp.zeros_like(x),
                                 x0, jax.random.PRNGKey(1), None)
        assert np.isfinite(np.asarray(loss)).all()


class TestMixedPrediction:
    """LSGM mixing-logit semantics (reference gaussian_diffusion.py:327-348
    + continuous_diffusion_utils.py:748): v outputs convert to eps BEFORE
    mixing, and the blend is treated as eps."""

    def _setup(self):
        from ln3diff_tpu.diffusion.gaussian import make_diffusion
        d = make_diffusion(steps=100, mean_type='v', mixed_prediction=True)
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (4, 8))
        v = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
        t = jnp.array([3, 17, 50, 90])
        return d, x, v, t

    def test_v_converts_to_eps_before_mixing(self):
        d, x, v, t = self._setup()
        logit = jnp.asarray(0.3)
        _, _, _, x0 = d.p_mean_variance(v, x, t, mixing_logit=logit)
        # manual: eps = eps(v), blend in eps space, x0 from blended eps
        eps = d.predict_eps_from_v(x, t, v)
        m = jax.nn.sigmoid(logit)
        comp = d._extract(d.sqrt_one_minus_alphas_cumprod, t, x.ndim) * x
        eps_mix = (1 - m) * comp + m * eps
        expect = d.predict_xstart_from_eps(x, t, eps_mix)
        np.testing.assert_allclose(np.asarray(x0), np.asarray(expect),
                                   rtol=1e-5, atol=1e-5)

    def test_saturated_logit_recovers_plain_v(self):
        """σ(logit)→1 must reduce to the unmixed v path."""
        d, x, v, t = self._setup()
        _, _, _, x0 = d.p_mean_variance(v, x, t,
                                        mixing_logit=jnp.asarray(30.0))
        expect = d.predict_xstart_from_v(x, t, v)
        np.testing.assert_allclose(np.asarray(x0), np.asarray(expect),
                                   rtol=1e-4, atol=1e-4)

    def test_x0_space_mixing_component(self):
        from ln3diff_tpu.diffusion.gaussian import make_diffusion
        d = make_diffusion(steps=100, mean_type='x0',
                           mixed_prediction=True)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 8))
        out = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
        t = jnp.array([3, 17, 50, 90])
        logit = jnp.asarray(-0.7)
        _, _, _, x0 = d.p_mean_variance(out, x, t, mixing_logit=logit)
        m = jax.nn.sigmoid(logit)
        comp = d._extract(d.sqrt_alphas_cumprod, t, x.ndim) * x
        expect = (1 - m) * comp + m * out
        np.testing.assert_allclose(np.asarray(x0), np.asarray(expect),
                                   rtol=1e-5, atol=1e-5)

    def test_dpm_solver_mixing_logit(self):
        """DPM branch applies the same blend (was silently ignored)."""
        from ln3diff_tpu.diffusion.dpm_solver import _to_x0
        d, x, v, t = self._setup()
        logit = jnp.asarray(0.3)
        got = _to_x0(d, v, x, t, mixing_logit=logit)
        _, _, _, expect = d.p_mean_variance(v, x, t, mixing_logit=logit)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                                   rtol=1e-5, atol=1e-5)


class TestVLB:
    """VERDICT #9: VLB/hybrid loss + bpd for learned_range models —
    numeric parity vs the reference ``gaussian_diffusion.py:1012-1177``."""

    def _ref_diffusion(self, steps=100):
        import os as _os
        import sys as _sys
        _sys.path.insert(0, _os.path.dirname(__file__))
        import ref_compat
        ref_compat.install()
        import importlib
        gd = importlib.import_module('guided_diffusion.gaussian_diffusion')
        betas = gd.get_named_beta_schedule('linear', steps)
        return gd, gd.GaussianDiffusion(
            betas=betas,
            model_mean_type=gd.ModelMeanType.EPSILON,
            model_var_type=gd.ModelVarType.LEARNED_RANGE,
            loss_type=gd.LossType.RESCALED_MSE)

    def test_vb_terms_match_reference(self):
        import torch
        gd, ref = self._ref_diffusion()
        d = make_diffusion(steps=100, mean_type='eps',
                           var_type='learned_range',
                           loss_type='rescaled_mse')
        rng = np.random.default_rng(0)
        x0 = rng.standard_normal((4, 8, 8, 6)).astype(np.float32) * 0.5
        xt = rng.standard_normal((4, 8, 8, 6)).astype(np.float32)
        out = rng.standard_normal((4, 8, 8, 12)).astype(np.float32)
        t = np.array([0, 3, 50, 99])

        got, _ = d._vb_terms_bpd(jnp.asarray(out), jnp.asarray(x0),
                                 jnp.asarray(xt), jnp.asarray(t))

        # reference layout is NCHW with the var half in channel dim
        def nchw(a):
            return torch.from_numpy(np.moveaxis(a, -1, 1).copy())

        ref_out = ref._vb_terms_bpd(
            model=lambda *a, **k: nchw(out), x_start=nchw(x0), x_t=nchw(xt),
            t=torch.from_numpy(t), clip_denoised=False)['output']
        np.testing.assert_allclose(np.asarray(got), ref_out.numpy(),
                                   rtol=2e-4, atol=2e-5)

    def test_hybrid_training_losses_match_reference(self):
        import torch
        gd, ref = self._ref_diffusion()
        d = make_diffusion(steps=100, mean_type='eps',
                           var_type='learned_range',
                           loss_type='rescaled_mse')
        rng = np.random.default_rng(1)
        x0 = rng.standard_normal((4, 8, 8, 6)).astype(np.float32) * 0.5
        noise = rng.standard_normal((4, 8, 8, 6)).astype(np.float32)
        t = np.array([0, 7, 42, 99])
        modout = rng.standard_normal((4, 8, 8, 12)).astype(np.float32)

        got = d.training_losses(
            lambda xt, tt: jnp.asarray(modout), jnp.asarray(x0),
            jnp.asarray(t), jax.random.PRNGKey(0))
        # recompute with the SAME noise the jax path drew
        xt = d.q_sample(jnp.asarray(x0), jnp.asarray(t),
                        jax.random.normal(jax.random.PRNGKey(0), x0.shape))
        n_used = np.asarray(
            jax.random.normal(jax.random.PRNGKey(0), x0.shape))

        def nchw(a):
            return torch.from_numpy(np.moveaxis(np.asarray(a), -1, 1).copy())

        # NOTE: the reference's own RESCALED_MSE+LEARNED_RANGE branch is
        # un-runnable as written (its frozen_out lambda at
        # gaussian_diffusion.py:1114 rejects the ``c=`` kwarg
        # p_mean_variance passes) — assemble the same expectation from
        # its _vb_terms_bpd + the MSE definition instead.
        vb_ref = ref._vb_terms_bpd(
            model=lambda *a, **k: nchw(modout), x_start=nchw(x0),
            x_t=nchw(np.asarray(xt)), t=torch.from_numpy(t),
            clip_denoised=False)['output'] * (100 / 1000.0)
        mean_half = modout[..., :6]
        mse_ref = np.mean((n_used - mean_half)**2, axis=(1, 2, 3))
        np.testing.assert_allclose(np.asarray(got['loss']),
                                   (vb_ref.numpy() + mse_ref),
                                   rtol=2e-4, atol=2e-5)
        assert 'vb' in got   # hybrid: vb head trains

    def test_vb_freezes_mean_head(self):
        """The VLB term must not move the mean prediction (frozen_out)."""
        d = make_diffusion(steps=50, mean_type='eps',
                           var_type='learned_range', loss_type='rescaled_mse')
        x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 2))
        t = jnp.array([3, 40])

        def vb_of(out_flat):
            out = out_flat.reshape(2, 4, 4, 4)
            terms = d.training_losses(lambda xt, tt: out, x0, t,
                                      jax.random.PRNGKey(1))
            return terms['vb'].sum()

        out0 = jax.random.normal(jax.random.PRNGKey(2), (2 * 4 * 4 * 4,))
        g = jax.grad(vb_of)(out0).reshape(2, 4, 4, 4)
        mean_g, var_g = np.split(np.asarray(g), 2, axis=-1)
        assert np.abs(mean_g).max() == 0.0, 'vb leaked into the mean head'
        assert np.abs(var_g).max() > 0.0, 'vb does not train the var head'

    def test_bpd_loop_perfect_model(self):
        """An oracle eps model drives per-step KL ≈ 0 (decoder NLL and
        prior bpd remain); total_bpd must beat a garbage model."""
        # steps=50 keeps the scaled linear schedule's β_end < 1 (at ≤20
        # steps β_end hits 1.0, ᾱ_T = 0 and eps→x0 is singular — the
        # reference shares this property; real configs use T ≥ 1000).
        d = make_diffusion(steps=50, mean_type='eps')
        x0 = jnp.clip(jax.random.normal(jax.random.PRNGKey(0),
                                        (2, 4, 4, 2)) * 0.3, -1, 1)

        class Oracle:
            def __init__(self, diff, x_start):
                self.d, self.x0 = diff, x_start

            def __call__(self, xt, t_scaled):
                t = t_scaled.astype(jnp.int32)
                return self.d.predict_eps_from_xstart(xt, t, self.x0)

        good = d.calc_bpd_loop(Oracle(d, x0), x0, jax.random.PRNGKey(1))
        bad = d.calc_bpd_loop(lambda xt, t: jnp.zeros_like(xt) + 3.0,
                              x0, jax.random.PRNGKey(1))
        assert np.all(np.asarray(good['total_bpd'])
                      < np.asarray(bad['total_bpd']))
        # oracle KL terms vanish for t>0 (columns are t = T-1..0, so the
        # decoder-NLL t=0 column is LAST — reference ordering)
        assert float(np.asarray(good['vb'])[:, :-1].max()) < 1e-3


class TestPLMS:
    """PLMS multistep sampler vs DDIM on an analytically-known diffusion
    (same construction as tests/test_dpm_solver.py)."""

    MU, S = 0.7, 0.3

    def _analytic_eps(self, full_steps=1000):
        import numpy as _np
        betas = _np.linspace(0.0001, 0.02, full_steps)  # 'linear' default
        acp = jnp.asarray(_np.cumprod(1.0 - betas), jnp.float32)
        mu, s = self.MU, self.S

        def model_fn(x, t_scaled):
            t = t_scaled.astype(jnp.int32)
            a2 = jnp.take(acp, t).reshape((-1,) + (1,) * (x.ndim - 1))
            a = jnp.sqrt(a2)
            s2 = 1.0 - a2
            return jnp.sqrt(s2) * (x - a * mu) / (a2 * s**2 + s2)

        return model_fn

    def test_plms_beats_ddim_at_equal_steps(self):
        from ln3diff_tpu.diffusion.gaussian import make_diffusion
        model_fn = self._analytic_eps()
        shape = (256, 4)
        noise = jax.random.normal(jax.random.PRNGKey(0), shape)

        full = make_diffusion(steps=1000, mean_type='eps')
        x_ref = np.asarray(jax.jit(lambda n: full.ddim_sample_loop(
            model_fn, shape, jax.random.PRNGKey(1), eta=0.0,
            x_init=n))(noise))

        d50 = make_diffusion(steps=1000, mean_type='eps',
                             timestep_respacing='50')
        x_ddim = np.asarray(jax.jit(lambda n: d50.ddim_sample_loop(
            model_fn, shape, jax.random.PRNGKey(1), eta=0.0,
            x_init=n))(noise))
        x_plms = np.asarray(jax.jit(lambda n: d50.plms_sample_loop(
            model_fn, shape, jax.random.PRNGKey(1), x_init=n))(noise))

        assert np.isfinite(x_plms).all()
        err_ddim = np.abs(x_ddim - x_ref).max()
        err_plms = np.abs(x_plms - x_ref).max()
        # 4th-order multistep beats 1st-order DDIM at the same NFE budget
        assert err_plms < err_ddim, (err_plms, err_ddim)
        assert err_plms < 0.02, err_plms
        # statistics recover (mu, s)
        assert abs(x_plms.mean() - self.MU) < 0.05
        assert abs(x_plms.std() - self.S) < 0.07
