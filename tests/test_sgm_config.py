"""sgm yaml-config assembly: target registry, schedule math, loss/sampler
specs, and (when the reference tree is present) loading the real release
yaml files unchanged."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ln3diff_tpu.sgm_config import (ConditionerSpec, DiscretizationSpec,
                                    EulerEDMSamplerSpec,
                                    LambdaLinearScheduler, LossSpec,
                                    SGMStack, instantiate_from_config,
                                    load_ldm_configs)

REF_CONFIG_DIR = '/root/reference/sgm/configs'

T23D_YAML = """
ldm_configs:
  scheduler_config:
    target: sgm.lr_scheduler.LambdaLinearScheduler
    params:
      warm_up_steps: [10000]
      cycle_lengths: [10000000000000]
      f_start: [1.e-6]
      f_max: [1.]
      f_min: [1.]
  denoiser_config:
    target: sgm.modules.diffusionmodules.denoiser.DiscreteDenoiser
    params:
      num_idx: 1000
      scaling_config:
        target: sgm.modules.diffusionmodules.denoiser_scaling.EpsScaling
      discretization_config:
        target: sgm.modules.diffusionmodules.discretizer.LegacyDDPMDiscretization
  conditioner_config:
    target: sgm.modules.GeneralConditioner
    params:
      emb_models:
        - is_trainable: False
          input_key: caption
          ucg_rate: 0.1
          target: sgm.modules.encoders.modules.FrozenCLIPEmbedder
          params:
            always_return_pooled: True
  loss_fn_config:
    target: sgm.modules.diffusionmodules.loss.StandardDiffusionLoss
    params:
      loss_weighting_config:
        target: sgm.modules.diffusionmodules.loss_weighting.EpsWeighting
      sigma_sampler_config:
        target: sgm.modules.diffusionmodules.sigma_sampling.DiscreteSampling
        params:
          num_idx: 1000
  sampler_config:
    target: sgm.modules.diffusionmodules.sampling.EulerEDMSampler
    params:
      num_steps: 250
      guider_config:
        target: sgm.modules.diffusionmodules.guiders.VanillaCFG
        params:
          scale: 6.5
"""

FM_YAML = """
ldm_configs:
  conditioner_config:
    target: sgm.modules.GeneralConditioner
    params:
      emb_models:
        - is_trainable: False
          input_key: 'img-c'
          ucg_rate: 0.1
          target: sgm.modules.encoders.modules.FrozenDinov2ImageEmbedderMVPlucker
          params:
            arch: vits
            n_cond_frames: 2
  loss_fn_config:
    target: sgm.modules.diffusionmodules.loss.FMLoss
    params:
      transport_config:
        target: transport.create_transport
        params:
          snr_type: lognorm
  guider_config:
    target: sgm.modules.diffusionmodules.guiders.VanillaCFG
    params:
      scale: 5.0
"""


class TestScheduler:

    def test_lambda_linear_reference_math(self):
        # reference sgm/lr_scheduler.py:113-135
        s = LambdaLinearScheduler(warm_up_steps=[100], f_min=[0.5],
                                  f_max=[1.0], f_start=[1e-6],
                                  cycle_lengths=[1000])
        assert s(0) == pytest.approx(1e-6)
        # warmup: f_start + (f_max-f_start)/warm_up * n
        assert s(50) == pytest.approx(1e-6 + (1.0 - 1e-6) / 100 * 50)
        # post-warmup: f_min + (f_max-f_min)*(cycle_len - n)/cycle_len
        assert s(600) == pytest.approx(0.5 + 0.5 * (1000 - 600) / 1000)

    def test_multi_cycle(self):
        s = LambdaLinearScheduler(warm_up_steps=[10, 20],
                                  f_min=[0.1, 0.2], f_max=[1.0, 0.5],
                                  f_start=[0.0, 0.0],
                                  cycle_lengths=[100, 200])
        # step 105 lands in cycle 1 at local step 5 (warmup of cycle 1)
        assert s(105) == pytest.approx(0.5 / 20 * 5)


class TestInstantiate:

    def test_unknown_target_lists_known(self):
        with pytest.raises(ValueError, match='unknown target'):
            instantiate_from_config({'target': 'sgm.made.up.Thing'})

    def test_discretization_matches_edm_table(self):
        from ln3diff_tpu.diffusion.edm import legacy_ddpm_sigmas
        disc = instantiate_from_config({
            'target': ('sgm.modules.diffusionmodules.discretizer.'
                       'LegacyDDPMDiscretization')})
        np.testing.assert_allclose(disc(50), legacy_ddpm_sigmas(50))


class TestLoadT23D:

    def setup_method(self):
        self.stack = load_ldm_configs(T23D_YAML)

    def test_stack_fields(self):
        assert isinstance(self.stack, SGMStack)
        assert self.stack.denoiser.scaling.kind == 'eps'
        assert self.stack.sampler.num_steps == 250
        assert self.stack.sampler.guider.scale == 6.5
        assert self.stack.loss.kind == 'edm'
        assert self.stack.loss.objective == 'edm'
        assert self.stack.scheduler(0) == pytest.approx(1e-6)
        specs = self.stack.conditioner.embedders
        assert len(specs) == 1 and specs[0].maker == 'clip_text'
        assert specs[0].ucg_rate == 0.1

    def test_edm_loss_fn_runs(self):
        loss_fn = self.stack.loss.make_loss_fn(self.stack.denoiser)
        net = lambda x, t, c: x * 0.1
        losses = loss_fn(net, jnp.ones((2, 4, 4, 3)),
                         jax.random.PRNGKey(0), {})
        assert losses.shape == (2,)
        assert np.all(np.isfinite(np.asarray(losses)))

    def test_sampler_spec_runs(self):
        net = lambda x, t, c: x * 0.0
        out = self.stack.sampler.__class__(num_steps=4).sample(
            self.stack.denoiser, net, (1, 4, 4, 3),
            jax.random.PRNGKey(0), {}, {})
        assert out.shape == (1, 4, 4, 3)
        assert np.all(np.isfinite(np.asarray(out)))


class TestLoadFM:

    def test_fm_stack(self):
        stack = load_ldm_configs(FM_YAML)
        assert stack.loss.kind == 'flow_matching'
        assert stack.loss.transport.t_sampling == 'lognorm'
        assert stack.guider.scale == 5.0
        specs = stack.conditioner.embedders
        assert specs[0].maker == 'dino_mv_plucker'
        assert specs[0].options['n_cond_frames'] == 2

    def test_fm_loss_fn_runs(self):
        stack = load_ldm_configs(FM_YAML)
        loss_fn = stack.loss.make_loss_fn()
        net = lambda x, t, c: x * 0.1
        losses = loss_fn(net, jnp.ones((2, 4, 4, 3)),
                         jax.random.PRNGKey(0), {})
        assert np.all(np.isfinite(np.asarray(losses)))


class TestBuildConditioner:

    def test_mv_plucker_embedder_builds_and_encodes(self):
        spec = load_ldm_configs(FM_YAML).conditioner
        cond = spec.build(jax.random.PRNGKey(0))
        B, V, hw = 1, 2, 224
        rng = np.random.default_rng(0)
        images = rng.uniform(-1, 1, (B, V, hw, hw, 3)).astype(np.float32)
        c = np.zeros((B, V, 25), np.float32)
        c2w = np.eye(4, dtype=np.float32)
        c2w[2, 3] = 2.0
        intr = np.array([[1.1, 0, 0.5], [0, 1.1, 0.5], [0, 0, 1]],
                        np.float32)
        for v in range(V):
            c[0, v, :16] = c2w.reshape(-1)
            c[0, v, 16:] = intr.reshape(-1)
        out = cond({'img-c': (images, c)})
        L = (hw // 14)**2 + 1
        assert out['dino'].shape == (B, V * L, 384)
        assert np.all(np.isfinite(np.asarray(out['dino'])))
        # uncond has the same token layout
        _, uc = cond.get_unconditional_conditioning({'img-c': (images, c)})
        assert uc['dino'].shape[1:] == (V * L, 384)


@pytest.mark.skipif(not os.path.isdir(REF_CONFIG_DIR),
                    reason='reference tree not present')
class TestReferenceYamls:
    """The real release yaml files load unchanged."""

    def test_all_release_configs_parse(self):
        for name in sorted(os.listdir(REF_CONFIG_DIR)):
            if not name.endswith('.yaml'):
                continue
            stack = load_ldm_configs(os.path.join(REF_CONFIG_DIR, name))
            assert isinstance(stack, SGMStack), name
            assert stack.conditioner is not None, name

    def test_txt2img_compat_values(self):
        stack = load_ldm_configs(
            os.path.join(REF_CONFIG_DIR, 'txt2img-clipl-compat.yaml'))
        assert stack.sampler.num_steps == 250
        assert stack.sampler.guider.scale == 6.5
        assert stack.denoiser.scaling.kind == 'eps'
        assert stack.loss.kind == 'edm'

    def test_img23d_fm_lognorm_values(self):
        stack = load_ldm_configs(os.path.join(
            REF_CONFIG_DIR, 'img23d-clipl-compat-fm-lognorm.yaml'))
        assert stack.loss.kind == 'flow_matching'
        assert stack.loss.transport.t_sampling == 'lognorm'
        makers = [e.maker for e in stack.conditioner.embedders]
        assert makers == ['clip_image', 'dino']
