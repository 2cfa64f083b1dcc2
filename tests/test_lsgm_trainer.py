"""LSGM joint trainer (VAE + U-Net denoiser trained together).

Covers the ShapeNet/FFHQ stage-2 path (reference
``TrainLoop3DDiffusionLSGMJointnoD``): two optimization steps on a tiny
joint model over the 8-device CPU mesh, loss finite and both param trees
updated.
"""

import pytest
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from ln3diff_tpu.data.synthetic import load_memory_data
from ln3diff_tpu.models.unet import UNetConfig, UNetModel
from ln3diff_tpu.parallel.mesh import MeshConfig, make_mesh
from ln3diff_tpu.render.renderer import RenderOptions
from ln3diff_tpu.training.lsgm_trainer import (LSGMConfig, LSGMTrainConfig,
                                               LSGMTrainer)
from tests.test_models import small_vae_cfg

pytestmark = pytest.mark.slow


def tiny_unet():
    return UNetModel(UNetConfig(
        in_channels=4, model_channels=8, out_channels=4, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_heads=2,
        use_spatial_transformer=False, roll_out=True,
        mixed_prediction=True, dtype=jnp.float32))


class TestLSGMTrainer:

    def test_joint_two_steps(self):
        vae_cfg = small_vae_cfg()
        opts = RenderOptions(depth_resolution=4,
                             depth_resolution_importance=4,
                             ray_start='auto', ray_end='auto', box_warp=0.9,
                             filter_out_of_bbox=True)
        trainer = LSGMTrainer(
            vae_cfg, tiny_unet(),
            LSGMTrainConfig(patch_resolution=8, render_resolution=16,
                            log_interval=1, total_steps=2),
            lsgm_cfg=LSGMConfig(),
            render_opts=opts, seed=0,
            mesh=make_mesh(MeshConfig(data=2),
                           devices=jax.devices()[:2]))

        data = load_memory_data(1, num_views=2, resolution=32,
                                render_resolution=16, seed=0)
        trainer.build(next(data))
        p0 = jax.tree_util.tree_map(
            lambda x: np.asarray(x).copy(), trainer._state.params)
        state = trainer.run_loop(data, num_steps=2)
        assert int(state.step) == 2
        # both trees moved
        moved_vae = any(
            not np.allclose(a, b) for a, b in zip(
                jax.tree_util.tree_leaves(p0['vae']),
                jax.tree_util.tree_leaves(state.params['vae'])))
        moved_ddpm = any(
            not np.allclose(a, b) for a, b in zip(
                jax.tree_util.tree_leaves(p0['ddpm']),
                jax.tree_util.tree_leaves(state.params['ddpm'])))
        assert moved_vae and moved_ddpm
        # mixing logit exists and is finite (LSGM mixed prediction)
        ml = state.params['ddpm']['mixing_logit']
        assert np.isfinite(np.asarray(ml)).all()

    def _term_grads(self, lsgm_cfg, metric):
        """Gradient probe of ONE loss term: build the joint loss under
        ``lsgm_cfg`` and return grads of ``metrics[metric]`` on one tiny
        batch — isolates where that term's gradients flow."""
        from ln3diff_tpu.training.losses import LossConfig
        from ln3diff_tpu.training.lsgm_trainer import make_joint_loss_fn

        vae_cfg = small_vae_cfg()
        opts = RenderOptions(depth_resolution=4,
                             depth_resolution_importance=4,
                             ray_start='auto', ray_end='auto', box_warp=0.9,
                             filter_out_of_bbox=True)
        trainer = LSGMTrainer(
            vae_cfg, tiny_unet(),
            LSGMTrainConfig(patch_resolution=8, render_resolution=16),
            lsgm_cfg=lsgm_cfg, render_opts=opts, seed=0,
            mesh=make_mesh(MeshConfig(data=1), devices=jax.devices()[:1]))
        data = load_memory_data(1, num_views=2, resolution=32,
                                render_resolution=16, seed=0)
        raw = next(data)
        state = trainer.init_state(raw)
        # break the adaLN-zero init saddle (DiT2 final layer / gates are
        # zero at init, making decode_latent momentarily constant in its
        # input — matches the reference; grads flow after step 1).
        leaves, treedef = jax.tree_util.tree_flatten(state.params)
        keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
        params = treedef.unflatten([
            l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
            for l, k in zip(leaves, keys)])
        state = state.replace(params=params)
        batch = trainer.prepare_batch(raw)
        loss_fn = make_joint_loss_fn(
            trainer.vae, trainer.denoiser, trainer.render_opts, LossConfig(),
            lsgm_cfg, 8, 16, trainer.sde)

        def term(params):
            _, metrics = loss_fn(params, state.constants, batch,
                                 jax.random.PRNGKey(7))
            return metrics[metric]

        grads = jax.jit(jax.grad(term))(state.params)
        sums = {k: float(sum(np.abs(np.asarray(x)).sum()
                             for x in jax.tree_util.tree_leaves(v)))
                for k, v in grads.items()}
        assert all(np.isfinite(np.asarray(g)).all()
                   for g in jax.tree_util.tree_leaves(grads))
        return sums

    def test_ce_term_trains_encoder_through_frozen_prior(self):
        """VERDICT #6: the q/CE objective reaches the VAE through the
        prior while the denoiser stays frozen inside that term
        (reference ce_ddpm_step CE block stop-grads the ddpm)."""
        sums = self._term_grads(LSGMConfig(joint_ce=True),
                                'ce_balanced_kl')
        assert sums['vae'] > 0.0, 'CE term does not reach the VAE'
        assert sums['ddpm'] == 0.0, 'CE term must not train the prior'

    def test_p_rendering_loss_flows_to_both(self):
        """p_rendering_step parity: the render-space x0 loss reaches BOTH
        the denoiser and the VAE (latent stays attached)."""
        sums = self._term_grads(
            LSGMConfig(joint_ce=False, p_rendering_loss=True),
            'p_rendering_loss')
        assert sums['ddpm'] > 0.0, \
            'p_rendering loss does not reach the denoiser'
        assert sums['vae'] > 0.0, 'p_rendering loss does not reach the VAE'
