"""EG3D warm-up trainer (reference ``TrainLoop3DRecEG3D``,
``nsr/train_util_with_eg3d.py:33-382``): frozen random teacher, few
steps — total loss decreases and the student's planes move TOWARD the
teacher's (the ``loss_feature_volume`` distillation signal)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ln3diff_tpu.models.dit import DiT2Config
from ln3diff_tpu.models.eg3d import TriPlaneGeneratorConfig
from ln3diff_tpu.models.vae import TriplaneVAEConfig
from ln3diff_tpu.render.renderer import RenderOptions
from ln3diff_tpu.training.eg3d_warmup import (EG3DWarmupTrainer,
                                              WarmupConfig, smooth_l1)

pytestmark = pytest.mark.slow


def tiny_trainer(**warm_kw):
    vae_cfg = TriplaneVAEConfig(
        encoder_in_channels=3, encoder_ch=8, encoder_ch_mult=(1, 2),
        encoder_res_blocks=1, img_resolution=32, num_views=1,
        ldm_z_channels=4, latent_size=16,
        dit2=DiT2Config(tokens_per_plane=64, hidden_size=32, depth=2,
                        num_heads=2, dtype=jnp.float32),
        patch_size=2, conv_sr_ch=8, conv_sr_ch_mult=(1, 2),
        conv_sr_res_blocks=1, plane_channels=8, decoder_output_dim=8,
        dtype=jnp.float32)
    # teacher planes must match the student's decoded (3, 16, 16, 8)
    gen_cfg = TriPlaneGeneratorConfig(
        z_dim=16, c_dim=25, w_dim=16, plane_resolution=16,
        plane_channels=8, decoder_output_dim=8)
    warm = WarmupConfig(batch_size=2, render_resolution=16,
                        num_shape_points=64, log_interval=10**6,
                        **warm_kw)
    opts = RenderOptions(depth_resolution=4, depth_resolution_importance=4,
                         ray_start=2.25, ray_end=3.3, box_warp=1.0,
                         white_back=False)
    return EG3DWarmupTrainer(vae_cfg, gen_cfg, warm, render_opts=opts,
                             seed=0)


def _torch_flat_from_variables(variables, prefix='G_ema.'):
    """Inverse of ``convert_eg3d_generator``: emit the torch-named flat
    dict a reference EG3D pickle extracts to (layout oracle for the
    converter test)."""
    flat = {}
    p = variables['params']
    syn = p['synthesis']
    flat[f'{prefix}backbone.synthesis.b4.const'] = \
        np.transpose(np.asarray(syn['const']), (2, 0, 1))

    def layer(dst, src, torgb=False):
        flat[f'{dst}.weight'] = np.transpose(np.asarray(src['weight']),
                                             (3, 2, 0, 1))
        flat[f'{dst}.bias'] = np.asarray(src['bias'])
        flat[f'{dst}.affine.weight'] = \
            np.asarray(src['affine']['kernel']).T
        flat[f'{dst}.affine.bias'] = np.asarray(src['affine']['bias'])
        if not torgb:
            flat[f'{dst}.noise_strength'] = \
                np.asarray(src['noise_strength'])
            flat[f'{dst}.noise_const'] = np.asarray(src['noise_const'])

    layer(f'{prefix}backbone.synthesis.b4.conv1', syn['b4_conv1'])
    layer(f'{prefix}backbone.synthesis.b4.torgb', syn['b4_torgb'],
          torgb=True)
    for name, sub in syn.items():
        if isinstance(sub, dict) and 'conv0' in sub:
            for c in ('conv0', 'conv1'):
                layer(f'{prefix}backbone.synthesis.{name}.{c}', sub[c])
            layer(f'{prefix}backbone.synthesis.{name}.torgb',
                  sub['torgb'], torgb=True)
    for k, v in p['mapping'].items():
        flat[f'{prefix}backbone.mapping.{k}.weight'] = \
            np.asarray(v['kernel']).T
        flat[f'{prefix}backbone.mapping.{k}.bias'] = np.asarray(v['bias'])
    for i, k in ((0, 'EqualDense_0'), (2, 'EqualDense_1')):
        flat[f'{prefix}decoder.net.{i}.weight'] = \
            np.asarray(p['decoder'][k]['kernel']).T
        flat[f'{prefix}decoder.net.{i}.bias'] = \
            np.asarray(p['decoder'][k]['bias'])
    return flat


class TestEG3DWarmup:

    def test_smooth_l1_matches_torch_def(self):
        x = jnp.asarray([0.1, -0.4, 2.0, -3.0])
        y = jnp.zeros(4)
        # |d|<1 → 0.5 d²; else |d|-0.5
        expect = np.mean([0.5 * 0.01, 0.5 * 0.16, 1.5, 2.5])
        assert np.allclose(smooth_l1(x, y), expect, atol=1e-6)

    def test_loss_decreases_and_planes_approach_teacher(self):
        tr = tiny_trainer(lr=1e-3)
        step = tr.build()

        def plane_gap(state):
            """‖student planes − teacher planes‖ on a FIXED probe z/cam."""
            cam = jnp.asarray(tr._sample_cameras(2))
            z = jax.random.normal(jax.random.PRNGKey(42),
                                  (2, tr.gen_cfg.z_dim))
            t_out = tr.gen.apply(tr.teacher_variables, z, cam,
                                 tr.opts, tr.cfg.render_resolution,
                                 jnp.zeros((2, tr.gen_cfg.c_dim)),
                                 truncation_psi=tr.cfg.truncation_psi,
                                 return_ws=True)
            enc_in = jax.image.resize(t_out['image_raw'],
                                      (2, tr.enc_res, tr.enc_res, 3),
                                      'bilinear')
            s_out = tr.model.apply(
                {'params': state.params, **state.constants},
                enc_in, cam, tr.opts,
                tr.cfg.render_resolution, jax.random.PRNGKey(0))
            return float(jnp.mean(
                (s_out['planes'] - t_out['planes'])**2))

        state = tr.state
        gap0 = plane_gap(state)
        losses = []
        for i in range(25):
            cam = jnp.asarray(tr._sample_cameras(tr.cfg.batch_size))
            state, metrics = step(state, tr.teacher_variables, cam,
                                  jax.random.fold_in(
                                      jax.random.PRNGKey(0), i))
            losses.append(float(metrics['loss']))
        gap1 = plane_gap(state)

        assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses
        assert gap1 < gap0, (gap0, gap1)
        assert np.isfinite(losses).all()

    def test_load_real_teacher_state_dict(self):
        """--teacher_ckpt flow: a torch-named flat state dict (the
        legacy_pkl_to_npz output layout) converts into the generator's
        exact param structure, and the tracked w_avg lands in 'stats'
        (without it ψ<1 truncates toward zero)."""
        tr = tiny_trainer()
        src = tr.teacher_variables
        flat = _torch_flat_from_variables(src)
        w_dim = tr.gen_cfg.w_dim
        flat['G_ema.backbone.mapping.w_avg'] = \
            np.full((w_dim,), 0.5, np.float32)

        tr2 = tiny_trainer()
        # scramble so equality below proves the load, not the seed
        tr2.teacher_params = jax.tree_util.tree_map(
            lambda w: w * 0 + 1.0, tr2.teacher_params)
        tr2.load_teacher_state_dict(flat)

        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_leaves_with_path(src['params']),
                jax.tree_util.tree_leaves_with_path(
                    tr2.teacher_variables['params'])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, err_msg=str(pa))
        np.testing.assert_allclose(
            np.asarray(tr2.teacher_variables['stats']['mapping']['w_avg']),
            0.5)

        # ψ<1 teacher forward runs against the loaded variables
        cam = jnp.asarray(tr2._sample_cameras(1))
        out = tr2.gen.apply(tr2.teacher_variables,
                            jnp.zeros((1, tr2.gen_cfg.z_dim)), cam,
                            tr2.opts, 8, jnp.zeros((1, tr2.gen_cfg.c_dim)),
                            truncation_psi=0.7)
        assert np.isfinite(np.asarray(out['image_raw'])).all()

    def test_run_loop_with_preemption_guard(self, tmp_path):
        """run_loop honors the preemption guard and checkpoints."""
        from ln3diff_tpu.training.checkpoint import CheckpointManager

        class StopAfter:
            def __init__(self, n):
                self.n = n
                self.calls = 0

            def should_stop(self):
                self.calls += 1
                return self.calls >= self.n

        tr = tiny_trainer()
        ckpt = CheckpointManager(str(tmp_path / 'ck'))
        state = tr.run_loop(num_steps=50, ckpt=ckpt, save_interval=2,
                            guard=StopAfter(3))
        assert int(state.step) == 3
        ckpt._mgr.wait_until_finished()
        assert ckpt.latest_step() is not None
