"""Parallelism tests: dp, fsdp, tp meshes on 8 virtual CPU devices."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ln3diff_tpu.models.dit import DiT_TriLatent, DiTConfig
from ln3diff_tpu.parallel.mesh import (MeshConfig, make_mesh,
                                       param_sharding_rules,
                                       tensor_parallel_rules)
from ln3diff_tpu.training.train_state import (build_train_step,
                                              create_train_state,
                                              make_optimizer)

pytestmark = pytest.mark.slow


def tiny_dit():
    cfg = DiTConfig(input_size=8, patch_size=2, in_channels=4,
                    hidden_size=64, depth=2, num_heads=2, variant='text',
                    context_dim=32, dtype=jnp.float32)
    model = DiT_TriLatent(cfg)
    x = jnp.ones((8, 8, 8, 12))
    ctx = jnp.ones((8, 7, 32))
    variables = model.init(jax.random.PRNGKey(0), x, jnp.ones((8,)),
                           {'crossattn': ctx})
    return model, variables, x, ctx


def make_loss(model):
    def loss_fn(params, consts, batch, rng):
        out = model.apply({'params': params, **(consts or {})},
                          batch['x'], jnp.ones((batch['x'].shape[0],)),
                          {'crossattn': batch['ctx']})
        loss = jnp.mean((out - batch['x'])**2)
        return loss, {'mse': loss}
    return loss_fn


@pytest.mark.parametrize('mesh_cfg', [
    MeshConfig(data=8), MeshConfig(data=4, fsdp=2),
    MeshConfig(data=2, fsdp=2, tensor=2),
])
def test_train_step_all_mesh_shapes(mesh_cfg):
    mesh = make_mesh(mesh_cfg)
    model, variables, x, ctx = tiny_dit()
    params = variables['params']
    consts = {k: v for k, v in variables.items() if k != 'params'}

    with mesh:
        if mesh_cfg.tensor > 1:
            shardings = tensor_parallel_rules(params, mesh,
                                              min_size_to_shard=256)
        else:
            shardings = param_sharding_rules(params, mesh,
                                             min_size_to_shard=1024)
        params = jax.tree_util.tree_map(jax.device_put, params, shardings)
        state = create_train_state(params, make_optimizer(1e-3),
                                   ema_rates=(), constants=consts)
        step = build_train_step(make_loss(model), mesh, ema_rates=())
        batch = {
            'x': jax.device_put(x, NamedSharding(mesh, P(('data', 'fsdp')))),
            'ctx': jax.device_put(ctx, NamedSharding(mesh,
                                                     P(('data', 'fsdp')))),
        }
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics['loss']))


def test_tp_rules_shard_attention_kernels():
    mesh = make_mesh(MeshConfig(data=2, fsdp=1, tensor=4))
    _, variables, _, _ = tiny_dit()
    shardings = tensor_parallel_rules(variables['params'], mesh,
                                      min_size_to_shard=256)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    tp_sharded = [('/'.join(str(getattr(k, 'key', '')) for k in path), s)
                  for path, s in flat
                  if 'tensor' in str(s.spec)]
    assert len(tp_sharded) > 0, 'no kernels got tensor-sharded'
    assert any('qkv' in name for name, _ in tp_sharded)


def test_grad_accum_microbatch():
    mesh = make_mesh(MeshConfig(data=8))
    model, variables, x, ctx = tiny_dit()
    consts = {k: v for k, v in variables.items() if k != 'params'}
    with mesh:
        state = create_train_state(variables['params'],
                                   make_optimizer(1e-3), ema_rates=(),
                                   constants=consts)
        step = build_train_step(make_loss(model), mesh, ema_rates=(),
                                microbatch_steps=2)
        batch = {'x': jnp.stack([x, x]), 'ctx': jnp.stack([ctx, ctx])}
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics['loss']))


@pytest.mark.parametrize('microbatch', [1, 2])
def test_train_step_accepts_scalar_batch_leaf(microbatch):
    """``batch['step']`` (the live KL-anneal scalar fed by
    ``VAETrainer.run_loop``) is rank-0: a single static batch
    in_sharding of P(('data','fsdp')) rejects it on a real mesh
    ("only valid for values of rank at least 1").  build_train_step
    must place rank-0 leaves replicated and still shard the tensors."""
    mesh = make_mesh(MeshConfig(data=4, fsdp=2))
    model, variables, x, ctx = tiny_dit()
    consts = {k: v for k, v in variables.items() if k != 'params'}

    def loss_fn(params, consts_, batch, rng):
        out = model.apply({'params': params, **(consts_ or {})},
                          batch['x'], jnp.ones((batch['x'].shape[0],)),
                          {'crossattn': batch['ctx']})
        loss = jnp.mean((out - batch['x'])**2) * (batch['step'] * 0 + 1)
        return loss, {'mse': loss, 'step': batch['step']}

    with mesh:
        state = create_train_state(variables['params'],
                                   make_optimizer(1e-3), ema_rates=(),
                                   constants=consts)
        step = build_train_step(loss_fn, mesh, ema_rates=(),
                                microbatch_steps=microbatch)
        if microbatch > 1:
            batch = {'x': jnp.stack([x, x]), 'ctx': jnp.stack([ctx, ctx]),
                     'step': jnp.asarray(7.0)}
        else:
            batch = {'x': x, 'ctx': ctx, 'step': jnp.asarray(7.0)}
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics['loss']))
        assert float(metrics['step']) == 7.0


def test_render_rays_sharded_over_rays_matches_single_device():
    """VERDICT #8: shard ``render_rays`` over the ray axis on the full
    8-device mesh — the corner-packed gather + multi-operand sorts under
    GSPMD must compile, execute, and match the single-device render."""
    from ln3diff_tpu.render.ray_sampler import (sample_full_rays,
                                                unpack_25d_camera)
    from ln3diff_tpu.render.renderer import RenderOptions, render_rays
    from ln3diff_tpu.render.camera import orbit_cameras

    opts = RenderOptions(depth_resolution=8, depth_resolution_importance=8,
                         ray_start='auto', ray_end='auto', box_warp=1.0,
                         filter_out_of_bbox=True, deterministic=True)
    planes = jax.random.normal(jax.random.PRNGKey(0),
                               (1, 3, 32, 32, 8)) * 0.3
    cams = jnp.asarray(orbit_cameras(1, 1.8, 30.0, 20.0))
    c2w, intr = unpack_25d_camera(cams)
    ray_o, ray_d = sample_full_rays(c2w, intr, 16)   # (1, 256, 3)

    w1 = jax.random.normal(jax.random.PRNGKey(1), (8, 16)) * 0.3
    b1 = jnp.zeros((16,))
    w2 = jax.random.normal(jax.random.PRNGKey(2), (16, 4)) * 0.3
    b2 = jnp.zeros((4,))

    def decoder(feats, dirs):
        h = jax.nn.softplus(feats.mean(axis=1) @ w1 + b1)
        out = h @ w2 + b2
        return out[..., 1:], out[..., :1]

    def run(planes, ray_o, ray_d):
        out = render_rays(None, planes, decoder, ray_o, ray_d, opts)
        return out.feature_samples, out.depth_samples

    # single device reference
    ref_rgb, ref_depth = jax.jit(run)(planes, ray_o, ray_d)

    # rays sharded across all 8 devices (data axis)
    mesh = make_mesh(MeshConfig(data=8))
    with mesh:
        ray_sharding = NamedSharding(mesh, P(None, 'data', None))
        rep = NamedSharding(mesh, P())
        sharded = jax.jit(
            run,
            in_shardings=(rep, ray_sharding, ray_sharding),
            out_shardings=(ray_sharding, ray_sharding))
        got_rgb, got_depth = sharded(planes, ray_o, ray_d)

    np.testing.assert_allclose(np.asarray(got_rgb), np.asarray(ref_rgb),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_depth),
                               np.asarray(ref_depth), rtol=1e-5, atol=1e-5)
    assert np.isfinite(np.asarray(got_rgb)).all()


class TestServingShard:
    """Multi-chip serving parallelism (`parallel/serving.py`): orbit
    frames and mesh-grid point chunks sharded over the data axis must
    match the single-device path exactly."""

    def _render_setup(self):
        from ln3diff_tpu.render.renderer import RenderOptions
        opts = RenderOptions(depth_resolution=8,
                             depth_resolution_importance=8,
                             ray_start='auto', ray_end='auto',
                             box_warp=1.0, filter_out_of_bbox=True,
                             deterministic=True)
        planes = jax.random.normal(jax.random.PRNGKey(0),
                                   (1, 3, 32, 32, 8)) * 0.3
        w1 = jax.random.normal(jax.random.PRNGKey(1), (8, 16)) * 0.3
        w2 = jax.random.normal(jax.random.PRNGKey(2), (16, 4)) * 0.3
        params = {'w1': w1, 'w2': w2}

        def decoder_with(params):
            def decoder(feats, dirs):
                h = jax.nn.softplus(feats.mean(axis=1) @ params['w1'])
                out = h @ params['w2']
                return out[..., 1:], out[..., :1]
            return decoder

        return opts, planes, params, decoder_with

    def test_orbit_frames_sharded_match_single_device(self):
        from ln3diff_tpu.parallel.serving import shard_orbit_render
        from ln3diff_tpu.render.camera import orbit_cameras
        from ln3diff_tpu.render.ray_sampler import (sample_full_rays,
                                                    unpack_25d_camera)
        from ln3diff_tpu.render.renderer import render_rays

        opts, planes, params, decoder_with = self._render_setup()
        res = 16

        def render_fn(params, planes_f, cams):
            c2w, intr = unpack_25d_camera(cams)
            ray_o, ray_d = sample_full_rays(c2w, intr, res)
            out = render_rays(None, planes_f, decoder_with(params),
                              ray_o, ray_d, opts)
            F = cams.shape[0]
            return out.feature_samples.reshape(F, res, res, -1)

        cams = jnp.asarray(orbit_cameras(8, 1.8, 30.0, 20.0))
        planes_f = jnp.broadcast_to(planes, (8,) + planes.shape[1:])
        ref = jax.jit(render_fn)(params, planes_f, cams)

        mesh = make_mesh(MeshConfig(data=8))
        fn = shard_orbit_render(render_fn, mesh)
        got = fn(params, planes, cams)

        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        with pytest.raises(AssertionError, match='divisible'):
            fn(params, planes, cams[:6])

    def test_points_sharded_match_single_device(self):
        from ln3diff_tpu.parallel.serving import shard_points_query
        from ln3diff_tpu.render.renderer import (RenderOptions,
                                                 sample_from_planes)

        opts, planes, params, decoder_with = self._render_setup()

        def point_fn(params, planes, coords):
            feats = sample_from_planes(planes, coords,
                                       box_warp=opts.box_warp)
            rgb, sigma = decoder_with(params)(feats, None)
            return rgb, sigma

        # N deliberately NOT divisible by 8 and > chunk to exercise
        # both the host pad and the per-device chunk-tail pad
        N = 8 * 37 + 3
        coords = jax.random.uniform(jax.random.PRNGKey(5), (1, N, 3),
                                    minval=-0.45, maxval=0.45)
        ref_rgb, ref_sigma = jax.jit(point_fn)(params, planes, coords)

        mesh = make_mesh(MeshConfig(data=8))
        fn = shard_points_query(point_fn, mesh, chunk=16)
        got_rgb, got_sigma = fn(params, planes, coords)

        np.testing.assert_allclose(np.asarray(got_rgb),
                                   np.asarray(ref_rgb),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_sigma),
                                   np.asarray(ref_sigma),
                                   rtol=1e-5, atol=1e-5)

    def test_tp_sharded_sampling_matches_single_device(self):
        """TP-sharded denoiser sampling (`tp_shard_denoiser_params`):
        the CFG DDIM scan under a tensor=8 mesh must match the
        replicated run (GSPMD all-reduce ordering → tiny f32 noise)."""
        from ln3diff_tpu.diffusion.gaussian import make_diffusion
        from ln3diff_tpu.models.dit import DiT_TriLatent, DiTConfig
        from ln3diff_tpu.parallel.serving import tp_shard_denoiser_params
        from ln3diff_tpu.pipeline import SamplerSpec, TextTo3DPipeline

        den_cfg = DiTConfig(input_size=8, patch_size=2, in_channels=4,
                            hidden_size=64, depth=2, num_heads=4,
                            variant='text', context_dim=16,
                            dtype=jnp.float32)
        denoiser = DiT_TriLatent(den_cfg)
        x0 = jnp.zeros((2, 8, 8, 12))
        ctx = {'crossattn': jnp.zeros((2, 7, 16))}
        den_vars = denoiser.init(jax.random.PRNGKey(0), x0,
                                 jnp.zeros((2,)), ctx)
        # perturb the zero-init projections so outputs are live
        leaves, treedef = jax.tree_util.tree_flatten(den_vars['params'])
        keys = jax.random.split(jax.random.PRNGKey(3), len(leaves))
        leaves = [w + 0.05 * jax.random.normal(k, w.shape, w.dtype)
                  for w, k in zip(leaves, keys)]
        den_vars = dict(den_vars, params=jax.tree_util.tree_unflatten(
            treedef, leaves))

        pipeline = TextTo3DPipeline(
            lambda p, x, t, c: denoiser.apply(p, x, t, c), den_vars,
            None, None, None, None,
            sampler=SamplerSpec(kind='ddim', num_steps=4, cfg_scale=2.0,
                                latent_shape=(8, 8, 12)),
            diffusion=make_diffusion(steps=100, timestep_respacing='4'))
        cond = {'crossattn': jnp.ones((1, 7, 16))}
        uncond = {'crossattn': jnp.zeros((1, 7, 16))}
        ref = pipeline.sample_latents(jax.random.PRNGKey(1), 2, cond,
                                      uncond)

        mesh = make_mesh(MeshConfig(data=1, fsdp=1, tensor=8))
        sharded = tp_shard_denoiser_params(den_vars, mesh,
                                           min_size_to_shard=0)
        qkv = sharded['params']['blocks']['block']['attn']['qkv']['kernel']
        assert 'tensor' in str(qkv.sharding.spec), qkv.sharding
        pipeline.denoiser_params = sharded
        got = pipeline.sample_latents(jax.random.PRNGKey(1), 2, cond,
                                      uncond)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
