"""Train-step throughput on the real chip (VERDICT r2 item 7).

Measures, with the per-op profile machinery available separately:
  1. VAE patch-ray train step, release-ish objaverse config, patch 32,
     fused-OSG kernel ON vs OFF (the custom-VJP A/B).
  2. DiT-L/2 training step (flow-matching objective, remat='dots' —
     the training-CLI default), batch 8.

The train step DONATES its state (train_state.py:182), so every timing
loop threads the returned state back in; reusing a donated state is a
use-after-free (surfaces as an opaque ``TPU backend error
(InvalidArgument)`` on axon).

Run serialized with any other TPU process (one process per chip).
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

from ln3diff_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def time_steps(step, state, batch, iters, warmup=2):
    """Steady-state s/step of a state-donating train step."""
    loss = None
    for _ in range(warmup):
        state, loss = step(state, batch)
    _ = float(loss)                      # drain: sync through a host read
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = step(state, batch)
    _ = float(loss)
    return (time.perf_counter() - t0) / iters


def vae_step(use_fused: bool, batch_instances=2):
    from ln3diff_tpu.config import RENDER_PRESETS, vae_preset
    from ln3diff_tpu.data.synthetic import load_memory_data
    from ln3diff_tpu.parallel.mesh import MeshConfig, make_mesh
    from ln3diff_tpu.training.losses import LossConfig
    from ln3diff_tpu.training.vae_trainer import (VAETrainConfig,
                                                  VAETrainer)

    opts = RENDER_PRESETS['objverse_tuneray_aug_resolution_64_64_auto']
    mesh = make_mesh(MeshConfig(data=1), devices=jax.devices()[:1])
    trainer = VAETrainer(
        vae_preset('objaverse'),
        VAETrainConfig(lr=1e-4, patch_resolution=32,
                       render_resolution=128, log_interval=10**9,
                       use_fused_osg=use_fused),
        LossConfig(depth_lambda=0.5, lpips_lambda=0.0),
        render_opts=opts, mesh=mesh, seed=0)
    data = load_memory_data(batch_instances, num_views=4, resolution=256,
                            render_resolution=128)
    raw = next(data)
    t0 = time.perf_counter()
    trainer.build(raw)
    print(f'  build: {time.perf_counter() - t0:.1f}s', flush=True)
    batch = trainer.prepare_batch(raw)
    state = trainer._state

    def step(state, batch):
        s, m = trainer._step_fn(state, batch, jax.random.PRNGKey(3))
        return s, m['loss']

    t0 = time.perf_counter()
    state, loss = step(state, batch)
    _ = float(loss)
    print(f'  compile+first step: {time.perf_counter() - t0:.1f}s',
          flush=True)
    return time_steps(step, state, batch, iters=10)


def dit_step(batch=8):
    from ln3diff_tpu.config import denoiser_preset
    from ln3diff_tpu.models.dit import DiT_TriLatent
    from ln3diff_tpu.parallel.mesh import MeshConfig, make_mesh
    from ln3diff_tpu.training.ldm_trainer import LDMTrainConfig, LDMTrainer

    import dataclasses
    mesh = make_mesh(MeshConfig(data=1), devices=jax.devices()[:1])
    # remat='dots' matches the training-CLI default: without it the scan
    # saves f32 attention scores for all 24 blocks (~10 GB) and DiT-L/2
    # B=8 OOMs a 16 GB v5e.
    cfg = dataclasses.replace(denoiser_preset('t23d-dit-l2'),
                              remat=True, remat_policy='dots')
    trainer = LDMTrainer(DiT_TriLatent(cfg),
                         LDMTrainConfig(lr=1e-4, log_interval=10**9,
                                        objective='flow_matching'),
                         mesh=mesh, seed=0)
    rng = np.random.default_rng(0)
    example = {
        'latent': jnp.asarray(rng.normal(size=(batch, 32, 32, 12)),
                              jnp.float32),
        'context': {'crossattn': jnp.asarray(
            rng.normal(size=(batch, 77, 768)), jnp.float32)},
    }
    t0 = time.perf_counter()
    trainer.build(example)
    print(f'  build: {time.perf_counter() - t0:.1f}s', flush=True)
    state = trainer._state

    def step(state, batch):
        s, m = trainer._step_fn(state, batch, jax.random.PRNGKey(3))
        return s, m['loss']

    t0 = time.perf_counter()
    state, loss = step(state, example)
    _ = float(loss)
    print(f'  compile+first step: {time.perf_counter() - t0:.1f}s',
          flush=True)
    return time_steps(step, state, example, iters=20)


if __name__ == '__main__':
    what = sys.argv[1] if len(sys.argv) > 1 else 'all'
    if what in ('all', 'vae', 'vae_stock'):
        print('VAE patch-ray step (objaverse release arch, patch 32, '
              'B=2x4 views), stock jnp point pipeline:', flush=True)
        per = vae_step(False)
        print(f'  {per * 1e3:.1f} ms/step  ({1 / per:.2f} steps/s)',
              flush=True)
    if what in ('all', 'vae', 'vae_fused'):
        print('Same, fused Pallas OSG kernel (fwd + custom-VJP bwd):',
              flush=True)
        per = vae_step(True)
        print(f'  {per * 1e3:.1f} ms/step  ({1 / per:.2f} steps/s)',
              flush=True)
    if what in ('all', 'dit'):
        print('DiT-L/2 FM train step (remat=dots), batch 8:', flush=True)
        per = dit_step(8)
        print(f'  {per * 1e3:.1f} ms/step  ({1 / per:.2f} steps/s)',
              flush=True)
