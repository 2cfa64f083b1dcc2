"""From-scratch two-stage demo: load the stage-1 VAE and stage-2 DiT
checkpoints trained in THIS repo (no external weights), sample latents
from noise, decode, render an orbit and export a mesh.

This closes the full LN3Diff loop end-to-end on TPU with entirely
self-trained weights:
  stage-1: scripts/vit_triplane_train.py (synthetic overfit)
  stage-2: scripts/vit_triplane_diffusion_train.py on the dumped latents
  here:    noise → FM/DDIM sampling → planes → novel views + mesh.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--vae_logdir', required=True)
    parser.add_argument('--ldm_logdir', required=True)
    parser.add_argument('--outdir', default='/tmp/two_stage_demo')
    parser.add_argument('--encoder_resolution', type=int, default=128)
    parser.add_argument('--num_steps', type=int, default=100)
    parser.add_argument('--num_frames', type=int, default=8)
    parser.add_argument('--render_resolution', type=int, default=64)
    parser.add_argument('--mesh_grid', type=int, default=96)
    parser.add_argument('--cfg_scale', type=float, default=1.0)
    parser.add_argument('--denoiser_scale', default='DiT-B/2')
    parser.add_argument('--seed', type=int, default=0)
    args = parser.parse_args()

    from ln3diff_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from ln3diff_tpu.config import RENDER_PRESETS, vae_preset
    from ln3diff_tpu.data.synthetic import load_memory_data
    from ln3diff_tpu.models.dit import DiT_TriLatent, dit_registry
    from ln3diff_tpu.pipeline import (SamplerSpec, TextTo3DPipeline,
                                      save_video_frames)
    from ln3diff_tpu.render.renderer import RenderOptions
    from ln3diff_tpu.training.checkpoint import CheckpointManager
    from ln3diff_tpu.training.ldm_trainer import LDMTrainConfig, LDMTrainer
    from ln3diff_tpu.training.losses import LossConfig
    from ln3diff_tpu.training.vae_trainer import VAETrainConfig, VAETrainer

    os.makedirs(args.outdir, exist_ok=True)
    latent_size = args.encoder_resolution // 8

    # ---- stage-1 VAE state (restore through the trainer for structure) --
    base_cfg = vae_preset('objaverse-s')
    model_cfg = dataclasses.replace(
        base_cfg, num_views=4, img_resolution=args.encoder_resolution,
        latent_size=latent_size,
        dit2=dataclasses.replace(
            base_cfg.dit2,
            tokens_per_plane=(latent_size // base_cfg.patch_size)**2))
    render_opts = RENDER_PRESETS['objverse_tuneray_aug_resolution_64_64_auto']
    vae_trainer = VAETrainer(model_cfg,
                             VAETrainConfig(render_resolution=64),
                             LossConfig(), render_opts=render_opts)
    data = load_memory_data(1, 4, args.encoder_resolution, 64)
    vae_trainer.init_state(next(data))
    restored = CheckpointManager(
        os.path.join(args.vae_logdir, 'checkpoints')).restore(
            vae_trainer._state)
    assert restored is not None, 'no VAE checkpoint'
    vae_vars = {'params': restored.params, **(restored.constants or {})}
    vae = vae_trainer.model
    print(f'restored VAE @ step {int(restored.step)}', flush=True)

    # ---- stage-2 denoiser state -----------------------------------------
    den_cfg = dit_registry(args.denoiser_scale, input_size=latent_size,
                           in_channels=4)
    denoiser = DiT_TriLatent(den_cfg)
    ldm_trainer = LDMTrainer(denoiser,
                             LDMTrainConfig(triplane_scaling_divider=1.0))
    example = {'latent': np.zeros((1, latent_size, latent_size, 12),
                                  np.float32),
               'context': {'crossattn': np.zeros((1, 77, 768), np.float32)}}
    ldm_trainer.init_state(example)
    restored_ldm = CheckpointManager(
        os.path.join(args.ldm_logdir, 'checkpoints')).restore(
            ldm_trainer._state)
    assert restored_ldm is not None, 'no LDM checkpoint'
    den_vars = {'params': restored_ldm.params,
                **(restored_ldm.constants or {})}
    print(f'restored DiT @ step {int(restored_ldm.step)}', flush=True)

    # ---- pipeline ---------------------------------------------------------
    pipeline = TextTo3DPipeline(
        lambda p, x, t, c: denoiser.apply(p, x, t, c), den_vars,
        lambda p, l: vae.apply(p, l, method=vae.decode_latent), vae_vars,
        lambda p, planes, cam: vae.apply(
            p, planes, cam, render_opts, args.render_resolution, None,
            method=vae.render)['image_raw'],
        lambda p, planes, coords: vae.apply(
            p, planes, coords, render_opts.box_warp,
            method=vae.query_points),
        sampler=SamplerSpec(kind='flow_matching', num_steps=args.num_steps,
                            cfg_scale=args.cfg_scale,
                            triplane_scaling_divider=1.0,
                            latent_shape=(latent_size, latent_size, 12)))

    ctx = {'crossattn': jnp.zeros((1, 77, 768))}
    out = pipeline(jax.random.PRNGKey(args.seed), ctx, ctx, batch=1,
                   num_frames=args.num_frames,
                   mesh_path=os.path.join(args.outdir, 'sample.obj'),
                   mesh_grid=args.mesh_grid,
                   render_resolution=args.render_resolution)
    frames = save_video_frames(np.asarray(out['video'][0]),
                               os.path.join(args.outdir, 'sample'))
    lat = np.asarray(out['latents'])
    print(f'sampled latent stats: mean {lat.mean():.3f} std {lat.std():.3f}',
          flush=True)
    print(f'wrote {len(frames)} frames + mesh to {args.outdir}', flush=True)


if __name__ == '__main__':
    main()
