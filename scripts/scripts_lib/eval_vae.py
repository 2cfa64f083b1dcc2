"""VAE evaluation: novel-view loop + latent extraction for stage 2.

Mirrors reference ``eval_novelview_loop`` (``nsr/train_nv_util.py:1177``)
and the latent-dump bridge (SURVEY §3.5): per instance, encode → latent →
render eval-orbit views → PNG dump; with ``save_latent`` the normalized
latent (B, h, w, 12) is written as ``.npy`` for diffusion training.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp


def eval_novelview_loop(trainer, data, cfg, save_latent: bool = False,
                        num_instances: int = 1, num_views: int = 8,
                        use_ema: bool = False):
    from ln3diff_tpu.render.camera import orbit_cameras
    from ln3diff_tpu.pipeline import save_video_frames
    from ln3diff_tpu.utils import logger

    model = trainer.model
    state = trainer._state
    # EMA at rate 0.9999 is ~init for short runs — default to live params.
    params = state.ema_params.get('ema', state.params) if use_ema \
        else state.params
    variables = {'params': params, **(state.constants or {})}
    outdir = os.path.join(cfg.logdir, 'eval')
    os.makedirs(outdir, exist_ok=True)

    cam_kw = __import__('ln3diff_tpu.config', fromlist=['CAMERA_PRESETS']) \
        .CAMERA_PRESETS.get(cfg.dataset, {})
    cams = orbit_cameras(num_views, radius=cam_kw.get('radius', 1.8),
                         fov=cam_kw.get('fov', 30.0))

    @jax.jit
    def encode_decode(variables, imgs):
        moments = model.apply(variables, imgs, method=model.encode)
        latent, _ = model.apply(variables, moments, None, False,
                                method=model.reparameterize)
        planes = model.apply(variables, latent, method=model.decode_latent)
        return latent, planes

    @jax.jit
    def render_view(variables, planes, cam):
        return model.apply(variables, planes, cam, cfg.render_opts(),
                           trainer.cfg.render_resolution, None,
                           method=model.render)['image_raw']

    for i in range(num_instances):
        batch = next(data)
        imgs = jnp.asarray(batch['img_to_encoder'])
        latent, planes = encode_decode(variables, imgs)
        if save_latent:
            # cast: bf16 arrays round-trip through np.save as void dtype
            np.save(os.path.join(outdir, f'latent_{i:04d}.npy'),
                    np.asarray(latent, dtype=np.float32))
        frames = []
        for v in range(num_views):
            cam = jnp.broadcast_to(jnp.asarray(cams[v])[None],
                                   (planes.shape[0], 25))
            frames.append(np.asarray(render_view(variables, planes, cam))[0])
        paths = save_video_frames(np.stack(frames),
                                  os.path.join(outdir, f'nv_{i:04d}'))
        logger.log(f'instance {i}: wrote {len(paths)} novel views'
                   + (' + latent' if save_latent else ''))
