"""EG3D warm-up training entry: distill a frozen EG3D teacher into the
VAE before reconstruction training (reference ``TrainLoop3DRecEG3D``,
``nsr/train_util_with_eg3d.py:33-382``, launched through
``scripts/vit_triplane_cvD_train_ffhq.py`` with ``--trainer_name eg3d``).

Teacher weights: the reference loads StyleGAN legacy ``.pkl`` files;
here convert one first with ``scripts/legacy_pkl_to_npz.py`` and pass
``--teacher_ckpt teacher.npz`` (a random-init teacher runs the loop for
smoke/ablation when omitted).
"""

from __future__ import annotations

import argparse
import dataclasses
import os


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--outdir', default='/tmp/ln3diff-eg3d-warmup')
    p.add_argument('--vae', default='ffhq',
                   help='VAE preset name (ln3diff_tpu.config.vae_preset)')
    p.add_argument('--teacher_ckpt', default='',
                   help='npz teacher params from legacy_pkl_to_npz.py '
                        '(random-init teacher when empty)')
    p.add_argument('--lr', type=float, default=2e-4)
    p.add_argument('--batch_size', type=int, default=4)
    p.add_argument('--render_resolution', type=int, default=64)
    p.add_argument('--total_steps', type=int, default=10001)
    p.add_argument('--save_interval', type=int, default=2500)
    p.add_argument('--log_interval', type=int, default=10)
    p.add_argument('--truncation_psi', type=float, default=0.7)
    p.add_argument('--lambda_shape', type=float, default=0.005)
    p.add_argument('--lambda_plane', type=float, default=0.1)
    p.add_argument('--lambda_ws', type=float, default=0.1)
    p.add_argument('--seed', type=int, default=0)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from ln3diff_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from ln3diff_tpu.config import RENDER_PRESETS, build_vae, vae_preset
    from ln3diff_tpu.training.checkpoint import (CheckpointManager,
                                                 load_numpy_checkpoint)
    from ln3diff_tpu.training.eg3d_warmup import (EG3DWarmupTrainer,
                                                  WarmupConfig)
    from ln3diff_tpu.utils import logger

    logger.configure(args.outdir)
    os.makedirs(args.outdir, exist_ok=True)

    vae_cfg = vae_preset(args.vae)
    model = build_vae(vae_cfg)
    warm = WarmupConfig(
        lr=args.lr, batch_size=args.batch_size,
        render_resolution=args.render_resolution,
        truncation_psi=args.truncation_psi,
        lambda_shape=args.lambda_shape, lambda_plane=args.lambda_plane,
        lambda_ws=args.lambda_ws, log_interval=args.log_interval,
        total_steps=args.total_steps)
    render_opts = RENDER_PRESETS['ffhq']

    trainer = EG3DWarmupTrainer(vae_cfg, warm_cfg=warm,
                                render_opts=render_opts,
                                seed=args.seed, model=model)
    if args.teacher_ckpt:
        import numpy as np
        data = dict(np.load(args.teacher_ckpt))
        if any(k.startswith('G_ema.') or k.startswith('G.')
               for k in data):
            # torch-named flat dict from legacy_pkl_to_npz.py — run the
            # torch→jax converter (params + tracked w_avg)
            prefix = 'G_ema.' if any(k.startswith('G_ema.')
                                     for k in data) else 'G.'
            trainer.load_teacher_state_dict(data, prefix=prefix)
        else:
            # jax-tree npz (save_numpy_checkpoint of a prior teacher)
            trainer.teacher_params = load_numpy_checkpoint(
                args.teacher_ckpt, trainer.teacher_params)
        logger.log(f'loaded teacher params from {args.teacher_ckpt}')
    ckpt = CheckpointManager(os.path.join(args.outdir, 'ckpt'))
    state = trainer.run_loop(num_steps=args.total_steps, ckpt=ckpt,
                             save_interval=args.save_interval)
    ckpt.save(int(state.step), state)
    logger.log(f'warm-up done at step {int(state.step)}')


if __name__ == '__main__':
    main()
