"""Stage-2 flow-matching (SiT) training entry.

Mirrors reference ``scripts/vit_triplane_sit_train.py`` (trainer map
{flow_matching, flow_matching_gs} at :340-345 and ``parse_transport_args``):
trains a DiT denoiser on pre-extracted VAE latents with the transport
(stochastic-interpolant) objective.  This is a thin front-end over the
shared :class:`ln3diff_tpu.training.ldm_trainer.LDMTrainer` with
``objective='flow_matching'`` — the transport knobs (path type, time
sampling) are exposed here exactly where the reference exposes them.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def parse_transport_args(parser: argparse.ArgumentParser):
    """Reference ``transport/__init__.py`` / ``parse_transport_args``."""
    group = parser.add_argument_group('transport')
    group.add_argument('--path_type', default='linear',
                       choices=['linear', 'gvp', 'vp'])
    group.add_argument('--prediction', default='velocity',
                       choices=['velocity', 'noise', 'score'])
    group.add_argument('--t_sampling', default='lognorm',
                       choices=['lognorm', 'uniform'],
                       help='lognorm is the released i23d/t23d FM setting '
                            '(reference transport.py:138-146)')
    group.add_argument('--train_eps', type=float, default=0.0)
    group.add_argument('--sample_eps', type=float, default=0.0)


def main():
    from ln3diff_tpu.config import (ExperimentConfig, add_config_to_argparser,
                                    args_to_config, denoiser_preset)

    parser = argparse.ArgumentParser()
    add_config_to_argparser(parser, ExperimentConfig())
    parse_transport_args(parser)
    parser.add_argument('--latent_dir', type=str, default='')
    parser.add_argument('--latent_size', type=int, default=0)
    parser.add_argument('--denoiser_scale', default='',
                        help="override preset, e.g. 'DiT-B/2'")
    parser.add_argument('--remat', default='dots',
                        choices=['none', 'full', 'dots'],
                        help='rematerialize scanned DiT blocks in the '
                             'backward pass (required for DiT-L/2 on a '
                             '16 GB chip)')
    parser.add_argument('--pp', type=int, default=1,
                        help='pipeline-parallel stages over the DiT trunk')
    parser.add_argument('--pp_microbatches', type=int, default=4)
    args = parser.parse_args()
    cfg = args_to_config(args)

    from ln3diff_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import dataclasses as _dc

    from ln3diff_tpu.diffusion.transport import Transport, TransportSpec
    from ln3diff_tpu.models.dit import DiT_TriLatent, dit_registry
    from ln3diff_tpu.parallel.mesh import initialize_distributed
    from ln3diff_tpu.training.checkpoint import CheckpointManager
    from ln3diff_tpu.training.ldm_trainer import LDMTrainConfig, LDMTrainer
    from ln3diff_tpu.utils import logger
    from vit_triplane_diffusion_train import latent_stream

    initialize_distributed()
    logger.configure(cfg.logdir)
    with open(os.path.join(cfg.logdir, 'args.json'), 'w') as f:
        f.write(cfg.to_json())

    den_cfg = denoiser_preset(cfg.denoiser)
    if args.denoiser_scale:
        den_cfg = dit_registry(args.denoiser_scale,
                               input_size=den_cfg.input_size,
                               in_channels=den_cfg.in_channels)
    if args.latent_size:
        den_cfg = _dc.replace(den_cfg, input_size=args.latent_size)
    if args.remat != 'none':
        den_cfg = _dc.replace(den_cfg, remat=True, remat_policy=args.remat)
    model = DiT_TriLatent(den_cfg)

    train_cfg = LDMTrainConfig(
        objective='flow_matching', lr=cfg.lr,
        triplane_scaling_divider=cfg.triplane_scaling_divider,
        microbatch_steps=cfg.microbatch_steps,
        pp_microbatches=args.pp_microbatches,
        log_interval=cfg.log_interval, total_steps=cfg.total_steps)

    data = latent_stream(args.latent_dir, cfg.batch_size,
                         (den_cfg.input_size, den_cfg.input_size, 12),
                         den_cfg.context_dim, cfg.seed)

    mesh = None
    if args.pp > 1:
        from ln3diff_tpu.parallel.mesh import MeshConfig, make_mesh
        mesh = make_mesh(MeshConfig(pipe=args.pp))
    trainer = LDMTrainer(model, train_cfg, mesh=mesh, seed=cfg.seed)
    # Swap in the transport configured from the CLI (path/prediction/t-dist).
    trainer.transport = Transport(TransportSpec(
        path=args.path_type, prediction=args.prediction,
        t_sampling=args.t_sampling, train_eps=args.train_eps,
        sample_eps=args.sample_eps))
    trainer.build(next(data))

    ckpt = CheckpointManager(os.path.join(cfg.logdir, 'checkpoints'))
    if cfg.resume_checkpoint:
        restored = ckpt.restore(trainer._state)
        if restored is not None:
            trainer._state = restored
            logger.log(f'resumed from step {int(restored.step)}')

    from scripts_lib import train_until
    train_until(trainer, data, cfg.total_steps, cfg.save_interval, ckpt,
                logger)
    ckpt.close()


if __name__ == '__main__':
    main()
