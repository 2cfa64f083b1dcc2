"""Text→3D sampling entry (the north-star path).

Mirrors reference ``scripts/vit_triplane_diffusion_sample_objaverse.py``:
per prompt → conditioner → CFG denoiser sampling → VAE decode → orbit
video (MJPEG avi / gif / PNGs) + mesh export.  With
``--denoiser_ckpt``/``--vae_ckpt`` absent
it runs random-weight (pipeline smoke / timing mode).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

DEFAULT_PROMPTS = [
    # mirrors the hard-coded prompt list at reference :189-223
    'a wooden chair',
    'a sports car',
    'an airplane',
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--prompts', nargs='*', default=DEFAULT_PROMPTS)
    parser.add_argument('--outdir', default='/tmp/ln3diff-samples')
    parser.add_argument('--denoiser', default='t23d-dit-l2')
    parser.add_argument('--vae', default='objaverse-s')
    parser.add_argument('--objective', default='ddim',
                        choices=['ddim', 'flow_matching', 'dpm', 'plms'],
                        help="dpm = DPM-Solver++(2M): ~25 steps match "
                             "250-step ddim; plms = 4th-order multistep "
                             "over the respaced schedule")
    parser.add_argument('--num_steps', type=int, default=250)
    parser.add_argument('--unconditional_guidance_scale', type=float,
                        default=6.5)
    parser.add_argument('--num_frames', type=int, default=24)
    parser.add_argument('--eval_pose_asset', default='',
                        help='path to a packed (N, 25) pose asset '
                             '(reference assets/objv_eval_pose.pt — the '
                             'released eval camera protocol); overrides '
                             'the analytic orbit and --num_frames')
    parser.add_argument('--render_resolution', type=int, default=128)
    parser.add_argument('--export_mesh', default=True,
                        type=lambda s: str(s).lower() in ('1', 'true'))
    parser.add_argument('--mesh_grid', type=int, default=192)
    parser.add_argument('--denoiser_ckpt', default='')
    parser.add_argument('--vae_ckpt', default='')
    parser.add_argument('--int8_dit', action='store_true',
                        help='W8A8 int8 quantized DiT serving '
                             '(ops/int8.py): ~1.37x faster sampling scan '
                             'on v5e at ~2%% output deviation; bf16 '
                             'remains the parity default')
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--clip_vocab', default='',
                        help='path to the CLIP BPE merges file '
                             '(bpe_simple_vocab_16e6.txt[.gz]); default '
                             'resolves $LN3DIFF_CLIP_BPE then '
                             'assets/, else the hash fallback')
    parser.add_argument('--video_format', default='avi',
                        choices=['avi', 'gif', 'png'],
                        help='orbit output container: MJPEG avi '
                             '(reference writes mp4), animated gif, or '
                             'per-frame PNGs')
    parser.add_argument('--fps', type=int, default=24)
    parser.add_argument('--preset', default='',
                        help='RELEASE_PRESETS name (e.g. '
                             "'objaverse/t23d-dit', 'shapenet/car-t23d') "
                             '— sets denoiser/vae/objective/cfg-scale/'
                             'divider to the reference release config')
    args = parser.parse_args()

    if args.preset:
        from ln3diff_tpu.config import release_preset
        rp = release_preset(args.preset)
        args.denoiser = rp.denoiser
        args.vae = rp.vae
        args.objective = {'ddpm': 'ddim', 'vpsde': 'ddim'}.get(
            rp.objective, rp.objective)
        args.unconditional_guidance_scale = rp.extras.get(
            'cfg_scale', args.unconditional_guidance_scale)
        args.num_steps = rp.extras.get('sample_steps', args.num_steps)
        args.triplane_scaling_divider = rp.triplane_scaling_divider
    else:
        args.triplane_scaling_divider = None

    from ln3diff_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from ln3diff_tpu.config import build_vae, denoiser_preset, \
        vae_preset, RENDER_PRESETS
    from ln3diff_tpu.conditioning.clip import (CLIPTextModel,
                                               default_tokenizer)
    from ln3diff_tpu.diffusion.gaussian import make_diffusion
    from ln3diff_tpu.models.dit import DiT_TriLatent
    from ln3diff_tpu.models.vae import TriplaneVAE
    from ln3diff_tpu.pipeline import (SamplerSpec, TextTo3DPipeline,
                                      save_video_frames)
    from ln3diff_tpu.training.checkpoint import load_numpy_checkpoint
    from ln3diff_tpu.utils import logger

    logger.configure(args.outdir)
    os.makedirs(args.outdir, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)

    # -- models ------------------------------------------------------------
    from ln3diff_tpu.models.unet import UNetConfig, UNetModel
    den_cfg = denoiser_preset(args.denoiser)
    is_lsgm_unet = isinstance(den_cfg, UNetConfig)
    if is_lsgm_unet:   # ShapeNet/FFHQ LSGM path: v-pred + mixing logit
        denoiser = UNetModel(den_cfg)
    else:
        denoiser = DiT_TriLatent(den_cfg)
    vae_cfg = vae_preset(args.vae)
    vae = build_vae(vae_cfg)
    text_model = CLIPTextModel()
    tokenizer = default_tokenizer(args.clip_vocab or None)

    # latent geometry follows the VAE preset (FFHQ is 16x16x12 — its
    # ldm_upsample is per-token Linear over a 16² token grid; Objaverse/
    # ShapeNet are 32x32x12)
    lat_hw = vae_preset(args.vae).latent_size
    lat_c = vae_preset(args.vae).latent_channels
    x0 = jnp.zeros((2, lat_hw, lat_hw, lat_c))
    t0 = jnp.zeros((2,))
    ctx0 = {'crossattn': jnp.zeros((2, 77, den_cfg.context_dim))}
    init_ctx = ctx0['crossattn'] if is_lsgm_unet else ctx0
    den_vars = jax.jit(denoiser.init)(jax.random.PRNGKey(1), x0, t0,
                                      init_ctx)

    render_opts = RENDER_PRESETS[
        'shapenet_tuneray_aug_resolution_64_64_nearestSR'
        if args.vae == 'shapenet' else 'ffhq' if args.vae == 'ffhq'
        else 'objverse_tuneray_aug_resolution_64_64_auto']
    latent0 = jnp.zeros((1, vae_cfg.latent_size, vae_cfg.latent_size,
                         vae_cfg.latent_channels))
    cam0 = jnp.zeros((1, 25)).at[:, 0].set(1).at[:, 5].set(1) \
        .at[:, 10].set(1).at[:, 15].set(1).at[:, 16].set(1) \
        .at[:, 20].set(1).at[:, 24].set(1)
    vae_vars = vae.init(jax.random.PRNGKey(2), latent0, cam0,
                        dataclasses.replace(render_opts, depth_resolution=4,
                                            depth_resolution_importance=4),
                        8, method=vae.init_decoder_paths)
    text_vars = jax.jit(text_model.init)(
        jax.random.PRNGKey(3), jnp.zeros((1, 77), jnp.int32))

    if args.denoiser_ckpt:
        den_vars = {'params': load_numpy_checkpoint(
            args.denoiser_ckpt, den_vars['params']),
            **{k: v for k, v in den_vars.items() if k != 'params'}}
    # bf16 weight storage (bf16-compute DiT casts per step anyway;
    # halves the weight HBM read, bitwise identical)
    from ln3diff_tpu.utils.misc import cast_floating
    den_vars = cast_floating(den_vars, jnp.bfloat16)
    if args.int8_dit:
        if is_lsgm_unet:
            # measured SLOWER on v5e (6.83 bf16 vs 7.20 ms/step int8 —
            # TPU_PERF_NOTES); ops.int8.quantize_unet exists for other
            # targets, but the CLI keeps the U-Net bf16.
            logger.log('--int8_dit: U-Net int8 measured slower on v5e; '
                       'keeping bf16')
        else:
            # quantize AFTER checkpoint load: trained bf16 kernels → int8
            from ln3diff_tpu.ops.int8 import quantize_dit
            denoiser, den_vars = quantize_dit(den_cfg, den_vars, x0, t0,
                                              ctx0)
            logger.log('int8 DiT serving: projections quantized W8A8')
    if args.vae_ckpt:
        vae_vars = {'params': load_numpy_checkpoint(
            args.vae_ckpt, vae_vars['params']),
            **{k: v for k, v in vae_vars.items() if k != 'params'}}

    # -- pipeline (params are explicit jit args everywhere) ---------------
    def denoiser_fn(params, x, t, context):
        if is_lsgm_unet:   # U-Net takes the raw crossattn tokens
            return denoiser.apply(params, x, t, context['crossattn'])
        return denoiser.apply(params, x, t, context)

    def decode_fn(params, latents):
        return vae.apply(params, latents, method=vae.decode_latent)

    def render_fn(params, planes, cam25):
        return vae.apply(params, planes, cam25, render_opts,
                         args.render_resolution, None,
                         use_fused_osg=not vae_cfg.use_background,
                         method=vae.render)['image_raw']

    def point_decoder_fn(params, planes, coords):
        return vae.apply(params, planes, coords, render_opts.box_warp,
                         use_fused_osg=True, method=vae.query_points)

    pipeline = TextTo3DPipeline(
        denoiser_fn, den_vars, decode_fn, vae_vars, render_fn,
        point_decoder_fn,
        sampler=SamplerSpec(
            kind=args.objective if args.objective != 'flow_matching'
            else 'flow_matching',
            num_steps=args.num_steps,
            cfg_scale=args.unconditional_guidance_scale,
            latent_shape=(lat_hw, lat_hw, lat_c),
            **({'triplane_scaling_divider':
                args.triplane_scaling_divider}
               if args.triplane_scaling_divider is not None else {})),
        diffusion=make_diffusion(
            steps=1000,
            # LSGM U-Net checkpoints are v-pred with mixed prediction
            mean_type='v' if is_lsgm_unet else 'eps',
            mixed_prediction=is_lsgm_unet,
            # dpm runs its own solver grid over the full schedule
            timestep_respacing=None if args.objective == 'dpm'
            else f'ddim{args.num_steps}'),
        mixing_logit=den_vars['params'].get('mixing_logit')
        if is_lsgm_unet else None)

    # -- per-prompt loop ---------------------------------------------------
    # ShapeNet/FFHQ presets condition on the POOLED CLIP feature,
    # L2-normalized × scale_clip_encoding (reference
    # FrozenCLIPTextEmbedder, ldm/modules/encoders/modules.py:209-260);
    # Objaverse DiT paths use the 77-token hidden states.
    clip_scale = None
    if getattr(args, 'preset', ''):
        from ln3diff_tpu.config import RELEASE_PRESETS
        clip_scale = RELEASE_PRESETS[args.preset].get('scale_clip_encoding')
    if clip_scale is not None:
        # rebuild with the OpenAI text_projection head (encode_text)
        from ln3diff_tpu.conditioning.clip import (CLIPTextConfig,
                                                   pooled_text_context)
        text_model = CLIPTextModel(CLIPTextConfig(with_projection=True))
        text_vars = jax.jit(text_model.init)(jax.random.PRNGKey(3),
                                             jnp.zeros((1, 77), jnp.int32))
        encode_text_raw = jax.jit(
            lambda vars, ids: pooled_text_context(
                text_model.apply(vars, ids)['text_embeds'],
                scale_clip_encoding=clip_scale))
    else:
        encode_text_raw = jax.jit(
            lambda vars, ids: text_model.apply(vars,
                                               ids)['last_hidden_state'])
    encode_text = lambda ids: encode_text_raw(text_vars, ids)
    eval_cameras = None
    if args.eval_pose_asset:
        from ln3diff_tpu.render.camera import load_pose_asset
        eval_cameras = load_pose_asset(args.eval_pose_asset)

    uncond_ids = jnp.asarray(tokenizer(['']))

    for p_i, prompt in enumerate(args.prompts):
        t_start = time.perf_counter()
        cond = {'crossattn': encode_text(jnp.asarray(tokenizer([prompt])))}
        uncond = {'crossattn': encode_text(uncond_ids)}
        key, k = jax.random.split(key)
        mesh_path = os.path.join(args.outdir, f'{p_i:02d}.obj') \
            if args.export_mesh else None
        out = pipeline(k, cond, uncond, batch=1,
                       num_frames=args.num_frames, mesh_path=mesh_path,
                       mesh_grid=args.mesh_grid,
                       render_resolution=args.render_resolution,
                       cameras=eval_cameras)
        frames = np.asarray(out['video'][0])
        stem = os.path.join(args.outdir, f'{p_i:02d}')
        if args.video_format == 'avi':
            from ln3diff_tpu.utils.video import save_video_avi
            save_video_avi(frames, stem + '.avi', fps=args.fps)
        elif args.video_format == 'gif':
            from ln3diff_tpu.utils.video import save_video_gif
            save_video_gif(frames, stem + '.gif', fps=args.fps)
        else:
            save_video_frames(frames, stem)
        wall = time.perf_counter() - t_start
        logger.log(f'[{p_i}] "{prompt}": {wall:.1f} s '
                   f'({args.num_steps} steps, {args.num_frames} frames'
                   + (', mesh' if mesh_path else '') + ')')
        logger.logkv('sample_wall_s', wall)
        logger.dumpkvs()


if __name__ == '__main__':
    main()
