"""One-command numerical parity harness: released reference checkpoint →
side-by-side PyTorch-reference vs ln3diff_tpu comparison.

The weight-day protocol for the north star ("renders within LPIPS 0.05
of the PyTorch reference", BASELINE.md): given a released joint
checkpoint (``model_joint_denoise_rec_model*.{pt,safetensors}``, layout
``guided_diffusion/fp16_util.py:299-303`` — ``ddpm_model.`` +
``rec_model.`` prefixes), this script

  1. converts it with the production converters
     (``ln3diff_tpu/conditioning/convert_ln3diff.py``),
  2. instantiates the REFERENCE torch modules (via ``tests/ref_compat``
     CPU stubs) and loads the same weights,
  3. runs both sides on fixed inputs through every serving stage —
     denoiser forward, VAE latent→planes decode, volume render
     (deterministic sampling on both sides) — and
  4. reports per-stage max-abs deviation / relative error / PSNR and
     image LPIPS, gating the exit code on ``--psnr_min`` /
     ``--lpips_max``.

Reference stages compared: ``DiT_TriLatent.forward``
(``dit/dit_trilatent.py``), ``vit_decode_backbone`` +
``vit_decode_postprocess`` (``vit/vit_triplane.py:1702-1784``,
assembled here from its parts exactly as ``tests/test_ref_parity.py``
does), ``ImportanceRenderer.forward``
(``nsr/volumetric_rendering/renderer.py:133-307``).

LPIPS uses the ported VGG metric (``ln3diff_tpu/conditioning/lpips.py``);
pass ``--lpips_weights lpips.npz`` (converted with
``convert_lpips_torch``) for the calibrated metric — random-init LPIPS
is reported but clearly marked uncalibrated and never gated on.

Self-test: ``tests/test_parity_script.py`` writes a small synthetic
joint checkpoint FROM the reference modules and runs this script's
``run_parity`` end-to-end on it.

Scope: the t23d/i23d joint-objaverse family (the released
``model_joint_denoise_rec_model*`` checkpoints).  The ShapeNet/FFHQ
families cannot be composed into a full reference chain OFFLINE — the
reference builds their DINO encoder/decoder through ``torch.hub``
(``vit/vision_transformer.py``), unavailable without egress; their
module-level conversion parity is covered by
``tests/test_ref_parity_shapenet.py`` / ``test_ref_parity_ffhq.py``
(mini-DINO stand-ins with the reference's exact state-dict naming).

Example:
    python scripts/parity_vs_reference.py \
        --ckpt model_joint_denoise_rec_model3950000.safetensors \
        --render_res 128 --out /tmp/parity.json
"""

from __future__ import annotations

import argparse
import contextlib
import dataclasses
import json
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, 'tests'))


# ---------------------------------------------------------------------------
# architecture spec (release defaults = the published joint-objaverse arch)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class ArchSpec:
    """Joint-objaverse architecture knobs.  Defaults describe the
    released ``model_joint_denoise_rec_model*`` checkpoints
    (DiT-L/2 denoiser + DiT2-L/2 VAE decoder, BASELINE.md); the
    self-test shrinks every dimension."""
    # denoiser (DiT_TriLatent, t23d text variant)
    dit_depth: int = 24
    dit_hidden: int = 1024
    dit_heads: int = 16
    context_dim: int = 768
    # latent / VAE decode
    ldm_z: int = 4
    latent_size: int = 32
    patch_size: int = 2
    dit2_depth: int = 24
    dit2_hidden: int = 1024
    dit2_heads: int = 16
    conv_sr_ch: int = 32
    conv_sr_ch_mult: tuple = (1, 2, 2, 4)
    conv_sr_res_blocks: int = 1
    plane_channels: int = 32
    decoder_output_dim: int = 32
    # encoder (converted + shape-verified; numerics covered by
    # tests/test_ref_parity.py::test_mv_encoder_dynamic)
    enc_ch: int = 64
    enc_ch_mult: tuple = (1, 2, 4, 4)

    @property
    def tokens_per_plane(self) -> int:
        return (self.latent_size // self.patch_size) ** 2

    @property
    def token_grid(self) -> int:
        return self.latent_size // self.patch_size


# smallest dims the reference modules accept (SD GroupNorm needs 32-
# divisible conv channels)
SMALL = ArchSpec(dit_depth=2, dit_hidden=64, dit_heads=2, context_dim=32,
                 latent_size=8, dit2_depth=2, dit2_hidden=64, dit2_heads=2,
                 conv_sr_ch=32, conv_sr_ch_mult=(1, 2),
                 plane_channels=8, decoder_output_dim=6,
                 enc_ch=32, enc_ch_mult=(1, 2))


# ---------------------------------------------------------------------------
# deterministic sampling (both frameworks must draw identically)
# ---------------------------------------------------------------------------

@contextlib.contextmanager
def deterministic_torch_sampling():
    """Pin the reference renderer's stochastic draws to this repo's
    ``RenderOptions(deterministic=True)`` convention: stratified jitter
    → 0.5 midpoints, PDF inverse-CDF draws → linspace(0, 1) (same
    patch as tests/test_ref_parity_render.py)."""
    import torch
    orig_rand, orig_rand_like = torch.rand, torch.rand_like

    def rand_like(x, **kw):
        return torch.full_like(x, 0.5)

    def rand(*sizes, **kw):
        if len(sizes) == 1 and isinstance(sizes[0], (tuple, list)):
            sizes = tuple(sizes[0])
        kw.pop('generator', None)
        n = sizes[-1]
        u = torch.linspace(0.0, 1.0, n, device=kw.get('device'),
                           dtype=kw.get('dtype'))
        return u.expand(*sizes).contiguous()

    torch.rand, torch.rand_like = rand, rand_like
    try:
        yield torch
    finally:
        torch.rand, torch.rand_like = orig_rand, orig_rand_like


def _sub_sd(sd, prefix):
    return {k[len(prefix):]: v for k, v in sd.items()
            if k.startswith(prefix)}


def _metrics(ref: np.ndarray, got: np.ndarray, data_range=None) -> dict:
    ref = np.asarray(ref, np.float64)
    got = np.asarray(got, np.float64)
    diff = np.abs(ref - got)
    rel = float(np.linalg.norm(diff) / (np.linalg.norm(ref) + 1e-12))
    mse = float(np.mean(diff ** 2))
    rng = data_range if data_range is not None \
        else float(ref.max() - ref.min() + 1e-12)
    psnr = float(10 * np.log10(rng ** 2 / mse)) if mse > 0 else float('inf')
    return {'max_abs': float(diff.max()), 'rel_fro': rel, 'psnr_db': psnr}


# ---------------------------------------------------------------------------
# stage runners
# ---------------------------------------------------------------------------

def stage_denoiser(arch: ArchSpec, ddpm_sd, converted_denoiser, seed=0):
    """DiT forward parity at fixed (x_t, t, context)."""
    import torch

    import jax
    import jax.numpy as jnp
    from dit.dit_models_xformers import TextCondDiTBlock
    from dit.dit_trilatent import DiT_TriLatent as RefDiT

    from ln3diff_tpu.models.dit import DiT_TriLatent, DiTConfig

    ref = RefDiT(input_size=arch.latent_size, patch_size=arch.patch_size,
                 in_channels=arch.ldm_z, hidden_size=arch.dit_hidden,
                 depth=arch.dit_depth, num_heads=arch.dit_heads,
                 num_classes=0, learn_sigma=False,
                 context_dim=arch.context_dim, roll_out=True,
                 vit_blk=TextCondDiTBlock).eval()
    missing, unexpected = ref.load_state_dict(
        {k: v for k, v in ddpm_sd.items() if not k.startswith('mixing')},
        strict=False)
    rng = np.random.default_rng(seed)
    B = 2
    x = rng.standard_normal(
        (B, 3 * arch.ldm_z, arch.latent_size, arch.latent_size)
    ).astype(np.float32)
    t = np.array([31.0, 250.0], np.float32)[:B]
    ctx = rng.standard_normal((B, 77, arch.context_dim)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), timesteps=torch.from_numpy(t),
                      context=torch.from_numpy(ctx)).numpy()

    cfg = DiTConfig(input_size=arch.latent_size, patch_size=arch.patch_size,
                    in_channels=arch.ldm_z, hidden_size=arch.dit_hidden,
                    depth=arch.dit_depth, num_heads=arch.dit_heads,
                    context_dim=arch.context_dim, variant='text',
                    dtype=jnp.float32)
    ours = DiT_TriLatent(cfg)
    x_j = jnp.asarray(x.transpose(0, 2, 3, 1))
    cond = {'crossattn': jnp.asarray(ctx)}
    variables = ours.init(jax.random.PRNGKey(0), x_j, jnp.asarray(t), cond)
    got = ours.apply({'params': converted_denoiser,
                      'constants': variables['constants']},
                     x_j, jnp.asarray(t), cond)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    m = _metrics(ref_out, got)
    m['load_missing'] = len(missing)
    m['load_unexpected'] = len(unexpected)
    return m


def _build_ref_decode(arch: ArchSpec, rec_sd):
    """Assemble the reference decode chain exactly as the release class
    runs it (``vit_decode_backbone`` + ``vit_decode_postprocess``,
    ``vit/vit_triplane.py:1702-1784``, D_roll_out_input=False)."""
    import torch
    from dit.dit_decoder import DiT2 as RefDiT2
    from ldm.modules.diffusionmodules.model import Decoder as RefDecoder
    from vit.vit_triplane import PatchEmbedTriplane

    pe = PatchEmbedTriplane(img_size=arch.latent_size,
                            patch_size=arch.patch_size,
                            in_chans=3 * arch.ldm_z,
                            embed_dim=arch.dit2_hidden).eval()
    pe.load_state_dict(
        _sub_sd(rec_sd, 'decoder.superresolution.ldm_upsample.'))
    dit2 = RefDiT2(input_size=arch.latent_size, patch_size=arch.patch_size,
                   in_channels=arch.ldm_z, hidden_size=arch.dit2_hidden,
                   depth=arch.dit2_depth, num_heads=arch.dit2_heads,
                   num_classes=0, learn_sigma=False, mixed_prediction=False,
                   context_dim=None, roll_out=True, plane_n=3).eval()
    # the reference decoder class replaces the backbone pos_embed with a
    # (1, 3·p², D) parameter (``vit/vit_triplane.py:210-212``) — resize
    # before load so the checkpoint's value lands
    dit2.pos_embed = torch.nn.Parameter(torch.zeros(
        1, 3 * arch.tokens_per_plane, arch.dit2_hidden))
    dit2.load_state_dict(_sub_sd(rec_sd, 'decoder.vit_decoder.'),
                         strict=False)   # tolerate absent buffers
    dec = RefDecoder(ch=arch.conv_sr_ch, out_ch=arch.plane_channels,
                     ch_mult=arch.conv_sr_ch_mult,
                     num_res_blocks=arch.conv_sr_res_blocks,
                     attn_resolutions=[], in_channels=3,
                     resolution=arch.token_grid
                     * 2 ** (len(arch.conv_sr_ch_mult) - 1),
                     z_channels=arch.dit2_hidden).eval()
    dec.load_state_dict(_sub_sd(rec_sd, 'decoder.superresolution.conv_sr.'))

    def decode(latent_t):
        from einops import rearrange
        with torch.no_grad():
            tok = pe(latent_t)                     # (B, 3L, D)
            tok = dit2(tok)
            B = latent_t.shape[0]
            h = w = arch.token_grid
            x = tok.reshape(B, 3, h, w, arch.dit2_hidden)
            x = rearrange(x, 'b n h w c->(b n) c h w')
            planes = dec(x)                        # (B*3, C, Hp, Wp)
            return rearrange(planes, '(b n) c h w->b n c h w', n=3)

    return decode


def stage_decode(arch: ArchSpec, rec_sd, converted_vae, seed=1):
    """latent → planes on both sides; returns (metrics, ref_planes,
    our_planes) so the render stage composes the full chain."""
    import torch

    import jax
    import jax.numpy as jnp
    from ln3diff_tpu.models.dit import DiT2Config
    from ln3diff_tpu.models.vae import TriplaneVAE, TriplaneVAEConfig

    decode_ref = _build_ref_decode(arch, rec_sd)
    rng = np.random.default_rng(seed)
    lat = rng.standard_normal(
        (1, 3 * arch.ldm_z, arch.latent_size, arch.latent_size)
    ).astype(np.float32)
    ref_planes = decode_ref(torch.from_numpy(lat)).numpy()  # B 3 C H W

    cfg = TriplaneVAEConfig(
        ldm_z_channels=arch.ldm_z, latent_size=arch.latent_size,
        patch_size=arch.patch_size,
        dit2=DiT2Config(tokens_per_plane=arch.tokens_per_plane,
                        hidden_size=arch.dit2_hidden, depth=arch.dit2_depth,
                        num_heads=arch.dit2_heads, roll_out=True,
                        dtype=jnp.float32),
        conv_sr_ch=arch.conv_sr_ch, conv_sr_ch_mult=arch.conv_sr_ch_mult,
        conv_sr_res_blocks=arch.conv_sr_res_blocks,
        plane_channels=arch.plane_channels,
        decoder_output_dim=arch.decoder_output_dim, dtype=jnp.float32)
    vae = TriplaneVAE(cfg)
    lat_j = jnp.asarray(lat.transpose(0, 2, 3, 1))
    variables = vae.init(jax.random.PRNGKey(0), lat_j,
                         method=vae.decode_latent)
    params = dict(variables['params'])
    for k in ('ldm_upsample', 'dit2', 'conv_sr'):
        params[k] = converted_vae[k]
    got = np.asarray(vae.apply({'params': params}, lat_j,
                               method=vae.decode_latent))  # B 3 H W C
    m = _metrics(ref_planes, got.transpose(0, 1, 4, 2, 3))
    return m, ref_planes, got


def stage_render(arch: ArchSpec, rec_sd, converted_vae, ref_planes,
                 our_planes, render_res=64, n_views=2, samples=64,
                 lpips_weights=None, seed=2):
    """Render each side's OWN planes (full-chain composition) with
    deterministic sampling; PSNR between images + LPIPS."""
    import jax.numpy as jnp
    from nsr.triplane import OSGDecoder as RefOSGDecoder
    from nsr.volumetric_rendering.renderer import ImportanceRenderer

    from ln3diff_tpu.models.osg_decoder import OSGDecoder
    from ln3diff_tpu.render.camera import generate_input_camera
    from ln3diff_tpu.render.ray_sampler import sample_full_rays
    from ln3diff_tpu.render.renderer import RenderOptions, render_rays

    # shared eval cameras (orbit ring, objaverse radius/fov)
    poses = np.stack([np.full(n_views, 20.0),
                      np.linspace(0, 300, n_views)], axis=-1)
    cam2world, fxfycxcy = generate_input_camera(1.8, poses, fov=30.0)
    fx, fy, cx, cy = fxfycxcy
    intr = np.tile(np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]],
                            np.float32)[None], (n_views, 1, 1))
    o, d = sample_full_rays(jnp.asarray(cam2world), jnp.asarray(intr),
                            render_res)
    o, d = np.asarray(o), np.asarray(d)

    kw = dict(ray_start='auto', ray_end='auto', box_warp=0.9,
              depth_resolution=samples, depth_resolution_importance=samples,
              disparity_space_sampling=False, clamp_mode='softplus',
              white_back=True, filter_out_of_bbox=True,
              sampler_bbox_min=-0.45, sampler_bbox_max=0.45)

    ref_dec = RefOSGDecoder(
        arch.plane_channels,
        {'decoder_lr_mul': 1.0,
         'decoder_output_dim': arch.decoder_output_dim}).eval()
    ref_dec.load_state_dict(_sub_sd(rec_sd, 'decoder.triplane_decoder.'
                                            'decoder.'))
    with deterministic_torch_sampling() as torch:
        renderer = ImportanceRenderer()
        with torch.no_grad():
            ref = renderer(
                torch.from_numpy(np.repeat(ref_planes, n_views, axis=0)),
                ref_dec, torch.from_numpy(o), torch.from_numpy(d), kw)
    ref_img = ref['feature_samples'].numpy()[..., :3].reshape(
        n_views, render_res, render_res, 3)

    osg = OSGDecoder(decoder_output_dim=arch.decoder_output_dim,
                     decoder_lr_mul=1.0)
    opts = RenderOptions(
        depth_resolution=samples, depth_resolution_importance=samples,
        ray_start='auto', ray_end='auto', box_warp=0.9, white_back=True,
        filter_out_of_bbox=True, sampler_bbox_min=-0.45,
        sampler_bbox_max=0.45, deterministic=True)
    out = render_rays(
        None, jnp.asarray(np.repeat(our_planes, n_views, axis=0)),
        lambda f, dd: osg.apply({'params': converted_vae['osg_decoder']},
                                f, dd),
        jnp.asarray(o), jnp.asarray(d), opts)
    got_img = np.asarray(out.feature_samples)[..., :3].reshape(
        n_views, render_res, render_res, 3)

    m = _metrics(ref_img, got_img, data_range=1.0)

    # LPIPS on [-1, 1] images (the north-star gate with converted VGG)
    from ln3diff_tpu.conditioning.lpips import make_lpips_fn
    lp_params = None
    calibrated = False
    if lpips_weights:
        from ln3diff_tpu.training.checkpoint import load_numpy_checkpoint
        lp_params = load_numpy_checkpoint(lpips_weights)
        calibrated = True
    lpips = make_lpips_fn(lp_params)
    m['lpips'] = float(lpips(jnp.asarray(ref_img * 2 - 1),
                             jnp.asarray(got_img * 2 - 1)))
    m['lpips_calibrated'] = calibrated
    return m


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def run_parity(ckpt: str, arch: ArchSpec = ArchSpec(), render_res: int = 64,
               n_views: int = 2, samples: int = 64,
               lpips_weights: str | None = None,
               verify_shapes: bool = True) -> dict:
    """Full harness; returns the report dict (see __doc__)."""
    # CPU on both sides: the torch reference is CPU-only here, and the
    # comparison wants deterministic f32 math, not TPU bf16 serving
    # dtypes (the axon plugin force-prepends itself, so set the config,
    # not just the env var).
    import jax
    try:
        jax.config.update('jax_platforms', 'cpu')
    except RuntimeError:
        pass   # backend already initialized (e.g. under pytest)

    import ref_compat
    if not ref_compat.install():
        raise SystemExit('/root/reference not available')

    from ln3diff_tpu.conditioning.convert import (load_torch_checkpoint,
                                                  split_joint_checkpoint)
    from ln3diff_tpu.conditioning.convert_ln3diff import (
        convert_dit_trilatent, convert_vae_objaverse)

    t0 = time.time()
    sd = load_torch_checkpoint(ckpt)
    subs = split_joint_checkpoint(sd)
    if 'ddpm_model' not in subs or 'rec_model' not in subs:
        raise SystemExit(
            f'{ckpt}: expected ddpm_model./rec_model. prefixes, found '
            f'{sorted(subs)} (is this a joint checkpoint?)')
    ddpm_sd, rec_sd = subs['ddpm_model'], subs['rec_model']
    print(f'[parity] {ckpt}: {len(ddpm_sd)} denoiser + {len(rec_sd)} VAE '
          f'tensors', flush=True)

    converted_den = convert_dit_trilatent(ddpm_sd, depth=arch.dit_depth)
    converted_vae = convert_vae_objaverse(
        rec_sd, dit2_depth=arch.dit2_depth, enc_ch_mult=arch.enc_ch_mult,
        dec_ch_mult=arch.conv_sr_ch_mult,
        num_res_blocks=arch.conv_sr_res_blocks)
    print(f'[parity] converted ({time.time() - t0:.1f}s)', flush=True)

    report = {'ckpt': ckpt, 'stages': {}}
    report['stages']['denoiser'] = stage_denoiser(arch, ddpm_sd,
                                                  converted_den)
    print(f"[parity] denoiser: {report['stages']['denoiser']}", flush=True)
    dec_m, ref_planes, our_planes = stage_decode(arch, rec_sd,
                                                 converted_vae)
    report['stages']['vae_decode'] = dec_m
    print(f'[parity] vae_decode: {dec_m}', flush=True)
    report['stages']['render'] = stage_render(
        arch, rec_sd, converted_vae, ref_planes, our_planes,
        render_res=render_res, n_views=n_views, samples=samples,
        lpips_weights=lpips_weights)
    print(f"[parity] render: {report['stages']['render']}", flush=True)
    report['wall_s'] = round(time.time() - t0, 1)
    return report


def main(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument('--ckpt', required=True,
                   help='joint reference checkpoint (.pt/.safetensors)')
    p.add_argument('--render_res', type=int, default=64)
    p.add_argument('--n_views', type=int, default=2)
    p.add_argument('--samples', type=int, default=64,
                   help='coarse=fine sample count (release: 64)')
    p.add_argument('--lpips_weights', default=None,
                   help='converted VGG-LPIPS .npz (convert_lpips_torch)')
    p.add_argument('--lpips_max', type=float, default=0.05,
                   help='gate (north star; only with --lpips_weights)')
    p.add_argument('--psnr_min', type=float, default=40.0,
                   help='render-stage PSNR gate (dB)')
    p.add_argument('--small', action='store_true',
                   help='self-test arch (tests/test_parity_script.py)')
    p.add_argument('--out', default=None, help='write report JSON here')
    args = p.parse_args(argv)

    report = run_parity(args.ckpt, SMALL if args.small else ArchSpec(),
                        render_res=args.render_res, n_views=args.n_views,
                        samples=args.samples,
                        lpips_weights=args.lpips_weights)

    render = report['stages']['render']
    failures = []
    if render['psnr_db'] < args.psnr_min:
        failures.append(f"render PSNR {render['psnr_db']:.1f} dB "
                        f"< {args.psnr_min}")
    if render['lpips_calibrated'] and render['lpips'] > args.lpips_max:
        failures.append(f"LPIPS {render['lpips']:.4f} > {args.lpips_max}")
    report['pass'] = not failures
    report['failures'] = failures

    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(report, f, indent=2)
        print(f'[parity] wrote {args.out}')
    if failures:
        raise SystemExit('PARITY GATE FAILED: ' + '; '.join(failures))
    print('[parity] PASS')


if __name__ == '__main__':
    main()
