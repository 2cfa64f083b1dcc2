"""Convert released LN3Diff torch checkpoints to this framework's format.

The reference releases joint ``model_joint_denoise_rec_model*.pt`` /
``.safetensors`` files holding the denoiser (``ddpm_model.``) and VAE
(``rec_model.``) under name prefixes (reference
``guided_diffusion/fp16_util.py:299-303``).  This CLI maps them onto our
param trees (``ln3diff_tpu/conditioning/convert_ln3diff.py``) and writes
the ``.npz`` checkpoints that ``vit_triplane_diffusion_sample.py
--denoiser_ckpt/--vae_ckpt`` load.

    python scripts/convert_checkpoint.py \
        --src model_joint_denoise_rec_model3910000.safetensors \
        --kind joint-objaverse --outdir /tmp/ckpt --verify

``--verify`` initializes the target models and checks the converted tree
matches the model param tree name-for-name and shape-for-shape.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

KINDS = ('joint-objaverse', 'joint-shapenet', 'vae-objaverse',
         'vae-shapenet', 'vae-ffhq')


def _flat(tree, prefix=''):
    """Nested dict → {'a/b': leaf}.  Leaves stay as-is (arrays or
    ``jax.ShapeDtypeStruct`` from ``eval_shape``)."""
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flat(v, f'{prefix}{k}/'))
        return out
    out[prefix[:-1]] = tree
    return out


def convert(kind: str, sd, args) -> dict:
    """state dict → {'denoiser': tree, 'vae': tree, ...} per kind."""
    from ln3diff_tpu.conditioning import convert_ln3diff as C
    if kind == 'joint-objaverse':
        return C.convert_joint_objaverse(
            sd, dit_depth=args.dit_depth, dit2_depth=args.dit2_depth,
            denoiser_variant=args.denoiser_variant)
    if kind == 'joint-shapenet':
        from ln3diff_tpu.config import denoiser_preset
        return C.convert_joint_shapenet(
            sd, unet_cfg=denoiser_preset('shapenet-unet'),
            fusion_depth=args.fusion_depth,
            encoder_depth=args.encoder_depth)
    if kind == 'vae-objaverse':
        return {'vae': C.convert_vae_objaverse(sd,
                                               dit2_depth=args.dit2_depth)}
    if kind == 'vae-shapenet':
        return {'vae': C.convert_vae_shapenet(
            sd, fusion_depth=args.fusion_depth,
            encoder_depth=args.encoder_depth)}
    if kind == 'vae-ffhq':
        return {'vae': C.convert_vae_ffhq(
            sd, fusion_depth=args.fusion_depth,
            encoder_depth=args.encoder_depth)}
    raise SystemExit(f'unknown --kind {kind!r} (choices: {KINDS})')


def _init_params(kind: str, which: str, args):
    """Target model param tree (shapes only, via ``jax.eval_shape``)."""
    import jax
    import jax.numpy as jnp
    from ln3diff_tpu.config import (RENDER_PRESETS, build_vae,
                                    denoiser_preset, vae_preset)
    key = jax.random.PRNGKey(0)
    if which == 'denoiser':
        if kind == 'joint-objaverse':
            from ln3diff_tpu.models.dit import DiT_TriLatent
            model = DiT_TriLatent(denoiser_preset('t23d-dit-l2'))
            v = jax.eval_shape(
                model.init, key, jnp.zeros((1, 32, 32, 12)),
                jnp.zeros((1,)),
                {'crossattn': jnp.zeros((1, 77, 768))})
        else:
            from ln3diff_tpu.models.unet import UNetModel
            model = UNetModel(denoiser_preset('shapenet-unet'))
            v = jax.eval_shape(
                model.init, key, jnp.zeros((1, 32, 32, 12)),
                jnp.zeros((1,)), jnp.zeros((1, 77, 768)))
        return v['params']
    dataset = kind.rsplit('-', 1)[-1]
    model = build_vae(vae_preset(dataset))
    if dataset == 'objaverse':
        imgs = jnp.zeros((4, 256, 256, 10))
        opts = RENDER_PRESETS['objverse_tuneray_aug_resolution_64_64_auto']
    else:
        imgs = jnp.zeros((1, 224, 224, 3))
        opts = RENDER_PRESETS['ffhq' if dataset == 'ffhq'
                              else 'shapenet_tuneray_aug_resolution_64_64'
                              '_nearestSR']
    cam = jnp.zeros((1, 25))
    v = jax.eval_shape(lambda k: model.init(k, imgs, cam, opts, 64,
                                            key), key)
    return v['params']


def verify_tree(converted: dict, params_like: dict, label: str) -> int:
    got = {k: v for k, v in _flat(converted).items()
           if not k.split('/')[-1].startswith('_')}
    want = _flat(params_like)
    errors = 0
    for name in sorted(set(got) | set(want)):
        if name not in want:
            print(f'  [{label}] EXTRA     {name} '
                  f'{tuple(np.shape(got[name]))}')
            errors += 1
        elif name not in got:
            print(f'  [{label}] MISSING   {name} '
                  f'{tuple(want[name].shape)}')
            errors += 1
        elif tuple(np.shape(got[name])) != tuple(want[name].shape):
            print(f'  [{label}] SHAPE     {name} converted '
                  f'{tuple(np.shape(got[name]))} != model '
                  f'{tuple(want[name].shape)}')
            errors += 1
    print(f'  [{label}] {len(want)} leaves, {errors} mismatches')
    return errors


def main():
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument('--src', required=True,
                        help='.pt or .safetensors reference checkpoint')
    parser.add_argument('--kind', required=True, choices=KINDS)
    parser.add_argument('--outdir', required=True)
    parser.add_argument('--verify', action='store_true',
                        help='check converted trees against the target '
                             'model param trees (names + shapes)')
    parser.add_argument('--dit_depth', type=int, default=24)
    parser.add_argument('--dit2_depth', type=int, default=24)
    parser.add_argument('--denoiser_variant', default='text')
    parser.add_argument('--fusion_depth', type=int, default=6)
    parser.add_argument('--encoder_depth', type=int, default=12)
    args = parser.parse_args()

    from ln3diff_tpu.conditioning.convert import load_torch_checkpoint
    from ln3diff_tpu.training.checkpoint import save_numpy_checkpoint

    sd = load_torch_checkpoint(args.src)
    print(f'{args.src}: {len(sd)} tensors')
    out = convert(args.kind, sd, args)

    os.makedirs(args.outdir, exist_ok=True)
    total_errors = 0
    for name, tree in out.items():
        if name == 'mixing_logit':
            path = os.path.join(args.outdir, 'mixing_logit.npy')
            np.save(path, np.asarray(tree))
            print(f'wrote {path}')
            continue
        if args.verify:
            total_errors += verify_tree(tree, _init_params(args.kind, name,
                                                           args), name)
        path = os.path.join(args.outdir, f'{name}.npz')
        save_numpy_checkpoint(path, tree)
        n = len(_flat(tree))
        print(f'wrote {path} ({n} arrays)')
    if args.verify and total_errors:
        raise SystemExit(f'{total_errors} tree mismatches')


if __name__ == '__main__':
    main()
