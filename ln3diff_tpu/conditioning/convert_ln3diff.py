"""Converters from the reference LN3Diff checkpoint naming to our params.

The released checkpoints (``model_joint_denoise_rec_model*.safetensors``)
store torch state_dicts with the reference's module names.  These mappers
translate the subsystems whose architectures we mirror exactly:

  * SD conv Encoder/Decoder (``ldm/modules/diffusionmodules/model.py``
    naming: ``conv_in``, ``down.{i}.block.{j}.{norm1,conv1,...}``,
    ``mid.block_1``, ``up.{i}.block.{j}``, ``norm_out``, ``conv_out``) →
    our ``models/sd_vae.py`` flax trees.
  * the OSG decoder (StyleGAN ``FullyConnectedLayer`` weights) →
    ``models/osg_decoder.py`` EqualDense params.

Mechanics are unit-tested against synthetic reference-shaped state
dicts; numerical parity against real released weights requires the
checkpoints themselves (absent in zero-egress environments — download
them and run ``load_torch_checkpoint`` + these mappers).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from .convert import _np, conv2d, group_norm, linear


def convert_sd_encoder(sd: Mapping, ch_mult=(1, 2, 4, 4),
                       num_res_blocks: int = 1,
                       attn_resolutions=(), prefix: str = '') -> dict:
    """Reference ``Encoder`` state_dict → our ``Encoder`` params."""
    p = prefix
    params: dict = {'conv_in': conv2d(sd, f'{p}conv_in')}
    num_resolutions = len(ch_mult)
    for i in range(num_resolutions):
        for j in range(num_res_blocks):
            params[f'down_{i}_block_{j}'] = _resnet_block(
                sd, f'{p}down.{i}.block.{j}')
        if i != num_resolutions - 1:
            params[f'down_{i}_downsample'] = {
                'conv': conv2d(sd, f'{p}down.{i}.downsample.conv')}
    params['mid_block_1'] = _resnet_block(sd, f'{p}mid.block_1')
    params['mid_attn_1'] = _attn_block(sd, f'{p}mid.attn_1')
    params['mid_block_2'] = _resnet_block(sd, f'{p}mid.block_2')
    params['norm_out'] = {'GroupNorm_0': group_norm(sd, f'{p}norm_out')}
    params['conv_out'] = conv2d(sd, f'{p}conv_out')
    return params


def convert_sd_decoder(sd: Mapping, ch_mult=(1, 2, 2, 4),
                       num_res_blocks: int = 1,
                       prefix: str = '') -> dict:
    """Reference ``Decoder`` state_dict → our ``Decoder`` params."""
    p = prefix
    params: dict = {'conv_in': conv2d(sd, f'{p}conv_in')}
    params['mid_block_1'] = _resnet_block(sd, f'{p}mid.block_1')
    params['mid_attn_1'] = _attn_block(sd, f'{p}mid.attn_1')
    params['mid_block_2'] = _resnet_block(sd, f'{p}mid.block_2')
    for i in reversed(range(len(ch_mult))):
        for j in range(num_res_blocks + 1):
            params[f'up_{i}_block_{j}'] = _resnet_block(
                sd, f'{p}up.{i}.block.{j}')
        if i != 0:
            params[f'up_{i}_upsample'] = {
                'conv': conv2d(sd, f'{p}up.{i}.upsample.conv')}
    params['norm_out'] = {'GroupNorm_0': group_norm(sd, f'{p}norm_out')}
    params['conv_out'] = conv2d(sd, f'{p}conv_out')
    return params


def _resnet_block(sd: Mapping, p: str) -> dict:
    out = {
        'norm1': {'GroupNorm_0': group_norm(sd, f'{p}.norm1')},
        'conv1': conv2d(sd, f'{p}.conv1'),
        'norm2': {'GroupNorm_0': group_norm(sd, f'{p}.norm2')},
        'conv2': conv2d(sd, f'{p}.conv2'),
    }
    if f'{p}.nin_shortcut.weight' in sd:
        out['nin_shortcut'] = conv2d(sd, f'{p}.nin_shortcut')
    return out


def _attn_block(sd: Mapping, p: str) -> dict:
    return {
        'norm': {'GroupNorm_0': group_norm(sd, f'{p}.norm')},
        'q': conv2d(sd, f'{p}.q'),
        'k': conv2d(sd, f'{p}.k'),
        'v': conv2d(sd, f'{p}.v'),
        'proj_out': conv2d(sd, f'{p}.proj_out'),
    }


def convert_osg_decoder(sd: Mapping, prefix: str = 'decoder.net') -> dict:
    """Reference ``OSGDecoder`` (two StyleGAN FullyConnectedLayers,
    ``nsr/triplane.py:338-375``) → our ``OSGDecoder``.

    StyleGAN FC stores raw weight (out, in) applied as
    ``x @ (w.T * lr_mul/sqrt(in))`` — identical runtime scaling to our
    ``EqualDense``, so weights copy over transposed, biases verbatim.
    """
    return {
        'EqualDense_0': {
            'kernel': _np(sd[f'{prefix}.0.weight']).T,
            'bias': _np(sd[f'{prefix}.0.bias']),
        },
        'EqualDense_1': {
            'kernel': _np(sd[f'{prefix}.2.weight']).T,
            'bias': _np(sd[f'{prefix}.2.bias']),
        },
    }


def convert_quant_conv(sd: Mapping, prefix: str = 'superresolution.quant_conv'
                       ) -> dict:
    """Grouped 1x1 quant conv (reference ``vit_triplane.py:854``)."""
    return conv2d(sd, prefix)


# ---------------------------------------------------------------------------
# Stage-2 denoisers (reference dit/dit_trilatent.py, dit/dit_i23d.py)
# ---------------------------------------------------------------------------

def _stack(trees: list) -> dict:
    """Stack a list of identical param trees along a new axis 0 (the
    ``nn.scan`` weight-stacked block layout)."""
    out: dict = {}
    for k in trees[0]:
        vals = [t[k] for t in trees]
        if isinstance(vals[0], dict):
            out[k] = _stack(vals)
        else:
            out[k] = np.stack(vals, axis=0)
    return out


def _dit_attn(sd: Mapping, p: str) -> dict:
    out = {'qkv': linear(sd, f'{p}.qkv'), 'proj': linear(sd, f'{p}.proj')}
    if f'{p}.q_norm.weight' in sd:
        out['q_norm'] = {'scale': _np(sd[f'{p}.q_norm.weight'])}
        out['k_norm'] = {'scale': _np(sd[f'{p}.k_norm.weight'])}
    return out


def _dit_cross_attn(sd: Mapping, p: str) -> dict:
    return {
        'to_q': linear(sd, f'{p}.to_q'),
        'to_k': linear(sd, f'{p}.to_k'),
        'to_v': linear(sd, f'{p}.to_v'),
        'to_out': linear(sd, f'{p}.to_out.0'),
    }


def _fused_mlp(sd: Mapping, p: str) -> dict:
    """xformers FusedMLP (``mlp.0``/``mlp.2`` Linears)."""
    return {'fc1': linear(sd, f'{p}.mlp.0'), 'fc2': linear(sd, f'{p}.mlp.2')}


def _dit_block(sd: Mapping, p: str, variant: str) -> dict:
    blk: dict = {
        'attn': _dit_attn(sd, f'{p}.attn'),
        'mlp': _fused_mlp(sd, f'{p}.mlp'),
    }
    if f'{p}.adaLN_modulation.1.weight' in sd:
        blk['adaLN_modulation'] = linear(sd, f'{p}.adaLN_modulation.1')
    if f'{p}.scale_shift_table' in sd:
        blk['scale_shift_table'] = _np(sd[f'{p}.scale_shift_table'])
    if f'{p}.cross_attn.to_q.weight' in sd:
        blk['cross_attn'] = _dit_cross_attn(sd, f'{p}.cross_attn')
    if f'{p}.attention_y_norm.weight' in sd:
        blk['attention_y_norm'] = {
            'scale': _np(sd[f'{p}.attention_y_norm.weight'])}
    if f'{p}.norm1.weight' in sd:      # rmsnorm variants carry scales
        blk['norm1'] = {'scale': _np(sd[f'{p}.norm1.weight'])}
        blk['norm2'] = {'scale': _np(sd[f'{p}.norm2.weight'])}
    return blk


def _caption_embedder(sd: Mapping, p: str, token_num: int = 77,
                      context_dim: int = 768) -> dict:
    """Reference CaptionEmbedder (timm Mlp ``y_proj.fc1/fc2``); the flax
    module also owns a ``y_embedding`` null-caption table the reference
    dropped — keep zeros so CFG-dropout falls back to the zero caption."""
    return {
        'fc1': linear(sd, f'{p}.y_proj.fc1'),
        'fc2': linear(sd, f'{p}.y_proj.fc2'),
        'y_embedding': np.zeros((token_num, context_dim), np.float32),
    }


def convert_dit_trilatent(sd: Mapping, depth: int, prefix: str = '',
                          variant: str = 'text') -> dict:
    """Reference ``DiT_TriLatent`` (t23d DiT-L/2, vit_blk=TextCondDiTBlock,
    ``guided_diffusion/script_util.py:408-415``) / PixArt / I23D variants →
    our ``DiT_TriLatent`` params.

    The flax blocks are ``nn.scan`` weight-stacked: per-block reference
    tensors stack along a leading depth axis.
    """
    p = prefix
    params: dict = {
        't_embedder': {'fc1': linear(sd, f'{p}t_embedder.mlp.0'),
                       'fc2': linear(sd, f'{p}t_embedder.mlp.2')},
        'x_embedder': {'proj': conv2d(sd, f'{p}x_embedder.proj')},
        'final_layer': {'linear': linear(sd, f'{p}final_layer.linear')},
        'blocks': {'block': _stack([
            _dit_block(sd, f'{p}blocks.{i}', variant)
            for i in range(depth)])},
    }
    if f'{p}final_layer.adaLN_modulation.1.weight' in sd:
        params['final_layer']['adaLN_modulation'] = linear(
            sd, f'{p}final_layer.adaLN_modulation.1')
    if f'{p}final_layer.scale_shift_table' in sd:
        params['final_layer']['scale_shift_table'] = _np(
            sd[f'{p}final_layer.scale_shift_table'])
    if f'{p}clip_text_proj.y_proj.fc1.weight' in sd:
        ctx = _np(sd[f'{p}clip_text_proj.y_proj.fc1.weight']).shape[1]
        params['clip_text_proj'] = _caption_embedder(
            sd, f'{p}clip_text_proj', context_dim=ctx)
    if f'{p}cap_embedder.0.weight' in sd:   # PixArt pooled-vector path
        params['cap_norm'] = layer_norm(sd, f'{p}cap_embedder.0')
        params['cap_proj'] = linear(sd, f'{p}cap_embedder.1')
    if f'{p}dino_proj.y_proj.fc1.weight' in sd:
        ctx = _np(sd[f'{p}dino_proj.y_proj.fc1.weight']).shape[1]
        params['dino_proj'] = _caption_embedder(sd, f'{p}dino_proj',
                                                context_dim=ctx)
    return params


def convert_dit2(sd: Mapping, depth: int, prefix: str = '') -> dict:
    """Reference ``DiT2`` VAE decoder backbone (``dit/dit_decoder.py``) →
    our ``DiT2`` params.  Blocks alternate within-plane (even) /
    cross-plane (odd); our scan stacks them as (within, across) pairs."""
    p = prefix
    within = [_dit_block(sd, f'{p}blocks.{i}', 'adaln')
              for i in range(0, depth, 2)]
    across = [_dit_block(sd, f'{p}blocks.{i}', 'adaln')
              for i in range(1, depth, 2)]
    return {
        'pos_embed': _np(sd[f'{p}pos_embed']),    # (1, n*L, D)
        'blocks': {'within': _stack(within), 'across': _stack(across)},
    }
