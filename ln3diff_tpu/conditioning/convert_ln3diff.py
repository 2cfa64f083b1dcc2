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
