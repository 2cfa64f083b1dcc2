"""torch → JAX weight conversion.

The reference releases ``.pt``/``.safetensors`` checkpoints (joint
DDPM+VAE, EMA variants — ``guided_diffusion/train_util.py:413-440``,
``shell_scripts/.../sample_obajverse_t23d_dit.sh:70``) and wraps HF CLIP /
DINOv2 towers.  This module maps torch state_dicts onto our flax pytrees:

  * generic rules: Linear (transpose), Conv2d (OIHW→HWIO), Embedding,
    Norm scales;
  * named mappers for the HF CLIP text/vision towers (exact parity —
    tested against randomly-initialized HF models so no download is
    needed to prove correctness).

Torch runs CPU-side only; nothing here touches the TPU path.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(t):
    import torch
    if isinstance(t, torch.Tensor):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def linear(sd: Mapping, prefix: str) -> dict:
    out = {'kernel': _np(sd[f'{prefix}.weight']).T}
    if f'{prefix}.bias' in sd:
        out['bias'] = _np(sd[f'{prefix}.bias'])
    return out


def conv2d(sd: Mapping, prefix: str) -> dict:
    # torch OIHW → flax HWIO
    out = {'kernel': _np(sd[f'{prefix}.weight']).transpose(2, 3, 1, 0)}
    if f'{prefix}.bias' in sd:
        out['bias'] = _np(sd[f'{prefix}.bias'])
    return out


def layer_norm(sd: Mapping, prefix: str) -> dict:
    return {'scale': _np(sd[f'{prefix}.weight']),
            'bias': _np(sd[f'{prefix}.bias'])}


def group_norm(sd: Mapping, prefix: str) -> dict:
    return layer_norm(sd, prefix)


def embedding(sd: Mapping, prefix: str) -> dict:
    return {'embedding': _np(sd[f'{prefix}.weight'])}


# -- HF CLIP text tower ----------------------------------------------------

def convert_hf_clip_text(state_dict: Mapping, num_layers: int = 12) -> dict:
    """HF ``CLIPTextModel.state_dict()`` → our ``CLIPTextModel`` params."""
    sd = state_dict
    base = 'text_model.'
    if not any(k.startswith(base) for k in sd):
        base = ''
    params: dict = {
        'token_embedding': embedding(
            sd, f'{base}embeddings.token_embedding'),
        'position_embedding': _np(
            sd[f'{base}embeddings.position_embedding.weight']),
        'final_layer_norm': layer_norm(sd, f'{base}final_layer_norm'),
    }
    for i in range(num_layers):
        lp = f'{base}encoder.layers.{i}'
        params[f'layers_{i}'] = {
            'layer_norm1': layer_norm(sd, f'{lp}.layer_norm1'),
            'layer_norm2': layer_norm(sd, f'{lp}.layer_norm2'),
            'self_attn': {
                'q_proj': linear(sd, f'{lp}.self_attn.q_proj'),
                'k_proj': linear(sd, f'{lp}.self_attn.k_proj'),
                'v_proj': linear(sd, f'{lp}.self_attn.v_proj'),
                'out_proj': linear(sd, f'{lp}.self_attn.out_proj'),
            },
            'mlp': {
                'fc1': linear(sd, f'{lp}.mlp.fc1'),
                'fc2': linear(sd, f'{lp}.mlp.fc2'),
            },
        }
    # CLIPTextModelWithProjection / OpenAI encode_text head (bias-free)
    if 'text_projection.weight' in sd:
        params['text_projection'] = {
            'kernel': _np(sd['text_projection.weight']).T}
    return params


def convert_hf_clip_vision(state_dict: Mapping, num_layers: int = 24) -> dict:
    """HF ``CLIPVisionModel.state_dict()`` → our ``CLIPVisionModel``."""
    sd = state_dict
    base = 'vision_model.'
    if not any(k.startswith(base) for k in sd):
        base = ''
    params: dict = {
        'patch_embedding': {
            'kernel': _np(sd[f'{base}embeddings.patch_embedding.weight'])
            .transpose(2, 3, 1, 0)},
        'class_embedding': _np(sd[f'{base}embeddings.class_embedding']),
        'position_embedding': _np(
            sd[f'{base}embeddings.position_embedding.weight']),
        'pre_layrnorm': layer_norm(sd, f'{base}pre_layrnorm'),
        'post_layernorm': layer_norm(sd, f'{base}post_layernorm'),
    }
    for i in range(num_layers):
        lp = f'{base}encoder.layers.{i}'
        params[f'layers_{i}'] = {
            'layer_norm1': layer_norm(sd, f'{lp}.layer_norm1'),
            'layer_norm2': layer_norm(sd, f'{lp}.layer_norm2'),
            'self_attn': {
                'q_proj': linear(sd, f'{lp}.self_attn.q_proj'),
                'k_proj': linear(sd, f'{lp}.self_attn.k_proj'),
                'v_proj': linear(sd, f'{lp}.self_attn.v_proj'),
                'out_proj': linear(sd, f'{lp}.self_attn.out_proj'),
            },
            'mlp': {
                'fc1': linear(sd, f'{lp}.mlp.fc1'),
                'fc2': linear(sd, f'{lp}.mlp.fc2'),
            },
        }
    return params


def convert_hf_dinov2(state_dict: Mapping, depth: int) -> dict:
    """HF ``Dinov2Model.state_dict()`` → our scan-stacked
    ``VisionTransformer`` params (DINOv2 flavor: layerscale + erf-gelu).

    Our ViT scans one weight-stacked block (leaves carry a leading
    ``depth`` axis), so per-layer HF tensors are stacked rather than
    stored as ``layers_i`` subtrees.
    """
    import numpy as np

    sd = state_dict
    base = 'dinov2.' if any(k.startswith('dinov2.') for k in sd) else ''

    def lin_qkv(i):
        ap = f'{base}encoder.layer.{i}.attention.attention'
        kq = _np(sd[f'{ap}.query.weight']).T
        kk = _np(sd[f'{ap}.key.weight']).T
        kv = _np(sd[f'{ap}.value.weight']).T
        bq = _np(sd[f'{ap}.query.bias'])
        bk = _np(sd[f'{ap}.key.bias'])
        bv = _np(sd[f'{ap}.value.bias'])
        return (np.concatenate([kq, kk, kv], axis=1),
                np.concatenate([bq, bk, bv], axis=0))

    def stack(fn):
        outs = [fn(i) for i in range(depth)]
        return np.stack(outs)

    block = {
        'norm1': {
            'scale': stack(lambda i: _np(
                sd[f'{base}encoder.layer.{i}.norm1.weight'])),
            'bias': stack(lambda i: _np(
                sd[f'{base}encoder.layer.{i}.norm1.bias']))},
        'norm2': {
            'scale': stack(lambda i: _np(
                sd[f'{base}encoder.layer.{i}.norm2.weight'])),
            'bias': stack(lambda i: _np(
                sd[f'{base}encoder.layer.{i}.norm2.bias']))},
        'gamma1': stack(lambda i: _np(
            sd[f'{base}encoder.layer.{i}.layer_scale1.lambda1'])),
        'gamma2': stack(lambda i: _np(
            sd[f'{base}encoder.layer.{i}.layer_scale2.lambda1'])),
        'attn': {
            'qkv': {
                'kernel': stack(lambda i: lin_qkv(i)[0]),
                'bias': stack(lambda i: lin_qkv(i)[1])},
            'proj': {
                'kernel': stack(lambda i: _np(sd[
                    f'{base}encoder.layer.{i}.attention.output.dense.weight'
                ]).T),
                'bias': stack(lambda i: _np(sd[
                    f'{base}encoder.layer.{i}.attention.output.dense.bias'
                ]))},
        },
        'mlp': {
            'fc1': {
                'kernel': stack(lambda i: _np(
                    sd[f'{base}encoder.layer.{i}.mlp.fc1.weight']).T),
                'bias': stack(lambda i: _np(
                    sd[f'{base}encoder.layer.{i}.mlp.fc1.bias']))},
            'fc2': {
                'kernel': stack(lambda i: _np(
                    sd[f'{base}encoder.layer.{i}.mlp.fc2.weight']).T),
                'bias': stack(lambda i: _np(
                    sd[f'{base}encoder.layer.{i}.mlp.fc2.bias']))},
        },
    }
    return {
        'patch_embed': {
            'kernel': _np(sd[
                f'{base}embeddings.patch_embeddings.projection.weight'
            ]).transpose(2, 3, 1, 0),
            'bias': _np(sd[
                f'{base}embeddings.patch_embeddings.projection.bias'])},
        'cls_token': _np(sd[f'{base}embeddings.cls_token']),
        'pos_embed': _np(sd[f'{base}embeddings.position_embeddings']),
        'blocks': {'block': block},
        'norm': {'scale': _np(sd[f'{base}layernorm.weight']),
                 'bias': _np(sd[f'{base}layernorm.bias'])},
    }


def load_torch_checkpoint(path: str) -> dict:
    """Load a ``.pt`` / ``.safetensors`` state_dict on CPU."""
    if path.endswith('.safetensors'):
        from safetensors.torch import load_file
        return load_file(path)
    import torch
    obj = torch.load(path, map_location='cpu', weights_only=False)
    if isinstance(obj, dict) and 'state_dict' in obj:
        return obj['state_dict']
    return obj


def split_joint_checkpoint(sd: Mapping) -> dict:
    """Split the reference's joint ``model_joint_denoise_rec_model`` dict
    into submodule state_dicts by name prefix (reference
    ``fp16_util.py:299-303`` loads submodules the same way)."""
    out: dict[str, dict] = {}
    for k, v in sd.items():
        head, _, rest = k.partition('.')
        out.setdefault(head, {})[rest] = v
    return out
