"""LPIPS perceptual distance in JAX (VGG16 backbone + linear heads).

The reference trains the VAE with the ``lpips`` pip package (pretrained
VGG16, ``nsr/losses/builder.py`` lpips term).  Here the VGG16 feature
extractor and per-layer linear heads are implemented in flax;
``convert_lpips_torch`` maps the torch ``lpips.LPIPS(net='vgg')``
state_dict onto them (verified structurally — actual weights require the
package/checkpoint, absent in zero-egress environments, in which case a
random-init perceptual net still provides a useful structural-similarity
signal for from-scratch training).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (channels, num convs) per stage; features tapped after
# the last ReLU of each stage (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3).
_VGG_PLAN = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = []
        conv_idx = 0
        for stage, (ch, n_convs) in enumerate(_VGG_PLAN):
            for i in range(n_convs):
                x = nn.Conv(ch, (3, 3), dtype=self.dtype,
                            name=f'conv{conv_idx}')(x)
                x = nn.relu(x)
                conv_idx += 1
            feats.append(x)
            if stage < len(_VGG_PLAN) - 1:
                x = nn.max_pool(x, (2, 2), (2, 2))
        return feats


class LPIPS(nn.Module):
    """lpips.LPIPS(net='vgg', spatial=False) equivalent."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img0, img1):
        """img0/img1: (B, H, W, 3) in [-1, 1]. Returns (B,) distances."""
        def normalize_input(x):
            return (x - _SHIFT) / _SCALE

        vgg = VGG16Features(dtype=self.dtype, name='vgg')
        f0 = vgg(normalize_input(img0))
        f1 = vgg(normalize_input(img1))

        total = 0.0
        for i, (a, b) in enumerate(zip(f0, f1)):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
            diff = (a - b)**2
            w = self.param(f'lin{i}', nn.initializers.ones,
                           (1, 1, 1, diff.shape[-1]))
            # lpips heads are 1x1 convs with non-negative weights
            d = jnp.sum(jnp.abs(w) * diff, axis=-1, keepdims=True)
            total = total + jnp.mean(d, axis=(1, 2, 3))
        return total


def convert_lpips_torch(state_dict) -> dict:
    """Map ``lpips.LPIPS(net='vgg')`` torch weights onto our params.

    torch keys: ``net.slice{s}.{idx}.weight`` (VGG convs, OIHW) and
    ``lin{i}.model.1.weight`` (1x1 heads, (1, C, 1, 1))."""
    import torch

    def np_(t):
        return t.detach().cpu().numpy()

    params: dict = {'vgg': {}}
    # vgg convs appear in order within the flattened feature stack
    conv_keys = [k for k in state_dict
                 if k.startswith('net.') and k.endswith('.weight')
                 and state_dict[k].ndim == 4]
    conv_keys.sort(key=lambda k: [int(s) for s in k.split('.')
                                  if s.isdigit()])
    for i, k in enumerate(conv_keys):
        b = k.replace('.weight', '.bias')
        params['vgg'][f'conv{i}'] = {
            'kernel': np_(state_dict[k]).transpose(2, 3, 1, 0),
            'bias': np_(state_dict[b]),
        }
    for i in range(5):
        k = f'lin{i}.model.1.weight'
        if k in state_dict:
            params[f'lin{i}'] = np_(state_dict[k]).reshape(1, 1, 1, -1)
    return params


def make_lpips_fn(params=None, dtype=jnp.float32):
    """Returns ``lpips(img0, img1) -> scalar`` usable as the trainer's
    ``lpips_fn`` hook. Random-init when no converted params given."""
    model = LPIPS(dtype=dtype)
    if params is None:
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 32, 32, 3)),
                            jnp.zeros((1, 32, 32, 3)))['params']

    def fn(img0, img1):
        return model.apply({'params': params}, img0, img1).mean()

    return fn
