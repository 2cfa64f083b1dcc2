"""FID InceptionV3 feature extractor (pool3 + logits), TPU-native.

The reference evaluation protocol runs the classic TF1 InceptionV3 graph
(``evaluations/evaluator.py:20-66,573-633``: ``classify_image_graph_def.pb``,
pool3 2048-d activations + 1008-way logits) over npz sample batches.  This
module is a flax port of the numerically-equivalent "FID Inception"
network (the pytorch-fid ``pt_inception-2015-12-05`` layout, itself a
port of the same TF weights), so the released FID weights drop in via
:func:`convert_inception_state_dict` when provided — no TF dependency.

Quirks faithfully kept (these change FID if ignored):
  * BatchNorm eps 1e-3, no conv biases;
  * InceptionA/C/E(first) pool branches use 3x3 avg-pool with
    ``count_include_pad=False`` (edge pixels renormalized);
  * the LAST InceptionE uses a 3x3 stride-1 MAX pool in its pool branch;
  * the classifier has 1008 outputs (TF legacy background classes).

Input convention: (N, 299, 299, 3) channels-last in [-1, 1].
``pool3`` is pre-classifier 2048-d; ``logits``/``softmax`` feed the
Inception Score.  All convs run in the module dtype (bf16 on TPU) with
f32 batch-norm statistics.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class BasicConv2d(nn.Module):
    """conv(no bias) → BN(eps 1e-3, frozen inference stats) → relu."""
    features: int
    kernel: tuple
    strides: tuple = (1, 1)
    padding: Any = (0, 0)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = (pad, pad)
        if isinstance(pad, tuple) and len(pad) == 2 \
                and all(isinstance(p, int) for p in pad):
            pad = [(pad[0], pad[0]), (pad[1], pad[1])]
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=pad, use_bias=False, dtype=self.dtype,
                    name='conv')(x)
        # raw conv output (pre-BN) — the reference sFID taps the TF
        # graph's ``mixed_6/conv:0`` tensor (evaluator.py:24); a no-op
        # unless the caller requests the 'intermediates' collection.
        self.sow('intermediates', 'conv_out', x)
        # inference-only BN: running stats are parameters (converted from
        # the released checkpoint); fold into scale/shift in f32.
        shape = (self.features,)
        mean = self.param('bn_mean', nn.initializers.zeros, shape)
        var = self.param('bn_var', nn.initializers.ones, shape)
        gamma = self.param('bn_scale', nn.initializers.ones, shape)
        beta = self.param('bn_bias', nn.initializers.zeros, shape)
        inv = jax.lax.rsqrt(var + 1e-3) * gamma
        x = x.astype(jnp.float32) * inv + (beta - mean * inv)
        return nn.relu(x).astype(self.dtype)


def _avg_pool_nocountpad(x, window=3, stride=1, pad=1):
    """torch ``avg_pool2d(count_include_pad=False)``: the divisor is the
    number of IN-BOUNDS taps per window, not window²."""
    summed = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add,
        (1, window, window, 1), (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])
    ones = jnp.ones(x.shape[:3] + (1,), jnp.float32)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add,
        (1, window, window, 1), (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])
    return (summed / counts).astype(x.dtype)


def _max_pool(x, window=3, stride=2, pad=0):
    return jax.lax.reduce_window(
        x, -jnp.inf if x.dtype == jnp.float32 else jnp.finfo(x.dtype).min,
        jax.lax.max, (1, window, window, 1), (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b1 = BasicConv2d(64, (1, 1), dtype=d, name='branch1x1')(x)
        b5 = BasicConv2d(48, (1, 1), dtype=d, name='branch5x5_1')(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, dtype=d,
                         name='branch5x5_2')(b5)
        b3 = BasicConv2d(64, (1, 1), dtype=d, name='branch3x3dbl_1')(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, dtype=d,
                         name='branch3x3dbl_2')(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, dtype=d,
                         name='branch3x3dbl_3')(b3)
        bp = _avg_pool_nocountpad(x)
        bp = BasicConv2d(self.pool_features, (1, 1), dtype=d,
                         name='branch_pool')(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), dtype=d,
                         name='branch3x3')(x)
        bd = BasicConv2d(64, (1, 1), dtype=d, name='branch3x3dbl_1')(x)
        bd = BasicConv2d(96, (3, 3), padding=1, dtype=d,
                         name='branch3x3dbl_2')(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), dtype=d,
                         name='branch3x3dbl_3')(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d, c7 = self.dtype, self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), dtype=d, name='branch1x1')(x)
        b7 = BasicConv2d(c7, (1, 1), dtype=d, name='branch7x7_1')(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=d,
                         name='branch7x7_2')(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=d,
                         name='branch7x7_3')(b7)
        bd = BasicConv2d(c7, (1, 1), dtype=d, name='branch7x7dbl_1')(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=d,
                         name='branch7x7dbl_2')(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=d,
                         name='branch7x7dbl_3')(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=d,
                         name='branch7x7dbl_4')(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=d,
                         name='branch7x7dbl_5')(bd)
        bp = _avg_pool_nocountpad(x)
        bp = BasicConv2d(192, (1, 1), dtype=d, name='branch_pool')(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b3 = BasicConv2d(192, (1, 1), dtype=d, name='branch3x3_1')(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), dtype=d,
                         name='branch3x3_2')(b3)
        b7 = BasicConv2d(192, (1, 1), dtype=d, name='branch7x7x3_1')(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=d,
                         name='branch7x7x3_2')(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=d,
                         name='branch7x7x3_3')(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), dtype=d,
                         name='branch7x7x3_4')(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    """``pool='avg'`` (first E block, count_include_pad=False) or
    ``pool='max'`` (the last block — the FID network's documented
    deviation from torchvision)."""
    pool: str = 'avg'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b1 = BasicConv2d(320, (1, 1), dtype=d, name='branch1x1')(x)
        b3 = BasicConv2d(384, (1, 1), dtype=d, name='branch3x3_1')(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), dtype=d,
                          name='branch3x3_2a')(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), dtype=d,
                          name='branch3x3_2b')(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), dtype=d, name='branch3x3dbl_1')(x)
        bd = BasicConv2d(384, (3, 3), padding=1, dtype=d,
                         name='branch3x3dbl_2')(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), dtype=d,
                          name='branch3x3dbl_3a')(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), dtype=d,
                          name='branch3x3dbl_3b')(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool == 'max':
            bp = _max_pool(x, 3, 1, pad=1)
        else:
            bp = _avg_pool_nocountpad(x)
        bp = BasicConv2d(192, (1, 1), dtype=d, name='branch_pool')(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


@dataclasses.dataclass(frozen=True)
class InceptionConfig:
    num_classes: int = 1008        # TF-legacy class count (FID weights)
    dtype: Any = jnp.float32


class InceptionV3(nn.Module):
    """Returns dict(pool3 (N, 2048) f32, logits (N, num_classes) f32)."""
    cfg: InceptionConfig = InceptionConfig()

    @nn.compact
    def __call__(self, x):
        d = self.cfg.dtype
        x = x.astype(d)
        x = BasicConv2d(32, (3, 3), strides=(2, 2), dtype=d,
                        name='Conv2d_1a_3x3')(x)
        x = BasicConv2d(32, (3, 3), dtype=d, name='Conv2d_2a_3x3')(x)
        x = BasicConv2d(64, (3, 3), padding=1, dtype=d,
                        name='Conv2d_2b_3x3')(x)
        x = _max_pool(x, 3, 2)
        x = BasicConv2d(80, (1, 1), dtype=d, name='Conv2d_3b_1x1')(x)
        x = BasicConv2d(192, (3, 3), dtype=d, name='Conv2d_4a_3x3')(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, dtype=d, name='Mixed_5b')(x)
        x = InceptionA(64, dtype=d, name='Mixed_5c')(x)
        x = InceptionA(64, dtype=d, name='Mixed_5d')(x)
        x = InceptionB(dtype=d, name='Mixed_6a')(x)
        x = InceptionC(128, dtype=d, name='Mixed_6b')(x)
        x = InceptionC(160, dtype=d, name='Mixed_6c')(x)
        x = InceptionC(160, dtype=d, name='Mixed_6d')(x)
        x = InceptionC(192, dtype=d, name='Mixed_6e')(x)
        x = InceptionD(dtype=d, name='Mixed_7a')(x)
        x = InceptionE('avg', dtype=d, name='Mixed_7b')(x)
        x = InceptionE('max', dtype=d, name='Mixed_7c')(x)
        pool3 = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # (N, 2048)
        logits = nn.Dense(self.cfg.num_classes, dtype=jnp.float32,
                          name='fc')(pool3)
        return {'pool3': pool3, 'logits': logits}


# ---------------------------------------------------------------------------
# torch (pytorch-fid / torchvision layout) → flax converter
# ---------------------------------------------------------------------------

def _conv_bn(sd: Mapping, p: str) -> dict:
    """One BasicConv2d: ``{p}.conv.weight`` (O,I,kh,kw) + bn stats."""
    w = np.asarray(sd[f'{p}.conv.weight'])
    return {
        'conv': {'kernel': np.transpose(w, (2, 3, 1, 0))},
        'bn_scale': np.asarray(sd[f'{p}.bn.weight']),
        'bn_bias': np.asarray(sd[f'{p}.bn.bias']),
        'bn_mean': np.asarray(sd[f'{p}.bn.running_mean']),
        'bn_var': np.asarray(sd[f'{p}.bn.running_var']),
    }


_BLOCK_BRANCHES = {
    'InceptionA': ('branch1x1', 'branch5x5_1', 'branch5x5_2',
                   'branch3x3dbl_1', 'branch3x3dbl_2', 'branch3x3dbl_3',
                   'branch_pool'),
    'InceptionB': ('branch3x3', 'branch3x3dbl_1', 'branch3x3dbl_2',
                   'branch3x3dbl_3'),
    'InceptionC': ('branch1x1', 'branch7x7_1', 'branch7x7_2', 'branch7x7_3',
                   'branch7x7dbl_1', 'branch7x7dbl_2', 'branch7x7dbl_3',
                   'branch7x7dbl_4', 'branch7x7dbl_5', 'branch_pool'),
    'InceptionD': ('branch3x3_1', 'branch3x3_2', 'branch7x7x3_1',
                   'branch7x7x3_2', 'branch7x7x3_3', 'branch7x7x3_4'),
    'InceptionE': ('branch1x1', 'branch3x3_1', 'branch3x3_2a',
                   'branch3x3_2b', 'branch3x3dbl_1', 'branch3x3dbl_2',
                   'branch3x3dbl_3a', 'branch3x3dbl_3b', 'branch_pool'),
}

_LAYOUT: Sequence[tuple] = (
    ('Conv2d_1a_3x3', None), ('Conv2d_2a_3x3', None),
    ('Conv2d_2b_3x3', None), ('Conv2d_3b_1x1', None),
    ('Conv2d_4a_3x3', None),
    ('Mixed_5b', 'InceptionA'), ('Mixed_5c', 'InceptionA'),
    ('Mixed_5d', 'InceptionA'), ('Mixed_6a', 'InceptionB'),
    ('Mixed_6b', 'InceptionC'), ('Mixed_6c', 'InceptionC'),
    ('Mixed_6d', 'InceptionC'), ('Mixed_6e', 'InceptionC'),
    ('Mixed_7a', 'InceptionD'), ('Mixed_7b', 'InceptionE'),
    ('Mixed_7c', 'InceptionE'),
)


def convert_inception_state_dict(sd: Mapping) -> dict:
    """pytorch-fid / torchvision ``Inception3`` state dict → flax params.

    Accepts the released FID weights (``pt_inception-2015-12-05``) or any
    torchvision-layout checkpoint; auxiliary-classifier keys (``AuxLogits.*``)
    are ignored, matching the inference graph.
    """
    params: dict = {}
    for name, kind in _LAYOUT:
        if kind is None:
            params[name] = _conv_bn(sd, name)
        else:
            params[name] = {b: _conv_bn(sd, f'{name}.{b}')
                            for b in _BLOCK_BRANCHES[kind]}
    params['fc'] = {
        'kernel': np.transpose(np.asarray(sd['fc.weight']), (1, 0)),
        'bias': np.asarray(sd['fc.bias']),
    }
    return params


def preprocess_uint8(images: jax.Array, size: int = 299) -> jax.Array:
    """uint8 (N, H, W, 3) → bilinear-resized [-1, 1] float input
    (reference feeds raw uint8 batches to the TF graph, which scales
    internally; pytorch-fid uses the same bilinear-to-299 + scale)."""
    x = images.astype(jnp.float32)
    if images.shape[1] != size or images.shape[2] != size:
        x = jax.image.resize(
            x, (images.shape[0], size, size, 3), 'bilinear')
    return x / 127.5 - 1.0
