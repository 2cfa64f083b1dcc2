"""Structural tests for the LN3Diff-name converters: synthetic torch
state dicts with the reference's exact key naming must map onto our flax
trees (same structure + shapes) and run."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from ln3diff_tpu.conditioning.convert_ln3diff import (convert_osg_decoder,
                                                      convert_sd_decoder,
                                                      convert_sd_encoder)
from ln3diff_tpu.models.osg_decoder import OSGDecoder
from ln3diff_tpu.models.sd_vae import AutoencoderConfig, Decoder, Encoder

pytestmark = pytest.mark.slow


def _t(*shape):
    return torch.randn(*shape)


def make_reference_encoder_sd(ch=8, ch_mult=(1, 2), nrb=1, in_ch=10,
                              z=12, double_z=True):
    """Synthetic state dict with reference ``ldm`` Encoder naming."""
    sd = {}

    def conv(name, cin, cout, k=3):
        sd[f'{name}.weight'] = _t(cout, cin, k, k)
        sd[f'{name}.bias'] = _t(cout)

    def norm(name, c):
        sd[f'{name}.weight'] = _t(c)
        sd[f'{name}.bias'] = _t(c)

    def res(name, cin, cout):
        norm(f'{name}.norm1', cin)
        conv(f'{name}.conv1', cin, cout)
        norm(f'{name}.norm2', cout)
        conv(f'{name}.conv2', cout, cout)
        if cin != cout:
            conv(f'{name}.nin_shortcut', cin, cout, k=1)

    def attn(name, c):
        norm(f'{name}.norm', c)
        for qkv in ('q', 'k', 'v', 'proj_out'):
            conv(f'{name}.{qkv}', c, c, k=1)

    conv('conv_in', in_ch, ch)
    cin = ch
    for i, m in enumerate(ch_mult):
        cout = ch * m
        for j in range(nrb):
            res(f'down.{i}.block.{j}', cin, cout)
            cin = cout
        if i != len(ch_mult) - 1:
            conv(f'down.{i}.downsample.conv', cin, cin)
    res('mid.block_1', cin, cin)
    attn('mid.attn_1', cin)
    res('mid.block_2', cin, cin)
    norm('norm_out', cin)
    conv('conv_out', cin, 2 * z if double_z else z)
    return sd


def tree_shapes(t):
    return jax.tree_util.tree_map(lambda x: tuple(x.shape), t)


class TestSDEncoderConversion:

    def test_structure_matches_and_runs(self):
        cfg = AutoencoderConfig(ch=8, ch_mult=(1, 2), num_res_blocks=1,
                                resolution=32, z_channels=12)
        enc = Encoder(cfg)
        x = jnp.zeros((1, 32, 32, 10))
        ours = enc.init(jax.random.PRNGKey(0), x)['params']

        sd = make_reference_encoder_sd()
        converted = convert_sd_encoder(sd, ch_mult=(1, 2), num_res_blocks=1)

        assert tree_shapes(converted) == tree_shapes(ours), (
            'converted tree structure/shapes differ from model params')
        y = enc.apply({'params': jax.tree_util.tree_map(jnp.asarray,
                                                        converted)}, x)
        assert y.shape == (1, 16, 16, 24)
        assert np.isfinite(np.asarray(y)).all()


class TestOSGConversion:

    def test_equal_dense_numerics(self):
        """StyleGAN FC runtime scaling == EqualDense: converted weights
        must reproduce torch's x @ (w.T * 1/sqrt(in)) + b."""
        n_in, hidden = 32, 64
        sd = {
            'decoder.net.0.weight': _t(hidden, n_in),
            'decoder.net.0.bias': torch.zeros(hidden),
            'decoder.net.2.weight': _t(1 + 8, hidden),
            'decoder.net.2.bias': torch.zeros(1 + 8),
        }
        params = convert_osg_decoder(sd)
        dec = OSGDecoder(decoder_output_dim=8)
        feats = np.random.default_rng(0).standard_normal(
            (1, 3, 5, n_in)).astype(np.float32)
        rgb, sigma = dec.apply({'params': params}, jnp.asarray(feats))

        # torch oracle of the reference FullyConnectedLayer math
        x = torch.from_numpy(feats.mean(1))
        w0 = sd['decoder.net.0.weight'] / np.sqrt(n_in)
        h = torch.nn.functional.softplus(x @ w0.T)
        w1 = sd['decoder.net.2.weight'] / np.sqrt(hidden)
        out = h @ w1.T
        sigma_t = out[..., 0:1]
        rgb_t = torch.sigmoid(out[..., 1:]) * 1.002 - 0.001
        np.testing.assert_allclose(np.asarray(sigma), sigma_t.numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(rgb), rgb_t.numpy(),
                                   rtol=1e-4, atol=1e-5)
