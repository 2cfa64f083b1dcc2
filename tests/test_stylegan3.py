"""StyleGAN3 alias-free generator: shape/finiteness and numeric parity
against the reference ``nsr/networks_stylegan3.py`` on CPU (the CUDA
``filtered_lrelu``/``conv2d_gradfix`` ops fall back to their ``ref``
paths without a GPU)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
import ref_compat

import jax
import jax.numpy as jnp

from ln3diff_tpu.models.stylegan3 import (GeneratorSG3,
                                          SynthesisNetworkSG3,
                                          design_lowpass_filter)

pytestmark = pytest.mark.slow

TINY = dict(w_dim=32, img_resolution=32, img_channels=3,
            channel_base=1024, channel_max=32, num_layers=6,
            num_critical=2)


class TestSG3Standalone:

    def test_generator_shapes(self):
        g = GeneratorSG3(z_dim=32, w_dim=32, img_resolution=32,
                         img_channels=3, num_layers=6,
                         channel_base=1024, channel_max=32)
        z = jax.random.normal(jax.random.PRNGKey(0), (2, 32))
        vars_ = g.init(jax.random.PRNGKey(1), z)
        out = g.apply(vars_, z)
        assert out.shape == (2, 32, 32, 3)
        assert bool(jnp.isfinite(out).all())

    def test_filter_design_normalized(self):
        f = design_lowpass_filter(12, cutoff=4.0, width=4.0, fs=32.0)
        assert f.ndim == 1 and f.shape[0] == 12
        np.testing.assert_allclose(f.sum(), 1.0, atol=1e-6)
        fr = design_lowpass_filter(12, 4.0, 4.0, 32.0, radial=True)
        assert fr.ndim == 2 and fr.shape == (12, 12)
        np.testing.assert_allclose(fr.sum(), 1.0, atol=1e-5)
        assert design_lowpass_filter(1, 4.0, 4.0, 32.0) is None

    def test_translation_equivariance(self):
        """The alias-free property: a +t_x translation in the ``input.
        transform`` buffer shifts the output by -t_x·resolution pixels
        with near-exact interior agreement (the paper's EQ-T metric,
        here at integer shift so roll-compare is exact)."""
        net = SynthesisNetworkSG3(**TINY)
        ws = jax.random.normal(jax.random.PRNGKey(0), (1, net.num_ws, 32))
        v = net.init(jax.random.PRNGKey(1), ws)
        base = np.asarray(net.apply(v, ws))[0]

        T = jnp.array([[1., 0., 4 / 32], [0., 1., 0.], [0., 0., 1.]])
        stats = {**v['stats'],
                 'input': {**v['stats']['input'], 'transform': T}}
        out = np.asarray(net.apply(
            {'params': v['params'], 'stats': stats}, ws))[0]
        rolled = np.roll(base, -4, axis=1)
        err = (np.abs(out[:, 8:-8] - rolled[:, 8:-8]).max()
               / (np.abs(base).max() + 1e-9))
        assert err < 1e-4

    def test_magnitude_ema_updates(self):
        net = SynthesisNetworkSG3(**TINY)
        ws = jax.random.normal(jax.random.PRNGKey(0), (1, net.num_ws, 32))
        vars_ = net.init(jax.random.PRNGKey(1), ws)
        _, updated = net.apply(vars_, ws * 5.0, update_emas=True,
                               mutable=['stats'])
        ema0 = vars_['stats']['L0_36_32']['magnitude_ema']
        ema1 = updated['stats']['L0_36_32']['magnitude_ema']
        assert not np.allclose(np.asarray(ema0), np.asarray(ema1))


@pytest.mark.skipif(not ref_compat.reference_available(),
                    reason='reference repo not present')
class TestSG3RefParity:

    def test_synthesis_network_parity(self):
        import torch
        torch.manual_seed(0)
        from nsr.networks_stylegan3 import SynthesisNetwork as RefNet

        ref = RefNet(**TINY).eval()
        with torch.no_grad():
            for p in ref.parameters():
                p.copy_(torch.randn_like(p) * 0.1)
        sd = ref.state_dict()

        ws = torch.randn(2, ref.num_ws, 32)
        with torch.no_grad():
            ref_out = ref(ws).numpy()          # (B, 3, H, W)

        from ln3diff_tpu.conditioning.convert_ln3diff import \
            convert_stylegan3_synthesis
        params, stats = convert_stylegan3_synthesis(sd)

        ours = SynthesisNetworkSG3(**TINY)
        ws_j = jnp.asarray(ws.numpy())
        init_vars = ours.init(jax.random.PRNGKey(0), ws_j)
        jax.tree_util.tree_map(lambda a, b: None, init_vars['params'],
                               params)        # structure must match
        got = ours.apply({'params': params, 'stats': stats}, ws_j)
        got = np.transpose(np.asarray(got), (0, 3, 1, 2))
        np.testing.assert_allclose(got, ref_out, rtol=2e-3, atol=2e-4)
