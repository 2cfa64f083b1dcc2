"""FID InceptionV3 port (VERDICT #10): numeric parity of the quirky
primitives vs torch, converter key coverage, and protocol shapes."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from ln3diff_tpu.evaluation.inception import (
    BasicConv2d, InceptionA, InceptionConfig, InceptionV3,
    _avg_pool_nocountpad, convert_inception_state_dict, preprocess_uint8)


def _rand_sd(rng, spec):
    """Synthetic torch-layout state dict for BasicConv2d at prefix."""
    out = {}
    for prefix, (cin, cout, kh, kw) in spec.items():
        out[f'{prefix}.conv.weight'] = rng.standard_normal(
            (cout, cin, kh, kw)).astype(np.float32) * 0.1
        out[f'{prefix}.bn.weight'] = rng.uniform(
            0.5, 1.5, cout).astype(np.float32)
        out[f'{prefix}.bn.bias'] = rng.standard_normal(
            cout).astype(np.float32) * 0.1
        out[f'{prefix}.bn.running_mean'] = rng.standard_normal(
            cout).astype(np.float32) * 0.1
        out[f'{prefix}.bn.running_var'] = rng.uniform(
            0.5, 1.5, cout).astype(np.float32)
    return out


def _torch_basic_conv(sd, p, x_nchw, stride=1, padding=0):
    import torch
    import torch.nn.functional as F
    w = torch.from_numpy(sd[f'{p}.conv.weight'])
    x = F.conv2d(x_nchw, w, stride=stride, padding=padding)
    x = F.batch_norm(x, torch.from_numpy(sd[f'{p}.bn.running_mean']),
                     torch.from_numpy(sd[f'{p}.bn.running_var']),
                     torch.from_numpy(sd[f'{p}.bn.weight']),
                     torch.from_numpy(sd[f'{p}.bn.bias']),
                     training=False, eps=1e-3)
    return F.relu(x)


class TestInceptionParity:

    def test_basic_conv2d_matches_torch(self):
        import torch
        rng = np.random.default_rng(0)
        sd = _rand_sd(rng, {'c': (8, 16, 3, 3)})
        x = rng.standard_normal((2, 11, 11, 8)).astype(np.float32)

        mod = BasicConv2d(16, (3, 3), strides=(2, 2))
        from ln3diff_tpu.evaluation.inception import _conv_bn
        params = _conv_bn(sd, 'c')
        got = mod.apply({'params': params}, jnp.asarray(x))

        ref = _torch_basic_conv(sd, 'c',
                                torch.from_numpy(np.moveaxis(x, -1, 1)),
                                stride=2)
        np.testing.assert_allclose(
            np.asarray(got), np.moveaxis(ref.numpy(), 1, -1),
            rtol=1e-4, atol=1e-5)

    def test_avg_pool_count_include_pad_false(self):
        import torch
        import torch.nn.functional as F
        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 9, 9, 5)).astype(np.float32)
        got = _avg_pool_nocountpad(jnp.asarray(x))
        ref = F.avg_pool2d(torch.from_numpy(np.moveaxis(x, -1, 1)),
                           kernel_size=3, stride=1, padding=1,
                           count_include_pad=False)
        np.testing.assert_allclose(
            np.asarray(got), np.moveaxis(ref.numpy(), 1, -1),
            rtol=1e-5, atol=1e-6)

    def test_inception_a_matches_torch(self):
        """Full InceptionA with the FID pool quirk, shared weights."""
        import torch
        import torch.nn.functional as F
        rng = np.random.default_rng(2)
        cin, pf = 12, 6
        spec = {
            'm.branch1x1': (cin, 64, 1, 1),
            'm.branch5x5_1': (cin, 48, 1, 1),
            'm.branch5x5_2': (48, 64, 5, 5),
            'm.branch3x3dbl_1': (cin, 64, 1, 1),
            'm.branch3x3dbl_2': (64, 96, 3, 3),
            'm.branch3x3dbl_3': (96, 96, 3, 3),
            'm.branch_pool': (cin, pf, 1, 1),
        }
        sd = _rand_sd(rng, spec)
        x = rng.standard_normal((2, 13, 13, cin)).astype(np.float32)

        from ln3diff_tpu.evaluation.inception import _conv_bn
        params = {b.split('.', 1)[1]: _conv_bn(sd, b) for b in spec}
        got = InceptionA(pf).apply({'params': params}, jnp.asarray(x))

        xt = torch.from_numpy(np.moveaxis(x, -1, 1))
        b1 = _torch_basic_conv(sd, 'm.branch1x1', xt)
        b5 = _torch_basic_conv(sd, 'm.branch5x5_1', xt)
        b5 = _torch_basic_conv(sd, 'm.branch5x5_2', b5, padding=2)
        b3 = _torch_basic_conv(sd, 'm.branch3x3dbl_1', xt)
        b3 = _torch_basic_conv(sd, 'm.branch3x3dbl_2', b3, padding=1)
        b3 = _torch_basic_conv(sd, 'm.branch3x3dbl_3', b3, padding=1)
        bp = F.avg_pool2d(xt, 3, 1, 1, count_include_pad=False)
        bp = _torch_basic_conv(sd, 'm.branch_pool', bp)
        ref = torch.cat([b1, b5, b3, bp], dim=1)
        np.testing.assert_allclose(
            np.asarray(got), np.moveaxis(ref.numpy(), 1, -1),
            rtol=1e-4, atol=1e-5)


class TestInceptionProtocol:

    def test_full_net_shapes_and_converter_coverage(self):
        """Converter consumes a full torchvision-layout state dict; the
        net emits the reference protocol shapes (pool3 2048, logits 1008,
        sFID spatial 2023 = 7*17^2)."""
        from ln3diff_tpu.evaluation.inception import (_BLOCK_BRANCHES,
                                                      _LAYOUT)
        rng = np.random.default_rng(3)

        # derive conv shapes by tracing a shape-only torch-free walk:
        # init the flax model, then BUILD the torch state dict from its
        # param shapes (kernel (kh,kw,I,O) -> (O,I,kh,kw)).
        model = InceptionV3(InceptionConfig())
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 299, 299, 3)))['params']

        sd = {}
        for name, kind in _LAYOUT:
            branches = ([''] if kind is None
                        else list(_BLOCK_BRANCHES[kind]))
            for b in branches:
                tree = params[name][b] if b else params[name]
                prefix = f'{name}.{b}' if b else name
                k = np.asarray(tree['conv']['kernel'])
                sd[f'{prefix}.conv.weight'] = np.transpose(
                    rng.standard_normal(k.shape).astype(np.float32) * 0.05,
                    (3, 2, 0, 1))
                c = k.shape[-1]
                sd[f'{prefix}.bn.weight'] = np.ones(c, np.float32)
                sd[f'{prefix}.bn.bias'] = np.zeros(c, np.float32)
                sd[f'{prefix}.bn.running_mean'] = np.zeros(c, np.float32)
                sd[f'{prefix}.bn.running_var'] = np.ones(c, np.float32)
        sd['fc.weight'] = rng.standard_normal(
            (1008, 2048)).astype(np.float32) * 0.01
        sd['fc.bias'] = np.zeros(1008, np.float32)

        conv = convert_inception_state_dict(sd)
        # converted tree drops into the model
        chex_tree_shapes = jax.tree_util.tree_map(
            lambda a, b: np.shape(a) == np.shape(b), params, conv)
        assert all(jax.tree_util.tree_leaves(chex_tree_shapes))

        x = preprocess_uint8(jnp.asarray(
            rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)))
        out, inter = model.apply({'params': conv}, x,
                                 mutable=['intermediates'])
        assert out['pool3'].shape == (2, 2048)
        assert out['logits'].shape == (2, 1008)
        sp = inter['intermediates']['Mixed_6d']['branch1x1']['conv_out'][0]
        assert sp.shape[1:] == (17, 17, 192)
        assert sp[..., :7].reshape(2, -1).shape == (2, 2023)
        assert np.isfinite(np.asarray(out['pool3'])).all()

    def test_feature_fn_end_to_end_fid_zero(self):
        from ln3diff_tpu.evaluation.metrics import (compute_fid,
                                                    make_inception_feature_fn)
        rng = np.random.default_rng(4)
        imgs = rng.integers(0, 255, (8, 32, 32, 3), dtype=np.uint8)
        fn = make_inception_feature_fn(batch_size=4)
        pool3, logits, spatial = fn(imgs)
        assert pool3.shape == (8, 2048) and spatial.shape == (8, 2023)
        assert compute_fid(pool3, pool3) < 1e-4
