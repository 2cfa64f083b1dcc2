"""scripts/convert_checkpoint.py plumbing (the converters themselves are
numerically parity-tested in test_convert_ln3diff.py / test_ref_parity*)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/repo/scripts')
import convert_checkpoint as cc  # noqa: E402

pytestmark = pytest.mark.slow


class TestFlat:

    def test_nested(self):
        tree = {'a': {'b': np.zeros((2,)), 'c': {'d': np.ones((1, 3))}}}
        flat = cc._flat(tree)
        assert set(flat) == {'a/b', 'a/c/d'}
        assert flat['a/c/d'].shape == (1, 3)


class TestVerifyTree:

    def test_match(self, capsys):
        t = {'x': {'kernel': np.zeros((4, 8))}}
        assert cc.verify_tree(t, t, 'm') == 0

    def test_mismatches(self, capsys):
        got = {'x': {'kernel': np.zeros((4, 8))},
               'extra': np.zeros(1),
               '_w_avg': np.zeros(3)}        # stats leaves are skipped
        want = {'x': {'kernel': np.zeros((8, 4))},
                'missing': np.zeros(2)}
        n = cc.verify_tree(got, want, 'm')
        out = capsys.readouterr().out
        assert n == 3
        assert 'EXTRA' in out and 'MISSING' in out and 'SHAPE' in out


class TestCLI:

    def test_unknown_kind_raises(self):
        with pytest.raises(SystemExit):
            cc.convert('nope', {}, None)

    def test_main_writes_and_verifies(self, tmp_path, monkeypatch):
        import torch
        sd = {'w': torch.zeros(3, 2)}
        torch.save(sd, tmp_path / 'ref.pt')

        tree = {'denoiser': {'layer': {'kernel': np.ones((2, 3))}},
                'vae': {'enc': {'bias': np.zeros((5,))}},
                'mixing_logit': np.zeros((1, 12, 1, 1))}
        monkeypatch.setattr(cc, 'convert', lambda kind, sd_, args: tree)
        monkeypatch.setattr(
            cc, '_init_params',
            lambda kind, which, args: tree[which])
        monkeypatch.setattr(sys, 'argv', [
            'convert_checkpoint.py', '--src', str(tmp_path / 'ref.pt'),
            '--kind', 'joint-objaverse', '--outdir',
            str(tmp_path / 'out'), '--verify'])
        cc.main()

        from ln3diff_tpu.training.checkpoint import load_numpy_checkpoint
        den = load_numpy_checkpoint(str(tmp_path / 'out' / 'denoiser.npz'),
                                    tree['denoiser'])
        assert den['layer']['kernel'].shape == (2, 3)
        assert np.load(tmp_path / 'out' / 'mixing_logit.npy').shape == \
            (1, 12, 1, 1)

    def test_main_verify_failure_exits(self, tmp_path, monkeypatch):
        import torch
        torch.save({'w': torch.zeros(1)}, tmp_path / 'ref.pt')
        tree = {'vae': {'enc': {'bias': np.zeros((5,))}}}
        monkeypatch.setattr(cc, 'convert', lambda kind, sd_, args: tree)
        monkeypatch.setattr(
            cc, '_init_params',
            lambda kind, which, args: {'enc': {'bias': np.zeros((6,))}})
        monkeypatch.setattr(sys, 'argv', [
            'convert_checkpoint.py', '--src', str(tmp_path / 'ref.pt'),
            '--kind', 'vae-objaverse', '--outdir', str(tmp_path / 'out'),
            '--verify'])
        with pytest.raises(SystemExit):
            cc.main()


class TestInitParams:
    """The release-size model trees materialize as shapes only
    (eval_shape) — cheap enough to exercise for the denoiser kinds."""

    def test_release_vae_trees_all_kinds(self):
        # regression: vae_preset('shapenet'/'ffhq') under the default
        # bf16 dtype used to fail init — the f32 DINOv2 layerscale gains
        # promoted the scan carry to f32 (carry dtype mismatch)
        class A:
            dit_depth = 24
            dit2_depth = 24
            denoiser_variant = 'text'
            fusion_depth = 6
            encoder_depth = 12
        for kind in ('vae-objaverse', 'vae-shapenet', 'vae-ffhq'):
            flat = cc._flat(cc._init_params(kind, 'vae', A))
            assert len(flat) > 100, kind

    def test_denoiser_objaverse_tree(self):
        class A:
            dit_depth = 24
            dit2_depth = 24
            denoiser_variant = 'text'
        flat = cc._flat(cc._init_params('joint-objaverse', 'denoiser', A))
        # scan-stacked blocks: some leaf carries the depth-24 axis
        assert any(24 in tuple(leaf.shape) for leaf in flat.values())
        assert flat  # non-empty tree
