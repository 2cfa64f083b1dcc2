"""Legacy persistence-pickle extractor round-trip: pickles written by
the REFERENCE's own ``persistent_class`` decorator
(``utils/torch_utils/persistence.py:37``) must extract to the exact
``state_dict()`` arrays — without executing any pickled source."""

import pickle
import sys

import numpy as np
import pytest

import ref_compat

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not ref_compat.reference_available(),
                                 reason='/root/reference unavailable')]


def _make_reference_pickle(tmp_path):
    """Build a small torch net decorated with the reference's persistence
    decorator (see ``_legacy_pkl_net``), and pickle it the way the
    reference's training loop does."""
    import torch

    from _legacy_pkl_net import Net

    torch.manual_seed(0)
    net = Net(6)
    path = tmp_path / 'net.pkl'
    with open(path, 'wb') as f:
        pickle.dump({'G_ema': net, 'G': None, 'D': None,
                     'training_set_kwargs': {'resolution': 64}}, f)
    return path, net


class TestLegacyPklExtractor:

    def test_roundtrip_matches_state_dict(self, tmp_path):
        from ln3diff_tpu.utils.legacy_pkl import legacy_pkl_to_npz
        path, net = _make_reference_pickle(tmp_path)
        npz_path = str(tmp_path / 'net.npz')
        flat = legacy_pkl_to_npz(str(path), npz_path)

        ref_sd = {k: v.detach().numpy()
                  for k, v in net.state_dict().items()}
        assert set(flat) == {f'G_ema.{k}' for k in ref_sd}
        for k, v in ref_sd.items():
            np.testing.assert_array_equal(flat[f'G_ema.{k}'], v)

        loaded = np.load(npz_path)
        for k in flat:
            np.testing.assert_array_equal(loaded[k], flat[k])

    def test_no_source_execution(self, tmp_path):
        """The pickle's module_src must NOT be executed: plant a booby
        trap in the captured source and confirm extraction still works
        (the reference's own loader would run it)."""
        from ln3diff_tpu.utils import legacy_pkl
        path, _ = _make_reference_pickle(tmp_path)
        data = legacy_pkl.load_stubbed(str(path))
        obj = data['G_ema']
        assert isinstance(obj, legacy_pkl.PersistentObj)
        assert 'persistent_class' not in sys.modules.get('__booby__', ())
        # source text is captured verbatim but stays inert
        assert 'class Net' in obj.meta['module_src'] or \
               'class Leaf' in obj.meta['module_src']

    def test_reduce_payload_not_executed(self, tmp_path):
        """A malicious REDUCE payload (``os.system`` / ``builtins.exec``)
        must come back as an inert stub — the allowlist admits only the
        specific torch/numpy reconstruction callables."""
        import os
        from ln3diff_tpu.utils import legacy_pkl

        flag = tmp_path / 'pwned'

        class EvilSystem:
            def __reduce__(self):
                return (os.system, (f'touch {flag}',))

        class EvilExec:
            def __reduce__(self):
                return (exec, (f'open(r"{flag}", "w")',))

        path = tmp_path / 'evil.pkl'
        with open(path, 'wb') as f:
            pickle.dump({'G_ema': EvilSystem(), 'G': EvilExec()}, f)
        data = legacy_pkl.load_stubbed(str(path))
        assert not flag.exists()
        # the payload callables arrived as stub classes, not real ones
        assert type(data['G_ema']).__name__ == 'system'
        assert type(data['G']).__name__ == 'exec'
        # and the extractor treats them as empty networks
        flat = legacy_pkl.legacy_pkl_to_npz(str(path), '')
        assert flat == {}
        assert not flag.exists()

    def test_load_from_bytes_gadget_not_executed(self, tmp_path):
        """``torch.storage._load_from_bytes`` is the classic allowlist
        bypass: the real function is ``torch.load(..., weights_only=
        False)`` — an unrestricted NESTED unpickle of attacker bytes.
        The extractor must route it through a ``weights_only=True``
        wrapper so a smuggled inner pickle raises instead of executing
        (round-4 advisor finding)."""
        import os

        from ln3diff_tpu.utils import legacy_pkl

        flag = tmp_path / 'pwned'

        class EvilInner:
            def __reduce__(self):
                return (os.system, (f'touch {flag}',))

        inner = pickle.dumps(EvilInner())

        class ViaStorage:
            def __reduce__(self):
                import torch.storage
                return (torch.storage._load_from_bytes, (inner,))

        path = tmp_path / 'evil_storage.pkl'
        with open(path, 'wb') as f:
            pickle.dump({'G_ema': ViaStorage()}, f)
        with pytest.raises(Exception):
            legacy_pkl.load_stubbed(str(path))
        assert not flag.exists()

    def test_plain_pickled_tensor_storage_still_loads(self, tmp_path):
        """The legit use of ``_load_from_bytes`` — plain ``pickle`` of a
        torch tensor (how the reference's persistence pickles tensor
        leaves) — must survive the weights_only hardening bitwise."""
        import torch

        from ln3diff_tpu.utils import legacy_pkl

        t = torch.arange(12, dtype=torch.float32).reshape(3, 4) * 0.5
        path = tmp_path / 'tensor.pkl'
        with open(path, 'wb') as f:
            pickle.dump({'x': t}, f)
        data = legacy_pkl.load_stubbed(str(path))
        np.testing.assert_array_equal(np.asarray(data['x']),
                                      t.numpy())

    def test_describe_reports_init_args(self, tmp_path):
        from ln3diff_tpu.utils.legacy_pkl import describe, load_stubbed
        path, _ = _make_reference_pickle(tmp_path)
        data = load_stubbed(str(path))
        info = describe(data['G_ema'])
        assert info['class_name'] == 'Net'
        assert info['init_args'] == [6]

    def test_cli(self, tmp_path, capsys):
        sys.path.insert(0, 'scripts')
        import legacy_pkl_to_npz as cli
        path, net = _make_reference_pickle(tmp_path)
        out = str(tmp_path / 'cli.npz')
        cli.main([str(path), out])
        assert 'wrote' in capsys.readouterr().out
        loaded = np.load(out)
        n_params = sum(v.numel() for v in net.state_dict().values())
        assert sum(v.size for v in loaded.values()) == n_params
