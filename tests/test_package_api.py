"""Package surface: lazy top-level exports and console-script wrappers."""

import subprocess
import sys

import pytest


class TestLazyExports:

    def test_version_and_dir(self):
        import ln3diff_tpu as l3
        assert l3.__version__
        assert 'TextTo3DPipeline' in dir(l3)

    def test_exports_resolve(self):
        import ln3diff_tpu as l3
        for name in l3.__all__:
            if name == '__version__':
                continue
            assert getattr(l3, name) is not None, name

    def test_unknown_attribute_raises(self):
        import ln3diff_tpu as l3
        with pytest.raises(AttributeError):
            l3.definitely_not_an_export

    def test_release_preset_roundtrip(self):
        import ln3diff_tpu as l3
        cfg = l3.release_preset('objaverse/t23d-dit')
        assert cfg.denoiser == 't23d-dit-l2'


class TestCLIWrappers:

    def test_sample_help_from_outside_repo(self, tmp_path):
        # console-script path: resolve scripts/ relative to the package,
        # independent of cwd
        code = ('import sys; sys.argv=["x","--help"]; '
                'from ln3diff_tpu.cli import sample; sample()')
        r = subprocess.run([sys.executable, '-c', code], cwd=str(tmp_path),
                           capture_output=True, text=True, timeout=120,
                           env={'PYTHONPATH': '/root/repo',
                                'PATH': '/usr/bin:/bin',
                                'JAX_PLATFORMS': 'cpu'})
        assert r.returncode == 0, r.stderr[-2000:]
        assert '--video_format' in r.stdout

    def test_all_wrappers_import(self):
        from ln3diff_tpu import cli
        for fn in ('train_vae', 'train_diffusion', 'train_sit', 'sample',
                   'evaluator', 'gradio_app'):
            assert callable(getattr(cli, fn))
