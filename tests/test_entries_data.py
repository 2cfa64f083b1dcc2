"""Tests for the reference-parity entry scripts and the EG3D dataset.

Covers scripts/{lmdb_create,profile_dataloading,evaluator,
vit_triplane_sit_train} and ln3diff_tpu/data/eg3d.py (reference
``datasets/eg3d_dataset.py``).
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'scripts'))


class TestEG3DDataset:

    def _make_folder(self, tmp_path, n=3, res=32, with_labels=True):
        from PIL import Image
        rng = np.random.default_rng(0)
        labels = []
        for i in range(n):
            fname = f'img{i:04d}.png'
            arr = rng.integers(0, 255, (res, res, 3), dtype=np.uint8)
            Image.fromarray(arr).save(tmp_path / fname)
            labels.append([fname, list(np.linspace(0, 1, 25))])
        if with_labels:
            (tmp_path / 'dataset.json').write_text(
                json.dumps({'labels': labels}))
        return str(tmp_path)

    def test_folder_roundtrip(self, tmp_path):
        from ln3diff_tpu.data.eg3d import ImageFolderDataset
        path = self._make_folder(tmp_path)
        ds = ImageFolderDataset(path, resolution=16)
        assert len(ds) == 3
        s = ds[0]
        assert s['img'].shape == (16, 16, 3)
        assert s['img'].min() >= -1.0 and s['img'].max() <= 1.0
        assert s['c'].shape == (25,)
        np.testing.assert_allclose(s['c'], np.linspace(0, 1, 25), rtol=1e-6)

    def test_missing_labels_identity_camera(self, tmp_path):
        from ln3diff_tpu.data.eg3d import ImageFolderDataset
        path = self._make_folder(tmp_path, with_labels=False)
        ds = ImageFolderDataset(path)
        c = ds[0]['c']
        assert c[0] == 1.0 and c[16] == 1.0 and c.sum() == 7.0

    def test_init_dataset_kwargs_and_loader(self, tmp_path):
        from ln3diff_tpu.data.eg3d import init_dataset_kwargs, load_eg3d_data
        path = self._make_folder(tmp_path)
        kw = init_dataset_kwargs(path, resolution=16)
        assert kw['num_items'] == 3 and kw['label_dim'] == 25
        it = load_eg3d_data(path, batch_size=4, resolution=16)
        b = next(it)
        assert b['img'].shape == (4, 16, 16, 3)
        assert b['c'].shape == (4, 25)


class TestLMDBCreateScript:

    def test_synthetic_to_directory(self, tmp_path, monkeypatch):
        import lmdb_create
        out = str(tmp_path / 'ds')
        monkeypatch.setattr(sys, 'argv', [
            'lmdb_create.py', '--out', out, '--num_instances', '2',
            '--num_views', '2', '--resolution', '16'])
        lmdb_create.main()
        from ln3diff_tpu.data.lmdb_reader import DirectoryDataset
        ds = DirectoryDataset(out)
        assert len(ds) == 2
        s = ds[0]
        assert s['raw_img'].shape[0] == 2  # views
        assert s['c'].shape == (2, 25)


class TestProfileDataloading:

    def test_synthetic_profile_runs(self, tmp_path, monkeypatch, capsys):
        import profile_dataloading
        monkeypatch.setattr(sys, 'argv', [
            'profile_dataloading.py', '--batch_size', '2',
            '--num_batches', '3', '--resolution', '16'])
        profile_dataloading.main()
        out = capsys.readouterr().out
        assert 'synthetic' in out and 'batches/s' in out


class TestEvaluatorCLI:

    def test_evaluator_npz(self, tmp_path, monkeypatch, capsys):
        rng = np.random.default_rng(0)
        ref = rng.integers(0, 255, (6, 32, 32, 3), dtype=np.uint8)
        smp = rng.integers(0, 255, (6, 32, 32, 3), dtype=np.uint8)
        np.savez(tmp_path / 'ref.npz', arr_0=ref)
        np.savez(tmp_path / 'smp.npz', arr_0=smp)
        import evaluator
        monkeypatch.setattr(sys, 'argv', [
            'evaluator.py', str(tmp_path / 'ref.npz'),
            str(tmp_path / 'smp.npz'), '--batch_size', '6'])
        evaluator.main()
        out = capsys.readouterr().out
        assert 'FID' in out


class TestSiTTrainEntry:

    def test_transport_args(self):
        import argparse

        from vit_triplane_sit_train import parse_transport_args
        parser = argparse.ArgumentParser()
        parse_transport_args(parser)
        args = parser.parse_args(['--path_type', 'vp',
                                  '--t_sampling', 'uniform'])
        assert args.path_type == 'vp'
        assert args.prediction == 'velocity'
        assert args.t_sampling == 'uniform'
