"""Raw G-Objaverse ingestion (VERDICT #7): EXR codec, g-buffer readers,
Cap3D captions, RealDataset, and shard creation from a synthetic tree."""

import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from ln3diff_tpu.data.exr import read_exr, write_exr
from ln3diff_tpu.data.objaverse_raw import (
    Cap3DCaptions, MultiViewObjaverseRaw, RealDataset, camera_25d,
    get_intrinsics, load_bbox, read_camera_matrix_single, read_dnormal,
    unity2blender_fix)


class TestEXR:

    def test_roundtrip_all_compressions(self, tmp_path):
        rng = np.random.default_rng(0)
        for comp in (0, 2, 3):
            ch = {'R': rng.standard_normal((37, 53)).astype(np.float32),
                  'G': rng.standard_normal((37, 53)).astype(np.float16),
                  'A': rng.uniform(0, 9, (37, 53)).astype(np.float32)}
            p = str(tmp_path / f'c{comp}.exr')
            write_exr(p, ch, compression=comp)
            back = read_exr(p)
            for k in ch:
                np.testing.assert_array_equal(back[k],
                                              ch[k].astype(np.float32))


def _make_gbuffer_tree(root, n_instances=2, n_views=3, res=32):
    """Synthetic raw layout: {ins}/{idx:05d}/{idx:05d}.{png,json,_nd.exr}."""
    from PIL import Image
    rng = np.random.default_rng(0)
    for i in range(n_instances):
        ins = os.path.join(root, f'obj{i}')
        for v in range(n_views):
            d = os.path.join(ins, f'{v:05d}')
            os.makedirs(d)
            base = os.path.join(d, f'{v:05d}')
            # camera on a radius-1.8 orbit
            ang = 2 * np.pi * v / n_views
            origin = np.array([1.8 * np.cos(ang), 1.8 * np.sin(ang), 0.4])
            z = -origin / np.linalg.norm(origin)
            x = np.cross(np.array([0, 0, 1.0]), z)
            x /= np.linalg.norm(x)
            y = np.cross(z, x)
            with open(base + '.json', 'w') as f:
                json.dump({'x': x.tolist(), 'y': y.tolist(),
                           'z': z.tolist(), 'origin': origin.tolist()}, f)
            rgba = rng.integers(0, 255, (res, res, 4), dtype=np.uint8)
            rgba[..., 3] = 255
            Image.fromarray(rgba, 'RGBA').save(base + '.png')
            dist = np.linalg.norm(origin)
            depth = rng.uniform(dist - 0.5, dist + 0.5,
                                (res, res)).astype(np.float32)
            depth[:4] = 0.1      # inside the near clip → masked
            normal = rng.standard_normal((res, res, 3)).astype(np.float32)
            write_exr(base + '_nd.exr',
                      {'R': normal[..., 0], 'G': normal[..., 1],
                       'B': normal[..., 2], 'A': depth})
    return root


class TestRawReaders:

    def test_camera_and_intrinsics(self, tmp_path):
        _make_gbuffer_tree(str(tmp_path), 1, 1)
        c2w = read_camera_matrix_single(
            str(tmp_path / 'obj0' / '00000' / '00000.json'))
        assert c2w.shape == (4, 4)
        # rotation block orthonormal
        R = c2w[:3, :3]
        np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-6)
        K = get_intrinsics(256, normalize=True)
        assert abs(K[0, 0] - 1422.222 * 256 / 1024 / 256) < 1e-6
        c = camera_25d(c2w, 256)
        assert c.shape == (25,)
        np.testing.assert_allclose(c[:16], c2w.reshape(16), rtol=1e-6)

    def test_read_dnormal_near_clip_and_resize(self, tmp_path):
        _make_gbuffer_tree(str(tmp_path), 1, 1, res=32)
        base = str(tmp_path / 'obj0' / '00000' / '00000')
        c2w = read_camera_matrix_single(base + '.json')
        depth, normal = read_dnormal(base + '_nd.exr', c2w[:3, 3:], 16, 16)
        assert depth.shape == (16, 16) and normal.shape == (16, 16, 3)
        assert (depth[:2] == 0).all()          # near-clipped rows
        assert (depth[8:] > 0).all()

    def test_unity2blender_fix(self):
        n = np.array([[[1.0, 2.0, 3.0]]])
        out = unity2blender_fix(n)
        np.testing.assert_array_equal(out[0, 0], [-1.0, -3.0, 2.0])

    def test_load_bbox(self):
        m = np.zeros((8, 8), bool)
        m[2:5, 3:7] = True
        np.testing.assert_array_equal(load_bbox(m), [2, 3, 4, 6])

    def test_captions(self, tmp_path):
        p = str(tmp_path / 'caps.json')
        with open(p, 'w') as f:
            json.dump({'folder/uuid1': 'a red chair', 'uuid2': 'a car'}, f)
        caps = Cap3DCaptions(p)
        assert caps('/data/folder/uuid1') == 'a red chair'
        assert caps('any/uuid2') == 'a car'
        assert caps('unknown') == ''


class TestRawDatasetAndShards:

    def test_dataset_iterates_shard_schema(self, tmp_path):
        _make_gbuffer_tree(str(tmp_path), 2, 3, res=32)
        ds = MultiViewObjaverseRaw(str(tmp_path), resolution=32)
        insts = list(ds)
        assert len(insts) == 2
        b = insts[0]
        assert b['rgb'].shape == (3, 32, 32, 3)
        assert b['depth'].shape == (3, 32, 32)
        assert b['alpha'].shape == (3, 32, 32)
        assert b['c'].shape == (3, 25)
        assert 0.0 <= b['rgb'].min() and b['rgb'].max() <= 1.0
        # alpha mirrors the near-clip mask
        assert (b['alpha'][:, :2] == 0).all()

    def test_shard_creation_cli_and_postprocess(self, tmp_path):
        """VERDICT #7 'Done': shard creation from a synthetic g-buffer
        layout, then PostProcess consumes the shard samples."""
        raw = tmp_path / 'raw'
        os.makedirs(raw)
        _make_gbuffer_tree(str(raw), 2, 4, res=32)
        caps = str(tmp_path / 'caps.json')
        with open(caps, 'w') as f:
            json.dump({'obj0': 'first thing', 'obj1': 'second thing'}, f)
        out = str(tmp_path / 'shard-%06d.tar')
        env = dict(os.environ, JAX_PLATFORMS='cpu')
        r = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(__file__), '..', 'scripts',
                          'wds_create.py'),
             '--out', out, '--source', 'gbuffer', '--source_dir', str(raw),
             '--captions', caps, '--resolution', '32'],
            capture_output=True, text=True, env=env, timeout=300)
        assert r.returncode == 0, r.stderr

        from ln3diff_tpu.data.objaverse import PostProcess
        from ln3diff_tpu.data.wds import iter_shard
        samples = list(iter_shard(str(tmp_path / 'shard-000000.tar')))
        assert len(samples) == 2
        post = PostProcess(reso_encoder=32, reso_render=32,
                           num_views_input=2, num_views_sup=2)
        batch = post(samples[0])
        assert batch['img_to_encoder'].shape[0] == 2
        assert 'nv_img' in batch and 'caption' in batch
        assert batch['caption'] in ('first thing', 'second thing')
