"""Data layer tests: shard round-trip, postprocess schema, synthetic."""

import numpy as np
import pytest

from ln3diff_tpu.data.objaverse import (PostProcess, canonicalize_poses,
                                        plucker_embedding)
from ln3diff_tpu.data.synthetic import make_multiview_batch
from ln3diff_tpu.data.wds import (ShardWriter, collate, iter_shard,
                                  load_wds_data)


class TestShards:

    def test_write_read_roundtrip(self, tmp_path):
        w = ShardWriter(str(tmp_path / 'shard-%06d.tar'), maxcount=3)
        for i in range(7):
            w.write(f'sample{i:03d}', {
                'rgb.npy': np.full((4, 4, 3), i, np.uint8),
                'caption.txt': f'obj {i}',
                'meta.json': {'idx': i},
            })
        w.close()
        assert len(w.paths) == 3  # 3+3+1

        samples = [s for p in w.paths for s in iter_shard(p)]
        assert len(samples) == 7
        assert samples[2]['caption.txt'] == 'obj 2'
        assert samples[5]['meta.json']['idx'] == 5
        np.testing.assert_array_equal(samples[4]['rgb.npy'],
                                      np.full((4, 4, 3), 4))

    def test_load_wds_data_batches(self, tmp_path):
        w = ShardWriter(str(tmp_path / 's-%06d.tar'), maxcount=10)
        for i in range(10):
            w.write(f'k{i}', {'x.npy': np.asarray([i], np.float32)})
        w.close()
        it = load_wds_data(w.paths, batch_size=4, shuffle_buffer=4, seed=0)
        b = next(it)
        assert b['x.npy'].shape == (4, 1)
        # infinite resampling: can draw many batches
        for _ in range(5):
            b = next(it)
        assert b['x.npy'].shape == (4, 1)


class TestPostProcess:

    def _raw(self, V=4, H=64):
        rng = np.random.default_rng(0)
        batch = make_multiview_batch(num_views=V, resolution=H,
                                     render_resolution=H)
        rgb01 = (batch['img_hr'] + 1) / 2
        return {
            'rgb.npy': rgb01.astype(np.float32),
            'depth.npy': batch['depth'] if batch['depth'].shape[1] == H
            else batch['depth'],
            'c.npy': batch['c'],
            'caption.txt': 'a sphere',
        }

    def test_schema(self):
        raw = self._raw(V=4, H=64)
        pp = PostProcess(reso_encoder=64, reso_render=32, num_views_input=2)
        out = pp(raw)
        assert out['img_to_encoder'].shape == (2, 64, 64, 10)
        assert out['img'].shape == (2, 32, 32, 3)
        assert out['depth'].shape == (2, 32, 32)
        assert out['c'].shape == (2, 25)
        assert out['bbox'].shape == (2, 4)
        assert out['caption'] == 'a sphere'
        assert np.isfinite(out['img_to_encoder']).all()

    def test_plucker_matches_ray_sampler(self):
        """Plücker dirs must equal the jax ray sampler's directions."""
        import jax.numpy as jnp
        from ln3diff_tpu.render.ray_sampler import sample_full_rays
        batch = make_multiview_batch(num_views=1, resolution=16,
                                     render_resolution=16)
        c = batch['c'][0]
        pl = plucker_embedding(c, 16)
        o, d = sample_full_rays(
            jnp.asarray(c[:16]).reshape(1, 4, 4),
            jnp.asarray(c[16:25]).reshape(1, 3, 3), 16)
        np.testing.assert_allclose(pl[..., 3:].reshape(-1, 3),
                                   np.asarray(d)[0], atol=1e-5)
        cross = np.cross(np.asarray(o)[0], np.asarray(d)[0])
        np.testing.assert_allclose(pl[..., :3].reshape(-1, 3), cross,
                                   atol=1e-5)

    def test_canonicalize_anchor_is_identity(self):
        batch = make_multiview_batch(num_views=3, resolution=16,
                                     render_resolution=16)
        c = canonicalize_poses(batch['c'])
        np.testing.assert_allclose(c[0, :16].reshape(4, 4), np.eye(4),
                                   atol=1e-5)
        # relative poses preserved
        a = batch['c'][1, :16].reshape(4, 4)
        b = batch['c'][2, :16].reshape(4, 4)
        an = c[1, :16].reshape(4, 4)
        bn = c[2, :16].reshape(4, 4)
        np.testing.assert_allclose(np.linalg.inv(a) @ b,
                                   np.linalg.inv(an) @ bn, atol=1e-4)
