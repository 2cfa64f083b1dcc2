"""Native threaded tar-shard reader vs the Python tarfile path."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from ln3diff_tpu.data.wds import (ShardWriter, iter_shard,
                                  iter_shards_native)


def _write_shards(tmp_path, n_samples=7, maxcount=3):
    rng = np.random.default_rng(0)
    w = ShardWriter(str(tmp_path / 'shard'), maxcount=maxcount)
    for i in range(n_samples):
        w.write(f'{i:05d}', {
            'latent.npy': rng.standard_normal((4, 4, 3)).astype(np.float32),
            'caption.txt': f'sample number {i}',
        })
    w.close()
    return w.paths


class TestNativeShardReader:

    def test_matches_tarfile_path(self, tmp_path):
        paths = _write_shards(tmp_path)
        assert len(paths) == 3          # 7 samples / 3 per shard
        want = [s for p in paths for s in iter_shard(p)]
        got = list(iter_shards_native(paths))
        assert len(got) == len(want) == 7
        for a, b in zip(got, want):
            assert a['__key__'] == b['__key__']
            assert a['caption.txt'] == b['caption.txt']
            np.testing.assert_array_equal(a['latent.npy'], b['latent.npy'])

    def test_raw_entry_iteration(self, tmp_path):
        pytest.importorskip('ctypes')
        from ln3diff_tpu.native.build import NativeShardReader
        paths = _write_shards(tmp_path, n_samples=2, maxcount=10)
        entries = list(NativeShardReader(paths))
        names = [n for n, _ in entries]
        assert '00000.latent.npy' in names and '00001.caption.txt' in names
        sizes = {n: len(d) for n, d in entries}
        assert sizes['00000.caption.txt'] == len('sample number 0')

    def test_loop_mode_repeats(self, tmp_path):
        from ln3diff_tpu.native.build import NativeShardReader
        paths = _write_shards(tmp_path, n_samples=2, maxcount=10)
        reader = NativeShardReader(paths, loop=True)
        seen = [next(reader)[0] for _ in range(10)]
        reader.close()
        assert seen.count('00000.latent.npy') >= 2   # wrapped around
