"""Data-loader throughput vs trainer ingest rate (round-5, VERDICT #9).

The stage-1 VAE trainer sustains ~6.5 steps/s at batch 8 on one v5e
chip (docs/TPU_PERF_NOTES.md training table) → the input pipeline must
deliver > 52 samples/s or the chip starves.  These tests fabricate
training-shape shard/LMDB data and assert each reader path clears that
bar (gate at 1× so single-core CI contention can't flake it; the solo
headroom is 2.4–20×, see the module constant below).  The measured numbers on the build host
are recorded in docs/TPU_PERF_NOTES.md (reference analogue:
``scripts/profile_dataloading.py``, 289 LoC).
"""

import time

import numpy as np
import pytest

# the bar: VAE trainer ingest (6.5 steps/s × batch 8).  Solo-host
# measurements clear it 2.4–20× (wds python 238, wds native 126,
# directory 1061 samples/s — TPU_PERF_NOTES data-path table); the GATE
# stays at 1× so a CI host time-slicing this single core with another
# job doesn't flake the suite, while a real IO regression still trips.
REQUIRED_SPS = 52.0
MARGIN = 1.0

V, RES = 4, 256     # objaverse training views / encoder resolution


def _instance(rng):
    return {
        'rgb.npy': rng.random((V, RES, RES, 3), np.float32),
        'depth.npy': rng.random((V, RES, RES), np.float32),
        'alpha.npy': (rng.random((V, RES, RES)) > 0.3).astype(np.float32),
        'c.npy': rng.random((V, 25), np.float32),
    }


def _measure(it, n_batches, batch_size):
    next(it)                       # warm (open files, fill buffers)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(it)
    dt = time.perf_counter() - t0
    return n_batches * batch_size / dt


@pytest.fixture(scope='module')
def shard_dir(tmp_path_factory):
    from ln3diff_tpu.data.wds import ShardWriter
    td = tmp_path_factory.mktemp('tp_shards')
    writer = ShardWriter(str(td / 'tp-%06d.tar'), maxcount=8)
    rng = np.random.default_rng(0)
    for i in range(16):
        writer.write(f'{i:06d}', _instance(rng))
    writer.close()
    return writer.paths


class TestLoaderThroughput:

    def test_wds_python_path_sustains_trainer_rate(self, shard_dir):
        from ln3diff_tpu.data.wds import load_wds_data
        it = load_wds_data(shard_dir, batch_size=4, shuffle_buffer=8,
                           seed=0, rank=0, num_replicas=1)
        sps = _measure(it, n_batches=24, batch_size=4)
        print(f'wds python: {sps:.0f} samples/s')
        assert sps > REQUIRED_SPS * MARGIN, sps

    def test_wds_native_reader_sustains_trainer_rate(self, shard_dir):
        from ln3diff_tpu.data.wds import iter_shards_native
        it = iter_shards_native(shard_dir, loop=True)
        next(it)
        t0 = time.perf_counter()
        n = 96
        for _ in range(n):
            next(it)
        sps = n / (time.perf_counter() - t0)
        print(f'wds native: {sps:.0f} samples/s')
        assert sps > REQUIRED_SPS * MARGIN, sps

    def test_directory_dataset_sustains_trainer_rate(self, tmp_path):
        from ln3diff_tpu.data.lmdb_reader import DirectoryDataset, \
            load_data
        rng = np.random.default_rng(1)

        def samples():
            for i in range(16):
                inst = _instance(rng)
                yield {
                    'raw_img': (inst['rgb.npy'][0] * 255).astype(np.uint8),
                    'img': inst['rgb.npy'][0] * 2 - 1,
                    'depth': inst['depth.npy'][0],
                    'depth_mask': inst['alpha.npy'][0],
                    'c': inst['c.npy'][0],
                }

        DirectoryDataset.write(str(tmp_path), samples())
        ds = DirectoryDataset(str(tmp_path))
        it = load_data(ds, batch_size=4, rank=0, num_replicas=1, seed=0)
        sps = _measure(it, n_batches=24, batch_size=4)
        print(f'directory: {sps:.0f} samples/s')
        assert sps > REQUIRED_SPS * MARGIN, sps
