"""Dataloader throughput profiling.

Mirrors reference ``scripts/profile_dataloading.py`` (289 LoC): measures
samples/sec and MB/sec through each reader path (directory/LMDB dataset,
wds shards, synthetic in-memory) so IO regressions are visible before
they show up as idle TPU time.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def _nbytes(sample) -> int:
    total = 0
    for v in sample.values():
        if isinstance(v, np.ndarray):
            total += v.nbytes
        elif isinstance(v, dict):
            total += _nbytes(v)
    return total


def profile(name: str, iterator, num_batches: int):
    # warm one batch (open files, build caches) before timing
    first = next(iterator)
    t0 = time.perf_counter()
    nbytes = 0
    for _ in range(num_batches):
        batch = next(iterator)
        nbytes += _nbytes(batch)
    dt = time.perf_counter() - t0
    print(f'{name:>12}: {num_batches / dt:8.1f} batches/s  '
          f'{nbytes / dt / 2**20:8.1f} MB/s  '
          f'({num_batches} batches in {dt:.3f}s)')
    return first


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--path', default='',
                        help='LMDB/directory dataset or wds shard glob; '
                             'empty → synthetic only')
    parser.add_argument('--batch_size', type=int, default=4)
    parser.add_argument('--num_batches', type=int, default=50)
    parser.add_argument('--resolution', type=int, default=128)
    args = parser.parse_args()

    from ln3diff_tpu.data.synthetic import load_memory_data

    profile('synthetic',
            load_memory_data(args.batch_size, num_views=4,
                             resolution=args.resolution,
                             render_resolution=args.resolution),
            args.num_batches)

    if not args.path:
        return

    if args.path.endswith('.tar') or '*' in args.path:
        import glob

        from ln3diff_tpu.data.wds import load_wds_data
        paths = sorted(glob.glob(args.path))
        profile('wds', load_wds_data(paths, args.batch_size),
                args.num_batches)
    else:
        from ln3diff_tpu.data import lmdb_reader
        if os.path.isdir(args.path) and any(
                f.endswith('.npy') for f in os.listdir(args.path)):
            ds = lmdb_reader.DirectoryDataset(args.path)
        else:
            ds = lmdb_reader.LMDBDataset(args.path)
        profile('dataset',
                lmdb_reader.load_data(ds, args.batch_size),
                args.num_batches)


if __name__ == '__main__':
    main()
