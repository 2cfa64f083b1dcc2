"""Serialize posed multi-view renders into an LMDB shard.

Mirrors reference ``scripts/lmdb_create.py`` (compressed-array LMDB
used by the ShapeNet/FFHQ datasets, ``datasets/shapenet.py:892``
``decompress_array``): each sample stores RGB, depth, fg mask and the
25-dim camera vector, gzip/lz4-compressed per array.  Without a raw
render directory it writes synthetic scenes so the downstream readers
and trainers stay exercisable offline.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def synthetic_samples(num_instances: int, num_views: int, resolution: int,
                      seed: int = 0):
    from ln3diff_tpu.data.synthetic import make_multiview_batch
    for i in range(num_instances):
        batch = make_multiview_batch(num_views=num_views,
                                     resolution=resolution,
                                     seed=seed + i)
        yield {
            'raw_img': np.asarray(batch['img'], dtype=np.float32),
            'depth': np.asarray(batch['depth'], dtype=np.float32),
            'depth_mask': np.asarray(batch['depth_mask'], dtype=np.float32),
            'c': np.asarray(batch['c'], dtype=np.float32),
            'ins': np.asarray([i], dtype=np.int64),
        }


def directory_samples(raw_dir: str):
    """Read ``<raw_dir>/<instance>/*.npz`` dumps (img/depth/mask/c)."""
    for name in sorted(os.listdir(raw_dir)):
        path = os.path.join(raw_dir, name)
        if not name.endswith('.npz'):
            continue
        with np.load(path) as z:
            yield {k: z[k] for k in z.files}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--out', default='/tmp/ln3diff-lmdb')
    parser.add_argument('--raw_dir', default='',
                        help='directory of .npz multi-view dumps; '
                             'empty → synthetic scenes')
    parser.add_argument('--num_instances', type=int, default=8)
    parser.add_argument('--num_views', type=int, default=4)
    parser.add_argument('--resolution', type=int, default=128)
    parser.add_argument('--compress', default='gzip',
                        choices=['gzip', 'lz4', 'none'])
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--format', default='auto',
                        choices=['auto', 'lmdb', 'directory'],
                        help='auto falls back to DirectoryDataset when the '
                             'lmdb package is unavailable')
    args = parser.parse_args()

    from ln3diff_tpu.data import lmdb_reader

    if args.raw_dir:
        samples = directory_samples(args.raw_dir)
    else:
        samples = synthetic_samples(args.num_instances, args.num_views,
                                    args.resolution, args.seed)

    use_lmdb = args.format == 'lmdb' or (
        args.format == 'auto' and lmdb_reader._lmdb is not None)
    if use_lmdb:
        writer = lmdb_reader.LMDBWriter(args.out, compress=args.compress)
        n = 0
        for sample in samples:
            writer.write(sample)
            n += 1
        writer.close()
    else:
        samples = list(samples)
        n = len(samples)
        lmdb_reader.DirectoryDataset.write(args.out, iter(samples))
    print(f'wrote {n} instances to {args.out} '
          f'({"lmdb" if use_lmdb else "directory"})')


if __name__ == '__main__':
    main()
