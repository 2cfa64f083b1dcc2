"""Shard-creation CLI (reference ``scripts/wds_create.py`` /
``lmdb_create.py``): packs multi-view instances into webdataset tar
shards (or a DirectoryDataset).  Without a raw-render tree it emits
synthetic ray-traced instances — useful for pipeline tests and overfit
experiments.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--out', required=True,
                        help='shard pattern, e.g. /data/objv-%%06d.tar')
    parser.add_argument('--num_instances', type=int, default=8)
    parser.add_argument('--num_views', type=int, default=8)
    parser.add_argument('--resolution', type=int, default=256)
    parser.add_argument('--maxcount', type=int, default=64)
    parser.add_argument('--source', default='synthetic',
                        choices=['synthetic', 'gbuffer'])
    parser.add_argument('--source_dir', default='',
                        help='gbuffer: root of raw G-Objaverse instance '
                             'dirs ({ins}/{idx:05d}/{idx:05d}.png/.json/'
                             '_nd.exr)')
    parser.add_argument('--captions', default='',
                        help='gbuffer: text_captions_cap3d.json path')
    parser.add_argument('--view_ids', default='',
                        help="gbuffer: comma list, e.g. '25,0,9,18'")
    args = parser.parse_args()

    from ln3diff_tpu.data.synthetic import make_multiview_batch
    from ln3diff_tpu.data.wds import ShardWriter

    writer = ShardWriter(args.out, maxcount=args.maxcount)
    if args.source == 'gbuffer':
        from ln3diff_tpu.data.objaverse_raw import (Cap3DCaptions,
                                                    MultiViewObjaverseRaw)
        ds = MultiViewObjaverseRaw(
            args.source_dir, resolution=args.resolution,
            captions=Cap3DCaptions(args.captions) if args.captions
            else None,
            view_ids=[int(v) for v in args.view_ids.split(',')]
            if args.view_ids else None)
        n = 0
        for inst in ds:
            writer.write(f'{n:06d}', {
                'rgb.npy': inst['rgb'].astype(np.float32),
                'depth.npy': inst['depth'].astype(np.float32),
                'alpha.npy': inst['alpha'].astype(np.float32),
                'c.npy': inst['c'].astype(np.float32),
                'caption.txt': inst['caption'],
            })
            n += 1
        args.num_instances = n
    else:
        for i in range(args.num_instances):
            b = make_multiview_batch(args.num_views, args.resolution,
                                     args.resolution, seed=i)
            rgb01 = ((b['img_hr'] + 1) / 2).astype(np.float32)
            writer.write(f'{i:06d}', {
                'rgb.npy': rgb01,
                'depth.npy': b['depth'].astype(np.float32),
                'alpha.npy': b['depth_mask'].astype(np.float32),
                'c.npy': b['c'].astype(np.float32),
                'caption.txt': f'a shaded sphere #{i}',
            })
    writer.close()
    print(f'wrote {args.num_instances} instances into '
          f'{len(writer.paths)} shard(s): {writer.paths}')


if __name__ == '__main__':
    main()
