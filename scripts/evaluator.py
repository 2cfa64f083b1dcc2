"""Standalone sample-set evaluator CLI.

Mirrors reference ``evaluations/evaluator.py`` (``python evaluator.py
ref.npz sample.npz`` → FID/sFID/IS/Precision/Recall over ``arr_0``
uint8 image batches).  The default extractor is the in-repo FID
InceptionV3 port (pool3 + logits + mixed_6/conv spatial, matching the
reference's TF1 graph protocol); pass ``--inception_weights`` with the
pytorch-fid ``pt_inception-2015-12-05`` state dict for
reference-comparable numbers (random init otherwise).  ``--extractor
clip`` keeps the CLIP-tower alternative.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('ref_batch', help='npz with arr_0 (N,H,W,3) uint8')
    parser.add_argument('sample_batch', help='npz with arr_0 (N,H,W,3) uint8')
    parser.add_argument('--batch_size', type=int, default=32)
    parser.add_argument('--extractor', choices=('inception', 'clip'),
                        default='inception')
    parser.add_argument('--inception_weights', default=None,
                        help='torch state dict (pytorch-fid layout)')
    args = parser.parse_args()

    from ln3diff_tpu.evaluation.metrics import (evaluate_npz,
                                                make_clip_feature_fn,
                                                make_inception_feature_fn)

    if args.extractor == 'inception':
        feature_fn = make_inception_feature_fn(
            weights=args.inception_weights, batch_size=args.batch_size)
    else:
        feature_fn = make_clip_feature_fn(batch_size=args.batch_size)
    result = evaluate_npz(args.ref_batch, args.sample_batch,
                          feature_fn=feature_fn)
    print(result)


if __name__ == '__main__':
    main()
