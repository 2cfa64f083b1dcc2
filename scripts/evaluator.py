"""Standalone sample-set evaluator CLI.

Mirrors reference ``evaluations/evaluator.py`` (``python evaluator.py
ref.npz sample.npz`` → FID/sFID/IS/Precision/Recall over ``arr_0``
uint8 image batches).  The reference uses a frozen TF1 InceptionV3
graph; offline we extract features with the in-repo CLIP vision tower
(random-init stand-in until converted weights are available offline),
so absolute values differ from Inception-based FID
but orderings on the same extractor are comparable.
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
    args = parser.parse_args()

    from ln3diff_tpu.evaluation.metrics import (evaluate_npz,
                                                make_clip_feature_fn)

    feature_fn = make_clip_feature_fn(batch_size=args.batch_size)
    result = evaluate_npz(args.ref_batch, args.sample_batch,
                          feature_fn=feature_fn)
    print(result)


if __name__ == '__main__':
    main()
