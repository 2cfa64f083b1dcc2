"""Generative metrics: FID, sFID, Inception Score, Precision & Recall.

Rewrite of the reference evaluator (``evaluations/evaluator.py:27-653`` —
a TF1 InceptionV3 graph over npz batches).  The metric math here is
framework-free numpy; the feature extractor is pluggable:

  * the reference protocol (InceptionV3 pool3 + logits) is reproduced
    when an Inception-weights checkpoint is converted via
    ``conditioning/convert.py``;
  * without those weights (zero-egress), the CLIP vision tower or any
    callable ``images → (features, logits)`` can stand in — FID numbers
    are then extractor-relative, which is still valid for tracking
    training progress and A/B comparisons.

Matches the reference's sFID choice of spatial pool features and the
improved-precision-recall kNN manifold estimator.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np


# ---------------------------------------------------------------------------
# Fréchet distance
# ---------------------------------------------------------------------------

def _sqrtm_psd(mat: np.ndarray) -> np.ndarray:
    """Matrix square root of a PSD matrix via eigen-decomposition."""
    vals, vecs = np.linalg.eigh(mat)
    vals = np.clip(vals, 0.0, None)
    return (vecs * np.sqrt(vals)) @ vecs.T


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """FID between two Gaussians (reference ``FIDStatistics.frechet_distance``
    / classic Heusel formulation)."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2

    offset = np.eye(sigma1.shape[0]) * eps
    s1 = sigma1 + offset
    s2 = sigma2 + offset
    # tr sqrt(s1 s2) = tr sqrt( sqrt(s1) s2 sqrt(s1) )  (symmetric PSD form)
    sq1 = _sqrtm_psd(s1)
    inner = sq1 @ s2 @ sq1
    covmean_tr = np.trace(_sqrtm_psd(inner))
    return float(diff @ diff + np.trace(s1) + np.trace(s2)
                 - 2 * covmean_tr)


def feature_statistics(feats: np.ndarray):
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


def compute_fid(feats_ref: np.ndarray, feats_sample: np.ndarray) -> float:
    return frechet_distance(*feature_statistics(feats_ref),
                            *feature_statistics(feats_sample))


# ---------------------------------------------------------------------------
# Inception Score
# ---------------------------------------------------------------------------

def inception_score(logits: np.ndarray, splits: int = 10) -> float:
    """IS from classifier logits (reference ``compute_inception_score``)."""
    probs = _softmax(logits)
    scores = []
    n = probs.shape[0]
    for i in range(splits):
        part = probs[i * n // splits:(i + 1) * n // splits]
        if len(part) == 0:
            continue
        kl = part * (np.log(part + 1e-10)
                     - np.log(part.mean(axis=0, keepdims=True) + 1e-10))
        scores.append(np.exp(kl.sum(axis=1).mean()))
    return float(np.mean(scores))


def _softmax(x):
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Improved Precision & Recall (kNN manifolds)
# ---------------------------------------------------------------------------

def _pairwise_d2(a: np.ndarray, b: np.ndarray, block: int = 2048
                 ) -> np.ndarray:
    out = np.empty((a.shape[0], b.shape[0]), np.float32)
    bb = (b**2).sum(axis=1)
    for i in range(0, a.shape[0], block):
        aa = a[i:i + block]
        out[i:i + block] = ((aa**2).sum(1)[:, None] + bb[None]
                            - 2 * aa @ b.T)
    return np.maximum(out, 0)


def precision_recall(feats_ref: np.ndarray, feats_sample: np.ndarray,
                     nhood_size: int = 3):
    """Kynkäänniemi et al. improved P&R (reference ``ManifoldEstimator``).

    precision: fraction of samples within the ref manifold;
    recall: fraction of refs within the sample manifold.
    """
    def manifold_radii(feats):
        d2 = _pairwise_d2(feats, feats)
        np.fill_diagonal(d2, np.inf)
        return np.sort(d2, axis=1)[:, nhood_size - 1]

    r_ref = manifold_radii(feats_ref)
    r_smp = manifold_radii(feats_sample)

    d2_sr = _pairwise_d2(feats_sample, feats_ref)
    precision = float((d2_sr <= r_ref[None]).any(axis=1).mean())
    d2_rs = d2_sr.T
    recall = float((d2_rs <= r_smp[None]).any(axis=1).mean())
    return precision, recall


# ---------------------------------------------------------------------------
# evaluator protocol (npz batches, reference CLI semantics)
# ---------------------------------------------------------------------------

FeatureFn = Callable[[np.ndarray], tuple[np.ndarray, np.ndarray]]
# images (N, H, W, 3) uint8 → (pool features (N, D), logits (N, K))


@dataclasses.dataclass
class EvalResult:
    fid: float
    sfid: Optional[float]
    inception_score: float
    precision: float
    recall: float

    def __str__(self):
        sfid = 'n/a' if self.sfid is None else f'{self.sfid:.3f}'
        return (f'FID {self.fid:.3f} | sFID {sfid} | '
                f'IS {self.inception_score:.3f} | '
                f'P {self.precision:.3f} | R {self.recall:.3f}')


def make_clip_feature_fn(batch_size: int = 32) -> FeatureFn:
    """CLIP-vision stand-in extractor (random-init without converted
    weights; convert HF weights for a stable metric)."""
    import jax
    import jax.numpy as jnp
    from ..conditioning.clip import CLIPVisionConfig, CLIPVisionModel

    cfg = CLIPVisionConfig(image_size=224, patch_size=14, hidden_size=256,
                           num_layers=4, num_heads=4,
                           intermediate_size=512)
    model = CLIPVisionModel(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 224, 224, 3)))

    @jax.jit
    def fwd(x):
        out = model.apply(params, x)
        # sFID analogue of Inception's mixed_6 spatial features: the first
        # 2 channels of every non-CLS token, flattened (512-dim at 16²
        # tokens) — sensitive to spatial layout where pooled FID is not.
        spatial = out['tokens'][:, 1:, :2].reshape(x.shape[0], -1)
        return out['pooler_output'], out['pooler_output'][:, :64], spatial

    def fn(images: np.ndarray):
        feats, logits, spatials = [], [], []
        for i in range(0, len(images), batch_size):
            chunk = images[i:i + batch_size].astype(np.float32) / 127.5 - 1
            chunk = jax.image.resize(
                jnp.asarray(chunk),
                (chunk.shape[0], 224, 224, 3), 'bilinear')
            f, l, s = fwd(chunk)
            feats.append(np.asarray(f))
            logits.append(np.asarray(l))
            spatials.append(np.asarray(s))
        return (np.concatenate(feats), np.concatenate(logits),
                np.concatenate(spatials))

    return fn


def make_inception_feature_fn(weights=None, batch_size: int = 32
                              ) -> FeatureFn:
    """Reference-protocol extractor: FID InceptionV3 pool3 (2048-d) +
    1008-way logits + ``mixed_6/conv`` spatial features for sFID
    (``evaluations/evaluator.py:20-66``; arch in
    ``evaluation/inception.py``).

    ``weights``: path to a torch state dict (pytorch-fid
    ``pt_inception-2015-12-05`` / torchvision layout) or an
    already-converted flax param tree; random init otherwise (wall-clock
    identical, metric values not comparable until weights drop in).
    """
    import jax
    import jax.numpy as jnp

    from .inception import (InceptionV3, convert_inception_state_dict,
                            preprocess_uint8)

    model = InceptionV3()
    if weights is None:
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 299, 299, 3)))['params']
    elif isinstance(weights, (str, bytes)):
        import torch
        sd = torch.load(weights, map_location='cpu')
        if hasattr(sd, 'state_dict'):
            sd = sd.state_dict()
        params = convert_inception_state_dict(
            {k: v.numpy() for k, v in sd.items()})
    else:
        params = weights

    @jax.jit
    def fwd(x):
        out, inter = model.apply({'params': params}, x,
                                 mutable=['intermediates'])
        # TF ``mixed_6/conv:0`` ≙ Mixed_6d's first conv, first 7 channels
        # (7·17² = 2023 dims — the sFID feature size).
        sp = inter['intermediates']['Mixed_6d']['branch1x1']['conv_out'][0]
        spatial = sp[..., :7].reshape(x.shape[0], -1)
        return out['pool3'], out['logits'], spatial

    def fn(images: np.ndarray):
        feats, logits, spatials = [], [], []
        for i in range(0, len(images), batch_size):
            chunk = preprocess_uint8(jnp.asarray(images[i:i + batch_size]))
            f, l, s = fwd(chunk)
            feats.append(np.asarray(f))
            logits.append(np.asarray(l))
            spatials.append(np.asarray(s))
        return (np.concatenate(feats), np.concatenate(logits),
                np.concatenate(spatials))

    return fn


def evaluate_npz(ref_npz: str, sample_npz: str,
                 feature_fn: Optional[FeatureFn] = None) -> EvalResult:
    """Reference CLI semantics: ``evaluator.py ref.npz sample.npz`` where
    each npz holds ``arr_0`` (N, H, W, 3) uint8."""
    feature_fn = feature_fn or make_clip_feature_fn()
    ref = np.load(ref_npz)['arr_0']
    smp = np.load(sample_npz)['arr_0']
    out_ref = feature_fn(ref)
    out_smp = feature_fn(smp)
    f_ref, logits = out_ref[0], out_smp[1]
    f_smp = out_smp[0]
    fid = compute_fid(f_ref, f_smp)
    sfid = None
    if len(out_ref) > 2:   # extractor provides spatial features
        sfid = compute_fid(out_ref[2], out_smp[2])
    is_score = inception_score(logits)
    p, r = precision_recall(f_ref, f_smp)
    return EvalResult(fid=fid, sfid=sfid, inception_score=is_score,
                      precision=p, recall=r)
