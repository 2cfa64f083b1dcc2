"""Metric math tests (closed-form Gaussians)."""

import numpy as np

from ln3diff_tpu.evaluation.metrics import (compute_fid, frechet_distance,
                                            inception_score,
                                            precision_recall)


class TestFID:

    def test_identical_distributions_zero(self):
        rng = np.random.default_rng(0)
        f = rng.standard_normal((2000, 16)).astype(np.float64)
        fid = compute_fid(f, f.copy())
        assert abs(fid) < 1e-6

    def test_mean_shift_closed_form(self):
        """FID between N(0,I) and N(m,I) → ||m||²."""
        rng = np.random.default_rng(1)
        a = rng.standard_normal((20000, 8))
        b = rng.standard_normal((20000, 8)) + 2.0
        fid = compute_fid(a, b)
        expected = 8 * 4.0
        assert abs(fid - expected) / expected < 0.05

    def test_variance_scale_closed_form(self):
        """FID N(0,I) vs N(0,4I): tr(I) + tr(4I) - 2 tr(2I) = d(1+4-4)=d."""
        d = frechet_distance(np.zeros(5), np.eye(5), np.zeros(5),
                             4 * np.eye(5))
        assert abs(d - 5.0) < 1e-4


class TestIS:

    def test_uniform_logits_score_one(self):
        logits = np.zeros((100, 10))
        assert abs(inception_score(logits) - 1.0) < 1e-5

    def test_confident_diverse_high(self):
        # each sample strongly predicts a distinct class → IS ≈ #classes
        logits = np.eye(10)[np.arange(100) % 10] * 50
        s = inception_score(logits, splits=2)
        assert s > 8.0


class TestPR:

    def test_same_distribution_high(self):
        rng = np.random.default_rng(2)
        a = rng.standard_normal((500, 4))
        b = rng.standard_normal((500, 4))
        p, r = precision_recall(a, b)
        assert p > 0.8 and r > 0.8

    def test_disjoint_low(self):
        rng = np.random.default_rng(3)
        a = rng.standard_normal((300, 4))
        b = rng.standard_normal((300, 4)) + 50.0
        p, r = precision_recall(a, b)
        assert p < 0.05 and r < 0.05
