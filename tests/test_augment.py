"""ADA augmentation pipeline: behavior tests + numeric parity against
the torch reference (``nsr/augment.py`` ``AugmentPipe``) through the
deterministic ``debug_percentile`` path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ref_compat
from ln3diff_tpu.training.augment import (AugmentConfig, augment_pipe,
                                          bgc_config, update_ada_p)


def _img(b=2, h=32, w=32, c=3, seed=0):
    rng = np.random.RandomState(seed)
    return rng.uniform(-1, 1, (b, h, w, c)).astype(np.float32)


class TestBehavior:

    def test_brightness_only_adds_constant(self):
        cfg = AugmentConfig(brightness=1.0)
        x = _img()
        y = augment_pipe(jax.random.PRNGKey(3), jnp.asarray(x), cfg, 1.0)
        delta = np.asarray(y) - x
        # per-image constant offset
        for i in range(x.shape[0]):
            assert np.allclose(delta[i], delta[i].flat[0], atol=1e-5)

    def test_contrast_only_scales(self):
        cfg = AugmentConfig(contrast=1.0)
        x = _img()
        y = np.asarray(augment_pipe(jax.random.PRNGKey(5), jnp.asarray(x),
                                    cfg, 1.0))
        ratio = y / x
        for i in range(x.shape[0]):
            assert np.allclose(ratio[i], ratio[i].flat[0], rtol=1e-4)

    def test_cutout_zeroes_a_rectangle(self):
        cfg = AugmentConfig(cutout=1.0, cutout_size=0.5)
        x = np.ones((4, 32, 32, 3), np.float32)
        y = np.asarray(augment_pipe(jax.random.PRNGKey(7), jnp.asarray(x),
                                    cfg, 1.0))
        frac = (y == 0).mean(axis=(1, 2, 3))
        assert (frac > 0.02).all() and (frac <= 0.25 + 1e-6).all()
        # zeroed region is an axis-aligned rectangle: row/col masks are
        # contiguous runs
        for i in range(4):
            rows = np.where((y[i] == 0).any(axis=(1, 2)))[0]
            assert (np.diff(rows) == 1).all()

    def test_noise_increases_variance(self):
        cfg = AugmentConfig(noise=1.0, noise_std=0.3)
        x = np.zeros((8, 16, 16, 3), np.float32)
        y = np.asarray(augment_pipe(jax.random.PRNGKey(9), jnp.asarray(x),
                                    cfg, 1.0))
        assert y.std() > 0.01

    def test_p_zero_geometric_is_near_identity(self):
        cfg = bgc_config()
        x = _img()
        y = np.asarray(augment_pipe(jax.random.PRNGKey(11),
                                    jnp.asarray(x), cfg, 0.0))
        # identity warp still round-trips the wavelet up/down resampling
        err = np.abs(y - x).max()
        assert err < 0.05, err

    def test_xflip_p_one(self):
        cfg = AugmentConfig(xflip=1.0)
        x = _img(b=8)
        y = np.asarray(augment_pipe(jax.random.PRNGKey(13),
                                    jnp.asarray(x), cfg, 1.0))
        flipped = x[:, :, ::-1]
        err_flip = np.abs(y - flipped).max(axis=(1, 2, 3))
        err_id = np.abs(y - x).max(axis=(1, 2, 3))
        # Every image is either flipped or untouched, and with p=1
        # roughly half the batch flips.  A flipped image is NOT a naive
        # flip: the warp lands on the opposite 2x-upsample lattice
        # phase, so it is re-interpolated — the torch reference shows
        # the same ~0.29 max deviation (TestRefParity checks we match
        # the reference exactly; here we only classify the outcome).
        assert (np.minimum(err_flip, err_id) < 0.35).all()
        assert (err_flip < err_id).any() and (err_id < err_flip).any()

    def test_grad_flows(self):
        cfg = AugmentConfig(scale=1.0, rotate=1.0, contrast=1.0)
        x = jnp.asarray(_img(b=2, h=16, w=16))

        def loss(img):
            y = augment_pipe(jax.random.PRNGKey(1), img, cfg, 0.7)
            return (y ** 2).sum()

        g = jax.grad(loss)(x)
        assert jnp.isfinite(g).all() and jnp.abs(g).max() > 0

    def test_jit_with_traced_p(self):
        cfg = bgc_config()
        x = jnp.asarray(_img())
        f = jax.jit(lambda k, img, p: augment_pipe(k, img, cfg, p))
        y0 = f(jax.random.PRNGKey(0), x, 0.0)
        y1 = f(jax.random.PRNGKey(0), x, 0.9)  # same program, new p
        assert y0.shape == x.shape == y1.shape
        assert jnp.isfinite(y1).all()

    def test_update_ada_p(self):
        p = update_ada_p(0.5, 1.0, batch_size=32)
        assert p > 0.5
        p = update_ada_p(0.5, -1.0, batch_size=32)
        assert p < 0.5
        assert update_ada_p(0.0, -1.0, batch_size=32) == 0.0


@pytest.mark.skipif(not ref_compat.reference_available(),
                    reason='reference repo not present')
class TestRefParity:

    def _run_pair(self, cfg_kwargs, dp, b=2, h=32, w=32, c=3):
        import torch
        from nsr.augment import AugmentPipe

        x = _img(b, h, w, c, seed=4)
        ref_pipe = AugmentPipe(**cfg_kwargs)
        ref_pipe.p.copy_(torch.as_tensor(1.0))
        with torch.no_grad():
            ref = ref_pipe(torch.from_numpy(x).permute(0, 3, 1, 2),
                           debug_percentile=dp)
        ref = ref.permute(0, 2, 3, 1).numpy()

        ours = np.asarray(augment_pipe(
            jax.random.PRNGKey(0), jnp.asarray(x),
            AugmentConfig(**cfg_kwargs), 1.0, debug_percentile=dp))
        return ref, ours

    @pytest.mark.parametrize('dp', [0.15, 0.45, 0.85])
    def test_geometric_parity(self, dp):
        kw = dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1,
                  aniso=1, xfrac=1)
        ref, ours = self._run_pair(kw, dp)
        assert np.abs(ref - ours).max() < 2e-4, np.abs(ref - ours).max()

    @pytest.mark.parametrize('dp', [0.2, 0.75])
    def test_color_parity(self, dp):
        kw = dict(brightness=1, contrast=1, lumaflip=1, hue=1,
                  saturation=1)
        ref, ours = self._run_pair(kw, dp)
        assert np.abs(ref - ours).max() < 1e-4

    def test_imgfilter_parity(self):
        ref, ours = self._run_pair(dict(imgfilter=1), 0.65)
        assert np.abs(ref - ours).max() < 1e-4

    def test_cutout_parity(self):
        ref, ours = self._run_pair(dict(cutout=1), 0.35)
        assert np.abs(ref - ours).max() < 1e-6

    def test_full_bgc_parity(self):
        kw = dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1,
                  aniso=1, xfrac=1, brightness=1, contrast=1, lumaflip=1,
                  hue=1, saturation=1, imgfilter=1)
        ref, ours = self._run_pair(kw, 0.6)
        assert np.abs(ref - ours).max() < 5e-4
