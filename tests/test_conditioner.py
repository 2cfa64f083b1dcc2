"""Conditioner + LPIPS structural tests."""

import numpy as np
import jax
import jax.numpy as jnp

from ln3diff_tpu.conditioning.clip import CLIPTextModel
from ln3diff_tpu.conditioning.conditioner import (Embedder,
                                                  GeneralConditioner,
                                                  make_clip_text_embedder)
from ln3diff_tpu.conditioning.lpips import LPIPS, make_lpips_fn


class TestConditioner:

    def _text_embedder(self):
        model = CLIPTextModel()
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 77), jnp.int32))
        return make_clip_text_embedder(params)

    def test_cond_uncond_pair(self):
        cond = GeneralConditioner([self._text_embedder()])
        c, uc = cond.get_unconditional_conditioning(
            {'caption': ['a chair', 'a car']})
        assert c['crossattn'].shape == (2, 77, 768)
        assert c['vector'].shape == (2, 768)
        assert uc['crossattn'].shape[1:] == (77, 768)
        # cond differs from uncond
        assert not np.allclose(np.asarray(c['crossattn']),
                               np.asarray(uc['crossattn']))

    def test_ucg_dropout(self):
        emb = self._text_embedder()
        emb.ucg_rate = 1.0  # always drop
        cond = GeneralConditioner([emb])
        rng = np.random.default_rng(0)
        c = cond({'caption': ['a chair']}, rng=rng)
        uc = cond({'caption': ['']})
        np.testing.assert_allclose(np.asarray(c['crossattn']),
                                   np.asarray(uc['crossattn']), atol=1e-5)


class TestLPIPS:

    def test_identical_zero_distance(self):
        fn = make_lpips_fn()
        img = jnp.asarray(np.random.default_rng(0).uniform(
            -1, 1, (2, 32, 32, 3)).astype(np.float32))
        d = float(fn(img, img))
        assert abs(d) < 1e-6

    def test_distance_monotone_in_noise(self):
        fn = make_lpips_fn()
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)
                                      ).astype(np.float32))
        d_small = float(fn(img, img + 0.05))
        d_big = float(fn(img, img + 0.5))
        assert 0 < d_small < d_big
