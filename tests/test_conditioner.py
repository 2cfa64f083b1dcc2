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


class TestConcatTimestepEmbedder:
    """ConcatTimestepEmbedderND parity vs the torch reference
    (``sgm/modules/encoders/modules.py:1516`` + the openaimodel
    ``timestep_embedding``)."""

    def test_matches_reference_formula(self):
        import math

        from ln3diff_tpu.conditioning.conditioner import (
            make_concat_timestep_embedder)

        outdim = 16
        emb = make_concat_timestep_embedder(outdim=outdim,
                                            input_key='size')
        x = np.array([[1024., 1024.], [512., 768.]])
        got = np.asarray(emb.encode(x)['vector'])
        assert got.shape == (2, 2 * outdim)

        # torch-free replica of the reference formula: per scalar,
        # [cos(t*f), sin(t*f)] with f = exp(-ln(1e4)*arange(half)/half)
        half = outdim // 2
        freqs = np.exp(-math.log(10000.) * np.arange(half) / half)
        flat = x.reshape(-1)
        ref = np.concatenate([np.cos(flat[:, None] * freqs),
                              np.sin(flat[:, None] * freqs)], axis=-1)
        ref = ref.reshape(2, 2 * outdim)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    def test_sgm_yaml_parses_sdxl_style_embedders(self):
        from ln3diff_tpu.sgm_config import EmbedderSpec

        spec = EmbedderSpec(maker='concat_timestep',
                            input_key='crop_coords_top_left',
                            options={'outdim': 8})
        e = spec.build(jax.random.PRNGKey(0))
        out = e.encode(np.zeros((3, 2)))['vector']
        assert out.shape == (3, 16)
        un = e.uncond(3)['vector']
        np.testing.assert_allclose(np.asarray(out), np.asarray(un))
