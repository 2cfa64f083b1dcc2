"""Vision-aided discriminator (frozen-CLIP multilevel D) tests.

Mirrors the reference contract (``nsr/train_util_cvD.py:98-125``): the
CLIP backbone is frozen, only the per-level heads (plus the widened
patch embed in 6-ch mode) train, and the multilevel sigmoid loss pair
drives D up on real / down on fake.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ln3diff_tpu.conditioning.clip import CLIPVisionConfig
from ln3diff_tpu.training.vision_aided import (VisionAidedConfig,
                                               VisionAidedDiscriminator,
                                               VisionAidedHead,
                                               multilevel_d_loss,
                                               multilevel_g_loss,
                                               trainable_labels)

TINY_CLIP = CLIPVisionConfig(hidden_size=32, num_layers=4, num_heads=2,
                             intermediate_size=64, patch_size=16,
                             image_size=64)
TINY = VisionAidedConfig(clip=TINY_CLIP, taps=(2, 4), head_width=16)


class TestModule:

    def test_multilevel_logit_shapes(self):
        model = VisionAidedDiscriminator(TINY)
        x = jnp.zeros((2, 32, 32, 3))   # off-size input → resized to 64
        params = model.init(jax.random.PRNGKey(0), x)
        logits = model.apply(params, x)
        assert len(logits) == len(TINY.taps) + 1   # taps + CLS head
        grid = (64 // 16) ** 2
        for lv in logits[:-1]:
            assert lv.shape == (2, grid)
        assert logits[-1].shape == (2, 1)
        assert all(np.isfinite(np.asarray(lv)).all() for lv in logits)

    def test_freeze_mask(self):
        model = VisionAidedDiscriminator(TINY)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)))['params']
        labels = trainable_labels(params)
        flat = jax.tree_util.tree_leaves_with_path(labels)
        frozen = [p for p, v in flat if v == 'frozen']
        trainable = [p for p, v in flat if v == 'trainable']
        assert frozen and trainable
        assert all('backbone' in jax.tree_util.keystr(p) for p in frozen)
        assert all('backbone' not in jax.tree_util.keystr(p)
                   for p in trainable)

    def test_6ch_variant_trains_patch_embed(self):
        cfg = dataclasses.replace(TINY, in_channels=6)
        model = VisionAidedDiscriminator(cfg)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 6)))['params']
        labels = trainable_labels(params, in_channels=6)
        flat = jax.tree_util.tree_leaves_with_path(labels)
        pe = [v for p, v in flat
              if 'patch_embedding' in jax.tree_util.keystr(p)]
        assert pe and all(v == 'trainable' for v in pe)


class TestLosses:

    def test_d_loss_prefers_separation(self):
        good = multilevel_d_loss([jnp.full((2, 4), 5.0)],
                                 [jnp.full((2, 4), -5.0)])
        bad = multilevel_d_loss([jnp.full((2, 4), -5.0)],
                                [jnp.full((2, 4), 5.0)])
        assert float(good) < float(bad)

    def test_g_loss_prefers_fooling(self):
        fooled = multilevel_g_loss([jnp.full((2, 4), 5.0)])
        caught = multilevel_g_loss([jnp.full((2, 4), -5.0)])
        assert float(fooled) < float(caught)


class TestHead:

    def _head(self):
        return VisionAidedHead(TINY, seed=0)

    def test_disc_step_updates_heads_only(self):
        head = self._head()
        before = jax.tree_util.tree_map(np.asarray, head.state.params)
        real = jnp.ones((2, 64, 64, 3)) * 0.5
        fake = -jnp.ones((2, 64, 64, 3)) * 0.5
        metrics = head.disc_step(real, fake)
        assert np.isfinite(float(metrics['d_loss']))
        after = head.state.params
        # backbone bitwise unchanged
        np.testing.assert_array_equal(
            np.asarray(after['backbone']['layers_0']['mlp']['fc1']['kernel']),
            before['backbone']['layers_0']['mlp']['fc1']['kernel'])
        # at least one head param moved
        moved = np.abs(np.asarray(after['head_0']['conv1']['kernel'])
                       - before['head_0']['conv1']['kernel']).max()
        assert moved > 0

    def test_generator_loss_differentiable_wrt_fake(self):
        head = self._head()
        fake = jnp.zeros((1, 64, 64, 3))
        g = jax.grad(lambda im: head.generator_loss(im).sum())(fake)
        assert float(jnp.abs(g).max()) > 0
