"""Vision-aided discriminator: frozen CLIP backbone + multilevel heads.

Rewrite of the reference's ``vision_aided_loss.Discriminator(
cv_type='clip', loss_type='multilevel_sigmoid_s')`` usage
(``nsr/train_util_cvD.py:98-125``, ``nsr/cvD/nvsD_canoD.py``): a frozen
CLIP ViT feature ensemble with small trainable per-level heads, trained
with a non-saturating sigmoid GAN loss (one-sided label smoothing on
real — the ``_s`` suffix).  The reference freezes the backbone with
``requires_grad_(False)`` and optimizes only ``decoder`` params
(plus the 6-channel patch embed in SR mode, ``train_util_cvD.py:111``);
here the same split is an optax ``multi_transform`` mask over the param
tree — JAX-native, no mutable requires-grad state.

Offline note: the CLIP backbone is architecture-faithful but randomly
initialized in this environment (no weight egress); the HF converter in
``conditioning/convert.py`` ingests real weights when available — same
status as the CLIP text tower (see docs/PARITY.md).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from ..conditioning.clip import CLIPVisionConfig, CLIPVisionModel
from .train_state import TrainState, create_train_state

# OpenAI CLIP normalization constants (tiled to the channel count for
# the 6-ch SR variant, matching ``image_mean.repeat(2)`` in the
# reference).
_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def _vit_b32() -> CLIPVisionConfig:
    """CLIP ViT-B/32 — the ``cv_type='clip'`` backbone."""
    return CLIPVisionConfig(hidden_size=768, num_layers=12, num_heads=12,
                            intermediate_size=3072, patch_size=32,
                            image_size=224)


@dataclasses.dataclass(frozen=True)
class VisionAidedConfig:
    clip: CLIPVisionConfig = dataclasses.field(default_factory=_vit_b32)
    # backbone layer indices to tap (1-based depth); default quartiles
    taps: tuple = (3, 6, 9, 12)
    head_width: int = 128
    in_channels: int = 3      # 6 for the SR (rgb + raw concat) variant
    disc_lr: float = 1e-4     # reference cvD_lr = 1e-4 * (lr/1e-5)
    adv_lambda: float = 0.025  # reference nvs_cvD_lambda
    label_smoothing: float = 0.1


def clip_preprocess(images: jax.Array, cfg: VisionAidedConfig) -> jax.Array:
    """[-1, 1] images → CLIP-normalized at the backbone resolution.

    Accepts (B, H, W, C) with C = cfg.in_channels; resizes bilinearly
    (reference feeds 224² via interpolation) and applies the CLIP
    mean/std, tiled channel-wise for 6-ch inputs.
    """
    B, H, W, C = images.shape
    assert C == cfg.in_channels, (C, cfg.in_channels)
    size = cfg.clip.image_size
    x = (images + 1.0) * 0.5
    if (H, W) != (size, size):
        x = jax.image.resize(x, (B, size, size, C), method='bilinear')
    reps = C // 3
    mean = jnp.asarray(_CLIP_MEAN * reps, x.dtype)
    std = jnp.asarray(_CLIP_STD * reps, x.dtype)
    return (x - mean) / std


class _LevelHead(nn.Module):
    """Per-tap patch head: token grid → patch logit map (the role of the
    reference decoder's per-level conv heads)."""
    width: int

    @nn.compact
    def __call__(self, tokens):
        B, L, D = tokens.shape
        s = int(round(L ** 0.5))
        x = tokens.reshape(B, s, s, D)
        x = nn.Conv(self.width, (3, 3), name='conv1')(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(self.width, (3, 3), name='conv2')(x)
        x = nn.leaky_relu(x, 0.2)
        return nn.Conv(1, (1, 1), name='out')(x).reshape(B, -1)


class VisionAidedDiscriminator(nn.Module):
    """Multilevel logits from a frozen CLIP ViT.

    Returns a list of per-level logit tensors ``(B, P_i)`` — one patch
    map per tapped layer plus a CLS-pooled head at the output.
    """
    cfg: VisionAidedConfig = VisionAidedConfig()

    @nn.compact
    def __call__(self, images):
        cfg = self.cfg
        x = clip_preprocess(images, cfg)
        feats = CLIPVisionModel(cfg.clip, name='backbone')(
            x, output_hidden_states=True)
        logits = []
        for i, layer in enumerate(cfg.taps):
            h = feats['hidden_states'][layer - 1][:, 1:]  # drop CLS
            logits.append(_LevelHead(cfg.head_width,
                                     name=f'head_{i}')(h))
        pooled = feats['pooler_output']
        cls_logit = nn.Dense(1, name='head_cls')(
            nn.leaky_relu(nn.Dense(cfg.head_width, name='cls_fc')(pooled),
                          0.2))
        logits.append(cls_logit)
        return logits


# ---------------------------------------------------------------------------
# multilevel sigmoid losses (the ``multilevel_sigmoid_s`` pair)
# ---------------------------------------------------------------------------


def multilevel_d_loss(logits_real: list, logits_fake: list,
                      smoothing: float = 0.1) -> jax.Array:
    """Sum over levels of BCE-with-logits; real targets smoothed to
    ``1 - smoothing`` (one-sided — fake targets stay 0)."""
    loss = 0.0
    for lr, lf in zip(logits_real, logits_fake):
        t = 1.0 - smoothing
        # BCE(logit, target) = softplus(logit) - target * logit
        loss = loss + jnp.mean(jax.nn.softplus(lr) - t * lr)
        loss = loss + jnp.mean(jax.nn.softplus(lf))
    return loss


def multilevel_g_loss(logits_fake: list) -> jax.Array:
    """Non-saturating: sum over levels of softplus(-D(fake))."""
    loss = 0.0
    for lf in logits_fake:
        loss = loss + jnp.mean(jax.nn.softplus(-lf))
    return loss


# ---------------------------------------------------------------------------
# freeze mask + head
# ---------------------------------------------------------------------------


def trainable_labels(params, in_channels: int = 3):
    """'trainable' for head params (and the patch embed when the input
    was widened to 6 channels, reference ``train_util_cvD.py:111-114``),
    'frozen' for the CLIP backbone."""
    def label(path, _):
        keys = [str(getattr(k, 'key', '')) for k in path]
        if 'backbone' not in keys:
            return 'trainable'
        if in_channels != 3 and 'patch_embedding' in keys:
            return 'trainable'
        return 'frozen'

    return jax.tree_util.tree_map_with_path(label, params)


def make_head_optimizer(cfg: VisionAidedConfig):
    """Adam over head params only; frozen backbone gets zero updates.

    ``optax.multi_transform`` keeps ONE param/opt-state pytree (pjit- and
    donation-friendly) instead of physically splitting the tree.
    """
    return lambda params: optax.multi_transform(
        {'trainable': optax.adam(cfg.disc_lr, b1=0.0, b2=0.999),
         'frozen': optax.set_to_zero()},
        trainable_labels(params, cfg.in_channels))


class VisionAidedHead:
    """Drop-in alternative to ``gan.AdversarialHead`` backed by the
    frozen-CLIP multilevel discriminator (same generator_loss/disc_step
    interface; trainers select via config)."""

    def __init__(self, cfg: VisionAidedConfig = VisionAidedConfig(),
                 seed: int = 0, backbone_params=None):
        self.cfg = cfg
        self.model = VisionAidedDiscriminator(cfg)
        key = jax.random.PRNGKey(seed)
        size = cfg.clip.image_size
        dummy = jnp.zeros((1, size, size, cfg.in_channels))
        params = jax.jit(self.model.init)(key, dummy)['params']
        if backbone_params is not None:   # converted CLIP weights
            params = dict(params, backbone=backbone_params)
        self.state = create_train_state(
            params, make_head_optimizer(cfg)(params))

        def apply(p, img):
            return self.model.apply({'params': p}, img)

        def g_loss_fn(p, fake):
            return cfg.adv_lambda * multilevel_g_loss(apply(p, fake))

        self._g_loss = jax.jit(g_loss_fn)

        def d_loss_fn(p, real, fake):
            lr = apply(p, real)
            lf = apply(p, jax.lax.stop_gradient(fake))
            loss = multilevel_d_loss(lr, lf, cfg.label_smoothing)
            return loss, {
                'd_loss': loss,
                'logits_real': sum(x.mean() for x in lr) / len(lr),
                'logits_fake': sum(x.mean() for x in lf) / len(lf)}

        def d_step(state: TrainState, real, fake):
            (_, metrics), grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(state.params, real, fake)
            return state.apply_gradients(grads=grads), metrics

        self._d_step = jax.jit(d_step)

    def generator_loss(self, fake: jax.Array) -> jax.Array:
        return self._g_loss(jax.lax.stop_gradient(self.state.params), fake)

    def disc_step(self, real: jax.Array, fake: jax.Array):
        self.state, metrics = self._d_step(self.state, real, fake)
        return metrics
