"""GeneralConditioner: embedder list with classifier-free dropout.

Rewrite of ``sgm/modules/encoders/modules.py:80`` (``GeneralConditioner``)
and the embedder classes the released configs use
(``FrozenCLIPEmbedder:347``, ``FrozenOpenCLIPImageEmbedder:578``,
``FrozenDinov2ImageEmbedder:735``): each embedder declares its input key,
output key (crossattn / vector / dino) and ucg (unconditional guidance
dropout) rate; ``get_unconditional_conditioning`` produces the (c, uc)
pair the samplers consume.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class Embedder:
    """One conditioning tower.

    encode: (batch_inputs) -> dict of output_key → array.
    ucg_rate: probability of dropping to the unconditional value during
    training (reference ucg_rate 0.1).
    uncond_value: callable(batch) -> same-structure dict for the null
    conditioning ('' caption / zero image).
    """
    input_key: str
    encode: Callable[[Any], dict]
    uncond: Callable[[int], dict]
    ucg_rate: float = 0.0
    is_trainable: bool = False
    name: str = ''


class GeneralConditioner:
    def __init__(self, embedders: list[Embedder]):
        self.embedders = embedders

    def __call__(self, batch: dict, rng: Optional[np.random.Generator] = None,
                 force_uncond: bool = False) -> dict:
        """Encode the batch into a context dict, applying per-sample ucg
        dropout when an rng is given (training)."""
        out: dict = {}
        for emb in self.embedders:
            if emb.input_key not in batch and not force_uncond:
                continue
            if force_uncond:
                n = len(batch[next(iter(batch))])
                enc = emb.uncond(n)
            else:
                enc = emb.encode(batch[emb.input_key])
                if rng is not None and emb.ucg_rate > 0:
                    n = next(iter(enc.values())).shape[0]
                    drop = rng.random(n) < emb.ucg_rate
                    null = emb.uncond(n)
                    enc = {k: jnp.where(
                        jnp.asarray(drop).reshape(
                            (-1,) + (1,) * (v.ndim - 1)),
                        jnp.asarray(null[k]), v) for k, v in enc.items()}
            for k, v in enc.items():
                if k in out:
                    out[k] = jnp.concatenate([out[k], v], axis=-1) \
                        if k == 'vector' else jnp.concatenate(
                            [out[k], v], axis=1)
                else:
                    out[k] = v
        return out

    def get_unconditional_conditioning(self, batch: dict):
        """(c, uc) pair (reference ``get_unconditional_conditioning``)."""
        c = self(batch)
        n = next(iter(c.values())).shape[0]
        uc: dict = {}
        for emb in self.embedders:
            for k, v in emb.uncond(n).items():
                uc[k] = jnp.asarray(v) if k not in uc else uc[k]
        return c, uc


def make_clip_text_embedder(text_params, tokenizer=None,
                            ucg_rate: float = 0.1,
                            always_return_pooled: bool = True) -> Embedder:
    """FrozenCLIPEmbedder: captions → crossattn tokens (+ pooled vector)."""
    from .clip import CLIPTextModel, default_tokenizer

    model = CLIPTextModel()
    tokenizer = tokenizer or default_tokenizer()

    @jax.jit
    def encode_ids(params, ids):
        out = model.apply(params, ids)
        return out['last_hidden_state'], out['pooler_output']

    def encode(captions):
        ids = jnp.asarray(tokenizer(list(captions)))
        tokens, pooled = encode_ids(text_params, ids)
        enc = {'crossattn': tokens}
        if always_return_pooled:
            enc['vector'] = pooled
        return enc

    def uncond(n):
        enc = encode([''] * n)
        return enc

    return Embedder(input_key='caption', encode=encode, uncond=uncond,
                    ucg_rate=ucg_rate, name='clip_text')


def make_clip_image_embedder(vision_params, ucg_rate: float = 0.1
                             ) -> Embedder:
    """FrozenOpenCLIPImageEmbedder(output_tokens): images → crossattn
    spatial tokens (1024) + pooled vector."""
    from .clip import CLIPVisionModel

    model = CLIPVisionModel()

    @jax.jit
    def encode_imgs(params, imgs):
        out = model.apply(params, imgs)
        return out['tokens'], out['pooler_output']

    def encode(images):
        tokens, pooled = encode_imgs(vision_params, jnp.asarray(images))
        return {'crossattn': tokens, 'vector': pooled}

    def uncond(n):
        img_hw = model.cfg.image_size
        zeros = jnp.zeros((n, img_hw, img_hw, 3))
        tokens, pooled = encode_imgs(vision_params, zeros)
        return {'crossattn': jnp.zeros_like(tokens),
                'vector': jnp.zeros_like(pooled)}

    return Embedder(input_key='img', encode=encode, uncond=uncond,
                    ucg_rate=ucg_rate, name='clip_image')


def make_dino_embedder(vit_params, vit_model, proj_params=None,
                       ucg_rate: float = 0.1) -> Embedder:
    """FrozenDinov2ImageEmbedder: images → 'dino' spatial tokens for the
    i23d self-attention concat path."""

    @jax.jit
    def encode_imgs(params, imgs):
        return vit_model.apply(params, imgs)

    def encode(images):
        tokens = encode_imgs(vit_params, jnp.asarray(images))
        return {'dino': tokens}

    def uncond(n):
        img_hw = vit_model.cfg.img_size
        tokens = encode_imgs(vit_params,
                             jnp.zeros((n, img_hw, img_hw, 3)))
        return {'dino': jnp.zeros_like(tokens)}

    return Embedder(input_key='img', encode=encode, uncond=uncond,
                    ucg_rate=ucg_rate, name='dino')


def make_dino_mv_embedder(vit_params, vit_model, ucg_rate: float = 0.0,
                          n_cond_frames: int = 4) -> Embedder:
    """FrozenDinov2ImageEmbedderMV (reference
    ``sgm/modules/encoders/modules.py:1185``): V condition views →
    per-view DINOv2 tokens flattened across views.  The reference variant
    additionally injects a camera-modLN into the (trainable) DINO blocks —
    an unreleased experiment config (the released mv23d path is the
    Plücker variant below); this keeps the token contract without the
    camera modulation."""

    @jax.jit
    def encode_views(params, x):
        return vit_model.apply(params, x)

    hw = vit_model.cfg.img_size

    def encode(images):
        images = np.asarray(images)
        B, V = images.shape[:2]
        V = min(V, n_cond_frames)
        tokens = encode_views(
            vit_params,
            jnp.asarray(images[:, :V].reshape((B * V, hw, hw, 3))))
        L, D = tokens.shape[1:]
        return {'dino': tokens.reshape((B, V * L, D))}

    def uncond(n):
        tokens = encode_views(vit_params,
                              jnp.zeros((n * n_cond_frames, hw, hw, 3)))
        L, D = tokens.shape[1:]
        return {'dino': jnp.zeros((n, n_cond_frames * L, D), tokens.dtype)}

    return Embedder(input_key='img', encode=encode, uncond=uncond,
                    ucg_rate=ucg_rate, name='dino_mv')


def make_dino_mv_plucker_embedder(vit_params, vit_model,
                                  ucg_rate: float = 0.0,
                                  n_cond_frames: int = 4) -> Embedder:
    """FrozenDinov2ImageEmbedderMVPlucker (reference
    ``sgm/modules/encoders/modules.py:871-1014``): V condition views with
    their 25-dim cameras → per-view Plücker ray maps [cross(o,d), d]
    concatenated onto RGB (9-channel patch embed) → DINOv2 tokens
    flattened across views, on the 'dino' key for the mv23d
    cross-attention path (``variant='mv-pixelart'``).

    ``encode`` consumes ``(images, cameras)`` — images (B, V, H, W, 3) in
    [-1, 1], cameras (B, V, 25).
    """
    from ..data.objaverse import plucker_embedding

    @jax.jit
    def encode_views(params, x):          # x: (N, H, W, 9)
        return vit_model.apply(params, x)

    hw = vit_model.cfg.img_size

    def encode(img_c):
        images, cameras = img_c
        images = np.asarray(images)
        cameras = np.asarray(cameras)
        B, V = images.shape[:2]
        V = min(V, n_cond_frames)
        plucker = np.stack([
            np.stack([plucker_embedding(cameras[b, v], hw)
                      for v in range(V)]) for b in range(B)])  # B,V,H,W,6
        x = np.concatenate([images[:, :V], plucker], axis=-1)
        tokens = encode_views(vit_params,
                              jnp.asarray(x.reshape((B * V, hw, hw, 9))))
        L, D = tokens.shape[1:]
        return {'dino': tokens.reshape((B, V * L, D))}

    def uncond(n):
        zeros = jnp.zeros((n * n_cond_frames, hw, hw, 9))
        tokens = encode_views(vit_params, zeros)
        L, D = tokens.shape[1:]
        return {'dino': jnp.zeros((n, n_cond_frames * L, D),
                                  tokens.dtype)}

    return Embedder(input_key='img-c', encode=encode, uncond=uncond,
                    ucg_rate=ucg_rate, name='dino_mv_plucker')


def make_concat_timestep_embedder(outdim: int = 256,
                                  input_key: str = 'original_size_as_tuple',
                                  ucg_rate: float = 0.0,
                                  n_dims: int = 2) -> Embedder:
    """ConcatTimestepEmbedderND (reference
    ``sgm/modules/encoders/modules.py:1516``): embeds each scalar of a
    size/crop tuple with a sinusoidal table and concatenates → 'vector'.
    Parameter-free.  ``n_dims`` fixes the uncond width (the reference
    derives it from the batch; SDXL-style size/crop keys are 2-wide).
    """
    from ..models.layers import timestep_embedding

    @jax.jit
    def encode_vals(x):
        if x.ndim == 1:
            x = x[:, None]
        b, d = x.shape
        emb = timestep_embedding(x.reshape(-1), outdim)
        return emb.reshape(b, d * outdim)

    def encode(x):
        return {'vector': encode_vals(jnp.asarray(x))}

    def uncond(n):
        # the reference encodes the SAME size tuple on the uncond branch
        # (force_uc_zero_embeddings only covers 'txt'); without batch
        # access here, the zero tuple's embedding is the fixed stand-in.
        return {'vector': encode_vals(jnp.zeros((n, n_dims)))}

    return Embedder(input_key=input_key, encode=encode, uncond=uncond,
                    ucg_rate=ucg_rate, name='concat_timestep')
