"""Released ShapeNet VAE architecture (fusionv5).

TPU-native rebuild of the reference class selected by the ShapeNet
release configs (``--ae_classname vit.vit_triplane.
RodinSR_256_fusionv5_ConvQuant_liteSR_dinoInit3DAttn``,
``vit/vit_triplane.py:802-1120``; built by ``nsr/script_util.py:
create_3DAE_model`` with ``--dino_version v2 --arch_encoder vits
--arch_decoder vitb``):

  * encoder: DINOv2 ViT-S/14 → 256 patch tokens (cls dropped,
    ``AE.encode_dinov2``, ``nsr/script_util.py:136-153``)
  * ``ldm_downsample`` Linear 384→96 + ``unpatchify3D`` → (B,32,32,24)
  * grouped ``quant_conv`` → DiagonalGaussian → latent (B,32,32,12)
  * ``ldm_upsample`` PatchEmbedTriplane → DINOv2-pair fusion decoder
    (TriplaneFusionBlockv4 + uvit long skips) → ``decoder_pred`` →
    ``unpatchify_triplane(p=4)`` → RodinConv 4X SR → planes
    (B, 3, 256, 256, 32)
  * EG3D render path with NearestConvSR render-space SR

Channel-interleave quirks of the reference (quant-conv moments viewed
(2z, 3); PatchEmbedTriplane output viewed (D, 3)) are replicated exactly
— see ``models/vae.py`` for the same treatment on the Objaverse arch.
Render / point-query methods are inherited from ``TriplaneVAE``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .distributions import make_gaussian
from .osg_decoder import OSGDecoder
from .rodin import RodinConv3D4XResidual
from .sr import NearestConvSR
from .vae import TriplaneVAE
from .vit import (DinoFusionDecoder, ViTConfig, VisionTransformer,
                  vit_registry)


@dataclasses.dataclass(frozen=True)
class ShapeNetVAEConfig:
    # encoder (DINOv2 ViT-S/14 @ 224)
    encoder_vit: ViTConfig = vit_registry('dinov2-s/14')
    # bottleneck
    ldm_z_channels: int = 4
    vae_p: int = 2                     # unpatchify3D patch
    token_size: int = 16               # encoder grid 16x16 (224/14)
    patch_size: int = 2                # ldm_upsample patch embed
    # fusion decoder (DINOv2 ViT-B pairs → 6 fusion blocks)
    decoder_embed_dim: int = 768
    decoder_fusion_depth: int = 6
    decoder_num_heads: int = 12
    # head
    channel_multiplier: int = 4
    unpatchify_p: int = 4
    plane_channels: int = 32
    triplane_resolution: int = 256
    decoder_output_dim: int = 32
    # shared render-path knobs (TriplaneVAE method compat)
    use_sr: bool = True
    sr_ratio: int = 2
    sr_module: str = 'nearest'
    use_background: bool = False
    bg_depth_resolution: int = 16
    lrm_decoder: bool = False
    dtype: Any = jnp.float32

    @property
    def latent_size(self) -> int:
        return self.token_size * self.vae_p      # 32

    @property
    def latent_channels(self) -> int:
        return 3 * self.ldm_z_channels


class ShapeNetVAE(TriplaneVAE):
    """fusionv5 VAE; render/query paths inherited from TriplaneVAE."""
    cfg: ShapeNetVAEConfig

    def setup(self):
        cfg = self.cfg
        z = cfg.ldm_z_channels
        self.encoder = VisionTransformer(
            dataclasses.replace(cfg.encoder_vit, dtype=cfg.dtype))
        self.ldm_downsample = nn.Dense(
            cfg.vae_p * cfg.vae_p * 3 * z * 2, dtype=cfg.dtype,
            name='ldm_downsample')
        self.quant_conv = nn.Conv(2 * 3 * z, (1, 1), feature_group_count=3,
                                  dtype=cfg.dtype, name='quant_conv')
        self.ldm_upsample = nn.Conv(
            cfg.decoder_embed_dim * 3,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), padding='VALID',
            feature_group_count=3, dtype=cfg.dtype, name='ldm_upsample')
        self.fusion_decoder = DinoFusionDecoder(
            depth=cfg.decoder_fusion_depth,
            num_heads=cfg.decoder_num_heads,
            tokens_per_plane=(cfg.latent_size // cfg.patch_size)**2,
            dtype=cfg.dtype)
        # MAE-style prediction head (reference decoder_pred_size =
        # (4//1)^2 * out_chans//3 * channel_multiplier, vit_triplane:833)
        self.decoder_pred = nn.Dense(
            cfg.unpatchify_p**2 * cfg.plane_channels *
            cfg.channel_multiplier, dtype=cfg.dtype, name='decoder_pred')
        self.conv_sr = RodinConv3D4XResidual(
            in_channels=3 * cfg.plane_channels * cfg.channel_multiplier,
            out_channels=3 * cfg.plane_channels,
            input_resolution=cfg.triplane_resolution, lite=True,
            dtype=cfg.dtype)
        self.osg_decoder = OSGDecoder(
            decoder_output_dim=cfg.decoder_output_dim)
        if cfg.use_sr:
            self.superresolution = NearestConvSR(sr_ratio=cfg.sr_ratio,
                                                 dtype=cfg.dtype)

    # -- encoder ------------------------------------------------------------

    def encode(self, imgs: jax.Array) -> jax.Array:
        """(B, 224, 224, 3) → moments (B, 32, 32, 2z, 3)."""
        cfg = self.cfg
        z = cfg.ldm_z_channels
        p, t = cfg.vae_p, cfg.token_size
        tokens = self.encoder(imgs)
        if cfg.encoder_vit.use_cls_token:
            tokens = tokens[:, 1:]
        lat = self.ldm_downsample(tokens)            # (B, t*t, p*p*3*2z)
        B = lat.shape[0]
        # unpatchify3D (vit_triplane.py:889-914): token grid (t,t), patch
        # (p,p), planes d, channels c → (B, 3, t*p, t*p, 2z) → plane-major
        # channels (B, H, W, 3*(2z)).
        lat = lat.reshape(B, t, t, p, p, 3, 2 * z)
        lat = jnp.transpose(lat, (0, 5, 1, 3, 2, 4, 6))   # B 3 t p t p c
        lat = lat.reshape(B, 3, t * p, t * p, 2 * z)
        lat = jnp.transpose(lat, (0, 2, 3, 1, 4)).reshape(
            B, t * p, t * p, 3 * 2 * z)
        moments = self.quant_conv(lat)
        # reference vae_encode views the (plane-major) grouped-conv output
        # as (2z, 3) with plane fastest — replicate (vit_triplane.py:917-929)
        return moments.reshape(B, t * p, t * p, 2 * z, 3)

    # reparameterize: inherited from TriplaneVAE (identical (2z,3) view).

    # -- decoder --------------------------------------------------------------

    def decode_latent(self, latent: jax.Array) -> jax.Array:
        """latent (B, 32, 32, z*3) → planes (B, 3, 256, 256, C)."""
        cfg = self.cfg
        B, hh, ww, _ = latent.shape
        D = cfg.decoder_embed_dim
        tok = self.ldm_upsample(latent.astype(cfg.dtype))
        th, tw = tok.shape[1], tok.shape[2]
        # PatchEmbedTriplane channel view (D, 3) → plane-major tokens
        tok = tok.reshape(B, th * tw, D, 3)
        tok = jnp.transpose(tok, (0, 3, 1, 2)).reshape(B, 3 * th * tw, D)

        tok = self.fusion_decoder(tok)                # (B, 3L, D)
        lat = self.decoder_pred(tok)                  # (B, 3L, p²·cm·C)

        # unpatchify_triplane (vit_triplane.py:393-414)
        p = cfg.unpatchify_p
        C = cfg.plane_channels * cfg.channel_multiplier
        h = w = th
        lat = lat.reshape(B, 3, h, w, p, p, C)
        lat = jnp.transpose(lat, (0, 2, 4, 3, 5, 1, 6))   # B h p w q d c
        lat = lat.reshape(B, h * p, w * p, 3 * C)         # plane-major

        planes = self.conv_sr(lat)                    # (B, R, R, 3*Cout)
        R = planes.shape[1]
        planes = planes.reshape(B, R, R, 3, cfg.plane_channels)
        return jnp.transpose(planes, (0, 3, 1, 2, 4))

    # -- convenience end-to-end ----------------------------------------------

    def __call__(self, imgs: jax.Array, camera25: jax.Array,
                 render_opts, resolution: int,
                 key: Optional[jax.Array] = None,
                 sample_posterior: bool = True):
        if key is not None:
            k_vae, k_render = jax.random.split(key)
        else:
            k_vae = k_render = None
        moments = self.encode(imgs)
        latent, posterior = self.reparameterize(moments, k_vae,
                                                sample_posterior)
        planes = self.decode_latent(latent)
        ret = self.render(planes, camera25, render_opts, resolution,
                          k_render)
        ret.update(latent=latent, posterior_kl=posterior.kl(), planes=planes)
        return ret


# ---------------------------------------------------------------------------
# FFHQ released arch (4XC_final)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class FFHQVAEConfig:
    """Released FFHQ VAE (``--ae_classname vit.vit_triplane.VAE_LDM_V4_
    vit3D_v3_conv3D_depth2_xformer_mha_PEinit_2d_sincos_uvit_
    RodinRollOutConv_4x4_lite_mlp_unshuffle_4XC_final``,
    ``vit/vit_triplane.py:516-800``): DINOv2-S/14 encoder, per-token
    Linear ldm_upsample (vae_p=1, latent 16x16x12), v3 fusion decoder,
    non-lite RodinConv 4X SR, plain ``Triplane`` rendering at 128² and
    ``SuperresolutionHybrid8XDC`` to 512²."""
    encoder_vit: ViTConfig = vit_registry('dinov2-s/14')
    ldm_z_channels: int = 4
    vae_p: int = 1
    token_size: int = 16
    decoder_embed_dim: int = 768
    decoder_fusion_depth: int = 6
    decoder_num_heads: int = 12
    channel_multiplier: int = 4
    unpatchify_p: int = 4
    plane_channels: int = 32
    triplane_resolution: int = 256
    decoder_output_dim: int = 32
    use_sr: bool = True
    sr_ratio: int = 4
    sr_module: str = 'stylegan-8xdc'
    use_background: bool = False   # released path uses plain Triplane
    bg_depth_resolution: int = 16
    lrm_decoder: bool = False
    dtype: Any = jnp.float32

    @property
    def latent_size(self) -> int:
        return self.token_size * self.vae_p      # 16

    @property
    def latent_channels(self) -> int:
        return 3 * self.ldm_z_channels


class FFHQVAE(ShapeNetVAE):
    """4XC_final; decode path mirrors the reference exactly.  The
    upstream encode path is dead code (its ``vae_reparameterization``
    calls a ``vae_encode`` absent from the class MRO — verified by
    instantiation), so ``encode`` here follows the fusionv5 structure
    (grouped quant_conv over the plane-major ldm_downsample output)."""
    cfg: FFHQVAEConfig

    def setup(self):
        cfg = self.cfg
        z = cfg.ldm_z_channels
        self.encoder = VisionTransformer(
            dataclasses.replace(cfg.encoder_vit, dtype=cfg.dtype))
        self.ldm_downsample = nn.Dense(
            cfg.vae_p * cfg.vae_p * 3 * z * 2, dtype=cfg.dtype,
            name='ldm_downsample')
        self.quant_conv = nn.Conv(2 * 3 * z, (1, 1), feature_group_count=3,
                                  dtype=cfg.dtype, name='quant_conv')
        # per-token Linear (reference ldm_upsample=nn.Linear,
        # vit_triplane.py:584-587)
        self.ldm_upsample = nn.Dense(cfg.decoder_embed_dim, dtype=cfg.dtype,
                                     name='ldm_upsample')
        self.fusion_decoder = DinoFusionDecoder(
            depth=cfg.decoder_fusion_depth,
            num_heads=cfg.decoder_num_heads,
            tokens_per_plane=(cfg.token_size * cfg.vae_p)**2,
            block_variant='v3', dtype=cfg.dtype)
        self.decoder_pred = nn.Dense(
            cfg.unpatchify_p**2 * cfg.plane_channels *
            cfg.channel_multiplier, dtype=cfg.dtype, name='decoder_pred')
        self.conv_sr = RodinConv3D4XResidual(
            in_channels=3 * cfg.plane_channels * cfg.channel_multiplier,
            out_channels=3 * cfg.plane_channels,
            input_resolution=cfg.triplane_resolution, lite=False,
            dtype=cfg.dtype)
        self.osg_decoder = OSGDecoder(
            decoder_output_dim=cfg.decoder_output_dim)
        if cfg.use_sr:
            from .stylegan import SuperresolutionHybrid8XDC
            self.superresolution = SuperresolutionHybrid8XDC()
            # the reference conditions SR on a w_avg buffer "replaced
            # externally" (vit_triplane.py:149,220); converter maps it in
            self.sr_ws = self.param('sr_ws', nn.initializers.zeros, (512,))

    def encode(self, imgs: jax.Array) -> jax.Array:
        cfg = self.cfg
        z = cfg.ldm_z_channels
        t = cfg.token_size
        tokens = self.encoder(imgs)
        if cfg.encoder_vit.use_cls_token:
            tokens = tokens[:, 1:]
        lat = self.ldm_downsample(tokens)            # (B, t*t, 3*2z)
        B = lat.shape[0]
        # vae_p=1 branch (vit_triplane.py:617-622): channels (plane, 2z)
        lat = lat.reshape(B, t, t, 3 * 2 * z)
        moments = self.quant_conv(lat)
        return moments.reshape(B, t, t, 2 * z, 3)

    def decode_latent(self, latent: jax.Array) -> jax.Array:
        """latent (B, 16, 16, z*3) → planes (B, 3, 256, 256, C).
        Mirrors ``vit_decode_backbone`` (``vit_triplane.py:769-800``):
        channel view (z, 3) → plane-major tokens of z features →
        per-token Linear to embed_dim."""
        cfg = self.cfg
        B, hh, ww, _ = latent.shape
        z = cfg.ldm_z_channels
        tok = latent.reshape(B, hh * ww, z, 3)
        tok = jnp.transpose(tok, (0, 3, 1, 2)).reshape(B, 3 * hh * ww, z)
        tok = self.ldm_upsample(tok.astype(cfg.dtype))  # (B, 3L, D)

        tok = self.fusion_decoder(tok)
        lat = self.decoder_pred(tok)

        p = cfg.unpatchify_p
        C = cfg.plane_channels * cfg.channel_multiplier
        h = w = hh
        lat = lat.reshape(B, 3, h, w, p, p, C)
        lat = jnp.transpose(lat, (0, 2, 4, 3, 5, 1, 6))
        lat = lat.reshape(B, h * p, w * p, 3 * C)

        planes = self.conv_sr(lat)
        R = planes.shape[1]
        planes = planes.reshape(B, R, R, 3, cfg.plane_channels)
        return jnp.transpose(planes, (0, 3, 1, 2, 4))
