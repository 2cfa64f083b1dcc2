"""Stage-1 triplane VAE: encoder → KL bottleneck → DiT2 decode → planes →
volume render.

TPU-native re-assembly of the reference's flagship Objaverse path
(``nsr/script_util.py:create_3DAE_model`` building ``AE`` around
``RodinSR_256_fusionv6_ConvQuant_liteSR_dinoInit3DAttn_SD_B_3L_C_withrollout_withSD_D_ditDecoder``
from ``vit/vit_triplane.py:1517+``), collapsed into one module with pure
functional sub-paths instead of the reference's ``forward(behaviour=...)``
multiplexing (``nsr/script_util.py:287-377`` — that pattern only existed to
satisfy DDP; pjit needs no such trick):

  * ``encode``          — SD MVEncoder → quant_conv → moments
                          (reference ``vae_encode``, ``vit_triplane.py:912``)
  * ``reparameterize``  — DiagonalGaussian sample + KL
                          (reference ``vae_reparameterization:1786``)
  * ``decode_latent``   — PatchEmbedTriplane → DiT2 → unflatten → SD-Decoder
                          upsampler → planes (reference
                          ``vit_decode_backbone:1702`` /
                          ``vit_decode_postprocess:1720``)
  * ``render``          — triplane volume render + optional SR
                          (reference ``nsr/triplane.py:505-750``)

Latent layout: ``(B, h, w, z*plane)`` channels-last with plane fastest —
matches the reference's ``(B, z*3, h, w)`` ``'b (c n) h w'`` convention for
checkpoint conversion.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..render.ray_sampler import unpack_25d_camera, sample_full_rays
from ..render.renderer import RenderOptions, render_rays
from .dit import DiT2, DiT2Config
from .distributions import DiagonalGaussian, make_gaussian
from .osg_decoder import OSGDecoder, LRMOSGDecoder
from .sd_vae import (AutoencoderConfig, Decoder, Encoder, MVEncoder,
                     MVEncoderDynamic)
from .sr import NearestConvSR


@dataclasses.dataclass(frozen=True)
class TriplaneVAEConfig:
    # encoder
    encoder_in_channels: int = 10      # RGB + 6 Plücker + depth
    encoder_ch: int = 64
    encoder_ch_mult: tuple = (1, 2, 4, 4)
    encoder_res_blocks: int = 1
    img_resolution: int = 256
    num_views: int = 4                 # 0 → mono encoder; >4 → dynamic mean
    # 'sd' (SD conv MVEncoder, released archs) or 'lgm' (LGM MVUNet
    # encoder with joint-view attention, reference 'lgm' dino_version)
    encoder_type: str = 'sd'
    lgm_down_channels: tuple = (64, 128, 256, 512)
    lgm_down_attention: tuple = (False, False, True, True)
    # bottleneck
    ldm_z_channels: int = 4            # per-plane latent channels
    latent_size: int = 32              # latent h = w
    # decoder backbone
    dit2: DiT2Config = DiT2Config()
    patch_size: int = 2                # ldm_upsample patch embed
    # plane upsampler (SD Decoder as deconv)
    conv_sr_ch: int = 32
    conv_sr_ch_mult: tuple = (1, 2, 2, 4)
    conv_sr_res_blocks: int = 1
    plane_channels: int = 32           # triplane C (decoder_in_chans)
    # point decoder
    decoder_output_dim: int = 32
    lrm_decoder: bool = False
    # render-space SR: 'nearest' (objaverse/shapenet NearestConvSR) or
    # 'stylegan' (FFHQ SuperresolutionHybrid, w-modulated convs)
    use_sr: bool = False
    sr_ratio: int = 2
    sr_module: str = 'nearest'
    # NeRF++ background (FFHQ/car fg/bg configs): planes channel-split
    # fg | bg, inverted-sphere bg samples composited by residual
    # transmittance (reference ``Triplane_fg_bg_plane``).
    use_background: bool = False
    bg_depth_resolution: int = 16
    dtype: Any = jnp.float32

    @property
    def plane_resolution(self) -> int:
        up = 2**(len(self.conv_sr_ch_mult) - 1)
        return (self.latent_size // self.patch_size) * up

    @property
    def latent_channels(self) -> int:
        return 3 * self.ldm_z_channels


class TriplaneVAE(nn.Module):
    cfg: TriplaneVAEConfig

    def setup(self):
        cfg = self.cfg
        enc_cfg = AutoencoderConfig(
            ch=cfg.encoder_ch, ch_mult=tuple(cfg.encoder_ch_mult),
            num_res_blocks=cfg.encoder_res_blocks,
            resolution=cfg.img_resolution, z_channels=3 * cfg.ldm_z_channels,
            double_z=True, dtype=cfg.dtype)
        if cfg.encoder_type == 'lgm':
            from .mv_unet import LGMMVEncoder, MVUNetConfig
            self.encoder = LGMMVEncoder(
                MVUNetConfig(in_channels=cfg.encoder_in_channels,
                             down_channels=tuple(cfg.lgm_down_channels),
                             down_attention=tuple(cfg.lgm_down_attention),
                             num_frames=max(cfg.num_views, 1),
                             dtype=cfg.dtype),
                z_channels=3 * cfg.ldm_z_channels, double_z=True)
        elif cfg.num_views == 0:
            self.encoder = Encoder(enc_cfg)
        elif cfg.num_views > 4:
            self.encoder = MVEncoderDynamic(enc_cfg,
                                            num_frames=cfg.num_views)
        else:
            self.encoder = MVEncoder(enc_cfg, num_frames=cfg.num_views)

        # 1x1 grouped conv over per-plane moment channels
        # (reference quant_conv, vit_triplane.py:854-857).
        self.quant_conv = nn.Conv(2 * 3 * cfg.ldm_z_channels, (1, 1),
                                  feature_group_count=3, dtype=cfg.dtype,
                                  name='quant_conv')

        # grouped patch embed (reference PatchEmbedTriplane,
        # vit_triplane.py:58-108).
        self.ldm_upsample = nn.Conv(
            self.cfg.dit2.hidden_size * 3,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), padding='VALID',
            feature_group_count=3, dtype=cfg.dtype, name='ldm_upsample')

        self.dit2 = DiT2(cfg.dit2)

        self.conv_sr = Decoder(AutoencoderConfig(
            ch=cfg.conv_sr_ch, ch_mult=tuple(cfg.conv_sr_ch_mult),
            num_res_blocks=cfg.conv_sr_res_blocks,
            resolution=cfg.plane_resolution, z_channels=cfg.dit2.hidden_size,
            out_ch=cfg.plane_channels, dtype=cfg.dtype))

        if cfg.lrm_decoder:
            self.osg_decoder = LRMOSGDecoder()
        else:
            self.osg_decoder = OSGDecoder(
                decoder_output_dim=cfg.decoder_output_dim)
        if cfg.use_background:
            self.bg_decoder = OSGDecoder(
                decoder_output_dim=cfg.decoder_output_dim,
                name='bg_decoder')

        if cfg.use_sr:
            if cfg.sr_module == 'stylegan-8xdc':
                # exact released FFHQ head (nsr/superresolution.py:384)
                from .stylegan import SuperresolutionHybrid8XDC
                self.superresolution = SuperresolutionHybrid8XDC()
                # reference w_avg buffer, "replaced externally"
                # (vit_triplane.py:149,220); converter maps it in
                self.sr_ws = self.param('sr_ws', nn.initializers.zeros,
                                        (512,))
            elif cfg.sr_module == 'stylegan':
                from .stylegan import SuperresolutionHybrid
                self.superresolution = SuperresolutionHybrid(
                    sr_ratio=cfg.sr_ratio)
                # The VAE has no StyleGAN mapping network — the modulation
                # style is a learned constant (the reference conditions SR
                # on the generator's w; in the AE it is effectively fixed).
                self.sr_ws = self.param(
                    'sr_ws', nn.initializers.normal(0.02), (512,))
            else:
                self.superresolution = NearestConvSR(sr_ratio=cfg.sr_ratio,
                                                     dtype=cfg.dtype)

    # -- encoder ----------------------------------------------------------

    def encode(self, imgs: jax.Array) -> jax.Array:
        """(B*V, H, W, C_in) → moments (B, h, w, 2z, 3).

        The channel unpacking replicates the reference's ``vae_encode``
        (``vit_triplane.py:912-933``): the grouped ``quant_conv`` output
        (plane-major groups) is *viewed* as (2z, plane) with plane
        fastest — a fixed interleave the released weights absorbed, so
        it must be reproduced bit-for-bit, not "fixed"."""
        cfg = self.cfg
        h = self.encoder(imgs)
        moments = self.quant_conv(h)
        B, hh, ww, C = moments.shape
        return moments.reshape(B, hh, ww, 2 * cfg.ldm_z_channels, 3)

    def reparameterize(self, moments: jax.Array, key: Optional[jax.Array],
                       sample_posterior: bool = True):
        """moments (B, h, w, 2z, 3) → latent (B, h, w, z*3), channel
        layout z*3+p (plane fastest — the reference's 'b (c n) h w'
        ``latent_normalized_2Ddiffusion``, ``vit_triplane.py:1812``)."""
        cfg = self.cfg
        z = cfg.ldm_z_channels
        mean, logvar = moments[..., :z, :], moments[..., z:, :]
        posterior = make_gaussian(mean, logvar, soft_clamp=True)
        if sample_posterior and key is not None:
            latent = posterior.sample(key)
        else:
            latent = posterior.mode()
        B, hh, ww, _, _ = latent.shape
        latent = latent.reshape(B, hh, ww, z * 3)
        return latent, posterior

    # -- decoder ----------------------------------------------------------

    def decode_latent(self, latent: jax.Array) -> jax.Array:
        """latent (B, h, w, z*3) → planes (B, 3, Hp, Wp, C).

        Mirrors the reference exactly, including its absorbed channel
        interleaves: the grouped ``ldm_upsample`` consumes the raw
        z*3+p latent channels (``vit_decode_backbone``,
        ``vit_triplane.py:1713``) and its plane-grouped output channels
        are *viewed* as (D, plane) with plane fastest
        (``PatchEmbedTriplane.forward``, ``vit_triplane.py:90-108``)."""
        cfg = self.cfg
        B, hh, ww, _ = latent.shape
        tok = self.ldm_upsample(latent.astype(cfg.dtype))
        th, tw = tok.shape[1], tok.shape[2]
        D = cfg.dit2.hidden_size
        # (B, th, tw, 3*D) channels viewed (D, 3) → plane-major tokens
        tok = tok.reshape(B, th * tw, D, 3)
        tok = jnp.transpose(tok, (0, 3, 1, 2)).reshape(B, 3 * th * tw, D)

        tok = self.dit2(tok)  # (B, 3L, D)

        # unflatten tokens → (B*3, th, tw, D) (reference unflatten_token,
        # vit_triplane.py:1728-1757).
        tok = tok.reshape(B * 3, th, tw, D)
        planes = self.conv_sr(tok)  # (B*3, Hp, Wp, C)
        Hp, Wp, C = planes.shape[1:]
        return planes.reshape(B, 3, Hp, Wp, C)

    # -- rendering --------------------------------------------------------

    def _fused_osg(self):
        """Build the fused Pallas point pipeline from this module's bound
        OSG params (inference paths; OSGDecoder only)."""
        from ..ops.fused_render import fused_osg_from_params
        assert not self.cfg.lrm_decoder, \
            'fused OSG kernel supports the OSGDecoder arch only'
        return fused_osg_from_params(
            self.osg_decoder.variables['params'],
            lr_multiplier=self.osg_decoder.decoder_lr_mul,
            activation=self.osg_decoder.activation)

    def render(self, planes: jax.Array, camera25: jax.Array,
               render_opts: RenderOptions, resolution: int,
               key: Optional[jax.Array] = None,
               ray_origins: Optional[jax.Array] = None,
               ray_directions: Optional[jax.Array] = None,
               apply_sr: bool = True, use_fused_osg: bool = False):
        """Volume-render planes for cameras (25-dim labels) or given rays.

        Returns dict: image_raw (B,res,res,3), feature_image, image_depth,
        image_mask, image_sr (if SR head present).
        """
        if ray_origins is None:
            cam2world, intrinsics = unpack_25d_camera(camera25)
            ray_origins, ray_directions = sample_full_rays(
                cam2world, intrinsics, resolution)
        if self.cfg.use_background:
            from ..render.background import render_rays_fg_bg
            out = render_rays_fg_bg(
                key, planes, lambda f, d: self.osg_decoder(f, d),
                lambda f, d: self.bg_decoder(f, d),
                ray_origins, ray_directions, render_opts,
                bg_depth_resolution=self.cfg.bg_depth_resolution,
                fused_osg=self._fused_osg() if use_fused_osg else None)
        else:
            out = render_rays(key, planes,
                              lambda f, d: self.osg_decoder(f, d),
                              ray_origins, ray_directions, render_opts,
                              fused_osg=self._fused_osg() if use_fused_osg
                              else None)
        B, R = ray_origins.shape[:2]
        if R == resolution * resolution:
            res_h = res_w = resolution
        else:
            # caller-supplied ray bundle of a different square size
            res_h = res_w = int(round(R**0.5))
            assert res_h * res_w == R, (
                f'render() needs a square ray bundle (R={R}); use '
                'render_rays_flat for arbitrary bundles')
        feature_image = out.feature_samples.reshape(B, res_h, res_w, -1)
        depth_image = out.depth_samples.reshape(B, res_h, res_w, 1)
        weights = out.weights_samples.reshape(B, res_h, res_w, 1)
        mask_image = weights * 1.002 - 0.001
        rgb = feature_image[..., :3]
        ret = dict(feature_image=feature_image, image_raw=rgb,
                   image_depth=depth_image, image_mask=mask_image)
        if self.cfg.use_sr and apply_sr:
            if self.cfg.sr_module.startswith('stylegan'):
                ws = jnp.broadcast_to(self.sr_ws, (B,) + self.sr_ws.shape)
                ret['image_sr'] = self.superresolution(feature_image, rgb,
                                                       ws)
            else:
                ret['image_sr'] = self.superresolution(feature_image)
        return ret

    def render_rays_flat(self, planes: jax.Array, ray_origins: jax.Array,
                         ray_directions: jax.Array,
                         render_opts: RenderOptions,
                         use_fused_osg: bool = False):
        """Render arbitrary ray bundles → flat (B, R, C) features.

        Unlike :meth:`render` there is no image reshape/SR, so R need not
        be square — callers can fold an orbit's frames into the ray axis
        and keep ONE set of planes / ONE corner-packed gather table
        (``pipeline.render_orbit`` does this; repeating planes per frame
        re-packs the table every call)."""
        assert not self.cfg.use_background, 'flat path is fg-only'
        out = render_rays(None, planes,
                          lambda f, d: self.osg_decoder(f, d),
                          ray_origins, ray_directions, render_opts,
                          fused_osg=self._fused_osg() if use_fused_osg
                          else None)
        return out.feature_samples

    # -- convenience end-to-end -------------------------------------------

    def __call__(self, imgs: jax.Array, camera25: jax.Array,
                 render_opts: RenderOptions, resolution: int,
                 key: Optional[jax.Array] = None,
                 sample_posterior: bool = True):
        """Full autoencode: multi-view images → novel-view renders."""
        if key is not None:
            k_vae, k_render = jax.random.split(key)
        else:
            k_vae = k_render = None
        moments = self.encode(imgs)
        latent, posterior = self.reparameterize(moments, k_vae,
                                                sample_posterior)
        planes = self.decode_latent(latent)
        ret = self.render(planes, camera25, render_opts, resolution, k_render)
        ret.update(latent=latent, posterior_kl=posterior.kl(), planes=planes)
        return ret

    def init_decoder_paths(self, latents: jax.Array, camera25: jax.Array,
                           render_opts: RenderOptions, resolution: int):
        """Initialization helper touching every sampling-time submodule
        (decoder backbone, renderer MLP, SR head, point queries) without
        the encoder — use as ``vae.init(key, ..., method=
        vae.init_decoder_paths)`` for decode-only inference."""
        planes = self.decode_latent(latents)
        ret = self.render(planes, camera25, render_opts, resolution, None)
        coords = jnp.zeros((planes.shape[0], 8, 3))
        self.query_points(planes, coords, render_opts.box_warp)
        return ret

    # -- point queries (mesh extraction) ----------------------------------

    def query_points(self, planes: jax.Array, coords: jax.Array,
                     box_warp: float, use_fused_osg: bool = False):
        """Dense σ/rgb queries for marching cubes (reference
        ``triplane_decode_grid``, ``vit/vit_triplane.py:1625-1692``).

        coords: (B, M, 3) world coordinates. Returns (rgb, sigma).
        """
        from ..render.renderer import (pack_corner_table, packed_gather,
                                       project_onto_planes,
                                       sample_from_planes)
        if self.cfg.use_background:   # mesh queries use the fg half
            planes = planes[..., :planes.shape[-1] // 2]
        if use_fused_osg:
            B, n_planes, H, W, C = planes.shape
            packed = pack_corner_table(planes)
            proj = project_onto_planes((2.0 / box_warp) * coords)
            rows, tx, ty, live = packed_gather(packed, proj, H, W)
            return self._fused_osg()(rows, tx, ty, live)
        feats = sample_from_planes(planes, coords, box_warp)
        return self.osg_decoder(feats, None)
