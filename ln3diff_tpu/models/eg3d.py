"""EG3D ``TriPlaneGenerator``: StyleGAN2 backbone → triplane → render.

Capability assembly of the reference's eg3d-compat generator
(``nsr/triplane.py:29-300``: ``StyleGAN2Backbone`` mapping+synthesis at
256² with 96 output channels, viewed as 3×32-channel planes, rendered by
``ImportanceRenderer`` + ``OSGDecoder``).  No released LN3Diff checkpoint
samples from it — the reference keeps it for legacy EG3D warm-starts —
so this is the z/c→3D GAN path, built from the repo's StyleGAN blocks.

Deviation (documented): blocks consume one w per block (ws[:, i]) rather
than one w per conv layer; converted legacy checkpoints would need the
per-layer broadcast (the mapping's num_ws already matches blocks here).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..render.renderer import RenderOptions, render_rays
from ..render.ray_sampler import sample_full_rays, unpack_25d_camera
from .osg_decoder import OSGDecoder
from .stylegan import (MappingNetwork, SynthesisBlockSG2, SynthesisLayerSG2,
                       ToRGBSG2)


def _nf(res: int, channel_base: int = 32768, channel_max: int = 512) -> int:
    return min(channel_base // res, channel_max)


class SynthesisNetworkSG2(nn.Module):
    """StyleGAN2 skip-architecture synthesis: learned 4x4 const →
    up-blocks to ``img_resolution`` with the standard channel schedule
    (``networks_stylegan2.py:626-700``)."""
    img_resolution: int = 256
    img_channels: int = 96           # 3 planes x 32
    w_dim: int = 512

    @property
    def block_resolutions(self):
        res, out = 8, []
        while res <= self.img_resolution:
            out.append(res)
            res *= 2
        return out

    @property
    def num_ws(self):
        return len(self.block_resolutions) + 1

    @nn.compact
    def __call__(self, ws, noise_mode: str = 'none'):
        B = ws.shape[0]
        c0 = _nf(4)
        const = self.param('const', nn.initializers.normal(1.0),
                           (4, 4, c0))
        x = jnp.broadcast_to(const[None], (B, 4, 4, c0))
        x = SynthesisLayerSG2(c0, 4, name='b4_conv1')(
            x, ws[:, 0], noise_mode)
        img = ToRGBSG2(self.img_channels, name='b4_torgb')(x, ws[:, 0])
        for i, res in enumerate(self.block_resolutions):
            x, img = SynthesisBlockSG2(
                _nf(res), res, img_channels=self.img_channels,
                name=f'b{res}')(x, img, ws[:, i + 1], noise_mode)
        return img


@dataclasses.dataclass(frozen=True)
class TriPlaneGeneratorConfig:
    z_dim: int = 512
    c_dim: int = 25                  # camera-conditioned (EG3D gen_pose_cond)
    w_dim: int = 512
    plane_resolution: int = 256
    plane_channels: int = 32
    decoder_output_dim: int = 32


class TriPlaneGenerator(nn.Module):
    """z (+ camera label c) → w → synthesis → (B, 3, H, W, C) planes,
    with render/query heads sharing the repo renderer."""
    cfg: TriPlaneGeneratorConfig = TriPlaneGeneratorConfig()

    def setup(self):
        cfg = self.cfg
        self.synthesis = SynthesisNetworkSG2(
            img_resolution=cfg.plane_resolution,
            img_channels=3 * cfg.plane_channels, w_dim=cfg.w_dim)
        self.mapping = MappingNetwork(
            z_dim=cfg.z_dim, c_dim=cfg.c_dim, w_dim=cfg.w_dim,
            num_ws=self.synthesis.num_ws)
        self.decoder = OSGDecoder(
            decoder_output_dim=cfg.decoder_output_dim)

    def generate_planes(self, z, c=None, truncation_psi: float = 1.0):
        ws = self.mapping(z, c, truncation_psi=truncation_psi)
        img = self.synthesis(ws)                    # (B, H, W, 3C)
        B, H, W, _ = img.shape
        planes = img.reshape(B, H, W, 3, self.cfg.plane_channels)
        return jnp.transpose(planes, (0, 3, 1, 2, 4))

    def __call__(self, z, camera25, opts: RenderOptions,
                 resolution: int = 64, c=None,
                 truncation_psi: float = 1.0, return_ws: bool = False):
        ws = self.mapping(z, c, truncation_psi=truncation_psi)
        img = self.synthesis(ws)                    # (B, H, W, 3C)
        B, H, W, _ = img.shape
        planes = jnp.transpose(
            img.reshape(B, H, W, 3, self.cfg.plane_channels),
            (0, 3, 1, 2, 4))
        cam2world, intrinsics = unpack_25d_camera(camera25)
        ray_o, ray_d = sample_full_rays(cam2world, intrinsics, resolution)
        out = render_rays(None, planes,
                          lambda f, d: self.decoder(f, d),
                          ray_o, ray_d, opts)
        rgb = out.feature_samples[..., :3].reshape(B, resolution,
                                                   resolution, 3)
        ret = {'image_raw': rgb, 'planes': planes,
               'image_depth': out.depth_samples.reshape(
                   B, resolution, resolution, 1)}
        if return_ws:
            ret['ws'] = ws
        return ret

    def query_points(self, planes, coords, box_warp: float):
        """σ/rgb at world coords (B, M, 3) — the teacher side of the
        EG3D warm-up shape supervision (``train_util_with_eg3d.py``
        queries densities at shared coords on both models)."""
        from ..render.renderer import sample_from_planes
        feats = sample_from_planes(planes, coords, box_warp)
        return self.decoder(feats, None)
