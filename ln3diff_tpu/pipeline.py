"""End-to-end text/image→3D sampling pipeline.

Rewrite of the reference's north-star sampling path
(``scripts/vit_triplane_diffusion_sample_objaverse.py:53-350`` →
``FlowMatchingEngine.eval_cldm`` ``nsr/lsgm/flow_matching_trainer.py:553``
→ ``render_video_given_triplane`` ``nsr/train_util_diffusion.py:177-382``):

  1. conditioner → (cond, uncond) context;
  2. denoiser sampling (FM-ODE / DDIM) with CFG as a single jitted scan
     over (B, 32, 32, 12) latents;
  3. sampled latent × triplane_scaling_divider → VAE decode → planes
     (training normalizes x0 = latent / divider, so sampling undoes it;
     reference ``nsr/train_util_diffusion.py:188``);
  4. orbit-camera volume rendering to video frames (all frames batched
     into ONE render call — amortizes the plane gather table);
  5. marching-tetrahedra mesh export.

All model params flow through jit as EXPLICIT arguments — closing over a
param pytree embeds it as HLO constants, which stalls/413s compilation on
tunneled TPU backends.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .diffusion.gaussian import GaussianDiffusion
from .diffusion.transport import Transport
from .render.camera import orbit_cameras
from .render.mesh import export_obj, export_ply, extract_mesh, rotate_x


@jax.jit
def _frames_to_uint8(v):
    """[-1, 1] frames → uint8 (module-level so the jit cache hits across
    pipeline calls — a per-call lambda re-traces every invocation)."""
    return ((jnp.clip(v, -1, 1) + 1) * 127.5).astype(jnp.uint8)


@dataclasses.dataclass
class SamplerSpec:
    kind: str = 'flow_matching'  # 'flow_matching' | 'ddim' | 'plms' | 'dpm'
    num_steps: int = 250
    cfg_scale: float = 6.5
    triplane_scaling_divider: float = 0.96806
    latent_shape: tuple = (32, 32, 12)


class TextTo3DPipeline:
    """Composable pipeline over param-explicit callables.

    Args (all functions take their params pytree first):
      denoiser_fn(params, x, t, context) -> prediction
      decode_fn(params, latents) -> planes
      render_fn(params, planes, cam25) -> images (B, H, W, 3)
      point_decoder_fn(params, planes, coords) -> (rgb, sigma)
    """

    def __init__(self, denoiser_fn, denoiser_params, decode_fn, vae_params,
                 render_fn, point_decoder_fn,
                 sampler: SamplerSpec = SamplerSpec(),
                 diffusion: Optional[GaussianDiffusion] = None,
                 transport: Optional[Transport] = None,
                 render_rays_fn=None, mixing_logit=None,
                 render_dtype=None, serving_mesh=None):
        self.denoiser_fn = denoiser_fn
        self.denoiser_params = denoiser_params
        self.decode_fn = decode_fn
        self.vae_params = vae_params
        self.render_fn = render_fn
        self.point_decoder_fn = point_decoder_fn
        # optional flat-ray renderer (params, planes, ray_o, ray_d) ->
        # (B, R, C): render_orbit folds frames into the ray axis so the
        # corner-packed gather table is built once per chunk and planes
        # are not repeated per frame.  Measured perf-neutral on v5e
        # (1.174 vs 1.125 s for a 24x128² orbit — the per-call repack is
        # cheaper inside jit than standalone) but ~4x lighter on plane
        # HBM; use when memory-bound, not for speed.
        self.render_rays_fn = render_rays_fn
        # LSGM mixed prediction (ShapeNet/FFHQ U-Net): the learnable
        # mixing logit blends the model output with the analytic N(0,I)
        # denoiser inside p_mean_variance.
        self.mixing_logit = mixing_logit
        # Serving knob: cast decoded planes to this dtype before render /
        # mesh queries.  bf16 halves the corner-packed gather table and
        # runs the fused-kernel lerp at 2 elems/VPU lane — measured
        # 88.2 → 77.9 ms per 192² frame with ≤2e-4 abs image deviation
        # (95.7 dB PSNR vs f32).  None (default) keeps f32 end-to-end —
        # the parity/testing configuration.
        self.render_dtype = render_dtype
        # Multi-chip serving: a jax.sharding.Mesh with a 'data' axis —
        # render_orbit shards frames across it (parallel/serving.py) in
        # HBM-budgeted groups of n·frames_per_call; params/planes
        # replicate, each device renders frames_per_call frames per call
        # with the unmodified single-chip program; dispatch_mesh_sigma
        # shards its grid query the same way (point chunks over devices).
        self.serving_mesh = serving_mesh
        self._sharded_orbit = None
        self._sharded_points = None
        if serving_mesh is not None:
            from .parallel.serving import (shard_orbit_render,
                                           shard_points_query)
            if render_fn is not None:
                self._sharded_orbit = shard_orbit_render(render_fn,
                                                         serving_mesh)
            if point_decoder_fn is not None:
                self._sharded_points = shard_points_query(
                    point_decoder_fn, serving_mesh, chunk=2**18)
        self.spec = sampler
        self.diffusion = diffusion
        self.transport = transport or Transport()

        self._sample_jit = jax.jit(self._sample_impl,
                                   static_argnames=('batch',))
        self._decode_jit = jax.jit(decode_fn) if decode_fn else None
        self._render_jit = jax.jit(render_fn) if render_fn else None
        self._render_rays_jit = jax.jit(render_rays_fn) \
            if render_rays_fn else None

    # -- latent sampling ---------------------------------------------------

    def _sample_impl(self, params, mixing_logit, key, cond, uncond,
                     batch: int):
        # mixing_logit flows as an EXPLICIT jit argument: closing over
        # the device array embeds it as an HLO constant at lowering
        # (mlir.ir_constant pulls it to host — the exact anti-pattern
        # the module docstring bans; it surfaced as a RESOURCE_EXHAUSTED
        # read-back in the FFHQ preset CLI).
        spec = self.spec
        shape = (batch,) + tuple(spec.latent_shape)

        if spec.cfg_scale == 1.0:
            # u + 1·(c − u) = c: the unconditional branch cancels, so run
            # the conditional half only (reference skips uncond the same
            # way — ``crossattn_cldm_objv.py:635``; the ShapeNet release
            # samples at cfg 1.0, halving the U-Net FLOPs per step).
            def cfg_fn(x, t, **_):
                ctx = jax.tree_util.tree_map(
                    lambda c: jnp.broadcast_to(
                        c, (batch,) + c.shape[1:]), cond)
                return self.denoiser_fn(params, x, t, ctx)
        else:
            cfg_fn = self._make_cfg_fn(params, cond, uncond, batch)

        if spec.kind == 'flow_matching':
            x = self.transport.sample_ode(cfg_fn, shape, key,
                                          num_steps=spec.num_steps)
        elif spec.kind == 'ddim':
            assert self.diffusion is not None
            x = self.diffusion.ddim_sample_loop(
                cfg_fn, shape, key, mixing_logit=mixing_logit)
        elif spec.kind == 'plms':
            # pseudo linear multistep over the (possibly respaced)
            # schedule — pass a respaced diffusion to control NFE.
            assert self.diffusion is not None
            x = self.diffusion.plms_sample_loop(
                cfg_fn, shape, key, mixing_logit=mixing_logit)
        elif spec.kind == 'dpm':
            # DPM-Solver++(2M): spec.num_steps solver steps over the FULL
            # (unspaced) schedule — pass a diffusion WITHOUT respacing.
            from .diffusion.dpm_solver import dpm_solver_sample_loop
            assert self.diffusion is not None
            x = dpm_solver_sample_loop(self.diffusion, cfg_fn, shape, key,
                                       num_steps=spec.num_steps,
                                       mixing_logit=mixing_logit)
        else:
            raise NotImplementedError(spec.kind)
        return x * spec.triplane_scaling_divider

    def _make_cfg_fn(self, params, cond, uncond, batch: int):
        """Doubled-batch classifier-free guidance (reference
        ``forward_with_cfg``): one denoiser call over [cond; uncond]."""
        spec = self.spec

        def cfg_fn(x, t, **_):
            xx = jnp.concatenate([x, x], axis=0)
            tt = jnp.concatenate([t, t], axis=0)
            both = jax.tree_util.tree_map(
                lambda c, u: jnp.concatenate(
                    [jnp.broadcast_to(c, (batch,) + c.shape[1:]),
                     jnp.broadcast_to(u, (batch,) + u.shape[1:])], axis=0),
                cond, uncond)
            out = self.denoiser_fn(params, xx, tt, both)
            c_out, u_out = jnp.split(out, 2, axis=0)
            return u_out + spec.cfg_scale * (c_out - u_out)

        return cfg_fn

    def sample_latents(self, key, batch: int, cond, uncond):
        """CFG-doubled sampling → latents (B, h, w, C), one jitted scan."""
        return self._sample_jit(self.denoiser_params, self.mixing_logit,
                                key, cond, uncond, batch)

    # -- decode + render ---------------------------------------------------

    def render_orbit(self, planes, num_frames: int = 24,
                     radius: float = 1.8, fov: float = 30.0,
                     pitch_deg: float = 20.0,
                     frames_per_call: Optional[int] = None,
                     render_resolution: Optional[int] = None,
                     samples_per_ray: int = 128,
                     hbm_budget_bytes: float = 4e9,
                     frame_slice: Optional[tuple] = None,
                     cameras: Optional[np.ndarray] = None):
        """Render the evaluation orbit → (B, F, H, W, 3) in [-1, 1].

        ``frame_slice=(a, b)``: render only orbit frames [a, b) (camera
        ring unchanged) — lets callers interleave other device work
        between dispatch groups (see ``__call__``'s mesh overlap).

        ``cameras``: explicit packed ``(F, 25)`` labels (e.g.
        ``render.camera.load_pose_asset('assets/objv_eval_pose.pt')`` —
        the released eval protocol); overrides the analytic orbit and
        ``num_frames``.

        Frames fold into the batch in chunks — enough to amortize the
        gather-table build, small enough that the transient
        gathered-corner tensor (frames·3·rays·samples·4C·4B) stays within
        ``hbm_budget_bytes``.
        """
        if cameras is not None:
            num_frames = len(cameras)
        if frames_per_call is None:
            C = planes.shape[-1]
            res = render_resolution or 128
            itemsize = jnp.dtype(planes.dtype).itemsize  # bf16 rows = 2 B
            bytes_per_frame = (3 * res * res * samples_per_ray * 4 * C
                               * itemsize)
            frames_per_call = max(1, int(hbm_budget_bytes
                                         // bytes_per_frame))
        frames_per_call = min(frames_per_call, num_frames)
        cams = jnp.asarray(cameras) if cameras is not None else \
            jnp.asarray(orbit_cameras(num_frames, radius, fov, pitch_deg))
        if self._sharded_orbit is not None and planes.shape[0] == 1:
            # Multi-chip serving: frames shard over the mesh in groups of
            # n·frames_per_call, so each device's transient stays within
            # the same HBM budget as the single-chip path.  Group tails
            # pad cyclically from the (sliced) ring — every sharded call
            # keeps one static shape — and pads are trimmed after.
            if frame_slice is not None:
                a, b = frame_slice
                cams = cams[a:b]
                num_frames = b - a
            n = self.serving_mesh.shape['data']
            # clamp so a generous HBM budget can't make every device
            # render the whole ring (n-fold redundant compute at small
            # res/short orbits — round-4 advisor finding)
            frames_per_call = min(frames_per_call,
                                  max(1, -(-num_frames // n)))
            group = n * frames_per_call
            outs = []
            for f0 in range(0, num_frames, group):
                idx = (f0 + jnp.arange(group)) % num_frames
                out = self._sharded_orbit(self.vae_params, planes,
                                          cams[idx])
                outs.append(out[:min(group, num_frames - f0)])
            return jnp.concatenate(outs, axis=0)[None]
        while num_frames % frames_per_call:
            frames_per_call -= 1
        if frame_slice is not None:
            a, b = frame_slice
            cams = cams[a:b]
            num_frames = b - a
            frames_per_call = min(frames_per_call, num_frames)
            while num_frames % frames_per_call:
                frames_per_call -= 1
        B = planes.shape[0]

        if self._render_rays_jit is not None and B == 1:
            # fold frames into the ray axis: ONE set of planes, one
            # packed table per chunk (no per-frame plane repetition).
            from .render.ray_sampler import (sample_full_rays,
                                             unpack_25d_camera)
            res = render_resolution or 128
            c2w, intr = unpack_25d_camera(cams)
            ray_o, ray_d = sample_full_rays(c2w, intr, res)  # (F, R, 3)
            ray_o = ray_o.reshape(1, -1, 3)
            ray_d = ray_d.reshape(1, -1, 3)
            R = res * res
            chunks = []
            step = frames_per_call * R
            for f0 in range(0, num_frames * R, step):
                feats = self._render_rays_jit(
                    self.vae_params, planes,
                    jax.lax.dynamic_slice_in_dim(ray_o, f0, step, axis=1),
                    jax.lax.dynamic_slice_in_dim(ray_d, f0, step, axis=1))
                chunks.append(feats[..., :3])
            flat = jnp.concatenate(chunks, axis=1)    # (1, F*R, 3)
            return flat.reshape(1, num_frames, res, res, 3)

        chunks = []
        for f0 in range(0, num_frames, frames_per_call):
            cam_chunk = cams[f0:f0 + frames_per_call]
            planes_f = jnp.repeat(planes, frames_per_call, axis=0)
            cams_f = jnp.tile(cam_chunk, (B, 1))
            imgs = self._render_jit(self.vae_params, planes_f, cams_f)
            chunks.append(imgs.reshape(B, frames_per_call,
                                       *imgs.shape[1:]))
        return jnp.concatenate(chunks, axis=1)

    def _mesh_decoder(self, planes):
        params = self.vae_params

        def decoder(coords):
            return self.point_decoder_fn(params, planes[:1], coords)

        return decoder

    def dispatch_mesh_sigma(self, planes, grid_size: int = 192,
                            aabb: float = 0.45, smooth: bool = False):
        """Enqueue the σ-grid device query WITHOUT waiting — returns the
        in-flight device array.  Call before a large host readback (e.g.
        the orbit video) so query compute/transfer overlap with it.

        chunk 2^18 (vs the reference's VRAM-bound 2^16): 27 lax.map
        steps instead of 109 for a 192³ grid — larger fused-kernel grids
        per step, same ≤0.2 GB transient.

        ``smooth`` (default False — the reference-parity raw σ field,
        matching ``export_mesh``; round-4 advisor: all mesh entry points
        share one default): True enables the on-device 3³ σ denoise that
        bounds the host marching stage against noisy fields (the 0.2–3 s
        mesh tail) at sub-voxel iso-surface shift.  Serving callers
        (``__call__``) opt in via ``mesh_smooth=True``."""
        from .render.mesh import _smooth_jit, query_grid_sigma
        if self._sharded_points is not None:
            # multi-chip serving: point chunks shard over the mesh
            lin = jnp.linspace(-aabb, aabb, grid_size)
            gx, gy, gz = jnp.meshgrid(lin, lin, lin, indexing='ij')
            pts = jnp.stack([gx, gy, gz], axis=-1).reshape(1, -1, 3)
            _, sigma = self._sharded_points(self.vae_params, planes[:1],
                                            pts)
            sigmas = sigma[0, :, 0].astype(jnp.float16)
            if smooth:
                g = grid_size
                sigmas = _smooth_jit(sigmas.reshape(g, g, g)).reshape(-1)
            return sigmas
        return query_grid_sigma(self._mesh_decoder(planes), grid_size, aabb,
                                chunk=2**18, smooth=smooth)

    def export_mesh(self, planes, path: str, grid_size: int = 192,
                    aabb: float = 0.45, threshold: float = 10.0,
                    sigma_grid=None, smooth: bool = False):
        """Per-instance mesh export (reference 192³ grid, σ>10, −90° x)."""
        verts, colors, faces = extract_mesh(
            self._mesh_decoder(planes), grid_size=grid_size, aabb=aabb,
            threshold=threshold, sigma_grid=sigma_grid, smooth=smooth)
        verts = rotate_x(verts, -90.0)
        if path.endswith('.ply'):
            export_ply(path, verts, colors, faces)
        else:
            export_obj(path, verts, colors, faces)
        return verts, faces

    # -- full run ----------------------------------------------------------

    def __call__(self, key, cond, uncond, batch: int = 1,
                 num_frames: int = 24, mesh_path: Optional[str] = None,
                 mesh_grid: int = 192,
                 render_resolution: Optional[int] = None,
                 video_uint8: bool = False,
                 cameras: Optional[np.ndarray] = None,
                 mesh_smooth: bool = True):
        """Full run.  ``video_uint8``: return the orbit as host uint8
        frames (serving format; reference writes uint8 mp4 —
        ``train_util_diffusion.py:208-249``) — quarters the device→host
        readback, which dominates on tunneled chips.

        ``mesh_smooth`` (serving default True): on-device 3³ σ denoise
        before marching; pass False for the reference-parity raw field
        (matches ``export_mesh``'s default)."""
        from .render.mesh import (dispatch_vertex_colors, export_obj,
                                  export_ply, march_grid, rotate_x)

        k_sample, _ = jax.random.split(key)
        # sample_latents already returns sample * triplane_scaling_divider
        # (the decoder-space latent); pass it to decode unchanged.
        latents = self.sample_latents(k_sample, batch, cond, uncond)
        planes = self._decode_jit(self.vae_params, latents)

        out = {'latents': latents, 'planes': planes}
        if self.render_dtype is not None:
            planes = planes.astype(self.render_dtype)
        if cameras is not None:
            num_frames = len(cameras)
        if not mesh_path:
            video = self.render_orbit(planes, num_frames,
                                      render_resolution=render_resolution,
                                      cameras=cameras)
            if video_uint8:
                video = _frames_to_uint8(video)
            out['video'] = np.asarray(video) if video_uint8 else video
            return out

        # Interleaved schedule: σ query first, then the HEAD frame group,
        # then — after the (cheap) σ pull — the REST of the orbit is
        # dispatched BEFORE the host marching stage, so marching
        # tetrahedra / rotate / color-dispatch all run while the device
        # chews through in-flight frames instead of leaving it idle
        # (march alone is 0.1–1 s of pure host time).
        from .render.mesh import count_crossing_cells
        sigma_grid = self.dispatch_mesh_sigma(planes, mesh_grid,
                                              smooth=mesh_smooth)
        n_cross = count_crossing_cells(sigma_grid, mesh_grid)  # in-flight
        head = min(max(num_frames // 4, 1), num_frames)
        v1 = self.render_orbit(planes, num_frames,
                               render_resolution=render_resolution,
                               frame_slice=(0, head), cameras=cameras)
        if int(n_cross):
            sigma_np = np.asarray(sigma_grid)   # overlaps head frames
        else:
            sigma_np = None     # empty surface: skip the 14 MB σ pull
        v2 = None
        if head < num_frames:
            v2 = self.render_orbit(planes, num_frames,
                                   render_resolution=render_resolution,
                                   frame_slice=(head, num_frames),
                                   cameras=cameras)
        if sigma_np is not None:
            verts, faces = march_grid(sigma_np, mesh_grid)  # overlaps v2
        else:
            verts = np.zeros((0, 3), np.float32)
            faces = np.zeros((0, 3), np.int64)
        verts_w = rotate_x(verts, -90.0)
        rgb_dev = dispatch_vertex_colors(self._mesh_decoder(planes), verts,
                                         as_uint8=True)
        colors = np.zeros_like(verts) if rgb_dev is None \
            else np.asarray(rgb_dev).astype(np.float32) / 255.0
        if mesh_path.endswith('.ply'):
            export_ply(mesh_path, verts_w, colors, faces)
        else:
            export_obj(mesh_path, verts_w, colors, faces)
        out['mesh'] = (verts_w, faces)
        video = v1 if v2 is None else jnp.concatenate([v1, v2], axis=1)
        if video_uint8:
            video = _frames_to_uint8(video)
        out['video'] = np.asarray(video) if video_uint8 else video
        return out


def save_video_frames(frames: np.ndarray, path_prefix: str):
    """Dump (F, H, W, 3) [-1,1] frames as PNGs (no ffmpeg dependency)."""
    from PIL import Image
    paths = []
    for i, f in enumerate(np.asarray(frames)):
        img = ((np.clip(f, -1, 1) + 1) * 127.5).astype(np.uint8)
        p = f'{path_prefix}_{i:03d}.png'
        Image.fromarray(img).save(p)
        paths.append(p)
    return paths
