"""Ray generation from cameras (OpenCV convention).

TPU-native rewrite of ``nsr/volumetric_rendering/ray_sampler.py``:
full-image rays (reference ``RaySampler.forward:197-257``) and patch rays
(reference ``PatchRaySampler:260-331``).  The reference samples the patch
origin with host-side Python ``random``; here the patch origin is an explicit
``(h_start, w_start)`` input so the jitted function keeps static shapes —
patch-origin randomness lives in the data pipeline / trainer
(``ln3diff_tpu.training``), which mirrors the fg-bbox-biased sampling policy
(87.5% foreground, reference ``ray_sampler.py:109-145``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .math_utils import normalize_vecs


def unpack_25d_camera(c: jax.Array):
    """Split the 25-dim camera label into cam2world + intrinsics.

    Reference ``nsr/triplane.py:524-527``: ``c = [cam2world.flatten(16),
    intrinsics.flatten(9)]`` with intrinsics normalized by resolution.
    """
    cam2world = c[..., :16].reshape(*c.shape[:-1], 4, 4)
    intrinsics = c[..., 16:25].reshape(*c.shape[:-1], 3, 3)
    return cam2world, intrinsics


def pack_25d_camera(cam2world: jax.Array, intrinsics: jax.Array) -> jax.Array:
    return jnp.concatenate([
        cam2world.reshape(*cam2world.shape[:-2], 16),
        intrinsics.reshape(*intrinsics.shape[:-2], 9),
    ], axis=-1)


def _lift_uv_to_rays(uv: jax.Array, cam2world: jax.Array,
                     intrinsics: jax.Array):
    """Lift uv (N, M, 2) in [0,1] image coords through the pinhole model and
    transform into world rays.  Mirrors reference ``RaySampler.forward``.
    """
    N, M = uv.shape[0], uv.shape[1]
    cam_locs_world = cam2world[:, :3, 3]
    fx = intrinsics[:, 0, 0][:, None]
    fy = intrinsics[:, 1, 1][:, None]
    cx = intrinsics[:, 0, 2][:, None]
    cy = intrinsics[:, 1, 2][:, None]
    sk = intrinsics[:, 0, 1][:, None]

    x_cam = uv[:, :, 0]
    y_cam = uv[:, :, 1]
    z_cam = jnp.ones((N, M), dtype=uv.dtype)

    x_lift = (x_cam - cx + cy * sk / fy - sk * y_cam / fy) / fx * z_cam
    y_lift = (y_cam - cy) / fy * z_cam

    cam_rel = jnp.stack([x_lift, y_lift, z_cam, jnp.ones_like(z_cam)], axis=-1)
    world = jnp.einsum('nij,nmj->nmi', cam2world, cam_rel)[..., :3]

    ray_dirs = normalize_vecs(world - cam_locs_world[:, None, :])
    ray_origins = jnp.broadcast_to(cam_locs_world[:, None, :], ray_dirs.shape)
    return ray_origins, ray_dirs


def full_image_uv(resolution: int, batch: int) -> jax.Array:
    """Pixel-center uv grid in [0,1], x-major flattening (matches the
    reference's ``flip(0)`` ij→xy ordering at ``ray_sampler.py:192``)."""
    ii, jj = jnp.meshgrid(jnp.arange(resolution, dtype=jnp.float32),
                          jnp.arange(resolution, dtype=jnp.float32),
                          indexing='ij')
    uv = jnp.stack([jj, ii], axis=-1)  # (H, W, 2) with x first
    uv = uv.reshape(-1, 2) * (1.0 / resolution) + (0.5 / resolution)
    return jnp.broadcast_to(uv[None], (batch, resolution * resolution, 2))


def sample_full_rays(cam2world: jax.Array, intrinsics: jax.Array,
                     resolution: int):
    """Full-image rays: returns (origins (N,R,3), dirs (N,R,3))."""
    uv = full_image_uv(resolution, cam2world.shape[0])
    return _lift_uv_to_rays(uv, cam2world, intrinsics)


def patch_uv(h_start: jax.Array, w_start: jax.Array, patch_resolution: int,
             resolution: int) -> jax.Array:
    """uv grid for a patch at (h_start, w_start), static patch size.

    Args:
      h_start, w_start: ``(N,)`` int starts.
    Returns:
      ``(N, patch_resolution**2, 2)`` uv in [0,1].
    """
    ii, jj = jnp.meshgrid(jnp.arange(patch_resolution, dtype=jnp.float32),
                          jnp.arange(patch_resolution, dtype=jnp.float32),
                          indexing='ij')
    base = jnp.stack([jj, ii], axis=-1).reshape(-1, 2)  # x first
    start = jnp.stack([w_start, h_start], axis=-1).astype(jnp.float32)
    uv = (base[None] + start[:, None, :]) * (1.0 / resolution) \
        + (0.5 / resolution)
    return uv


def sample_patch_rays(cam2world: jax.Array, intrinsics: jax.Array,
                      h_start: jax.Array, w_start: jax.Array,
                      patch_resolution: int, resolution: int):
    """Patch rays with explicit integer patch origins (static shapes)."""
    uv = patch_uv(h_start, w_start, patch_resolution, resolution)
    return _lift_uv_to_rays(uv, cam2world, intrinsics)


def sample_patch_origins(rng: np.random.Generator, batch: int,
                         patch_resolution: int, resolution: int,
                         fg_bbox: np.ndarray | None = None,
                         fg_prob: float = 0.875):
    """Host-side patch-origin sampling policy (numpy), mirroring the
    reference's ``create_patch_uv`` fg-bbox-biased crops
    (``ray_sampler.py:72-166``): with prob ``fg_prob`` the patch is placed to
    overlap the foreground bbox, else anywhere (boundary-oversampled).

    Args:
      fg_bbox: optional ``(batch, 4)`` [top, left, height_max, width_max].
    Returns:
      (h_start, w_start): int32 arrays ``(batch,)``.
    """
    def sample_end(lo, hi):
        end = int(rng.integers(lo, hi + 1))
        return min(max(end, patch_resolution), resolution)

    h_starts, w_starts = [], []
    for b in range(batch):
        use_fg = fg_bbox is not None and rng.random() < fg_prob
        if use_fg:
            top, left, hmax, wmax = [int(v) for v in fg_bbox[b]]
            if top + patch_resolution < hmax:
                h_end = sample_end(top + patch_resolution, hmax)
            else:
                h_end = max(hmax, patch_resolution)
            if left + patch_resolution < wmax:
                w_end = sample_end(left + patch_resolution, wmax)
            else:
                w_end = max(wmax, patch_resolution)
        else:
            h_end = sample_end(patch_resolution, resolution + patch_resolution)
            w_end = sample_end(patch_resolution, resolution + patch_resolution)
        h_starts.append(h_end - patch_resolution)
        w_starts.append(w_end - patch_resolution)
    return (np.asarray(h_starts, np.int32), np.asarray(w_starts, np.int32))
