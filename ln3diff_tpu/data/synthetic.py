"""Procedural multi-view dataset (numpy ray-traced sphere scenes).

Serves the role of the reference's ``load_memory_data`` overfit mode
(``datasets/shapenet.py:221``, ``scripts/vit_triplane_train.py:97-108``):
a deterministic in-memory instance for sanity-checking the VAE
end-to-end, plus the test suite's ground truth.  Produces the reference
batch schema (SURVEY §2.7): ``img_to_encoder`` (V, H, W, 10 =
RGB + depth + 6-ch Plücker), ``img``, ``depth``, ``depth_mask``, ``c``
(25-dim camera), ``bbox``.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..render.camera import (create_cam2world_matrix, fov_to_intrinsics,
                             lookat_pose)


def _rays_for_camera(cam2world, intrinsics, resolution):
    """Pixel-center rays (numpy mirror of the jax ray sampler)."""
    ii, jj = np.meshgrid(np.arange(resolution), np.arange(resolution),
                         indexing='ij')
    uv_x = (jj + 0.5) / resolution
    uv_y = (ii + 0.5) / resolution
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    x = (uv_x - cx) / fx
    y = (uv_y - cy) / fy
    z = np.ones_like(x)
    dirs = np.stack([x, y, z], axis=-1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = dirs @ cam2world[:3, :3].T
    origins = np.broadcast_to(cam2world[:3, 3], dirs.shape)
    return origins.astype(np.float32), dirs.astype(np.float32)


def _trace_sphere(origins, dirs, center, radius):
    """Ray-sphere intersection: returns (hit mask, depth)."""
    oc = origins - center
    b = np.sum(oc * dirs, axis=-1)
    c = np.sum(oc * oc, axis=-1) - radius**2
    disc = b * b - c
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0))
    hit &= t > 0
    return hit, np.where(hit, t, 0.0)


def _shade(points, normals):
    """Position-colored lambertian shading in [0, 1]."""
    albedo = 0.5 + 0.5 * np.clip(points * 2.5, -1, 1)
    light = np.array([0.5, 0.7, -0.5])
    light = light / np.linalg.norm(light)
    lam = np.clip(np.sum(normals * light, axis=-1, keepdims=True), 0, 1)
    return albedo * (0.35 + 0.65 * lam)


@dataclasses.dataclass
class SyntheticScene:
    center: np.ndarray
    radius: float

    def render(self, cam2world, intrinsics, resolution):
        o, d = _rays_for_camera(cam2world, intrinsics, resolution)
        hit, t = _trace_sphere(o, d, self.center, self.radius)
        pts = o + t[..., None] * d
        normals = (pts - self.center) / self.radius
        rgb01 = np.where(hit[..., None], _shade(pts, normals), 1.0)
        depth = t.astype(np.float32)
        return (rgb01.astype(np.float32), depth, hit.astype(np.float32))


def make_multiview_batch(num_views: int = 4, resolution: int = 256,
                         render_resolution: int = 128,
                         radius_cam: float = 1.8, fov: float = 40.0,
                         sphere_radius: float = 0.35, seed: int = 0):
    """One instance, V posed views. Returns the reference batch dict."""
    rng = np.random.default_rng(seed)
    scene = SyntheticScene(center=np.zeros(3) + rng.uniform(
        -0.05, 0.05, 3), radius=sphere_radius)

    yaw = rng.uniform(0, 2 * np.pi) + np.arange(num_views) \
        * (2 * np.pi / num_views)
    pitch = np.full(num_views, np.pi / 2 - 0.3)
    cam2world = lookat_pose(yaw, pitch, radius=radius_cam)
    intr = fov_to_intrinsics(fov)

    imgs, depths, masks, cams, enc_inputs = [], [], [], [], []
    imgs_lr, depths_lr, masks_lr = [], [], []
    for v in range(num_views):
        rgb01, depth, mask = scene.render(cam2world[v], intr, resolution)
        rgb01_lr, depth_lr, mask_lr = scene.render(cam2world[v], intr,
                                                   render_resolution)
        o, d = _rays_for_camera(cam2world[v], intr, resolution)
        plucker = np.concatenate([np.cross(o, d), d], axis=-1)
        enc_in = np.concatenate(
            [rgb01 * 2 - 1, depth[..., None], plucker], axis=-1)
        enc_inputs.append(enc_in.astype(np.float32))
        imgs.append(rgb01 * 2 - 1)
        depths.append(depth)
        masks.append(mask)
        imgs_lr.append(rgb01_lr * 2 - 1)
        depths_lr.append(depth_lr)
        masks_lr.append(mask_lr)
        cams.append(np.concatenate([cam2world[v].reshape(16),
                                    intr.reshape(9)]))

    # fg bbox per view: [top, left, height_max, width_max]
    bboxes = []
    for m in masks:
        ys, xs = np.nonzero(m > 0.5)
        if len(ys) == 0:
            bboxes.append(np.array([0, 0, resolution, resolution]))
        else:
            bboxes.append(np.array([ys.min(), xs.min(), ys.max() + 1,
                                    xs.max() + 1]))

    return {
        'img_to_encoder': np.stack(enc_inputs).astype(np.float32),
        'img': np.stack(imgs_lr).astype(np.float32),
        'img_hr': np.stack(imgs).astype(np.float32),
        'depth': np.stack(depths_lr).astype(np.float32),
        'depth_mask': np.stack(masks_lr).astype(np.float32),
        'c': np.stack(cams).astype(np.float32),
        'bbox': np.stack(bboxes).astype(np.int32),
    }


def load_memory_data(batch_size: int, num_views: int = 4,
                     resolution: int = 256, render_resolution: int = 128,
                     seed: int = 0):
    """Infinite iterator over a single cached instance (overfit mode)."""
    batch = make_multiview_batch(num_views, resolution, render_resolution,
                                 seed=seed)
    while True:
        yield batch
