"""Camera pose construction (numpy; host-side, feeds jitted renderers).

Rewrite of ``nsr/camera_utils.py:23-229``: look-at pose samplers used for
eval orbits and FFHQ pose sampling, ``create_cam2world_matrix``,
``FOV_to_intrinsics``, ``generate_input_camera`` (the G-Objaverse
pitch/yaw convention with z-up).
"""

from __future__ import annotations

import math

import numpy as np


def _normalize(v, axis=-1):
    return v / np.linalg.norm(v, axis=axis, keepdims=True)


def create_cam2world_matrix(forward_vector: np.ndarray,
                            origin: np.ndarray) -> np.ndarray:
    """y-up, no-roll cam2world from forward dirs + origins; both (B, 3)."""
    forward = _normalize(forward_vector)
    up = np.broadcast_to(np.array([0.0, 1.0, 0.0], np.float32),
                         forward.shape)
    right = -_normalize(np.cross(up, forward))
    up = _normalize(np.cross(forward, right))

    B = forward.shape[0]
    cam2world = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    cam2world[:, :3, :3] = np.stack([right, up, forward], axis=-1)
    cam2world[:, :3, 3] = origin
    return cam2world


def _spherical_origin(h, v, radius):
    """EG3D spherical convention: azimuth h, polar v (radians)."""
    v = np.clip(v, 1e-5, math.pi - 1e-5)
    phi = np.arccos(1 - 2 * (v / math.pi))
    x = radius * np.sin(phi) * np.cos(math.pi - h)
    z = radius * np.sin(phi) * np.sin(math.pi - h)
    y = radius * np.cos(phi)
    return np.stack([x, y, z], axis=-1).astype(np.float32)


def lookat_pose(horizontal: np.ndarray, vertical: np.ndarray,
                lookat_position=np.zeros(3), radius: float = 1.0):
    """LookAtPoseSampler with explicit angles (B,) (reference :71-110)."""
    origins = _spherical_origin(np.asarray(horizontal, np.float64),
                                np.asarray(vertical, np.float64), radius)
    lookat = np.broadcast_to(np.asarray(lookat_position, np.float32),
                             origins.shape)
    return create_cam2world_matrix(lookat - origins, origins)


def gaussian_pose(rng: np.random.Generator, horizontal_mean, vertical_mean,
                  horizontal_stddev=0.0, vertical_stddev=0.0,
                  radius: float = 1.0, batch_size: int = 1):
    h = rng.standard_normal((batch_size,)) * horizontal_stddev \
        + horizontal_mean
    v = rng.standard_normal((batch_size,)) * vertical_stddev + vertical_mean
    origins = _spherical_origin(h, v, radius)
    return create_cam2world_matrix(-origins, origins)


def uniform_pose(rng: np.random.Generator, horizontal_mean, vertical_mean,
                 horizontal_stddev=0.0, vertical_stddev=0.0,
                 radius: float = 1.0, batch_size: int = 1):
    h = (rng.uniform(size=(batch_size,)) * 2 - 1) * horizontal_stddev \
        + horizontal_mean
    v = (rng.uniform(size=(batch_size,)) * 2 - 1) * vertical_stddev \
        + vertical_mean
    origins = _spherical_origin(h, v, radius)
    return create_cam2world_matrix(-origins, origins)


def fov_to_intrinsics(fov_degrees: float) -> np.ndarray:
    """Normalized pinhole intrinsics from FOV (reference :208-219)."""
    focal = float(1 / (math.tan(fov_degrees * 3.14159 / 360) * 1.414))
    return np.array([[focal, 0, 0.5], [0, focal, 0.5], [0, 0, 1]],
                    np.float32)


def generate_input_camera(radius: float, poses_deg, fov: float = 30.0):
    """G-Objaverse z-up pitch/yaw cameras (reference :221-263).

    poses_deg: (B, 2) [pitch, yaw] degrees. Returns (cam2world (B,4,4),
    fxfycxcy (4,)).
    """
    poses = np.deg2rad(np.asarray(poses_deg, np.float64))
    pitch, yaw = poses[:, 0], poses[:, 1]
    z = radius * np.sin(pitch)
    x = radius * np.cos(pitch) * np.cos(yaw)
    y = radius * np.cos(pitch) * np.sin(yaw)
    cam_pos = np.stack([x, y, z], axis=-1).astype(np.float32)

    forward = _normalize(-cam_pos)
    up = np.broadcast_to(np.array([0.0, 0.0, -1.0], np.float32),
                         forward.shape)
    left = _normalize(np.cross(up, forward))
    up = _normalize(np.cross(forward, left))

    B = forward.shape[0]
    cam2world = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    cam2world[:, :3, :3] = np.stack([left, up, forward], axis=-1)
    cam2world[:, :3, 3] = cam_pos

    fx = 0.5 / math.tan(math.radians(fov / 2))
    return cam2world, np.array([fx, fx, 0.5, 0.5], np.float32)


def load_pose_asset(path: str) -> np.ndarray:
    """Load a reference release pose asset (``assets/objv_eval_pose.pt``,
    ``render_cameras.pt``, …): a torch-saved ``(N, 25)`` tensor of packed
    [c2w (16), normalized intrinsics (9)] labels — the exact cameras the
    released eval videos use (``scripts/vit_triplane_diffusion_sample_objaverse.py:180``).

    The objv asset decomposes as: 24-view orbit at pitch 13.73°/r 1.772
    (reproduced bit-exactly by :func:`generate_input_camera`, see
    ``tests/test_render_core.py``), a frame-0 duplicate, ±90° pole views,
    and a 13-view ring at pitch −4°/r 1.695.  Torch is only needed to
    deserialize; the result is plain numpy.
    """
    import torch

    cam = torch.load(path, map_location='cpu', weights_only=False)
    cam = np.asarray(cam.float().numpy(), np.float32)
    assert cam.ndim == 2 and cam.shape[1] == 25, cam.shape
    return cam


def orbit_cameras(num: int = 24, radius: float = 1.8, fov: float = 30.0,
                  pitch_deg: float = 20.0) -> np.ndarray:
    """Evaluation orbit as packed 25-dim labels (the role of the
    reference's ``assets/objv_eval_pose.pt``)."""
    yaws = np.linspace(0, 360, num, endpoint=False)
    poses = np.stack([np.full(num, pitch_deg), yaws], axis=-1)
    cam2world, fxfycxcy = generate_input_camera(radius, poses, fov=fov)
    fx, fy, cx, cy = fxfycxcy
    intr = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
    intr = np.tile(intr[None], (num, 1, 1))
    return np.concatenate([cam2world.reshape(num, 16),
                           intr.reshape(num, 9)], axis=-1)
