"""Ray/box math for the volume renderer.

TPU-native rewrite of the reference ``nsr/volumetric_rendering/math_utils.py``
(ray-box intersection :50-116, tensor linspace :119-137).  Everything is pure
jnp with static shapes; the reference's boolean-mask scatter for invalid rays
becomes ``jnp.where`` selects.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_vecs(v: jax.Array, eps: float = 0.0) -> jax.Array:
    return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + eps)


def get_ray_limits_box(rays_o: jax.Array, rays_d: jax.Array,
                       box_side_length: float):
    """Intersect rays with the centered cube of side ``box_side_length``.

    Mirrors reference ``math_utils.get_ray_limits_box``: slab method; invalid
    rays get (tmin, tmax) = (-1, -2) so ``tmax > tmin`` is False for them.

    Args:
      rays_o, rays_d: ``(..., 3)``.
    Returns:
      (tmin, tmax), each ``(..., 1)``.
    """
    half = box_side_length / 2.0
    invdir = 1.0 / rays_d
    # Per-axis slab entry/exit.
    t_lo = (-half - rays_o) * invdir
    t_hi = (half - rays_o) * invdir
    t_near_ax = jnp.minimum(t_lo, t_hi)
    t_far_ax = jnp.maximum(t_lo, t_hi)

    # Progressive max/min mirroring the reference's pairwise validity checks:
    # a ray misses if any axis's entry exceeds another axis's exit.
    tmin_xy = jnp.maximum(t_near_ax[..., 0], t_near_ax[..., 1])
    tmax_xy = jnp.minimum(t_far_ax[..., 0], t_far_ax[..., 1])
    valid = ~((t_near_ax[..., 0] > t_far_ax[..., 1])
              | (t_near_ax[..., 1] > t_far_ax[..., 0]))
    valid &= ~((tmin_xy > t_far_ax[..., 2]) | (t_near_ax[..., 2] > tmax_xy))

    tmin = jnp.maximum(tmin_xy, t_near_ax[..., 2])
    tmax = jnp.minimum(tmax_xy, t_far_ax[..., 2])

    tmin = jnp.where(valid, tmin, -1.0)
    tmax = jnp.where(valid, tmax, -2.0)
    return tmin[..., None], tmax[..., None]


def fix_invalid_ray_limits(ray_start: jax.Array, ray_end: jax.Array):
    """Replace invalid (start >= end) ray limits, as the reference does at
    ``renderer.py:151-155``: invalid rays get start = min(valid starts) and
    end = max(valid starts).
    """
    is_valid = ray_end > ray_start
    big = jnp.float32(1e10)
    valid_starts_min = jnp.min(jnp.where(is_valid, ray_start, big))
    valid_starts_max = jnp.max(jnp.where(is_valid, ray_start, -big))
    ray_start = jnp.where(is_valid, ray_start, valid_starts_min)
    ray_end = jnp.where(is_valid, ray_end, valid_starts_max)
    return ray_start, ray_end


def linspace_vec(start: jax.Array, stop: jax.Array, num: int) -> jax.Array:
    """Evenly spaced values broadcast over tensor endpoints.

    Returns shape ``(num, *start.shape)`` — reference ``math_utils.linspace``.
    """
    steps = jnp.arange(num, dtype=jnp.float32) / (num - 1)
    steps = steps.reshape((num,) + (1,) * start.ndim)
    return start[None] + steps * (stop - start)[None]
