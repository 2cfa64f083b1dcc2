"""Multi-chip SERVING parallelism: shard the render workload over a mesh.

The reference serves on one GPU (rank-0-only sampling,
``scripts/vit_triplane_diffusion_sample_objaverse.py:170``).  On a TPU
pod slice the text→mesh tail is embarrassingly parallel along two axes
the denoiser scan is not:

* the orbit video — frames are independent renders of the same planes;
* the mesh σ/color grid — point chunks are independent decoder queries.

Both shard with ``shard_map`` over the mesh's ``data`` axis: params and
planes replicated (a few hundred MB, broadcast once), cameras / point
chunks split per device, results gathered on the host.  The per-device
body is the exact single-chip render path (including the fused Pallas
OSG kernel — inside shard_map each device runs the unpartitioned
program, so no custom-call partitioning rules are needed; plain GSPMD
over a ``pallas_call`` would have to replicate it).

Wall-clock model at the 192-spec orbit (24 × ~81 ms): 1.95 s on one
chip → ~0.25 s + broadcast on 8.  Correctness is locked by
``tests/test_parallel.py::TestServingShard`` on the 8-device CPU mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map


def tp_shard_denoiser_params(params, mesh: Mesh,
                             min_size_to_shard: int = 2**16):
    """Place denoiser params tensor-parallel for multi-chip SAMPLING.

    The CFG-doubled denoise scan is latency-bound at tiny batch; TP over
    the ``tensor`` axis splits every projection across chips and GSPMD
    inserts the block all-reduces (rules: ``mesh.tensor_parallel_rules``,
    incl. int8 ``kernel_q`` kernels).  Pass the returned tree in place of
    ``denoiser_params`` — the pipeline's jitted sampler propagates the
    shardings without code changes.
    """
    from .mesh import tensor_parallel_rules
    return jax.device_put(
        params, tensor_parallel_rules(params, mesh,
                                      min_size_to_shard=min_size_to_shard))


def shard_orbit_render(render_fn, mesh: Mesh, axis: str = 'data'):
    """Wrap ``render_fn(params, planes, cam25) -> (F, H, W, C)`` so the
    frame axis is sharded over ``axis`` of ``mesh``.

    Returns ``fn(params, planes, cams)``: ``planes`` (1, ...) replicated,
    ``cams`` (F, 25) with F divisible by the axis size — pad the orbit
    ring (frames are cyclic) if needed.
    """
    n = mesh.shape[axis]

    def per_device(params, planes, cams):
        planes_f = jnp.broadcast_to(planes,
                                    (cams.shape[0],) + planes.shape[1:])
        return render_fn(params, planes_f, cams)

    sharded = shard_map(per_device, mesh=mesh,
                        in_specs=(P(), P(), P(axis)),
                        out_specs=P(axis))
    jitted = jax.jit(sharded)

    def fn(params, planes, cams):
        assert cams.shape[0] % n == 0, \
            f'frame count {cams.shape[0]} not divisible by mesh axis {n}'
        return jitted(params, planes, cams)

    return fn


def shard_points_query(point_fn, mesh: Mesh, axis: str = 'data',
                       chunk: int = 2**16):
    """Wrap ``point_fn(params, planes, coords) -> (rgb, sigma)`` so the
    point axis is sharded over ``axis`` — the multi-chip mesh-grid query
    (single-chip analogue: chunked ``lax.map`` in ``render/mesh.py``).

    ``coords`` (1, N, 3); N is padded up to ``n_devices * chunk``
    granularity host-side (decoders are pure per-point functions, so
    padding with any in-box coordinate is safe — padded rows are
    dropped on return).
    """
    n = mesh.shape[axis]

    def per_device(params, planes, coords):
        # local (1, N/n, 3) → chunked lax.map keeps the per-step
        # transient bounded exactly like the single-chip path; the local
        # tail pads up to a whole chunk (decoders are pure per-point)
        N = coords.shape[1]
        c = min(chunk, N)
        steps = -(-N // c)
        pad = steps * c - N
        if pad:
            coords = jnp.concatenate(
                [coords, jnp.broadcast_to(coords[:, :1],
                                          (1, pad, 3))], axis=1)
        xs = coords[0].reshape(steps, c, 3)
        rgb, sigma = jax.lax.map(
            lambda cc: point_fn(params, planes, cc[None]), xs)
        return (rgb.reshape(1, -1, rgb.shape[-1])[:, :N],
                sigma.reshape(1, -1, sigma.shape[-1])[:, :N])

    sharded = shard_map(per_device, mesh=mesh,
                        in_specs=(P(), P(), P(None, axis)),
                        out_specs=(P(None, axis), P(None, axis)))
    jitted = jax.jit(sharded)

    def fn(params, planes, coords):
        N = coords.shape[1]
        pad = (-N) % n
        if pad:
            coords = jnp.concatenate(
                [coords, jnp.broadcast_to(coords[:, :1],
                                          (1, pad, 3))], axis=1)
        rgb, sigma = jitted(params, planes, coords)
        return rgb[:, :N], sigma[:, :N]

    return fn
