"""Device mesh + sharding setup.

Replaces the reference's NCCL/DDP runtime (``guided_diffusion/dist_util.py``:
``setup_dist:57``, ``sync_params:122``, DDP wrap ``nsr/train_util.py:179``)
with the TPU-native model: one process per host, a
``jax.sharding.Mesh`` over ICI (+DCN across pods), and pjit-sharded train
steps where XLA inserts the gradient psum that DDP's all-reduce performed.

Axes:
  * ``data``  — batch sharding (the reference's only strategy).
  * ``fsdp``  — optional parameter sharding along the same physical axis
                (zero-1/2 style); the reference has no equivalent.
  * ``tensor``— optional tensor-parallel axis for DiT-XL scale (reference
                only has a commented-out fairscale import,
                ``dit/dit_trilatent.py:13``).
  * ``pipe``  — optional pipeline-parallel axis: the DiT trunk's
                scan-stacked block weights shard over it and microbatch
                activations hop stage→stage (``parallel/pipeline.py``);
                the reference has no PP at all.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1       # -1 → all remaining devices
    fsdp: int = 1
    tensor: int = 1
    pipe: int = 1


def make_mesh(cfg: MeshConfig = MeshConfig(),
              devices: Optional[list] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model = cfg.fsdp * cfg.tensor * cfg.pipe
    data = cfg.data if cfg.data > 0 else n // model
    assert data * model == n, (
        f'mesh {data}x{cfg.fsdp}x{cfg.tensor}x{cfg.pipe} != {n} devices')
    # pipe outermost after data: stage hops (ppermute) ride the slowest-
    # varying ICI direction while tp/fsdp collectives stay innermost
    # (highest-bandwidth neighbours), the standard pp-outside layout.
    dev_array = np.asarray(devices).reshape(data, cfg.pipe, cfg.fsdp,
                                            cfg.tensor)
    return Mesh(dev_array, ('data', 'pipe', 'fsdp', 'tensor'))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for input pytrees."""
    return NamedSharding(mesh, P(('data', 'fsdp')))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding_rules(params, mesh: Mesh, min_size_to_shard: int = 2**18):
    """FSDP-style parameter sharding: shard the largest axis of big params
    over the fsdp axis when divisible; small params stay replicated.

    Returns a pytree of NamedSharding matching ``params``.
    """
    fsdp = mesh.shape['fsdp']

    def rule(p):
        if fsdp == 1 or p.size < min_size_to_shard:
            return NamedSharding(mesh, P())
        shape = p.shape
        # shard the largest divisible axis
        order = sorted(range(len(shape)), key=lambda i: -shape[i])
        for ax in order:
            if shape[ax] % fsdp == 0:
                spec = [None] * len(shape)
                spec[ax] = 'fsdp'
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)


def tensor_parallel_rules(params, mesh: Mesh,
                          min_size_to_shard: int = 2**16):
    """Tensor-parallel sharding for transformer params (GSPMD style).

    Megatron-ish layout without touching model code: qkv / MLP-in kernels
    shard their OUTPUT dim over 'tensor' (column-parallel); proj / MLP-out
    kernels shard their INPUT dim (row-parallel); XLA/GSPMD propagates the
    activation shardings and inserts the all-reduces.  Composes with the
    fsdp axis (2D sharding) — the reference has no TP at all (only a
    commented-out fairscale import, ``dit/dit_trilatent.py:13``).

    Returns a pytree of NamedSharding matching ``params``.
    """
    tp = mesh.shape['tensor']
    fsdp = mesh.shape['fsdp']

    # exact path segments (see `rule`): include every transformer kernel
    # name across DiT/U-Net/ViT — 'ff_proj' is the U-Net GEGLU expansion
    # (the largest kernel per block) and would silently fall back to
    # replicated if omitted.
    col_markers = ('qkv', 'fc1', 'to_q', 'to_k', 'to_v', 'q_proj',
                   'k_proj', 'v_proj', 'ff_proj', 'proj_in')
    row_markers = ('proj', 'fc2', 'to_out', 'out_proj', 'mlp_img',
                   'ff_out', 'proj_out')

    def rule(path, p):
        names = [str(getattr(k, 'key', '')) for k in path]
        # exact path-segment match: 'proj' must not catch 'cap_proj' /
        # 'dino_proj' / patch-embed convs — substring matching silently
        # gave those row-parallel layouts (correct under GSPMD but
        # pessimal).
        segs = set(names)
        if tp == 1 or p.size < min_size_to_shard or p.ndim < 2:
            return NamedSharding(mesh, P())
        # 'kernel_q' = int8-quantized serving kernels (ops/int8.py) —
        # same (in, out) layout, same TP split
        is_kernel = names[-1] in ('kernel', 'kernel_q')
        if is_kernel and segs & set(col_markers) \
                and p.shape[-1] % tp == 0:
            spec = [None] * p.ndim
            spec[-1] = 'tensor'
            if fsdp > 1 and p.shape[-2] % fsdp == 0:
                spec[-2] = 'fsdp'
            return NamedSharding(mesh, P(*spec))
        if is_kernel and segs & set(row_markers) \
                and p.shape[-2] % tp == 0:
            spec = [None] * p.ndim
            spec[-2] = 'tensor'
            if fsdp > 1 and p.shape[-1] % fsdp == 0:
                spec[-1] = 'fsdp'
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def pipeline_parallel_rules(params, mesh: Mesh, trunk_key: str = 'blocks',
                            base=None):
    """Pipeline-parallel parameter layout: scan-stacked trunk leaves
    (leading axis = layer count) shard that axis over ``pipe`` so each
    stage holds only its ``depth/pp`` layer slice in HBM — the memory
    win PP exists for.  Non-trunk params (embed/head) stay on ``base``
    (or replicated).  Compose with :func:`param_sharding_rules` /
    :func:`tensor_parallel_rules` by passing their result as ``base``:
    trunk leaves keep the base spec on their per-layer dims and force
    'pipe' onto dim 0 (the stacked layer axis; any base sharding there
    is overridden — pipe owns that axis by construction).

    Reference has no PP (DDP only, ``guided_diffusion/dist_util.py:57``).
    """
    pp = mesh.shape.get('pipe', 1)
    base = base if base is not None else jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()), params)

    def rule(path, p, b):
        in_trunk = any(str(getattr(k, 'key', '')) == trunk_key
                       for k in path)
        if pp == 1 or not in_trunk or p.ndim < 1 or p.shape[0] % pp:
            return b
        spec = list(b.spec) + [None] * (p.ndim - len(b.spec))
        spec[0] = 'pipe'
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(rule, params, base)


def host_shard() -> tuple:
    """``(rank, num_replicas)`` for per-host data sharding — the default
    identity every data loader resolves when not given explicit ranks.
    Mirrors the reference's per-rank ``InfiniteSampler(rank,
    num_replicas)`` (``utils/torch_utils/misc.py:140-160``): on a
    multi-host pod each process must draw a DISJOINT (or at least
    decorrelated) sample stream, otherwise DP silently degrades to
    repeating one host's batch."""
    return jax.process_index(), jax.process_count()


def host_rng(seed: int) -> np.random.Generator:
    """Per-host decorrelated numpy Generator for HOST-side sampling
    (patch origins, timestep importance resampling, wds shard
    selection): folds ``jax.process_index()`` into the seed so hosts
    never draw identical crops/streams.  Device-side ``jax.random``
    keys intentionally stay host-identical — under pjit every host
    computes its shard of the SAME global random array, so per-sample
    decorrelation comes from array position, not the key."""
    return np.random.default_rng([int(seed), jax.process_index()])


def initialize_distributed():
    """Multi-host init (reference ``setup_dist``).  Safe to call when
    single-host (no-op)."""
    import os
    if os.environ.get('COORDINATOR_ADDRESS'):
        jax.distributed.initialize()
