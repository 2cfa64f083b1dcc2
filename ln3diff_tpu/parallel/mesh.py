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


def make_mesh(cfg: MeshConfig = MeshConfig(),
              devices: Optional[list] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    data = cfg.data if cfg.data > 0 else n // (cfg.fsdp * cfg.tensor)
    assert data * cfg.fsdp * cfg.tensor == n, (
        f'mesh {data}x{cfg.fsdp}x{cfg.tensor} != {n} devices')
    dev_array = np.asarray(devices).reshape(data, cfg.fsdp, cfg.tensor)
    return Mesh(dev_array, ('data', 'fsdp', 'tensor'))


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
        is_kernel = names[-1] == 'kernel'
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
