"""Checkpoint save/resume (orbax) + torch checkpoint conversion entry.

Replaces the reference's blobfile ``.pt`` checkpointing
(``guided_diffusion/train_util.py:413-499``: rank-0 writes
``{name}{step:07d}.pt`` + per-EMA ``ema_{name}_{rate}_{step}.pt`` +
``opt{step}.pt``; resume via ``parse_resume_step_from_filename`` /
``find_ema_checkpoint``): here a single orbax step directory holds params,
EMA pytrees and opt state, sharded and async-safe across hosts.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


class CheckpointManager:
    """Thin orbax wrapper with the reference's retention semantics."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        assert _HAS_ORBAX, 'orbax unavailable'
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                               create=True)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state, wait: bool = False):
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_like, step: Optional[int] = None):
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step,
                                 args=ocp.args.StandardRestore(state_like))

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def parse_resume_step_from_filename(filename: str) -> int:
    """Reference ``train_util.py:442-459``: extract NNNNNNN from
    ``model_rec{NNNNNNN}.pt``-style names (for converted torch ckpts)."""
    m = re.search(r'(\d{7})\.(pt|safetensors)$', filename)
    return int(m.group(1)) if m else 0


def save_numpy_checkpoint(path: str, params):
    """Portable .npz fallback (no orbax): flattened param dict."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    arrays = {}
    for keypath, leaf in flat:
        name = '/'.join(str(getattr(k, 'key', getattr(k, 'idx', k)))
                        for k in keypath)
        arrays[name] = np.asarray(leaf)
    np.savez(path, **arrays)


def load_numpy_checkpoint(path: str, params_like):
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params_like)
    leaves = []
    for keypath, leaf in flat:
        name = '/'.join(str(getattr(k, 'key', getattr(k, 'idx', k)))
                        for k in keypath)
        arr = data[name]
        assert arr.shape == leaf.shape, (name, arr.shape, leaf.shape)
        leaves.append(arr.astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)
