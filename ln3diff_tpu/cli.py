"""Console entry points (``pyproject.toml`` ``[project.scripts]``).

The CLIs live in ``scripts/`` at the repository root (mirroring the
reference layout, where users run ``python scripts/vit_triplane_*.py``).
These wrappers make them available as ``ln3diff-*`` commands after
``pip install -e .`` by resolving the sibling ``scripts`` directory of
this source checkout.
"""

from __future__ import annotations

import importlib
import os
import sys


def _run(script_module: str):
    scripts_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        'scripts')
    if not os.path.isdir(scripts_dir):
        raise SystemExit(
            f'ln3diff_tpu CLI wrappers need the source checkout '
            f'(scripts/ not found next to the package — install with '
            f'`pip install -e .` from the repository root)')
    if scripts_dir not in sys.path:
        sys.path.insert(0, scripts_dir)
    importlib.import_module(script_module).main()


def train_vae():
    _run('vit_triplane_train')


def train_diffusion():
    _run('vit_triplane_diffusion_train')


def train_sit():
    _run('vit_triplane_sit_train')


def sample():
    _run('vit_triplane_diffusion_sample')


def evaluator():
    _run('evaluator')


def gradio_app():
    _run('gradio_app')


def convert_checkpoint():
    _run('convert_checkpoint')
