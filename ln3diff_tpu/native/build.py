"""JIT-build native C++ ops into a cache dir (ctypes).

Plays the role of the reference's ``utils/torch_utils/custom_ops.py``
``get_plugin:49-187`` (on-demand nvcc build of CUDA ops): here g++ builds
host-side runtime components (mesh extraction, data packing) that sit
outside the XLA compute path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

_CACHE_DIR = os.environ.get(
    'LN3DIFF_NATIVE_CACHE',
    os.path.join(os.path.expanduser('~'), '.cache', 'ln3diff_tpu'))
_LOCK = threading.Lock()
_LIBS: dict[str, ctypes.CDLL] = {}


def build_and_load(source_path: str, extra_flags: tuple[str, ...] = ()):
    """Compile ``source_path`` to a shared lib (content-hashed cache) and
    dlopen it."""
    source_path = os.path.abspath(source_path)
    with open(source_path, 'rb') as f:
        digest = hashlib.sha256(f.read() + repr(extra_flags).encode())
    key = f'{os.path.basename(source_path)}-{digest.hexdigest()[:16]}'
    with _LOCK:
        if key in _LIBS:
            return _LIBS[key]
        os.makedirs(_CACHE_DIR, exist_ok=True)
        lib_path = os.path.join(_CACHE_DIR, key + '.so')
        if not os.path.exists(lib_path):
            tmp = lib_path + '.tmp'
            cmd = ['g++', '-O3', '-march=native', '-shared', '-fPIC',
                   '-std=c++17', *extra_flags, source_path, '-o', tmp]
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(tmp, lib_path)
        lib = ctypes.CDLL(lib_path)
        _LIBS[key] = lib
        return lib


def get_marching_tetrahedra():
    src = os.path.join(os.path.dirname(__file__), 'marching_cubes.cpp')
    lib = build_and_load(src)
    fn = lib.marching_tetrahedra
    fn.restype = ctypes.c_int64
    fn.argtypes = [
        ctypes.POINTER(ctypes.c_float),  # grid
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,  # nx ny nz
        ctypes.c_float,                  # iso
        ctypes.POINTER(ctypes.c_float),  # out_verts
        ctypes.c_int64,                  # max_tris
    ]
    return fn
