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


def get_shard_loader():
    """Threaded tar-shard reader (``shard_loader.cpp``)."""
    src = os.path.join(os.path.dirname(__file__), 'shard_loader.cpp')
    lib = build_and_load(src, extra_flags=('-pthread',))
    lib.ln_loader_create.restype = ctypes.c_void_p
    lib.ln_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int]
    lib.ln_loader_next_size.restype = ctypes.c_int64
    lib.ln_loader_next_size.argtypes = [ctypes.c_void_p]
    lib.ln_loader_next_copy.restype = None
    lib.ln_loader_next_copy.argtypes = [ctypes.c_void_p,
                                        ctypes.POINTER(ctypes.c_char)]
    lib.ln_loader_destroy.restype = None
    lib.ln_loader_destroy.argtypes = [ctypes.c_void_p]
    return lib


class NativeShardReader:
    """Iterate (name, bytes) tar entries with background prefetch."""

    def __init__(self, paths, queue_cap: int = 256, loop: bool = False):
        self._lib = get_shard_loader()
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths])
        self._h = self._lib.ln_loader_create(arr, len(paths), queue_cap,
                                             1 if loop else 0)

    def __iter__(self):
        return self

    def __next__(self):
        size = self._lib.ln_loader_next_size(self._h)
        if size < 0:
            raise StopIteration
        buf = ctypes.create_string_buffer(size)
        self._lib.ln_loader_next_copy(self._h, buf)
        raw = buf.raw
        name_len = int.from_bytes(raw[:4], 'little')
        name = raw[4:4 + name_len].decode()
        data_len = int.from_bytes(raw[4 + name_len:12 + name_len], 'little')
        data = raw[12 + name_len:12 + name_len + data_len]
        return name, data

    def close(self):
        if self._h is not None:
            self._lib.ln_loader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def get_mesh_io():
    """Fast colored OBJ/PLY writers (``mesh_io.cpp``)."""
    src = os.path.join(os.path.dirname(__file__), 'mesh_io.cpp')
    lib = build_and_load(src)
    for name in ('ln_write_obj', 'ln_write_ply'):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int64
    lib.ln_write_obj.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
    lib.ln_write_ply.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
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


def get_marching_tetrahedra_cells():
    """Sparse entry: marches only the listed candidate cells (linear
    indices over the (nx-1, ny-1, nz-1) cell grid)."""
    src = os.path.join(os.path.dirname(__file__), 'marching_cubes.cpp')
    lib = build_and_load(src)
    fn = lib.marching_tetrahedra_cells
    fn.restype = ctypes.c_int64
    fn.argtypes = [
        ctypes.POINTER(ctypes.c_float),  # grid
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,  # nx ny nz
        ctypes.c_float,                  # iso
        ctypes.POINTER(ctypes.c_int64),  # cells
        ctypes.c_int64,                  # n_cells
        ctypes.POINTER(ctypes.c_float),  # out_verts
        ctypes.c_int64,                  # max_tris
    ]
    return fn
