"""Mesh extraction: dense grid σ query → marching tetrahedra → colored OBJ.

Rewrite of the reference mesh path (``render_video_given_triplane``
mesh block, ``nsr/train_util_diffusion.py:208-249`` +
``triplane_decode_grid`` ``vit/vit_triplane.py:1625-1692`` with 2^16-point
chunked decoding ``forward_points:1581-1623``): the grid query runs as a
``lax.map`` over chunks under jit on-device; surface extraction runs in
the native C++ op (no PyMCubes/trimesh deps); vertex colors come from
re-querying RGB at vertex positions; OBJ export is a plain writer.

Reference defaults: 192³ (objaverse) / 128³ grid, σ threshold 10,
aabb ±0.45, −90° x-rotation on export.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

PointDecoder = Callable[[jax.Array], tuple[jax.Array, jax.Array]]
# (B, M, 3) coords -> (rgb (B, M, C), sigma (B, M, 1))


def query_grid_sigma(point_decoder: PointDecoder, grid_size: int,
                     aabb: float = 0.45, chunk: int = 2**16,
                     smooth: bool = False) -> jax.Array:
    """Evaluate σ on a dense grid by chunked decoding (reference chunk
    2^16).  Returns (grid_size³,) flattened f16 sigma; caller reshapes.

    f16 on purpose: the σ field only drives iso-surface placement (10
    mantissa bits ≫ voxel-interpolation precision) and the host pull of a
    192³ grid is transfer-bound on tunneled chips (28 MB f32 → 14 MB).

    ``smooth``: apply :func:`smooth_sigma_grid` on-device before the
    pull (serving knob — see that docstring; default False keeps the
    reference-parity field)."""
    lin = jnp.linspace(-aabb, aabb, grid_size)
    gx, gy, gz = jnp.meshgrid(lin, lin, lin, indexing='ij')
    pts = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
    n = pts.shape[0]
    pad = (-n) % chunk
    pts = jnp.pad(pts, ((0, pad), (0, 0)))
    chunks = pts.reshape(-1, chunk, 3)

    def eval_chunk(p):
        _, sigma = point_decoder(p[None])
        return sigma[0, :, 0].astype(jnp.float16)

    sigmas = jax.lax.map(eval_chunk, chunks).reshape(-1)[:n]
    if smooth:
        g = grid_size
        sigmas = _smooth_jit(sigmas.reshape(g, g, g)).reshape(-1)
    return sigmas


def smooth_sigma_grid(s: jax.Array) -> jax.Array:
    """Separable 3³ box denoise of a σ grid (replicate edges), on device.

    Serving-mode guard for the host marching stage: a noisy σ field
    (early training, random init, σ ringing around thin structures)
    makes nearly every cell iso-crossing, exploding triangle counts and
    host march / color-query / export time (the 0.2–3 s mesh-phase tail).
    A 3-tap mean shifts a smooth iso-surface by well under a voxel
    (tests/test_mesh.py sphere check) while cutting iid-noise variance
    27× so spurious crossings collapse.  The reference marches the raw
    field (``vit/vit_triplane.py:1625-1692``); keep ``smooth=False``
    wherever parity matters."""
    for ax in range(3):
        n = s.shape[ax]
        first = jax.lax.slice_in_dim(s, 0, 1, axis=ax)
        last = jax.lax.slice_in_dim(s, n - 1, n, axis=ax)
        sp = jnp.concatenate([first, s, last], axis=ax)
        s = (jax.lax.slice_in_dim(sp, 0, n, axis=ax)
             + jax.lax.slice_in_dim(sp, 1, n + 1, axis=ax)
             + jax.lax.slice_in_dim(sp, 2, n + 2, axis=ax)) / 3
    return s


_smooth_jit = jax.jit(smooth_sigma_grid)


@partial(jax.jit, static_argnames=('grid_size',))
def count_crossing_cells(sigma_flat: jax.Array, grid_size: int,
                         threshold: float = 10.0) -> jax.Array:
    """Device-side census of iso-crossing cells (int32 scalar, in-flight).

    The host marching stage needs the full σ grid (14 MB f16 at 192³)
    only when the surface is non-empty; pulling this 4-byte count first
    lets serving skip the grid transfer + host crossing scan entirely
    for empty fields (early training, failed prompts, random init) —
    the σ pull is the largest mesh-phase transfer on tunneled hosts.
    Mirrors :func:`_crossing_cells`' any/all corner test."""
    g = grid_size
    m = sigma_flat.reshape(g, g, g) > threshold
    c = m[:-1, :-1, :-1]
    any_in = c
    all_in = c
    n = g - 1
    for dx, dy, dz in ((0, 0, 1), (0, 1, 0), (0, 1, 1), (1, 0, 0),
                       (1, 0, 1), (1, 1, 0), (1, 1, 1)):
        corner = jax.lax.dynamic_slice(m, (dx, dy, dz), (n, n, n))
        any_in = any_in | corner
        all_in = all_in & corner
    return jnp.sum(any_in & ~all_in, dtype=jnp.int32)


def _crossing_cells(sigma: np.ndarray, threshold: float) -> np.ndarray:
    """Vectorized candidate scan: linear indices (z fastest) of cells
    whose 8 corners straddle the iso value.

    The serial per-cell C++ loop costs ~1.4-2 s at 192³ even for an
    EMPTY surface (7 M cells × 8 strided corner loads); this numpy scan
    is ~16 vector passes over the grid (~50 ms) and typically leaves the
    native marcher <1% of the cells."""
    m = sigma > threshold
    c = m[:-1, :-1, :-1]
    any_in = c.copy()
    all_in = c.copy()
    for dx, dy, dz in ((0, 0, 1), (0, 1, 0), (0, 1, 1), (1, 0, 0),
                       (1, 0, 1), (1, 1, 0), (1, 1, 1)):
        n = sigma.shape[0] - 1
        corner = m[dx:dx + n, dy:dy + n, dz:dz + n]
        any_in |= corner
        all_in &= corner
    return np.flatnonzero(any_in & ~all_in)


def march_grid(sigma: np.ndarray, grid_size: int, aabb: float = 0.45,
               threshold: float = 10.0, max_tris_cap: int = 20_000_000):
    """Host stage: σ grid (numpy) → (verts world coords, faces).

    Split out so callers can overlap the native marching-tetrahedra run
    with in-flight device work (pipeline.__call__ marches while the
    orbit render executes).

    ``max_tris_cap`` bounds the realloc (720 MB of vertex buffer at the
    default): a pathological all-crossing noise field at 192³ wants up
    to ~84 M triangles (3 GB + minutes of color-query/export); real
    surfaces at 192³ measure well under 2 M.  The native marcher fills
    the buffer in cell order and reports the overflow, so a truncated
    mesh is valid geometry."""
    from ..native.build import get_marching_tetrahedra_cells

    sigma = np.ascontiguousarray(
        np.asarray(sigma, np.float32).reshape(grid_size, grid_size,
                                              grid_size))
    cells = np.ascontiguousarray(_crossing_cells(sigma, threshold))
    mt = get_marching_tetrahedra_cells()
    import ctypes
    ip = ctypes.POINTER(ctypes.c_int64)
    # ≤12 tris per crossing cell (6 tets × ≤2); cap the first guess so a
    # pathological all-crossing noise field doesn't allocate gigabytes —
    # the -needed return path reallocates exactly once (never past
    # max_tris_cap; the marcher fills the buffer in cell order, so a
    # capped run returns the first max_tris triangles as valid geometry).
    cap = max(int(max_tris_cap), 1)
    max_tris = max(min(int(cells.size) * 12, 4_000_000), 1)
    if max_tris > cap:
        max_tris = cap
    out = np.empty((max_tris, 9), np.float32)
    n = mt(sigma.ctypes.data_as(_fp()), grid_size, grid_size, grid_size,
           np.float32(threshold), cells.ctypes.data_as(ip), cells.size,
           out.ctypes.data_as(_fp()), max_tris)
    if n < 0:
        needed = -n
        new_max = needed if needed < cap else cap
        if new_max > max_tris:
            max_tris = new_max
            out = np.empty((max_tris, 9), np.float32)
            n = mt(sigma.ctypes.data_as(_fp()), grid_size, grid_size,
                   grid_size, np.float32(threshold),
                   cells.ctypes.data_as(ip), cells.size,
                   out.ctypes.data_as(_fp()), max_tris)
        if n < 0:   # over the cap: keep the filled buffer
            import warnings
            warnings.warn(
                f'march_grid: triangle count {-n} exceeds max_tris_cap='
                f'{cap}; returning the first {max_tris} triangles '
                '(cell-order prefix — usually a noise field, not a real '
                'surface)', RuntimeWarning, stacklevel=2)
            n = max_tris
    tris = out[:n].reshape(n * 3, 3)
    scale = (2 * aabb) / (grid_size - 1)
    verts = tris * scale - aabb
    faces = np.arange(n * 3, dtype=np.int64).reshape(n, 3)
    return verts, faces


def _bucket_chunks(n_chunks: int) -> int:
    """Round a chunk count up to the next {2^k, 3·2^k} value: every
    distinct count is a distinct traced/compiled ``lax.map`` program, and
    vertex counts vary per prompt — unbucketed, EVERY mesh export of a
    new size recompiled on the real chip (seconds each).  This grid caps
    the program count at ~2·log₂(max) with ≤33% padding waste."""
    k = 1
    while k < n_chunks:
        if k * 3 // 2 >= n_chunks and k * 3 % 2 == 0:
            return k * 3 // 2
        k *= 2
    return k


def dispatch_vertex_colors(point_decoder: PointDecoder, verts: np.ndarray,
                           chunk: int = 2**16, as_uint8: bool = False):
    """Enqueue the per-vertex RGB re-query (reference :230-242) WITHOUT
    waiting; returns the in-flight device array (or None for an empty
    mesh).  Caller clips/pulls when needed.

    ``as_uint8``: clip + quantize on device — a 3 M-vertex color pull is
    36 MB f32 vs 9 MB u8 over the tunneled host link, and OBJ/PLY export
    quantizes anyway."""
    if not len(verts):
        return None
    v = jnp.asarray(verts)
    n_chunks = _bucket_chunks(-(-v.shape[0] // chunk))
    pad = n_chunks * chunk - v.shape[0]
    vp = jnp.pad(v, ((0, pad), (0, 0))).reshape(-1, chunk, 3)

    def eval_rgb(p):
        rgb, _ = point_decoder(p[None])
        rgb = rgb[0, :, :3]
        if as_uint8:
            rgb = (jnp.clip(rgb, 0.0, 1.0) * 255.0).astype(jnp.uint8)
        return rgb

    return jax.lax.map(eval_rgb, vp).reshape(-1, 3)[:v.shape[0]]


def extract_mesh(point_decoder: PointDecoder, grid_size: int = 128,
                 aabb: float = 0.45, threshold: float = 10.0,
                 chunk: int = 2**16, sigma_grid: Optional[jax.Array] = None,
                 smooth: bool = False):
    """Full extraction: σ grid → triangles → per-vertex colors.

    ``sigma_grid``: optional pre-dispatched :func:`query_grid_sigma`
    result — lets callers enqueue the device query early and overlap its
    execution/transfer with other host work (e.g. video readback).

    ``smooth``: on-device σ denoise before marching (see
    :func:`smooth_sigma_grid`; default False = reference-parity field).

    Returns (vertices (N, 3) world coords, colors (N, 3) in [0, 1],
    faces (T, 3) indices).  Flat (unshared) vertices, 3 per triangle.
    """
    if sigma_grid is None:
        sigma_grid = query_grid_sigma(point_decoder, grid_size, aabb, chunk,
                                      smooth=smooth)
    verts, faces = march_grid(np.asarray(sigma_grid), grid_size, aabb,
                              threshold)
    rgb = dispatch_vertex_colors(point_decoder, verts, chunk)
    colors = np.zeros_like(verts) if rgb is None \
        else np.clip(np.asarray(rgb), 0.0, 1.0)
    return verts, colors, faces


def _fp():
    import ctypes
    return ctypes.POINTER(ctypes.c_float)


def rotate_x(verts: np.ndarray, degrees: float = -90.0) -> np.ndarray:
    """Reference exports with a −90° x-rotation."""
    r = np.deg2rad(degrees)
    c, s = np.cos(r), np.sin(r)
    rot = np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float64)
    return (verts @ rot.T).astype(verts.dtype)


def export_obj(path: str, verts: np.ndarray, colors: np.ndarray,
               faces: np.ndarray):
    """Write a colored OBJ (v x y z r g b lines — trimesh-compatible).

    Uses the native writer (``native/mesh_io.cpp``, ~20x faster at 10^6
    verts) when the toolchain is available; Python fallback otherwise."""
    try:
        import ctypes

        from ..native.build import get_mesh_io
        lib = get_mesh_io()
        v = np.ascontiguousarray(verts, np.float32)
        c = np.ascontiguousarray(colors, np.float32)
        fc = np.ascontiguousarray(faces, np.int64)
        n = lib.ln_write_obj(
            path.encode(), v.ctypes.data_as(_fp()),
            c.ctypes.data_as(_fp()), len(v),
            fc.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(fc))
        if n >= 0:
            return
    except Exception:
        pass
    with open(path, 'w') as f:
        for (x, y, z), (r, g, b) in zip(verts, colors):
            f.write(f'v {x:.6f} {y:.6f} {z:.6f} {r:.4f} {g:.4f} {b:.4f}\n')
        for a, b_, c in faces + 1:
            f.write(f'f {a} {b_} {c}\n')


def export_ply(path: str, verts: np.ndarray, colors: np.ndarray,
               faces: np.ndarray):
    """Binary-less ascii PLY writer (viewer-friendly alternative)."""
    try:
        import ctypes

        from ..native.build import get_mesh_io
        lib = get_mesh_io()
        v = np.ascontiguousarray(verts, np.float32)
        cb = np.ascontiguousarray(
            (np.clip(colors, 0, 1) * 255), np.uint8)
        fc = np.ascontiguousarray(faces, np.int64)
        n = lib.ln_write_ply(
            path.encode(), v.ctypes.data_as(_fp()),
            cb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(v),
            fc.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(fc))
        if n >= 0:
            return
    except Exception:
        pass
    with open(path, 'w') as f:
        f.write('ply\nformat ascii 1.0\n'
                f'element vertex {len(verts)}\n'
                'property float x\nproperty float y\nproperty float z\n'
                'property uchar red\nproperty uchar green\n'
                'property uchar blue\n'
                f'element face {len(faces)}\n'
                'property list uchar int vertex_indices\nend_header\n')
        cb = (np.clip(colors, 0, 1) * 255).astype(np.uint8)
        for (x, y, z), (r, g, b) in zip(verts, cb):
            f.write(f'{x:.6f} {y:.6f} {z:.6f} {r} {g} {b}\n')
        for a, b_, c in faces:
            f.write(f'3 {a} {b_} {c}\n')
