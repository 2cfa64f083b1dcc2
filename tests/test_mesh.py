"""Mesh extraction tests: native marching tetrahedra vs analytic sphere."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from ln3diff_tpu.render.mesh import (export_obj, export_ply, extract_mesh,
                                     query_grid_sigma, rotate_x)


def sphere_decoder(radius=0.3, sigma_in=100.0):
    def decoder(pts):
        r = jnp.linalg.norm(pts, axis=-1, keepdims=True)
        sigma = jnp.where(r < radius, sigma_in, 0.0)
        rgb = jnp.clip(pts * 0.5 + 0.5, 0, 1)
        return rgb, sigma
    return decoder


class TestNativeBuild:

    def test_builds_and_loads(self):
        from ln3diff_tpu.native.build import get_marching_tetrahedra
        fn = get_marching_tetrahedra()
        assert fn is not None


class TestSparseMarcher:
    """march_grid routes through the sparse crossing-cell entry; it must
    equal the dense scan exactly and stay fast on surface-free fields."""

    def test_sparse_equals_dense(self):
        import ctypes
        from ln3diff_tpu.native.build import get_marching_tetrahedra
        from ln3diff_tpu.render.mesh import march_grid

        rng = np.random.default_rng(3)
        # smooth blobby field with a real iso-surface
        lin = np.linspace(-1, 1, 48)
        x, y, z = np.meshgrid(lin, lin, lin, indexing='ij')
        sigma = (12 - 9 * np.sqrt(x**2 + y**2 + z**2)
                 + rng.normal(0, 0.5, x.shape)).astype(np.float32)
        verts, faces = march_grid(sigma, 48, aabb=0.45, threshold=10.0)

        fp = ctypes.POINTER(ctypes.c_float)
        mt = get_marching_tetrahedra()
        out = np.empty((1_000_000, 9), np.float32)
        n = mt(np.ascontiguousarray(sigma).ctypes.data_as(fp), 48, 48, 48,
               np.float32(10.0), out.ctypes.data_as(fp), 1_000_000)
        assert n >= 0 and n * 3 == len(verts)
        dense = out[:n].reshape(n * 3, 3) * (0.9 / 47) - 0.45
        np.testing.assert_allclose(dense, verts, atol=1e-6)

    def test_empty_field_no_triangles(self):
        from ln3diff_tpu.render.mesh import march_grid
        sigma = np.full((32, 32, 32), -5.0, np.float32)
        verts, faces = march_grid(sigma, 32)
        assert len(verts) == 0 and len(faces) == 0

    def test_realloc_path(self):
        """First-guess cap exceeded → the -needed realloc round trips."""
        from ln3diff_tpu.render import mesh as mesh_mod
        lin = np.linspace(-1, 1, 40)
        x, y, z = np.meshgrid(lin, lin, lin, indexing='ij')
        sigma = (12 - 9 * np.sqrt(x**2 + y**2 + z**2)).astype(np.float32)
        want, _ = mesh_mod.march_grid(sigma, 40)
        # shrink the initial cap far below the real triangle count
        import unittest.mock as mock
        real_min = min
        with mock.patch.object(mesh_mod, 'min',
                               lambda a, b: real_min(a, 8),
                               create=True):
            got, _ = mesh_mod.march_grid(sigma, 40)
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestGridQuery:

    def test_sigma_grid_values(self):
        sigma = np.asarray(query_grid_sigma(sphere_decoder(), 32,
                                            aabb=0.45, chunk=1024))
        sigma = sigma.reshape(32, 32, 32)
        # center voxel inside sphere
        assert sigma[16, 16, 16] > 50
        # corner outside
        assert sigma[0, 0, 0] < 1


class TestExtraction:

    def test_sphere_mesh_geometry(self):
        verts, colors, faces = extract_mesh(sphere_decoder(radius=0.3),
                                            grid_size=48, aabb=0.45,
                                            threshold=10.0, chunk=4096)
        assert len(verts) > 100
        assert len(faces) == len(verts) // 3
        radii = np.linalg.norm(verts, axis=-1)
        # all vertices near the analytic sphere surface (one-cell tol)
        cell = 0.9 / 47
        assert abs(np.median(radii) - 0.3) < 2 * cell
        assert radii.max() < 0.3 + 3 * cell
        assert radii.min() > 0.3 - 3 * cell
        # colors valid
        assert (colors >= 0).all() and (colors <= 1).all()

    def test_watertight_area(self):
        """Total surface area ≈ 4πr² within discretization error.

        Uses a linear (smooth) density so interpolated vertices land on the
        analytic surface — a binary density would staircase and inflate
        the area."""
        def smooth_sphere(pts):
            r = jnp.linalg.norm(pts, axis=-1, keepdims=True)
            sigma = 10.0 + (0.3 - r) * 200.0
            return jnp.clip(pts * 0.5 + 0.5, 0, 1), sigma

        verts, _, faces = extract_mesh(smooth_sphere,
                                       grid_size=64, aabb=0.45,
                                       threshold=10.0, chunk=4096)
        tri = verts.reshape(-1, 3, 3)
        cross = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        area = 0.5 * np.linalg.norm(cross, axis=-1).sum()
        expected = 4 * np.pi * 0.3**2
        assert abs(area - expected) / expected < 0.15

    def test_export_formats(self, tmp_path):
        verts, colors, faces = extract_mesh(sphere_decoder(), grid_size=24,
                                            aabb=0.45, chunk=1024)
        verts = rotate_x(verts)
        obj = tmp_path / 'mesh.obj'
        ply = tmp_path / 'mesh.ply'
        export_obj(str(obj), verts, colors, faces)
        export_ply(str(ply), verts, colors, faces)
        assert obj.stat().st_size > 1000
        lines = obj.read_text().splitlines()
        assert lines[0].startswith('v ') and len(lines[0].split()) == 7
        assert ply.read_text().startswith('ply')


class TestSigmaSmoothing:
    """Serving-mode σ denoise (`smooth_sigma_grid`): sub-voxel surface
    shift on smooth fields, crossing-cell collapse on noise fields."""

    def test_sphere_surface_shift_subvoxel(self):
        """A linear-ramp sphere's iso-radius must move < 1 voxel."""
        from ln3diff_tpu.render.mesh import extract_mesh

        def smooth_sphere(pts):
            r = jnp.linalg.norm(pts, axis=-1, keepdims=True)
            return jnp.clip(pts * 0.5 + 0.5, 0, 1), 10.0 + (0.3 - r) * 200.0

        kw = dict(grid_size=48, aabb=0.45, threshold=10.0, chunk=4096)
        v_raw, _, _ = extract_mesh(smooth_sphere, smooth=False, **kw)
        v_sm, _, _ = extract_mesh(smooth_sphere, smooth=True, **kw)
        voxel = 0.9 / 47
        r_raw = np.linalg.norm(v_raw, axis=-1).mean()
        r_sm = np.linalg.norm(v_sm, axis=-1).mean()
        assert len(v_sm) > 0
        assert abs(r_sm - r_raw) < voxel

    def test_noise_crossings_collapse(self):
        """iid sub-threshold noise whose tail rings past the iso value
        (the realistic failure: σ ringing around thin structures /
        early-training fields): smoothing (27× variance cut) must
        collapse the spurious crossings by >50×."""
        from ln3diff_tpu.render.mesh import (_crossing_cells,
                                             smooth_sigma_grid)
        rng = np.random.default_rng(0)
        g = 64
        sigma = rng.normal(5.0, 4.0, size=(g, g, g)).astype(np.float32)
        raw = _crossing_cells(sigma, 10.0).size
        sm = np.asarray(smooth_sigma_grid(jnp.asarray(sigma)))
        smoothed = _crossing_cells(sm, 10.0).size
        assert raw > 100_000                     # tail crossings everywhere
        assert smoothed < raw // 50              # collapsed
        # and a CONSTANT field is a fixed point (replicate edges)
        const = np.full((16, 16, 16), 3.0, np.float32)
        out = np.asarray(smooth_sigma_grid(jnp.asarray(const)))
        np.testing.assert_allclose(out, const, rtol=1e-6)

    def test_chunk_bucketing(self):
        """Vertex-color chunk counts quantize to {2^k, 3*2^k} so distinct
        compiled lax.map programs stay O(log) in mesh size."""
        from ln3diff_tpu.render.mesh import _bucket_chunks
        for n, want in [(1, 1), (2, 2), (3, 3), (4, 4), (5, 6), (6, 6),
                        (7, 8), (9, 12), (13, 16), (17, 24), (25, 32),
                        (33, 48), (49, 64)]:
            assert _bucket_chunks(n) == want, (n, _bucket_chunks(n), want)
        for n in range(1, 200):
            b = _bucket_chunks(n)
            assert b >= n and b <= n * 3 // 2 + 2

    def test_march_grid_triangle_cap(self):
        """A pathological noise field truncates at max_tris_cap with
        valid geometry instead of reallocating gigabytes."""
        from ln3diff_tpu.render.mesh import march_grid
        rng = np.random.default_rng(1)
        sigma = rng.normal(10.0, 8.0, size=(32, 32, 32)).astype(np.float32)
        full_v, full_f = march_grid(sigma, 32)
        cap = max(len(full_f) // 3, 1)
        v, f = march_grid(sigma, 32, max_tris_cap=cap)
        assert len(f) == cap
        np.testing.assert_allclose(v[:cap * 3], full_v[:cap * 3])

    def test_device_crossing_count_matches_host(self):
        from ln3diff_tpu.render.mesh import (_crossing_cells,
                                             count_crossing_cells)
        rng = np.random.default_rng(2)
        for field in [rng.normal(10.0, 4.0, (24, 24, 24)),
                      np.zeros((24, 24, 24)),          # empty: early-out
                      np.full((24, 24, 24), 99.0)]:    # solid: no crossing
            f = field.astype(np.float32)
            got = int(count_crossing_cells(jnp.asarray(f.reshape(-1)), 24))
            assert got == _crossing_cells(f, 10.0).size
