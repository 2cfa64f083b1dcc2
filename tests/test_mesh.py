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
