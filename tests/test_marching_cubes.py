"""Tests for marching-tetrahedra isosurface extraction."""

import numpy as np
import pytest

import jax.numpy as jnp

from housescan_tpu.io.ply import load_ply, save_ply
from housescan_tpu.kinfu.marching_cubes import _build_tet_cases, marching_cubes
from housescan_tpu.kinfu.synthetic import ground_truth_tsdf
from housescan_tpu.kinfu.tsdf import tsdf_new

HALF = np.array([1.0, 0.8, 1.2], np.float32)


@pytest.fixture(scope="module")
def box_mesh():
    gt = ground_truth_tsdf(64, 3.0, np.full(3, -1.5, np.float32), HALF, 0.1)
    vol = tsdf_new(64, 3.0, 0.1)
    vol = vol.replace_grids(tsdf=jnp.asarray(gt), weight=jnp.ones_like(vol.weight))
    return marching_cubes(vol)


class TestTetCases:
    def test_case_table_structure(self):
        table = _build_tet_cases()
        assert table.shape == (16, 2, 3)
        # empty cases produce no triangles
        assert (table[0] == -1).all() and (table[15] == -1).all()
        # single-corner cases produce exactly one triangle
        for case in (1, 2, 4, 8, 7, 11, 13, 14):
            assert (table[case, 0] >= 0).all()
            assert (table[case, 1] == -1).all()
        # two-corner cases produce two triangles
        for case in (3, 5, 6, 9, 10, 12):
            assert (table[case] >= 0).all()


class TestBoxMesh:
    def test_vertices_on_surface(self, box_mesh):
        v = box_mesh.vertices
        assert len(v) > 10000
        sd = np.min(HALF - np.abs(v), axis=1)
        assert np.quantile(np.abs(sd), 0.99) < 0.006  # 99% within 6mm at 47mm voxels

    def test_area_close_to_analytic(self, box_mesh):
        v, f = box_mesh.vertices, box_mesh.faces
        a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
        area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1).sum()
        true_area = 8 * (HALF[0] * HALF[1] + HALF[1] * HALF[2] + HALF[0] * HALF[2])
        assert area == pytest.approx(true_area, rel=0.03)

    def test_normals_consistently_oriented(self, box_mesh):
        v, f = box_mesh.vertices, box_mesh.faces
        a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
        n = np.cross(b - a, c - a)
        centroids = (a + b + c) / 3
        # normals point from inside (tsdf<0, outside the room walls)
        # toward free space (the room interior at the origin)
        toward_center = -np.sum(n * centroids, axis=1)
        assert (toward_center > 0).mean() > 0.999

    def test_ply_round_trip(self, box_mesh, tmp_path):
        save_ply(tmp_path / "mesh.ply", box_mesh, binary=True)
        loaded = load_ply(tmp_path / "mesh.ply")
        assert len(loaded.vertices) == len(box_mesh.vertices)
        assert len(loaded.faces) == len(box_mesh.faces)

    def test_unobserved_regions_produce_no_mesh(self):
        vol = tsdf_new(32, 3.0, 0.1)  # weight 0 everywhere
        vol = vol.replace_grids(tsdf=vol.tsdf.at[10:20].set(-1.0))
        mesh = marching_cubes(vol)
        assert len(mesh.vertices) == 0
