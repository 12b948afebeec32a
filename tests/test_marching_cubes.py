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


class TestEdgePaths:
    """The paths a happy-path box mesh never exercises: explicit-cap
    overflow, cap auto-sizing, slab-boundary invariance, and the
    int16-packed volume storage."""

    def _sphere_vol(self, res=48, r=0.9):
        # A sphere SDF: the surface straddles several slab boundaries.
        vol = tsdf_new(res, 3.0, 0.15)
        idx = (np.arange(res) + 0.5) * (3.0 / res) - 1.5
        gx, gy, gz = np.meshgrid(idx, idx, idx, indexing="ij")
        d = r - np.sqrt(gx * gx + gy * gy + gz * gz)  # + inside? no: + outside the ball
        gt = np.clip(d / 0.15, -1, 1).astype(np.float32)
        return vol.replace_grids(
            tsdf=jnp.asarray(gt), weight=jnp.ones_like(vol.weight)
        )

    def test_explicit_cap_overflow_truncates_with_message(self, capsys):
        vol = self._sphere_vol()
        full = marching_cubes(vol)
        n_full = len(full.faces)
        assert n_full > 600
        cap = 512
        mesh = marching_cubes(vol, max_triangles=cap)
        err = capsys.readouterr().err
        assert "exceed capacity 512" in err and "max_triangles" in err
        assert len(mesh.faces) == cap  # truncated exactly at the cap

    def test_auto_cap_is_next_power_of_two(self):
        from housescan_tpu.kinfu.marching_cubes import (
            _compact_program,
            _count_program,
        )

        vol = self._sphere_vol()
        total = int(_count_program(vol.data, jnp.asarray(1.0, jnp.float32), 16))
        mesh = marching_cubes(vol)
        assert len(mesh.faces) == total  # exact count == emitted count
        want_cap = max(1 << int(np.ceil(np.log2(total + 1))), 1 << 12)
        # The compact program was compiled for exactly that bucket.
        dst, off = _compact_program(
            vol.data, vol.origin, vol.voxel_size,
            jnp.asarray(1.0, jnp.float32), 16, want_cap,
        )
        assert int(off) == total
        assert dst.shape == (9, want_cap + 1)

    def test_slab_8_vs_16_identical(self):
        vol = self._sphere_vol()
        m8 = marching_cubes(vol, slab=8)
        m16 = marching_cubes(vol, slab=16)
        assert len(m8.faces) == len(m16.faces)
        # Same triangle SET: slab size only reorders emission by X-slab;
        # sort both soups canonically and compare exactly.
        def canon(m):
            t = m.vertices.reshape(-1, 9)
            return t[np.lexsort(t.T[::-1])]
        np.testing.assert_array_equal(canon(m8), canon(m16))

    def test_packed_int16_volume(self):
        from housescan_tpu.kinfu.tsdf import pack_tw

        volf = self._sphere_vol()
        packed = volf._replace(
            data=pack_tw(volf.tsdf, volf.weight)
        )
        mf = marching_cubes(volf)
        mp_ = marching_cubes(packed)
        # Packed tsdf is quantized (1/PACKED_SCALE); counts can differ at
        # cells whose corner signs flip, but the surface must agree.
        assert abs(len(mp_.faces) - len(mf.faces)) < 0.01 * len(mf.faces)
        r_err = np.abs(np.linalg.norm(mp_.vertices, axis=1) - 0.9)
        assert np.quantile(r_err, 0.99) < 0.01
