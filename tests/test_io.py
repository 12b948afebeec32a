"""Tests for the io layer: PCD, PLY, planes.txt, .xf round trips."""

import numpy as np
import pytest

from housescan_tpu.io.pcd import PcdFormatError, PointCloud, load_pcd, save_pcd
from housescan_tpu.io.planes_txt import PlanesTxtError, load_planes_txt, save_planes_txt
from housescan_tpu.io.ply import Mesh, PlyFormatError, load_ply, save_ply
from housescan_tpu.io.xf import load_xf, save_xf


class TestPcd:
    def test_binary_round_trip_xyz(self, tmp_path, rng):
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        save_pcd(tmp_path / "a.pcd", pts, binary=True)
        loaded = load_pcd(tmp_path / "a.pcd")
        np.testing.assert_array_equal(loaded.points, pts)

    def test_ascii_round_trip_xyz(self, tmp_path, rng):
        pts = rng.normal(size=(50, 3)).astype(np.float32)
        save_pcd(tmp_path / "a.pcd", pts, binary=False)
        loaded = load_pcd(tmp_path / "a.pcd")
        np.testing.assert_allclose(loaded.points, pts, rtol=1e-6)

    def test_round_trip_with_rgb_and_normals(self, tmp_path, rng):
        pc = PointCloud(
            points=rng.normal(size=(30, 3)).astype(np.float32),
            colors=rng.uniform(size=(30, 3)).astype(np.float32),
            normals=rng.normal(size=(30, 3)).astype(np.float32),
        )
        save_pcd(tmp_path / "c.pcd", pc, binary=True)
        loaded = load_pcd(tmp_path / "c.pcd")
        np.testing.assert_array_equal(loaded.points, pc.points)
        np.testing.assert_allclose(loaded.colors, pc.colors, atol=1.0 / 255)
        np.testing.assert_array_equal(loaded.normals, pc.normals)

    def test_pcl_ascii_file_parses(self, tmp_path):
        # Hand-written PCL-style ascii file (the format the reference's
        # pcd-loader consumed, ref Main.hs:1320-1331)
        (tmp_path / "pcl.pcd").write_text(
            "# .PCD v.7 - Point Cloud Data file format\n"
            "VERSION .7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
            "WIDTH 2\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS 2\nDATA ascii\n"
            "1.0 2.0 3.0\n4.0 5.0 6.0\n"
        )
        loaded = load_pcd(tmp_path / "pcl.pcd")
        np.testing.assert_allclose(loaded.points, [[1, 2, 3], [4, 5, 6]])

    def test_truncated_binary_raises(self, tmp_path, rng):
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        save_pcd(tmp_path / "t.pcd", pts, binary=True)
        data = (tmp_path / "t.pcd").read_bytes()
        (tmp_path / "t.pcd").write_bytes(data[: len(data) - 100])
        with pytest.raises(PcdFormatError, match="truncated"):
            load_pcd(tmp_path / "t.pcd")

    def test_binary_compressed_round_trip(self, tmp_path, rng):
        # PCL's default export encoding (LZF over SoA plaintext)
        pc = PointCloud(
            points=rng.normal(size=(500, 3)).astype(np.float32),
            colors=rng.uniform(size=(500, 3)).astype(np.float32),
            normals=rng.normal(size=(500, 3)).astype(np.float32),
        )
        save_pcd(tmp_path / "z.pcd", pc, compressed=True)
        raw = (tmp_path / "z.pcd").read_bytes()
        assert b"DATA binary_compressed" in raw
        # genuinely compressed (u32 sizes header: comp < uncomp)
        hdr_end = raw.index(b"binary_compressed\n") + len(b"binary_compressed\n")
        comp, uncomp = np.frombuffer(raw[hdr_end : hdr_end + 8], "<u4", 2)
        assert uncomp == 500 * 7 * 4 and 0 < comp
        loaded = load_pcd(tmp_path / "z.pcd")
        np.testing.assert_array_equal(loaded.points, pc.points)
        np.testing.assert_allclose(loaded.colors, pc.colors, atol=1.0 / 255)
        np.testing.assert_array_equal(loaded.normals, pc.normals)

    def test_binary_compressed_fixture_parses(self, tmp_path):
        # Hand-built fixture with a KNOWN LZF stream (independent of our
        # compressor): 2 points, SoA plaintext x0 x1 y0 y1 z0 z1,
        # emitted as one literal run of 24 bytes (ctrl byte 23).
        soa = np.array([1.0, 4.0, 2.0, 5.0, 3.0, 6.0], "<f4").tobytes()
        stream = bytes([23]) + soa
        header = (
            "VERSION .7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
            "WIDTH 2\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS 2\n"
            "DATA binary_compressed\n"
        ).encode()
        sizes = np.array([len(stream), len(soa)], "<u4").tobytes()
        (tmp_path / "z.pcd").write_bytes(header + sizes + stream)
        loaded = load_pcd(tmp_path / "z.pcd")
        np.testing.assert_allclose(loaded.points, [[1, 2, 3], [4, 5, 6]])

    def test_binary_compressed_corrupt_raises(self, tmp_path):
        header = (
            "VERSION .7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
            "WIDTH 2\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS 2\n"
            "DATA binary_compressed\n"
        ).encode()
        # back-reference before the start of the output: malformed
        stream = bytes([0b00100000, 0xFF, 0x00])
        sizes = np.array([len(stream), 24], "<u4").tobytes()
        (tmp_path / "z.pcd").write_bytes(header + sizes + stream)
        with pytest.raises(PcdFormatError, match="binary_compressed|LZF"):
            load_pcd(tmp_path / "z.pcd")

    def test_missing_xyz_raises(self, tmp_path):
        (tmp_path / "m.pcd").write_text(
            "VERSION .7\nFIELDS intensity\nSIZE 4\nTYPE F\nCOUNT 1\n"
            "WIDTH 1\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS 1\nDATA ascii\n0.5\n"
        )
        with pytest.raises(PcdFormatError, match="lacks field"):
            load_pcd(tmp_path / "m.pcd")


class TestPly:
    def test_binary_cloud_round_trip(self, tmp_path, rng):
        pts = rng.normal(size=(64, 3)).astype(np.float32)
        save_ply(tmp_path / "a.ply", pts, binary=True)
        mesh = load_ply(tmp_path / "a.ply")
        np.testing.assert_array_equal(mesh.vertices, pts)
        assert mesh.faces is None or len(mesh.faces) == 0

    def test_ascii_mesh_round_trip(self, tmp_path, rng):
        mesh = Mesh(
            vertices=rng.normal(size=(8, 3)).astype(np.float32),
            faces=np.array([[0, 1, 2], [2, 3, 0], [4, 5, 6]], np.int32),
            colors=rng.uniform(size=(8, 3)).astype(np.float32),
        )
        save_ply(tmp_path / "m.ply", mesh, binary=False)
        loaded = load_ply(tmp_path / "m.ply")
        np.testing.assert_allclose(loaded.vertices, mesh.vertices, rtol=1e-5)
        np.testing.assert_array_equal(loaded.faces, mesh.faces)
        np.testing.assert_allclose(loaded.colors, mesh.colors, atol=1.5 / 255)

    def test_binary_mesh_with_normals(self, tmp_path, rng):
        mesh = Mesh(
            vertices=rng.normal(size=(10, 3)).astype(np.float32),
            faces=np.array([[0, 1, 2]], np.int32),
            normals=rng.normal(size=(10, 3)).astype(np.float32),
        )
        save_ply(tmp_path / "n.ply", mesh, binary=True)
        loaded = load_ply(tmp_path / "n.ply")
        np.testing.assert_array_equal(loaded.normals, mesh.normals)
        np.testing.assert_array_equal(loaded.faces, mesh.faces)

    def test_quad_faces_triangulated(self, tmp_path):
        (tmp_path / "q.ply").write_text(
            "ply\nformat ascii 1.0\nelement vertex 4\n"
            "property float x\nproperty float y\nproperty float z\n"
            "element face 1\nproperty list uchar int vertex_indices\nend_header\n"
            "0 0 0\n1 0 0\n1 1 0\n0 1 0\n"
            "4 0 1 2 3\n"
        )
        mesh = load_ply(tmp_path / "q.ply")
        assert mesh.faces.shape == (2, 3)

    def test_not_ply_raises(self, tmp_path):
        (tmp_path / "x.ply").write_text("not a ply file")
        with pytest.raises(PlyFormatError):
            load_ply(tmp_path / "x.ply")


class TestPlanesTxt:
    def test_round_trip_and_sign_convention(self, tmp_path):
        # PCL line "0 1 0 -2" means y = 2 in our convention
        (tmp_path / "planes.txt").write_text("0 1 0 -2\n1 0 0 3\n")
        eqs = load_planes_txt(tmp_path / "planes.txt")
        np.testing.assert_allclose(np.asarray(eqs.d), [2.0, -3.0])

        save_planes_txt(tmp_path / "out.txt", eqs)
        eqs2 = load_planes_txt(tmp_path / "out.txt")
        np.testing.assert_allclose(np.asarray(eqs2.normal), np.asarray(eqs.normal), atol=1e-6)
        np.testing.assert_allclose(np.asarray(eqs2.d), np.asarray(eqs.d), atol=1e-6)

    def test_unnormalized_input_normalized(self, tmp_path):
        (tmp_path / "p.txt").write_text("0 0 2 -8\n")
        eqs = load_planes_txt(tmp_path / "p.txt")
        np.testing.assert_allclose(np.asarray(eqs.normal)[0], [0, 0, 1], atol=1e-6)
        assert float(np.asarray(eqs.d)[0]) == pytest.approx(4.0)

    def test_malformed_line_raises(self, tmp_path):
        (tmp_path / "bad.txt").write_text("1 2 3\n")
        with pytest.raises(PlanesTxtError, match="expected 4"):
            load_planes_txt(tmp_path / "bad.txt")

    def test_empty_raises(self, tmp_path):
        (tmp_path / "e.txt").write_text("\n# comment only\n")
        with pytest.raises(PlanesTxtError, match="no planes"):
            load_planes_txt(tmp_path / "e.txt")


class TestXf:
    def test_round_trip(self, tmp_path, rng):
        m = np.eye(4)
        m[:3, :3] = rng.normal(size=(3, 3))
        m[3, :3] = [1.0, 2.0, 3.0]
        save_xf(tmp_path / "r.xf", m)
        loaded = load_xf(tmp_path / "r.xf")
        np.testing.assert_allclose(loaded, m, rtol=1e-12)

    def test_file_is_left_multiplicative(self, tmp_path):
        # Our translation lives in the last ROW; the .xf file (column-vector
        # convention) must show it in the last COLUMN (ref Main.hs:2296-2302).
        m = np.eye(4)
        m[3, :3] = [7.0, 8.0, 9.0]
        save_xf(tmp_path / "t.xf", m)
        rows = [[float(v) for v in line.split()] for line in (tmp_path / "t.xf").read_text().splitlines()]
        assert [rows[0][3], rows[1][3], rows[2][3]] == [7.0, 8.0, 9.0]

    def test_short_file_raises(self, tmp_path):
        (tmp_path / "s.xf").write_text("1 2 3\n")
        with pytest.raises(ValueError, match="16 numbers"):
            load_xf(tmp_path / "s.xf")
