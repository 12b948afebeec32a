"""Tests for the rooms domain pipeline, ending in the end-to-end slice:
synthetic room dirs -> load -> suggest corners -> fit cuboids -> connect
walls -> optimize positions -> export (SURVEY.md section 7, step 4)."""

import math

import numpy as np
import pytest

from housescan_tpu.rooms import (
    Axis,
    Scene,
    WallRelation,
    auto_align_floor,
    connect_walls,
    disconnect_walls,
    export_all_room_pcl_transforms,
    export_all_room_xf_files,
    export_room_full_res,
    fit_cuboid_to_room,
    load_room,
    optimize_room_positions,
    remove_ceiling,
    rotate_kinfu_room,
    rotate_room,
    suggest_corners,
    translate_room,
)
from housescan_tpu.rooms.corners import accept_corner_suggestion, add_corner_from_planes
from housescan_tpu.rooms.manip import (
    duplicate_plane,
    move_wall,
    swap_room_positions,
)
from housescan_tpu.io.pcd import load_pcd
from housescan_tpu.io.xf import load_xf
from housescan_tpu.testing import make_synthetic_room_dir


@pytest.fixture
def room_dir(tmp_path):
    return make_synthetic_room_dir(tmp_path / "room_a", dims=(4.0, 2.5, 5.0), seed=1)


@pytest.fixture
def scene():
    return Scene()


class TestLoadRoom:
    def test_load_sets_inward_normals(self, scene, room_dir):
        room = load_room(scene, room_dir)
        center = room.mean()
        for p in room.planes:
            inward = center - p.mean()
            assert float(np.dot(inward, p.normal)) > 0, "normal must face room center"

    def test_load_room_identity_proj(self, scene, room_dir):
        room = load_room(scene, room_dir)
        np.testing.assert_array_equal(room.proj, np.eye(4, dtype=np.float32))

    def test_ids_unique(self, scene, room_dir):
        room = load_room(scene, room_dir)
        ids = room.get_ids()
        assert len(ids) == len(set(ids))

    def test_missing_dir_raises(self, scene, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_room(scene, tmp_path / "nope")


class TestRoomTransforms:
    def test_translate_room_moves_everything(self, scene, room_dir):
        room = load_room(scene, room_dir)
        off = np.array([1.0, 2.0, 3.0], np.float32)
        moved = translate_room(room, off)
        np.testing.assert_allclose(moved.mean(), room.mean() + off, atol=1e-5)
        np.testing.assert_allclose(moved.proj[3, :3], off, atol=1e-6)
        # plane distances to cloud preserved
        for p0, p1 in zip(room.planes, moved.planes):
            d0 = room.cloud.points @ p0.normal - p0.d
            d1 = moved.cloud.points @ p1.normal - p1.d
            np.testing.assert_allclose(d1, d0, atol=1e-4)

    def test_rotate_room_preserves_shape(self, scene, room_dir):
        from housescan_tpu.geometry.transform import axis_angle_mat
        import jax.numpy as jnp

        room = load_room(scene, room_dir)
        rot = np.asarray(axis_angle_mat(jnp.array([0.0, 1.0, 0.0]), 0.7))
        rotated = rotate_room(room, rot)
        # centroid unchanged (rotation about the mean)
        np.testing.assert_allclose(rotated.mean(), room.mean(), atol=1e-4)
        # pairwise distances preserved
        d0 = np.linalg.norm(room.cloud.points[0] - room.cloud.points[100])
        d1 = np.linalg.norm(rotated.cloud.points[0] - rotated.cloud.points[100])
        assert d1 == pytest.approx(d0, abs=1e-4)
        # plane-cloud relation preserved
        for p0, p1 in zip(room.planes, rotated.planes):
            d0s = room.cloud.points @ p0.normal - p0.d
            d1s = rotated.cloud.points @ p1.normal - p1.d
            np.testing.assert_allclose(d1s, d0s, atol=1e-3)

    def test_proj_replays_the_motion(self, scene, room_dir):
        """roomProj must reproduce the room's cumulative motion when applied
        to the originally loaded points (the projTest property,
        ref Main.hs:2543-2639)."""
        from housescan_tpu.geometry.transform import apply_proj4, axis_angle_mat
        import jax.numpy as jnp

        room0 = load_room(scene, room_dir)
        orig = room0.cloud.points.copy()
        rot = np.asarray(axis_angle_mat(jnp.array([0.2, 1.0, 0.1]), 1.1))
        room1 = rotate_room(room0, rot)
        room2 = translate_room(room1, np.array([3.0, 0.5, -2.0], np.float32))
        replayed = np.asarray(
            apply_proj4(jnp.asarray(room2.proj), jnp.asarray(orig))
        )
        np.testing.assert_allclose(replayed, room2.cloud.points, atol=1e-3)

    def test_rotate_kinfu_room_flips_y(self, scene, room_dir):
        room = load_room(scene, room_dir)
        flipped = rotate_kinfu_room(room)
        # 180deg about X negates y and z relative to the room mean
        rel0 = room.cloud.points - room.mean()
        rel1 = flipped.cloud.points - flipped.mean()
        np.testing.assert_allclose(rel1[:, 1], -rel0[:, 1], atol=1e-4)

    def test_remove_ceiling_drops_top_20pct(self, scene, room_dir):
        room = load_room(scene, room_dir)
        n = len(room.cloud.points)
        cut = remove_ceiling(room, fraction=0.2)
        assert len(cut.cloud.points) <= n - n // 5 + 5  # ties may keep a few
        assert cut.cloud.points[:, 1].max() < room.cloud.points[:, 1].max()


class TestCorners:
    def test_suggest_adopts_8_for_cuboid_room(self, scene, room_dir):
        room = load_room(scene, room_dir)
        room = suggest_corners(scene, room, cutoff_factor=1.2)
        # 6 planes of a cuboid -> C(6,3)=20 triples, 8 valid corners within
        # cutoff -> auto-adopted (ref Main.hs:1532-1535)
        assert len(room.corners) == 8
        assert room.suggested_corners == []
        dims = np.array([4.0, 2.5, 5.0]) / 2
        for _, c in room.corners:
            np.testing.assert_allclose(np.abs(c), dims, atol=1e-3)

    def test_suggestions_not_adopted_when_corners_exist(self, scene, room_dir):
        room = load_room(scene, room_dir)
        room = add_corner_from_planes(
            scene, room, tuple(p.plane_id for p in room.planes[::2])
        )
        assert room is not None and len(room.corners) == 1
        room = suggest_corners(scene, room)
        assert len(room.corners) == 1
        assert len(room.suggested_corners) == 8

    def test_accept_suggestion(self, scene, room_dir):
        room = load_room(scene, room_dir)
        room = add_corner_from_planes(scene, room, tuple(p.plane_id for p in room.planes[::2]))
        room = suggest_corners(scene, room)
        sugg_id = room.suggested_corners[0][0]
        room = accept_corner_suggestion(scene, room, sugg_id)
        assert len(room.corners) == 2
        assert all(s[0] != sugg_id for s in room.suggested_corners)


class TestCuboidRoom:
    def test_fit_cuboid_replaces_geometry(self, scene, room_dir):
        room = load_room(scene, room_dir)
        room = suggest_corners(scene, room)
        old_corner_ids = [i for i, _ in room.corners]
        result = fit_cuboid_to_room(scene, room)
        assert result is not None
        new_room, rmse, steps = result
        assert rmse < 0.01  # meters; exact synthetic cuboid
        assert len(new_room.planes) == 6
        assert [i for i, _ in new_room.corners] == old_corner_ids  # IDs reused
        for p in new_room.planes:
            assert p.bounds.shape == (4, 3)
            d = np.abs(p.bounds @ p.normal - p.d)
            assert d.max() < 1e-3  # face membership (ref Main.hs:1882)

    def test_fit_requires_8_corners(self, scene, room_dir):
        room = load_room(scene, room_dir)
        assert fit_cuboid_to_room(scene, room) is None

    def test_fit_purges_stale_wall_connections(self, scene, tmp_path):
        d1 = make_synthetic_room_dir(tmp_path / "r1", seed=1)
        d2 = make_synthetic_room_dir(tmp_path / "r2", seed=2, offset=np.array([6.0, 0, 0]))
        r1 = suggest_corners(scene, load_room(scene, d1))
        r2 = suggest_corners(scene, load_room(scene, d2))
        p1 = max(r1.planes, key=lambda p: p.normal[0])
        p2 = max(r2.planes, key=lambda p: -p.normal[0])
        assert connect_walls(scene, p1.plane_id, p2.plane_id, WallRelation.opposite(0.1)) is not None
        assert len(scene.connected_walls) == 1
        fit_cuboid_to_room(scene, r1)
        assert scene.connected_walls == []  # (ref Main.hs:1846-1849)


class TestAutoAlign:
    def test_align_floor_after_rotation(self, scene, room_dir):
        from housescan_tpu.geometry.transform import axis_angle_mat
        import jax.numpy as jnp

        room = load_room(scene, room_dir)
        rot = np.asarray(axis_angle_mat(jnp.array([1.0, 0.3, 0.2]), 0.4))
        room = rotate_room(room, rot)
        scene.update_room(room)
        aligned = auto_align_floor(scene, room)
        # The most-upward-facing plane should now be exactly +Y
        best = max(aligned.planes, key=lambda p: p.normal[1])
        np.testing.assert_allclose(best.normal, [0, 1, 0], atol=1e-4)


class TestWallsAndOptimize:
    def _two_connected_rooms(self, scene, tmp_path, gap=0.35):
        """Two 4x2.5x5 rooms side by side along X, gap between facing walls."""
        d1 = make_synthetic_room_dir(tmp_path / "r1", seed=1)
        d2 = make_synthetic_room_dir(
            tmp_path / "r2", seed=2, offset=np.array([4.0 + gap, 0.0, 0.0])
        )
        r1 = suggest_corners(scene, load_room(scene, d1))
        r2 = suggest_corners(scene, load_room(scene, d2))
        # r1's +X wall (inward normal -X) faces r2's -X wall (inward +X)
        p1 = min(r1.planes, key=lambda p: p.normal[0])  # wall at x=+2, normal -X
        p2 = max(r2.planes, key=lambda p: p.normal[0])  # wall at x=gap+2, normal +X
        return r1, r2, p1, p2

    def test_connect_and_disconnect(self, scene, tmp_path):
        r1, r2, p1, p2 = self._two_connected_rooms(scene, tmp_path)
        axis = connect_walls(scene, p1.plane_id, p2.plane_id, WallRelation.opposite(0.1))
        assert axis == Axis.X
        # duplicate rejected
        connect_walls(scene, p2.plane_id, p1.plane_id, WallRelation.same())
        assert len(scene.connected_walls) == 1
        disconnect_walls(scene, p1.plane_id, p2.plane_id)
        assert scene.connected_walls == []

    def test_connect_same_room_rejected(self, scene, room_dir):
        room = load_room(scene, room_dir)
        pids = [p.plane_id for p in room.planes]
        assert connect_walls(scene, pids[0], pids[1], WallRelation.same()) is None

    def test_optimize_sets_wall_gap_to_thickness(self, scene, tmp_path):
        thickness = 0.1
        r1, r2, p1, p2 = self._two_connected_rooms(scene, tmp_path, gap=0.35)
        connect_walls(scene, p1.plane_id, p2.plane_id, WallRelation.opposite(thickness))
        results = optimize_room_positions(scene)
        assert len(results) == 1
        axis, comp_size, rmse = results[0]
        assert axis == Axis.X and rmse == pytest.approx(0.0, abs=1e-5)
        # After optimization the facing walls are exactly `thickness` apart.
        r1n = scene.rooms[r1.room_id]
        r2n = scene.rooms[r2.room_id]
        w1 = r1n.find_plane(p1.plane_id)
        w2 = r2n.find_plane(p2.plane_id)
        gap = abs(float(w1.mean()[0] - w2.mean()[0]))
        assert gap == pytest.approx(thickness, abs=1e-3)
        # First room anchored at its original position (ref Main.hs:2159-2162)
        np.testing.assert_allclose(r1n.corner_mean(), r1.corner_mean(), atol=1e-4)

    def test_optimize_requires_corners(self, scene, tmp_path):
        d1 = make_synthetic_room_dir(tmp_path / "r1", seed=1)
        d2 = make_synthetic_room_dir(tmp_path / "r2", seed=2, offset=np.array([5.0, 0, 0]))
        r1 = load_room(scene, d1)
        r2 = load_room(scene, d2)
        p1 = min(r1.planes, key=lambda p: p.normal[0])
        p2 = max(r2.planes, key=lambda p: p.normal[0])
        connect_walls(scene, p1.plane_id, p2.plane_id, WallRelation.same())
        with pytest.raises(ValueError, match="no corners"):
            optimize_room_positions(scene)


class TestManip:
    def test_move_wall_drags_corners(self, scene, room_dir):
        room = load_room(scene, room_dir)
        room = suggest_corners(scene, room)
        result = fit_cuboid_to_room(scene, room)
        room = result[0]
        wall = room.planes[0]
        before = {i: c.copy() for i, c in room.corners}
        moved_room = move_wall(scene, wall.plane_id, wall.normal, step=0.05)
        moved_wall = moved_room.find_plane(wall.plane_id)
        assert abs(moved_wall.d - wall.d) == pytest.approx(0.05, abs=1e-5)
        changed = sum(
            1 for i, c in moved_room.corners if not np.allclose(c, before[i])
        )
        assert changed == 4  # the 4 corners on the moved face

    def test_duplicate_plane(self, scene, room_dir):
        room = load_room(scene, room_dir)
        n0 = len(room.planes)
        dup = duplicate_plane(scene, room.planes[0].plane_id)
        room2 = scene.rooms[room.room_id]
        assert len(room2.planes) == n0 + 1
        assert dup.plane_id != room.planes[0].plane_id

    def test_swap_room_positions(self, scene, tmp_path):
        d1 = make_synthetic_room_dir(tmp_path / "r1", seed=1)
        d2 = make_synthetic_room_dir(tmp_path / "r2", seed=2, offset=np.array([8.0, 0, 0]))
        r1 = load_room(scene, d1)
        r2 = load_room(scene, d2)
        m1, m2 = r1.mean().copy(), r2.mean().copy()
        swap_room_positions(scene, r1.room_id, r2.room_id)
        np.testing.assert_allclose(scene.rooms[r1.room_id].mean(), m2, atol=1e-4)
        np.testing.assert_allclose(scene.rooms[r2.room_id].mean(), m1, atol=1e-4)


class TestExport:
    def test_xf_export_and_full_res(self, scene, tmp_path):
        room_dir = make_synthetic_room_dir(tmp_path / "room", seed=3)
        room = load_room(scene, room_dir)
        room = translate_room(room, np.array([2.0, 0.0, 1.0], np.float32))
        scene.update_room(room)

        xf_files = export_all_room_xf_files(scene, tmp_path / "xf")
        assert len(xf_files) == 1
        loaded = load_xf(xf_files[0])
        np.testing.assert_allclose(loaded, room.proj, atol=1e-6)

        out = export_room_full_res(
            room, tmp_path / "placed.pcd", full_res_path=room_dir / "cloud_bin.pcd"
        )
        placed = load_pcd(out)
        orig = load_pcd(room_dir / "cloud_bin.pcd")
        np.testing.assert_allclose(
            placed.points, orig.points + np.array([2.0, 0.0, 1.0]), atol=1e-4
        )

    def test_pcl_command_lines(self, scene, tmp_path):
        room_dir = make_synthetic_room_dir(tmp_path / "roomx", seed=4)
        load_room(scene, room_dir)
        cmds = export_all_room_pcl_transforms(scene)
        assert len(cmds) == 1
        assert cmds[0].startswith("pcl_transform_point_cloud")
        assert "-matrix" in cmds[0]
        matrix_csv = cmds[0].split("-matrix ")[1]
        assert len(matrix_csv.split(",")) == 16


class TestEndToEndSlice:
    def test_full_pipeline(self, scene, tmp_path):
        """The reference's entire in-repo capability in one flow
        (BASELINE.json configs 1-2): load 3 rooms, auto-corner, cuboid-fit,
        connect walls, optimize grid positions, export transforms +
        full-res placed clouds."""
        dims = (4.0, 2.5, 5.0)
        gaps = [0.4, 0.7]
        dirs = []
        offs = [0.0]
        for i in range(3):
            off = np.array([i * (dims[0] + 0.0) + sum(gaps[:i], 0.0) + (0.35 * i), 0, 0])
            dirs.append(
                make_synthetic_room_dir(tmp_path / f"room{i}", dims=dims, seed=10 + i, offset=off)
            )
        rooms = []
        for d in dirs:
            r = load_room(scene, d)
            r = suggest_corners(scene, r)
            r, rmse, _ = fit_cuboid_to_room(scene, r)
            assert rmse < 0.01
            rooms.append(r)

        thickness = 0.12
        for a, b in ((0, 1), (1, 2)):
            pa = min(rooms[a].planes, key=lambda p: p.normal[0])
            pb = max(rooms[b].planes, key=lambda p: p.normal[0])
            assert (
                connect_walls(scene, pa.plane_id, pb.plane_id, WallRelation.opposite(thickness))
                == Axis.X
            )

        results = optimize_room_positions(scene)
        assert all(r[2] < 1e-4 for r in results)

        # Verify final geometry: consecutive room centers are dims[0]+thickness apart.
        centers = sorted(
            float(scene.rooms[r.room_id].corner_mean()[0]) for r in rooms
        )
        for c0, c1 in zip(centers, centers[1:]):
            assert (c1 - c0) == pytest.approx(dims[0] + thickness, abs=1e-3)

        # Export works for every room.
        xfs = export_all_room_xf_files(scene, tmp_path / "xf")
        assert len(xfs) == 3
        for room, d in zip(rooms, dirs):
            out = export_room_full_res(
                scene.rooms[room.room_id],
                tmp_path / f"placed{room.room_id}.ply",
                full_res_path=d / "cloud_bin.pcd",
            )
            assert out.exists()


class TestRotateToMatchWalls:
    """The reference's 'r' key (rotateSelectedPlanes, ref
    Main.hs:1629-1654): both the room-rotating and the bare-plane
    branches."""

    def _two_rooms(self, scene, tmp_path):
        dims = (4.0, 2.5, 5.0)
        rooms = []
        for i in range(2):
            d = make_synthetic_room_dir(
                tmp_path / f"room{i}", dims=dims, seed=i,
                offset=np.array([i * (dims[0] + 0.4), 0, 0]),
            )
            rooms.append(load_room(scene, d))
        return rooms

    def test_room_branch_makes_walls_antiparallel(self, scene, tmp_path):
        from housescan_tpu.rooms import rotate_room_to_match_walls
        from housescan_tpu.rooms.types import Room

        ra, rb = self._two_rooms(scene, tmp_path)
        # Both +X-facing walls: the target is the FLIPPED p2 normal, so a
        # nontrivial 180-degree rotation is required.
        p1 = max(ra.planes, key=lambda p: p.normal[0])
        p2 = max(rb.planes, key=lambda p: p.normal[0])
        got = rotate_room_to_match_walls(scene, p1.plane_id, p2.plane_id)
        assert isinstance(got, Room)
        new_p1 = got.find_plane(p1.plane_id)
        np.testing.assert_allclose(new_p1.normal, -p2.normal, atol=1e-5)
        # The whole room rotated rigidly about its mean: point count and
        # pairwise extent preserved.
        assert len(got.cloud.points) == len(ra.cloud.points)
        ext_a = np.sort(ra.cloud.points.max(0) - ra.cloud.points.min(0))
        ext_b = np.sort(got.cloud.points.max(0) - got.cloud.points.min(0))
        np.testing.assert_allclose(ext_a, ext_b, atol=1e-3)
        # Scene state was updated in place.
        assert scene.rooms[got.room_id] is got

    def test_bare_plane_branch_adds_rotated_copy(self, scene, tmp_path):
        from housescan_tpu.rooms import rotate_room_to_match_walls
        from housescan_tpu.rooms.types import Plane, Room

        (rb,) = [self._two_rooms(scene, tmp_path)[1]]
        p2 = max(rb.planes, key=lambda p: p.normal[0])
        # A free-standing plane with an oblique normal and a real boundary.
        n = np.array([0.6, 0.8, 0.0], np.float32)
        bounds = np.array(
            [[0, 0, 0], [0.8, -0.6, 0], [0.8, -0.6, 1], [0, 0, 1]], np.float32
        )
        free = Plane(
            plane_id=scene.gen_id(), normal=n, d=0.0, bounds=bounds
        )
        scene.planes[free.plane_id] = free
        n_rooms_before = {rid: r for rid, r in scene.rooms.items()}
        got = rotate_room_to_match_walls(scene, free.plane_id, p2.plane_id)
        assert not isinstance(got, Room)
        # The new plane's normal matches p2's UNFLIPPED normal
        # (ref Main.hs:1646-1648), the original is kept, and the copy got
        # a fresh ID in the free-standing set.
        np.testing.assert_allclose(got.normal, p2.normal, atol=1e-5)
        assert got.plane_id != free.plane_id
        assert scene.planes[free.plane_id] is free
        assert scene.planes[got.plane_id] is got
        # Rotation was about the plane mean: boundary centroid unmoved,
        # boundary shape (pairwise distances) preserved.
        np.testing.assert_allclose(got.mean(), free.mean(), atol=1e-5)
        d_old = np.linalg.norm(bounds[:, None] - bounds[None, :], axis=-1)
        d_new = np.linalg.norm(
            got.bounds[:, None] - got.bounds[None, :], axis=-1
        )
        np.testing.assert_allclose(d_new, d_old, atol=1e-5)
        # Boundary lies on the new plane: n.x = d for every corner.
        np.testing.assert_allclose(
            got.bounds @ got.normal, np.full(4, got.d), atol=1e-5
        )
        # No room was touched.
        assert scene.rooms == n_rooms_before

    def test_unknown_plane_raises(self, scene, tmp_path):
        from housescan_tpu.rooms import rotate_room_to_match_walls

        self._two_rooms(scene, tmp_path)
        with pytest.raises(KeyError):
            rotate_room_to_match_walls(scene, 999999, 999998)
