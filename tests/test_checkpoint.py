"""Tests for versioned checkpoints: round trip, migrations, ID rebasing."""

import json
import zipfile

import numpy as np
import pytest

from housescan_tpu.io.checkpoint import (
    CURRENT_VERSION,
    load_scene,
    save_scene,
    schema_fingerprint,
)
from housescan_tpu.rooms import Scene, WallRelation, load_room, suggest_corners
from housescan_tpu.rooms.types import Axis
from housescan_tpu.testing import make_synthetic_room_dir


@pytest.fixture
def populated_scene(tmp_path):
    scene = Scene()
    for i in range(2):
        d = make_synthetic_room_dir(
            tmp_path / f"room{i}", seed=i, offset=np.array([i * 5.0, 0, 0])
        )
        r = load_room(scene, d)
        suggest_corners(scene, r)
    rooms = list(scene.rooms.values())
    scene.connected_walls.append(
        (Axis.X, WallRelation.opposite(0.12), rooms[0].planes[0].plane_id,
         rooms[1].planes[0].plane_id)
    )
    return scene


class TestRoundTrip:
    def test_save_load_identity(self, populated_scene, tmp_path):
        path = save_scene(populated_scene, tmp_path / "s.housescan")
        loaded = load_scene(path)
        assert set(loaded.rooms) == set(populated_scene.rooms)
        assert loaded.next_id == populated_scene.next_id
        for rid, room in populated_scene.rooms.items():
            lr = loaded.rooms[rid]
            np.testing.assert_array_equal(lr.cloud.points, room.cloud.points)
            np.testing.assert_array_equal(lr.proj, room.proj)
            assert len(lr.planes) == len(room.planes)
            assert [i for i, _ in lr.corners] == [i for i, _ in room.corners]
            assert lr.name == room.name
        axis, rel, p1, p2 = loaded.connected_walls[0]
        assert axis == Axis.X and rel.kind == "opposite"
        assert rel.thickness == pytest.approx(0.12)

    def test_load_into_rebases_ids(self, populated_scene, tmp_path):
        path = save_scene(populated_scene, tmp_path / "s.housescan")
        live = Scene()
        # simulate live objects occupying the low ID space
        live.next_id = populated_scene.next_id
        merged = load_scene(path, into=live)
        # no collisions: all loaded IDs >= old next_id
        all_ids = [i for room in merged.rooms.values() for i in room.get_ids()]
        assert min(all_ids) >= populated_scene.next_id
        assert merged.next_id > max(all_ids)
        # wall connection plane IDs rebased consistently
        _, _, p1, p2 = merged.connected_walls[0]
        plane_ids = {
            p.plane_id for room in merged.rooms.values() for p in room.planes
        }
        assert p1 in plane_ids and p2 in plane_ids


class TestMigrations:
    def _rewrite_version(self, path, mutate):
        with zipfile.ZipFile(path) as zf:
            manifest = json.loads(zf.read("manifest.json"))
            entries = {
                n: zf.read(n) for n in zf.namelist() if n != "manifest.json"
            }
        manifest = mutate(manifest)
        with zipfile.ZipFile(path, "w") as zf:
            zf.writestr("manifest.json", json.dumps(manifest))
            for n, blob in entries.items():
                zf.writestr(n, blob)

    def test_v1_rooms_only_loads(self, populated_scene, tmp_path):
        path = save_scene(populated_scene, tmp_path / "v1.housescan")

        def to_v1(m):
            m.pop("connected_walls")
            m.pop("settings")
            m["schema_version"] = 1
            return m

        self._rewrite_version(path, to_v1)
        loaded = load_scene(path)
        assert len(loaded.rooms) == 2
        assert loaded.connected_walls == []  # migration default

    def test_v2_wall_thickness_default(self, populated_scene, tmp_path):
        path = save_scene(populated_scene, tmp_path / "v2.housescan")

        def to_v2(m):
            m["connected_walls"] = [
                [w[0], w[1], w[3], w[4]] for w in m["connected_walls"]
            ]
            m.pop("settings")
            m["schema_version"] = 2
            return m

        self._rewrite_version(path, to_v2)
        loaded = load_scene(path)
        # the reference's 10cm global default (ref Main.hs:2714)
        assert loaded.connected_walls[0][1].thickness == pytest.approx(0.1)

    def test_future_version_rejected(self, populated_scene, tmp_path):
        path = save_scene(populated_scene, tmp_path / "vf.housescan")

        def to_future(m):
            m["schema_version"] = CURRENT_VERSION + 1
            return m

        self._rewrite_version(path, to_future)
        with pytest.raises(ValueError, match="newer than supported"):
            load_scene(path)


class TestFingerprint:
    def test_fingerprint_stable(self):
        assert schema_fingerprint() == schema_fingerprint()

    def test_fingerprint_in_manifest(self, populated_scene, tmp_path):
        path = save_scene(populated_scene, tmp_path / "f.housescan")
        with zipfile.ZipFile(path) as zf:
            manifest = json.loads(zf.read("manifest.json"))
        assert manifest["schema_fingerprint"] == schema_fingerprint()


class TestFreePlanes:
    """v4: free-standing planes persist (the reference kept sPlanes
    transient, Main.hs:252-255; our one-process-per-subcommand CLI
    cannot)."""

    def _with_free_plane(self, scene):
        from housescan_tpu.rooms.types import Plane

        p = Plane(
            plane_id=scene.gen_id(),
            normal=np.array([0.0, 0.6, 0.8], np.float32),
            d=-0.35,
            color=(0.1, 0.9, 0.4),
            bounds=np.array([[0, 0, 0], [1, 0, 0], [1, 1, 1]], np.float32),
        )
        scene.planes[p.plane_id] = p
        return p

    def test_round_trip(self, populated_scene, tmp_path):
        p = self._with_free_plane(populated_scene)
        path = save_scene(populated_scene, tmp_path / "fp.housescan")
        loaded = load_scene(path)
        assert set(loaded.planes) == {p.plane_id}
        lp = loaded.planes[p.plane_id]
        np.testing.assert_allclose(lp.normal, p.normal)
        assert lp.d == pytest.approx(p.d)
        assert lp.color == pytest.approx(p.color)
        np.testing.assert_array_equal(lp.bounds, p.bounds)

    def test_merge_rebases_free_plane_ids(self, populated_scene, tmp_path):
        p = self._with_free_plane(populated_scene)
        path = save_scene(populated_scene, tmp_path / "fp.housescan")
        into = load_scene(path)
        bump = into.next_id
        merged = load_scene(path, into=into)
        assert len(merged.planes) == 2
        # The re-loaded copy is bumped by the live counter (ref bumpIDsBy).
        assert set(merged.planes) == {p.plane_id, p.plane_id + bump}
        assert merged.next_id > p.plane_id + bump

    def test_v3_without_free_planes_loads(self, populated_scene, tmp_path):
        self._with_free_plane(populated_scene)
        path = save_scene(populated_scene, tmp_path / "v3.housescan")

        def to_v3(m):
            m.pop("free_planes")
            m["schema_version"] = 3
            return m

        TestMigrations._rewrite_version(self, path, to_v3)
        loaded = load_scene(path)
        assert loaded.planes == {}  # migration default: empty
        assert len(loaded.rooms) == 2
