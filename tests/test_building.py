"""Building-scale scan orchestration tests (BASELINE config 5).

Covers kinfu/building.py: multi-room back-to-back fusion into one
Scene, the building-level resume checkpoint, the batched (room-DP)
cuboid fit, and the sharded-volume room path on the 8-device CPU mesh.
"""

import json

import jax
import numpy as np
import pytest

from housescan_tpu.capture.replay import DepthStream
from housescan_tpu.config import Config, RansacConfig, TsdfConfig
from housescan_tpu.kinfu.building import RoomScan, scan_building
from housescan_tpu.kinfu.camera import Intrinsics
from housescan_tpu.kinfu.synthetic import furnished_room, orbit_poses, render_depth_stream

INTR = Intrinsics(width=160, height=120, fx=131.25, fy=131.25, cx=79.5, cy=59.5)


def _room_scans(n_rooms=2, n_frames=6, seed0=0):
    half = np.array([1.3, 1.1, 1.3], np.float32)
    _, boxes = furnished_room()
    rooms = []
    for ri in range(n_rooms):
        poses = orbit_poses(
            n_frames, radius=0.25, yaw_range=0.4, pitch=0.3, seed=seed0 + ri
        )
        frames = render_depth_stream(
            INTR, poses, half, boxes=boxes, seed=seed0 + ri
        )
        rooms.append(
            RoomScan(
                name=f"room{ri}",
                stream=DepthStream(frames=frames, intrinsics=INTR),
                init_pose=poses[0],
            )
        )
    return rooms


CFG = Config(
    tsdf=TsdfConfig(resolution=128, size_m=3.2, trunc_dist=0.06),
    ransac=RansacConfig(min_inlier_fraction=0.02),
)


class TestScanBuilding:
    def test_two_room_building_end_to_end(self, tmp_path):
        rooms = _room_scans(2)
        scene, fitted, out = scan_building(
            rooms, tmp_path / "bld", config=CFG, gap=0.1
        )
        assert len(scene.rooms) == 2
        assert len(fitted) == 2
        for r in rooms:
            d = out / r.name
            assert (d / "cloud_downsampled.pcd").exists()
            assert (d / "planes.txt").exists()
            assert (d / "trajectory.npz").exists()
        # building checkpoint records both rooms
        done = json.loads((out / "building_checkpoint.json").read_text())
        assert done["rooms_done"] == ["room0", "room1"]
        # arranged transforms exported for every room
        xfs = sorted((out / "xf").glob("*.xf"))
        assert len(xfs) == 2
        # every fitted room has planes loaded with inward normals
        for r in fitted:
            assert len(r.planes) >= 2

    def test_resume_skips_finished_rooms(self, tmp_path):
        rooms = _room_scans(2)
        out = tmp_path / "bld"
        scan_building(rooms[:1], out, config=CFG)
        assert json.loads(
            (out / "building_checkpoint.json").read_text()
        )["rooms_done"] == ["room0"]

        # Poison room0's stream: a resumed run must NOT refuse it,
        # because it must never rescan a finished room.
        calls = []
        bad = RoomScan(
            name="room0",
            stream=_PoisonStream(calls, rooms[0].stream),
        )
        scene, fitted, _ = scan_building(
            [bad, rooms[1]], out, config=CFG, resume=True
        )
        assert not calls, "finished room was rescanned on resume"
        assert len(scene.rooms) == 2

    def test_sharded_room_path_on_cpu_mesh(self, tmp_path):
        from jax.sharding import Mesh

        from housescan_tpu.parallel.mesh import VOLUME_AXIS

        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs the 8-device CPU mesh")
        mesh = Mesh(np.array(devs[:8]), (VOLUME_AXIS,))
        cfg = Config(
            tsdf=TsdfConfig(resolution=64, size_m=3.2, trunc_dist=0.1),
            ransac=RansacConfig(min_inlier_fraction=0.02),
        )
        rooms = _room_scans(1, n_frames=4)
        scene, fitted, out = scan_building(
            rooms,
            tmp_path / "bld",
            config=cfg,
            mesh=mesh,
            sharded_min_resolution=64,  # force the sharded path
        )
        d = out / "room0"
        assert (d / "cloud_bin.pcd").exists()
        assert (d / "trajectory.npz").exists()
        traj = np.load(d / "trajectory.npz")["poses"]
        assert traj.shape == (4, 4, 4)
        assert np.isfinite(traj).all()


class _PoisonStream:
    """Stream that records (and fails) if anyone iterates it."""

    def __init__(self, calls, like):
        self.calls = calls
        self.intrinsics = like.intrinsics
        self._n = len(like)

    def __len__(self):
        return self._n

    def __iter__(self):
        self.calls.append("iterated")
        raise AssertionError("resumed building scan iterated a finished room")
