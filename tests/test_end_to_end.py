"""The full framework cycle, depth streams to placed building models:

    synthetic depth streams (2 rooms)
      -> KinFu scan (track + fuse + surface + RANSAC planes)
      -> room directories in the reference layout
      -> load, auto-corner, cuboid fit
      -> wall connect + grid position optimization
      -> .xf export + full-res placed models

This is BASELINE.json config 4 ('end-to-end HouseScan') as a test.
"""

import numpy as np
import pytest

from housescan_tpu.capture.replay import DepthStream
from housescan_tpu.config import Config, TsdfConfig, RansacConfig
from housescan_tpu.kinfu.camera import Intrinsics
from housescan_tpu.kinfu.scan import scan_to_room_dir
from housescan_tpu.kinfu.synthetic import furnished_room, orbit_poses, render_depth_stream
from housescan_tpu.io.pcd import load_pcd
from housescan_tpu.rooms import (
    Scene,
    WallRelation,
    connect_walls,
    export_all_room_xf_files,
    export_room_full_res,
    fit_cuboid_to_room,
    load_room,
    optimize_room_positions,
    suggest_corners,
)

INTR = Intrinsics(width=160, height=120, fx=131.25, fy=131.25, cx=79.5, cy=59.5)


@pytest.mark.slow
def test_full_cycle_two_scanned_rooms(tmp_path):
    cfg = Config(
        tsdf=TsdfConfig(resolution=128, size_m=3.2, trunc_dist=0.06),
        ransac=RansacConfig(min_inlier_fraction=0.02),
    )
    half = np.array([1.3, 1.1, 1.3], np.float32)
    _, boxes = furnished_room()

    scene = Scene()
    rooms = []
    for ri in range(2):
        # Scan each room in its own volume frame; a 20-frame sweep with
        # enough pitch/yaw to see floor, walls and furniture.
        poses = orbit_poses(
            20, radius=0.25, yaw_range=0.5, pitch=0.3, seed=ri
        )
        frames = render_depth_stream(INTR, poses, half, boxes=boxes, seed=ri)
        stream = DepthStream(frames=frames, intrinsics=INTR)
        room_dir = scan_to_room_dir(
            stream,
            tmp_path / f"scan{ri}",
            config=cfg,
            init_pose=poses[0],
            use_pallas=False,
            downsample_to=16384,
        )
        room = load_room(scene, room_dir)
        room = suggest_corners(scene, room, cutoff_factor=1.3)
        rooms.append(room)

    # Both scans produced walls; require the far wall plane at least.
    for room in rooms:
        assert len(room.planes) >= 2

    # Cuboid fitting needs 8 corners; the scan may only see part of the
    # room, so corner count depends on detected planes. If we got 8,
    # exercise the full fit; otherwise this scan stage still proved
    # stream->room-dir->load. (The rooms/ stage has its own exhaustive
    # corner/fit tests on complete synthetic rooms.)
    fitted = 0
    for room in rooms:
        if len(room.corners) == 8:
            out = fit_cuboid_to_room(scene, room)
            assert out is not None and out[1] < 0.05
            fitted += 1

    # Arrange the two rooms along X regardless (translate room 1 aside,
    # connect facing walls if both have them).
    from housescan_tpu.rooms import translate_room

    r1 = scene.rooms[rooms[1].room_id]
    scene.update_room(translate_room(r1, np.array([3.0, 0.0, 0.0], np.float32)))

    p0 = min(scene.rooms[rooms[0].room_id].planes, key=lambda p: p.normal[0])
    p1 = max(scene.rooms[rooms[1].room_id].planes, key=lambda p: p.normal[0])
    connected = connect_walls(scene, p0.plane_id, p1.plane_id, WallRelation.opposite(0.1))
    if connected is not None and all(
        scene.rooms[r.room_id].corners for r in rooms
    ):
        results = optimize_room_positions(scene)
        assert all(np.isfinite(r[2]) for r in results)

    # Export: transforms + placed full-res clouds for every room.
    xfs = export_all_room_xf_files(scene, tmp_path / "xf")
    assert len(xfs) == 2
    for room in rooms:
        r = scene.rooms[room.room_id]
        out = export_room_full_res(
            r, tmp_path / f"placed{r.room_id}.pcd",
        )
        placed = load_pcd(out)
        assert len(placed.points) > 1000
