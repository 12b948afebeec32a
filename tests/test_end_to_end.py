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
    """EVERY pipeline stage executes and is asserted — no conditional
    stages (a silently-skipped fit or optimize must fail the test).

    The scan covers all 6 room faces with four known-pose orbit sweeps
    (walls up+down, dedicated floor and ceiling passes — tracked
    single-sweep scans physically cannot see behind the camera, and the
    tracking path has its own drift/orbit tests), so 8 corner
    suggestions near the true corners are guaranteed; they are accepted
    through the suggestion workflow (bounding-box snap, the
    programmatic analog of the reference's accept-on-click,
    ref Main.hs:1541-1545)."""
    from itertools import product

    cfg = Config(
        tsdf=TsdfConfig(resolution=128, size_m=3.2, trunc_dist=0.06),
        ransac=RansacConfig(
            min_inlier_fraction=0.01, max_planes=12, n_hypotheses=1024
        ),
    )
    half = np.array([1.3, 1.1, 1.3], np.float32)
    _, boxes = furnished_room()

    scene = Scene()
    rooms = []
    for ri in range(2):
        sweeps = [
            orbit_poses(8, radius=0.25, yaw_range=6.283, pitch=p, seed=ri)
            for p in (0.35, -0.35)
        ]
        sweeps.append(  # floor pass (floor is +y; negative pitch looks down)
            orbit_poses(8, radius=0.7, height=-0.6, yaw_range=6.283,
                        pitch=-1.2, seed=ri)
        )
        sweeps.append(  # ceiling pass
            orbit_poses(8, radius=0.7, height=0.6, yaw_range=6.283,
                        pitch=1.2, seed=ri)
        )
        poses = np.concatenate(sweeps)
        frames = render_depth_stream(INTR, poses, half, boxes=boxes, seed=ri)
        stream = DepthStream(frames=frames, intrinsics=INTR)
        room_dir = scan_to_room_dir(
            stream,
            tmp_path / f"scan{ri}",
            config=cfg,
            init_pose=poses[0],
            use_pallas=False,
            downsample_to=16384,
            known_poses=poses,
        )
        room = load_room(scene, room_dir)
        room = suggest_corners(scene, room, cutoff_factor=1.3)
        # All 6 faces detected => at least the 8 true-corner suggestions
        # (plus furniture-plane intersections).
        assert len(room.planes) >= 6
        assert len(room.corners) == 8 or len(room.suggested_corners) >= 8

        if len(room.corners) != 8:
            # Accept through the suggestion workflow: snap each cloud
            # bounding-box corner to its nearest suggestion.
            from housescan_tpu.rooms.corners import accept_corner_suggestion

            pts = np.asarray(room.cloud.points)
            lo, hi = pts.min(0), pts.max(0)
            for sx, sy, sz in product((0, 1), repeat=3):
                target = np.array(
                    [[lo[0], hi[0]][sx], [lo[1], hi[1]][sy], [lo[2], hi[2]][sz]]
                )
                sid, spt = min(
                    room.suggested_corners,
                    key=lambda s: np.linalg.norm(s[1] - target),
                )
                # a true corner suggestion exists within 5 cm of every
                # bbox corner — the RANSAC planes hit all 6 faces
                assert np.linalg.norm(spt - target) < 0.05
                room = accept_corner_suggestion(scene, room, sid)
        assert len(room.corners) == 8
        rooms.append(room)

    # Cuboid fit runs for BOTH rooms, unconditionally.
    fitted = 0
    for i, room in enumerate(rooms):
        out = fit_cuboid_to_room(scene, room)
        assert out is not None and out[1] < 0.02, f"room {i}: rmse {out[1]}"
        rooms[i] = out[0]  # fitted room: corners + planes now the cuboid's
        fitted += 1
    assert fitted == 2

    # Arrange the two rooms along X (translate room 1 aside, connect the
    # facing walls) and optimize — unconditionally.
    from housescan_tpu.rooms import translate_room

    r1 = scene.rooms[rooms[1].room_id]
    scene.update_room(translate_room(r1, np.array([3.0, 0.0, 0.0], np.float32)))

    p0 = min(scene.rooms[rooms[0].room_id].planes, key=lambda p: p.normal[0])
    p1 = max(scene.rooms[rooms[1].room_id].planes, key=lambda p: p.normal[0])
    connected = connect_walls(scene, p0.plane_id, p1.plane_id, WallRelation.opposite(0.1))
    assert connected is not None, "wall connect must succeed on fitted cuboids"
    results = optimize_room_positions(scene)
    assert len(results) >= 1, "optimize must solve at least the X axis"
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
