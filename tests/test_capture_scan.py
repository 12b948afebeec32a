"""Tests for depth-stream capture/replay and the scan -> room-dir bridge."""

import numpy as np
import pytest

from housescan_tpu.capture.replay import (
    ReplaySource,
    DepthStream,
    depth_frame_to_cloud,
    load_stream,
    record_stream,
    take_depth_snapshot,
)
from housescan_tpu.kinfu.camera import Intrinsics
from housescan_tpu.kinfu.synthetic import furnished_room, orbit_poses, render_depth_stream

INTR = Intrinsics(width=160, height=120, fx=131.25, fy=131.25, cx=79.5, cy=59.5)


@pytest.fixture(scope="module")
def stream_file(tmp_path_factory):
    half, boxes = furnished_room()
    poses = orbit_poses(6, radius=0.25, yaw_range=0.1, pitch=0.25)
    frames = render_depth_stream(INTR, poses, half, boxes=boxes)
    path = tmp_path_factory.mktemp("streams") / "scan.npz"
    record_stream(path, frames, INTR, poses=poses)
    return path, frames, poses


class TestReplay:
    def test_record_load_round_trip(self, stream_file):
        path, frames, poses = stream_file
        stream = load_stream(path)
        assert stream.intrinsics == INTR
        assert len(stream) == len(frames)
        # uint16 mm quantization: 0.5mm max error
        np.testing.assert_allclose(stream.frames, frames, atol=6e-4)
        np.testing.assert_allclose(stream.poses, poses, atol=1e-6)

    def test_replay_source_frame_at_a_time(self, stream_file):
        path, frames, _ = stream_file
        src = ReplaySource.open(path)
        count = 0
        while (f := src.read()) is not None:
            assert f.shape == frames[0].shape
            count += 1
        assert count == len(frames)
        assert src.read() is None  # stays exhausted

    def test_live_capture_fails_soft(self):
        # like the reference with no camera (ref Main.hs:1288-1289)
        assert take_depth_snapshot() is None

    def test_depth_frame_to_cloud(self, stream_file):
        _, frames, _ = stream_file
        pts = depth_frame_to_cloud(frames[0], INTR)
        assert pts.shape[1] == 3
        assert len(pts) == (frames[0] > 0).sum()
        # center pixel's depth equals its z
        assert pts[:, 2].min() > 0


class TestScanBridge:
    def test_scan_produces_reference_layout(self, stream_file, tmp_path):
        from housescan_tpu.config import Config, TsdfConfig
        from housescan_tpu.kinfu.scan import scan_to_room_dir
        import dataclasses

        path, _, poses = stream_file
        stream = load_stream(path)
        cfg = Config(tsdf=TsdfConfig(resolution=128, size_m=3.0, trunc_dist=0.06))
        out = scan_to_room_dir(
            stream,
            tmp_path / "room_scan",
            config=cfg,
            init_pose=poses[0],
            use_pallas=False,
            downsample_to=8192,
        )
        assert (out / "cloud_downsampled.pcd").exists()
        assert (out / "cloud_bin.pcd").exists()
        assert (out / "planes.txt").exists()
        assert (out / "cloud_plane_hull0.pcd").exists()
        assert (out / "trajectory.npz").exists()

        # the output is loadable by the rooms stage
        from housescan_tpu.rooms import Scene, load_room

        scene = Scene()
        room = load_room(scene, out)
        assert len(room.cloud.points) > 1000
        # the short 6-frame sweep legitimately sees only the far wall and
        # one box face above the inlier threshold
        assert len(room.planes) >= 2
        # inward normals hold for scanned rooms too
        center = room.mean()
        for p in room.planes:
            assert float(np.dot(center - p.mean(), p.normal)) > 0
