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


class TestPrefetchingSource:
    def test_prefetch_preserves_order_and_count(self, stream_file):
        from housescan_tpu.capture.replay import PrefetchingSource

        path, frames, _ = stream_file
        src = PrefetchingSource(ReplaySource.open(path), depth=2)
        got = []
        while (f := src.read()) is not None:
            got.append(f)
        assert len(got) == len(frames)
        np.testing.assert_allclose(got[0], frames[0], atol=6e-4)
        np.testing.assert_allclose(got[-1], frames[-1], atol=6e-4)

    def test_many_concurrent_streams(self, stream_file):
        """Threading stress: several prefetchers draining in parallel
        (the queue-discipline testing SURVEY.md section 5 calls for)."""
        import threading

        from housescan_tpu.capture.replay import PrefetchingSource

        path, frames, _ = stream_file
        counts = []
        lock = threading.Lock()

        def drain():
            src = PrefetchingSource(ReplaySource.open(path), depth=1)
            n = 0
            while src.read() is not None:
                n += 1
            with lock:
                counts.append(n)

        threads = [threading.Thread(target=drain) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert counts == [len(frames)] * 8


class TestAsyncCheckpoint:
    def test_async_save_is_loadable(self, tmp_path):
        from housescan_tpu.io.checkpoint import load_scene, save_scene_async
        from housescan_tpu.rooms import Scene, load_room
        from housescan_tpu.testing import make_synthetic_room_dir

        scene = Scene()
        load_room(scene, make_synthetic_room_dir(tmp_path / "r", seed=5))
        t = save_scene_async(scene, tmp_path / "async.housescan")
        t.join(timeout=30)
        loaded = load_scene(tmp_path / "async.housescan")
        assert set(loaded.rooms) == set(scene.rooms)


class TestScanCheckpoint:
    def test_save_load_round_trip_and_resume_equivalence(self, stream_file, tmp_path):
        """A scan interrupted at frame 2 and resumed must produce the
        same final state as an uninterrupted scan (the reference's
        state-preserving-restart guarantee, ref Main.hs:1195-1260)."""
        import jax.numpy as jnp

        from housescan_tpu.capture.replay import load_stream
        from housescan_tpu.kinfu.pipeline import kinfu_init, kinfu_step
        from housescan_tpu.kinfu.scan_checkpoint import (
            load_scan_state,
            save_scan_state,
        )

        path, _, _ = stream_file
        stream = load_stream(path)
        intr = stream.intrinsics
        frames = [f for f in stream]

        def init():
            return kinfu_init(intr, resolution=64, size_m=3.0, trunc=0.1)

        # Uninterrupted reference run.
        ref = init()
        for f in frames[:4]:
            ref = kinfu_step(ref, jnp.asarray(f), intr, iterations=(2, 2, 2))

        # Interrupted at 2, checkpointed, resumed.
        st = init()
        for f in frames[:2]:
            st = kinfu_step(st, jnp.asarray(f), intr, iterations=(2, 2, 2))
        ck = tmp_path / "scan.npz"
        save_scan_state(st, 2, intr, ck)
        st2, next_frame, _ = load_scan_state(ck, intr)
        assert next_frame == 2
        for f in frames[2:4]:
            st2 = kinfu_step(st2, jnp.asarray(f), intr, iterations=(2, 2, 2))

        np.testing.assert_allclose(
            np.asarray(ref.pose), np.asarray(st2.pose), atol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(ref.volume.weight), np.asarray(st2.volume.weight)
        )

    def test_resumed_scan_writes_full_trajectory(self, stream_file, tmp_path):
        """trajectory.npz from an interrupted+resumed scan must be
        row-for-row identical to an uninterrupted scan's: the checkpoint
        persists the accumulated poses (row k = frame k)."""
        import dataclasses

        from housescan_tpu.config import Config, TsdfConfig
        from housescan_tpu.kinfu.scan import scan_to_room_dir

        path, _, poses = stream_file
        stream = load_stream(path)
        cfg = Config(tsdf=TsdfConfig(resolution=64, size_m=3.0, trunc_dist=0.1))
        kw = dict(
            config=cfg, init_pose=poses[0], use_pallas=False, downsample_to=4096
        )

        ref = scan_to_room_dir(stream, tmp_path / "full", **kw)
        ref_traj = np.load(ref / "trajectory.npz")["poses"]
        assert len(ref_traj) == len(stream)

        # Interrupt after 3 frames (checkpoint lands at frame 2), then
        # resume over the full stream.
        head = dataclasses.replace(stream, frames=stream.frames[:3])
        out = tmp_path / "resumed"
        scan_to_room_dir(head, out, checkpoint_every=2, **kw)
        scan_to_room_dir(stream, out, checkpoint_every=2, resume=True, **kw)
        got_traj = np.load(out / "trajectory.npz")["poses"]
        np.testing.assert_allclose(got_traj, ref_traj, atol=1e-6)

    def test_mismatched_intrinsics_refused(self, stream_file, tmp_path):
        import jax.numpy as jnp
        import pytest

        from housescan_tpu.capture.replay import load_stream
        from housescan_tpu.kinfu.camera import Intrinsics
        from housescan_tpu.kinfu.pipeline import kinfu_init
        from housescan_tpu.kinfu.scan_checkpoint import (
            load_scan_state,
            save_scan_state,
        )

        path, _, _ = stream_file
        stream = load_stream(path)
        st = kinfu_init(stream.intrinsics, resolution=64, size_m=3.0, trunc=0.1)
        ck = tmp_path / "scan.npz"
        save_scan_state(st, 0, stream.intrinsics, ck)
        other = Intrinsics(width=320, height=240, fx=200.0, fy=200.0, cx=159.5, cy=119.5)
        with pytest.raises(ValueError, match="intrinsics"):
            load_scan_state(ck, other)
