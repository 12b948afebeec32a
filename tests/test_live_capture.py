"""Live-capture device path tests (ref HoniHelper.hs:20-46, the
Enter-key capture workflow Main.hs:1282-1313): the OpenNI-style device
layer, latest-wins pacing, and the `scan --live` CLI smoke test against
the recorded-device fixture."""

import time

import numpy as np
import pytest

from housescan_tpu.capture.live import (
    FakeDevice,
    LiveSource,
    LiveStream,
    open_live_source,
)
from housescan_tpu.capture.replay import record_stream
from housescan_tpu.kinfu.camera import Intrinsics
from housescan_tpu.kinfu.synthetic import furnished_room, orbit_poses, render_depth_stream

INTR = Intrinsics(width=160, height=120, fx=131.25, fy=131.25, cx=79.5, cy=59.5)


@pytest.fixture(scope="module")
def device_fixture(tmp_path_factory):
    half, boxes = furnished_room()
    poses = orbit_poses(6, radius=0.25, yaw_range=0.1, pitch=0.25)
    frames = render_depth_stream(INTR, poses, half, boxes=boxes)
    path = tmp_path_factory.mktemp("dev") / "device.npz"
    record_stream(path, frames, INTR, poses=poses)
    return path, np.asarray(frames)


class TestFakeDevice:
    def test_wire_format_and_lifecycle(self, device_fixture):
        path, frames = device_fixture
        dev = FakeDevice.open(path)
        assert dev.intrinsics == INTR
        with pytest.raises(AssertionError):
            dev.read_frame()  # must start() first
        dev.start()
        got = []
        while (item := dev.read_frame()) is not None:
            frame_mm, ts = item
            assert frame_mm.dtype == np.uint16
            got.append((frame_mm, ts))
        assert len(got) == len(frames)
        # wire mm -> meters round trip within uint16 quantization
        np.testing.assert_allclose(
            got[0][0] * dev.depth_scale, frames[0], atol=6e-4
        )
        # timestamps advance at the device rate
        assert got[1][1] > got[0][1]
        dev.stop()

    def test_live_source_reads_all_when_consumer_keeps_up(self, device_fixture):
        path, frames = device_fixture
        src = LiveSource(FakeDevice.open(path, realtime=True, fps=200.0))
        n = 0
        while (f := src.read()) is not None:
            assert f.dtype == np.float32
            n += 1
        # paced device + prompt consumer: most frames seen, few drops
        assert n + src.dropped == len(frames)
        assert n >= 2

    def test_latest_wins_when_consumer_is_slow(self, device_fixture):
        path, frames = device_fixture
        # Device free-runs (no pacing): a slow consumer must see the
        # NEWEST frame and the overwritten ones must be counted.
        src = LiveSource(FakeDevice.open(path))
        time.sleep(0.3)  # let the pump race ahead
        first = src.read()
        assert first is not None
        rest = 0
        while src.read() is not None:
            rest += 1
        assert src.dropped > 0
        assert src.frames_read + src.dropped == len(frames)

    def test_live_stream_bounds_frames(self, device_fixture):
        path, _ = device_fixture
        src = LiveSource(
            FakeDevice.open(path, realtime=True, fps=500.0)
        )
        stream = LiveStream(src, max_frames=3)
        assert len(stream) == 3
        frames = list(stream)
        assert len(frames) <= 3


class TestOpenLiveSource:
    def test_fixture_env_selects_fake_device(self, device_fixture, monkeypatch):
        path, _ = device_fixture
        monkeypatch.setenv("HOUSESCAN_FAKE_DEVICE", str(path))
        src = open_live_source()
        assert src is not None
        assert src.intrinsics == INTR
        assert src.read() is not None
        src.stop()

    def test_fails_soft_without_device(self, monkeypatch, capsys):
        monkeypatch.delenv("HOUSESCAN_FAKE_DEVICE", raising=False)
        assert open_live_source() is None
        assert "no depth camera" in capsys.readouterr().err


class TestScanLiveCli:
    def test_scan_live_smoke(self, device_fixture, tmp_path, monkeypatch):
        path, _ = device_fixture
        monkeypatch.setenv("HOUSESCAN_FAKE_DEVICE", str(path))
        from housescan_tpu.cli.main import main

        main(
            [
                "--scene", str(tmp_path / "scene.housescan"),
                "scan", "--live", "--max-frames", "4",
                "--resolution", "128", "--size-m", "3.2",
                str(tmp_path / "live_room"),
            ]
        )
        out = tmp_path / "live_room"
        assert (out / "cloud_downsampled.pcd").exists()
        assert (out / "planes.txt").exists()
        traj = np.load(out / "trajectory.npz")["poses"]
        assert 1 <= len(traj) <= 4
