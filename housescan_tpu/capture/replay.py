"""Depth-stream capture: recorded-stream replay (and a live-device stub).

Capability parity with the reference's OpenNI capture path (HoniHelper.hs
+ addDevicePointCloud, ref Main.hs:1282-1313), redesigned for testability:
the reference grabbed single frames from a USB camera and noted that the
camera path 'fails soft with a warning when no device is present'
(ref HoniHelper.hs:27-28). Here the FIRST-CLASS path is recorded streams
(.npz of uint16 millimeter frames — the Kinect wire format — plus
intrinsics), which is what CI, benchmarks, and the KinFu pipeline
consume; a live OpenNI-style source is a stub that fails soft the same
way the reference did.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Iterator, Optional, Union

import numpy as np

from housescan_tpu.config import CameraConfig
from housescan_tpu.kinfu.camera import Intrinsics


@dataclass
class DepthStream:
    """A recorded depth stream: (N, H, W) float32 meters + intrinsics."""

    frames: np.ndarray
    intrinsics: Intrinsics
    poses: Optional[np.ndarray] = None  # (N, 4, 4) ground truth if known

    def __len__(self) -> int:
        return len(self.frames)

    def __iter__(self) -> Iterator[np.ndarray]:
        return iter(self.frames)


def record_stream(
    path: Union[str, Path],
    frames: np.ndarray,
    intrinsics: Intrinsics,
    poses: Optional[np.ndarray] = None,
    depth_scale: float = 0.001,
) -> Path:
    """Write a stream as uint16 millimeters (the Kinect wire format the
    reference read as Vector Word16, ref HoniHelper.hs:45-46)."""
    path = Path(path)
    raw = np.clip(np.round(np.asarray(frames) / depth_scale), 0, 65535).astype(np.uint16)
    payload = {
        "depth_mm": raw,
        "intrinsics": np.array(
            [
                intrinsics.width,
                intrinsics.height,
                intrinsics.fx,
                intrinsics.fy,
                intrinsics.cx,
                intrinsics.cy,
            ],
            np.float64,
        ),
        "depth_scale": np.float64(depth_scale),
    }
    if poses is not None:
        payload["poses"] = np.asarray(poses, np.float32)
    np.savez_compressed(path, **payload)
    return path


def load_stream(path: Union[str, Path]) -> DepthStream:
    data = np.load(Path(path))
    ia = data["intrinsics"]
    intr = Intrinsics(
        width=int(ia[0]),
        height=int(ia[1]),
        fx=float(ia[2]),
        fy=float(ia[3]),
        cx=float(ia[4]),
        cy=float(ia[5]),
    )
    scale = float(data["depth_scale"]) if "depth_scale" in data else 0.001
    from housescan_tpu.io import native

    frames = native.decode_u16_depth(data["depth_mm"], scale)
    poses = data["poses"] if "poses" in data.files else None
    return DepthStream(frames=frames, intrinsics=intr, poses=poses)


class ReplaySource:
    """Frame-at-a-time source over a recorded stream (the streaming-loop
    interface the fusion pipeline consumes)."""

    def __init__(self, stream: DepthStream):
        self.stream = stream
        self._i = 0

    @classmethod
    def open(cls, path: Union[str, Path]) -> "ReplaySource":
        return cls(load_stream(path))

    @property
    def intrinsics(self) -> Intrinsics:
        return self.stream.intrinsics

    def read(self) -> Optional[np.ndarray]:
        """Next depth frame in meters, or None at end of stream."""
        if self._i >= len(self.stream):
            return None
        frame = self.stream.frames[self._i]
        self._i += 1
        return frame


class PrefetchingSource:
    """Background-thread prefetcher over any frame source.

    The host-async piece of the streaming loop (SURVEY.md section 2c:
    'host async … capture + export around the device loop'): a worker
    thread decodes/loads frames into a bounded queue while the device
    fuses the previous one. The native uint16 decode
    (io.native.decode_u16_depth) runs on the worker, off the main thread.
    """

    def __init__(self, source, depth: int = 4):
        import queue
        import threading

        self._source = source
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._done = object()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    @property
    def intrinsics(self):
        return self._source.intrinsics

    def _run(self):
        while True:
            frame = self._source.read()
            self._q.put(self._done if frame is None else frame)
            if frame is None:
                return

    def read(self):
        item = self._q.get()
        return None if item is self._done else item


def take_depth_snapshot(config: Optional[CameraConfig] = None):
    """Live single-frame capture (ref HoniHelper.hs:20-42): one frame
    from the best available live device (capture/live.py — a real
    OpenNI camera, or the HOUSESCAN_FAKE_DEVICE recorded-device
    fixture). Warns and returns None when no device binds, like the
    reference with no camera present (ref Main.hs:1288-1289)."""
    from housescan_tpu.capture.live import open_live_source

    src = open_live_source(config)
    if src is None:
        return None
    frame = src.read()
    src.stop()
    return frame


def depth_frame_to_cloud(depth: np.ndarray, intr: Intrinsics) -> np.ndarray:
    """Backproject one depth frame to camera-frame points, dropping
    invalid pixels (the reference's Enter-key capture path,
    ref Main.hs:1296-1313 — but with real intrinsics instead of its
    hard-coded scale)."""
    import jax.numpy as jnp

    from housescan_tpu.kinfu.preprocess import depth_to_vertices

    verts = np.asarray(depth_to_vertices(jnp.asarray(depth), intr))
    return verts[depth > 0]
