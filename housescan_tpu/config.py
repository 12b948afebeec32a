"""Configuration for the housescan-tpu pipeline.

The reference had no config system: runtime tunables lived in IORefs
adjusted through key bindings and a GLUT menu (wall thickness, move step,
suggestion cutoff, point size, FPS — ref Main.hs:450-463, :1059-1105), and
dataset paths were hard-coded (ref Main.hs:2344, :2489). Here every
tunable is a named, serializable dataclass field (SURVEY.md section 5,
"Config / flag system").
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class RoomsConfig:
    """Room-assembly stage tunables (the reference's State IORefs)."""

    # Default wall thickness in meters for Opposite wall connections
    # (ref Main.hs:1080 — sWallThickness 0.1; menu offers 0-60cm :455-458).
    wall_thickness: float = 0.1
    # Corner suggestions are kept within cutoff_factor * max distance of
    # any cloud point from the room mean (ref Main.hs:1084, :1527-1528).
    suggestion_cutoff_factor: float = 1.2
    # Manual wall move step in meters (ref Main.hs:1085 — sWallMoveStep).
    wall_move_step: float = 0.01
    # Fraction of top points removed by remove_ceiling (ref Main.hs:2650).
    ceiling_fraction: float = 0.2
    # Plane-face membership tolerance when building cuboid faces
    # (ref Main.hs:1882).
    face_membership_tol: float = 1e-4
    # Grid spacing when laying out freshly loaded rooms (ref Main.hs:2504).
    grid_spacing: float = 6.0


@dataclass(frozen=True)
class CuboidFitConfig:
    """Cuboid fit solver settings (ref FitCuboidBFGS.hs:175-233)."""

    tol: float = 1e-8
    max_iter: int = 2000
    n_starts: int = 8  # quaternion multi-start breadth (reference used 1)


@dataclass(frozen=True)
class CameraConfig:
    """Depth camera intrinsics (the reference hard-coded an ad-hoc scale
    and noted 'should use camera intrinsics', ref Main.hs:1307-1313).

    Defaults are the Kinect/Xtion 640x480 depth camera that both the
    reference's OpenNI capture and PCL KinFu assume.
    """

    width: int = 640
    height: int = 480
    fx: float = 525.0
    fy: float = 525.0
    cx: float = 319.5
    cy: float = 239.5
    depth_scale: float = 0.001  # raw uint16 millimeters -> meters
    z_min: float = 0.3
    z_max: float = 6.0

    def scaled(self, level: int) -> "CameraConfig":
        """Intrinsics for pyramid level ``level`` (each level halves).
        Point-sampling convention, matching Intrinsics.level."""
        f = 1 << level
        return dataclasses.replace(
            self,
            width=self.width // f,
            height=self.height // f,
            fx=self.fx / f,
            fy=self.fy / f,
            cx=self.cx / f,
            cy=self.cy / f,
        )


@dataclass(frozen=True)
class TsdfConfig:
    """TSDF volume parameters (PCL KinFu defaults: 3m cube, 512^3 grid)."""

    resolution: int = 512  # voxels per side
    size_m: float = 3.0  # physical cube edge in meters
    trunc_dist: float = 0.03  # truncation distance in meters (>= voxel size)
    max_weight: float = 128.0
    # storage dtype for the tsdf values: "float32" or "bfloat16"
    dtype: str = "float32"

    @property
    def voxel_size(self) -> float:
        return self.size_m / self.resolution


@dataclass(frozen=True)
class IcpConfig:
    """Projective point-to-plane ICP settings (PCL KinFu-style pyramid)."""

    iterations: Tuple[int, ...] = (10, 5, 4)  # coarse -> fine per level
    dist_threshold: float = 0.10  # correspondence rejection (meters)
    angle_threshold: float = 0.5236  # ~30 degrees, normal agreement
    min_valid_fraction: float = 0.1


@dataclass(frozen=True)
class RansacConfig:
    """RANSAC plane detection (replaces the PCL plane-detection tool that
    produced planes.txt, ref README.md:15, Main.hs:1392-1404)."""

    n_hypotheses: int = 512
    inlier_threshold: float = 0.02  # meters
    max_planes: int = 8
    min_inlier_fraction: float = 0.05


@dataclass(frozen=True)
class Config:
    rooms: RoomsConfig = field(default_factory=RoomsConfig)
    cuboid: CuboidFitConfig = field(default_factory=CuboidFitConfig)
    camera: CameraConfig = field(default_factory=CameraConfig)
    tsdf: TsdfConfig = field(default_factory=TsdfConfig)
    icp: IcpConfig = field(default_factory=IcpConfig)
    ransac: RansacConfig = field(default_factory=RansacConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "Config":
        raw = json.loads(text)
        kwargs = {}
        for f in dataclasses.fields(cls):
            if f.name in raw:
                sub = raw[f.name]
                if "iterations" in sub:
                    sub = dict(sub, iterations=tuple(sub["iterations"]))
                kwargs[f.name] = _SUBCONFIGS[f.name](**sub)
        return cls(**kwargs)


def enable_compilation_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at a local directory.

    First-compile cost on the real chip is ~40 s for the fused scan step
    (BENCH_r01 tail) — hostile to the interactive scan workflow the
    reference's instant-feedback GLUT loop had (ref Main.hs:877-898).
    With the cache on, the second process start loads the executable
    from disk in seconds.

    Resolution order: explicit arg > $HOUSESCAN_COMPILE_CACHE >
    ``~/.cache/housescan_tpu/xla_cache``. Set
    ``HOUSESCAN_COMPILE_CACHE=off`` to disable. Best-effort: returns the
    directory on success, None if the backend/config rejects it.
    """
    import os

    env = os.environ.get("HOUSESCAN_COMPILE_CACHE", "")
    if env.lower() in ("off", "0", "none"):
        return None
    path = cache_dir or env or os.path.expanduser("~/.cache/housescan_tpu/xla_cache")
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        # Cache every program: the scan path is dominated by a handful of
        # big programs, but tiny helper programs recompile on each CLI
        # invocation too.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return None
    return str(path)


_SUBCONFIGS = {
    "rooms": RoomsConfig,
    "cuboid": CuboidFitConfig,
    "camera": CameraConfig,
    "tsdf": TsdfConfig,
    "icp": IcpConfig,
    "ransac": RansacConfig,
}

DEFAULT_CONFIG = Config()
