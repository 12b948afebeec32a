"""Scan pipeline: depth stream in -> reference-layout room directory out.

The end-to-end bridge the reference ran as two external C++ tools
(ref README.md:14-15): its KinFu scan tool produced per-room clouds and
its PCL plane-detection tool produced planes.txt + hulls, which the
Haskell stage then loaded (ref Main.hs:1738-1762). Here it is one
function: fuse the stream (Pallas kernels on TPU), extract the surface,
detect wall planes, and write

    cloud_downsampled.pcd   interaction-resolution surface cloud
    cloud_bin.pcd           full-resolution surface cloud
    planes.txt              detected planes (PCL sign convention)
    cloud_plane_hull<k>.pcd per-plane boundary polygons
    mesh.ply                (optional) marching-tetrahedra mesh
    trajectory.npz          per-frame camera poses

so rooms.load_room consumes the output unchanged.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from housescan_tpu.capture.replay import DepthStream
from housescan_tpu.config import Config
from housescan_tpu.kinfu.pipeline import kinfu_init, kinfu_step, pallas_supported
from housescan_tpu.kinfu.ransac import detect_planes_to_dir
from housescan_tpu.kinfu.tsdf import extract_surface_points
from housescan_tpu.io.pcd import save_pcd


def scan_to_room_dir(
    stream: DepthStream,
    out_dir: Union[str, Path],
    config: Optional[Config] = None,
    init_pose: Optional[np.ndarray] = None,
    max_points_full: int = 1 << 20,
    downsample_to: int = 1 << 16,
    write_mesh: bool = False,
    use_pallas: Optional[bool] = None,
    progress: bool = False,
    checkpoint_every: int = 0,
    checkpoint_path: Optional[Union[str, Path]] = None,
    resume: bool = False,
    known_poses: Optional[np.ndarray] = None,
) -> Path:
    """Fuse a depth stream and write the room directory. Returns out_dir.

    ``checkpoint_every=N`` writes a resumable scan checkpoint (full
    fusion state) every N frames to ``checkpoint_path`` (default
    ``<out_dir>/scan_checkpoint.npz``); ``resume=True`` continues from
    it, skipping already-fused frames (kinfu/scan_checkpoint.py).

    ``known_poses`` ((N, 4, 4) camera-to-world) fuses each frame at its
    externally-known pose instead of tracking (offline-refined
    trajectories, rig encoders, synthetic ground truth) — the camera may
    then move arbitrarily fast between frames.
    """
    config = config or Config()
    intr = stream.intrinsics
    tsdf_cfg = config.tsdf

    if use_pallas is None:
        use_pallas = pallas_supported(tsdf_cfg.resolution)

    ckpt = Path(checkpoint_path) if checkpoint_path else Path(out_dir) / "scan_checkpoint.npz"
    start_frame = 0
    state = None
    poses = []
    if resume and ckpt.exists():
        from housescan_tpu.kinfu.scan_checkpoint import load_scan_state

        state, start_frame, trajectory = load_scan_state(ckpt, intr)
        # Restore the pre-checkpoint poses so trajectory.npz row k is
        # frame k even after a resume.
        poses = list(trajectory)
        if len(poses) != start_frame:
            raise ValueError(
                f"scan checkpoint stores {len(poses)} poses but resumes at "
                f"frame {start_frame}; refusing to write a misaligned "
                "trajectory (v1 checkpoints have no trajectory - rescan)"
            )
        if progress:
            print(f"  resuming from {ckpt} at frame {start_frame}")
    if state is None:
        state = kinfu_init(
            intr,
            resolution=tsdf_cfg.resolution,
            size_m=tsdf_cfg.size_m,
            trunc=tsdf_cfg.trunc_dist,
            init_pose=None if init_pose is None else jnp.asarray(init_pose),
        )
    n_dropped = 0
    for k, frame in enumerate(stream):
        if k < start_frame:
            continue
        state = kinfu_step(
            state,
            jnp.asarray(frame),
            intr,
            iterations=config.icp.iterations,
            dist_threshold=config.icp.dist_threshold,
            angle_threshold=config.icp.angle_threshold,
            max_weight=tsdf_cfg.max_weight,
            z_min=config.camera.z_min,
            use_pallas=use_pallas,
            forced_pose=(
                None if known_poses is None else jnp.asarray(known_poses[k])
            ),
        )
        poses.append(np.asarray(state.pose))
        if not bool(state.last_tracked):
            n_dropped += 1
            if progress:
                print(
                    f"  frame {k}/{len(stream)} TRACKING LOST "
                    f"(corr {int(state.last_corr)}) — frame dropped"
                )
        if checkpoint_every and (k + 1) % checkpoint_every == 0:
            from housescan_tpu.kinfu.scan_checkpoint import save_scan_state

            save_scan_state(state, k + 1, intr, ckpt, trajectory=np.stack(poses))
        if progress and k % 10 == 0:
            print(f"  frame {k}/{len(stream)} icp_rmse={float(state.last_rmse)*1000:.2f}mm")
    if progress and n_dropped:
        print(f"  {n_dropped} frame(s) dropped to tracking loss")

    return write_room_outputs(
        state.volume,
        poses,
        out_dir,
        config=config,
        icp_rmse=float(state.last_rmse),
        max_points_full=max_points_full,
        downsample_to=downsample_to,
        write_mesh=write_mesh,
    )


def write_room_outputs(
    volume,
    poses,
    out_dir: Union[str, Path],
    config: Optional[Config] = None,
    icp_rmse: float = 0.0,
    max_points_full: int = 1 << 20,
    downsample_to: int = 1 << 16,
    write_mesh: bool = False,
) -> Path:
    """Extract the fused surface and write the reference-layout room
    directory (clouds, planes.txt + hulls, trajectory, optional mesh).
    Shared by the single-chip scan loop and the sharded building scan
    (kinfu/building.py), which fuse differently but export alike."""
    config = config or Config()
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    pts, count = extract_surface_points(volume, max_points=max_points_full)
    full = np.asarray(pts[: int(count)])
    save_pcd(out_dir / "cloud_bin.pcd", full)

    if len(full) > downsample_to:
        idx = np.random.default_rng(0).choice(len(full), downsample_to, replace=False)
        down = full[idx]
    else:
        down = full
    save_pcd(out_dir / "cloud_downsampled.pcd", down)

    detect_planes_to_dir(
        down,
        out_dir,
        max_planes=config.ransac.max_planes,
        n_hypotheses=config.ransac.n_hypotheses,
        inlier_threshold=config.ransac.inlier_threshold,
        min_inliers=max(
            int(config.ransac.min_inlier_fraction * len(down)), 50
        ),
    )

    np.savez(
        out_dir / "trajectory.npz",
        poses=np.stack(poses) if len(poses) else np.zeros((0, 4, 4), np.float32),
        icp_rmse=icp_rmse,
    )

    if write_mesh:
        from housescan_tpu.kinfu.marching_cubes import marching_cubes
        from housescan_tpu.io.ply import save_ply

        mesh = marching_cubes(volume)
        save_ply(out_dir / "mesh.ply", mesh)

    return out_dir
