"""The KinFu tracking + fusion loop.

End-to-end TPU equivalent of the reference's external KinFu scan tool
(ref README.md:14): raw depth frames in, tracked camera poses and a fused
TSDF volume out. One ``kinfu_step`` is a single jitted program: bilateral
filter -> pyramid -> ICP against the previous frame's raycast model ->
TSDF integrate -> raycast the new model for the next frame.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from housescan_tpu.geometry.transform import mm
from housescan_tpu.kinfu import maps as mp
from housescan_tpu.kinfu.camera import Intrinsics
from housescan_tpu.kinfu.icp import icp_track
from housescan_tpu.kinfu.preprocess import build_pyramid
from housescan_tpu.kinfu.raycast import raycast
from housescan_tpu.kinfu.tsdf import TsdfVolume, tsdf_integrate, tsdf_new


class KinFuState(NamedTuple):
    volume: TsdfVolume
    # Persistent per-sub-block surface planes (nbx, nbx, nzc, 16, 16) —
    # the plane raycast's acceleration structure, refreshed in-place by
    # the streaming integrate for exactly the chunks whose TSDF changed
    # (ops/tsdf_stream.py). Dummy (1,1,1,16,16) zeros when the volume
    # is not (8,8,128)-tileable (CPU/XLA path).
    planes: jnp.ndarray
    pose: jnp.ndarray  # (4, 4) current camera-to-world
    # Raycast model maps rendered at model_pose, CHANNEL-MAJOR packed
    # (8, H, W): depth, world vertex xyz, world normal xyz, valid
    # (kinfu/maps.py — interleaved (H, W, 3) maps run near-empty VPU
    # lanes and gather-class downsamples on this backend).
    model_maps: jnp.ndarray  # (8, H, W) f32
    model_pose: jnp.ndarray  # (4, 4)
    frame_index: jnp.ndarray  # () int32
    last_rmse: jnp.ndarray  # () f32 ICP rmse of the last step
    last_corr: jnp.ndarray  # () int32 ICP correspondences of the last step
    # () bool — the last frame's ICP produced a usable pose. False =
    # TRACKING LOST (correspondence collapse even after the adaptive
    # gate widened): the frame was DROPPED — not integrated, pose and
    # model unchanged — so one bad frame cannot corrupt the map (the
    # reference's PCL KinFu stops integrating on ICP failure the same
    # way). Tracking resumes when the camera returns near the last
    # good pose.
    last_tracked: jnp.ndarray


def kinfu_init(
    intr: Intrinsics,
    resolution: int = 512,
    size_m: float = 3.0,
    trunc: float = 0.03,
    origin=None,
    init_pose: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
) -> KinFuState:
    vol = tsdf_new(resolution, size_m, trunc, origin, dtype)
    # Copy the init pose: state buffers are donated through kinfu_step, so
    # aliasing a caller-owned array here would delete it under them.
    pose = (
        jnp.eye(4, dtype=jnp.float32)
        if init_pose is None
        else jnp.array(init_pose, jnp.float32, copy=True)
    )
    if resolution % 128 == 0:
        from housescan_tpu.ops.tsdf_stream import planes_shape

        planes = jnp.zeros(planes_shape(resolution), jnp.float32)
    else:
        planes = jnp.zeros((1, 1, 1, 16, 16), jnp.float32)
    h, w = intr.height, intr.width
    return KinFuState(
        volume=vol,
        planes=planes,
        pose=pose,
        model_maps=jnp.zeros((mp.MODEL_ROWS, h, w), jnp.float32),
        model_pose=jnp.array(pose, jnp.float32, copy=True),
        frame_index=jnp.asarray(0, jnp.int32),
        last_rmse=jnp.asarray(0.0, jnp.float32),
        last_corr=jnp.asarray(0, jnp.int32),
        last_tracked=jnp.asarray(True),
    )


def inverse_rigid(m: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a rigid row-vector 4x4: R -> R^T, t -> -t R^T."""
    r = m[:3, :3]
    t = m[3, :3]
    inv = jnp.eye(4, dtype=m.dtype)
    inv = inv.at[:3, :3].set(r.T)
    inv = inv.at[3, :3].set(mm(-t, r.T))
    return inv


def _integrate_dispatch(
    volume, planes, raw_depth, new_pose, intr, max_weight, use_pallas,
    interpret=False,
):
    """Returns (volume, planes); the streaming Pallas kernel refreshes
    the persistent surface planes for exactly the chunks it updates."""
    if use_pallas:
        from housescan_tpu.ops.tsdf_stream import tsdf_integrate_stream

        return tsdf_integrate_stream(
            volume, planes, raw_depth, new_pose, intr,
            max_weight=max_weight, interpret=interpret,
        )
    return (
        tsdf_integrate(volume, raw_depth, new_pose, intr, max_weight=max_weight),
        planes,
    )


def pallas_supported(volume_resolution: int) -> bool:
    """The Pallas integrate path requires TPU and a (8,8,128)-tileable
    volume. On this chip it is 150x faster than the XLA path (78ms vs
    11.8s at 512^3 — XLA lowers the depth gather to near-scalar code)."""
    import jax

    return (
        jax.default_backend() not in ("cpu",)
        and volume_resolution % 128 == 0
    )


@partial(
    jax.jit,
    static_argnames=(
        "intr", "levels", "iterations", "max_raycast_steps", "use_pallas",
        "interpret",
    ),
    donate_argnums=(0,),
)
def kinfu_step(
    state: KinFuState,
    raw_depth: jnp.ndarray,
    intr: Intrinsics,
    levels: int = 3,
    iterations: Tuple[int, ...] = (10, 5, 4),
    dist_threshold=None,
    angle_threshold: float = 0.5236,
    max_weight: float = 128.0,
    z_min: float = 0.3,
    max_raycast_steps: int = 256,
    use_pallas: bool = False,
    interpret: bool = False,
    forced_pose: jnp.ndarray = None,
) -> KinFuState:
    """Track and fuse one depth frame (the benchmark unit of BASELINE.json:
    'depth frames/sec TSDF integrate+ICP at 512^3').

    ``forced_pose`` fuses the frame at an externally-known camera pose
    (offline-refined trajectory, a rig encoder, or synthetic ground
    truth) instead of tracking — ICP is skipped entirely and the frame
    always integrates."""
    pyr = build_pyramid(raw_depth, intr, levels=levels)

    # Model pyramid from the stored full-res raycast maps: exact point
    # sampling via one-hot matmuls (kinfu/maps.py — strided slices are
    # gather-class on this backend, ~1.8 ms for one map pyramid).
    model_pyr = mp.build_map_pyramid(state.model_maps, levels)

    is_first = state.frame_index == 0

    # Model maps are rendered at model_pose (the previous estimate); the
    # ICP starts there too. (Constant-velocity seeding was tried and
    # REMOVED: it injects the previous frame's residual error into the
    # next initialization, raising the tracking-fusion feedback gain past
    # one — the closed loop then snaps after ~15 frames even though every
    # individual clean-map ICP solve is sub-millimeter. The association
    # windows comfortably cover per-frame motion without seeding.)
    # The ADAPTIVE tight gate must sit BETWEEN the true residuals
    # (sub-voxel) and the model's bias tail, and the tail is
    # VOXEL-scaled (~1-1.5 voxels: plane-extension skirts and
    # sub-gate-tail silhouette pixels measured -31 mm at 128^3,
    # -10 mm at 256^3). A flat gate fails on both ends: 15 mm at 256^3
    # admits the whole tail (gt-posed per-frame tracking error 3.6 mm
    # vs 0.37 mm at 128^3 where the same 15 mm excludes it), and a
    # large multiple (1.5 voxels) re-admits it at coarse resolutions.
    # 0.5 voxels splits them at every resolution; the 6 mm floor keeps
    # sensor-noise-scale inliers at fine resolutions (Kinect sigma at
    # 2 m ~ 4-8 mm). Fast motion is covered by the adaptive widening to
    # the loose per-level gates, not by a bigger tight gate
    # (icp_track docstring for all measurements).
    tight = jnp.maximum(0.5 * state.volume.voxel_size, 0.006)
    if dist_threshold is None:
        # NOTE the finest level's WIDENED gate equals its tight gate,
        # so icp_track's correspondence-collapse widening is a no-op at
        # level 0 by construction — implicated in the 512^3 long-orbit
        # spiral (PERFORMANCE.md: once closed-loop error passes the
        # 2.9 mm tight gate the fine level starves with nowhere to
        # widen to). HOUSESCAN_L0_WIDE (meters) sets a genuinely wider
        # level-0 fallback for experiments; default unchanged because
        # the tight-first design is measured-good at 20-frame scale and
        # a wider fallback re-admits the bias tail it exists to block.
        import os as _os

        _l0w = float(_os.environ.get("HOUSESCAN_L0_WIDE", "0"))
        dist_threshold = (
            jnp.maximum(tight, _l0w) if _l0w else tight,
            0.05,
            0.10,
        )

    init_pose = state.model_pose
    if forced_pose is None:
        icp = icp_track(
            list(pyr.maps),
            model_pyr,
            state.model_pose,
            intr,
            iterations=iterations,
            dist_threshold=dist_threshold,
            angle_threshold=angle_threshold,
            init_pose=init_pose,
            use_pallas=use_pallas,
            interpret=interpret,
            tight_threshold=tight,
        )
        # Frame 0 has no model yet: keep the initial pose.
        new_pose = jnp.where(is_first, state.pose, icp.pose)
        icp_rmse = icp.rmse
        icp_corr = icp.n_corr
    else:
        new_pose = jnp.asarray(forced_pose, jnp.float32)
        icp_rmse = jnp.asarray(0.0, jnp.float32)
        icp_corr = jnp.asarray(0, jnp.int32)

    # TRACKING-LOSS gate (KinFuState.last_tracked): if the adaptive ICP
    # still ends with a collapsed correspondence set, the pose is
    # unusable — DROP the frame: keep the previous pose, feed the
    # integrate an all-invalid depth (its prepass then lists nothing
    # and the volume/planes pass through unchanged), and keep the
    # previous model maps. 0.2% of pixels separates cleanly: genuinely
    # lost tracking measures ~0.07% while sparse early models still
    # give >1% (kinfu/icp.py capture-range measurements). A frame whose
    # MODEL was too sparse to ever yield min_corr is a GROWTH-phase
    # frame, not a tracking loss: there was nothing to track against
    # (young map, or the camera swung onto unscanned space), so keep
    # integrating at the carried pose instead of stalling the map.
    min_corr = max(32, int(0.002 * intr.width * intr.height))
    model_px = jnp.sum(state.model_maps[mp.MD_VALID] > 0.5)
    both_valid = (raw_depth > 0) & (state.model_maps[mp.MD_VALID] > 0.5)
    view_incons = jnp.sum(
        jnp.where(
            both_valid,
            jnp.minimum(jnp.abs(raw_depth - state.model_maps[mp.MD_DEPTH]), 1.0),
            0.0,
        )
    ) / jnp.maximum(jnp.sum(both_valid), 1)
    if forced_pose is None:
        # View-consistency gate alongside the correspondence gate:
        # since the ICP solve gained the null-space filter, a garbage
        # view no longer walks the pose away (which used to collapse
        # the correspondence count into the detector) — it converges
        # NEAR the old pose with a few dozen self-consistent spurious
        # pixels (corr ~0.4%, rmse mm-scale: both legacy signals
        # fooled). The unfakeable signal is global: the mean |live -
        # model| depth discrepancy over jointly-valid pixels (clipped
        # at 1 m) measures ~13 mm tracked, ~38 mm at the 30 mm
        # fast-motion design point, and ~380 mm teleported — 0.15 m
        # splits with 4x margin both ways, resolution-independent.
        tracked = (
            is_first
            | ((icp_corr >= min_corr) & (view_incons <= 0.15))
            | (model_px < 4 * min_corr)
        )
    else:
        tracked = jnp.asarray(True)  # known pose: always fuse
    new_pose = jnp.where(tracked, new_pose, state.pose)
    depth_eff = jnp.where(tracked, raw_depth, jnp.zeros_like(raw_depth))

    volume, planes = _integrate_dispatch(
        state.volume, state.planes, depth_eff, new_pose, intr, max_weight,
        use_pallas, interpret=interpret,
    )

    # Render the model at the ESTIMATED pose — the viewpoint whose depth
    # just shaped the map. Rendering anywhere else (we tried the
    # constant-velocity prediction) resamples the discretized TSDF along
    # rays it wasn't built from and picks up a coherent millimeter-scale
    # surface bias that feeds back into tracking as unbounded drift.
    if use_pallas:
        from housescan_tpu.ops.raycast_pallas import raycast_planes

        model_maps = raycast_planes(
            planes, new_pose, intr, volume, z_min=z_min, interpret=interpret
        )
    else:
        rc = raycast(
            volume, new_pose, intr, z_min=z_min, max_steps=max_raycast_steps
        )
        # CPU/XLA fallback: interleave -> packed off the hot path.
        model_maps = mp.model_from_hwc(rc.vertices, rc.normals, rc.valid, rc.depth)

    # A dropped frame keeps the previous model maps (the volume did not
    # change; re-rendering would produce the same maps, skipping the
    # where costs nothing and guarantees it).
    model_maps = jnp.where(tracked, model_maps, state.model_maps)

    return KinFuState(
        volume=volume,
        planes=planes,
        pose=new_pose,
        model_maps=model_maps,
        model_pose=jnp.where(tracked, new_pose, state.model_pose),
        frame_index=state.frame_index + 1,
        last_rmse=jnp.where(is_first, 0.0, icp_rmse),
        last_corr=jnp.where(is_first, 0, icp_corr),
        last_tracked=tracked,
    )


def kinfu_run(
    state: KinFuState,
    depth_stream: jnp.ndarray,
    intr: Intrinsics,
    **step_kwargs,
) -> Tuple[KinFuState, jnp.ndarray]:
    """Fuse a whole (N, H, W) stream, returning final state and per-frame
    poses (N, 4, 4). Python loop over jitted steps — each step is one
    device program; the stream loop stays on host so frames can come from
    a capture source."""
    import numpy as np

    poses = []
    for i in range(depth_stream.shape[0]):
        state = kinfu_step(state, jnp.asarray(depth_stream[i]), intr, **step_kwargs)
        # Copy out: the state buffers are donated into the next step.
        poses.append(np.asarray(state.pose))
    return state, jnp.asarray(np.stack(poses))
