"""Synthetic depth-stream rendering: analytic room scanner.

The reference's KinFu inputs were recorded Kinect streams on the author's
disk; for CI, benchmarks, and parity tests we render exact depth frames
of a cuboid room — furnished with boxes, spheres, capped cylinders, and
yaw-rotated boxes — from analytic ray intersections, with exact
ground-truth poses and an exact ground-truth TSDF. This is the 'recorded
depth stream' test path called for by SURVEY.md section 4; the curved
shapes (``curved_furnished_room``) exist because the reference operated
on real cluttered rooms (ref README.md:25-26) and a quality suite
measured only on axis-aligned boxes — the one world the piecewise-planar
raycast model represents exactly — would flatter the model.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from housescan_tpu.geometry.transform import axis_angle_mat, mm
from housescan_tpu.kinfu.camera import Intrinsics, pixel_rays


@partial(jax.jit, static_argnames=("intr",))
def render_box_interior_depth(
    intr: Intrinsics,
    pose: jnp.ndarray,
    half_dims: jnp.ndarray,
    boxes: Optional[jnp.ndarray] = None,
    spheres: Optional[jnp.ndarray] = None,
    cylinders: Optional[jnp.ndarray] = None,
    obbs: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Depth map of the inside of an axis-aligned box room.

    ``pose`` is the 4x4 row-vector camera-to-world transform; the room is
    centered at the world origin with half-extents ``half_dims``.
    Furniture, all solid and all with ANALYTIC ray intersections:

      * ``boxes``   (B, 2, 3): axis-aligned boxes (min, max corner);
      * ``spheres`` (S, 4): [cx, cy, cz, r];
      * ``cylinders`` (C, 5): Y-axis-aligned capped cylinders
        [cx, cz, r, y_min, y_max];
      * ``obbs``    (B, 7): Y-yaw-rotated boxes
        [cx, cy, cz, hx, hy, hz, yaw] — half-extents in the box frame,
        rotated by ``yaw`` about world Y around the center.

    The curved/rotated shapes exist to break the axis-aligned-box
    monoculture of the quality evaluation: a piecewise-planar raycast
    model represents boxes exactly away from edges, so only curvature
    and oblique planes expose its model bias. Returns (H, W) projective
    depth in meters (distance along camera z).
    """
    rays_cam = pixel_rays(intr)  # (H, W, 3), z = 1
    rot = pose[:3, :3]
    origin = pose[3, :3]
    dirs = mm(rays_cam, rot)  # world-frame ray directions, z_cam = 1 scaling

    # Exit distance from inside the room slab per axis:
    # t_axis = (sign(dir) * half - origin) / dir
    eps = 1e-12
    safe_dirs = jnp.where(jnp.abs(dirs) < eps, eps, dirs)
    t_exit_axis = (jnp.sign(safe_dirs) * half_dims - origin) / safe_dirs
    t_room = jnp.min(t_exit_axis, axis=-1)  # exit the room = nearest wall hit

    t_hit = t_room

    def aabb_entry(bmin, bmax, o, d):
        t1 = (bmin - o) / d
        t2 = (bmax - o) / d
        t_near = jnp.max(jnp.minimum(t1, t2), axis=-1)
        t_far = jnp.min(jnp.maximum(t1, t2), axis=-1)
        hit = (t_near <= t_far) & (t_near > 0)
        return t_near, hit

    if boxes is not None:
        for i in range(boxes.shape[0]):
            t_near, hit = aabb_entry(boxes[i, 0], boxes[i, 1], origin, safe_dirs)
            t_hit = jnp.where(hit & (t_near < t_hit), t_near, t_hit)

    if spheres is not None:
        for i in range(spheres.shape[0]):
            c, r = spheres[i, :3], spheres[i, 3]
            oc = origin - c
            a = jnp.sum(dirs * dirs, axis=-1)
            b = 2.0 * jnp.sum(dirs * oc, axis=-1)
            cc = jnp.dot(oc, oc) - r * r
            disc = b * b - 4.0 * a * cc
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t_near = (-b - sq) / (2.0 * a)
            hit = (disc > 0) & (t_near > 0)
            t_hit = jnp.where(hit & (t_near < t_hit), t_near, t_hit)

    if cylinders is not None:
        for i in range(cylinders.shape[0]):
            cx, cz, r, y0, y1 = (cylinders[i, k] for k in range(5))
            ox = origin[0] - cx
            oz = origin[2] - cz
            dx, dy, dz = dirs[..., 0], dirs[..., 1], dirs[..., 2]
            # Side surface: quadratic in the XZ plane, y clamped.
            a = dx * dx + dz * dz
            b = 2.0 * (ox * dx + oz * dz)
            cc = ox * ox + oz * oz - r * r
            disc = b * b - 4.0 * a * cc
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            a_safe = jnp.where(jnp.abs(a) < eps, eps, a)
            t_side = (-b - sq) / (2.0 * a_safe)
            y_at = origin[1] + t_side * dy
            hit = (disc > 0) & (t_side > 0) & (y_at >= y0) & (y_at <= y1)
            t_hit = jnp.where(hit & (t_side < t_hit), t_side, t_hit)
            # Caps: the disk the ray meets first is the one whose plane
            # faces it (entering from below hits the y0 cap).
            dy_safe = jnp.where(jnp.abs(dy) < eps, eps, dy)
            for y_cap in (y0, y1):
                t_cap = (y_cap - origin[1]) / dy_safe
                px = ox + t_cap * dx
                pz = oz + t_cap * dz
                hit_c = (t_cap > 0) & (px * px + pz * pz <= r * r)
                t_hit = jnp.where(hit_c & (t_cap < t_hit), t_cap, t_hit)

    if obbs is not None:
        for i in range(obbs.shape[0]):
            c = obbs[i, :3]
            h = obbs[i, 3:6]
            yaw = obbs[i, 6]
            cy, sy = jnp.cos(yaw), jnp.sin(yaw)
            # World -> box frame: rotate by -yaw about Y around the center
            # (row-vector: v_box = v_world @ R(-yaw); R rows given inline).
            r0 = jnp.stack([cy, 0.0 * cy, -sy])
            r1 = jnp.stack([0.0 * cy, 1.0 + 0.0 * cy, 0.0 * cy])
            r2 = jnp.stack([sy, 0.0 * cy, cy])
            rbox = jnp.stack([r0, r1, r2])  # (3, 3), world->box rows
            o_b = (origin - c) @ rbox.T
            d_b = dirs @ rbox.T
            d_b = jnp.where(jnp.abs(d_b) < eps, eps, d_b)
            t_near, hit = aabb_entry(-h, h, o_b, d_b)
            t_hit = jnp.where(hit & (t_near < t_hit), t_near, t_hit)

    # dirs scale: depth (z_cam) = t because rays_cam z == 1.
    depth = jnp.where(t_hit > 0, t_hit, 0.0)
    return depth.astype(jnp.float32)


def orbit_poses(
    n_frames: int,
    radius: float = 0.4,
    height: float = 0.0,
    yaw_range: float = 2 * math.pi,
    pitch: float = 0.0,
    look_jitter: float = 0.0,
    seed: int = 0,
) -> np.ndarray:
    """(N, 4, 4) camera-to-world poses orbiting inside the room, yawing to
    sweep the walls (a Kinect-operator-in-the-room trajectory).

    ``pitch`` > 0 tilts the camera toward world -y (the CEILING side of
    the furnished_room scene — its floor is at +y), putting ceiling/wall
    junctions in view — richer ICP constraints. Use pitch < 0 to sweep
    the floor."""
    rng = np.random.default_rng(seed)
    poses = []
    for k in range(n_frames):
        yaw = yaw_range * k / max(n_frames, 1)
        # camera-to-world rotation: camera z (forward) points outward at
        # angle yaw in the XZ plane; camera y stays down (-Y up world).
        forward = np.array([math.sin(yaw), 0.0, math.cos(yaw)])
        if look_jitter:
            forward = forward + rng.normal(scale=look_jitter, size=3)
            forward /= np.linalg.norm(forward)
        up = np.array([0.0, -1.0, 0.0])  # world up is -y in camera convention
        right = np.cross(up, forward)
        right /= np.linalg.norm(right)
        down = np.cross(forward, right)
        if pitch:
            c, s = math.cos(pitch), math.sin(pitch)
            forward, down = forward * c + down * s, down * c - forward * s
        rot = np.stack([right, down, forward])  # rows: camera axes in world
        pos = np.array(
            [radius * math.sin(yaw), height, radius * math.cos(yaw)]
        )
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = rot.astype(np.float32)
        pose[3, :3] = pos.astype(np.float32)
        poses.append(pose)
    return np.stack(poses)


def spiral_poses(
    n_frames: int,
    turns: float = 2.0,
    radius: float = 0.25,
    pitch_max: float = 0.8,
    height_max: float = 0.0,
) -> np.ndarray:
    """(N, 4, 4) TRACKABLE full-coverage sweep: continuous yaw over
    ``turns`` revolutions while pitch swings sinusoidally through
    ``+pitch_max`` (ceiling view) and ``-pitch_max`` (floor view), so
    one smooth trajectory sees all six faces with small inter-frame
    motion — unlike the jump-cut multi-sweep setups used with
    known_poses, this one an ICP tracker can actually follow (the
    operator walk the reference's per-room Kinect scans assume, ref
    README.md:12-13).

    Rate limits (measured at 64^3 / 160x120): per-frame pitch beyond
    ~0.015 rad exceeds the finest ICP level's ±1.5 px association gate,
    and the coarser levels' residual pitch<->ty ambiguity then leaks a
    systematic Y lag (~6% of the equivalent image motion) that
    saturates near the tight distance gate; per-frame translation
    beyond ~20 mm collapses correspondences outright. Pitch starts at
    0 (richest wall+furniture geometry for the young map) and the
    sinusoid keeps both rates low near its extremes."""
    poses = []
    for k in range(n_frames):
        p = k / max(n_frames - 1, 1)
        yaw = turns * 2 * math.pi * p
        swing = math.sin(2 * math.pi * p)
        pitch = pitch_max * swing
        height = -height_max * swing  # look up from low, down from high
        forward = np.array([math.sin(yaw), 0.0, math.cos(yaw)])
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(up, forward)
        right /= np.linalg.norm(right)
        down = np.cross(forward, right)
        c, s = math.cos(pitch), math.sin(pitch)
        forward, down = forward * c + down * s, down * c - forward * s
        rot = np.stack([right, down, forward])
        pos = np.array([radius * math.sin(yaw), height, radius * math.cos(yaw)])
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = rot.astype(np.float32)
        pose[3, :3] = pos.astype(np.float32)
        poses.append(pose)
    return np.stack(poses)


def furnished_room(scale: float = 1.0):
    """A standard richly-furnished test room: (half_dims, boxes).

    Enough box 'furniture' that every viewpoint sees geometry constraining
    all 6 DOF — ICP on bare flat walls is mathematically degenerate
    (rank-deficient normal matrix), for this framework and for the
    reference's PCL KinFu alike.
    """
    half = np.array([1.3, 1.1, 1.3], np.float32) * scale
    boxes = np.array(
        [
            [[-0.95, 0.40, -0.95], [-0.35, 1.10, -0.35]],  # crate, floor corner
            [[0.30, 0.50, 0.40], [0.90, 1.10, 1.00]],  # crate, opposite side
            [[-0.20, -1.10, 0.60], [0.40, -0.50, 1.20]],  # cabinet, ceiling side
            [[0.60, 0.70, -1.00], [1.20, 1.10, -0.40]],  # bench
            [[-1.25, -0.20, 0.20], [-0.85, 0.30, 0.80]],  # shelf on -x wall
            [[0.85, -0.40, -0.60], [1.25, 0.20, 0.00]],  # shelf on +x wall
            [[-0.50, 0.85, 0.90], [0.20, 1.10, 1.25]],  # low table at +z
            [[-0.15, -0.15, -1.25], [0.45, 0.45, -0.85]],  # box on -z wall
        ],
        np.float32,
    ) * scale
    return half, boxes


def curved_furnished_room(scale: float = 1.0):
    """The furnished room with CURVED and OBLIQUE furniture mixed in:
    (half_dims, boxes, spheres, cylinders, obbs).

    The piecewise-planar raycast model (ops/planes_pallas.py) represents
    axis-aligned boxes exactly away from edges — every quality number
    measured on ``furnished_room`` flatters it. This room keeps four of
    those boxes and adds two spheres (r = 0.22/0.30 m), a capped
    cylinder (r = 0.28 m), and two yaw-rotated boxes, whose sagitta
    across a 512^3 sub-block (~1 mm at r = 0.3) and oblique planes the
    model can only approximate. Geometry chosen so every orbit viewpoint
    still sees full-6-DOF constraints."""
    half = np.array([1.3, 1.1, 1.3], np.float32) * scale
    boxes = np.array(
        [
            [[-0.95, 0.40, -0.95], [-0.35, 1.10, -0.35]],  # crate, floor corner
            [[-0.20, -1.10, 0.60], [0.40, -0.50, 1.20]],  # cabinet, ceiling side
            [[-1.25, -0.20, 0.20], [-0.85, 0.30, 0.80]],  # shelf on -x wall
            [[0.85, -0.40, -0.60], [1.25, 0.20, 0.00]],  # shelf on +x wall
        ],
        np.float32,
    ) * scale
    # Placement: the drift/model probes and the bench orbit from near
    # the origin looking toward +z (yawing 0..~0.4 rad toward +x) with
    # pitch +0.25 toward the CEILING side (-y). The curved shapes sit in
    # that frustum, where the original room put its ceiling cabinet.
    spheres = np.array(
        [
            [0.35, -0.50, 0.95, 0.30],  # large ball, ceiling side +z
            [-0.50, -0.30, 1.00, 0.22],  # smaller ball, -x of it
        ],
        np.float32,
    ) * scale
    cylinders = np.array(
        [
            # column hanging from the ceiling in the +x/+z sector
            [0.75, 0.75, 0.28, -1.10, 0.20],
        ],
        np.float32,
    ) * scale
    obbs = np.array(
        [
            # slab rotated 30 degrees, ceiling side below the ball
            [0.15, -0.85, 1.00, 0.35, 0.20, 0.18, 0.5236],
            # tall crate rotated 50 degrees at eye height near +z
            [-0.10, 0.25, 1.05, 0.22, 0.45, 0.15, 0.8727],
        ],
        np.float32,
    ) * np.array([scale] * 6 + [1.0], np.float32)
    return half, boxes, spheres, cylinders, obbs


def flat_furnished_room():
    """The furnished room squeezed to a 1.5 m ceiling: every face —
    including the ceiling — is visible at |pitch| <= 0.35 from inside,
    so a TRACKED sweep can cover all six planes without the steep
    up-views that starve ICP of constraints (bare-ceiling views are
    degenerate for any KinFu-class tracker, this one and the
    reference's PCL KinFu alike)."""
    half, boxes = furnished_room()
    half = np.array([1.3, 0.75, 1.3], np.float32)
    boxes = boxes.copy()
    boxes[:, :, 1] *= 0.75 / 1.1
    return half, boxes


def coverage_sweep_poses(radius: float = 0.2) -> np.ndarray:
    """(480, 4, 4) TRACKED full-coverage trajectory for a flat room:
    a 0.75-turn wall orbit at pitch 0, then yaw-frozen pitch excursions
    to +-0.35 (a ceiling wedge and a floor wedge at different yaws).
    Every segment rate is inside the tracker's measured envelope
    (~0.035 rad/frame yaw at level speed, ~0.005 rad/frame pitch ramps;
    simultaneous yaw at high pitch was measured to destabilize and is
    avoided). With the ICP null-space filter this closes at < 60 mm
    worst-case pose error on the 64^3 / 160x120 CPU testbed — enough
    for plane detection, corner adoption, and cuboid fitting to engage
    on a purely TRACKED scan (the VERDICT round-3 gap)."""

    def pose_of(yaw: float, pitch: float) -> np.ndarray:
        forward = np.array([math.sin(yaw), 0.0, math.cos(yaw)])
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(up, forward)
        right /= np.linalg.norm(right)
        down = np.cross(forward, right)
        c, s = math.cos(pitch), math.sin(pitch)
        forward, down = forward * c + down * s, down * c - forward * s
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = np.stack([right, down, forward])
        m[3, :3] = np.array([radius * math.sin(yaw), 0.0, radius * math.cos(yaw)])
        return m

    def wedge(poses, yaw, pitch, ramp=72, hold=60):
        for k in range(ramp):
            poses.append(pose_of(yaw, pitch * k / (ramp - 1)))
        for k in range(hold):
            poses.append(pose_of(yaw, pitch))
        for k in range(ramp):
            poses.append(pose_of(yaw, pitch * (1 - k / (ramp - 1))))

    # NO-REVISIT frontier sweep: each wedge happens at the yaw the
    # orbit just reached, and the camera never returns to an
    # already-mapped sector — re-entering the oldest map region after
    # hundreds of frames of accumulated drift makes ICP fight two
    # disagreeing map sheets (KinFu has no loop closure; neither did
    # the reference's), which was measured to smear exactly the face
    # the test needs. The floor wedge comes EARLY (freshest map).
    poses = []
    for k in range(67):
        poses.append(pose_of(2.36 * k / 66, 0.0))
    wedge(poses, 2.36, -0.40)  # floor wedge (competes with furniture
    # tops for RANSAC inliers, hence the long dwell)
    for k in range(67):
        poses.append(pose_of(2.36 + 2.35 * k / 66, 0.0))
    wedge(poses, 4.71, 0.40)  # ceiling wedge
    return np.stack(poses)


def render_depth_stream(
    intr: Intrinsics,
    poses: np.ndarray,
    half_dims,
    boxes: Optional[np.ndarray] = None,
    noise: float = 0.0,
    seed: int = 0,
    spheres: Optional[np.ndarray] = None,
    cylinders: Optional[np.ndarray] = None,
    obbs: Optional[np.ndarray] = None,
) -> np.ndarray:
    """(N, H, W) float32 depth stream with optional Kinect-like noise."""
    rng = np.random.default_rng(seed)

    def as_j(x):
        return jnp.asarray(x, jnp.float32) if x is not None else None

    half = jnp.asarray(half_dims, jnp.float32)
    boxes_j = as_j(boxes)
    spheres_j = as_j(spheres)
    cyl_j = as_j(cylinders)
    obbs_j = as_j(obbs)
    frames = []
    for pose in poses:
        d = np.asarray(
            render_box_interior_depth(
                intr, jnp.asarray(pose), half, boxes_j,
                spheres=spheres_j, cylinders=cyl_j, obbs=obbs_j,
            )
        )
        if noise > 0:
            # depth-dependent noise, Kinect-like quadratic growth
            d = np.where(
                d > 0, d + rng.normal(scale=noise, size=d.shape) * (d / 2.0) ** 2, 0.0
            ).astype(np.float32)
        frames.append(d)
    return np.stack(frames)


def ground_truth_tsdf(
    resolution: int,
    size_m: float,
    origin: np.ndarray,
    half_dims: np.ndarray,
    trunc: float,
) -> np.ndarray:
    """Exact truncated SDF of the box-room interior on the voxel grid.

    Signed distance of a point inside an axis-aligned box to its surface
    is ``min over axes of (half - |p|)`` (positive inside = in front of
    the wall surface, matching TSDF sign: positive in free space).
    """
    voxel = size_m / resolution
    idx = (np.arange(resolution) + 0.5) * voxel
    x = origin[0] + idx
    y = origin[1] + idx
    z = origin[2] + idx
    gx, gy, gz = np.meshgrid(x, y, z, indexing="ij")
    dist = np.minimum.reduce(
        [
            half_dims[0] - np.abs(gx),
            half_dims[1] - np.abs(gy),
            half_dims[2] - np.abs(gz),
        ]
    )
    return np.clip(dist / trunc, -1.0, 1.0).astype(np.float32)
