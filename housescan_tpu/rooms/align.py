"""Room auto-alignment to world axes.

Capability parity with roomAutoAlignAxis / autoAlignFloor
(ref Main.hs:1895-1910): pick the plane whose normal is most parallel to
the target axis and rotate the whole room so that plane faces exactly
along it.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from housescan_tpu.geometry.transform import rotation_between_normals
from housescan_tpu.rooms.ops import rotate_room
from housescan_tpu.rooms.types import Room, Scene


def room_auto_align_axis(scene: Scene, room: Room, axis: np.ndarray) -> Optional[Room]:
    """Align the room plane most parallel to ``axis`` exactly onto it
    (ref Main.hs:1895-1905). Returns None if the room has no planes."""
    if not room.planes:
        return None
    dots = [float(np.dot(axis, p.normal)) for p in room.planes]
    floor_plane = room.planes[int(np.argmax(dots))]
    rot = np.asarray(
        rotation_between_normals(
            jnp.asarray(floor_plane.normal), jnp.asarray(axis, jnp.float32)
        )
    )
    new_room = rotate_room(room, rot)
    scene.update_room(new_room)
    return new_room


def auto_align_floor(scene: Scene, room: Room) -> Optional[Room]:
    """Align the floor (most +Y-facing plane, inward normals point up from
    the floor) to +Y (ref Main.hs:1908-1910)."""
    return room_auto_align_axis(scene, room, np.array([0.0, 1.0, 0.0], np.float32))


def rotate_plane(plane, rot: np.ndarray):
    """Rotate a free-standing plane about its boundary mean
    (ref Main.hs:1586-1593 rotatePlaneAround/rotatePlane)."""
    from dataclasses import replace

    from housescan_tpu.geometry.plane import PlaneEq, rotate_plane_eq_around
    from housescan_tpu.geometry.transform import rotate_around

    center = jnp.asarray(plane.mean(), jnp.float32)
    rot_j = jnp.asarray(rot, jnp.float32)
    eq = rotate_plane_eq_around(
        PlaneEq(jnp.asarray(plane.normal), jnp.asarray(plane.d, jnp.float32)),
        center,
        rot_j,
    )
    bounds = plane.bounds
    if len(bounds):
        bounds = np.asarray(rotate_around(center, rot_j, jnp.asarray(bounds)))
    return replace(
        plane,
        normal=np.asarray(eq.normal, np.float32),
        d=float(eq.d),
        bounds=bounds,
    )


def rotate_room_to_match_walls(scene: Scene, plane_id1, plane_id2):
    """The reference's rotateSelectedPlanes 'r' key (ref Main.hs:1629-1654).

    Room branch: rotate the room containing plane 1 so that wall faces
    OPPOSITE wall plane 2 — the rotation takes plane 1's normal onto the
    FLIPPED plane-2 normal, so two walls that should touch end up
    antiparallel. Returns the rotated Room.

    Bare-plane branch (ref Main.hs:1645-1648): when plane 1 belongs to no
    room, rotate the plane itself onto plane 2's UNFLIPPED normal and ADD
    the result as a new free-standing plane with a fresh ID (the
    reference's addPlane); the original plane is kept, exactly as the
    reference did. Returns the new Plane."""
    from dataclasses import replace

    from housescan_tpu.geometry.plane import flip_plane_eq

    room = scene.find_room_containing_plane(plane_id1)
    p1 = scene.get_any_plane(plane_id1)
    p2 = scene.get_any_plane(plane_id2)
    if p1 is None or p2 is None:
        raise KeyError(f"planes {plane_id1},{plane_id2} not found")
    if room is None:
        rot = np.asarray(
            rotation_between_normals(
                jnp.asarray(p1.normal), jnp.asarray(p2.normal)
            )
        )
        new_plane = replace(rotate_plane(p1, rot), plane_id=scene.gen_id())
        scene.planes[new_plane.plane_id] = new_plane
        return new_plane
    target = flip_plane_eq(p2.eq())
    rot = np.asarray(
        rotation_between_normals(jnp.asarray(p1.normal), target.normal)
    )
    new_room = rotate_room(room, rot)
    scene.update_room(new_room)
    return new_room
