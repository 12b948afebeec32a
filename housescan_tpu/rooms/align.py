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


def rotate_room_to_match_walls(scene: Scene, plane_id1, plane_id2) -> Optional[Room]:
    """Rotate the room containing plane 1 so that wall faces opposite
    wall plane 2 (the reference's rotateSelectedPlanes 'r' key,
    ref Main.hs:1629-1654): the rotation takes plane 1's normal onto the
    FLIPPED plane-2 normal, so two walls that should touch end up
    antiparallel. Returns the rotated room, or None if plane 1 is not in
    a room."""
    from housescan_tpu.geometry.plane import flip_plane_eq

    room = scene.find_room_containing_plane(plane_id1)
    p1 = scene.get_any_plane(plane_id1)
    p2 = scene.get_any_plane(plane_id2)
    if p1 is None or p2 is None:
        raise KeyError(f"planes {plane_id1},{plane_id2} not found")
    if room is None:
        return None
    target = flip_plane_eq(p2.eq())
    rot = np.asarray(
        rotation_between_normals(jnp.asarray(p1.normal), target.normal)
    )
    new_room = rotate_room(room, rot)
    scene.update_room(new_room)
    return new_room
