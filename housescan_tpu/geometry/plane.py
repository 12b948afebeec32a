"""Plane algebra in Hessian normal form ``n . x = d``.

Capability parity with the reference's PlaneEq core (ref Main.hs:1354-1376,
1563-1578, 1681-1688). A plane is represented as a plain pytree of two
arrays — ``normal`` with shape (..., 3) (unit length) and ``d`` with shape
(...,) — so every operation here is batched for free: a Room's 6 wall
planes are one PlaneEq with leading dim 6, and a building's every wall is
one PlaneEq. All functions are pure and jittable.

Sign convention: ``d`` is on the right-hand side (``n . x = d``), so normal
direction matters (inward-facing normals for rooms, ref Main.hs:1744-1751).
PCL's ``ax + by + cz + d = 0`` converts by negating d (ref Main.hs:1383-1385).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from housescan_tpu.geometry.transform import mm


class PlaneEq(NamedTuple):
    """Hessian-normal-form plane(s): ``normal . x = d`` with unit normal."""

    normal: jnp.ndarray  # (..., 3)
    d: jnp.ndarray  # (...,)


def mk_plane_eq(abc: jnp.ndarray, d) -> PlaneEq:
    """Normalize ``abc . x = d`` into Hessian form (ref Main.hs:1360-1361)."""
    abc = jnp.asarray(abc)
    d = jnp.asarray(d, dtype=abc.dtype)
    norm = jnp.linalg.norm(abc, axis=-1)
    return PlaneEq(abc / norm[..., None], d / norm)


def mk_plane_eq_abcd(a, b, c, d) -> PlaneEq:
    """From the 4 scalar coefficients of ``ax + by + cz = d`` (ref Main.hs:1363-1364)."""
    return mk_plane_eq(jnp.stack([jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)], axis=-1), d)


def flip_plane_eq(eq: PlaneEq) -> PlaneEq:
    """Same plane, opposite orientation (ref Main.hs:1367-1368)."""
    return PlaneEq(-eq.normal, -eq.d)


def signed_distance_to_plane(eq: PlaneEq, points: jnp.ndarray) -> jnp.ndarray:
    """``n . p - d``; positive on the normal side (ref Main.hs:1371-1372).

    Batched over both planes and points: with ``eq`` of shape (..., 3) and
    points (..., 3) the result broadcasts; for (K,) planes vs (N, 3) points
    use ``signed_distances_pairwise``.
    """
    return jnp.sum(eq.normal * points, axis=-1) - eq.d


def signed_distances_pairwise(eq: PlaneEq, points: jnp.ndarray) -> jnp.ndarray:
    """(K, N) signed distances of N points to K planes — one MXU matmul."""
    if eq.normal.ndim == 1:
        return mm(points, eq.normal) - eq.d
    return mm(eq.normal, points.T) - eq.d[..., None]


def project_to_plane(eq: PlaneEq, points: jnp.ndarray) -> jnp.ndarray:
    """Orthogonal projection of points onto the plane (ref Main.hs:1375-1376)."""
    dist = signed_distance_to_plane(eq, points)
    return points - dist[..., None] * eq.normal


def rotate_plane_eq(eq: PlaneEq, rot_mat: jnp.ndarray) -> PlaneEq:
    """Rotate about the ORIGIN: normal rotates, d is unchanged
    (ref Main.hs:1563-1568)."""
    return PlaneEq(mm(eq.normal, rot_mat), eq.d)


def rotate_plane_eq_around(eq: PlaneEq, rot_center: jnp.ndarray, rot_mat: jnp.ndarray) -> PlaneEq:
    """Rotate about an arbitrary center (ref Main.hs:1571-1578).

    The plane's closest point to the origin ``o = d n`` is rotated around
    the center; the new d is its projection on the new normal.
    """
    n2 = mm(eq.normal, rot_mat)
    o = eq.d[..., None] * eq.normal
    o2 = mm(o - rot_center, rot_mat) + rot_center
    return PlaneEq(n2, jnp.sum(o2 * n2, axis=-1))


def translate_plane_eq(eq: PlaneEq, offset: jnp.ndarray) -> PlaneEq:
    """Translate by offset: d' = (d n + off) . n (ref Main.hs:1681-1688)."""
    o2 = eq.d[..., None] * eq.normal + offset
    return PlaneEq(eq.normal, jnp.sum(o2 * eq.normal, axis=-1))


def transform_plane_eq(eq: PlaneEq, proj: jnp.ndarray) -> PlaneEq:
    """Apply a rigid 4x4 (row-vector) transform: rotate about origin then
    translate (the decomposition the reference applies in projectRoom,
    ref Main.hs:1712-1730)."""
    rotated = rotate_plane_eq(eq, proj[:3, :3])
    return translate_plane_eq(rotated, proj[3, :3])
