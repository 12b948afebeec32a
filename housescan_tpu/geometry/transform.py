"""Rigid transforms: rotation matrices, quaternions, 4x4 projective matrices.

Convention (package-wide, see housescan_tpu.__doc__): points are ROW vectors
and transforms RIGHT-multiply, ``p' = p @ M``. A 4x4 rigid transform stores
the rotation in ``M[:3, :3]`` and the translation in the LAST ROW
``M[3, :3]`` — the same layout as the reference's Proj4
(ref Main.hs:1725-1730). With this convention a batch of points transforms
as one ``(N,3) @ (3,3)`` matmul, which XLA maps straight onto the MXU.

All functions are pure and jittable, and dtype-polymorphic (f32 on device,
f64 for host-side solver use).
"""

from __future__ import annotations

import jax.numpy as jnp


def mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Matmul at full f32 precision.

    TPU matmuls default to bf16 multiplicands; geometry transforms are tiny
    (3x3 / 4x4 against point lists), so full precision costs nothing while
    bf16 would inject ~1e-3 relative error into every transform. The big
    compute-path matmuls (TSDF, ICP reductions) choose their own precision.
    """
    return jnp.matmul(a, b, precision="highest")


def normalize(v: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Unit vector along ``v`` (last axis)."""
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    if eps:
        n = jnp.maximum(n, eps)
    return v / n


def axis_angle_mat(axis: jnp.ndarray, theta) -> jnp.ndarray:
    """Row-vector rotation matrix for rotation by ``theta`` around ``axis``.

    Rodrigues' formula transposed to the row-vector convention: for a
    column-vector rotation R, the row form is R.T, so ``p @ axis_angle_mat``
    equals ``R p`` (ref: vect's rotMatrix3 used at FitCuboidBFGS.hs:165).
    ``axis`` need not be normalized.
    """
    axis = jnp.asarray(axis)
    theta = jnp.asarray(theta, dtype=axis.dtype)
    u = normalize(axis, eps=jnp.finfo(axis.dtype).tiny)
    x, y, z = u[..., 0], u[..., 1], u[..., 2]
    c, s = jnp.cos(theta), jnp.sin(theta)
    one_c = 1.0 - c
    # Column-vector Rodrigues matrix R, then transpose for row vectors.
    r = jnp.stack(
        [
            jnp.stack([c + x * x * one_c, x * y * one_c - z * s, x * z * one_c + y * s], -1),
            jnp.stack([y * x * one_c + z * s, c + y * y * one_c, y * z * one_c - x * s], -1),
            jnp.stack([z * x * one_c - y * s, z * y * one_c + x * s, c + z * z * one_c], -1),
        ],
        axis=-2,
    )
    return jnp.swapaxes(r, -1, -2)


def quat_rot_mat(q: jnp.ndarray) -> jnp.ndarray:
    """Row-vector rotation matrix from quaternion ``(x, y, z, w)``.

    The quaternion is normalized first (like vect's ``mkU``,
    ref FitCuboidBFGS.hs:101), so any nonzero 4-vector is a valid rotation
    parameterization — exactly what the cuboid fitter optimizes over.
    """
    q = jnp.asarray(q)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    # Column-vector form, then transpose.
    r = jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )
    return jnp.swapaxes(r, -1, -2)


def rotate_around(rot_center: jnp.ndarray, rot_mat: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Rotate point(s) around ``rot_center``: ``(p - c) @ M + c``.

    (ref Main.hs:1581-1583, FitCuboidBFGS.hs:91-92.)
    """
    return mm(points - rot_center, rot_mat) + rot_center


def rotation_between_normals(n1: jnp.ndarray, n2: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix turning direction ``n1`` into direction ``n2``.

    Axis = n1 x n2, angle = acos(n1.n2 / |n1||n2|) (ref Main.hs:1553-1560).
    Parallel inputs give the identity; anti-parallel inputs rotate 180
    degrees about an arbitrary perpendicular axis (the reference's cross
    product degenerates there; we pick a stable perpendicular instead).
    """
    n1 = jnp.asarray(n1)
    n2 = jnp.asarray(n2)
    axis = jnp.cross(n1, n2)
    cos_theta = jnp.dot(n1, n2) / (jnp.linalg.norm(n1) * jnp.linalg.norm(n2))
    cos_theta = jnp.clip(cos_theta, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # Fallback axis for the (anti-)parallel case: any vector orthogonal to n1.
    helper = jnp.where(jnp.abs(n1[0]) < 0.9, jnp.array([1.0, 0.0, 0.0], n1.dtype), jnp.array([0.0, 1.0, 0.0], n1.dtype))
    fallback = jnp.cross(n1, helper)
    degenerate = jnp.linalg.norm(axis) < 1e-12
    axis = jnp.where(degenerate, fallback, axis)
    return axis_angle_mat(axis, theta)


# --- 4x4 projective transforms (row-vector convention, translation last row) ---


def identity_proj4(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.eye(4, dtype=dtype)


def proj4_from_rot(rot_mat: jnp.ndarray) -> jnp.ndarray:
    m = jnp.eye(4, dtype=rot_mat.dtype)
    return m.at[:3, :3].set(rot_mat)


def proj4_from_translation(offset: jnp.ndarray) -> jnp.ndarray:
    offset = jnp.asarray(offset)
    m = jnp.eye(4, dtype=offset.dtype)
    return m.at[3, :3].set(offset)


def compose_proj4(first: jnp.ndarray, then: jnp.ndarray) -> jnp.ndarray:
    """Composite applying ``first`` then ``then`` — plain ``first @ then``
    in the row-vector convention (ref Main.hs:1720 ``oldProj .*. proj``)."""
    return mm(first, then)


def rotation_proj4_around(rot_center: jnp.ndarray, rot_mat: jnp.ndarray) -> jnp.ndarray:
    """4x4 for rotation about an arbitrary center: T(-c) . R . T(c).

    (ref Main.hs:1674 — the roomProj update in rotateRoomAround.)
    """
    return mm(
        mm(proj4_from_translation(-jnp.asarray(rot_center)), proj4_from_rot(rot_mat)),
        proj4_from_translation(rot_center),
    )


def apply_proj4(proj: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 (row-vector) transform to (..., 3) points.

    Equivalent to extending with 1, right-multiplying, and trimming
    (ref Main.hs:1718-1719), but computed as ``p @ R + t`` to stay a single
    fused matmul (assumes an affine matrix: last column (0,0,0,1)).
    """
    return mm(points, proj[:3, :3]) + proj[3, :3]


def transpose_for_export(proj: jnp.ndarray) -> jnp.ndarray:
    """Left-multiplicative (column-vector) form of a row-vector transform.

    External tools (pcl_transform_point_cloud, .xf/plyxform) expect the
    standard column-vector 4x4, which is our transpose (ref Main.hs:2279-2284).
    """
    return proj.T
