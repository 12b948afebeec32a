"""Plane fitting and plane-triple intersection.

Capability parity with the reference's fitPlane (total least squares via
PCA smallest eigenvector, ref Main.hs:1436-1450) and planeCorner (3-plane
intersection via a 3x3 solve, ref Main.hs:1413-1430). The reference's
``safeLinearSolve`` returned ``Nothing`` for singular systems (its
HmatrixUtils module is missing from the repo; semantics inferred from call
sites, SURVEY.md section 2 item 7) — here singularity is reported as a
validity mask / NaN so everything stays batched and jittable.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from housescan_tpu.geometry.transform import mm
from housescan_tpu.geometry.plane import PlaneEq, signed_distance_to_plane


def fit_plane(points: jnp.ndarray) -> PlaneEq:
    """Best-fit plane through >= 3 points (total least squares).

    Normal = eigenvector of the 3x3 scatter matrix with the smallest
    eigenvalue; d places the plane through the centroid
    (ref Main.hs:1436-1450). ``jnp.linalg.eigh`` returns eigenvalues
    ascending, so column 0 is the normal (the reference's hmatrix eigSH
    sorts descending and takes the last column).

    The normal's sign is chosen to make d >= 0 for determinism; callers
    that care about orientation (inward-facing room planes) fix it up
    explicitly.
    """
    mean = jnp.mean(points, axis=0)
    centered = points - mean
    scatter = mm(centered.T, centered)  # 3x3; one matmul, MXU-friendly for big N
    _, eigvecs = jnp.linalg.eigh(scatter)
    normal = eigvecs[:, 0]
    d = jnp.dot(normal, mean, precision="highest")
    sign = jnp.where(d < 0, -1.0, 1.0).astype(points.dtype)
    return PlaneEq(normal * sign, d * sign)


def fit_plane_weighted(points: jnp.ndarray, weights: jnp.ndarray) -> PlaneEq:
    """``fit_plane`` with per-point weights (used by RANSAC refinement,
    where the inlier mask is the weight vector so shapes stay static)."""
    w = weights[:, None]
    total = jnp.maximum(jnp.sum(weights), 1e-12)
    mean = jnp.sum(points * w, axis=0) / total
    centered = (points - mean) * jnp.sqrt(w)
    scatter = mm(centered.T, centered)
    _, eigvecs = jnp.linalg.eigh(scatter)
    normal = eigvecs[:, 0]
    d = jnp.dot(normal, mean, precision="highest")
    sign = jnp.where(d < 0, -1.0, 1.0).astype(points.dtype)
    return PlaneEq(normal * sign, d * sign)


def plane_corner(
    eq1: PlaneEq, eq2: PlaneEq, eq3: PlaneEq, cond_limit: float = 1e6
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Intersection point of 3 planes, with a validity flag.

    Solves ``N x = d`` for the stacked normals (ref Main.hs:1413-1430).
    Near-parallel planes (ill-conditioned N) are flagged invalid — the
    batched, jittable replacement for safeLinearSolve's Maybe.
    """
    n = jnp.stack([eq1.normal, eq2.normal, eq3.normal], axis=-2)
    d = jnp.stack([eq1.d, eq2.d, eq3.d], axis=-1)
    return _solve_corner(n, d, cond_limit)


def _solve_corner(n: jnp.ndarray, d: jnp.ndarray, cond_limit: float):
    det = jnp.linalg.det(n)
    # Unit normals => |det| in [0, 1]; treat tiny dets as parallel planes.
    valid = jnp.abs(det) > (1.0 / cond_limit)
    safe_n = jnp.where(valid[..., None, None], n, jnp.eye(3, dtype=n.dtype))
    x = jnp.linalg.solve(safe_n, d[..., None])[..., 0]
    x = jnp.where(valid[..., None], x, jnp.nan)
    return x, valid


def plane_corners_batch(
    eqs: PlaneEq, triples: jnp.ndarray, cond_limit: float = 1e6
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Intersections for a (T, 3) index array of plane triples.

    Batched form of the reference's all-triples corner suggestion loop
    (ref Main.hs:1526): one vectorized solve for all C(n,3) combinations.
    Returns points (T, 3) and validity (T,).
    """
    n = eqs.normal[triples]  # (T, 3, 3)
    d = eqs.d[triples]  # (T, 3)
    return _solve_corner(n, d, cond_limit)


def max_face_distance(eq: PlaneEq, points: jnp.ndarray) -> jnp.ndarray:
    """Max |signed distance| of points to plane — the membership metric the
    reference asserts at 1e-4 when building cuboid faces (ref Main.hs:1881-1882)."""
    return jnp.max(jnp.abs(signed_distance_to_plane(eq, points)), axis=-1)
