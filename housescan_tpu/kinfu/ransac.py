"""RANSAC plane detection: the planes.txt producer.

TPU replacement for the reference's PCL plane-detection tool
(ref README.md:15), which emitted ``planes.txt`` +
``cloud_plane_hull<k>.pcd`` consumed by planesFromDir
(ref Main.hs:1392-1404).

Design: all H hypotheses are evaluated in ONE batched pass — sample H
point-triples with a fixed key, build H candidate planes, score inliers
with a single (H, 3) x (3, N) matmul on the MXU (the reference's tool
loops hypotheses on the CPU). Sequential extraction masks out each found
plane's inliers and repeats; shapes stay static throughout, so the whole
detector jits.
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from housescan_tpu.geometry.fitting import fit_plane_weighted
from housescan_tpu.geometry.transform import mm
from housescan_tpu.geometry.plane import PlaneEq


class DetectedPlanes(NamedTuple):
    normals: jnp.ndarray  # (P, 3)
    ds: jnp.ndarray  # (P,)
    inlier_counts: jnp.ndarray  # (P,) int32
    n_planes: jnp.ndarray  # () int32 — how many entries are real
    inlier_of: jnp.ndarray  # (N,) int32 — plane index per point, -1 = none


def _hypothesis_planes(points: jnp.ndarray, key, n_hyp: int, k_local: int = 96):
    """(H, 3) unit normals + (H,) d from random point triples.

    HALF the hypotheses use global triples (best tilt accuracy on large
    planes), half use LOCAL triples — an anchor point plus the two
    nearest of ``k_local`` random candidates. Local sampling is what
    finds SMALL planes: a patch holding fraction f of the cloud is hit
    by a global triple with probability f^3 (a 2% floor patch: ~1 in
    10^5 — measured to miss entirely at 1024 hypotheses) but by a local
    triple with probability ~f, since the anchor alone decides the
    patch and the neighbors follow it onto the same surface."""
    n = points.shape[0]
    h_loc = n_hyp // 2
    k_g, k_a, k_c = jax.random.split(key, 3)

    idx = jax.random.randint(k_g, (n_hyp - h_loc, 3), 0, n)
    a_g = points[idx[:, 0]]
    b_g = points[idx[:, 1]]
    c_g = points[idx[:, 2]]

    anchor = jax.random.randint(k_a, (h_loc,), 0, n)
    cand = jax.random.randint(k_c, (h_loc, k_local), 0, n)
    a_l = points[anchor]  # (h, 3)
    cpts = points[cand]  # (h, K, 3)
    d2 = jnp.sum((cpts - a_l[:, None]) ** 2, axis=-1)
    d2 = jnp.where(d2 < 1e-12, jnp.inf, d2)  # drop anchor duplicates
    i1 = jnp.argmin(d2, axis=1)
    d2b = d2.at[jnp.arange(h_loc), i1].set(jnp.inf)
    i2 = jnp.argmin(d2b, axis=1)
    b_l = jnp.take_along_axis(cpts, i1[:, None, None], axis=1)[:, 0]
    c_l = jnp.take_along_axis(cpts, i2[:, None, None], axis=1)[:, 0]

    a = jnp.concatenate([a_g, a_l])
    b = jnp.concatenate([b_g, b_l])
    c = jnp.concatenate([c_g, c_l])
    normal = jnp.cross(b - a, c - a)
    norm = jnp.linalg.norm(normal, axis=1, keepdims=True)
    ok = norm[:, 0] > 1e-9
    normal = normal / jnp.maximum(norm, 1e-12)
    d = jnp.sum(normal * a, axis=1)
    return normal, d, ok


@partial(jax.jit, static_argnames=("max_planes", "n_hypotheses"))
def detect_planes(
    points: jnp.ndarray,
    key: jax.Array,
    max_planes: int = 8,
    n_hypotheses: int = 512,
    inlier_threshold: float = 0.02,
    min_inliers: int = 200,
) -> DetectedPlanes:
    """Detect up to ``max_planes`` planes in an (N, 3) cloud.

    Each round: score all hypotheses against the not-yet-claimed points
    (one MXU matmul), take the best, refine it with a weighted total
    least squares on its inliers (the reference's fitPlane,
    ref Main.hs:1436-1450, weighted so shapes stay static), claim the
    inliers, repeat. Rounds below ``min_inliers`` emit nothing (mask
    trick keeps everything jittable).
    """
    points = jnp.asarray(points, jnp.float32)
    n = points.shape[0]
    if n < 3:
        # Degenerate cloud (e.g. an under-truncated TSDF yields no
        # surface): no planes, not a crash.
        return DetectedPlanes(
            normals=jnp.zeros((max_planes, 3), jnp.float32),
            ds=jnp.zeros((max_planes,), jnp.float32),
            inlier_counts=jnp.zeros((max_planes,), jnp.int32),
            n_planes=jnp.asarray(0, jnp.int32),
            inlier_of=jnp.full((n,), -1, jnp.int32),
        )

    def round_body(carry, key_r):
        available, inlier_of, plane_idx = carry
        normal_h, d_h, ok_h = _hypothesis_planes(points, key_r, n_hypotheses)
        # (H, N) distances in one matmul.
        dist = jnp.abs(
            jnp.matmul(normal_h, points.T, precision="highest") - d_h[:, None]
        )
        inl = (dist < inlier_threshold) & available[None, :]
        counts = jnp.sum(inl, axis=1)
        counts = jnp.where(ok_h, counts, 0)
        best = jnp.argmax(counts)

        raw_mask = inl[best].astype(jnp.float32)
        eq = fit_plane_weighted(points, raw_mask)
        # Re-collect inliers of the REFINED plane.
        dist_r = jnp.abs(mm(points, eq.normal) - eq.d)
        final_mask = (dist_r < inlier_threshold) & available
        count = jnp.sum(final_mask)

        accept = count >= min_inliers
        available = jnp.where(accept, available & ~final_mask, available)
        inlier_of = jnp.where(
            accept & final_mask, plane_idx, inlier_of
        )
        plane_idx = plane_idx + accept.astype(jnp.int32)
        out = (
            jnp.where(accept, eq.normal, 0.0),
            jnp.where(accept, eq.d, 0.0),
            jnp.where(accept, count, 0).astype(jnp.int32),
            accept,
        )
        return (available, inlier_of, plane_idx), out

    keys = jax.random.split(key, max_planes)
    init = (
        jnp.ones((n,), bool),
        jnp.full((n,), -1, jnp.int32),
        jnp.asarray(0, jnp.int32),
    )
    (_, inlier_of, n_planes), (normals, ds, counts, accepts) = jax.lax.scan(
        round_body, init, keys
    )
    # Compact accepted planes to the front (host-friendly order).
    order = jnp.argsort(~accepts)  # accepted first, stable
    return DetectedPlanes(
        normals=normals[order],
        ds=ds[order],
        inlier_counts=counts[order],
        n_planes=n_planes,
        inlier_of=inlier_of,
    )


def convex_hull_2d(points_2d: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain convex hull (host-side; hull sizes are tiny
    and data-dependent — not a device problem)."""
    pts = np.unique(np.asarray(points_2d, np.float64), axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def cross2(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    def half(iterable):
        out: List[np.ndarray] = []
        for p in iterable:
            while len(out) >= 2 and cross2(out[-2], out[-1], p) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.asarray(lower[:-1] + upper[:-1])


def plane_hulls(
    points: np.ndarray, detected: DetectedPlanes
) -> List[np.ndarray]:
    """Per-plane 3D boundary polygons: project inliers onto the plane,
    take the 2D convex hull in the plane basis, lift back to 3D — the
    cloud_plane_hull<k>.pcd payloads (ref Main.hs:1392-1404)."""
    points = np.asarray(points)
    normals = np.asarray(detected.normals)
    ds = np.asarray(detected.ds)
    inlier_of = np.asarray(detected.inlier_of)
    # The scan emitted planes in discovery order; inlier_of uses that
    # order too (pre-compaction order is identical for accepted planes
    # because rejected rounds emit nothing).
    hulls = []
    for k in range(int(detected.n_planes)):
        n = normals[k]
        d = ds[k]
        members = points[inlier_of == k]
        if len(members) == 0:
            hulls.append(np.zeros((0, 3), np.float32))
            continue
        # Plane basis.
        helper = np.array([1.0, 0, 0]) if abs(n[0]) < 0.9 else np.array([0, 1.0, 0])
        e1 = np.cross(n, helper)
        e1 /= np.linalg.norm(e1)
        e2 = np.cross(n, e1)
        proj = members - np.outer(members @ n - d, n)  # onto plane
        uv = np.stack([proj @ e1, proj @ e2], axis=1)
        hull_uv = convex_hull_2d(uv)
        # Exact lift: (e1, e2, n) is orthonormal and every projected point
        # satisfies p.n = d, so p = (p.e1) e1 + (p.e2) e2 + d n.
        hull3d = d * n + hull_uv[:, :1] * e1 + hull_uv[:, 1:2] * e2
        hulls.append(hull3d.astype(np.float32))
    return hulls


def detect_planes_to_dir(
    points: np.ndarray,
    out_dir,
    key=None,
    max_planes: int = 8,
    n_hypotheses: int = 512,
    inlier_threshold: float = 0.02,
    min_inliers: int = 200,
):
    """Full parity with the reference's external plane-detect tool: write
    planes.txt + cloud_plane_hull<k>.pcd into a room directory."""
    from pathlib import Path

    from housescan_tpu.io.pcd import save_pcd
    from housescan_tpu.io.planes_txt import save_planes_txt

    if key is None:
        key = jax.random.PRNGKey(0)
    det = detect_planes(
        jnp.asarray(points, jnp.float32),
        key,
        max_planes=max_planes,
        n_hypotheses=n_hypotheses,
        inlier_threshold=inlier_threshold,
        min_inliers=min_inliers,
    )
    npl = int(det.n_planes)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    eqs = PlaneEq(jnp.asarray(det.normals[:npl]), jnp.asarray(det.ds[:npl]))
    save_planes_txt(out_dir / "planes.txt", eqs)
    hulls = plane_hulls(points, det)
    for k in range(npl):
        save_pcd(out_dir / f"cloud_plane_hull{k}.pcd", hulls[k])
    return det
