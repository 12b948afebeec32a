"""Depth-frame preprocessing: bilateral filter, vertex/normal maps, pyramids.

The PCL KinFu front end the reference relied on (SURVEY.md section 2b)
runs these as CUDA kernels; here each is a fully-fusible XLA elementwise
program — the bilateral window is a static unrolled shift-stack, so the
whole preprocess (filter -> 3-level pyramid -> vertex maps -> normal
maps) compiles into a handful of fused loops with zero gathers.

Invalid depth is 0 (the Kinect convention the reference also used,
ref Main.hs:1300 'drop d==0'); invalid vertices/normals are NaN-free
zeros with a validity mask derivable from depth > 0.
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from housescan_tpu.kinfu.camera import Intrinsics, pixel_rays


def bilateral_filter(
    depth: jnp.ndarray,
    radius: int = 3,
    sigma_space: float = 4.5,
    sigma_depth: float = 0.03,
) -> jnp.ndarray:
    """Edge-preserving depth smoothing (PCL KinFu front-end equivalent).

    ``depth`` is (H, W) meters with 0 = invalid. The (2r+1)^2 window is
    unrolled at trace time into shifted copies — XLA fuses the whole
    filter into one elementwise loop, no convolution or gather needed.

    The range weight is a BIWEIGHT polynomial (1 - (dd/3sigma)^2)_+^2
    rather than PCL's Gaussian: a runtime ``exp`` per tap was ~60% of
    the whole preprocess stage on the TPU (49 transcendentals per pixel
    per frame), while the biweight is 3 VPU ops with the same
    edge-preserving shape — hard zero beyond 3 sigma (the Gaussian
    leaks a 1% tail across edges), 0.79 vs 0.61 at 1 sigma. The spatial
    Gaussian term is a compile-time constant per tap and stays.
    """
    import math as _math

    valid = depth > 0
    inv_2ss = 0.5 / (sigma_space * sigma_space)
    inv_9sd2 = 1.0 / (9.0 * sigma_depth * sigma_depth)

    weight_sum = jnp.zeros_like(depth)
    value_sum = jnp.zeros_like(depth)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            shifted = _shift2d(depth, dy, dx)
            ok = (shifted > 0) & valid
            dd = shifted - depth
            wr = jnp.maximum(0.0, 1.0 - dd * dd * inv_9sd2)
            w = _math.exp(-(dy * dy + dx * dx) * inv_2ss) * wr * wr
            w = jnp.where(ok, w, 0.0)
            weight_sum = weight_sum + w
            value_sum = value_sum + w * shifted
    out = jnp.where(weight_sum > 0, value_sum / jnp.maximum(weight_sum, 1e-12), 0.0)
    return jnp.where(valid, out, 0.0)


def _shift2d(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift with zero fill (zeros = invalid depth).

    Border zeroing uses iota masks (pure elementwise selects) rather than
    scatter-style .at[].set updates, which XLA:TPU does not fuse into the
    surrounding elementwise program — with 49 bilateral taps that was the
    difference between a fused filter and 33ms of preprocessing.
    """
    h, w = img.shape
    out = img
    if dy:
        out = jnp.roll(out, dy, axis=0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        keep = rows >= dy if dy > 0 else rows < h + dy
        out = jnp.where(keep, out, 0.0)
    if dx:
        out = jnp.roll(out, dx, axis=1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        keep = cols >= dx if dx > 0 else cols < w + dx
        out = jnp.where(keep, out, 0.0)
    return out


def downsample_depth(depth: jnp.ndarray, sigma_depth: float = 0.03) -> jnp.ndarray:
    """Halve resolution in the POINT-SAMPLING convention (PCL pyrDown
    style): smooth with a discontinuity-gated 3x3 window CENTERED on fine
    pixel (2i, 2j), then subsample [::2, ::2]. Keeps the depth pyramid on
    the same pixel grid as point-sampled model maps and Intrinsics.level.
    """
    center = depth
    weight_sum = jnp.zeros_like(depth)
    value_sum = jnp.zeros_like(depth)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            s = _shift2d(depth, dy, dx)
            w = 1.0 if (dy == 0 and dx == 0) else 0.5
            ok = (s > 0) & (jnp.abs(s - center) < 3 * sigma_depth)
            wv = jnp.where(ok, w, 0.0)
            weight_sum = weight_sum + wv
            value_sum = value_sum + wv * s
    smoothed = jnp.where(
        (center > 0) & (weight_sum > 0), value_sum / jnp.maximum(weight_sum, 1e-12), 0.0
    )
    # Exact point sampling WITHOUT a strided slice (a gather-class op on
    # this backend, ~9 ns/element): kinfu/maps.halve_maps selects via
    # one-hot matmuls on TPU, bit-identical to [::2, ::2].
    from housescan_tpu.kinfu.maps import halve_maps

    return halve_maps(smoothed[None])[0]


def depth_to_vertices(depth: jnp.ndarray, intr: Intrinsics) -> jnp.ndarray:
    """(H, W) depth -> (H, W, 3) camera-frame vertex map (0 where invalid)."""
    rays = pixel_rays(intr, depth.dtype)
    return rays * depth[..., None]


def vertex_normals(vertices: jnp.ndarray, max_depth_jump: float = 0.08) -> jnp.ndarray:
    """(H, W, 3) vertex map -> unit normal map via central differences.

    Normals point toward the camera (-z half-space), the orientation ICP
    and raycast agree on. Invalid pixels get zero normals; a pixel is
    invalid when any stencil neighbor is missing, the cross product
    degenerates, or a neighbor's depth jumps by more than
    ``max_depth_jump`` — the depth-DISCONTINUITY mask. Without it, pixels
    straddling an occlusion edge blend two surfaces into a plausible-
    looking but fictitious normal; live and model maps then agree on the
    same fiction, the ICP angle test passes, and the pose estimate is
    dragged sideways a few tenths of a millimeter per iteration (measured
    on the synthetic furnished room before this mask existed).
    """
    vr = jnp.roll(vertices, -1, axis=1)
    vl = jnp.roll(vertices, 1, axis=1)
    vd = jnp.roll(vertices, -1, axis=0)
    vu = jnp.roll(vertices, 1, axis=0)
    du = vr - vl
    dv = vd - vu
    n = jnp.cross(dv, du)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    z = vertices[..., 2]
    continuous = (
        (jnp.abs(vr[..., 2] - z) < max_depth_jump)
        & (jnp.abs(vl[..., 2] - z) < max_depth_jump)
        & (jnp.abs(vd[..., 2] - z) < max_depth_jump)
        & (jnp.abs(vu[..., 2] - z) < max_depth_jump)
    )
    valid = (
        (z > 0)
        & (vr[..., 2] > 0)
        & (vl[..., 2] > 0)
        & (vd[..., 2] > 0)
        & (vu[..., 2] > 0)
        & continuous
        & (norm[..., 0] > 1e-12)
    )
    n = n / jnp.maximum(norm, 1e-12)
    # Orient toward the camera: n . v < 0 (v points away from camera).
    flip = jnp.sum(n * vertices, axis=-1, keepdims=True) > 0
    n = jnp.where(flip, -n, n)
    return jnp.where(valid[..., None], n, 0.0)


def _vertices_cm(depth: jnp.ndarray, intr: Intrinsics) -> jnp.ndarray:
    """(h, w) depth -> (3, h, w) camera-frame vertex rows (channel-major:
    three full-tile 2D ops instead of interleaved (h, w, 3) arithmetic —
    see kinfu/maps.py for why the layout matters on this backend)."""
    h, w = depth.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(depth.dtype)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(depth.dtype)
    vx = (cols - intr.cx) / intr.fx * depth
    vy = (rows - intr.cy) / intr.fy * depth
    return jnp.stack([vx, vy, depth], axis=0)


def _normals_cm(v: jnp.ndarray, max_depth_jump: float = 0.08) -> jnp.ndarray:
    """(3, h, w) vertex rows -> (3, h, w) unit normal rows. Same math,
    masks, and orientation as vertex_normals (elementwise per pixel, so
    the two layouts produce bit-identical values)."""
    vr = jnp.roll(v, -1, axis=2)
    vl = jnp.roll(v, 1, axis=2)
    vd = jnp.roll(v, -1, axis=1)
    vu = jnp.roll(v, 1, axis=1)
    du = vr - vl
    dv = vd - vu
    nx = dv[1] * du[2] - dv[2] * du[1]
    ny = dv[2] * du[0] - dv[0] * du[2]
    nz = dv[0] * du[1] - dv[1] * du[0]
    n = jnp.stack([nx, ny, nz], axis=0)
    norm = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    z = v[2]
    continuous = (
        (jnp.abs(vr[2] - z) < max_depth_jump)
        & (jnp.abs(vl[2] - z) < max_depth_jump)
        & (jnp.abs(vd[2] - z) < max_depth_jump)
        & (jnp.abs(vu[2] - z) < max_depth_jump)
    )
    valid = (
        (z > 0)
        & (vr[2] > 0)
        & (vl[2] > 0)
        & (vd[2] > 0)
        & (vu[2] > 0)
        & continuous
        & (norm > 1e-12)
    )
    n = n / jnp.maximum(norm, 1e-12)[None]
    flip = jnp.sum(n * v, axis=0, keepdims=True) > 0
    n = jnp.where(flip, -n, n)
    return jnp.where(valid[None], n, 0.0)


class FramePyramid(NamedTuple):
    """Per-level depth + packed live maps, level 0 = full res.

    ``maps[lvl]`` is (6, h, w) channel-major: rows 0-2 camera-frame
    vertices, rows 3-5 normals (kinfu/maps.py LIVE layout)."""

    depths: Tuple[jnp.ndarray, ...]
    maps: Tuple[jnp.ndarray, ...]


def build_pyramid(
    raw_depth: jnp.ndarray,
    intr: Intrinsics,
    levels: int = 3,
    bilateral_radius: int = 3,
    sigma_space: float = 4.5,
    sigma_depth: float = 0.03,
) -> FramePyramid:
    """Full preprocess: bilateral filter then per-level packed live maps."""
    if jax.default_backend() == "cpu":
        d0 = bilateral_filter(raw_depth, bilateral_radius, sigma_space, sigma_depth)
    else:
        # One Pallas program instead of a 49-tap XLA shift-stack (each
        # tiny op costs ~0.5-1us of issue latency on this backend).
        from housescan_tpu.ops.preprocess_pallas import bilateral_filter_pallas

        d0 = bilateral_filter_pallas(
            raw_depth, bilateral_radius, sigma_space, sigma_depth
        )
    depths: List[jnp.ndarray] = [d0]
    for _ in range(1, levels):
        depths.append(downsample_depth(depths[-1], sigma_depth))
    maps = []
    for lvl, d in enumerate(depths):
        v = _vertices_cm(d, intr.level(lvl))
        maps.append(jnp.concatenate([v, _normals_cm(v)], axis=0))
    return FramePyramid(tuple(depths), tuple(maps))
