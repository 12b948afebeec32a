"""TSDF raycasting: per-pixel surface prediction for tracking and preview.

TPU replacement for PCL KinFu's raycast kernel (SURVEY.md section 2b).
All rays march in lockstep inside one ``fori_loop`` with a per-pixel done
mask (fixed trip count — the XLA-friendly shape of an early-exit loop):
coarse steps of ~0.75*trunc with nearest-voxel samples until a sign
change, then one linear-interpolation refinement and a trilinear-gradient
normal. Returns world-frame vertex and normal maps plus validity.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from housescan_tpu.geometry.transform import mm
from housescan_tpu.kinfu.camera import Intrinsics, pixel_rays
from housescan_tpu.kinfu.tsdf import TsdfVolume, sample_trilinear, tsdf_gradient


class RaycastResult(NamedTuple):
    vertices: jnp.ndarray  # (H, W, 3) world-frame surface points
    normals: jnp.ndarray  # (H, W, 3) unit normals (into free space)
    valid: jnp.ndarray  # (H, W) bool
    depth: jnp.ndarray  # (H, W) projective depth of the hit (0 invalid)


def _sample_nearest(vol: TsdfVolume, pts_world: jnp.ndarray) -> jnp.ndarray:
    """Nearest-voxel TSDF, +1 outside the volume.

    The marching loop needs ONE gather per step: unobserved voxels hold
    the +1 initialization, so any non-positive sample is necessarily an
    observed voxel — no weight lookup required in the hot loop.
    """
    dx, dy, dz = vol.dims
    g = (pts_world - vol.origin) / vol.voxel_size
    i = jnp.floor(g).astype(jnp.int32)
    dims = jnp.array([dx, dy, dz], jnp.int32)
    inb = jnp.all((i >= 0) & (i < dims), axis=-1)
    ic = jnp.clip(i, 0, dims - 1)
    flat = ic[..., 0] * (dy * dz) + ic[..., 1] * dz + ic[..., 2]
    t = jnp.take(vol.tsdf.reshape(-1), flat.reshape(-1), mode="clip").reshape(flat.shape)
    return jnp.where(inb, t.astype(jnp.float32), 1.0)


@partial(jax.jit, static_argnames=("intr", "max_steps"))
def raycast(
    vol: TsdfVolume,
    pose: jnp.ndarray,
    intr: Intrinsics,
    z_min: float = 0.3,
    step_scale: float = 0.75,
    max_steps: int = 256,
) -> RaycastResult:
    """March every pixel ray of camera ``pose`` (4x4 row-vector
    camera-to-world) through the volume to its first zero crossing."""
    rays_cam = pixel_rays(intr)
    rot = pose[:3, :3]
    origin = pose[3, :3]
    dirs = mm(rays_cam, rot)  # world dirs, scaled so z_cam(t) = t
    inv_scale = 1.0 / jnp.linalg.norm(dirs, axis=-1)  # meters of t per unit ray

    # Ray/volume AABB intersection -> per-pixel [t_near, t_far].
    vmin = vol.origin
    vmax = vol.origin + jnp.array(vol.dims, jnp.float32) * vol.voxel_size
    eps = 1e-12
    safe = jnp.where(jnp.abs(dirs) < eps, eps, dirs)
    t1 = (vmin - origin) / safe
    t2 = (vmax - origin) / safe
    t_near = jnp.maximum(jnp.max(jnp.minimum(t1, t2), axis=-1), z_min)
    t_far = jnp.min(jnp.maximum(t1, t2), axis=-1)

    step = vol.trunc * step_scale * inv_scale  # in t units (projective depth)

    h, w = t_near.shape
    init = (
        t_near,  # t
        jnp.full((h, w), jnp.inf),  # prev tsdf (inf = not yet sampled valid)
        jnp.zeros((h, w)),  # t_hit
        jnp.zeros((h, w), bool),  # hit
    )

    def body(_, state):
        t, prev, t_hit, hit = state
        pts = origin + t[..., None] * dirs
        val = _sample_nearest(vol, pts)
        # Crossing: previous sample in free space (0 < prev <= 1), current
        # strictly behind the surface (< 0; unobserved voxels are +1 so
        # they can never fake a crossing).
        crossing = (prev > 0) & (prev <= 1.0) & (val < 0) & ~hit
        # Linear interpolation for the crossing point in t.
        t_prev = t - step
        frac = jnp.where(jnp.abs(prev - val) > 1e-12, prev / (prev - val), 0.5)
        t_cross = t_prev + frac * step
        t_hit = jnp.where(crossing, t_cross, t_hit)
        hit = hit | crossing
        prev = jnp.where(hit, prev, val)
        active = ~hit & (t < t_far)
        t = jnp.where(active, t + step, t)
        return t, prev, t_hit, hit

    _, _, t_hit, hit = jax.lax.fori_loop(0, max_steps, body, init)

    # Bracketed secant refinement on TRILINEAR samples (the KinectFusion
    # paper's interpolation step, iterated): the nearest-sample crossing
    # gives the bracket [t_hit - step, t_hit + step]; each round takes a
    # secant step and shrinks the bracket keeping the sign change inside.
    # Guarded (never leaves the bracket), so noisy partially-observed
    # neighborhoods cannot fling the vertex like an unguarded Newton can.
    def tri(tq):
        return sample_trilinear(vol, origin + tq[..., None] * dirs)

    tl = t_hit - step
    th = t_hit + step
    fl, _ = tri(tl)
    fh, _ = tri(th)
    obs = jnp.ones_like(hit)
    for _ in range(3):
        denom = fh - fl
        tm = tl - fl * (th - tl) / jnp.where(jnp.abs(denom) > 1e-12, denom, jnp.inf)
        tm = jnp.clip(tm, tl, th)
        fm, obs = tri(tm)
        take_low = fm > 0  # crossing is + (free) -> - (inside)
        tl = jnp.where(take_low, tm, tl)
        fl = jnp.where(take_low, fm, fl)
        th = jnp.where(take_low, th, tm)
        fh = jnp.where(take_low, fh, fm)
    denom = fh - fl
    t_refined = tl - fl * (th - tl) / jnp.where(jnp.abs(denom) > 1e-12, denom, jnp.inf)
    t_refined = jnp.where(hit, jnp.clip(t_refined, t_hit - step, t_hit + step), t_hit)
    pts = origin + t_refined[..., None] * dirs

    # Normals from the raycast VERTEX MAP (cross products of neighbors),
    # not the TSDF gradient: the gradient of a one-sided-truncated
    # projective TSDF is coherently tilted off the true surface normal
    # (measured ~2-6 degrees on flat walls after a single integration),
    # which point-to-plane ICP converts into a centimeter-scale pose
    # bias. Vertex-map normals inherit the raycast vertices' sub-mm
    # accuracy and get the same occlusion-edge discontinuity mask as the
    # live maps.
    from housescan_tpu.kinfu.preprocess import vertex_normals

    # Strict-support gate: pixels whose final trilinear neighborhood is
    # partially UNOBSERVED (occlusion-shadow boundaries in the TSDF) have
    # well-localized vertices but biased values -> tilted normals that
    # point-to-plane ICP slides along. Demand near-full support.
    _, full_support = sample_trilinear(
        vol, origin + t_refined[..., None] * dirs, min_support=0.95
    )
    hit = hit & full_support

    hit_pts = jnp.where(hit[..., None], pts, 0.0)
    v_cam = jnp.where(hit[..., None], mm(hit_pts - origin, rot.T), 0.0)
    n_cam = vertex_normals(v_cam)
    normals = mm(n_cam, rot)
    valid = hit & (jnp.sum(n_cam * n_cam, axis=-1) > 0.25)
    vertices = jnp.where(valid[..., None], pts, 0.0)
    normals = jnp.where(valid[..., None], normals, 0.0)
    depth = jnp.where(valid, t_refined, 0.0)
    return RaycastResult(vertices, normals, valid, depth.astype(jnp.float32))
