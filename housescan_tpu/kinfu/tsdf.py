"""TSDF volume: allocation, gather-side integration, point extraction.

The TPU replacement for PCL KinFu's CUDA TSDF kernels (SURVEY.md section
2b). Design choice per SURVEY.md section 7 'hard parts': integration is
GATHER-side — every voxel pulls from the depth map (one dense gather)
instead of scattering depth points into the grid — which keeps the kernel
a static-shape, race-free data-parallel sweep, exactly what XLA/TPU want.

Volume layout: ``tsdf[x, y, z]`` with z the fastest (lane) axis; world
position of voxel (i,j,k) is ``origin + (ijk + 0.5) * voxel_size``. TSDF
is stored normalized in [-1, 1] (units of the truncation distance),
positive in free space, with a parallel weight grid; both float32 by
default (bfloat16 storage supported for half the HBM traffic).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from housescan_tpu.config import TsdfConfig
from housescan_tpu.kinfu.camera import Intrinsics


# int16-packed storage: tsdf quantized to [-32767, 32767] in the HIGH
# half of an int32, integer weight (<= 65535; KinFu caps at 128) in the
# LOW half. Halves the integrate's HBM traffic (its dominant cost at
# 512^3: ~4.3 GB/frame of block reads+writes) at 3.05e-5 tsdf
# quantization — sub-micrometer at a 3 cm truncation band, ~150x finer
# than bfloat16 — with bit-exact weights.
PACKED_SCALE = 32767.0


def pack_tw(t: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    ti = jnp.round(jnp.clip(t, -1.0, 1.0) * PACKED_SCALE).astype(jnp.int32)
    return (ti << 16) | w.astype(jnp.int32)


def unpack_t(data: jnp.ndarray) -> jnp.ndarray:
    # arithmetic shift keeps the sign; the low (weight) bits drop out
    return (data >> 16).astype(jnp.float32) * (1.0 / PACKED_SCALE)


def unpack_w(data: jnp.ndarray) -> jnp.ndarray:
    return (data & 0xFFFF).astype(jnp.float32)


class TsdfVolume(NamedTuple):
    """TSDF + weight grids with geometry metadata (a pytree; the float
    metadata rides along as 0-d arrays so the whole volume shards/jits
    cleanly).

    Storage is PACKED one of two ways:
      * float: ``data[0]`` is the tsdf grid, ``data[1]`` the weight
        grid, one (2, X, Y, Z) f32/bf16 array. The streaming integrate
        moves both grids through one block per chunk — on this backend
        every extra Pallas buffer costs per-step DMA bookkeeping.
      * int16-in-int32 (``data.ndim == 3``): one (X, Y, Z) int32 array,
        tsdf<<16 | weight (see pack_tw) — half the bytes of f32, the
        production layout for the Pallas integrate.
    ``tsdf`` / ``weight`` remain as (lazy) properties; under jit they
    fuse into consumers.
    """

    data: jnp.ndarray  # (2, X, Y, Z) float or (X, Y, Z) packed int32
    origin: jnp.ndarray  # (3,) world position of the volume min corner
    voxel_size: jnp.ndarray  # () meters per voxel
    trunc: jnp.ndarray  # () truncation distance in meters

    @property
    def packed_i32(self) -> bool:
        return self.data.ndim == 3

    @property
    def tsdf(self) -> jnp.ndarray:
        if self.data.ndim == 3:
            return unpack_t(self.data)
        return self.data[0]

    @property
    def weight(self) -> jnp.ndarray:
        if self.data.ndim == 3:
            return unpack_w(self.data)
        return self.data[1]

    @property
    def resolution(self) -> int:
        return self.data.shape[1]

    @property
    def dims(self):
        """Per-axis voxel counts; shards of a mesh-distributed volume are
        non-cubic (e.g. an X-slab), so samplers use dims, not resolution."""
        if self.data.ndim == 3:
            return self.data.shape
        return self.data.shape[1:]

    def replace_grids(self, tsdf=None, weight=None) -> "TsdfVolume":
        """New volume with either grid swapped (re-packs into ``data``)."""
        t = self.tsdf if tsdf is None else tsdf
        w = self.weight if weight is None else weight
        if self.data.ndim == 3:
            return self._replace(data=pack_tw(t, w))
        return self._replace(data=jnp.stack([t, w]))


def make_volume(tsdf, weight, origin, voxel_size, trunc) -> TsdfVolume:
    """Construct a packed TsdfVolume from separate grids."""
    return TsdfVolume(
        data=jnp.stack([tsdf, weight]),
        origin=origin,
        voxel_size=voxel_size,
        trunc=trunc,
    )


def tsdf_new(
    resolution: int = 512,
    size_m: float = 3.0,
    trunc: float = 0.03,
    origin: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
) -> TsdfVolume:
    """Fresh volume. Default origin centers the cube on the world origin
    (the synthetic room frame); KinFu-style 'camera at front face' setups
    pass an explicit origin."""
    if origin is None:
        origin = jnp.full((3,), -size_m / 2.0, jnp.float32)
    if dtype == jnp.int32:
        # int16-packed layout: tsdf=+1 (far free space), weight=0
        data = jnp.full((resolution,) * 3, jnp.int32(32767) << 16, jnp.int32)
    else:
        data = jnp.concatenate(
            [
                jnp.ones((1,) + (resolution,) * 3, dtype),  # +1 = far free
                jnp.zeros((1,) + (resolution,) * 3, dtype),
            ]
        )
    return TsdfVolume(
        data=data,
        origin=jnp.asarray(origin, jnp.float32),
        voxel_size=jnp.asarray(size_m / resolution, jnp.float32),
        trunc=jnp.asarray(trunc, jnp.float32),
    )


def from_config(cfg: TsdfConfig, origin=None) -> TsdfVolume:
    dtype = {
        "bfloat16": jnp.bfloat16,
        "packed_i16": jnp.int32,
    }.get(cfg.dtype, jnp.float32)
    return tsdf_new(cfg.resolution, cfg.size_m, cfg.trunc_dist, origin, dtype)


def _bilinear_depth(
    depth: jnp.ndarray, uf: jnp.ndarray, vf: jnp.ndarray, intr: Intrinsics
) -> jnp.ndarray:
    """Validity-aware bilinear depth lookup.

    Invalid (0) corners are dropped from the interpolation; across depth
    DISCONTINUITIES (corner spread > 0.1m) it falls back to the nearest
    corner so fore/background never blend into a phantom surface.
    """
    u0 = jnp.clip(jnp.floor(uf).astype(jnp.int32), 0, intr.width - 2)
    v0 = jnp.clip(jnp.floor(vf).astype(jnp.int32), 0, intr.height - 2)
    fu = jnp.clip(uf - u0, 0.0, 1.0)
    fv = jnp.clip(vf - v0, 0.0, 1.0)
    flat = depth.reshape(-1)

    def corner(du, dv):
        idx = (v0 + dv) * intr.width + (u0 + du)
        return jnp.take(flat, idx.reshape(-1), mode="clip").reshape(idx.shape)

    d00, d01 = corner(0, 0), corner(1, 0)
    d10, d11 = corner(0, 1), corner(1, 1)
    w00 = (1 - fu) * (1 - fv)
    w01 = fu * (1 - fv)
    w10 = (1 - fu) * fv
    w11 = fu * fv

    ws = [jnp.where(d > 0, w, 0.0) for d, w in ((d00, w00), (d01, w01), (d10, w10), (d11, w11))]
    total = ws[0] + ws[1] + ws[2] + ws[3]
    blend = (ws[0] * d00 + ws[1] * d01 + ws[2] * d10 + ws[3] * d11) / jnp.maximum(
        total, 1e-12
    )

    dmax = jnp.maximum(jnp.maximum(d00, d01), jnp.maximum(d10, d11))
    valid_min = jnp.where(d00 > 0, d00, jnp.inf)
    for d in (d01, d10, d11):
        valid_min = jnp.minimum(valid_min, jnp.where(d > 0, d, jnp.inf))
    discontinuous = (dmax - valid_min) > 0.1

    # Nearest corner fallback for discontinuities.
    nearest = jnp.where(
        fv < 0.5, jnp.where(fu < 0.5, d00, d01), jnp.where(fu < 0.5, d10, d11)
    )
    out = jnp.where(discontinuous, nearest, blend)
    return jnp.where(total > 1e-6, out, 0.0)


@partial(jax.jit, static_argnames=("intr", "depth_interp"), donate_argnums=(0,))
def tsdf_integrate(
    vol: TsdfVolume,
    depth: jnp.ndarray,
    pose: jnp.ndarray,
    intr: Intrinsics,
    max_weight: float = 128.0,
    depth_interp: str = "bilinear",
) -> TsdfVolume:
    """Fuse one depth frame into the volume.

    ``pose`` is the 4x4 row-vector camera-to-world transform of the frame.
    Classic running-average update: project each voxel center into the
    frame, read the depth, and fold the truncated SDF sample into the
    weighted mean. Buffers are donated — the update is in-place in HBM.

    ``depth_interp``: "bilinear" (default) interpolates the depth lookup,
    removing the pixel-quantization noise that nearest sampling (PCL
    KinFu's choice) bakes into the TSDF of oblique walls (~5mm p95 per
    single integration at 640x480); "nearest" matches PCL bit-for-bit in
    spirit and costs 1 gather instead of 4.
    """
    return integrate_core(vol, depth, pose, intr, max_weight, depth_interp)


def integrate_core(
    vol: TsdfVolume,
    depth: jnp.ndarray,
    pose: jnp.ndarray,
    intr: Intrinsics,
    max_weight: float = 128.0,
    depth_interp: str = "bilinear",
) -> TsdfVolume:
    """Unjitted integrate body; works on non-cubic volumes so a mesh shard
    (an X-slab with its own origin) integrates with the same code inside
    shard_map."""
    nx, ny, nz = vol.dims
    dtype = vol.tsdf.dtype
    rot = pose[:3, :3]
    t = pose[3, :3]

    # World voxel-center coordinates, kept as three broadcastable rank-3
    # factors so XLA fuses them into the index computation without ever
    # materializing an (X, Y, Z, 3) tensor.
    gx = (vol.origin[0] + (jnp.arange(nx, dtype=jnp.float32) + 0.5) * vol.voxel_size)[
        :, None, None
    ]
    gy = (vol.origin[1] + (jnp.arange(ny, dtype=jnp.float32) + 0.5) * vol.voxel_size)[
        None, :, None
    ]
    gz = (vol.origin[2] + (jnp.arange(nz, dtype=jnp.float32) + 0.5) * vol.voxel_size)[
        None, None, :
    ]

    # World -> camera: p_c = (p_w - t) @ R^T  (R is row-vector cam-to-world).
    dxw = gx - t[0]
    dyw = gy - t[1]
    dzw = gz - t[2]
    xc = dxw * rot[0, 0] + dyw * rot[0, 1] + dzw * rot[0, 2]
    yc = dxw * rot[1, 0] + dyw * rot[1, 1] + dzw * rot[1, 2]
    zc = dxw * rot[2, 0] + dyw * rot[2, 1] + dzw * rot[2, 2]

    safe_z = jnp.maximum(zc, 1e-6)
    uf = intr.fx * xc / safe_z + intr.cx
    vf = intr.fy * yc / safe_z + intr.cy
    in_view = (
        (zc > 1e-6)
        & (uf >= 0)
        & (uf <= intr.width - 1)
        & (vf >= 0)
        & (vf <= intr.height - 1)
    )

    if depth_interp == "bilinear":
        d = _bilinear_depth(depth, uf, vf, intr)
    else:
        u = jnp.clip(jnp.round(uf).astype(jnp.int32), 0, intr.width - 1)
        v = jnp.clip(jnp.round(vf).astype(jnp.int32), 0, intr.height - 1)
        flat_idx = v * intr.width + u
        d = jnp.take(depth.reshape(-1), flat_idx.reshape(-1), mode="clip").reshape(
            flat_idx.shape
        )

    sdf = d - zc
    update = in_view & (d > 0) & (sdf >= -vol.trunc)
    tsdf_sample = jnp.clip(sdf / vol.trunc, -1.0, 1.0).astype(dtype)

    w_old = vol.weight
    w_add = update.astype(dtype)
    w_new = jnp.minimum(w_old + w_add, jnp.asarray(max_weight, dtype))
    denom = jnp.maximum(w_old + w_add, jnp.asarray(1.0, dtype))
    tsdf_upd = (vol.tsdf * w_old + tsdf_sample * w_add) / denom
    new_tsdf = jnp.where(update, tsdf_upd, vol.tsdf)

    return vol.replace_grids(tsdf=new_tsdf, weight=w_new)


def sample_trilinear(
    vol: TsdfVolume, points_world: jnp.ndarray, min_support: float = 0.25
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Trilinear TSDF samples at world points (..., 3), renormalized over
    OBSERVED support voxels.

    Unobserved voxels hold the +1 initialization; folding them into the
    interpolation would bias surface localization by up to a voxel (which
    turns directly into an ICP translation bias — measured ~1 voxel on the
    synthetic room before this renormalization). Instead the trilinear
    weights of unobserved corners are dropped and the rest renormalized.
    Returns (values, valid); valid = in bounds and observed support weight
    > ``min_support``.
    """
    dx, dy, dz = vol.dims
    g = (points_world - vol.origin) / vol.voxel_size - 0.5
    g0 = jnp.floor(g)
    frac = g - g0
    i0 = g0.astype(jnp.int32)

    dims = jnp.array([dx, dy, dz], jnp.int32)
    in_bounds = jnp.all((i0 >= 0) & (i0 < dims - 1), axis=-1)
    i0c = jnp.clip(i0, 0, dims - 2)

    tsdf_flat = vol.tsdf.reshape(-1)
    w_flat = vol.weight.reshape(-1)
    dy_, dz_ = dy, dz  # capture before the loop variables shadow them

    num = jnp.zeros(points_world.shape[:-1], jnp.float32)
    den = jnp.zeros(points_world.shape[:-1], jnp.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                idx = (
                    (i0c[..., 0] + dx) * (dy_ * dz_)
                    + (i0c[..., 1] + dy) * dz_
                    + (i0c[..., 2] + dz)
                )
                w = (
                    (frac[..., 0] if dx else 1 - frac[..., 0])
                    * (frac[..., 1] if dy else 1 - frac[..., 1])
                    * (frac[..., 2] if dz else 1 - frac[..., 2])
                ).astype(jnp.float32)
                t = jnp.take(tsdf_flat, idx.reshape(-1), mode="clip").reshape(idx.shape)
                obs = (
                    jnp.take(w_flat, idx.reshape(-1), mode="clip").reshape(idx.shape) > 0
                )
                wo = jnp.where(obs, w, 0.0)
                num = num + wo * t.astype(jnp.float32)
                den = den + wo
    value = num / jnp.maximum(den, 1e-12)
    return value, in_bounds & (den > min_support)


def tsdf_gradient(vol: TsdfVolume, points_world: jnp.ndarray) -> jnp.ndarray:
    """Central-difference TSDF gradient (surface normal direction, pointing
    into free space) at world points, via 6 trilinear samples."""
    h = vol.voxel_size
    grads = []
    for axis in range(3):
        offset = jnp.zeros((3,), jnp.float32).at[axis].set(h)
        plus, _ = sample_trilinear(vol, points_world + offset)
        minus, _ = sample_trilinear(vol, points_world - offset)
        grads.append(plus - minus)
    g = jnp.stack(grads, axis=-1)
    norm = jnp.linalg.norm(g, axis=-1, keepdims=True)
    return g / jnp.maximum(norm, 1e-12)


def extract_surface_points(
    vol: TsdfVolume, max_points: int, min_weight: float = 1.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Zero-crossing voxel centers as a fixed-capacity point set.

    A cheap surface dump (the full mesh comes from marching_cubes):
    voxels whose tsdf changes sign against the +x, +y, or +z neighbor —
    all three axes, so surfaces of every orientation are sampled (a
    z-only sweep misses floors and side walls). Sub-voxel interpolation
    along the first crossing axis. Returns (points (max_points, 3),
    count); unused slots are zeros.
    """
    r = vol.resolution
    t = vol.tsdf.astype(jnp.float32)
    w = vol.weight.astype(jnp.float32)

    def neighbor(axis):
        tn = jnp.concatenate(
            [
                jax.lax.slice_in_dim(t, 1, t.shape[axis], axis=axis),
                jax.lax.slice_in_dim(t, t.shape[axis] - 1, t.shape[axis], axis=axis),
            ],
            axis=axis,
        )
        wn = jnp.concatenate(
            [
                jax.lax.slice_in_dim(w, 1, w.shape[axis], axis=axis),
                jax.lax.slice_in_dim(w, w.shape[axis] - 1, w.shape[axis], axis=axis),
            ],
            axis=axis,
        )
        cross = (jnp.sign(t) != jnp.sign(tn)) & (w >= min_weight) & (wn >= min_weight)
        return tn, cross

    tnx, cx = neighbor(0)
    tny, cy = neighbor(1)
    tnz, cz = neighbor(2)
    crossing = cx | cy | cz

    flat = crossing.reshape(-1)
    # Stable compaction: indices of the first max_points crossings.
    # (Capacity cannot exceed the voxel count — small volumes with a
    # generous max_points used to hit a shape mismatch here.)
    max_points = min(max_points, flat.shape[0])
    order = jnp.argsort(~flat)  # True first, stable
    picked = order[:max_points]
    count = jnp.minimum(jnp.sum(flat), max_points)

    k = picked
    i = k // (r * r)
    j = (k // r) % r
    kz = k % r

    t0 = jnp.take(t.reshape(-1), picked)

    def alpha_for(tn, cmask):
        t1 = jnp.take(tn.reshape(-1), picked)
        a = jnp.where(jnp.abs(t0 - t1) > 1e-12, t0 / (t0 - t1), 0.5)
        return jnp.where(jnp.take(cmask.reshape(-1), picked), jnp.clip(a, 0.0, 1.0), 0.0)

    # Offset along the first crossing axis (priority z, y, x).
    has_z = jnp.take(cz.reshape(-1), picked)
    has_y = jnp.take(cy.reshape(-1), picked)
    az = alpha_for(tnz, cz)
    ay = alpha_for(tny, cy)
    ax = alpha_for(tnx, cx)
    off_z = jnp.where(has_z, az, 0.0)
    off_y = jnp.where(~has_z & has_y, ay, 0.0)
    off_x = jnp.where(~has_z & ~has_y, ax, 0.0)

    pos = (
        jnp.stack(
            [
                i.astype(jnp.float32) + off_x,
                j.astype(jnp.float32) + off_y,
                kz.astype(jnp.float32) + off_z,
            ],
            -1,
        )
        + 0.5
    ) * vol.voxel_size + vol.origin
    valid = jnp.arange(max_points) < count
    return jnp.where(valid[:, None], pos, 0.0), count
