"""Pallas surface-plane extraction: TSDF volume -> per-sub-block planes.

The raycast bottleneck on TPU is per-ray volume sampling (XLA gathers run
near-scalar: the classic marcher took 1.8s/frame at 512^3). This kernel
removes sampling from the hot path entirely: for every (8, 8, 32) voxel
sub-block it least-squares-fits a LOCAL SURFACE PLANE to the truncation
band (sdf ~ s0 + g.(p - p_mean) over band voxels), so raycasting becomes
pure ray-plane intersection against a few thousand candidate planes
(ops/raycast_pallas.py). Interior scan targets are near-planar at 5cm
scale — and point-to-plane ICP consumes exactly a local plane anyway.

Moment accumulation is fully vectorized: per x-slab, 8 moment expressions
reduce over sublanes and then segment-reduce over the 16 z-sub-chunks
with ONE tiny matmul against a static segment-indicator matrix.

Output tensor: (nbx, nbx, 8, 128) f32 = [i, j, field, sub-chunk] (lanes
beyond nsub are padding) with fields [nx, ny, nz, d, valid, count,
subblock_id, pad]; world-frame Hessian plane n.p = d.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from housescan_tpu.kinfu.tsdf import TsdfVolume

SUB_Z = 32
N_SUB = 16  # sub-chunks per 512-voxel column
N_FIELDS = 8


def _kernel(params, tsdf_in, w_in, out_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)

    vs = params[0]
    ox, oy, oz = params[1], params[2], params[3]
    min_count = params[4]

    nz = tsdf_in.shape[2]
    nsub = nz // SUB_Z  # static (from the ref shape)

    # Static segment matrix: lane z -> sub-chunk one-hot.
    zi = jax.lax.broadcasted_iota(jnp.int32, (nz, nsub), 0)
    si = jax.lax.broadcasted_iota(jnp.int32, (nz, nsub), 1)
    seg = ((zi // SUB_Z) == si).astype(jnp.float32)

    iy_f = jax.lax.broadcasted_iota(jnp.int32, (8, nz), 0).astype(jnp.float32)
    z_f = jax.lax.broadcasted_iota(jnp.int32, (8, nz), 1).astype(jnp.float32)
    zz = z_f - (z_f // SUB_Z) * SUB_Z  # z within sub-chunk, [0, 32)

    def slab_moments(ix, carry):
        """Accumulate the 8 plain moment rows and 3 x-weighted rows."""
        acc, accx = carry
        t = tsdf_in[ix]  # (8, nz)
        w = w_in[ix]
        band = (w > 0.0) & (jnp.abs(t) < 0.99)
        m = band.astype(jnp.float32)
        s = t  # sdf in trunc units

        rows = jnp.concatenate(
            [
                jnp.sum(m, axis=0, keepdims=True),
                jnp.sum(m * s, axis=0, keepdims=True),
                jnp.sum(m * iy_f, axis=0, keepdims=True),
                jnp.sum(m * zz, axis=0, keepdims=True),
                jnp.sum(m * iy_f * s, axis=0, keepdims=True),
                jnp.sum(m * zz * s, axis=0, keepdims=True),
                jnp.sum(m * iy_f * iy_f, axis=0, keepdims=True),
                jnp.sum(m * zz * zz, axis=0, keepdims=True),
                jnp.sum(m * iy_f * zz, axis=0, keepdims=True),
            ],
            axis=0,
        )  # (9, nz)
        r = jax.lax.dot_general(
            rows, seg, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (9, 16)
        x = ix.astype(jnp.float32)
        xrow = jnp.concatenate(
            [r[0:1] * x, r[0:1] * (x * x), r[1:2] * x, r[2:3] * x, r[3:4] * x],
            axis=0,
        )  # (5, 16): [x*S0, x^2*S0, x*Ss, x*Sy, x*Sz]
        return acc + r, accx + xrow

    acc0 = jnp.zeros((9, nsub), jnp.float32)
    accx0 = jnp.zeros((5, nsub), jnp.float32)
    acc, accx = jax.lax.fori_loop(0, 8, slab_moments, (acc0, accx0))

    s0 = acc[0:1]
    ss = acc[1:2]
    sy = acc[2:3]
    sz = acc[3:4]
    sys_ = acc[4:5]
    szs = acc[5:6]
    syy = acc[6:7]
    szz = acc[7:8]
    syz = acc[8:9]
    sx = accx[0:1]
    sxx = accx[1:2]
    sxs = accx[2:3]
    sxy = accx[3:4]
    sxz = accx[4:5]

    n0 = jnp.maximum(s0, 1.0)
    eps = 1e-6
    # Full centered covariance (the band is a planar slab: cross terms are
    # LARGE for tilted planes; a diagonal shortcut would bias the normal).
    cxx = jnp.maximum(sxx - sx * sx / n0, eps)
    cyy = jnp.maximum(syy - sy * sy / n0, eps)
    czz = jnp.maximum(szz - sz * sz / n0, eps)
    cxy = sxy - sx * sy / n0
    cxz = sxz - sx * sz / n0
    cyz = syz - sy * sz / n0
    bx = sxs - sx * ss / n0
    by = sys_ - sy * ss / n0
    bz = szs - sz * ss / n0

    # Cramer solve of C g = b, vectorized over the 16 sub-chunks.
    det = (
        cxx * (cyy * czz - cyz * cyz)
        - cxy * (cxy * czz - cyz * cxz)
        + cxz * (cxy * cyz - cyy * cxz)
    )
    ok_det = jnp.abs(det) > 1e-3
    safe_det = jnp.where(ok_det, det, 1.0)
    gx = (
        bx * (cyy * czz - cyz * cyz)
        - cxy * (by * czz - cyz * bz)
        + cxz * (by * cyz - cyy * bz)
    ) / safe_det
    gy = (
        cxx * (by * czz - bz * cyz)
        - bx * (cxy * czz - cyz * cxz)
        + cxz * (cxy * bz - by * cxz)
    ) / safe_det
    gz = (
        cxx * (cyy * bz - by * cyz)
        - cxy * (cxy * bz - by * cxz)
        + bx * (cxy * cyz - cyy * cxz)
    ) / safe_det
    gnorm = jnp.sqrt(gx * gx + gy * gy + gz * gz)
    ok_g = gnorm > 1e-4
    gsafe = jnp.maximum(gnorm, 1e-12)
    nx_ = gx / gsafe
    ny_ = gy / gsafe
    nz_ = gz / gsafe

    # Mean voxel position (within-sub-chunk coords) and mean sdf.
    mx = sx / n0
    my = sy / n0
    mz = sz / n0
    msdf = ss / n0
    # Surface point: p_mean - msdf / |g| along the unit gradient (all in
    # voxel units; msdf is in trunc units, gradient in trunc/voxel).
    step = msdf / gsafe
    px = mx - step * nx_
    py = my - step * ny_
    pz = mz - step * nz_

    # To world coordinates. Sub-chunk s starts at z = s*32.
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (1, nsub), 1).astype(jnp.float32)
    wx = ox + (i * 8 + px + 0.5) * vs
    wy = oy + (j * 8 + py + 0.5) * vs
    wz = oz + (sub_iota * SUB_Z + pz + 0.5) * vs
    d = nx_ * wx + ny_ * wy + nz_ * wz

    valid = (s0 >= min_count) & ok_g & ok_det & (jnp.abs(step) < 2.0 * SUB_Z)
    validf = valid.astype(jnp.float32)

    nbx = params[5]
    sub_id = ((i * nbx + j) * nsub).astype(jnp.float32) + sub_iota

    fields = jnp.concatenate(
        [nx_ * validf, ny_ * validf, nz_ * validf, d * validf, validf, s0, sub_id, jnp.zeros((1, nsub))],
        axis=0,
    )  # (8, nsub)
    # Output block is (1, 1, 8, 128): fields on sublanes, sub-chunks on
    # the first nsub lanes (lane padding keeps the block tiling legal).
    out_ref[0, 0, :, :] = jnp.concatenate(
        [fields, jnp.zeros((N_FIELDS, 128 - nsub), jnp.float32)], axis=1
    )


@partial(jax.jit, static_argnames=("interpret",))
def extract_subblock_planes(
    vol: TsdfVolume, min_count: float = 8.0, interpret: bool = False
) -> jnp.ndarray:
    """(64, 64, 128) per-sub-block surface planes (see module docstring)."""
    r = vol.resolution
    assert r % 8 == 0 and vol.tsdf.shape[2] % SUB_Z == 0

    nbx = r // 8
    nsub = vol.tsdf.shape[2] // SUB_Z

    params = jnp.concatenate(
        [
            vol.voxel_size.reshape(1),
            vol.origin.reshape(-1),
            jnp.array([min_count, float(nbx)], jnp.float32),
        ]
    )

    out = pl.pallas_call(
        _kernel,
        grid=(nbx, nbx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 8, vol.tsdf.shape[2]), lambda i, j: (i, j, 0)),
            pl.BlockSpec((8, 8, vol.tsdf.shape[2]), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, N_FIELDS, 128), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nbx, nbx, N_FIELDS, 128), jnp.float32),
        interpret=interpret,
    )(params, vol.tsdf, vol.weight)
    return out
