"""Pallas surface-plane extraction: TSDF volume -> per-sub-block planes.

The raycast bottleneck on TPU is per-ray volume sampling (XLA gathers run
near-scalar: the classic marcher took 1.8s/frame at 512^3). This kernel
removes sampling from the hot path: for every (8, 8, SUB_Z) voxel
sub-block it fits a LOCAL SURFACE PLANE, so raycasting becomes pure
ray-plane intersection against a few thousand candidate planes
(ops/raycast_pallas.py). Interior scan targets are near-planar at this
scale — and point-to-plane ICP consumes exactly a local plane anyway.

Fitting method (v2): total least squares over the sub-block's TSDF
ZERO-CROSSING POINTS, sub-voxel interpolated along all three axes.
Crossings sample the actual surface, so the fit is unbiased. (v1 fitted
the sdf FIELD by linear regression; the projective TSDF's level sets
are only parallel to the surface AT the zero crossing, so band voxels
away from the surface dragged those normals a few degrees off — enough
for point-to-plane ICP to turn model error into steady drift at full
camera resolution.) The plane normal is the smallest-eigenvalue
eigenvector of the centered crossing covariance, recovered with
ridge-regularized INVERSE POWER ITERATIONS — each step one Cramer 3x3
solve, vectorized over sub-chunks, no eigen routine needed in-kernel.
A cheap sdf-correlation pass provides the orientation sign (the sdf
gradient points into free space). Degenerate crossing sets (near-
collinear slivers at block corners) are rejected by an in-plane-spread
test so they never feed arbitrary normals to ICP.

All moment accumulation is vectorized: per x-slab the moment rows
reduce over sublanes, then segment-reduce over the z sub-chunks with
one tiny matmul against a static indicator matrix; neighbor access for
crossing detection is pltpu.roll (lane/sublane rotate) plus one clamped
dynamic slab read for the +x family.

Output tensor: (nbx, nbx, 16, 128) f32 = [i, j, field, sub-chunk] (lanes
beyond nsub are padding) with fields [nx, ny, nz, d, valid, count,
subblock_id, in-plane radius, centroid x, y, z, 5x pad]; world-frame
Hessian plane n.p = d through the crossing centroid, with hits bounded
to `radius` of the centroid (silhouette-extension trim).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from housescan_tpu.kinfu.tsdf import TsdfVolume

# Sub-block z-extent: 8 makes blocks CUBIC (8x8x8 voxels, ~5cm at
# 512^3/3m). An earlier 32 swallowed multiple surfaces per block near
# furniture (e.g. floor + box front in one block -> eigenvalues with no
# small gap -> no plane), punching holes straight through the rendered
# model where ICP needs it most.
SUB_Z = 8
N_FIELDS = 16

# Validity gates (voxel^2 eigenvalue units of the crossing covariance).
RIDGE = 1e-4
# Max out-of-plane variance. Planar blocks sit at ~1e-8..1e-2; true
# corner blocks at >3. This used to be a loose 1.5 so curved/oblique
# regions kept SOME coverage — a gate-failed block was simply absent
# and rays sailed through it onto the geometry behind (worse than a
# blended normal). Since the raycast gained OCCLUDER handling
# (ops/raycast_tiles.py: crossing evidence without a valid plane ends
# the ray as INVALID), a failed block no longer paints wrong depth, so
# the gate can demand real planarity: compromise planes from mixed
# two-surface blocks (out-of-plane RMS ~ a voxel) were the single
# largest model-bias source left (measured +0.5 m on a furniture-corner
# block that passed at 1.5).
LAMBDA_MIN_MAX = 0.3
LAMBDA_MID_MIN = 0.1  # min sideways spread: rejects collinear slivers


def plane_fields_for_block(
    tsdf_ref, w_ref, i, j, vs, ox, oy, oz, nbx, min_count, k=0, nzc=1
):
    """Crossing-point plane fit over one (8, 8, nz) VMEM block.

    ``tsdf_ref`` / ``w_ref`` support ``[ix] -> (8, nz)`` slab reads.
    Returns the (N_FIELDS, nsub) field matrix described in the module
    docstring. Shared by this standalone kernel and the fused
    integrate-and-extract passes (ops/tsdf_pallas.py dense columns with
    k=0, nzc=1; ops/tsdf_stream.py (8, 8, 128) chunks with the chunk's
    z index k so world coordinates and sub-block ids stay global).
    """
    nz = tsdf_ref.shape[2]
    nsub = nz // SUB_Z

    # Static segment matrix: lane z -> sub-chunk one-hot.
    zi = jax.lax.broadcasted_iota(jnp.int32, (nz, nsub), 0)
    si = jax.lax.broadcasted_iota(jnp.int32, (nz, nsub), 1)
    seg = ((zi // SUB_Z) == si).astype(jnp.float32)

    iy_f = jax.lax.broadcasted_iota(jnp.int32, (8, nz), 0).astype(jnp.float32)
    z_idx = jax.lax.broadcasted_iota(jnp.int32, (8, nz), 1)
    z_f = z_idx.astype(jnp.float32)
    zz = z_f - (z_f // SUB_Z) * SUB_Z  # z within sub-chunk [0, SUB_Z)
    not_last_z = (z_idx < nz - 1).astype(jnp.float32)
    not_last_y = (iy_f < 7.0).astype(jnp.float32)

    def crossing_rows(mask, wt, px, py, pz):
        """(11, nz) moment rows for one crossing family.

        ``mask`` is the 0/1 crossing indicator, ``wt`` the fusion-weight
        factor. Moments use m = mask*wt — a crossing backed by many
        fused frames outvotes one from a single (possibly mistracked)
        frame, the closed-loop analog of the XLA raycast's strict
        support gate. Row 10 keeps the RAW count for the validity gate
        and the reported count field."""
        m = mask * wt
        return jnp.concatenate(
            [
                jnp.sum(m, axis=0, keepdims=True),
                jnp.sum(m * px, axis=0, keepdims=True),
                jnp.sum(m * py, axis=0, keepdims=True),
                jnp.sum(m * pz, axis=0, keepdims=True),
                jnp.sum(m * px * px, axis=0, keepdims=True),
                jnp.sum(m * py * py, axis=0, keepdims=True),
                jnp.sum(m * pz * pz, axis=0, keepdims=True),
                jnp.sum(m * px * py, axis=0, keepdims=True),
                jnp.sum(m * px * pz, axis=0, keepdims=True),
                jnp.sum(m * py * pz, axis=0, keepdims=True),
                jnp.sum(mask, axis=0, keepdims=True),
            ],
            axis=0,
        )

    def roll_next(arr, axis):
        """arr shifted so position k holds arr[k+1] (pltpu.roll only
        accepts non-negative shifts, so rotate by size-1)."""
        return pltpu.roll(arr, arr.shape[axis] - 1, axis)

    def alpha(t0, t1):
        denom = t0 - t1
        ok = jnp.abs(denom) > 1e-12
        return jnp.clip(
            jnp.where(ok, t0 / jnp.where(ok, denom, 1.0), 0.5), 0.0, 1.0
        )

    def slab_pass(ix, acc):
        x = ix.astype(jnp.float32)
        t = tsdf_ref[ix]  # (8, nz)
        w = w_ref[ix]
        obs = w > 0.0

        def wt(wa, wb):
            # Fusion-weight factor, capped at 8 frames of agreement.
            return jnp.minimum(jnp.minimum(wa, wb), 8.0) * 0.125

        # +z neighbor via lane rotate (wraparound masked by not_last_z).
        t_z = roll_next(t, 1)
        w_z = roll_next(w, 1)
        mz_ = (obs & (w_z > 0.0) & ((t < 0) != (t_z < 0))).astype(jnp.float32)
        mz_ = mz_ * not_last_z
        rows = crossing_rows(
            mz_, wt(w, w_z), jnp.zeros_like(t) + x, iy_f, zz + alpha(t, t_z)
        )

        # +y neighbor via sublane rotate.
        t_y = roll_next(t, 0)
        w_y = roll_next(w, 0)
        my_ = (obs & (w_y > 0.0) & ((t < 0) != (t_y < 0))).astype(jnp.float32)
        my_ = my_ * not_last_y
        rows = rows + crossing_rows(
            my_, wt(w, w_y), jnp.zeros_like(t) + x, iy_f + alpha(t, t_y), zz
        )

        # +x neighbor: clamped read of the next slab (last slab masked).
        ixn = jnp.minimum(ix + 1, 7)
        t_x = tsdf_ref[ixn]
        w_x = w_ref[ixn]
        mx_ = (obs & (w_x > 0.0) & ((t < 0) != (t_x < 0))).astype(jnp.float32)
        mx_ = mx_ * jnp.where(ix < 7, 1.0, 0.0)
        rows = rows + crossing_rows(
            mx_, wt(w, w_x), jnp.zeros_like(t) + x + alpha(t, t_x), iy_f, zz
        )

        # Orientation rows: centered sdf correlation over the band
        # (the LS gradient direction — only its SIGN is consumed).
        band = (obs & (jnp.abs(t) < 0.99)).astype(jnp.float32)
        grows = jnp.concatenate(
            [
                jnp.sum(band, axis=0, keepdims=True),  # G0
                jnp.sum(band * t, axis=0, keepdims=True),  # Gs
                jnp.sum(band * x, axis=0, keepdims=True),  # Gx
                jnp.sum(band * iy_f, axis=0, keepdims=True),  # Gy
                jnp.sum(band * zz, axis=0, keepdims=True),  # Gz
                jnp.sum(band * x * t, axis=0, keepdims=True),  # Gxs
                jnp.sum(band * iy_f * t, axis=0, keepdims=True),  # Gys
                jnp.sum(band * zz * t, axis=0, keepdims=True),  # Gzs
            ],
            axis=0,
        )

        all_rows = jnp.concatenate([rows, grows], axis=0)  # (19, nz)
        # seg is an exact 0/1 one-hot, but Mosaic's DEFAULT dot also
        # truncates the VALUE operand to bf16 (the res>=256 depth-bias
        # root cause, commit ffc3b25). Split the moment rows into an
        # exactly-bf16 hi part + residual stacked on the row axis: two
        # effective bf16 passes in one issue instead of HIGHEST's
        # 6-pass f32 emulation, with ~2^-17 relative moment error.
        r_hi = all_rows.astype(jnp.bfloat16).astype(jnp.float32)
        r_lo = all_rows - r_hi
        t2 = jax.lax.dot_general(
            jnp.concatenate([r_hi, r_lo], axis=0), seg,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (38, nsub)
        return acc + t2[:19] + t2[19:]

    acc = jax.lax.fori_loop(0, 8, slab_pass, jnp.zeros((19, nsub), jnp.float32))

    cnt = acc[10:11]  # raw crossing count (gates + reported field)
    n0 = jnp.maximum(acc[0:1], 1e-6)  # weighted normalizer for moments
    mx = acc[1:2] / n0
    my = acc[2:3] / n0
    mz = acc[3:4] / n0
    cxx = jnp.maximum(acc[4:5] / n0 - mx * mx, 0.0)
    cyy = jnp.maximum(acc[5:6] / n0 - my * my, 0.0)
    czz = jnp.maximum(acc[6:7] / n0 - mz * mz, 0.0)
    cxy = acc[7:8] / n0 - mx * my
    cxz = acc[8:9] / n0 - mx * mz
    cyz = acc[9:10] / n0 - my * mz

    # Ridge keeps the Cramer solves finite; it shifts all eigenvalues
    # equally, so the eigenvectors are untouched.
    ridge = RIDGE
    rxx = cxx + ridge
    ryy = cyy + ridge
    rzz = czz + ridge
    det = (
        rxx * (ryy * rzz - cyz * cyz)
        - cxy * (cxy * rzz - cyz * cxz)
        + cxz * (cxy * cyz - ryy * cxz)
    )
    safe_det = jnp.where(jnp.abs(det) > 1e-18, det, 1.0)

    def inv_iter(v):
        """One inverse power iteration: solve C_ridge u = v, normalize."""
        bx, by, bz = v
        ux = (
            bx * (ryy * rzz - cyz * cyz)
            - cxy * (by * rzz - cyz * bz)
            + cxz * (by * cyz - ryy * bz)
        ) / safe_det
        uy = (
            rxx * (by * rzz - bz * cyz)
            - bx * (cxy * rzz - cyz * cxz)
            + cxz * (cxy * bz - by * cxz)
        ) / safe_det
        uz = (
            rxx * (ryy * bz - by * cyz)
            - cxy * (cxy * bz - by * cxz)
            + bx * (cxy * cyz - ryy * cxz)
        ) / safe_det
        norm = jnp.sqrt(ux * ux + uy * uy + uz * uz)
        safe_n = jnp.maximum(norm, 1e-20)
        return (ux / safe_n, uy / safe_n, uz / safe_n), norm

    # Seed with the one-hot of the smallest covariance diagonal; three
    # iterations converge fast because a plane's eigen-gap is large
    # (in-plane spread >> sub-voxel crossing noise).
    seed_x = ((cxx <= cyy) & (cxx <= czz)).astype(jnp.float32)
    seed_z = ((czz < cxx) & (czz < cyy)).astype(jnp.float32)
    v, _ = inv_iter((seed_x, 1.0 - seed_x - seed_z, seed_z))
    v, _ = inv_iter(v)
    (nx_, ny_, nz_), growth = inv_iter(v)
    # growth ~ 1/(lambda_min + ridge): planes have near-zero lambda_min
    # (crossings are coplanar), corners/clutter do not.
    lam_min = jnp.maximum(1.0 / jnp.maximum(growth, 1e-6) - ridge, 0.0)
    ok_plane = lam_min < LAMBDA_MIN_MAX

    # Degeneracy check: a near-collinear crossing set also has tiny
    # lambda_min but provides no stable normal. Estimate the largest
    # eigenvalue with one power iteration from the dominant diagonal;
    # the middle one is trace - lam_max - lam_min.
    trace = cxx + cyy + czz
    px_ = ((cxx >= cyy) & (cxx >= czz)).astype(jnp.float32)
    pz_ = ((czz > cxx) & (czz > cyy)).astype(jnp.float32)
    py_ = 1.0 - px_ - pz_
    ux = cxx * px_ + cxy * py_ + cxz * pz_
    uy = cxy * px_ + cyy * py_ + cyz * pz_
    uz = cxz * px_ + cyz * py_ + czz * pz_
    un = jnp.maximum(jnp.sqrt(ux * ux + uy * uy + uz * uz), 1e-20)
    ux, uy, uz = ux / un, uy / un, uz / un
    lam_max = (
        ux * (cxx * ux + cxy * uy + cxz * uz)
        + uy * (cxy * ux + cyy * uy + cyz * uz)
        + uz * (cxz * ux + cyz * uy + czz * uz)
    )
    lam_mid = jnp.maximum(trace - lam_max - lam_min, 0.0)
    ok_spread = lam_mid > LAMBDA_MID_MIN

    # Orientation: flip so the normal points into free space (along the
    # sdf gradient, estimated from the centered band correlation).
    g0 = jnp.maximum(acc[11:12], 1.0)
    gs = acc[12:13] / g0
    gmx = acc[13:14] / g0
    gmy = acc[14:15] / g0
    gmz = acc[15:16] / g0
    gx_o = acc[16:17] / g0 - gmx * gs
    gy_o = acc[17:18] / g0 - gmy * gs
    gz_o = acc[18:19] / g0 - gmz * gs
    sign = jnp.where(nx_ * gx_o + ny_ * gy_o + nz_ * gz_o < 0, -1.0, 1.0)
    nx_ = nx_ * sign
    ny_ = ny_ * sign
    nz_ = nz_ * sign

    # World-frame plane through the crossing centroid.
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (1, nsub), 1).astype(jnp.float32)
    z_base = (k * (nsub * SUB_Z)) * jnp.float32(1.0)  # chunk z offset (voxels)
    wx = ox + (i * 8 + mx + 0.5) * vs
    wy = oy + (j * 8 + my + 0.5) * vs
    wz = oz + (z_base + sub_iota * SUB_Z + mz + 0.5) * vs
    d = nx_ * wx + ny_ * wy + nz_ * wz

    valid = (cnt >= min_count) & ok_plane & ok_spread
    vf = valid.astype(jnp.float32)
    # ``i`` is the GLOBAL X block index (mesh-sharded callers pass
    # local + slab offset) with the GLOBAL origin, so both the world
    # geometry and this ID are identical across shard layouts.
    sub_id = (((i * nbx + j) * nzc + k) * nsub).astype(jnp.float32) + sub_iota

    # In-plane extent bound for the raycast: a hit counts only within
    # this radius of the crossing CENTROID. A block plane otherwise
    # extends across its whole sub-block, and at object silhouettes that
    # extension juts into empty space with coherently wrong depth — a
    # few hundred such pixels, concentrated on the scene's weakest-
    # constrained pose direction, walked the ICP solve ~1mm/iteration
    # (measured). 1.8x the in-plane RMS radius covers a full flat block
    # (max reach = 1.73x RMS for a uniform square) while hugging partial
    # crossing sets tightly; +1.5 voxels of margin seals inter-block
    # seams.
    r_inplane = 1.8 * jnp.sqrt(jnp.maximum(trace - lam_min, 0.0))
    radius_w = (r_inplane + 1.5) * vs

    return jnp.concatenate(
        [
            nx_ * vf,
            ny_ * vf,
            nz_ * vf,
            d * vf,
            vf,
            cnt,
            sub_id,
            radius_w,
            wx,
            wy,
            wz,
            # Field 11 stays zero here: the streaming integrate overlays
            # its saturation flags on it (ops/tsdf_stream.py FIELD_SAT).
            jnp.zeros((1, nsub)),
            # Field 12: out-of-plane crossing variance lambda_min
            # (voxel^2) — the block's CURVATURE evidence. The raycast
            # shrinks a curved block's render support toward its
            # centroid so the secant-plane error stays bounded
            # (ops/raycast_tiles.py curvature trim); planar blocks
            # (lambda ~ 1e-8..1e-2) are untouched.
            lam_min,
            jnp.zeros((3, nsub)),
        ],
        axis=0,
    )  # (N_FIELDS, nsub)


CHUNK_Z = 128
NSUB_C = CHUNK_Z // SUB_Z  # sub-blocks per (8, 8, 128) chunk


def _kernel(params, tsdf_in, w_in, out_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    fields = plane_fields_for_block(
        tsdf_in, w_in, i, j,
        vs=params[0], ox=params[1], oy=params[2], oz=params[3],
        nbx=params[5], min_count=params[4],
        k=k, nzc=params[6].astype(jnp.int32),
    )
    out_ref[0, 0, 0, :, :] = fields


@partial(jax.jit, static_argnames=("interpret",))
def extract_subblock_planes(
    vol: TsdfVolume, min_count: float = 6.0, interpret: bool = False
) -> jnp.ndarray:
    """(nbx, nbx, nzc, N_FIELDS, NSUB_C) per-sub-block surface planes
    (module docstring), in the persistent chunk-major layout shared with
    the streaming integrate (ops/tsdf_stream.py)."""
    r = vol.resolution
    assert r % 8 == 0 and vol.tsdf.shape[2] % CHUNK_Z == 0

    nbx = r // 8
    nzc = vol.tsdf.shape[2] // CHUNK_Z
    params = jnp.concatenate(
        [
            vol.voxel_size.reshape(1),
            vol.origin.reshape(-1),
            jnp.array([min_count, float(nbx), float(nzc)], jnp.float32),
        ]
    )

    out = pl.pallas_call(
        _kernel,
        grid=(nbx, nbx, nzc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 8, CHUNK_Z), lambda i, j, k: (i, j, k)),
            pl.BlockSpec((8, 8, CHUNK_Z), lambda i, j, k: (i, j, k)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, N_FIELDS, NSUB_C), lambda i, j, k: (i, j, k, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (nbx, nbx, nzc, N_FIELDS, NSUB_C), jnp.float32
        ),
        interpret=interpret,
    )(params, vol.tsdf, vol.weight)
    return out
