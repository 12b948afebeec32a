"""Tile-grouped plane raycast: candidate-vectorized, no scalar loops.

Successor of ops/raycast_pallas.py's band kernel. That kernel looped
over a band's candidates on the scalar core, broadcasting each
candidate's fields via one-hot reductions and intersecting it with all
8 x 640 rays of the band — ~5ms/frame at 512^3, dominated by per-
candidate work proportional to the full band width.

This version restructures both phases:

  * Phase 1 (XLA) assigns each valid sub-block plane to the
    (8-pixel band) x (128-pixel u-tile) ray tiles its bounding sphere
    can touch, and PREPARES per-candidate intersection constants
    (normal, numerator d - n.origin, centroid-origin offset, support
    radius^2, block id) so the kernel does no per-candidate setup.
  * Phase 2 (Pallas, grid = band x u-tile) intersects ALL of a tile's
    candidates with its 8 x 128 rays as pure (MAX_CT, 8, 128) vector
    ops — ray-plane t, in-support test, front-facing test — then
    min-reduces over the candidate dimension for the nearest hit and
    recovers the winner's fields with masked max-reduces. No fori, no
    one-hot broadcasts; every op runs at full VPU occupancy, and each
    candidate only ever touches the 128-pixel tile it overlaps.

Output and seam-masking semantics are identical to the band kernel
(same PlaneRaycastResult contract; the disagreeing-seam mask lives in
raycast_pallas.finalize_model and is shared).

Reference: replaces the per-ray TSDF marching of the external PCL
KinFu's CUDA raycast (ref README.md:14).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from housescan_tpu.kinfu.camera import Intrinsics
from housescan_tpu.kinfu.tsdf import TsdfVolume
from housescan_tpu.ops.planes_pallas import N_FIELDS, SUB_Z

MAX_CT = 96  # candidates per (band, u-tile); overflow is dropped
N_PREP = 16  # prepared fields (10 used, padded to a sublane tile)
BIG = 1.0e9
MAX_PAIRS = 16  # (band, utile) slots emitted per selected sub-block
MAX_REAL_PAIRS = 65536  # pair-sort capacity after compaction


def build_tile_candidates(
    planes: jnp.ndarray,  # (nbx, nbx, nzc, N_FIELDS, NSUB_C)
    pose: jnp.ndarray,
    intr: Intrinsics,
    vol: TsdfVolume,
    z_min: float = 0.3,
):
    """Phase 1: (n_tiles, MAX_CT, N_PREP) prepared-candidate tensor."""
    nbx = planes.shape[0]
    nsub = vol.tsdf.shape[2] // SUB_Z
    nb = nbx * nbx * nsub
    n_bands = intr.height // 8
    n_ut = -(-intr.width // 128)
    n_tiles = n_bands * n_ut

    p = jnp.transpose(planes, (0, 1, 2, 4, 3)).reshape(nb, N_FIELDS)
    valid = p[:, 4] > 0.5

    ids = jnp.arange(nb)
    bi = ids // (nbx * nsub)
    bj = (ids // nsub) % nbx
    bs = ids % nsub
    vs = vol.voxel_size
    centers = jnp.stack(
        [
            vol.origin[0] + (bi * 8 + 4) * vs,
            vol.origin[1] + (bj * 8 + 4) * vs,
            vol.origin[2] + (bs * SUB_Z + SUB_Z // 2) * vs,
        ],
        axis=1,
    )
    radius = vs * (float(32 + SUB_Z * SUB_Z // 4) ** 0.5 + 1.0)

    rot = pose[:3, :3]
    t = pose[3, :3]
    cam = (centers - t) @ rot.T
    z = cam[:, 2]
    in_front = z + radius > z_min

    n_w = p[:, 0:3]
    facing = jnp.sum(n_w * (t - centers), axis=1) > -radius

    safe_z = jnp.maximum(z - radius, 0.05)
    u = intr.fx * cam[:, 0] / jnp.maximum(z, 1e-6) + intr.cx
    v = intr.fy * cam[:, 1] / jnp.maximum(z, 1e-6) + intr.cy
    pr_u = intr.fx * radius / safe_z
    pr_v = intr.fy * radius / safe_z
    u_overlap = (u + pr_u > 0) & (u - pr_u < intr.width)
    v_overlap = (v + pr_v > 0) & (v - pr_v < intr.height)
    keep = valid & in_front & facing & u_overlap & v_overlap

    # Band and u-tile ranges the bounding sphere touches.
    b0 = jnp.clip(jnp.floor((v - pr_v) / 8.0), 0, n_bands - 1).astype(jnp.int32)
    b1 = jnp.clip(jnp.ceil((v + pr_v) / 8.0), 0, n_bands - 1).astype(jnp.int32)
    t0 = jnp.clip(jnp.floor((u - pr_u) / 128.0), 0, n_ut - 1).astype(jnp.int32)
    t1 = jnp.clip(jnp.ceil((u + pr_u) / 128.0), 0, n_ut - 1).astype(jnp.int32)

    # Compact candidates in two stages: a CHUNK-level prefilter (a 16x
    # smaller bool argsort — chunks with no valid plane are the vast
    # majority) followed by sub-block compaction within the selected
    # chunks. Keeps the pair sort at nv * MAX_PAIRS keys.
    n_chunks = nb // 16
    chunk_valid = jnp.max(planes[:, :, :, 4, :], axis=-1).reshape(-1) > 0.5
    nc = min(4096, n_chunks)
    chunk_sel = jnp.argsort(~chunk_valid)[:nc]
    sub_ids = (chunk_sel[:, None] * 16 + jnp.arange(16)[None, :]).reshape(-1)
    keep_c = keep[sub_ids]
    nv = min(16384, sub_ids.shape[0])
    sel_order = jnp.argsort(~keep_c)[:nv]
    sel = sub_ids[sel_order]
    keep_s = keep_c[sel_order]
    b0_s, b1_s = b0[sel], b1[sel]
    t0_s, t1_s = t0[sel], t1[sel]

    # Emit up to MAX_PAIRS (band, utile) pairs per block over a
    # center-clipped (bspan x tspan) grid.
    tspan_full = t1_s - t0_s + 1
    tspan = jnp.minimum(tspan_full, 4)
    shift_t = jnp.where(tspan_full > tspan, (tspan_full - tspan) // 2, 0)
    t0_s = t0_s + shift_t
    b_allow = jnp.maximum(MAX_PAIRS // jnp.maximum(tspan, 1), 1)
    bspan_full = b1_s - b0_s + 1
    bspan = jnp.minimum(bspan_full, b_allow)
    shift_b = jnp.where(bspan_full > bspan, (bspan_full - bspan) // 2, 0)
    b0_s = b0_s + shift_b

    k = jnp.arange(MAX_PAIRS)
    kb = k[None, :] // tspan[:, None]
    kt = k[None, :] % jnp.maximum(tspan[:, None], 1)
    pair_ok = keep_s[:, None] & (kb < bspan[:, None])
    pair_tile = jnp.where(
        pair_ok,
        (b0_s[:, None] + kb) * n_ut + (t0_s[:, None] + kt),
        n_tiles,  # sentinel: sorts last
    ).reshape(-1)
    pair_block = jnp.broadcast_to(sel[:, None], (nv, MAX_PAIRS)).reshape(-1)
    # Per-tile truncation at MAX_CT must drop FARTHEST-first: fold an
    # 8-bit quantized camera distance into the sort key (tile-major,
    # then distance), so a candidate-dense tile keeps its nearest
    # surfaces instead of an arbitrary block-id prefix.
    db = jnp.clip(z[sel] * (255.0 / 20.0), 0.0, 255.0).astype(jnp.int32)
    pair_key = pair_tile * 256 + jnp.broadcast_to(
        db[:, None], (nv, MAX_PAIRS)
    ).reshape(-1)

    # Compact the real pairs first (a bool argsort is ~4x cheaper than
    # an int sort at this size), then sort ONLY those, carrying the
    # payload (cheaper on TPU than argsort + gather). Per-tile starts
    # come from a histogram instead of searchsorted (XLA lowers
    # searchsorted over n_pairs keys to an n_tiles x n_pairs
    # broadcast-compare). NOTE: pairs beyond MAX_REAL_PAIRS (65536) are
    # dropped in emission order, not by distance — reaching that cap
    # needs >4096 camera-facing sub-block planes visible at once
    # (tests/test_pallas_ops.py bounds a dense scene at ~25% of it).
    is_real = pair_tile < n_tiles
    cap = min(MAX_REAL_PAIRS, pair_tile.shape[0])
    first_real = jnp.argsort(~is_real)[:cap]
    pair_tile = pair_tile[first_real]
    pair_key = pair_key[first_real]
    pair_block = pair_block[first_real]
    sorted_keys, sorted_blocks = jax.lax.sort(
        (pair_key, pair_block.astype(jnp.int32)), num_keys=1
    )
    counts = jnp.sum(
        pair_tile[:, None] == jnp.arange(n_tiles)[None, :], axis=0
    )
    start = jnp.concatenate(
        [jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)[:-1]]
    )
    slot = start[:, None] + jnp.arange(MAX_CT)[None, :]
    slot_c = jnp.clip(slot, 0, sorted_keys.shape[0] - 1)
    slot_ok = jnp.arange(MAX_CT)[None, :] < counts[:, None]
    slot_block = sorted_blocks[slot_c]

    # Prepared per-candidate constants, FIELD-MAJOR: gathering columns
    # (take axis=1) is ~3x faster than gathering rows on this backend.
    f_num = p[:, 3] - (n_w[:, 0] * t[0] + n_w[:, 1] * t[1] + n_w[:, 2] * t[2])
    prep_t = jnp.stack(
        [
            n_w[:, 0],
            n_w[:, 1],
            n_w[:, 2],
            f_num,
            p[:, 8] - t[0],  # centroid - camera origin
            p[:, 9] - t[1],
            p[:, 10] - t[2],
            p[:, 7] * p[:, 7],  # support radius^2
            p[:, 6],  # sub-block id (seam masking)
            jnp.ones_like(f_num),  # ok
        ],
        axis=0,
    )  # (10, nb)

    cand_t = jnp.take(prep_t, slot_block.reshape(-1), axis=1)  # (10, n_tiles*MAX_CT)
    cand = jnp.transpose(
        cand_t.reshape(prep_t.shape[0], n_tiles, MAX_CT), (1, 2, 0)
    )
    cand = jnp.pad(cand, ((0, 0), (0, 0), (0, N_PREP - prep_t.shape[0])))
    cand = jnp.where(slot_ok[..., None], cand, 0.0)
    return cand


def _kernel(params, cand, d_out, vx, vy, vz, nxo, nyo, nzo, bido):
    g = pl.program_id(0)

    r00, r01, r02 = params[0], params[1], params[2]
    r10, r11, r12 = params[3], params[4], params[5]
    r20, r21, r22 = params[6], params[7], params[8]
    tx, ty, tz = params[9], params[10], params[11]
    fx, fy, cx, cy = params[12], params[13], params[14], params[15]
    z_min = params[16]
    n_ut = params[17].astype(jnp.int32)

    b = g // n_ut
    ut = g % n_ut

    rows = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 1).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 2).astype(jnp.float32)
    u_pix = (ut * 128).astype(jnp.float32) + cols
    v_pix = (b * 8).astype(jnp.float32) + rows
    dcx = (u_pix - cx) / fx
    dcy = (v_pix - cy) / fy
    dwx = dcx * r00 + dcy * r10 + r20  # (1, 8, 128) world ray dirs
    dwy = dcx * r01 + dcy * r11 + r21
    dwz = dcx * r02 + dcy * r12 + r22

    c = cand[0]  # (MAX_CT, N_PREP)

    def col(f):
        return c[:, f : f + 1].reshape(MAX_CT, 1, 1)

    nx = col(0)
    ny = col(1)
    nz = col(2)
    fnum = col(3)
    rx = col(4)
    ry = col(5)
    rz = col(6)
    rad2 = col(7)
    bid = col(8)
    ok = col(9)

    den = nx * dwx + ny * dwy + nz * dwz  # (MAX_CT, 8, 128)
    safe = jnp.where(jnp.abs(den) > 1e-9, den, -1e-9)
    tq = fnum / safe
    qx = tq * dwx - rx
    qy = tq * dwy - ry
    qz = tq * dwz - rz
    dist2 = qx * qx + qy * qy + qz * qz
    hit = (
        (ok > 0.5)
        & (den < 0.0)  # normal (toward free space) faces the ray
        & (dist2 <= rad2)
        & (tq > z_min)
    )
    tt = jnp.where(hit, tq, BIG)
    best_t = jnp.min(tt, axis=0, keepdims=True)  # (1, 8, 128)
    got = best_t < BIG
    # Tie-break by block id so a pixel's fields all come from ONE
    # candidate (coplanar neighboring sub-blocks can tie in t exactly).
    win = hit & (tt <= best_t)
    bbid = jnp.max(jnp.where(win, bid, -1.0), axis=0, keepdims=True)
    sel = win & (bid == bbid)
    bnx = jnp.max(jnp.where(sel, nx, -BIG), axis=0, keepdims=True)
    bny = jnp.max(jnp.where(sel, ny, -BIG), axis=0, keepdims=True)
    bnz = jnp.max(jnp.where(sel, nz, -BIG), axis=0, keepdims=True)

    tq1 = jnp.where(got, best_t, 0.0)[0]
    d_out[...] = tq1
    vx[...] = jnp.where(got[0], tx + tq1 * dwx[0], 0.0)
    vy[...] = jnp.where(got[0], ty + tq1 * dwy[0], 0.0)
    vz[...] = jnp.where(got[0], tz + tq1 * dwz[0], 0.0)
    nxo[...] = jnp.where(got[0], bnx[0], 0.0)
    nyo[...] = jnp.where(got[0], bny[0], 0.0)
    nzo[...] = jnp.where(got[0], bnz[0], 0.0)
    bido[...] = jnp.where(got[0], bbid[0], -1.0)


def raycast_tiles_maps(
    planes: jnp.ndarray,
    pose: jnp.ndarray,
    intr: Intrinsics,
    vol: TsdfVolume,
    z_min: float = 0.3,
    interpret: bool = False,
):
    """Raw model maps (depth, vertices, normals, block ids) before seam
    masking. Width is processed in 128-pixel tiles (padded, cropped)."""
    n_bands = intr.height // 8
    n_ut = -(-intr.width // 128)
    w_pad = n_ut * 128

    cand = build_tile_candidates(planes, pose, intr, vol, z_min=z_min)

    rot = pose[:3, :3]
    t = pose[3, :3]
    params = jnp.concatenate(
        [
            rot.reshape(-1),
            t.reshape(-1),
            jnp.array(
                [intr.fx, intr.fy, intr.cx, intr.cy, z_min, n_ut], jnp.float32
            ),
            jnp.zeros((14,), jnp.float32),
        ]
    ).astype(jnp.float32)

    shape2d = jax.ShapeDtypeStruct((intr.height, w_pad), jnp.float32)
    outs = pl.pallas_call(
        _kernel,
        grid=(n_bands * n_ut,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, MAX_CT, N_PREP), lambda g: (g, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(
                (8, 128),
                lambda g, n_ut=n_ut: (g // n_ut, g % n_ut),
            )
        ]
        * 8,
        out_shape=[shape2d] * 8,
        interpret=interpret,
    )(params, cand)

    return tuple(o[:, : intr.width] for o in outs)
