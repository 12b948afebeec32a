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
(channel-major raw maps, kinfu/maps.py; the disagreeing-seam mask lives
in raycast_pallas.finalize_plane_maps and is shared).

Reference: replaces the per-ray TSDF marching of the external PCL
KinFu's CUDA raycast (ref README.md:14).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from housescan_tpu.kinfu.camera import Intrinsics
from housescan_tpu.kinfu.tsdf import TsdfVolume
from housescan_tpu.ops.planes_pallas import N_FIELDS, SUB_Z

# The three candidate budgets are overridable via env (perf A/B on
# hardware without code edits; defaults are the production values).
MAX_CT = int(os.environ.get("HOUSESCAN_RC_MAX_CT", "96"))
# candidates per (band, u-tile) at production image sizes; small test
# images have few tiles and would overflow constantly, so _max_ct()
# widens the per-tile budget as the tile count shrinks.
# Candidates processed per grid step inside the kernel — bounds kernel
# locals at (<=96, 8, 128) f32 so widened budgets can't overflow the
# 16 MB scoped-VMEM stack. Must divide both MAX_CT and the 384
# small-image budget: the largest divisor of MAX_CT that is <= 96.
CHUNK = max(
    d for d in range(1, min(96, MAX_CT) + 1) if MAX_CT % d == 0
)
N_PREP = 16  # prepared fields (10 used, padded to a sublane tile)
BIG = 1.0e9
MAX_PAIRS = int(os.environ.get("HOUSESCAN_RC_MAX_PAIRS", "16"))
# (band, utile) slots emitted per selected sub-block.
# Visible+valid sub-blocks kept per frame. A 640x480 view bounds the
# useful set: a sub-block projects to >= ~25 px^2 beyond 2 m, so ~2K
# blocks of overdraw cover the frustum; selection is nearest-first
# (lax.top_k breaks ties lower-index-first, per its documented
# contract), so overflow drops far geometry.
MAX_VISIBLE = int(os.environ.get("HOUSESCAN_RC_MAX_VISIBLE", "4096"))
# Curvature-cliff threshold (voxel^2 out-of-plane crossing variance
# above which a block renders as an occluder instead of its secant
# plane; see the CLIFF comment in build_tile_candidates). Env knob for
# quality A/B experiments.
CURV_CLIFF = float(os.environ.get("HOUSESCAN_CURV_CLIFF", "0.021"))
# Curvature-trim rendered-error tolerance (voxels; the TRIM comment in
# build_tile_candidates). 1e9 disables trimming.
CURV_TOL = float(os.environ.get("HOUSESCAN_CURV_TRIM_TOL", "0.25"))


def _max_ct(n_tiles: int) -> int:
    """Per-tile candidate budget: MAX_CT at production sizes (>=128
    tiles), widened for small test images so the visible set fits."""
    return MAX_CT if n_tiles >= 128 else max(384, MAX_CT)


def build_tile_candidates(
    planes: jnp.ndarray,  # (nbx, nbx, nzc, N_FIELDS, NSUB_C)
    pose: jnp.ndarray,
    intr: Intrinsics,
    vol: TsdfVolume,
    z_min: float = 0.3,
    block_x0=0,
):
    """Phase 1: (n_tiles, MAX_CT, N_PREP) prepared-candidate tensor.

    ``block_x0``: the slab's global X-block offset for mesh-sharded
    planes; sub-block centers use ``global_origin + (bi+block_x0)*8*vs``
    so the visibility culling is bit-identical to the single-chip run
    (``vol.origin`` is always the GLOBAL origin).

    Gather-lean redesign (the first version spent ~2 ms on an inner-dim
    planes transpose and ~1.8 ms on 3x65536-element compaction gathers;
    sorts themselves are CHEAP on this backend, large 1-D gathers are
    not):

      * No transpose: every plane field is read as a contiguous-ish
        slice ``planes[..., k, :]`` of the field-minor layout.
      * One ``lax.top_k`` over the negated distance-quantized keys of
        ALL nb sub-blocks selects the MAX_VISIBLE nearest visible+valid
        blocks (stable ascending selection at half the cost of a full
        (key, idx) sort). The selected rows' projected geometry is then
        RECOMPUTED from the indices — no 4096-row gathers; the only
        gathers left are the column-takes of the final candidate build.
      * Pairs carry a (tile, distance-bucket) composite key and are
        sorted in FULL with +inf sentinels — no pre-compaction, no cap,
        no gather. Per-tile MAX_CT truncation therefore drops
        farthest-first.
    """
    nbx_x, nbx_y = planes.shape[0], planes.shape[1]
    nsub = vol.dims[2] // SUB_Z
    nb = nbx_x * nbx_y * nsub
    n_bands = intr.height // 8
    n_ut = -(-intr.width // 128)
    n_tiles = n_bands * n_ut
    max_ct = _max_ct(n_tiles)

    def field(k):
        return planes[:, :, :, k, :].reshape(nb)

    # CURVATURE CLIFF: a block whose secant-plane bias would EXCEED the
    # ICP tight gate (max |deviation| ~ 3.46*sqrt(lambda_min) voxels >
    # 0.5 voxel, i.e. lambda_min > 0.021 voxel^2 — planes field 12) must
    # not render AT ALL: rendering it produces sub-gate one-signed depth
    # error that point-to-plane ICP integrates into drift (measured:
    # trimming alone made the 128^3 curved-world gt-vol tracking error
    # WORSE, 4.3 -> 8.1 mm mean, because the trimmed-but-rendered bias
    # dropped below the outlier gate). Such blocks fall through to the
    # occluder path below — the ray ends invalid, the honest answer.
    # Resolution-independent in voxel units: a 0.3 m sphere crosses the
    # cliff at 128^3 (lambda ~ 0.06) and renders fine at >= 256^3.
    valid = (field(4) > 0.5) & (field(12) <= CURV_CLIFF)
    # OCCLUDER blocks: real crossing evidence but no valid plane (mixed
    # two-surface blocks at object silhouettes, collinear slivers,
    # above-cliff curvature). A
    # ray entering one has surface there that the plane model cannot
    # represent; letting it continue to farther geometry paints a
    # coherent ONE-SIGNED +2..5 voxel depth error over the silhouette
    # band (measured: the dominant model-bias tail). Such rays must end
    # INVALID instead — the kernel tests them against the block's
    # crossing-set bounding sphere and, if that is the nearest event,
    # reports no model sample (matching what a TSDF marcher renders
    # there: no clean crossing).
    occl = (~valid) & (field(5) >= 3.0)
    usable = valid | occl
    nx_f, ny_f, nz_f = field(0), field(1), field(2)

    ids = jnp.arange(nb)
    bi = ids // (nbx_y * nsub)
    bj = (ids // nsub) % nbx_y
    bs = ids % nsub
    vs = vol.voxel_size
    cx_w = vol.origin[0] + ((bi + block_x0) * 8 + 4) * vs
    cy_w = vol.origin[1] + (bj * 8 + 4) * vs
    cz_w = vol.origin[2] + (bs * SUB_Z + SUB_Z // 2) * vs
    radius = vs * (float(32 + SUB_Z * SUB_Z // 4) ** 0.5 + 1.0)

    rot = pose[:3, :3]
    t = pose[3, :3]
    dx = cx_w - t[0]
    dy = cy_w - t[1]
    dz = cz_w - t[2]
    xc = dx * rot[0, 0] + dy * rot[0, 1] + dz * rot[0, 2]
    yc = dx * rot[1, 0] + dy * rot[1, 1] + dz * rot[1, 2]
    z = dx * rot[2, 0] + dy * rot[2, 1] + dz * rot[2, 2]
    in_front = z + radius > z_min
    facing = (nx_f * -dx + ny_f * -dy + nz_f * -dz) > -radius

    safe_z = jnp.maximum(z - radius, 0.05)
    u = intr.fx * xc / jnp.maximum(z, 1e-6) + intr.cx
    v = intr.fy * yc / jnp.maximum(z, 1e-6) + intr.cy
    pr_u = intr.fx * radius / safe_z
    pr_v = intr.fy * radius / safe_z
    u_overlap = (u + pr_u > 0) & (u - pr_u < intr.width)
    v_overlap = (v + pr_v > 0) & (v - pr_v < intr.height)
    # Occluders bypass the facing test (their fitted normal is exactly
    # what failed validation).
    keep = usable & in_front & (facing | occl) & u_overlap & v_overlap

    # Nearest-first selection of the visible set: one stable int sort
    # over all sub-blocks keyed by quantized camera distance (dropped
    # blocks get a +inf-class key) carrying the block index as payload.
    # The sorted KEYS themselves encode keep (key < sentinel) and the
    # 8-bit distance bucket, and the per-candidate projected geometry is
    # RECOMPUTED from the selected indices below — post-selection row
    # gathers cost ~0.09 ms each at 512^3 (~23 ns/element on this
    # backend; six of them were ~40% of phase 1) while the identical
    # elementwise recompute on 4096 rows is microseconds.
    db_all = jnp.clip(z * (255.0 / 20.0), 0.0, 255.0).astype(jnp.int32)
    sentinel = jnp.int32(1 << 24)
    sel_key = jnp.where(keep, db_all, sentinel)
    nv = min(MAX_VISIBLE, nb)
    # top_k of the negated key == stable ascending selection (lax.top_k
    # breaks ties lower-index-first, exactly like the stable sort it
    # replaces) at half the cost: 0.40 ms vs 0.75 ms for a full
    # (key, idx) sort at 262K sub-blocks (scripts/profile_phase1_ops.py).
    neg_keys, sel = jax.lax.top_k(-sel_key, nv)
    skeys = -neg_keys
    keep_s = skeys < sentinel
    db = jnp.where(keep_s, skeys, 255)

    # Projected geometry of the selected rows, recomputed (no gathers);
    # the expressions match the full-array pass bit for bit.
    bi_s = sel // (nbx_y * nsub)
    bj_s = (sel // nsub) % nbx_y
    bs_s = sel % nsub
    dx_s = vol.origin[0] + ((bi_s + block_x0) * 8 + 4) * vs - t[0]
    dy_s = vol.origin[1] + (bj_s * 8 + 4) * vs - t[1]
    dz_s = vol.origin[2] + (bs_s * SUB_Z + SUB_Z // 2) * vs - t[2]
    xc_s = dx_s * rot[0, 0] + dy_s * rot[0, 1] + dz_s * rot[0, 2]
    yc_s = dx_s * rot[1, 0] + dy_s * rot[1, 1] + dz_s * rot[1, 2]
    z_s = dx_s * rot[2, 0] + dy_s * rot[2, 1] + dz_s * rot[2, 2]
    safe_z_s = jnp.maximum(z_s - radius, 0.05)
    u_s = intr.fx * xc_s / jnp.maximum(z_s, 1e-6) + intr.cx
    v_s = intr.fy * yc_s / jnp.maximum(z_s, 1e-6) + intr.cy
    pru_s = intr.fx * radius / safe_z_s
    prv_s = intr.fy * radius / safe_z_s
    b0_s = jnp.clip(jnp.floor((v_s - prv_s) / 8.0), 0, n_bands - 1).astype(jnp.int32)
    b1_s = jnp.clip(jnp.ceil((v_s + prv_s) / 8.0), 0, n_bands - 1).astype(jnp.int32)
    t0_s = jnp.clip(jnp.floor((u_s - pru_s) / 128.0), 0, n_ut - 1).astype(jnp.int32)
    t1_s = jnp.clip(jnp.ceil((u_s + pru_s) / 128.0), 0, n_ut - 1).astype(jnp.int32)

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
    pair_tile2 = jnp.where(
        pair_ok,
        (b0_s[:, None] + kb) * n_ut + (t0_s[:, None] + kt),
        n_tiles,  # sentinel: counts exclude it, sorts last
    )
    # Composite key: tile-major, then 8-bit quantized distance, so a
    # tile's candidates come out nearest-first and MAX_CT overflow
    # drops the farthest.
    pair_key = (pair_tile2 * 256 + db[:, None]).reshape(-1)
    pair_idx = jnp.broadcast_to(
        jnp.arange(nv, dtype=jnp.int32)[:, None], (nv, MAX_PAIRS)
    ).reshape(-1)
    sorted_keys, sorted_idx = jax.lax.sort(
        (pair_key, pair_idx), num_keys=1
    )
    # Per-tile starts/counts straight off the sorted composite keys:
    # tile t's pairs occupy keys [t*256, (t+1)*256), so n_tiles+1
    # binary searches replace the (n_pairs, n_tiles) one-hot count
    # (0.19 ms vs 0.38 ms at 65K pairs x 300 tiles, same values).
    start_all = jnp.searchsorted(
        sorted_keys, jnp.arange(n_tiles + 1, dtype=jnp.int32) * 256
    )
    start = start_all[:-1]
    counts = start_all[1:] - start_all[:-1]
    slot = start[:, None] + jnp.arange(max_ct)[None, :]
    slot_c = jnp.clip(slot, 0, sorted_keys.shape[0] - 1)
    slot_ok = jnp.arange(max_ct)[None, :] < counts[:, None]
    # Compact (0..nv) candidate indices. Column-take instead of a row
    # gather: per-index cost is ~3x lower on this backend (0.25 ms for
    # 28800 indices x 11 rows vs 0.40 ms for 28800 x 1 row-gathered).
    slot_idx = jnp.take(sorted_idx[None, :], slot_c.reshape(-1), axis=1)[0]

    # Prepared per-candidate constants for the SELECTED rows only,
    # FIELD-MAJOR (column take is ~3x faster than row gathers here).
    # Stacking contiguous field slices then taking 4096 columns beats
    # both the old full transpose and per-field 1-D gathers.
    stacked = jnp.stack(
        [nx_f, ny_f, nz_f, field(3), field(8), field(9), field(10),
         field(7), field(6), occl.astype(jnp.float32), field(12)],
        axis=0,
    )  # (11, nb)
    sel_f = jnp.take(stacked, sel, axis=1)  # (11, nv)
    s_nx, s_ny, s_nz = sel_f[0], sel_f[1], sel_f[2]
    f_num = sel_f[3] - (s_nx * t[0] + s_ny * t[1] + s_nz * t[2])
    # CURVATURE TRIM: a curved block's fitted plane is a secant whose
    # depth error grows ~quadratically with in-plane distance from the
    # crossing centroid — max deviation across the full support is
    # ~3.46*sqrt(lambda_min) voxels (uniform-disk spherical-cap model;
    # lambda_min is the out-of-plane crossing variance, planes field
    # 11). Shrink the render support so the rendered error stays under
    # CURV_TOL voxels: error(rho) ~ (rho/r)^2 * 3.46 sqrt(lam), so
    # shrink^2 = tol / (3.46 sqrt(lam)), clamped to [0.35^2, 1]. Planar
    # blocks (lam ~ 1e-8..1e-2 voxel^2) keep shrink = 1 exactly; sphere
    # limb blocks — whose plane otherwise skirts past the silhouette
    # and catches background rays metres wrong — shrink hardest.
    # Measured (128^3 curved world, scripts/model_error_probe.py):
    # mean signed error -18.6 -> +1.0 mm, median |e| 0.78 -> 0.12 mm,
    # p90 |e| 57 -> 14 mm, at 19.5 -> 15.4% coverage (the shrink is
    # honest invalidity, the round-2 lesson).
    sag = 3.46 * jnp.sqrt(jnp.maximum(sel_f[10], 0.0))
    shrink2 = jnp.where(
        sel_f[9] > 0.5,  # occluders keep their full crossing sphere
        1.0,
        jnp.clip(CURV_TOL / jnp.maximum(sag, 1e-9), 0.1225, 1.0),
    )
    prep_t = jnp.stack(
        [
            s_nx,
            s_ny,
            s_nz,
            f_num,
            sel_f[4] - t[0],  # centroid - camera origin
            sel_f[5] - t[1],
            sel_f[6] - t[2],
            sel_f[7] * sel_f[7] * shrink2,  # curvature-trimmed support r^2
            sel_f[8],  # sub-block id (seam masking)
            keep_s.astype(jnp.float32),  # ok
            sel_f[9],  # occluder flag (sphere-test, invalidates rays)
        ],
        axis=0,
    )  # (11, nv)

    cand_t = jnp.take(prep_t, slot_idx.reshape(-1), axis=1)  # (10, n_tiles*max_ct)
    cand = jnp.transpose(
        cand_t.reshape(prep_t.shape[0], n_tiles, max_ct), (1, 2, 0)
    )
    cand = jnp.pad(cand, ((0, 0), (0, 0), (0, N_PREP - prep_t.shape[0])))
    cand = jnp.where(slot_ok[..., None], cand, 0.0)
    return cand


def _kernel(params, cand, out):
    """One (9, 8, 128) output block per tile: rows = [depth, vx, vy, vz,
    nx, ny, nz, bid, occluder-event t] (the channel-major RAW-map
    layout; finalize_plane_maps consumes row 8 and drops it).
    One packed buffer instead of eight: Pallas pipeline bookkeeping is
    ~0.36us per buffer per active step (PERFORMANCE.md), so 8 -> 1
    output buffers saves ~0.75 ms/frame across the ~300-tile grid.

    The candidate axis is CHUNKED THROUGH THE GRID (inner dim, CHUNK=96
    per step): kernel locals are (CHUNK, 8, 128) regardless of the
    per-tile budget, so the widened 384-candidate budget of small test
    images no longer blows the 16 MB scoped-VMEM stack (measured 23.8 MB
    at 320x240/512^3 when fully vectorized). The output block's index is
    constant across chunks, so it stays resident in VMEM and carries the
    running (t, bid, normal, occluder) accumulators between steps; the
    merge is the same min-t / max-bid-on-tie reduction the global
    version computed, applied hierarchically (associative, bit-exact)."""
    g = pl.program_id(0)
    k = pl.program_id(1)
    nk = pl.num_programs(1)

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

    c = cand[0]  # (max_ct, N_PREP)
    mct = c.shape[0]

    def col(f):
        return c[:, f : f + 1].reshape(mct, 1, 1)

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
    occf = col(10)

    den = nx * dwx + ny * dwy + nz * dwz  # (max_ct, 8, 128)
    safe = jnp.where(jnp.abs(den) > 1e-9, den, -1e-9)
    tq = fnum / safe
    qx = tq * dwx - rx
    qy = tq * dwy - ry
    qz = tq * dwz - rz
    dist2 = qx * qx + qy * qy + qz * qz
    hit = (
        (ok > 0.5)
        & (occf < 0.5)
        & (den < 0.0)  # normal (toward free space) faces the ray
        & (dist2 <= rad2)
        & (tq > z_min)
    )
    tt = jnp.where(hit, tq, BIG)
    best_t = jnp.min(tt, axis=0, keepdims=True)  # (1, 8, 128)

    # OCCLUDER candidates (build_tile_candidates: crossing evidence, no
    # valid plane): ray-sphere closest-approach against the crossing-set
    # support sphere. If such a block is the ray's nearest event, there
    # IS surface there that the plane model can't represent — the pixel
    # must come out INVALID rather than painting the geometry behind it
    # (a one-signed +2..5 voxel silhouette bias, measured). The
    # SUPPRESSION DECISION is deferred to finalize_plane_maps: this
    # kernel only reports the nearest occluder event time (raw row 8),
    # so the mesh-sharded raycast can pmin-combine occluder events
    # across slabs before deciding — an occluder in one slab must beat
    # a surface hit from another (bit-exact single-chip parity).
    d2 = dwx * dwx + dwy * dwy + dwz * dwz
    ts = (rx * dwx + ry * dwy + rz * dwz) / d2
    ox_ = ts * dwx - rx
    oy_ = ts * dwy - ry
    oz_ = ts * dwz - rz
    miss2 = ox_ * ox_ + oy_ * oy_ + oz_ * oz_
    hit_o = (ok > 0.5) & (occf > 0.5) & (miss2 <= rad2) & (ts > z_min)
    o_c = jnp.min(jnp.where(hit_o, ts, BIG), axis=0, keepdims=True)
    # Tie-break by block id so a pixel's fields all come from ONE
    # candidate (coplanar neighboring sub-blocks can tie in t exactly).
    win = hit & (tt <= best_t)
    bid_c = jnp.max(jnp.where(win, bid, -1.0), axis=0, keepdims=True)
    sel = win & (bid == bid_c)
    nx_c = jnp.max(jnp.where(sel, nx, -BIG), axis=0, keepdims=True)
    ny_c = jnp.max(jnp.where(sel, ny, -BIG), axis=0, keepdims=True)
    nz_c = jnp.max(jnp.where(sel, nz, -BIG), axis=0, keepdims=True)

    # Merge this chunk's winner with the carry parked in the resident
    # output block (rows 0/4/5/6/7/8 hold raw accumulators until the
    # last chunk finalizes). k==0 forces the chunk so first-visit
    # garbage in the window (incl. NaNs, which compare False) is inert.
    first = k == 0
    acc_t = out[0].reshape(1, 8, 128)
    acc_bid = out[7].reshape(1, 8, 128)
    take = first | (best_t < acc_t) | ((best_t == acc_t) & (bid_c > acc_bid))
    best_t = jnp.where(take, best_t, acc_t)
    bbid = jnp.where(take, bid_c, acc_bid)
    bnx = jnp.where(take, nx_c, out[4].reshape(1, 8, 128))
    bny = jnp.where(take, ny_c, out[5].reshape(1, 8, 128))
    bnz = jnp.where(take, nz_c, out[6].reshape(1, 8, 128))
    best_o = jnp.where(first, o_c, jnp.minimum(o_c, out[8].reshape(1, 8, 128)))

    @pl.when(k < nk - 1)
    def _park():
        out[0] = best_t[0]
        out[4] = bnx[0]
        out[5] = bny[0]
        out[6] = bnz[0]
        out[7] = bbid[0]
        out[8] = best_o[0]

    @pl.when(k == nk - 1)
    def _finalize():
        got = best_t < BIG
        tq1 = jnp.where(got, best_t, 0.0)[0]
        out[0] = tq1
        out[1] = jnp.where(got[0], tx + tq1 * dwx[0], 0.0)
        out[2] = jnp.where(got[0], ty + tq1 * dwy[0], 0.0)
        out[3] = jnp.where(got[0], tz + tq1 * dwz[0], 0.0)
        out[4] = jnp.where(got[0], bnx[0], 0.0)
        out[5] = jnp.where(got[0], bny[0], 0.0)
        out[6] = jnp.where(got[0], bnz[0], 0.0)
        out[7] = jnp.where(got[0], bbid[0], -1.0)
        out[8] = best_o[0]  # nearest occluder event (BIG = none)


def raycast_tiles_maps(
    planes: jnp.ndarray,
    pose: jnp.ndarray,
    intr: Intrinsics,
    vol: TsdfVolume,
    z_min: float = 0.3,
    interpret: bool = False,
    block_x0=0,
):
    """Raw model maps before seam masking, ONE channel-major (9, H, W)
    array: rows [depth, vx, vy, vz, nx, ny, nz, bid, occluder-event t]
    (bid feeds raycast_pallas.finalize_plane_maps' seam mask; row 8 is
    the nearest gate-failed-block event, BIG = none, which finalize
    turns into invalidation AFTER any cross-slab combine). Width is
    processed in 128-pixel tiles (padded, cropped)."""
    n_bands = intr.height // 8
    n_ut = -(-intr.width // 128)
    w_pad = n_ut * 128

    cand = build_tile_candidates(
        planes, pose, intr, vol, z_min=z_min, block_x0=block_x0
    )

    rot = pose[:3, :3]
    t = pose[3, :3]
    params = jnp.concatenate(
        [
            rot.reshape(-1),
            t.reshape(-1),
            jnp.array(
                [intr.fx, intr.fy, intr.cx, intr.cy, z_min, n_ut], jnp.float32
            ),
            jnp.asarray(vol.voxel_size, jnp.float32).reshape(1),
            jnp.zeros((13,), jnp.float32),
        ]
    ).astype(jnp.float32)

    # Candidate axis chunked through the inner grid dim (see _kernel):
    # the output block index ignores k, so the block stays VMEM-resident
    # across a tile's chunks and carries the reduction accumulators.
    assert cand.shape[1] % CHUNK == 0, cand.shape
    nk = cand.shape[1] // CHUNK
    out = pl.pallas_call(
        _kernel,
        grid=(n_bands * n_ut, nk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, CHUNK, N_PREP), lambda g, k: (g, k, 0)),
        ],
        out_specs=pl.BlockSpec(
            (9, 8, 128),
            lambda g, k, n_ut=n_ut: (0, g // n_ut, g % n_ut),
        ),
        out_shape=jax.ShapeDtypeStruct((9, intr.height, w_pad), jnp.float32),
        interpret=interpret,
    )(params, cand)

    return out[:, :, : intr.width]
