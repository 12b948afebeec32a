"""XLA chunk-classification prepass for the streaming TSDF integrate.

The dense Pallas integrate (ops/tsdf_pallas.py) spends ~45% of its time
classifying (8, 8, 128) chunks *inside* the kernel — per-voxel bounding
boxes for all 16K chunks of a 512^3 volume, even the ~69% that are out of
the frustum or behind the fused surface (measured: scripts/chunk_census).
This module moves classification into a vectorized XLA prepass that never
touches the volume:

  * Each chunk's 8 corners are projected; their image-space bbox is a
    conservative superset of the chunk's per-voxel footprint (convexity).
  * Footprint depth min/max come from a 3x3-DILATED min/max mip pyramid
    over the depth image (HiZ-style): each chunk reads ONE cell at the
    level whose cell size >= its bbox span, so the 3x3 dilation footprint
    is guaranteed to cover the bbox. One small gather per field.
  * Chunks classify as SKIP (out of frustum / fully behind the surface /
    projecting only to invalid depth), FREE (confidently in front of all
    valid depth: the tsdf -> +1 update needs no depth values), or BAND
    (needs exact depth). All tests err toward BAND — misclassification
    can only cost speed, never correctness.
  * Non-SKIP chunks are compacted into a WORK LIST of packed int32
    descriptors (coords + class + depth-window level/origin), padded by
    repeating the last entry so the Pallas pipeline elides the padded
    steps' DMAs (consecutive identical block indices).

Work-list entries are (2, 8, 8, 256) SUPERCHUNKS — two z-adjacent
chunks per entry, halving the per-step Pallas buffer bookkeeping — with
block coordinates in the side arrays ``bi``/``bj``/``bk`` (bk in
256-voxel units) and one packed int32 of two 13-bit HALF descriptors:
  bits [0:2)   cls     0=FREE 1=BAND 2=NOOP (copy only) 3=REFINE
  bits [2:4)   level   depth-mip level for the band window
  bits [4:10)  v08     window row origin / 8
  bits [10:14) u064    window col origin / 64
(low half = even chunk, bits [14:28) = odd chunk). Volumes whose z
extent is a single chunk (nzc odd, e.g. 128^3) fall back to one-chunk
entries with a NOOP high half.

Reference: the external KinFu's CUDA integrate visits every voxel every
frame (ref README.md:14); the selective pass is the TPU redesign that
makes integrate HBM-light (see SURVEY.md section 7 'hard parts' (a)).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from housescan_tpu.kinfu.camera import Intrinsics

BIG = 1.0e9
# Entry-grouping cap (HOUSESCAN_SUPER_X=2 enables x-paired entries);
# must be read by BOTH this module and ops/tsdf_stream so the worklist
# and the kernel agree. DEFAULT 1 — a measured NEGATIVE result: 95.8%
# of the steady-state 512^3 main list's entries have their x-sibling
# listed (the pairing census), and pairing is certified bit-exact, but
# the (16, 8, 256) paired blocks HALVED hardware throughput (36.6 vs
# 74.9 fps, 3-pass A/B) — the wider block's DMA/codegen costs swamp
# the ~2.5us/entry step-floor saving. Kept as a knob because the
# mechanism (4 half-descriptors per entry) is shared with super_z and
# the census machinery documents the why.
SUPER_X_CAP = int(
    __import__("os").environ.get("HOUSESCAN_SUPER_X", "1")
)

CLS_FREE = 0
CLS_BAND = 1
CLS_NOOP = 2
# BAND whose footprint the prepass cannot bound tightly (a quarter
# straddles the camera plane, or the bbox is clipped by the image
# boundary): the kernel recomputes the per-voxel bbox in-kernel, exactly
# like the dense kernel, so mip-level selection matches it everywhere.
CLS_REFINE = 3

# Band-window geometry (must match ops/tsdf_stream.py): 128-wide windows
# with 64-aligned origins (odd 64-slots read the shifted mip copy).
WIN_V = 32
WIN_U = 128
L3_V = 64
L3_U = 256


class FreeWorkList(NamedTuple):
    """Compacted pure-free 4x4x1-chunk SUPERBLOCK list.

    At steady state ~80% of listed chunks are plain free-space carving,
    and the streaming integrate's cost there is per-entry pipeline
    bookkeeping (~1.35us), not math. Free chunks are spatially
    contiguous: measured on the bench scene, 4x4 chunk (32, 32, 128)
    voxel superblocks grouping (x//4, y//4, z) cover ALL free chunks
    with zero spill into band/refine superblocks. Such superblocks are
    routed to the minimal free-carve kernel
    (ops/tsdf_stream.py free_carve_superblocks) as ONE entry each,
    ~15x fewer grid steps for the same voxel updates.

    A superblock is eligible iff every listed chunk in it is FREE with
    no observed negative tsdf voxel (``neg_flags``, persisted by the
    integrate in planes[..., FIELD_SAT, 4]): carving a no-negative
    chunk can never create a zero crossing, so the free kernel skips
    plane refitting entirely and keeps members' persistent planes by
    copy. Free chunks with negatives (rare: disocclusion carving of
    solid space) spill to the main kernel, which refits their planes.

    ``bitmap`` holds 16 member bits (bit qi*4 + qj, qi = x sub-block,
    qj = y): 1 = run the free-carve body, 0 = keep the chunk untouched
    (SKIP members: out of frustum / behind / saturated).
    """

    bitmap: jnp.ndarray  # (n_sb,) int32 member bits, padded
    count: jnp.ndarray  # (1,) int32 number of real entries
    bi: jnp.ndarray  # (n_sb,) int32 superblock coords (32-voxel units)
    bj: jnp.ndarray
    bk: jnp.ndarray  # chunk z index (128-voxel units)


class WorkList(NamedTuple):
    packed: jnp.ndarray  # (n_entries,) int32: half-descriptors 0-1, padded
    packed_hi: jnp.ndarray  # (n_entries,) int32: half-descriptors 2-3 (NOOP
    # pairs when super_z < 4)
    count: jnp.ndarray  # (1,) int32 number of real entries
    # Pre-decoded block coordinates (= packed's low bits): the Pallas
    # index_maps run per grid step on the scalar core, so handing them
    # plain loads instead of bit arithmetic measurably cuts the
    # per-step pipeline overhead at 16K steps.
    bi: jnp.ndarray  # (n_chunks,) int32 (entry's BASE x block; even
    # when super_x == 2)
    bj: jnp.ndarray
    bk: jnp.ndarray  # in super_z-chunk units
    super_z: int = 2  # z chunks per entry (static)
    super_x: int = 1  # x columns per entry (static)


def _coarsen_min(m):
    h, w = m.shape
    hp, wp = -(-h // 2) * 2, -(-w // 2) * 2
    mp = jnp.full((hp, wp), BIG, m.dtype).at[:h, :w].set(m)
    return mp.reshape(hp // 2, 2, wp // 2, 2).min(axis=(1, 3))


def _coarsen_max(m):
    h, w = m.shape
    hp, wp = -(-h // 2) * 2, -(-w // 2) * 2
    mp = jnp.zeros((hp, wp), m.dtype).at[:h, :w].set(m)
    return mp.reshape(hp // 2, 2, wp // 2, 2).max(axis=(1, 3))


def _dilate3_min(m):
    return -jax.lax.reduce_window(
        -m, -BIG, jax.lax.max, (3, 3), (1, 1), "SAME"
    )


def _dilate3_max(m):
    return jax.lax.reduce_window(m, -BIG, jax.lax.max, (3, 3), (1, 1), "SAME")


def build_hiz(depth: jnp.ndarray):
    """Dilated min/max/valid depth pyramid, flattened for 1-gather reads.

    Returns (dmin_table, dmax_table, valid_table, offsets, rows, cols)
    where level l spans table[offsets[l] : offsets[l] + rows[l]*cols[l]]
    with cell size 8 * 2**l pixels. Every cell holds stats over its own
    3x3 cell neighborhood, so a bbox no larger than one cell read at its
    center cell is covered conservatively.
    """
    h, w = depth.shape
    valid = depth > 0.0
    bh, bw = h // 8, w // 8
    blocks = depth[: bh * 8, : bw * 8].reshape(bh, 8, bw, 8)
    bval = valid[: bh * 8, : bw * 8].reshape(bh, 8, bw, 8)
    bmin = jnp.min(jnp.where(bval, blocks, BIG), axis=(1, 3))
    bmax = jnp.max(jnp.where(bval, blocks, 0.0), axis=(1, 3))
    ball = jnp.min(bval.astype(jnp.float32), axis=(1, 3))

    mins, maxs, alls = [bmin], [bmax], [ball]
    for _ in range(4):
        mins.append(_coarsen_min(mins[-1]))
        maxs.append(_coarsen_max(maxs[-1]))
        alls.append(_coarsen_min(alls[-1]))

    dmin_t, dmax_t, val_t, offs, rows, cols = [], [], [], [], [], []
    off = 0
    for mn, mx, al in zip(mins, maxs, alls):
        dmn = _dilate3_min(mn)
        dmx = _dilate3_max(mx)
        dal = _dilate3_min(al)
        r, c = mn.shape
        dmin_t.append(dmn.reshape(-1))
        dmax_t.append(dmx.reshape(-1))
        val_t.append(dal.reshape(-1))
        offs.append(off)
        rows.append(r)
        cols.append(c)
        off += r * c
    # offsets/rows/cols are static (shape-derived): plain Python lists.
    return (
        jnp.concatenate(dmin_t),
        jnp.concatenate(dmax_t),
        jnp.concatenate(val_t),
        offs,
        rows,
        cols,
    )


def build_worklist(
    depth: jnp.ndarray,
    pose: jnp.ndarray,
    intr: Intrinsics,
    resolution,
    voxel_size: jnp.ndarray,
    origin: jnp.ndarray,
    trunc: jnp.ndarray,
    sat_quarters: jnp.ndarray = None,
    block_x0=0,
    neg_flags: jnp.ndarray = None,
    free_split: bool = False,
):
    """Classify all (8, 8, 128) chunks and compact the non-SKIP ones.

    ``resolution`` is an int (cubic volume) or an (nx, ny, nz) dims
    tuple — a mesh-sharded X-slab is non-cubic. ``origin`` is always
    the GLOBAL volume origin and ``block_x0`` the slab's global X-block
    offset: chunk geometry computes ``origin + (ci + block_x0)*8*vs``
    so a sharded slab's f32 world coordinates are BIT-IDENTICAL to the
    single-chip run's (a slab-local origin is mathematically equal but
    rounds differently, which breaks sharded-vs-single parity).

    ``sat_quarters`` ((n, 4) bool, chunk raster order) marks chunk
    z-quarters whose free space is fully saturated (ops/tsdf_stream.py
    FIELD_SAT): a quarter that classifies free AND is saturated is
    treated like a behind one — its update would be a no-op — so fully
    saturated free chunks drop out of the work list. Any frame that
    sees a surface in a quarter's footprint makes it non-free and the
    chunk is visited normally.

    With ``free_split=True`` (and 4-divisible x/y block counts) returns
    ``(WorkList, FreeWorkList)``: pure-free superblocks (see
    FreeWorkList) move off the main list onto the compact free list.
    ``neg_flags`` ((n,) bool, chunk raster order) marks chunks with an
    observed negative tsdf voxel — those never take the free-kernel
    shortcut because carving them can surface a zero crossing that
    needs a plane refit.
    """
    if isinstance(resolution, int):
        dims = (resolution, resolution, resolution)
    else:
        dims = tuple(int(d) for d in resolution)
    # Descriptor budget: the 14-bit half descriptor stores v0/8 in 6
    # bits (max 504) and u0/64 in 4 bits (max 960). v0/u0 are clipped
    # to padded-mip-0-dim - WIN, so images beyond 640x480-class cameras
    # would silently wrap the fields and integrate the wrong depth
    # windows. Refuse loudly instead.
    _pad_h = max(-(-(intr.height + 1) // 8) * 8, WIN_V)
    _pad_w = max(-(-(intr.width + 1) // 128) * 128, WIN_U)
    if _pad_h - WIN_V > 63 * 8 or _pad_w - WIN_U > 15 * 64:
        raise ValueError(
            f"depth image {intr.width}x{intr.height} exceeds the packed "
            f"work-list descriptor budget (max ~{15 * 64 + WIN_U - 2}x"
            f"{63 * 8 + WIN_V - 2} after mip padding); use the XLA "
            "integrate path for oversized images"
        )
    nbx_x = dims[0] // 8
    nbx_y = dims[1] // 8
    nzc = dims[2] // 128
    n = nbx_x * nbx_y * nzc

    ids = jnp.arange(n, dtype=jnp.int32)
    ci = ids // (nbx_y * nzc)
    cj = (ids // nzc) % nbx_y
    ck = ids % nzc

    vs = voxel_size
    x0 = origin[0] + (ci + block_x0).astype(jnp.float32) * (8.0 * vs)
    y0 = origin[1] + cj.astype(jnp.float32) * (8.0 * vs)
    z0 = origin[2] + ck.astype(jnp.float32) * (128.0 * vs)

    rot = pose[:3, :3]
    t = pose[3, :3]
    w_img = float(intr.width)
    h_img = float(intr.height)

    # Project the corners of the chunk's 4 z-QUARTERS (32 voxels each)
    # and frustum-cull per quarter. A chunk is 75cm deep at 512^3 (2.25m
    # at 128^3): culling whole-chunk corner bboxes lets one off-screen
    # end inflate the footprint across the image and force the depth
    # window to a needlessly coarse mip level. The union of the VISIBLE
    # quarters' (clipped) bboxes stays close to the per-voxel bbox the
    # dense kernel computes. For a fully-in-front AABB the projected
    # corner bbox is exact (x/z and y/z are monotone in each coordinate),
    # so this remains conservative for every voxel that can update.
    def project_zplane(dzq):
        outs = []
        for dx in (0.0, 8.0):
            for dy in (0.0, 8.0):
                wx = x0 + dx * vs - t[0]
                wy = y0 + dy * vs - t[1]
                wz = z0 + dzq * vs - t[2]
                # Matches the kernel: xc = d . R[row], row-vector pose.
                xc = wx * rot[0, 0] + wy * rot[0, 1] + wz * rot[0, 2]
                yc = wx * rot[1, 0] + wy * rot[1, 1] + wz * rot[1, 2]
                zc = wx * rot[2, 0] + wy * rot[2, 1] + wz * rot[2, 2]
                safe = jnp.maximum(zc, 1e-6)
                uf = intr.fx * xc / safe + intr.cx
                vf = intr.fy * yc / safe + intr.cy
                outs.append((uf, vf, zc))
        return outs

    zplanes = [project_zplane(dz) for dz in (0.0, 32.0, 64.0, 96.0, 128.0)]

    quarters = []
    for q in range(4):
        corners = zplanes[q] + zplanes[q + 1]  # 8 (u, v, z) triples
        qzmin = jnp.full((n,), BIG)
        qzmax = jnp.full((n,), -BIG)
        qumin = jnp.full((n,), BIG)
        qumax = jnp.full((n,), -BIG)
        qvmin = jnp.full((n,), BIG)
        qvmax = jnp.full((n,), -BIG)
        for uf, vf, zc in corners:
            qzmin = jnp.minimum(qzmin, zc)
            qzmax = jnp.maximum(qzmax, zc)
            qumin = jnp.minimum(qumin, uf)
            qumax = jnp.maximum(qumax, uf)
            qvmin = jnp.minimum(qvmin, vf)
            qvmax = jnp.maximum(qvmax, vf)
        qclean = qzmin > 1e-6
        q_out = (qzmax <= 1e-6) | (
            qclean
            & (
                (qumax < 0.0)
                | (qumin > w_img - 1.0)
                | (qvmax < 0.0)
                | (qvmin > h_img - 1.0)
            )
        )
        quarters.append(
            dict(
                inc=~q_out,
                clean=qclean,
                zmin=qzmin,
                zmax=qzmax,
                umin=qumin,
                umax=qumax,
                vmin=qvmin,
                vmax=qvmax,
            )
        )

    zmin = jnp.full((n,), BIG)
    zmax = jnp.full((n,), -BIG)
    umin = jnp.full((n,), BIG)
    umax = jnp.full((n,), -BIG)
    vmin = jnp.full((n,), BIG)
    vmax = jnp.full((n,), -BIG)
    any_included = jnp.zeros((n,), bool)
    all_clean = jnp.ones((n,), bool)
    for qd in quarters:
        inc = qd["inc"]
        zmin = jnp.where(inc, jnp.minimum(zmin, qd["zmin"]), zmin)
        zmax = jnp.where(inc, jnp.maximum(zmax, qd["zmax"]), zmax)
        umin = jnp.where(inc, jnp.minimum(umin, qd["umin"]), umin)
        umax = jnp.where(inc, jnp.maximum(umax, qd["umax"]), umax)
        vmin = jnp.where(inc, jnp.minimum(vmin, qd["vmin"]), vmin)
        vmax = jnp.where(inc, jnp.maximum(vmax, qd["vmax"]), vmax)
        any_included = any_included | inc
        all_clean = all_clean & (~inc | qd["clean"])

    clean = any_included & all_clean  # every visible quarter fully in front
    out_frustum = ~any_included  # behind-camera quarters are excluded too

    # ---- per-QUARTER HiZ footprint stats + behind/free tests ----
    # Chunks are 16x deeper (z) than wide: classifying whole chunks
    # wastes most of the selectivity (a straddling or partially-behind
    # chunk forces exact-depth treatment of 128 z-voxels when 96 of them
    # are plain free-space carving). Per-quarter tests recover it:
    #   * a chunk is SKIP iff every visible quarter is behind,
    #   * FREE iff every visible quarter is free (the kernel's free path
    #     updates all in-view voxels, so no quarter may be behind),
    #   * the band window covers only quarters that can update.
    dmin_t, dmax_t, val_t, offs, rows_t, cols_t = build_hiz(depth)
    offs_l = [int(x) for x in offs]
    rows_l = [int(x) for x in rows_t]
    cols_l = [int(x) for x in cols_t]

    dvalid = depth > 0.0
    any_valid = jnp.any(dvalid)
    all_img_valid = jnp.all(dvalid)
    dmin_global = jnp.min(jnp.where(dvalid, depth, BIG))

    def fp_stats(umin_, umax_, vmin_, vmax_):
        """Dilated-HiZ footprint stats for a clipped bbox."""
        cumin = jnp.clip(umin_, 0.0, w_img - 1.0)
        cumax = jnp.clip(umax_, 0.0, w_img - 1.0)
        cvmin = jnp.clip(vmin_, 0.0, h_img - 1.0)
        cvmax = jnp.clip(vmax_, 0.0, h_img - 1.0)
        span = jnp.maximum(cumax - cumin, cvmax - cvmin)
        lvl = jnp.clip(
            jnp.ceil(jnp.log2(jnp.maximum(span, 1.0) / 8.0)), 0, 4
        ).astype(jnp.int32)
        fit = span <= 8.0 * 16.0  # fits a level-4 cell
        cell = 8.0 * jnp.exp2(lvl.astype(jnp.float32))
        cu = (cumin + cumax) * 0.5
        cv = (cvmin + cvmax) * 0.5

        # Per-level table geometry via where-chains (NOT table[lvl]:
        # indexing a tiny table by a 16K-vector lowers to a near-scalar
        # gather here).
        def sel_by_level(table):
            out = jnp.full_like(lvl, int(table[-1]))
            for l in range(len(table) - 2, -1, -1):
                out = jnp.where(lvl == l, int(table[l]), out)
            return out

        rr = jnp.clip((cv / cell).astype(jnp.int32), 0, sel_by_level(rows_l) - 1)
        cc = jnp.clip((cu / cell).astype(jnp.int32), 0, sel_by_level(cols_l) - 1)
        flat = sel_by_level(offs_l) + rr * sel_by_level(cols_l) + cc
        # One fused column-gather for all three fields (~3x faster than
        # three scalar gathers on this backend).
        stacked = jnp.stack([dmin_t, dmax_t, val_t], axis=0)
        got = jnp.take(stacked, flat, axis=1)
        return got[0], got[1], got[2] > 0.5, fit

    all_free = any_included
    all_behind = any_included
    eff_any = jnp.zeros((n,), bool)
    umin = jnp.full((n,), BIG)
    umax = jnp.full((n,), -BIG)
    vmin = jnp.full((n,), BIG)
    vmax = jnp.full((n,), -BIG)
    eff_clean = jnp.ones((n,), bool)
    zmin = jnp.full((n,), BIG)
    zmax = jnp.full((n,), -BIG)
    for qi, qd in enumerate(quarters):
        inc = qd["inc"]
        fq_min, fq_max, fq_all, fq_fit = fp_stats(
            qd["umin"], qd["umax"], qd["vmin"], qd["vmax"]
        )
        tight = qd["clean"] & fq_fit
        behind_q = tight & (qd["zmin"] - trunc > fq_max)
        free_tight = (
            (qd["zmax"] + trunc < fq_min) & (fq_max > 0.0) & fq_all
        )
        # No tight footprint (straddler / oversized bbox): fall back to
        # whole-image stats — every pixel must be valid and deeper.
        free_global = (
            (qd["zmax"] + trunc < dmin_global) & all_img_valid & any_valid
        )
        free_q = jnp.where(tight, free_tight, free_global)
        all_free = all_free & (~inc | free_q)
        all_behind = all_behind & (~inc | behind_q)

        if sat_quarters is not None:
            # A free quarter whose space is fully saturated updates
            # nothing: treat it like a behind one.
            behind_q = behind_q | (free_q & sat_quarters[:, qi])
        eff = inc & ~behind_q  # quarters whose voxels can update
        eff_any = eff_any | eff
        umin = jnp.where(eff, jnp.minimum(umin, qd["umin"]), umin)
        umax = jnp.where(eff, jnp.maximum(umax, qd["umax"]), umax)
        vmin = jnp.where(eff, jnp.minimum(vmin, qd["vmin"]), vmin)
        vmax = jnp.where(eff, jnp.maximum(vmax, qd["vmax"]), vmax)
        zmin = jnp.where(eff, jnp.minimum(zmin, qd["zmin"]), zmin)
        zmax = jnp.where(eff, jnp.maximum(zmax, qd["zmax"]), zmax)
        eff_clean = eff_clean & (~eff | qd["clean"])

    skip = out_frustum | all_behind | ~eff_any
    free = any_included & all_free
    clean = eff_any & eff_clean
    # For CLEAN chunks (every updatable quarter fully in front) the
    # image-CLIPPED corner bbox covers every voxel that can update, so
    # the prepass window/level are valid. Only camera-plane straddlers
    # need the in-kernel per-voxel bbox refine.
    cls = jnp.where(free, CLS_FREE, jnp.where(clean, CLS_BAND, CLS_REFINE))

    # ---- pure-free superblock split (see FreeWorkList) ----
    free_wl = None
    if free_split and nbx_x % 4 == 0 and nbx_y % 4 == 0:
        neg = (
            neg_flags
            if neg_flags is not None
            else jnp.zeros((n,), bool)
        )
        free_ok = free & ~skip & ~neg
        blocker = ~skip & ~free_ok  # listed chunks the free kernel can't run

        def g(a):  # (n,) -> (nsx, 4, nsy, 4, nzc), ci-major raster order
            return a.reshape(nbx_x // 4, 4, nbx_y // 4, 4, nzc)

        sb_block = jnp.any(g(blocker), axis=(1, 3))  # (nsx, nsy, nzc)
        sb_ok = jnp.any(g(free_ok), axis=(1, 3)) & ~sb_block
        in_free = g(free_ok) & sb_ok[:, None, :, None, :]
        skip = skip | in_free.reshape(n)  # off the main list

        bitmap = jnp.zeros(sb_ok.shape, jnp.int32)
        for qi in range(4):
            for qj in range(4):
                bitmap = bitmap | (
                    in_free[:, qi, :, qj, :].astype(jnp.int32)
                    << (qi * 4 + qj)
                )
        n_sb = bitmap.size
        sb_skip = ~sb_ok.reshape(n_sb)
        sb_ids = jnp.arange(n_sb, dtype=jnp.int32)
        nsy = nbx_y // 4
        sbi = sb_ids // (nsy * nzc)
        sbj = (sb_ids // nzc) % nsy
        sbk = sb_ids % nzc
        sb_coords = (sbi | (sbj << 7) | (sbk << 14)).astype(jnp.int32)
        sorder = jnp.argsort(sb_skip, stable=True)
        s_bitmap = bitmap.reshape(n_sb)[sorder]
        s_coords = sb_coords[sorder]
        sb_count = jnp.sum(sb_ok).astype(jnp.int32)
        lastb = jnp.where(
            sb_count > 0, s_bitmap[jnp.maximum(sb_count - 1, 0)], 0
        )
        lastc = jnp.where(
            sb_count > 0, s_coords[jnp.maximum(sb_count - 1, 0)], 0
        )
        ssteps = jnp.arange(n_sb, dtype=jnp.int32)
        fb = jnp.where(ssteps < sb_count, s_bitmap, lastb)
        fb = jnp.where(sb_count > 0, fb, jnp.zeros((n_sb,), jnp.int32))
        fc = jnp.where(ssteps < sb_count, s_coords, lastc)
        fc = jnp.where(sb_count > 0, fc, jnp.zeros((n_sb,), jnp.int32))
        free_wl = FreeWorkList(
            bitmap=fb,
            count=jnp.maximum(sb_count, 1).reshape(1),
            bi=fc & 127,
            bj=(fc >> 7) & 127,
            bk=(fc >> 14) & 127,
        )

    # ---- band-window level + aligned origin (matches ops/tsdf_stream) --
    # Window must cover the clipped bbox of the UPDATABLE quarters after
    # aligning the origin DOWN (rows to 8, cols to 64): fits(l) iff
    # span_v <= 22*2^l and span_u <= 60*2^l; level 3 (the full padded
    # L3 mip) always fits.
    cumin = jnp.clip(umin, 0.0, w_img - 1.0)
    cumax = jnp.clip(umax, 0.0, w_img - 1.0)
    cvmin = jnp.clip(vmin, 0.0, h_img - 1.0)
    cvmax = jnp.clip(vmax, 0.0, h_img - 1.0)
    span_u = cumax - cumin
    span_v = cvmax - cvmin
    fits0 = (span_v <= 22.0) & (span_u <= 60.0)
    fits1 = (span_v <= 44.0) & (span_u <= 120.0)
    fits2 = (span_v <= 88.0) & (span_u <= 240.0)
    level = jnp.where(fits0, 0, jnp.where(fits1, 1, jnp.where(fits2, 2, 3)))
    level = jnp.where(clean, level, 3).astype(jnp.int32)
    scale = jnp.exp2(level.astype(jnp.float32))

    # Mip l dimensions (padded as in ops/tsdf_stream.build_depth_mips,
    # +1 for the replicated border row/col); static.
    def _hp(h):
        return max(-(-(h + 1) // 8) * 8, WIN_V)

    def _wp(w):
        return max(-(-(w + 1) // 128) * 128, WIN_U)

    h_l = [
        _hp(intr.height),
        _hp(-(-intr.height // 2)),
        _hp(-(-intr.height // 4)),
    ]
    w_l = [
        _wp(intr.width),
        _wp(-(-intr.width // 2)),
        _wp(-(-intr.width // 4)),
    ]

    def sel3(table, last):
        out = jnp.full_like(level, last)
        for l in range(2, -1, -1):
            out = jnp.where(level == l, table[l], out)
        return out

    v0_raw = ((cvmin / scale).astype(jnp.int32) - 1) & ~7
    u0_raw = ((cumin / scale).astype(jnp.int32) - 1) & ~63
    v0 = jnp.clip(v0_raw, 0, sel3([h - WIN_V for h in h_l], 0))
    u0 = jnp.clip(u0_raw, 0, sel3([w - WIN_U for w in w_l], 0))
    v0 = jnp.where(level == 3, 0, v0)
    u0 = jnp.where(level == 3, 0, u0)

    # Per-chunk HALF descriptor: cls(2) level(2) v08(6) u064(4) = 14 bits.
    half = (
        cls | (level << 2) | ((v0 >> 3) << 4) | ((u0 >> 6) << 10)
    ).astype(jnp.int32)
    noop_half = jnp.int32(CLS_NOOP)
    half = jnp.where(skip, noop_half, half)

    # ---- SUPERCHUNK grouping: super_x x-adjacent columns x super_z
    # z-adjacent chunks per work-list entry / one
    # (8*super_x, 8, 128*super_z) block. The streaming integrate is
    # bound by PER-STEP pipeline overhead (~1.35us per active entry,
    # measured; neither FLOPs nor HBM bytes), so wider entries cut its
    # floor directly; a grouped entry's SKIP members simply carry NOOP
    # half-descriptors. Two packed int32 words hold up to 4 14-bit
    # halves, ordered xh*super_z + zh (lo word: halves 0-1, hi: 2-3).
    # WHY x and not wider z: at the steady-state 512^3 bench frame,
    # 95.8% of listed entries have their x-sibling listed too (surfaces
    # are x-coherent) while z-siblings beyond the super_z=2 pair pair at
    # ~0% — a super_z=4 experiment merged mostly-(listed, skip) pairs:
    # no step savings, double the streamed bytes. ----
    super_z = 2 if nzc % 2 == 0 else 1  # see ops/tsdf_stream.py
    super_x = 2 if (nbx_x % 2 == 0 and SUPER_X_CAP >= 2) else 1
    nzc2 = nzc // super_z
    # (nbx_x, nbx_y, nzc) raster -> (entries, super_x, super_z) halves.
    h5 = jnp.moveaxis(
        half.reshape(nbx_x // super_x, super_x, nbx_y, nzc2, super_z),
        1,
        3,
    )
    s5 = jnp.moveaxis(
        skip.reshape(nbx_x // super_x, super_x, nbx_y, nzc2, super_z),
        1,
        3,
    )
    n_half = super_x * super_z
    halfs = h5.reshape(-1, n_half)
    skips = s5.reshape(-1, n_half)
    n_super = halfs.shape[0]
    noop_pair = (noop_half | (noop_half << 14)).astype(jnp.int32)

    def _w(i):
        if i < n_half:
            return halfs[:, i]
        return jnp.full((n_super,), noop_half, jnp.int32)

    packed = (_w(0) | (_w(1) << 14)).astype(jnp.int32)
    packed_hi = (_w(2) | (_w(3) << 14)).astype(jnp.int32)
    skip_s = skips.all(axis=1)
    eids = jnp.arange(n_super, dtype=jnp.int32)
    sci = (eids // (nbx_y * nzc2)) * super_x  # entry's BASE x block
    scj = (eids // nzc2) % nbx_y
    sck = eids % nzc2  # superchunk z index

    # ---- compaction: non-skip first, raster order preserved ----
    coords = (sci | (scj << 7) | (sck << 14)).astype(jnp.int32)
    order = jnp.argsort(skip_s, stable=True)
    sorted_packed = packed[order]
    sorted_hi = packed_hi[order]
    sorted_coords = coords[order]
    count = jnp.sum(~skip_s).astype(jnp.int32)

    # count == 0: one all-NOOP entry on chunk (0,0,0) keeps the
    # pipeline's revisit-elision invariant (padding repeats a real
    # entry).
    noop = noop_pair
    last = jnp.where(count > 0, sorted_packed[jnp.maximum(count - 1, 0)], noop)
    last_h = jnp.where(count > 0, sorted_hi[jnp.maximum(count - 1, 0)], noop)
    last_c = jnp.where(count > 0, sorted_coords[jnp.maximum(count - 1, 0)], 0)
    steps = jnp.arange(n_super, dtype=jnp.int32)
    wl = jnp.where(steps < count, sorted_packed, last)
    wl = jnp.where(count > 0, wl, jnp.full((n_super,), noop, jnp.int32))
    wh = jnp.where(steps < count, sorted_hi, last_h)
    wh = jnp.where(count > 0, wh, jnp.full((n_super,), noop, jnp.int32))
    wc = jnp.where(steps < count, sorted_coords, last_c)
    wc = jnp.where(count > 0, wc, jnp.zeros((n_super,), jnp.int32))
    count = jnp.maximum(count, 1)
    out = WorkList(
        packed=wl,
        packed_hi=wh,
        count=count.reshape(1),
        bi=wc & 127,
        bj=(wc >> 7) & 127,
        bk=(wc >> 14) & 15,
        super_z=super_z,
        super_x=super_x,
    )
    if free_split:
        return out, free_wl
    return out


def decode_worklist(wl: WorkList):
    """Numpy (ci, cj, ck, cls, level, v0, u0) rows for every listed CHUNK
    (both superchunk halves, NOOP halves skipped) — test/debug helper."""
    import numpy as np

    packed = np.asarray(wl.packed)
    packed_hi = np.asarray(wl.packed_hi)
    bi = np.asarray(wl.bi)
    bj = np.asarray(wl.bj)
    bk = np.asarray(wl.bk)
    count = int(np.asarray(wl.count)[0])
    rows = []
    for s in range(count):
        for h in range(wl.super_x * wl.super_z):
            word = packed[s] if h < 2 else packed_hi[s]
            d = (word >> (14 * (h % 2))) & 0x3FFF
            cls = d & 3
            if cls == CLS_NOOP:
                continue
            rows.append(
                (
                    int(bi[s]) + h // wl.super_z,
                    int(bj[s]),
                    int(bk[s]) * wl.super_z + h % wl.super_z,
                    cls,
                    (d >> 2) & 3,
                    ((d >> 4) & 63) * 8,
                    ((d >> 10) & 15) * 64,
                )
            )
    return rows
