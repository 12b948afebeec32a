"""Streaming Pallas TSDF integrate: work-list over non-SKIP chunks.

Second-generation integrate kernel (successor of ops/tsdf_pallas.py's
dense kernel). The dense kernel walks all (8, 8, 512) volume columns and
classifies their chunks in-kernel; measured at 512^3 that splits as
~5ms HBM streaming + ~23ms classification + ~6ms band updates + ~16ms
plane extraction, with ~69% of chunks classified SKIP and immediately
discarded. This kernel eliminates the waste:

  * ops/chunk_select.py classifies every (8, 8, 128) chunk in a cheap
    vectorized XLA prepass (chunk-corner projection + dilated HiZ depth
    pyramid) and emits a compacted work list of non-SKIP chunk
    descriptors (coords, class, depth-window level/origin packed in one
    int32 each).
  * The Pallas grid runs over the work list via scalar prefetch; the
    BlockSpec index_map decodes block coordinates from the descriptor.
    Padding entries repeat the last real descriptor, so their DMAs are
    elided (consecutive identical block index) — a padded step costs
    ~80ns (measured).
  * tsdf / weight / planes are INPUT-OUTPUT ALIASED: chunks absent from
    the work list keep their HBM contents bit-exactly (verified:
    scripts/worklist_microbench.py). The per-sub-block surface planes
    (consumed by the plane raycast) therefore become a PERSISTENT
    acceleration structure: recomputed only for chunks whose TSDF
    changed this frame, carried across frames for all others.
  * BAND chunks do the gather-free one-hot bilinear depth lookup of the
    dense kernel, with the contraction reordered (window @ column-
    weights on the MXU first, then the 32-row v-weight reduce on the
    VPU) — 8x less VPU work per tile for the same exact result.

Reference: replaces the per-voxel CUDA integrate of the external PCL
KinFu (ref README.md:14); see SURVEY.md section 7.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from housescan_tpu.kinfu.camera import Intrinsics
from housescan_tpu.kinfu.tsdf import TsdfVolume
from housescan_tpu.ops.chunk_select import (
    CLS_BAND,
    CLS_FREE,
    CLS_NOOP,
    CLS_REFINE,
    SUPER_X_CAP,
    build_worklist,
)
from housescan_tpu.ops.planes_pallas import (
    N_FIELDS,
    SUB_Z,
    plane_fields_for_block,
)

WIN_V = 32
# Half-width depth windows: the (WIN_U, Z) one-hot column-weight build is
# the band path's dominant VPU cost, and it scales linearly with WIN_U.
# 128-wide windows with 64-aligned origins (Mosaic lane slices must be
# 128-aligned, so odd 64-offsets slice a pre-shifted mip copy) halve it;
# the cost is a slightly earlier mip-level bump (span_u <= 60*2^l instead
# of 120*2^l) for mid-distance chunks.
WIN_U = 128
# The whole-image L3 fallback window is sized DYNAMICALLY to the /8
# image in build_depth_mips (e.g. (64, 128) at 640x480) — L3 chunks
# dominate the band path's MXU MACs, so fixed worst-case padding there
# multiplied zeros for most cameras.
CHUNK_Z = 128
BIG = 1.0e9
NSUB_C = CHUNK_Z // SUB_Z  # sub-blocks (planes) per chunk

# Free-space saturation: once EVERY voxel of a chunk z-QUARTER (8, 8,
# 32) has been carved to tsdf == +1 at least SAT_W times, further FREE
# updates of that quarter are no-ops except for the weight count, so
# the prepass can treat a free+saturated quarter like a behind one
# (planes row FIELD_SAT, columns 0-3, carries the 4 quarter flags).
# FREE chunks are ~80% of the listed set at steady state — this is the
# integrate's largest saving. Quarter granularity matters: whole chunks
# almost always contain SOME unobserved voxel (frustum edges), but
# their fully-carved quarters saturate quickly. The only semantic
# difference: free-space weights stop counting at ~SAT_W, which makes
# later surface observations (moving geometry) adapt FASTER than the
# reference's 128 cap, never slower. Any depth frame that brings a
# surface into the quarter's footprint reclassifies the chunk
# BAND/REFINE, and the visit recomputes the flags.
SAT_W = float(__import__("os").environ.get("HOUSESCAN_SAT_W", "8"))
N_QUARTERS = 4
FIELD_SAT = 11  # planes row carrying the flags (rows 11-15 are spare)


def planes_shape(resolution):
    """Persistent planes array shape for a cubic resolution or an
    (nx, ny, nz) dims tuple (mesh-sharded slabs are non-cubic)."""
    if isinstance(resolution, int):
        dims = (resolution,) * 3
    else:
        dims = tuple(int(d) for d in resolution)
    return (dims[0] // 8, dims[1] // 8, dims[2] // CHUNK_Z, N_FIELDS, NSUB_C)


def _kernel(
    wl,  # scalar prefetch: (n,) packed half-descriptors 0-1
    wl_hi,  # scalar prefetch: (n,) packed half-descriptors 2-3
    bi_a,  # scalar prefetch: pre-decoded block coords
    bj_a,
    bk_a,
    cnt,  # scalar prefetch: (1,) real count
    params,  # SMEM (32,)
    mip0,
    mip1,
    mip2,
    mip0s,  # 64-px-left-shifted copies (odd window origins)
    mip1s,
    mip2s,
    l3,  # VMEM full depth mips (0 = invalid)
    vol_in,  # VMEM (2, 8, 8, 128*super_z): [tsdf, weight] superchunk
    planes_in,  # VMEM (1, 1, super_z, N_FIELDS, NSUB_C) — aliased, not read
    vol_out,
    planes_out,
    sign_scratch,  # VMEM (2, 8, CHUNK_Z): post-update obs min/max tiles
    super_z=2,  # z chunks per work-list entry (2, or 1 when nzc is odd)
    super_x=1,  # x columns per entry (2 when nbx_x is even)
    ablate="none",  # perf triage: none|copy|no_planes|no_free|no_band
    sat_w=SAT_W,
):
    step = pl.program_id(0)
    p = wl[step]
    p_hi = wl_hi[step]
    ci = bi_a[step]
    cj = bj_a[step]
    bk = bk_a[step]  # block z index in super_z-chunk units

    r00, r01, r02 = params[0], params[1], params[2]
    r10, r11, r12 = params[3], params[4], params[5]
    r20, r21, r22 = params[6], params[7], params[8]
    tx, ty, tz = params[9], params[10], params[11]
    fx, fy, cx, cy = params[12], params[13], params[14], params[15]
    trunc = params[16]
    vs = params[17]
    ox, oy, oz = params[18], params[19], params[20]
    max_weight = params[21]
    img_w = params[22]
    img_h = params[23]
    nbx = params[24].astype(jnp.int32)  # GLOBAL X block count (for ids)
    nzc = params[25].astype(jnp.int32)
    bx0 = params[26].astype(jnp.int32)  # slab's global X block offset

    active = step < cnt[0]

    # Padded steps revisit the last real superchunk: its in/out VMEM
    # buffers hold that entry's ORIGINAL and UPDATED contents
    # respectively, so a padded step must write nothing at all.
    @pl.when(active)
    def _process():
        vol_out[...] = vol_in[...]

        for hg in range(super_x * super_z):
            xh = hg // super_z  # python ints: the loop is unrolled, so
            zh = hg % super_z  # all offsets below stay STATIC
            word = p if hg < 2 else p_hi
            _process_half(
                zh,
                (word >> (14 * (hg % 2))) & 0x3FFF,
                ci + xh,
                cj,
                bk * super_z + zh,
                params,
                (mip0, mip1, mip2),
                (mip0s, mip1s, mip2s),
                l3,
                vol_out,
                planes_out,
                sign_scratch,
                nbx,
                nzc,
                bx0,
                ablate,
                sat_w,
                xh,
            )


def _process_half(
    h,  # python int: which z-half of the block (lane offset h*128)
    desc,  # 14-bit half descriptor (traced scalar)
    ci,
    cj,
    ckc,  # chunk z index (traced scalar)
    params,
    mips,  # (mip0, mip1, mip2)
    mips_s,  # 64-px-shifted copies
    l3,
    vol_out,
    planes_out,
    sign_scratch,
    nbx,
    nzc,
    bx0,
    ablate,
    sat_w,
    xh=0,  # python int: which x column of a super_x-wide block
):
    cls = desc & 3
    level = (desc >> 2) & 3
    v0 = pl.multiple_of(((desc >> 4) & 63) * 8, 8)
    u0 = pl.multiple_of(((desc >> 10) & 15) * 64, 64)

    r00, r01, r02 = params[0], params[1], params[2]
    r10, r11, r12 = params[3], params[4], params[5]
    r20, r21, r22 = params[6], params[7], params[8]
    tx, ty, tz = params[9], params[10], params[11]
    fx, fy, cx, cy = params[12], params[13], params[14], params[15]
    trunc = params[16]
    vs = params[17]
    ox, oy, oz = params[18], params[19], params[20]
    max_weight = params[21]
    img_w = params[22]
    img_h = params[23]

    zlo = h * CHUNK_Z  # static lane offset of this half in the block
    xlo = xh * 8  # static x (dim-0) offset in a super_x-wide block
    # Global X block index: geometry MUST use (ci + bx0) with the GLOBAL
    # origin so a mesh-sharded slab's f32 world coordinates are
    # bit-identical to the single-chip run's (slab-local origins round
    # differently and break sharded-vs-single parity). bx0 = 0 single
    # chip.
    ci_g = ci + bx0

    if len(vol_out.shape) == 3:
        # int16-packed int32 layout: tsdf<<16 | weight (kinfu/tsdf.py
        # pack_tw) — half the block bytes of the f32 layout, which are
        # the integrate's dominant cost at 512^3.
        def t_ref(ix):
            v = vol_out[xlo + ix, :, zlo : zlo + CHUNK_Z]
            return (v >> 16).astype(jnp.float32) * (1.0 / 32767.0)

        def w_ref(ix):
            v = vol_out[xlo + ix, :, zlo : zlo + CHUNK_Z]
            return (v & 0xFFFF).astype(jnp.float32)

        def tw_set(ix, t, w):
            ti = jnp.round(jnp.clip(t, -1.0, 1.0) * 32767.0).astype(
                jnp.int32
            )
            vol_out[xlo + ix, :, zlo : zlo + CHUNK_Z] = (
                ti << 16
            ) | w.astype(jnp.int32)

    else:
        vdt = vol_out.dtype  # f32 or bf16 storage; all math is f32

        def t_ref(ix):
            return vol_out[0, xlo + ix, :, zlo : zlo + CHUNK_Z].astype(
                jnp.float32
            )

        def w_ref(ix):
            return vol_out[1, xlo + ix, :, zlo : zlo + CHUNK_Z].astype(
                jnp.float32
            )

        def tw_set(ix, t, w):
            vol_out[0, xlo + ix, :, zlo : zlo + CHUNK_Z] = t.astype(vdt)
            vol_out[1, xlo + ix, :, zlo : zlo + CHUNK_Z] = w.astype(vdt)

    zlane = jax.lax.broadcasted_iota(jnp.int32, (8, CHUNK_Z), 1).astype(
        jnp.float32
    ) + (ckc * CHUNK_Z).astype(jnp.float32)
    iy_sub = jax.lax.broadcasted_iota(jnp.int32, (8, CHUNK_Z), 0).astype(
        jnp.float32
    )

    def tile_coords(ix_f):
        """Camera and pixel coords for the (8 iy, 128 z) slab tile."""
        xw = ox + (ci_g * 8 + ix_f + 0.5) * vs
        yw = oy + (cj * 8 + iy_sub + 0.5) * vs
        zw = oz + (zlane + 0.5) * vs
        dx = xw - tx
        dy = yw - ty
        dz = zw - tz
        xc = dx * r00 + dy * r01 + dz * r02
        yc = dx * r10 + dy * r11 + dz * r12
        zc = dx * r20 + dy * r21 + dz * r22
        safe_z = jnp.maximum(zc, 1e-6)
        uf = fx * xc / safe_z + cx
        vf = fy * yc / safe_z + cy
        in_view = (
            (zc > 1e-6)
            & (uf >= 0.0)
            & (uf <= img_w - 1.0)
            & (vf >= 0.0)
            & (vf <= img_h - 1.0)
        )
        return uf, vf, zc, in_view

    ones_t = jnp.ones((8, CHUNK_Z), jnp.float32)
    big_t = jnp.full((8, CHUNK_Z), BIG, jnp.float32)

    def _store_sign(mn_t, mx_t, mn_w, mx_w):
        # Post-update observed-tsdf min/max (crossing early-out), the
        # min OBSERVED weight and max weight (free-space saturation
        # flags) — folded into the RMW loops (which read every voxel
        # anyway), so the planes stage needs no second pass.
        sign_scratch[0, :, :] = mn_t
        sign_scratch[1, :, :] = mx_t
        sign_scratch[2, :, :] = mn_w
        sign_scratch[3, :, :] = mx_w

    def _scan_sign():
        # Read-only sign scan for halves whose TSDF was not updated this
        # step (NOOP, or REFINE with nothing in view).
        def sbody(ix, carry):
            mn_t, mx_t, mn_w, mx_w = carry
            t = t_ref(ix)
            w = w_ref(ix)
            obs = w > 0.0
            mn_t = jnp.minimum(mn_t, jnp.where(obs, t, 1.0))
            mx_t = jnp.maximum(mx_t, jnp.where(obs, t, -1.0))
            mn_w = jnp.minimum(mn_w, jnp.where(obs, w, BIG))
            mx_w = jnp.maximum(mx_w, w)
            return mn_t, mx_t, mn_w, mx_w

        mn_t, mx_t, mn_w, mx_w = jax.lax.fori_loop(
            0, 8, sbody, (ones_t, -ones_t, big_t, -ones_t)
        )
        _store_sign(mn_t, mx_t, mn_w, mx_w)

    def update_tiles(get_depth_tile):
        """RMW over the half-chunk's 8 x-slabs."""

        def body(ix, carry):
            mn_t, mx_t, mn_w, mx_w = carry
            uf, vf, zc, iv = tile_coords(ix.astype(jnp.float32))
            d, has_depth = get_depth_tile(uf, vf)
            sdf = d - zc
            update = iv & has_depth & (sdf >= -trunc)
            sample = jnp.clip(sdf / trunc, -1.0, 1.0)

            told = t_ref(ix)
            wold = w_ref(ix)
            wadd = update.astype(jnp.float32)
            wnew = jnp.minimum(wold + wadd, max_weight)
            denom = jnp.maximum(wold + wadd, 1.0)
            tnew = (told * wold + sample * wadd) / denom
            tcur = jnp.where(update, tnew, told)
            tw_set(ix, tcur, wnew)
            obs = wnew > 0.0
            mn_t = jnp.minimum(mn_t, jnp.where(obs, tcur, 1.0))
            mx_t = jnp.maximum(mx_t, jnp.where(obs, tcur, -1.0))
            mn_w = jnp.minimum(mn_w, jnp.where(obs, wnew, BIG))
            mx_w = jnp.maximum(mx_w, wnew)
            return mn_t, mx_t, mn_w, mx_w

        mn_t, mx_t, mn_w, mx_w = jax.lax.fori_loop(
            0, 8, body, (ones_t, -ones_t, big_t, -ones_t)
        )
        _store_sign(mn_t, mx_t, mn_w, mx_w)

    if ablate == "copy":
        return

    @pl.when((cls == CLS_FREE) & (0 == (1 if ablate == "no_free" else 0)))
    def _():
        # Confidently in front of every valid pixel: sample = +1 for
        # every in-view voxel (prepass guarantees validity). The in-view
        # test multiplies through by zc instead of forming u/v (VPU
        # divides are multi-pass); only the weight blend keeps one
        # divide.
        def body(ix, carry):
            mn_t, mx_t, mn_w, mx_w = carry
            ix_f = ix.astype(jnp.float32)
            xw = ox + (ci_g * 8 + ix_f + 0.5) * vs
            yw = oy + (cj * 8 + iy_sub + 0.5) * vs
            zw = oz + (zlane + 0.5) * vs
            dx = xw - tx
            dy = yw - ty
            dz = zw - tz
            xc = dx * r00 + dy * r01 + dz * r02
            yc = dx * r10 + dy * r11 + dz * r12
            zc = dx * r20 + dy * r21 + dz * r22
            fxx = fx * xc
            fyy = fy * yc
            iv = (
                (zc > 1e-6)
                & (fxx >= -cx * zc)
                & (fxx <= (img_w - 1.0 - cx) * zc)
                & (fyy >= -cy * zc)
                & (fyy <= (img_h - 1.0 - cy) * zc)
            )
            told = t_ref(ix)
            wold = w_ref(ix)
            wadd = iv.astype(jnp.float32)
            wnew = jnp.minimum(wold + wadd, max_weight)
            denom = jnp.maximum(wold + wadd, 1.0)
            tnew = (told * wold + wadd) / denom
            tcur = jnp.where(iv, tnew, told)
            tw_set(ix, tcur, wnew)
            obs = wnew > 0.0
            mn_t = jnp.minimum(mn_t, jnp.where(obs, tcur, 1.0))
            mx_t = jnp.maximum(mx_t, jnp.where(obs, tcur, -1.0))
            mn_w = jnp.minimum(mn_w, jnp.where(obs, wnew, BIG))
            mx_w = jnp.maximum(mx_w, wnew)
            return mn_t, mx_t, mn_w, mx_w

        mn_t, mx_t, mn_w, mx_w = jax.lax.fori_loop(
            0, 8, body, (ones_t, -ones_t, big_t, -ones_t)
        )
        _store_sign(mn_t, mx_t, mn_w, mx_w)

    def band_update(window, nrows, scale, v0f, u0f):
        """Exact bilinear depth from a (nrows, win_u) window.

        Contraction order: columns first on the MXU
        (window @ wc -> (nrows, Z)), then the nrows-row v-weight reduce
        on the VPU. Algebraically identical to the dense kernel's order,
        8x less VPU work. When EVERY window pixel is valid (walls — the
        common case) the bilinear weights sum to 1 exactly, so the
        validity-denominator matmul and renormalizing divide are
        skipped; windows containing invalid (0) pixels take the full
        renormalized path."""
        win_u = window.shape[1]
        rows_i = jax.lax.broadcasted_iota(
            jnp.int32, (nrows, CHUNK_Z), 0
        ).astype(jnp.float32)
        cols_i = jax.lax.broadcasted_iota(
            jnp.int32, (win_u, CHUNK_Z), 0
        ).astype(jnp.float32)

        def weights(uf, vf, iy):
            # wc rides the MXU, whose DEFAULT-precision datapath
            # truncates multiplicands to bf16. Snap the u fraction to a
            # 1/256 grid FIRST: every hat weight then lands on k/256
            # with k <= 256 (<= 8 significant bits), exactly
            # bf16-representable, and complementary pairs still sum to
            # 1 exactly — so the MXU applies the quantized weights with
            # ZERO rounding. The quantization itself moves the sample
            # point by <= 1/512 px (~0.01 mm on real depth gradients),
            # versus ~10 mm of weight-sum drift when raw f32 hats get
            # bf16-truncated (the res>=256 depth-bias root cause).
            # wr is applied on the VPU in f32 and stays exact.
            uw = uf / scale - u0f
            uw = jnp.round(uw * 256.0) * (1.0 / 256.0)
            vw = vf / scale - v0f
            wc = jnp.maximum(
                0.0, 1.0 - jnp.abs(uw[iy : iy + 1, :] - cols_i)
            )  # (WIN_U, Z)
            wr = jnp.maximum(
                0.0, 1.0 - jnp.abs(vw[iy : iy + 1, :] - rows_i)
            )  # (nrows, Z)
            return wc, wr

        def support(uf, vf):
            """(8, Z) True where the FULL bilinear footprint lies inside
            the window. A projection even half a pixel past the window
            edge gets partial hat-weight sums — its depth reads low by
            up to 2x and writes a PHANTOM negative band at FOV/window
            borders (measured: ~5K boundary voxels flipped sign vs the
            exact XLA integrate, rendering wrong surface at the image
            top). Window origins carry >= 1 px of margin around the
            updatable bbox, so true in-budget voxels keep support."""
            uw = uf / scale - u0f
            vw = vf / scale - v0f
            return (
                (uw >= 0.0)
                & (uw <= float(win_u - 1))
                & (vw >= 0.0)
                & (vw <= float(nrows - 1))
            )

        all_valid = jnp.min(window) > 0.0

        # Metric depth through a DEFAULT-precision (1-pass bf16) dot:
        # split the window into an exactly-bf16 hi part plus its
        # residual and stack them on the ROW axis of ONE dot. hi lands
        # exactly; lo's own bf16 truncation leaves ~2^-17 relative
        # depth error (~0.04 mm at 5 m). wc is exact by construction
        # (see weights()). These dots are the band path's MXU-cycle
        # floor (time ~ rows x 128 x Z), so the row doubling costs real
        # milliseconds at 512^3 — but a HIGHEST pin (6-pass f32
        # emulation) measured far worse (-19 fps on the 512^3 bench).
        w_hi = window.astype(jnp.bfloat16).astype(jnp.float32)
        w_lo = window - w_hi

        # COLUMN-FLAT fast path: when every window column's depth range
        # is small, split against a per-column exactly-bf16 base
        # instead: d = bilerp(window - base) + lerp_u(base) (the base
        # row's v-weight sum is exactly 1 for in-support samples). The
        # shift is Sterbenz-exact in f32 and small enough (<= range/2 +
        # the base's own bf16 snap, ~36 mm worst case) that the MXU's
        # bf16 truncation of it leaves <= ~0.07 mm — same class as the
        # hi/lo residual — while the dot shrinks from 2n to n+8 rows
        # (-37%). Walls pass the gate at any u-obliquity (the per-column
        # base absorbs the u-slope); grazing floors and silhouette
        # windows fall back to hi/lo. Gate and base depend only on the
        # window, so mesh-sharded and single-chip runs branch
        # identically (bit-exact parity preserved).
        cmax = jnp.max(window, axis=0, keepdims=True)
        cmin = jnp.min(window, axis=0, keepdims=True)
        base = ((cmax + cmin) * 0.5).astype(jnp.bfloat16).astype(
            jnp.float32
        )  # (1, win_u)
        col_flat = jnp.max(cmax - cmin) <= 0.04

        @pl.when(all_valid & col_flat)
        def _():
            win_sb = jnp.concatenate(
                [window - base, base, jnp.zeros((7, win_u), jnp.float32)],
                axis=0,
            )  # (nrows + 8, win_u)

            def get_depth_tile(uf, vf):
                d_rows = []
                for iy in range(8):
                    wc, wr = weights(uf, vf, iy)
                    t2s = jax.lax.dot_general(
                        win_sb,
                        wc,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (nrows + 8, Z)
                    d_rows.append(
                        (jnp.sum(t2s[:nrows] * wr, axis=0) + t2s[nrows])
                        .reshape(1, CHUNK_Z)
                    )
                d = jnp.concatenate(d_rows, axis=0)
                return d, support(uf, vf)

            update_tiles(get_depth_tile)

        @pl.when(all_valid & ~col_flat)
        def _():
            win_hl = jnp.concatenate([w_hi, w_lo], axis=0)

            def get_depth_tile(uf, vf):
                d_rows = []
                for iy in range(8):
                    wc, wr = weights(uf, vf, iy)
                    t2s = jax.lax.dot_general(
                        win_hl,
                        wc,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (2*nrows, Z)
                    t2 = t2s[:nrows] + t2s[nrows:]
                    d_rows.append(
                        jnp.sum(t2 * wr, axis=0).reshape(1, CHUNK_Z)
                    )
                d = jnp.concatenate(d_rows, axis=0)
                return d, support(uf, vf)

            update_tiles(get_depth_tile)

        @pl.when(~all_valid)
        def _():
            valid_w = (window > 0.0).astype(jnp.float32)  # exact in bf16
            win2 = jnp.concatenate([w_hi, w_lo, valid_w], axis=0)

            def get_depth_tile(uf, vf):
                d_rows = []
                den_rows = []
                for iy in range(8):
                    wc, wr = weights(uf, vf, iy)
                    t2 = jax.lax.dot_general(
                        win2,
                        wc,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (3*nrows, Z)
                    num = t2[:nrows] + t2[nrows : 2 * nrows]
                    d_rows.append(
                        jnp.sum(num * wr, axis=0).reshape(1, CHUNK_Z)
                    )
                    den_rows.append(
                        jnp.sum(t2[2 * nrows :] * wr, axis=0).reshape(1, CHUNK_Z)
                    )
                num = jnp.concatenate(d_rows, axis=0)
                den = jnp.concatenate(den_rows, axis=0)
                d = num / jnp.maximum(den, 1e-12)
                return d, support(uf, vf) & (den > 1e-6)

            update_tiles(get_depth_tile)

    def band_dispatch(lvl, v0s, u0s):
        """Window slice + band update for a (possibly traced) level and
        aligned origins.

        ``u0s`` is 64-aligned in level coords, but Mosaic lane slices
        must be 128-aligned: even 64-slots slice the base mip directly,
        odd ones slice the 64-px-left-shifted copy at u0s - 64 (which is
        128-aligned and holds the same pixels)."""
        scale = jnp.where(
            lvl == 0,
            1.0,
            jnp.where(lvl == 1, 2.0, jnp.where(lvl == 2, 4.0, 8.0)),
        )
        odd = (u0s & 64) != 0

        for l in range(3):
            @pl.when((lvl == l) & ~odd)
            def _(_l=l):
                band_update(
                    mips[_l][
                        pl.ds(v0s, WIN_V),
                        pl.ds(pl.multiple_of(u0s, 128), WIN_U),
                    ],
                    WIN_V,
                    scale,
                    v0s.astype(jnp.float32),
                    u0s.astype(jnp.float32),
                )

            @pl.when((lvl == l) & odd)
            def _(_l=l):
                band_update(
                    mips_s[_l][
                        pl.ds(v0s, WIN_V),
                        pl.ds(pl.multiple_of(u0s - 64, 128), WIN_U),
                    ],
                    WIN_V,
                    scale,
                    v0s.astype(jnp.float32),
                    u0s.astype(jnp.float32),
                )

        @pl.when(lvl == 3)
        def _():
            band_update(l3[...], l3.shape[0], scale, 0.0, 0.0)

    @pl.when((cls == CLS_BAND) & (0 == (1 if ablate == "no_band" else 0)))
    def _():
        band_dispatch(level, v0, u0)

    @pl.when(cls == CLS_REFINE)
    def _():
        # Prepass couldn't bound the footprint (camera-plane straddle or
        # image-boundary clip): recompute the per-voxel in-view bbox
        # exactly like the dense kernel, so mip levels match it.
        def bbox_body(ix, carry):
            bumin, bumax, bvmin, bvmax, anyv = carry
            big = jnp.float32(BIG)
            uf, vf, zc, iv = tile_coords(ix.astype(jnp.float32))
            bumin = jnp.minimum(bumin, jnp.min(jnp.where(iv, uf, big)))
            bumax = jnp.maximum(bumax, jnp.max(jnp.where(iv, uf, -big)))
            bvmin = jnp.minimum(bvmin, jnp.min(jnp.where(iv, vf, big)))
            bvmax = jnp.maximum(bvmax, jnp.max(jnp.where(iv, vf, -big)))
            return bumin, bumax, bvmin, bvmax, anyv | jnp.any(iv)

        big = jnp.float32(BIG)
        bumin, bumax, bvmin, bvmax, any_view = jax.lax.fori_loop(
            0, 8, bbox_body, (big, -big, big, -big, False)
        )

        @pl.when(~any_view)
        def _():
            # No voxel in view: the volume is untouched; accumulate the
            # sign scratch from the existing values (rare).
            _scan_sign()

        @pl.when(any_view)
        def _():
            span_u = bumax - bumin
            span_v = bvmax - bvmin

            def fits(l):
                s = float(1 << l)
                return (span_v <= 22.0 * s) & (span_u <= 60.0 * s)

            lvl = jnp.where(
                fits(0), 0, jnp.where(fits(1), 1, jnp.where(fits(2), 2, 3))
            ).astype(jnp.int32)
            sc = jnp.where(
                lvl == 0,
                1.0,
                jnp.where(lvl == 1, 2.0, jnp.where(lvl == 2, 4.0, 8.0)),
            )
            h_sel = jnp.where(
                lvl == 0,
                mips[0].shape[0],
                jnp.where(lvl == 1, mips[1].shape[0], mips[2].shape[0]),
            )
            w_sel = jnp.where(
                lvl == 0,
                mips[0].shape[1],
                jnp.where(lvl == 1, mips[1].shape[1], mips[2].shape[1]),
            )
            v0r = pl.multiple_of(
                jnp.clip(
                    ((bvmin / sc).astype(jnp.int32) - 1) & ~7, 0, h_sel - WIN_V
                ),
                8,
            )
            u0r = pl.multiple_of(
                jnp.clip(
                    ((bumin / sc).astype(jnp.int32) - 1) & ~63,
                    0,
                    w_sel - WIN_U,
                ),
                64,
            )
            band_dispatch(lvl, v0r, u0r)

    # Persistent planes: recompute for EVERY half of every listed
    # superchunk — including NOOP halves (a SKIP chunk paired with a
    # non-SKIP z-neighbor, or the all-NOOP count==0 entry). A NOOP
    # half's TSDF is unchanged, so recomputation reproduces its prior
    # planes bit-exactly; crucially every active step then writes its
    # FULL planes_out block, so the flush never leaks a previous grid
    # step's VMEM contents into another chunk's persistent planes
    # (planes_in has a constant index_map and is never read — the alias
    # only preserves UN-listed chunks). Early out when no zero crossing
    # can exist (no observed sign change) — most visited chunks are pure
    # free-space carving and skip the whole moment pass.
    if ablate in ("no_planes",):
        return

    @pl.when(cls == CLS_NOOP)
    def _():
        # No update loop ran for this half: fill the sign scratch from
        # the (unchanged) stored values.
        _scan_sign()

    # The update loops (or the NOOP scan above) folded the post-update
    # observed min/max into sign_scratch; one scalar reduce pair decides
    # the early-out.
    mn_t_all = jnp.min(sign_scratch[0, :, :])
    may_cross = (mn_t_all < 0.0) & (jnp.max(sign_scratch[1, :, :]) >= 0.0)
    # Per-z-quarter free-space saturation: every voxel of the (8, 8, 32)
    # quarter carved to +1 at least SAT_W times -> the prepass may treat
    # the quarter as behind whenever it classifies free.
    lane_q = jax.lax.broadcasted_iota(jnp.int32, (8, CHUNK_Z), 1) // (
        CHUNK_Z // N_QUARTERS
    )
    sat_q = []
    for q in range(N_QUARTERS):
        in_q = lane_q == q
        q_minw = jnp.min(jnp.where(in_q, sign_scratch[2, :, :], BIG))
        q_mint = jnp.min(jnp.where(in_q, sign_scratch[0, :, :], BIG))
        q_maxw = jnp.max(jnp.where(in_q, sign_scratch[3, :, :], -1.0))
        # RELAXED criterion over OBSERVED voxels only: no voxel is
        # still actively learning (0 < w < sat_w or an observed
        # t <= 0.999), and something was observed. Unobserved voxels
        # already hold the initial t=+1 free-space value at w=0; the
        # only loss from skipping them is free-space confidence
        # counting, which nothing downstream reads.
        sat_q.append(
            (
                (q_minw >= sat_w) & (q_mint > 0.999) & (q_maxw > 0.0)
            ).astype(jnp.float32)
        )

    class _Chan:
        """Accessor view of this half of the block for
        plane_fields_for_block (needs ``ref[ix] -> (8, nz)`` f32 reads
        and ``.shape[2]``); wraps t_ref / w_ref so both the float and
        int16-packed layouts decode transparently."""

        def __init__(self, fn):
            self.fn = fn
            self.shape = (8, 8, CHUNK_Z)

        def __getitem__(self, ix):
            return self.fn(ix)

    f_row = jax.lax.broadcasted_iota(jnp.int32, (N_FIELDS, NSUB_C), 0)
    f_col = jax.lax.broadcasted_iota(jnp.int32, (N_FIELDS, NSUB_C), 1)
    sat_row = jnp.zeros((N_FIELDS, NSUB_C), jnp.float32)
    for q in range(N_QUARTERS):
        sat_row = jnp.where(
            (f_row == FIELD_SAT) & (f_col == q), sat_q[q], sat_row
        )
    # Column N_QUARTERS: any OBSERVED negative tsdf voxel in this chunk.
    # The prepass reads it to decide free-superblock eligibility
    # (chunk_select.FreeWorkList): carving a chunk with no negatives can
    # never create a zero crossing, so the free-carve kernel may skip
    # plane refitting for it.
    sat_row = jnp.where(
        (f_row == FIELD_SAT) & (f_col == N_QUARTERS),
        (mn_t_all < 0.0).astype(jnp.float32),
        sat_row,
    )

    @pl.when(may_cross)
    def _():
        fields = plane_fields_for_block(
            _Chan(t_ref),
            _Chan(w_ref),
            ci_g,
            cj,
            vs=vs,
            ox=ox,
            oy=oy,
            oz=oz,
            nbx=nbx,
            min_count=6.0,
            k=ckc,
            nzc=nzc,
        )
        # Surface quarters have crossings (not saturated-free), but the
        # OTHER quarters of a crossing chunk can still saturate — keep
        # their flags.
        planes_out[xh, 0, h, :, :] = jnp.where(
            f_row == FIELD_SAT, sat_row, fields
        )

    @pl.when(~may_cross)
    def _():
        planes_out[xh, 0, h, :, :] = sat_row


def _free_kernel(
    bitmap,  # scalar prefetch: (n_sb,) 16 member bits per superblock
    bi_a,  # scalar prefetch: superblock coords (32-voxel x/y units)
    bj_a,
    bk_a,  # chunk z index
    cnt,  # scalar prefetch: (1,) real count
    params,  # SMEM (32,) — same layout as _kernel
    vol_in,  # VMEM (32, 32, 128) packed or (2, 32, 32, 128) float
    planes_in,  # VMEM (4, 4, 1, N_FIELDS, NSUB_C) — aliased AND read
    vol_out,
    planes_out,
    sat_w=SAT_W,
):
    """Minimal free-space-carve kernel for pure-free superblocks.

    One grid step processes a (32, 32, 128)-voxel superblock = 16
    chunks, replacing ~16 main-kernel work-list entries whose cost is
    per-entry pipeline bookkeeping, not math (~1.35us/entry measured —
    the integrate's dominant cost at steady state, where ~80% of listed
    chunks are plain carving). The carve body is copied verbatim from
    _process_half's CLS_FREE branch so member chunks update
    BIT-IDENTICALLY to the main kernel; non-member chunks (bitmap bit
    0: out of frustum / behind / saturated) are masked to exact
    writeback. Eligibility (chunk_select.FreeWorkList) guarantees no
    member chunk holds an observed negative tsdf voxel, so carving
    cannot create a zero crossing and the plane refit is skipped:
    planes are copied through (planes_in is aliased with the SAME
    index_map and genuinely read — the copy-first pattern that keeps
    every flushed block fully written), with only member chunks'
    FIELD_SAT rows recomputed (saturation flags + the always-0
    negative flag), exactly what the main kernel's ~may_cross branch
    would write.
    """
    step = pl.program_id(0)
    bm = bitmap[step]
    sbi = bi_a[step]
    sbj = bj_a[step]
    ck = bk_a[step]

    r00, r01, r02 = params[0], params[1], params[2]
    r10, r11, r12 = params[3], params[4], params[5]
    r20, r21, r22 = params[6], params[7], params[8]
    tx, ty, tz = params[9], params[10], params[11]
    fx, fy, cx, cy = params[12], params[13], params[14], params[15]
    vs = params[17]
    ox, oy, oz = params[18], params[19], params[20]
    max_weight = params[21]
    img_w = params[22]
    img_h = params[23]
    bx0 = params[26].astype(jnp.int32)

    active = step < cnt[0]

    @pl.when(active)
    def _process():
        vol_out[...] = vol_in[...]
        planes_out[...] = planes_in[...]

        packed = len(vol_out.shape) == 3
        if packed:
            def t_ref(ix):
                v = vol_out[ix, :, :]
                return (v >> 16).astype(jnp.float32) * (1.0 / 32767.0)

            def w_ref(ix):
                return (vol_out[ix, :, :] & 0xFFFF).astype(jnp.float32)

            def tw_set(ix, t, w):
                ti = jnp.round(
                    jnp.clip(t, -1.0, 1.0) * 32767.0
                ).astype(jnp.int32)
                vol_out[ix, :, :] = (ti << 16) | w.astype(jnp.int32)

        else:
            vdt = vol_out.dtype

            def t_ref(ix):
                return vol_out[0, ix, :, :].astype(jnp.float32)

            def w_ref(ix):
                return vol_out[1, ix, :, :].astype(jnp.float32)

            def tw_set(ix, t, w):
                vol_out[0, ix, :, :] = t.astype(vdt)
                vol_out[1, ix, :, :] = w.astype(vdt)

        zlane = jax.lax.broadcasted_iota(
            jnp.int32, (32, CHUNK_Z), 1
        ).astype(jnp.float32) + (ck * CHUNK_Z).astype(jnp.float32)
        iy_sub = jax.lax.broadcasted_iota(
            jnp.int32, (32, CHUNK_Z), 0
        ).astype(jnp.float32)
        subq = jax.lax.broadcasted_iota(jnp.int32, (32, CHUNK_Z), 0) // 8
        laneq = jax.lax.broadcasted_iota(jnp.int32, (32, CHUNK_Z), 1) // (
            CHUNK_Z // N_QUARTERS
        )
        ones_t = jnp.ones((32, CHUNK_Z), jnp.float32)
        big_t = jnp.full((32, CHUNK_Z), BIG, jnp.float32)
        f_row = jax.lax.broadcasted_iota(jnp.int32, (N_FIELDS, NSUB_C), 0)
        f_col = jax.lax.broadcasted_iota(jnp.int32, (N_FIELDS, NSUB_C), 1)

        for qi in range(4):
            col_bits = (bm >> (qi * 4)) & 0xF

            @pl.when(col_bits != 0)
            def _(qi=qi):
                ci_g = sbi * 4 + qi + bx0
                member = jnp.zeros((32, CHUNK_Z), bool)
                for qj in range(4):
                    bit = ((bm >> (qi * 4 + qj)) & 1) > 0
                    member = member | ((subq == qj) & bit)

                # Verbatim CLS_FREE body (see _process_half) on
                # (32, 128) y-z tiles: iv is additionally masked by
                # chunk membership, which reduces non-member rows to
                # exact writeback (wadd = 0).
                def body(ix8, carry):
                    mn_t, mn_w, mx_w = carry
                    ix = qi * 8 + ix8
                    ix_f = ix8.astype(jnp.float32)
                    xw = ox + (ci_g * 8 + ix_f + 0.5) * vs
                    yw = oy + (sbj * 32 + iy_sub + 0.5) * vs
                    zw = oz + (zlane + 0.5) * vs
                    dx = xw - tx
                    dy = yw - ty
                    dz = zw - tz
                    xc = dx * r00 + dy * r01 + dz * r02
                    yc = dx * r10 + dy * r11 + dz * r12
                    zc = dx * r20 + dy * r21 + dz * r22
                    fxx = fx * xc
                    fyy = fy * yc
                    iv = (
                        (zc > 1e-6)
                        & (fxx >= -cx * zc)
                        & (fxx <= (img_w - 1.0 - cx) * zc)
                        & (fyy >= -cy * zc)
                        & (fyy <= (img_h - 1.0 - cy) * zc)
                    )
                    iv = iv & member
                    told = t_ref(ix)
                    wold = w_ref(ix)
                    wadd = iv.astype(jnp.float32)
                    wnew = jnp.minimum(wold + wadd, max_weight)
                    denom = jnp.maximum(wold + wadd, 1.0)
                    tnew = (told * wold + wadd) / denom
                    tcur = jnp.where(iv, tnew, told)
                    tw_set(ix, tcur, wnew)
                    obs = wnew > 0.0
                    mn_t = jnp.minimum(mn_t, jnp.where(obs, tcur, 1.0))
                    mn_w = jnp.minimum(mn_w, jnp.where(obs, wnew, BIG))
                    mx_w = jnp.maximum(mx_w, wnew)
                    return mn_t, mn_w, mx_w

                mn_t, mn_w, mx_w = jax.lax.fori_loop(
                    0, 8, body, (ones_t, big_t, -ones_t)
                )

                for qj in range(4):
                    bit = ((bm >> (qi * 4 + qj)) & 1) > 0

                    @pl.when(bit)
                    def _(qi=qi, qj=qj):
                        rowm = subq == qj
                        tile = jnp.zeros(
                            (N_FIELDS, NSUB_C), jnp.float32
                        )
                        for q in range(N_QUARTERS):
                            m = rowm & (laneq == q)
                            q_minw = jnp.min(jnp.where(m, mn_w, BIG))
                            q_mint = jnp.min(jnp.where(m, mn_t, BIG))
                            q_maxw = jnp.max(jnp.where(m, mx_w, -1.0))
                            sat = (
                                (q_minw >= sat_w)
                                & (q_mint > 0.999)
                                & (q_maxw > 0.0)
                            ).astype(jnp.float32)
                            tile = jnp.where(
                                (f_row == FIELD_SAT) & (f_col == q),
                                sat,
                                tile,
                            )
                        planes_out[qi, qj, 0] = tile


def _pad_to(m: jnp.ndarray, rows_mult: int, cols_to: int) -> jnp.ndarray:
    """EDGE-pad to aligned dims (last real row/col replicated through
    ALL the padding). Two reasons, both about the band kernel:

      * A bilinear footprint at the image's last row/col extends one
        sample past the mip's real grid; replication makes that border
        lookup nearest-row/col extrapolation — exact on the border
        pixel itself, sub-mm on smooth surfaces.
      * Zero padding reads as INVALID depth, and a single zero anywhere
        in a window pushes the whole window onto the 3n-row
        renormalized band path even though in-view samples never put
        nonzero hat weight past the first replica (tile_coords'
        in_view test caps uf/vf at the REAL image bounds). Edge values
        keep padding-only windows on the 2n all-valid fast path — on a
        fully-valid frame that is every band chunk, including the
        whole-image L3 window. Real in-image invalid pixels (depth 0)
        still force the renormalized path, as they must.

    Dims are padded from h+1/w+1 so the bilinear replica always fits;
    ops/chunk_select.py mirrors the same formulas."""
    h, w = m.shape
    hp = max(-(-(h + 1) // rows_mult) * rows_mult, WIN_V)
    wp = max(cols_to, -(-(w + 1) // 128) * 128, WIN_U)
    return jnp.pad(m, ((0, hp - h), (0, wp - w)), mode="edge")


def _shift64(m: jnp.ndarray) -> jnp.ndarray:
    """64-px-left-shifted copy: shifted[:, i] = m[:, i + 64] (edge pad).

    Lets a 64-aligned window origin slice 128-aligned lanes: an odd
    64-slot u0 reads shifted[:, u0-64 : u0+64] == m[:, u0 : u0+128].
    The new right tail replicates the last column — identical to the
    edge padding those columns hold in ``m`` itself."""
    return jnp.pad(m[:, 64:], ((0, 0), (0, 64)), mode="edge")


def build_depth_mips(depth: jnp.ndarray):
    """L0..L2 padded mips (+ 64-px-shifted copies) + the whole-image L3
    window (0 = invalid depth; padding is edge-replicated, see _pad_to).

    L3 is sized to the /8 image — (64, 128) for 640x480 instead of a
    fixed (64, 256) worst case. L3-window chunks are ~3/4 of the band
    path's MXU MACs at 512^3 (they pay rows x L3_U x 128 per tile dot),
    and hat weights past the image edge are zero, so the fixed wide
    window only multiplied zeros. Mip halving runs as the same exact
    one-hot MXU selection as kinfu/maps.halve_maps — a [::2, ::2]
    strided slice is a gather-class op on this backend (~9 ns/element,
    ~0.9 ms for the three mip levels)."""
    from housescan_tpu.kinfu.maps import halve_maps

    assert depth.shape[0] % 8 == 0 and depth.shape[1] % 8 == 0, depth.shape
    d0 = depth
    d1 = halve_maps(d0[None])[0]
    d2 = halve_maps(d1[None])[0]
    d3 = halve_maps(d2[None])[0]

    w = depth.shape[1]
    m0 = _pad_to(d0, 8, -(-w // 128) * 128)
    m1 = _pad_to(d1, 8, -(-d1.shape[1] // 128) * 128)
    m2 = _pad_to(d2, 8, -(-d2.shape[1] // 128) * 128)
    h3, w3 = d3.shape
    l3_v = max(-(-(h3 + 1) // 8) * 8, 8)
    l3_u = max(-(-(w3 + 1) // 128) * 128, 128)
    l3 = jnp.pad(d3, ((0, l3_v - h3), (0, l3_u - w3)), mode="edge")
    return m0, m1, m2, _shift64(m0), _shift64(m1), _shift64(m2), l3


@partial(
    jax.jit,
    static_argnames=(
        "intr", "interpret", "ablate", "sat_w", "free_split", "max_entries",
    ),
    donate_argnums=(0, 1),
)
def tsdf_integrate_stream(
    vol: TsdfVolume,
    planes: jnp.ndarray,
    depth: jnp.ndarray,
    pose: jnp.ndarray,
    intr: Intrinsics,
    max_weight: float = 128.0,
    interpret: bool = False,
    ablate: str = "none",
    sat_w: float = SAT_W,
    global_blocks=None,
    free_split: bool = True,
    max_entries: int = None,
):
    """Work-list TSDF integrate + persistent plane refresh.

    ``planes`` is the persistent (nbx_x, nbx_y, nzc, N_FIELDS, NSUB_C)
    array from the previous step (zeros initially). Returns
    (vol, planes). ``global_blocks`` = (global_nbx, block_x0) for a
    mesh-sharded X-slab: block_x0 (traced, e.g. from axis_index) offsets
    the X block index in ALL world-coordinate arithmetic and in the
    plane sub-block IDs, and ``vol.origin`` must then be the GLOBAL
    volume origin — the slab's f32 geometry is bit-identical to the
    single-chip run's, which is what makes sharded-vs-single trajectory
    parity exact rather than merely close.
    """
    dims = vol.dims
    assert all(d % 8 == 0 for d in dims) and dims[2] % CHUNK_Z == 0, dims
    packed = vol.data.ndim == 3
    if packed:
        assert vol.data.dtype == jnp.int32, vol.data.dtype
    else:
        assert vol.data.dtype in (jnp.float32, jnp.bfloat16)
    nbx_x = dims[0] // 8
    nbx_y = dims[1] // 8
    nzc = dims[2] // CHUNK_Z
    assert planes.shape == planes_shape(dims), planes.shape
    if global_blocks is None:
        id_nbx, block_x0 = nbx_x, jnp.int32(0)
    else:
        id_nbx, block_x0 = global_blocks[0], global_blocks[1]
    # super_z=2 measured best: z-4-wide entries merge mostly-
    # (listed, skip) sibling pairs, going from 4160 active entries of
    # 8192 to ~4096 of 4096 — no step savings, double the streamed
    # bytes. X-pairing is the opposite story: 95.8% of the steady-state
    # main list's entries have their x-sibling listed (surfaces are
    # x-coherent; the 512^3 bench census), so super_x=2 entries nearly
    # HALVE the per-step pipeline floor at +4% half-work (the ~4% lone
    # entries carry NOOP sibling halves, whose plane recompute
    # reproduces the stored planes bit-exactly). MUST match
    # chunk_select.build_worklist's grouping decision.
    super_z = 2 if nzc % 2 == 0 else 1
    super_x = 2 if (nbx_x % 2 == 0 and SUPER_X_CAP >= 2) else 1

    depth = depth.astype(jnp.float32)
    # Persistent free-space saturation flags (written by this kernel on
    # every visit, planes row FIELD_SAT cols 0-3): free+saturated
    # quarters are treated as behind by the prepass.
    sat_q = (
        planes[:, :, :, FIELD_SAT, :N_QUARTERS].reshape(-1, N_QUARTERS)
        > 0.5
    )
    # Persistent any-observed-negative flags (FIELD_SAT col N_QUARTERS):
    # gate the pure-free superblock shortcut (see _free_kernel).
    neg_c = planes[:, :, :, FIELD_SAT, N_QUARTERS].reshape(-1) > 0.5
    if ablate == "none" and free_split:
        wl, free_wl = build_worklist(
            depth, pose, intr, dims, vol.voxel_size, vol.origin,
            vol.trunc, sat_quarters=sat_q, block_x0=block_x0,
            neg_flags=neg_c, free_split=True,
        )
    else:
        wl = build_worklist(
            depth, pose, intr, dims, vol.voxel_size, vol.origin,
            vol.trunc, sat_quarters=sat_q, block_x0=block_x0,
        )
        free_wl = None
    m0, m1, m2, m0s, m1s, m2s, l3 = build_depth_mips(depth)

    rot = pose[:3, :3]
    t = pose[3, :3]
    params = jnp.concatenate(
        [
            rot.reshape(-1),
            t.reshape(-1),
            jnp.array([intr.fx, intr.fy, intr.cx, intr.cy], jnp.float32),
            vol.trunc.reshape(1),
            vol.voxel_size.reshape(1),
            vol.origin.reshape(-1),
            jnp.array(
                [max_weight, intr.width, intr.height], jnp.float32
            ),
            jnp.asarray(id_nbx, jnp.float32).reshape(1),
            jnp.asarray(nzc, jnp.float32).reshape(1),
            jnp.asarray(block_x0, jnp.float32).reshape(1),
            jnp.zeros((5,), jnp.float32),
        ]
    ).astype(jnp.float32)

    n_entries = (nbx_x // super_x) * nbx_y * (nzc // super_z)
    # TESTING-ONLY grid cap: interpret mode executes every PADDED grid
    # step in Python (on hardware a padded step's repeated block index
    # elides its DMAs, ~80ns), so interpret tests on scenes whose active
    # count is far below capacity pay minutes re-running the kernel body
    # on padding. Capping slices the (already padded-by-repetition) work
    # lists; if the cap is below the ACTIVE count, entries are silently
    # dropped — callers own choosing a safe margin, and the parity
    # asserts in tests catch a cap set too low. Never set in production.
    if max_entries is not None:
        n_entries = min(n_entries, max_entries)
        wl = wl._replace(
            packed=wl.packed[:n_entries],
            packed_hi=wl.packed_hi[:n_entries],
            count=jnp.minimum(wl.count, n_entries),
            bi=wl.bi[:n_entries],
            bj=wl.bj[:n_entries],
            bk=wl.bk[:n_entries],
        )

    if free_wl is not None:
        # Pure-free superblocks first (disjoint chunks): ~15x fewer
        # grid steps than the main kernel would spend on them. The main
        # kernel then runs on the remaining band/refine/spilled list.
        n_sb = (nbx_x // 4) * (nbx_y // 4) * nzc
        if packed:
            def fim_vol(s, bm, bi, bj, bk, cnt):
                return (bi[s], bj[s], bk[s])

            fvol_block = (32, 32, CHUNK_Z)
        else:
            def fim_vol(s, bm, bi, bj, bk, cnt):
                return (0, bi[s], bj[s], bk[s])

            fvol_block = (2, 32, 32, CHUNK_Z)

        def fim_planes(s, bm, bi, bj, bk, cnt):
            return (bi[s], bj[s], bk[s], 0, 0)

        fplanes_spec = pl.BlockSpec(
            (4, 4, 1, N_FIELDS, NSUB_C), fim_planes
        )
        fgrid = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(n_sb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(fvol_block, fim_vol),
                fplanes_spec,
            ],
            out_specs=[
                pl.BlockSpec(fvol_block, fim_vol),
                fplanes_spec,
            ],
        )
        vdata, planes = pl.pallas_call(
            partial(_free_kernel, sat_w=sat_w),
            grid_spec=fgrid,
            out_shape=[
                jax.ShapeDtypeStruct(vol.data.shape, vol.data.dtype),
                jax.ShapeDtypeStruct(planes.shape, jnp.float32),
            ],
            input_output_aliases={6: 0, 7: 1},
            interpret=interpret,
        )(
            free_wl.bitmap, free_wl.bi, free_wl.bj, free_wl.bk,
            free_wl.count, params, vol.data, planes,
        )
        vol = vol._replace(data=vdata)

    # bi holds the entry's BASE x block (even when super_x == 2); the
    # block index is in block-shape units, hence the // super_x.
    if packed:
        def im_vol(s, wl, wh, bi, bj, bk, cnt):
            return (bi[s] // super_x, bj[s], bk[s])

        vol_block = (8 * super_x, 8, CHUNK_Z * super_z)
    else:
        def im_vol(s, wl, wh, bi, bj, bk, cnt):
            return (0, bi[s] // super_x, bj[s], bk[s])

        vol_block = (2, 8 * super_x, 8, CHUNK_Z * super_z)

    def im_planes(s, wl, wh, bi, bj, bk, cnt):
        return (bi[s] // super_x, bj[s], bk[s], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n_entries,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(vol_block, im_vol),
            # planes_in exists only to alias planes_out (the kernel never
            # reads it): a CONSTANT index_map fires its block DMA once
            # instead of per step.
            pl.BlockSpec(
                (super_x, 1, super_z, N_FIELDS, NSUB_C),
                lambda s, wl, wh, bi, bj, bk, cnt: (0, 0, 0, 0, 0),
            ),
        ],
        out_specs=[
            pl.BlockSpec(vol_block, im_vol),
            pl.BlockSpec(
                (super_x, 1, super_z, N_FIELDS, NSUB_C), im_planes
            ),
        ],
        scratch_shapes=[pltpu.VMEM((4, 8, CHUNK_Z), jnp.float32)],
    )

    out_data, out_planes = pl.pallas_call(
        partial(
            _kernel,
            super_z=super_z,
            super_x=super_x,
            ablate=ablate,
            sat_w=sat_w,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(vol.data.shape, vol.data.dtype),
            jax.ShapeDtypeStruct(planes.shape, jnp.float32),
        ],
        input_output_aliases={14: 0, 15: 1},
        interpret=interpret,
    )(
        wl.packed, wl.packed_hi, wl.bi, wl.bj, wl.bk, wl.count,
        params, m0, m1, m2, m0s, m1s, m2s, l3, vol.data, planes,
    )

    return vol._replace(data=out_data), out_planes
