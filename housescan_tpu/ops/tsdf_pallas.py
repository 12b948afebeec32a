"""Pallas TSDF integration kernel.

The XLA gather-side integrate is correct but gather-bound (~12s/frame at
512^3 on v5e: XLA lowers the 134M-element depth lookup to near-scalar
code). This kernel restructures the lookup the TPU way:

  * Grid over (8, 8, 512) volume columns; tsdf/weight blocks stream
    through VMEM via BlockSpecs with input-output aliasing (in-place in
    HBM, like the donated XLA path).
  * The depth MIP pyramid (L0..L2 + a padded L3) is small enough to live
    entirely in VMEM (~1.7MB), so 'gathering' depth becomes slicing.
  * Each column splits into 4 z-chunks of (8, 8, 128). Per chunk, a
    coordinate pass computes the camera-space bounding box, and an
    aligned slab of a 60x80 min/max depth mip classifies the chunk:
    SKIP (out of frustum / fully behind the surface), FREE (confidently
    in front — the classic tsdf->+1, weight++ update needs no depth
    values), or BAND (needs exact depth).
  * BAND chunks slice an ALIGNED (32, 256) window from the mip level
    whose scale fits the footprint (VMEM tiling demands sublane starts
    divisible by 8 and lane starts by 128 — hence 256-wide windows
    aligned down to 128). The per-voxel bilinear depth lookup is then a
    ONE-HOT MATMUL: for each 128-voxel z-run, row weights
    relu(1 - |v - j|) contract against the window on the MXU, then a
    column one-hot multiply-reduce. A parallel denominator matmul
    renormalizes away invalid (0) depth pixels, like the XLA reference's
    _bilinear_depth.

All voxel math stays in natural (sublane=x, lane=z) layout — no
relayouts anywhere. Scalars ride in SMEM; per-chunk control flow is
scalar-predicated (@pl.when).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from housescan_tpu.kinfu.camera import Intrinsics
from housescan_tpu.kinfu.tsdf import TsdfVolume

WIN_V = 32
WIN_U = 256
L3_V = 64
L3_U = 256
CHUNK_Z = 128
BIG = 1.0e9


def _kernel(
    params,  # SMEM (32,) f32
    mip0,
    mip1,
    mip2,
    l3,  # VMEM padded depth mips (0 = invalid)
    l3min,
    l3max,  # VMEM (64, 128) L3 min/max (min holds BIG for invalid)
    l3valid,  # VMEM (64, 128) 1.0 where ALL 64 block pixels are valid
    tsdf_in,
    w_in,  # VMEM (8, 8, 512)
    tsdf_out,
    w_out,  # VMEM (8, 8, 512)
    planes_out,  # VMEM (1, 1, N_FIELDS, 128): per-sub-block surface planes
):
    i = pl.program_id(0)
    j = pl.program_id(1)

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

    tsdf_out[...] = tsdf_in[...]
    w_out[...] = w_in[...]

    # Tile-wise coordinates: (8, 128) with SUBLANE = iy and LANE = z.
    # Per-row (1, 128) processing wastes 7/8 of every VPU op; keeping all
    # 8 y-rows of an x-slab in one tile is an ~8x win for the coordinate,
    # classification, and update math (the per-row one-hot matmuls keep
    # their shape — slicing a value row is free).
    zlane = jax.lax.broadcasted_iota(jnp.int32, (8, CHUNK_Z), 1).astype(jnp.float32)
    iy_sub = jax.lax.broadcasted_iota(jnp.int32, (8, CHUNK_Z), 0).astype(jnp.float32)

    def tile_coords(ix_f, zc_f):
        """Camera and pixel coords for an (8 iy, 128 z) slab tile."""
        xw = ox + (i * 8 + ix_f + 0.5) * vs
        yw = oy + (j * 8 + iy_sub + 0.5) * vs
        zw = oz + (zc_f * CHUNK_Z + zlane + 0.5) * vs
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

    def update_tiles(zchunk, zc_f, get_depth_tile):
        """Shared RMW over the chunk's 8 x-slabs; ``get_depth_tile``
        returns (d, has_depth) as (8, 128) tiles for a slab's (uf, vf).

        The outer fori runs over ix (dim 0 of the block — dynamic
        indexing is allowed there); each iteration reads/writes a full
        (8 iy, 128 z) tile, so every VPU op runs at full sublane
        occupancy."""

        def body(ix, _):
            uf, vf, zc, iv = tile_coords(ix.astype(jnp.float32), zc_f)
            d, has_depth = get_depth_tile(uf, vf)
            sdf = d - zc
            update = iv & has_depth & (sdf >= -trunc)
            sample = jnp.clip(sdf / trunc, -1.0, 1.0)

            zoff = zchunk * CHUNK_Z
            told = tsdf_out[ix, :, pl.ds(zoff, CHUNK_Z)]
            wold = w_out[ix, :, pl.ds(zoff, CHUNK_Z)]
            wadd = update.astype(jnp.float32)
            wnew = jnp.minimum(wold + wadd, max_weight)
            denom = jnp.maximum(wold + wadd, 1.0)
            tnew = (told * wold + sample * wadd) / denom
            tsdf_out[ix, :, pl.ds(zoff, CHUNK_Z)] = jnp.where(update, tnew, told)
            w_out[ix, :, pl.ds(zoff, CHUNK_Z)] = wnew
            return 0

        jax.lax.fori_loop(0, 8, body, 0)

    def process_chunk(zchunk):
        zc_f = zchunk.astype(jnp.float32)

        # ---- chunk bounding box, one (8, 128) tile per x-slab ----
        def bbox_body(ix, carry):
            umin, umax, vmin, vmax, zmin, zmax, anyv = carry
            big = jnp.float32(BIG)
            uf, vf, zc, iv = tile_coords(ix.astype(jnp.float32), zc_f)
            umin = jnp.minimum(umin, jnp.min(jnp.where(iv, uf, big)))
            umax = jnp.maximum(umax, jnp.max(jnp.where(iv, uf, -big)))
            vmin = jnp.minimum(vmin, jnp.min(jnp.where(iv, vf, big)))
            vmax = jnp.maximum(vmax, jnp.max(jnp.where(iv, vf, -big)))
            zmin = jnp.minimum(zmin, jnp.min(jnp.where(iv, zc, big)))
            zmax = jnp.maximum(zmax, jnp.max(jnp.where(iv, zc, -big)))
            anyv = anyv | jnp.any(iv)
            return umin, umax, vmin, vmax, zmin, zmax, anyv

        big = jnp.float32(BIG)
        umin, umax, vmin, vmax, zmin, zmax, any_view = jax.lax.fori_loop(
            0, 8, bbox_body, (big, -big, big, -big, big, -big, False)
        )

        # ---- L3 slab min/max depth over the footprint ----
        r0 = jnp.clip((vmin / 8.0).astype(jnp.int32) - 1, 0, L3_V - 24) & ~7
        r0 = pl.multiple_of(r0, 8)
        rect_min = l3min[pl.ds(r0, 24), :]
        rect_max = l3max[pl.ds(r0, 24), :]
        rect_valid = l3valid[pl.ds(r0, 24), :]
        rows = (
            jax.lax.broadcasted_iota(jnp.int32, (24, 128), 0).astype(jnp.float32)
            + r0.astype(jnp.float32)
        )
        cols = jax.lax.broadcasted_iota(jnp.int32, (24, 128), 1).astype(jnp.float32)
        in_rect = (
            (cols >= umin / 8.0 - 1.0)
            & (cols <= umax / 8.0 + 1.0)
            & (rows >= vmin / 8.0 - 1.0)
            & (rows <= vmax / 8.0 + 1.0)
        )
        dmin = jnp.min(jnp.where(in_rect, rect_min, big))
        dmax = jnp.max(jnp.where(in_rect, rect_max, -big))
        all_valid = jnp.min(jnp.where(in_rect, rect_valid, 1.0)) > 0.5

        bbox_fits = ((umax - umin) <= 120.0) & ((vmax - vmin) <= 120.0)
        behind = bbox_fits & (zmin - trunc > dmax)
        # FREE also demands every footprint pixel valid: the reference
        # never updates voxels that project to invalid (0) depth.
        free = bbox_fits & (zmax + trunc < dmin) & (dmax > 0.0) & all_valid
        band = any_view & (~behind) & (~free)
        do_free = any_view & free

        @pl.when(do_free)
        def _():
            def free_depth(uf, vf):
                # Everything in front: a huge d gives sample = +1 exactly.
                return jnp.full((8, CHUNK_Z), BIG, jnp.float32), jnp.full(
                    (8, CHUNK_Z), True
                )

            update_tiles(zchunk, zc_f, free_depth)

        @pl.when(band)
        def _():
            span_u = umax - umin
            span_v = vmax - vmin

            def fits(l):
                # Thresholds match the streaming kernel's half-width
                # windows (ops/tsdf_stream.py): same level selection
                # keeps the two kernels numerically comparable. The
                # dense kernel's own 256-wide windows cover these spans
                # with margin.
                s = float(1 << l)
                return (span_v <= 22.0 * s) & (span_u <= 60.0 * s)

            level = jnp.where(
                fits(0), 0, jnp.where(fits(1), 1, jnp.where(fits(2), 2, 3))
            ).astype(jnp.int32)
            scale = jnp.where(
                level == 0,
                1.0,
                jnp.where(level == 1, 2.0, jnp.where(level == 2, 4.0, 8.0)),
            )

            def aligned_origin(lvl, mip_ref, wv):
                s = float(1 << lvl)
                h_l, w_l = mip_ref.shape
                v0 = jnp.clip(
                    ((vmin / s).astype(jnp.int32) - 1) & ~7, 0, h_l - wv
                )
                u0 = jnp.clip(
                    ((umin / s).astype(jnp.int32) - 1) & ~127, 0, w_l - WIN_U
                )
                return pl.multiple_of(v0, 8), pl.multiple_of(u0, 128)

            v0_0, u0_0 = aligned_origin(0, mip0, WIN_V)
            v0_1, u0_1 = aligned_origin(1, mip1, WIN_V)
            v0_2, u0_2 = aligned_origin(2, mip2, WIN_V)
            v0 = jnp.where(
                level == 0, v0_0, jnp.where(level == 1, v0_1, jnp.where(level == 2, v0_2, 0))
            ).astype(jnp.float32)
            u0 = jnp.where(
                level == 0, u0_0, jnp.where(level == 1, u0_1, jnp.where(level == 2, u0_2, 0))
            ).astype(jnp.float32)

            rows32 = jax.lax.broadcasted_iota(jnp.int32, (WIN_V, CHUNK_Z), 0).astype(
                jnp.float32
            )
            rows64 = jax.lax.broadcasted_iota(jnp.int32, (L3_V, CHUNK_Z), 0).astype(
                jnp.float32
            )
            cols_i = jax.lax.broadcasted_iota(jnp.int32, (WIN_U, CHUNK_Z), 0).astype(
                jnp.float32
            )

            def band_update(window, rows_iota):
                """window (R, WIN_U); one-hot bilinear lookup, one matmul
                pair per (1, 128) z-run, tile-wise everything else."""
                valid_w = (window > 0.0).astype(jnp.float32)
                num_t = window.T  # (WIN_U, R)
                den_t = valid_w.T
                n_rows = window.shape[0]

                def get_depth_tile(uf, vf):
                    uw = uf / scale - u0
                    vw = vf / scale - v0
                    # Full bilinear footprint must lie INSIDE the window:
                    # a projection past the edge gets partial hat-weight
                    # sums whose renormalization extrapolates the edge
                    # pixel — phantom band values at FOV/window borders
                    # (see ops/tsdf_stream.py band support comment).
                    supp = (
                        (uw >= 0.0)
                        & (uw <= float(WIN_U - 1))
                        & (vw >= 0.0)
                        & (vw <= float(n_rows - 1))
                    )
                    d_rows = []
                    den_rows = []
                    for iy in range(8):
                        wr = jnp.maximum(
                            0.0, 1.0 - jnp.abs(vw[iy : iy + 1, :] - rows_iota)
                        )
                        wc = jnp.maximum(
                            0.0, 1.0 - jnp.abs(uw[iy : iy + 1, :] - cols_i)
                        )
                        tnum = jax.lax.dot_general(
                            num_t, wr, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST,
                        )  # (WIN_U, Z)
                        tden = jax.lax.dot_general(
                            den_t, wr, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST,
                        )
                        d_rows.append(jnp.sum(tnum * wc, axis=0).reshape(1, CHUNK_Z))
                        den_rows.append(jnp.sum(tden * wc, axis=0).reshape(1, CHUNK_Z))
                    num = jnp.concatenate(d_rows, axis=0)  # (8, Z)
                    den = jnp.concatenate(den_rows, axis=0)
                    d = num / jnp.maximum(den, 1e-12)
                    return d, supp & (den > 1e-6)

                update_tiles(zchunk, zc_f, get_depth_tile)

            @pl.when(level == 0)
            def _():
                band_update(mip0[pl.ds(v0_0, WIN_V), pl.ds(u0_0, WIN_U)], rows32)

            @pl.when(level == 1)
            def _():
                band_update(mip1[pl.ds(v0_1, WIN_V), pl.ds(u0_1, WIN_U)], rows32)

            @pl.when(level == 2)
            def _():
                band_update(mip2[pl.ds(v0_2, WIN_V), pl.ds(u0_2, WIN_U)], rows32)

            @pl.when(level == 3)
            def _():
                band_update(l3[...], rows64)

    for zchunk in range(4):
        process_chunk(jnp.int32(zchunk))

    # ---- fused surface-plane extraction --------------------------------
    # The raycast consumes per-(8,8,SUB_Z)-sub-block surface planes
    # fitted to TSDF zero crossings (plane_fields_for_block in
    # ops/planes_pallas.py holds the math); computing them here, over
    # the just-updated VMEM tiles, saves a full second pass over the
    # 1GB volume every frame.
    from housescan_tpu.ops.planes_pallas import SUB_Z, plane_fields_for_block

    nsub_pl = tsdf_in.shape[2] // SUB_Z
    fieldsp = plane_fields_for_block(
        tsdf_out, w_out, i, j,
        vs=vs, ox=ox, oy=oy, oz=oz,
        nbx=pl.num_programs(0), min_count=6.0,
    )
    planes_out[0, 0, :, :] = jnp.concatenate(
        [fieldsp, jnp.zeros((fieldsp.shape[0], 128 - nsub_pl), jnp.float32)], axis=1
    )


def _pad_to(m: jnp.ndarray, rows_mult: int, cols_to: int) -> jnp.ndarray:
    """Pad rows to a multiple of ``rows_mult`` and columns to ``cols_to``
    (zeros = invalid depth) with the last REAL row/col replicated once
    into the padding — bilinear footprints at the image's last row/col
    extend one sample past the real grid (see
    ops/tsdf_stream._pad_to)."""
    h, w = m.shape
    hp = max(-(-(h + 1) // rows_mult) * rows_mult, WIN_V)
    wp = max(cols_to, -(-(w + 1) // 128) * 128, WIN_U)
    out = jnp.zeros((hp, wp), jnp.float32)
    out = out.at[:h, :w].set(m)
    out = out.at[h, :w].set(m[h - 1])
    out = out.at[:h, w].set(m[:, w - 1])
    return out.at[h, w].set(m[h - 1, w - 1])


def _build_mips(depth: jnp.ndarray):
    d0 = depth
    d1 = d0[::2, ::2]
    d2 = d1[::2, ::2]
    d3 = d2[::2, ::2]

    w = depth.shape[1]
    m0 = _pad_to(d0, 8, -(-w // 128) * 128)
    m1 = _pad_to(d1, 8, -(-d1.shape[1] // 128) * 128)
    m2 = _pad_to(d2, 8, -(-d2.shape[1] // 128) * 128)

    h3, w3 = d3.shape
    l3 = jnp.zeros((L3_V, L3_U), jnp.float32).at[:h3, :w3].set(d3)
    l3 = l3.at[h3, :w3].set(d3[h3 - 1])
    l3 = l3.at[:h3, w3].set(d3[:, w3 - 1])
    l3 = l3.at[h3, w3].set(d3[h3 - 1, w3 - 1])

    h, wd = depth.shape
    blocks = depth[: h - h % 8, : wd - wd % 8].reshape(h // 8, 8, wd // 8, 8)
    bmax = jnp.max(blocks, axis=(1, 3))
    bmin = jnp.min(jnp.where(blocks > 0, blocks, BIG), axis=(1, 3))
    l3min = jnp.full((L3_V, 128), BIG, jnp.float32).at[: h // 8, : wd // 8].set(bmin)
    l3max = jnp.zeros((L3_V, 128), jnp.float32).at[: h // 8, : wd // 8].set(bmax)
    ballv = jnp.min((blocks > 0).astype(jnp.float32), axis=(1, 3))
    l3valid = jnp.zeros((L3_V, 128), jnp.float32).at[: h // 8, : wd // 8].set(ballv)
    return m0, m1, m2, l3, l3min, l3max, l3valid


def tsdf_integrate_pallas(
    vol: TsdfVolume,
    depth: jnp.ndarray,
    pose: jnp.ndarray,
    intr: Intrinsics,
    max_weight: float = 128.0,
    interpret: bool = False,
) -> TsdfVolume:
    """Integrate only (planes discarded); see integrate_with_planes."""
    new_vol, _ = tsdf_integrate_with_planes(
        vol, depth, pose, intr, max_weight=max_weight, interpret=interpret
    )
    return new_vol


@partial(jax.jit, static_argnames=("intr", "interpret"), donate_argnums=(0,))
def tsdf_integrate_with_planes(
    vol: TsdfVolume,
    depth: jnp.ndarray,
    pose: jnp.ndarray,
    intr: Intrinsics,
    max_weight: float = 128.0,
    interpret: bool = False,
) -> TsdfVolume:
    """Drop-in replacement for tsdf_integrate (bilinear path) built on the
    Pallas kernel. Requires resolution % 8 == 0 and z % 128 == 0."""
    r = vol.resolution
    assert r % 8 == 0 and r % CHUNK_Z == 0, "volume must tile (8,8,128)"
    assert vol.tsdf.dtype == jnp.float32, "pallas path is f32 (bf16 later)"

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
            jnp.array([max_weight, intr.width, intr.height], jnp.float32),
            jnp.zeros((8,), jnp.float32),
        ]
    ).astype(jnp.float32)

    m0, m1, m2, l3, l3min, l3max, l3valid = _build_mips(depth.astype(jnp.float32))

    grid = (r // 8, r // 8)
    nz = vol.tsdf.shape[2]

    out_tsdf, out_w, out_planes = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 8, nz), lambda i, j: (i, j, 0)),
            pl.BlockSpec((8, 8, nz), lambda i, j: (i, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((8, 8, nz), lambda i, j: (i, j, 0)),
            pl.BlockSpec((8, 8, nz), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, 16, 128), lambda i, j: (i, j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(vol.tsdf.shape, vol.tsdf.dtype),
            jax.ShapeDtypeStruct(vol.weight.shape, vol.weight.dtype),
            jax.ShapeDtypeStruct((r // 8, r // 8, 16, 128), jnp.float32),
        ],
        input_output_aliases={8: 0, 9: 1},
        interpret=interpret,
    )(params, m0, m1, m2, l3, l3min, l3max, l3valid, vol.tsdf, vol.weight)

    return vol.replace_grids(tsdf=out_tsdf, weight=out_w), out_planes
