"""Parity tests for the Pallas TPU kernels (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from housescan_tpu.kinfu.camera import Intrinsics
from housescan_tpu.kinfu.synthetic import furnished_room, orbit_poses, render_depth_stream
from housescan_tpu.kinfu.tsdf import tsdf_integrate, tsdf_new
from housescan_tpu.ops.tsdf_pallas import tsdf_integrate_pallas

INTR = Intrinsics(width=160, height=120, fx=131.25, fy=131.25, cx=79.5, cy=59.5)


class TestPallasIntegrateParity:
    def test_matches_xla_reference(self):
        half, boxes = furnished_room()
        poses = orbit_poses(2, radius=0.25, yaw_range=0.05, pitch=0.25)
        frames = render_depth_stream(INTR, poses, half, boxes=boxes)
        d0 = jnp.asarray(frames[0])
        p0 = jnp.asarray(poses[0])

        ref = tsdf_integrate(tsdf_new(128, 3.0, 0.06), d0, p0, INTR)
        pal = tsdf_integrate_pallas(tsdf_new(128, 3.0, 0.06), d0, p0, INTR, interpret=True)

        w_ref = np.asarray(ref.weight)
        w_pal = np.asarray(pal.weight)
        # Policy differences at depth-discontinuity pixels allow a small
        # disagreement set; the bulk must match.
        assert (w_ref == w_pal).mean() > 0.999

        m = (w_ref > 0) & (w_pal > 0)
        diff = np.abs(np.asarray(ref.tsdf)[m] - np.asarray(pal.tsdf)[m])
        # trunc units: 0.0169 = 1mm at 60mm truncation
        assert np.quantile(diff, 0.95) < 0.017

    def test_two_frame_accumulation(self):
        half, boxes = furnished_room()
        poses = orbit_poses(2, radius=0.25, yaw_range=0.05, pitch=0.25)
        frames = render_depth_stream(INTR, poses, half, boxes=boxes)
        vol = tsdf_new(128, 3.0, 0.06)
        for i in range(2):
            vol = tsdf_integrate_pallas(
                vol, jnp.asarray(frames[i]), jnp.asarray(poses[i]), INTR, interpret=True
            )
        assert float(jnp.max(vol.weight)) == 2.0

    def test_rejects_untileable_volume(self):
        with pytest.raises(AssertionError):
            tsdf_integrate_pallas(
                tsdf_new(96, 3.0, 0.06),
                jnp.zeros((120, 160)),
                jnp.eye(4),
                INTR,
                interpret=True,
            )


class TestPlaneRaycast:
    def test_plane_extraction_matches_band_counts(self):
        import jax.numpy as jnp

        from housescan_tpu.ops.planes_pallas import extract_subblock_planes

        half, boxes = furnished_room()
        poses = orbit_poses(2, radius=0.25, yaw_range=0.05, pitch=0.25)
        frames = render_depth_stream(INTR, poses, half, boxes=boxes)
        vol = tsdf_integrate(
            tsdf_new(128, 3.0, 0.06), jnp.asarray(frames[0]), jnp.asarray(poses[0]), INTR
        )
        planes = extract_subblock_planes(vol, interpret=True)
        P = np.asarray(planes)  # (nbx, nbx, nzc, N_FIELDS, NSUB_C) = (16,16,1,16,16)
        counts = P[:, :, 0, 5, :]
        t = np.asarray(vol.tsdf)
        w = np.asarray(vol.weight)
        obs = w > 0
        neg = t < 0

        # Mirror the kernel's crossing attribution: a crossing between a
        # base voxel and its +axis neighbor is counted in the BASE
        # voxel's sub-block; x/y crossings across 8-voxel block
        # boundaries are skipped, z uses lane rotate so only the global
        # last z is skipped.
        def fam(axis, keep_base):
            sl = [slice(None)] * 3
            sl[axis] = slice(0, -1)
            sln = [slice(None)] * 3
            sln[axis] = slice(1, None)
            c = (
                obs[tuple(sl)]
                & obs[tuple(sln)]
                & (neg[tuple(sl)] != neg[tuple(sln)])
            )
            full = np.zeros_like(obs)
            full[tuple(sl)] = c
            return full & keep_base

        ix = np.arange(128)
        keep_x = (ix % 8 != 7)[:, None, None]
        keep_y = (ix % 8 != 7)[None, :, None]
        cross = (
            fam(0, keep_x) | np.zeros_like(obs)
        ).astype(np.int64) + fam(1, keep_y) + fam(2, True)
        truth = cross.reshape(16, 8, 16, 8, 16, 8).sum(axis=(1, 3, 5))
        np.testing.assert_array_equal(counts, truth)

        # Where valid, normals must be unit and the plane near the
        # crossing centroid (d is n.centroid by construction).
        valid = P[:, :, 0, 4, :] > 0
        n = P[:, :, 0, 0:3, :]
        norms = np.linalg.norm(n, axis=2)
        assert np.allclose(norms[valid], 1.0, atol=1e-4)

    def test_tile_overflow_keeps_nearest_candidates(self):
        """When a ray tile's candidate count exceeds MAX_CT, the
        truncation must drop FARTHEST candidates: the center ray's
        nearest supported plane has to survive and win. (Pre-fix the
        drop order was block-id-major, so a dense scene could discard
        the nearest surface entirely.)"""
        import jax.numpy as jnp

        from housescan_tpu.ops.raycast_tiles import MAX_CT, raycast_tiles_maps
        from housescan_tpu.kinfu.tsdf import tsdf_new

        vol = tsdf_new(128, 3.0, 0.06)
        vs = 3.0 / 128
        nbx, nzc, nsub_c = 16, 1, 16
        P = np.zeros((nbx, nbx, nzc, 16, nsub_c), np.float32)
        bi, bj, bs = np.meshgrid(
            np.arange(nbx), np.arange(nbx), np.arange(nsub_c), indexing="ij"
        )
        xc = -1.5 + (bi * 8 + 4) * vs
        yc = -1.5 + (bj * 8 + 4) * vs
        zc = -1.5 + (bs * 8 + 4) * vs
        P[:, :, 0, 2, :] = -1.0  # normal (0, 0, -1): faces the camera
        P[:, :, 0, 3, :] = -zc  # d = n . x on the plane
        P[:, :, 0, 4, :] = 1.0  # every sub-block valid -> tiles overflow
        P[:, :, 0, 6, :] = bi * 256 + bj * 16 + bs
        P[:, :, 0, 7, :] = 0.3  # support radius
        P[:, :, 0, 8, :] = xc
        P[:, :, 0, 9, :] = yc
        P[:, :, 0, 10, :] = zc

        pose = np.eye(4, dtype=np.float32)
        pose[3, 2] = -3.0  # camera 3m behind the volume, looking +z
        outs = raycast_tiles_maps(
            jnp.asarray(P), jnp.asarray(pose), INTR, vol, interpret=True
        )
        depth = np.asarray(outs[0])
        # 4096 valid sub-blocks >> MAX_CT per tile
        assert nbx * nbx * nsub_c > MAX_CT
        want = 3.0 + float(zc[0, 0, 0])  # nearest plane along the center ray
        got = depth[60, 80]
        assert abs(got - want) < 1e-3, (got, want)

    def test_raycast_depth_quality(self):
        import jax.numpy as jnp

        from housescan_tpu.ops.raycast_pallas import raycast_pallas

        half, boxes = furnished_room()
        poses = orbit_poses(4, radius=0.25, yaw_range=0.1, pitch=0.25)
        frames = render_depth_stream(INTR, poses, half, boxes=boxes)
        vol = tsdf_new(128, 3.0, 0.06)
        for k in range(4):
            vol = tsdf_integrate(vol, jnp.asarray(frames[k]), jnp.asarray(poses[k]), INTR)
        from housescan_tpu.kinfu import maps as mp

        rc = raycast_pallas(vol, jnp.asarray(poses[0]), INTR, interpret=True)
        valid = np.asarray(rc[mp.MD_VALID] > 0.5)
        # The model is VALIDITY-honest by design: silhouette skirts,
        # mixed two-surface blocks (occluders) and edge-dilated bands
        # render INVALID instead of coherently wrong (they drove ICP
        # drift; see ops/raycast_tiles.py occluder + raycast_pallas
        # skirt-mask comments). Coverage is therefore lower than a
        # paint-everything raycast, and in exchange the error tail
        # must be a few percent, not a bias band.
        assert valid.mean() > 0.55
        m = valid & (frames[0] > 0)
        err = np.abs(np.asarray(rc[mp.MD_DEPTH])[m] - frames[0][m])
        # median MICROMETER-scale on planar surfaces even at coarse
        # 128^3 (planes fit TSDF crossings to machine precision).
        assert np.median(err) < 0.0005
        # outlier tail: bounded at >10 mm, not merely at >50 mm
        assert (err > 0.01).mean() < 0.04


class TestRaycastTilesChunkMerge:
    def test_cross_chunk_merge_tie_break_and_occluder(self):
        """Directly drives the chunked _kernel (commit 5d76e80): the
        candidate axis streams through the grid 96 at a time with the
        output block carrying min-t / max-bid-on-tie accumulators.
        Hand-built candidates place the surviving surface hit in chunk
        3 (slot 300), an equal-t competitor with a SMALLER bid in chunk
        0 (the cross-chunk tie must resolve to the larger bid, exactly
        like the old fully-vectorized global reduction), an occluder
        event in chunk 0 (min-merged across chunks), and an invalid
        candidate that must not hit at all."""
        import jax
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from housescan_tpu.ops.raycast_tiles import CHUNK, N_PREP, _kernel

        max_ct = 4 * CHUNK
        cand = np.zeros((1, max_ct, N_PREP), np.float32)

        def put(slot, n, fnum, r, rad2, bid, ok=1.0, occf=0.0):
            cand[0, slot, :11] = [n[0], n[1], n[2], fnum,
                                  r[0], r[1], r[2], rad2, bid, ok, occf]

        # chunk 0, slot 0: t=2 hit, bid 5 (ties with slot 300's t).
        put(0, (0, 0, -1.0), -2.0, (0, 0, 2.0), 0.01, 5.0)
        # chunk 0, slot 1: occluder event at t=1.5 (ok but occf=1).
        put(1, (0, 0, -1.0), -1.5, (0, 0, 1.5), 0.01, 6.0, occf=1.0)
        # chunk 0, slot 2: ok=0 -> would be the nearest (t=1), must not hit.
        put(2, (0, 0, -1.0), -1.0, (0, 0, 1.0), 0.01, 7.0, ok=0.0)
        # chunk 3, slot 300: same ray-t 2.0 (scaled eq), LARGER bid 9 ->
        # the tie-break winner; its (unnormalized) normal tags the output.
        put(300, (0, 0, -2.0), -4.0, (0, 0, 2.0), 0.01, 9.0)

        h, w_pad, n_ut = 8, 128, 1
        params = np.zeros((32,), np.float32)
        params[0], params[4], params[8] = 1.0, 1.0, 1.0  # identity rot
        params[12:18] = [100.0, 100.0, 64.0, 4.0, 0.3, n_ut]  # fx fy cx cy zmin
        params[18] = 0.01  # voxel size (unused by the kernel math here)

        out = pl.pallas_call(
            _kernel,
            grid=(1 * n_ut, max_ct // CHUNK),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, CHUNK, N_PREP), lambda g, k: (g, k, 0)),
            ],
            out_specs=pl.BlockSpec(
                (9, 8, 128), lambda g, k: (0, g // n_ut, g % n_ut)
            ),
            out_shape=jax.ShapeDtypeStruct((9, h, w_pad), jnp.float32),
            interpret=True,
        )(jnp.asarray(params), jnp.asarray(cand))
        out = np.asarray(out)

        # Pixel (v=4, u=64) is the optical axis: ray dir (0, 0, 1).
        v, u = 4, 64
        assert abs(out[0, v, u] - 2.0) < 1e-5          # depth: min valid t
        assert out[7, v, u] == 9.0                     # tie -> larger bid
        assert abs(out[6, v, u] - (-2.0)) < 1e-5       # winner's normal row
        assert abs(out[8, v, u] - 1.5) < 1e-5          # occluder event min
        assert abs(out[3, v, u] - 2.0) < 1e-5          # hit position z
        # A far-off-axis ray misses every support sphere: empty/invalid.
        assert out[0, 0, 0] == 0.0 and out[7, 0, 0] == -1.0
        assert out[8, 0, 0] >= 1e8                     # BIG = no occluder
