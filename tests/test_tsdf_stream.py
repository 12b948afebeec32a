"""Tests for the streaming (work-list) TSDF integrate + chunk prepass.

Parity model: the streaming kernel must agree with the XLA reference
integrate everywhere it updates, and must leave SKIP-classified chunks
bit-identical through the input-output alias. The chunk classifier is
validated for conservativeness: no voxel the XLA reference updates may
live in a chunk classified SKIP.
"""

import jax
import jax.numpy as jnp
import numpy as np

from housescan_tpu.kinfu.camera import Intrinsics
from housescan_tpu.kinfu.synthetic import furnished_room, orbit_poses, render_depth_stream
from housescan_tpu.kinfu.tsdf import tsdf_integrate, tsdf_new
from housescan_tpu.ops.chunk_select import CLS_BAND, CLS_FREE, build_worklist, decode_worklist
from housescan_tpu.ops.tsdf_stream import planes_shape, tsdf_integrate_stream

INTR = Intrinsics(width=160, height=120, fx=131.25, fy=131.25, cx=79.5, cy=59.5)


def _scene(n=2, yaw=0.05):
    half, boxes = furnished_room()
    poses = orbit_poses(n, radius=0.25, yaw_range=yaw, pitch=0.25)
    frames = render_depth_stream(INTR, poses, half, boxes=boxes)
    return frames, poses


def _integrate_stream(vol, planes, depth, pose):
    return tsdf_integrate_stream(
        jax.tree_util.tree_map(jnp.copy, vol),
        jnp.copy(planes),
        depth,
        pose,
        INTR,
        interpret=True,
    )


class TestChunkSelect:
    def test_worklist_is_conservative(self):
        """Every voxel the XLA integrate touches must be in a listed chunk."""
        frames, poses = _scene()
        d0, p0 = jnp.asarray(frames[0]), jnp.asarray(poses[0])
        vol = tsdf_new(128, 3.0, 0.06)
        wl = build_worklist(d0, p0, INTR, 128, vol.voxel_size, vol.origin, vol.trunc)
        ref = tsdf_integrate(vol, d0, p0, INTR)
        touched = np.asarray(ref.weight) > 0  # (128,128,128)
        listed = np.zeros((16, 16, 1), bool)
        for ci, cj, ck, cls, lvl, v0, u0 in decode_worklist(wl):
            listed[ci, cj, ck] = True

        chunk_touched = touched.reshape(16, 8, 16, 8, 1, 128).any(axis=(1, 3, 5))
        missed = chunk_touched & ~listed
        assert not missed.any(), f"{missed.sum()} touched chunks not in work list"

    def test_padding_repeats_last_entry(self):
        # 512^3: superchunk entries are (2, 8, 8, 256) z-pairs, so
        # behind-surface and out-of-frustum entries exist and the list is
        # truly compacted (at coarser volumes every entry spans the full
        # volume depth and stays listed).
        frames, poses = _scene()
        vol = tsdf_new(512, 3.0, 0.06)
        wl = build_worklist(
            jnp.asarray(frames[0]), jnp.asarray(poses[0]), INTR, 512,
            vol.voxel_size, vol.origin, vol.trunc,
        )
        packed = np.asarray(wl.packed)
        count = int(wl.count[0])
        assert 0 < count < packed.size
        assert (packed[count:] == packed[count - 1]).all()
        assert (np.asarray(wl.bi)[count:] == np.asarray(wl.bi)[count - 1]).all()

    def test_free_chunks_really_free(self):
        """FREE-classified chunks must be strictly in front of all valid
        depth in their footprint (sample = +1 exactly)."""
        frames, poses = _scene()
        d0, p0 = np.asarray(frames[0]), np.asarray(poses[0])
        vol = tsdf_new(128, 3.0, 0.06)
        wl = build_worklist(
            jnp.asarray(d0), jnp.asarray(p0), INTR, 128,
            vol.voxel_size, vol.origin, vol.trunc,
        )
        vs = 3.0 / 128
        origin = np.array([-1.5, -1.5, -1.5])
        rot, t = p0[:3, :3], p0[3, :3]
        dvalid = d0 > 0
        for ci, cj, ck, cls, lvl, v0, u0 in decode_worklist(wl):
            if cls != CLS_FREE:
                continue
            # sample the chunk's voxel centers sparsely
            xs = origin[0] + (ci * 8 + np.arange(0, 8, 2) + 0.5) * vs
            ys = origin[1] + (cj * 8 + np.arange(0, 8, 2) + 0.5) * vs
            zs = origin[2] + (ck * 128 + np.arange(0, 128, 8) + 0.5) * vs
            g = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), -1).reshape(-1, 3)
            cam = (g - t) @ rot.T
            z = cam[:, 2]
            u = INTR.fx * cam[:, 0] / np.maximum(z, 1e-6) + INTR.cx
            v = INTR.fy * cam[:, 1] / np.maximum(z, 1e-6) + INTR.cy
            iv = (z > 1e-6) & (u >= 0) & (u <= 159) & (v >= 0) & (v <= 119)
            ui = np.clip(np.round(u).astype(int), 0, 159)
            vi = np.clip(np.round(v).astype(int), 0, 119)
            d = d0[vi, ui]
            ok = ~iv | ~dvalid[vi, ui] | (d - z > 0.0)
            assert ok.all()


class TestStreamIntegrateParity:
    def test_matches_xla_reference(self):
        frames, poses = _scene()
        d0, p0 = jnp.asarray(frames[0]), jnp.asarray(poses[0])

        ref = tsdf_integrate(tsdf_new(128, 3.0, 0.06), d0, p0, INTR)
        vol = tsdf_new(128, 3.0, 0.06)
        planes = jnp.zeros(planes_shape(128), jnp.float32)
        out, _ = _integrate_stream(vol, planes, d0, p0)

        w_ref = np.asarray(ref.weight)
        w_out = np.asarray(out.weight)
        assert (w_ref == w_out).mean() > 0.999

        m = (w_ref > 0) & (w_out > 0)
        diff = np.abs(np.asarray(ref.tsdf)[m] - np.asarray(out.tsdf)[m])
        assert np.quantile(diff, 0.95) < 0.017

    def test_matches_dense_pallas_kernel(self):
        """Stream and dense Pallas kernels share the band math; on BAND
        chunks they must agree to float tolerance."""
        from housescan_tpu.ops.tsdf_pallas import tsdf_integrate_pallas

        frames, poses = _scene()
        d0, p0 = jnp.asarray(frames[0]), jnp.asarray(poses[0])

        dense = tsdf_integrate_pallas(
            tsdf_new(128, 3.0, 0.06), d0, p0, INTR, interpret=True
        )
        vol = tsdf_new(128, 3.0, 0.06)
        planes = jnp.zeros(planes_shape(128), jnp.float32)
        out, _ = _integrate_stream(vol, planes, d0, p0)

        w_d = np.asarray(dense.weight)
        w_s = np.asarray(out.weight)
        # Classifiers differ (in-kernel exact bbox vs corner+HiZ): both
        # are conservative, so updated sets agree except at policy edges.
        assert (w_d == w_s).mean() > 0.999
        m = (w_d > 0) & (w_s > 0)
        diff = np.abs(np.asarray(dense.tsdf)[m] - np.asarray(out.tsdf)[m])
        assert np.quantile(diff, 0.99) < 1e-5

    def test_unvisited_chunks_bit_identical(self):
        """SKIP chunks pass through the alias untouched."""
        frames, poses = _scene()
        d0, p0 = jnp.asarray(frames[0]), jnp.asarray(poses[0])
        vol = tsdf_new(128, 3.0, 0.06)
        # Pre-fill with a recognizable pattern.
        rng = np.random.default_rng(1)
        pat = rng.normal(size=vol.tsdf.shape).astype(np.float32)
        vol = vol.replace_grids(tsdf=jnp.asarray(pat), weight=jnp.zeros_like(vol.weight))

        wl = build_worklist(d0, p0, INTR, 128, vol.voxel_size, vol.origin, vol.trunc)
        listed = np.zeros((16, 16, 1), bool)
        for ci, cj, ck, cls, lvl, v0, u0 in decode_worklist(wl):
            listed[ci, cj, ck] = True

        planes = jnp.zeros(planes_shape(128), jnp.float32)
        out, _ = _integrate_stream(vol, planes, d0, p0)
        t_out = np.asarray(out.tsdf).reshape(16, 8, 16, 8, 1, 128)
        t_in = pat.reshape(16, 8, 16, 8, 1, 128)
        skip = ~listed
        np.testing.assert_array_equal(t_out[skip[..., 0].nonzero()[0], :, skip[..., 0].nonzero()[1]],
                                      t_in[skip[..., 0].nonzero()[0], :, skip[..., 0].nonzero()[1]])

    def test_two_frame_accumulation_and_planes_persist(self):
        frames, poses = _scene()
        vol = tsdf_new(128, 3.0, 0.06)
        planes = jnp.zeros(planes_shape(128), jnp.float32)
        for i in range(2):
            vol, planes = _integrate_stream(
                vol, planes, jnp.asarray(frames[i]), jnp.asarray(poses[i])
            )
        assert float(jnp.max(vol.weight)) == 2.0
        P = np.asarray(planes)
        assert (P[:, :, :, 4, :] > 0).sum() > 30  # valid planes extracted

    def test_planes_match_standalone_extraction(self):
        """Persistent planes of visited chunks equal a fresh extraction
        over the final volume (and unvisited chunks stay zero)."""
        from housescan_tpu.ops.planes_pallas import extract_subblock_planes

        frames, poses = _scene()
        d0, p0 = jnp.asarray(frames[0]), jnp.asarray(poses[0])
        vol = tsdf_new(128, 3.0, 0.06)
        planes = jnp.zeros(planes_shape(128), jnp.float32)
        wl = build_worklist(d0, p0, INTR, 128, vol.voxel_size, vol.origin, vol.trunc)
        out, got = _integrate_stream(vol, planes, d0, p0)

        want = np.asarray(extract_subblock_planes(out, interpret=True))
        got = np.asarray(got)
        packed = np.asarray(wl.packed)
        count = int(wl.count[0])
        # Only the fields of VALID planes are consumed by the raycast
        # (field 4 gates candidates); the streaming kernel's crossing
        # early-out writes zeros where no plane can be valid.
        for ci, cj, ck, cls, lvl, v0, u0 in decode_worklist(wl):
            g, w_ = got[ci, cj, ck], want[ci, cj, ck]
            np.testing.assert_array_equal(g[4] > 0.5, w_[4] > 0.5)
            m = w_[4] > 0.5
            np.testing.assert_allclose(g[:, m], w_[:, m], atol=1e-5)


class TestIcpLevelPallas:
    def test_matches_xla_level_loop(self):
        """The whole-level fused ICP kernel must reproduce the XLA GN
        loop's pose trajectory (same association, weighting, solve)."""
        from housescan_tpu.kinfu.icp import (
            _icp_level_iteration,
            _model_gradients,
        )
        from housescan_tpu.kinfu.preprocess import depth_to_vertices, vertex_normals
        from housescan_tpu.ops.icp_pallas import icp_level_pallas, pack_level_maps

        frames, poses = _scene(n=2, yaw=0.1)
        p0, p1 = jnp.asarray(poses[0]), jnp.asarray(poses[1])
        v0 = depth_to_vertices(jnp.asarray(frames[0]), INTR)
        n0 = vertex_normals(v0)
        mv = v0 @ p0[:3, :3] + p0[3, :3]
        mn = n0 @ p0[:3, :3]
        mok = (v0[..., 2] > 0) & (jnp.linalg.norm(n0, axis=-1) > 0.5)
        v1 = depth_to_vertices(jnp.asarray(frames[1]), INTR)
        n1 = vertex_normals(v1)
        grads = _model_gradients(mv, mok)

        n_iters, window = 6, 4
        ref_pose = p0
        for _ in range(n_iters):
            ref_pose, ref_rmse, ref_corr, norm = _icp_level_iteration(
                ref_pose, v1, n1, mv, mn, mok, grads, p0, INTR,
                0.10, 0.5236, window=window,
            )

        packed = pack_level_maps(v1, n1, mv, mn, mok, grads)
        got_pose, got_rmse, got_corr = icp_level_pallas(
            packed, p0, p0, INTR, n_iters=n_iters, window=window,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got_pose), np.asarray(ref_pose), atol=5e-5
        )
        assert abs(float(got_rmse) - float(ref_rmse)) < 1e-4
        # correspondence counts agree to a handful of gate-edge pixels
        assert abs(int(got_corr) - int(ref_corr)) <= max(5, int(ref_corr) // 200)

    def test_early_exit_stops_iterating(self):
        """From the exact solution the step norm is ~0: the kernel must
        converge in one or two iterations, not burn the whole budget."""
        from housescan_tpu.kinfu.icp import _model_gradients
        from housescan_tpu.kinfu.preprocess import depth_to_vertices, vertex_normals
        from housescan_tpu.ops.icp_pallas import icp_level_pallas, pack_level_maps

        frames, poses = _scene()
        p0 = jnp.asarray(poses[0])
        v0 = depth_to_vertices(jnp.asarray(frames[0]), INTR)
        n0 = vertex_normals(v0)
        mv = v0 @ p0[:3, :3] + p0[3, :3]
        mn = n0 @ p0[:3, :3]
        mok = (v0[..., 2] > 0) & (jnp.linalg.norm(n0, axis=-1) > 0.5)
        packed = pack_level_maps(
            v0, n0, mv, mn, mok, _model_gradients(mv, mok)
        )
        pose, rmse, corr = icp_level_pallas(
            packed, p0, p0, INTR, n_iters=10, window=0, interpret=True
        )
        np.testing.assert_allclose(np.asarray(pose), np.asarray(p0), atol=1e-4)
        assert int(corr) > 1000


class TestSolveTwistPallas:
    def test_matches_xla_reference(self):
        """The fused solve+twist+compose kernel must match the jnp path
        (used on CPU) to float tolerance."""
        from housescan_tpu.kinfu.icp import _solve_increment, _twist_to_proj
        from housescan_tpu.ops.solve6_pallas import solve_twist_compose

        rng = np.random.default_rng(3)
        for _ in range(10):
            g = rng.normal(size=(50, 6))
            a = jnp.asarray((g.T @ g).astype(np.float32))
            b = jnp.asarray(rng.normal(size=6).astype(np.float32) * 0.1)
            pose = np.eye(4, dtype=np.float32)
            pose[3, :3] = rng.normal(size=3)
            pose = jnp.asarray(pose)

            x, ok = _solve_increment(a, b, damping=3e-4)
            want = np.asarray(jnp.where(ok, pose @ _twist_to_proj(x), pose))
            got_pose, got_norm = solve_twist_compose(
                pose, a, b, damping=3e-4, interpret=True
            )
            got = np.asarray(got_pose)
            assert float(got_norm) >= 0.0
            np.testing.assert_allclose(got, want, atol=2e-5)

    def test_degenerate_system_keeps_pose(self):
        """A singular/garbage system (zero A, nonzero b; or NaNs) must
        leave the pose EXACTLY unchanged — in both the Pallas kernel and
        the jnp fallback — not take a max_step-clamped step in a garbage
        direction."""
        from housescan_tpu.kinfu.icp import _solve_increment
        from housescan_tpu.ops.solve6_pallas import solve_twist_compose

        pose = np.eye(4, dtype=np.float32)
        pose[3, :3] = [0.3, -0.1, 1.7]
        # NaN systems must FAIL (ok False, zero step); an all-zero A
        # with nonzero b is now handled GRACEFULLY by the null-space
        # filter (x = (A+lam)^-1 A (A+lam)^-1 b = 0 exactly when A = 0:
        # every direction is unobservable, so nothing moves) — the ok
        # flag may stay True there, which is fine because the step is
        # exactly zero. Either way the pose must be EXACTLY unchanged.
        cases = [
            (jnp.zeros((6, 6)), jnp.ones((6,)), None),
            (jnp.full((6, 6), jnp.nan), jnp.ones((6,)), False),
            (jnp.eye(6), jnp.full((6,), jnp.nan), False),
        ]
        for a, b, want_ok in cases:
            got, norm = solve_twist_compose(jnp.asarray(pose), a, b, interpret=True)
            np.testing.assert_array_equal(np.asarray(got), pose)
            assert float(norm) <= 1e-9  # done-signal scale, not a real step
            x, ok = _solve_increment(a, b)
            if want_ok is not None:
                assert bool(ok) == want_ok
            np.testing.assert_array_equal(np.asarray(x), np.zeros(6))


class TestSuperchunkMode:
    def test_256_parity_with_xla(self):
        """256^3 engages the (2, 8, 8, 256) superchunk path (nzc even);
        parity with the XLA reference must hold there too."""
        frames, poses = _scene()
        d0, p0 = jnp.asarray(frames[0]), jnp.asarray(poses[0])

        ref = tsdf_integrate(tsdf_new(256, 3.0, 0.06), d0, p0, INTR)
        vol = tsdf_new(256, 3.0, 0.06)
        planes = jnp.zeros(planes_shape(256), jnp.float32)
        out, got_planes = _integrate_stream(vol, planes, d0, p0)

        w_ref = np.asarray(ref.weight)
        w_out = np.asarray(out.weight)
        assert (w_ref == w_out).mean() > 0.999
        m = (w_ref > 0) & (w_out > 0)
        diff = np.abs(np.asarray(ref.tsdf)[m] - np.asarray(out.tsdf)[m])
        assert np.quantile(diff, 0.95) < 0.017

        # Planes of both halves of visited superchunks match a fresh
        # standalone extraction.
        from housescan_tpu.ops.planes_pallas import extract_subblock_planes

        want = np.asarray(extract_subblock_planes(out, interpret=True))
        got = np.asarray(got_planes)
        wl = build_worklist(d0, p0, INTR, 256, out.voxel_size, out.origin, out.trunc)
        checked = 0
        for ci, cj, ck, cls, lvl, v0, u0 in decode_worklist(wl):
            g, w_ = got[ci, cj, ck], want[ci, cj, ck]
            np.testing.assert_array_equal(g[4] > 0.5, w_[4] > 0.5)
            mm = w_[4] > 0.5
            np.testing.assert_allclose(g[:, mm], w_[:, mm], atol=1e-5)
            checked += 1
        assert checked > 100


class TestNoopHalfPlanes:
    def test_noop_half_rewrites_full_planes_block(self):
        """A SKIP chunk paired with a non-SKIP z-neighbor (NOOP half)
        must have its planes slot REWRITTEN by the kernel — recomputed
        from its unchanged TSDF — never left to whatever the VMEM output
        window held from a previous grid step. Poison the persistent
        planes at every NOOP half and check the kernel restores them to
        the clean run's values."""
        frames, poses = _scene(n=2, yaw=0.6)
        d0, p0 = jnp.asarray(frames[0]), jnp.asarray(poses[0])
        d1, p1 = jnp.asarray(frames[1]), jnp.asarray(poses[1])
        vol = tsdf_new(256, 3.0, 0.06)
        planes = jnp.zeros(planes_shape(256), jnp.float32)
        vol, planes = _integrate_stream(vol, planes, d0, p0)

        # Decode the MAIN work list exactly as the integrate builds it
        # (free_split routes pure-free superblocks to the free-carve
        # kernel, so they are no longer main-listed): NOOP halves are
        # siblings of MAIN-listed chunks only.
        from housescan_tpu.ops.tsdf_stream import FIELD_SAT, N_QUARTERS

        pnp = np.asarray(planes)
        sat_np = pnp[:, :, :, FIELD_SAT, :N_QUARTERS].reshape(-1, N_QUARTERS) > 0.5
        neg_np = pnp[:, :, :, FIELD_SAT, N_QUARTERS].reshape(-1) > 0.5
        wl, _ = build_worklist(
            d1, p1, INTR, 256, vol.voxel_size, vol.origin, vol.trunc,
            sat_quarters=jnp.asarray(sat_np),
            neg_flags=jnp.asarray(neg_np),
            free_split=True,
        )
        decoded = {(ci, cj, ck) for ci, cj, ck, *_ in decode_worklist(wl)}
        noop_halves = []
        for ci, cj, ck in decoded:
            other = (ci, cj, ck ^ 1)
            if other not in decoded:
                noop_halves.append(other)
        assert noop_halves, "scene produced no NOOP halves; increase yaw"

        clean_vol, clean_planes = _integrate_stream(vol, planes, d1, p1)

        poison = 12345.0
        poisoned = np.asarray(planes).copy()
        for ci, cj, ck in noop_halves:
            poisoned[ci, cj, ck] = poison
        _, got = _integrate_stream(vol, jnp.asarray(poisoned), d1, p1)

        got = np.asarray(got)
        clean = np.asarray(clean_planes)
        for ci, cj, ck in noop_halves:
            assert not (got[ci, cj, ck] == poison).any(), (ci, cj, ck)
            np.testing.assert_allclose(got[ci, cj, ck], clean[ci, cj, ck], atol=1e-5)

    def test_empty_frame_writes_planes_of_origin_chunk(self):
        """An all-invalid depth frame yields count==0 -> one all-NOOP
        entry on superchunk (0,0,0). The kernel must still write that
        block's planes (recomputed, i.e. unchanged) and leave the volume
        bit-identical."""
        frames, poses = _scene()
        d0, p0 = jnp.asarray(frames[0]), jnp.asarray(poses[0])
        vol = tsdf_new(128, 3.0, 0.06)
        planes = jnp.zeros(planes_shape(128), jnp.float32)
        vol, planes = _integrate_stream(vol, planes, d0, p0)

        empty = jnp.zeros_like(d0)
        out_vol, out_planes = _integrate_stream(vol, planes, empty, p0)
        np.testing.assert_array_equal(np.asarray(out_vol.tsdf), np.asarray(vol.tsdf))
        np.testing.assert_array_equal(np.asarray(out_vol.weight), np.asarray(vol.weight))
        np.testing.assert_allclose(
            np.asarray(out_planes), np.asarray(planes), atol=1e-5
        )


class TestFreeSaturation:
    def test_saturated_free_quarters_shrink_worklist(self):
        """After SAT_W identical frames, fully-carved free z-quarters
        carry the saturation flag and chunks whose every visible quarter
        is saturated/behind drop out of the work list; the tsdf field
        stays exactly equal to the unsaturated path's (only the
        free-space weight count freezes)."""
        from housescan_tpu.kinfu.synthetic import render_depth_stream
        from housescan_tpu.ops.tsdf_stream import (
            FIELD_SAT,
            N_QUARTERS,
            tsdf_integrate_stream,
        )

        # Empty room, camera at one end looking down +z: deep clear free
        # space saturates. At 128^3 quarters span 0.75 m, so fewer (32)
        # chunks classify fully FREE than at production resolutions —
        # enough to prove the gating; 256^3 costs ~5 min of single-core
        # interpret-mode compile+run for no extra semantics.
        res, sat_w = 128, 3.0
        pose = np.eye(4, dtype=np.float32)
        pose[3, 2] = -1.2
        d0 = jnp.asarray(render_depth_stream(INTR, [pose], 1.5)[0])
        p0 = jnp.asarray(pose)
        vol = tsdf_new(res, 3.0, 0.06)
        planes = jnp.zeros(planes_shape(res), jnp.float32)

        # free_split=False: saturation gating is MAIN-kernel semantics
        # (the free-kernel's FIELD_SAT parity is covered by
        # TestFreeSuperblockSplit); skipping the free kernel here saves
        # a ~2-minute single-core interpret-mode compile of a program
        # no other test shares (sat_w is a static arg).
        n_frames = int(sat_w) + 3
        for _ in range(n_frames):
            vol, planes = tsdf_integrate_stream(
                jax.tree_util.tree_map(jnp.copy, vol),
                jnp.copy(planes),
                d0,
                p0,
                INTR,
                interpret=True,
                sat_w=sat_w,
                free_split=False,
            )

        sat = np.asarray(planes)[:, :, :, FIELD_SAT, :N_QUARTERS] > 0.5
        assert sat.sum() > 50, sat.sum()

        # Gating semantics: with every quarter marked saturated, the
        # prepass must treat free quarters as behind — no FREE entries
        # survive, and the listed set shrinks. (A real count reduction
        # needs nzc > 2 so free superchunks exist without a surface
        # quarter — i.e. 512^3 geometry, exercised by the bench.)
        base = build_worklist(
            d0, p0, INTR, res, vol.voxel_size, vol.origin, vol.trunc
        )
        all_sat = jnp.ones(
            ((res // 8) ** 2 * (res // 128), N_QUARTERS), bool
        )
        gated = build_worklist(
            d0, p0, INTR, res, vol.voxel_size, vol.origin, vol.trunc,
            sat_quarters=all_sat,
        )
        n_free_base = sum(1 for r in decode_worklist(base) if r[3] == 0)
        n_free_gated = sum(1 for r in decode_worklist(gated) if r[3] == 0)
        assert n_free_base > 20
        assert n_free_gated == 0
        assert int(gated.count[0]) < int(base.count[0])

        # Saturated quarters must hold the invariant that makes skipping
        # them a no-op: every OBSERVED voxel is fully carved (t ~ +1)
        # with at least sat_w observations, and something was observed.
        # (Unobserved voxels already hold the initial t=+1 at w=0.)
        nbx = res // 8
        shape6 = (nbx, 8, nbx, 8, res // 128, N_QUARTERS, 32)
        w = np.asarray(vol.weight).reshape(shape6)
        t = np.asarray(vol.tsdf).reshape(shape6)
        obs = w > 0
        w_obs_min = np.where(obs, w, np.inf).min(axis=(1, 3, 6))
        t_obs_min = np.where(obs, t, 1.0).min(axis=(1, 3, 6))
        any_obs = obs.any(axis=(1, 3, 6))
        assert (w_obs_min[sat] >= sat_w).all()
        assert (t_obs_min[sat] > 0.999).all()
        assert any_obs[sat].all()


class TestPackedI16Volume:
    def test_packed_parity_with_f32(self):
        """int16-packed storage (tsdf<<16|weight in one int32): weights
        must be BIT-EXACT (integers <= 128) and tsdf within two
        quantization steps (2/32767) of the f32 path after two fused
        frames; the persistent planes stay numerically equivalent."""
        frames, poses = _scene()
        vol32 = tsdf_new(128, 3.0, 0.06)
        voli = tsdf_new(128, 3.0, 0.06, dtype=jnp.int32)
        assert voli.packed_i32
        p32 = jnp.zeros(planes_shape(128), jnp.float32)
        pi = jnp.zeros(planes_shape(128), jnp.float32)
        for i in range(2):
            d, p = jnp.asarray(frames[i]), jnp.asarray(poses[i])
            vol32, p32 = _integrate_stream(vol32, p32, d, p)
            voli, pi = _integrate_stream(voli, pi, d, p)

        np.testing.assert_array_equal(
            np.asarray(vol32.weight), np.asarray(voli.weight)
        )
        m = np.asarray(vol32.weight) > 0
        diff = np.abs(np.asarray(vol32.tsdf)[m] - np.asarray(voli.tsdf)[m])
        assert diff.max() < 2.5 / 32767.0, diff.max()

        # planes: same valid set, fields close (plane fit over quantized
        # crossings moves by micrometers)
        P32, Pi = np.asarray(p32), np.asarray(pi)
        np.testing.assert_array_equal(P32[:, :, :, 4, :] > 0.5,
                                      Pi[:, :, :, 4, :] > 0.5)
        v = P32[:, :, :, 4, :] > 0.5
        for f in (0, 1, 2, 3):
            np.testing.assert_allclose(
                P32[:, :, :, f, :][v], Pi[:, :, :, f, :][v], atol=2e-3
            )


class TestBf16Volume:
    def test_bf16_parity_with_f32(self):
        """bfloat16 volume storage: quantization near the zero crossing
        scales with |tsdf|, so surface accuracy stays sub-mm; compare a
        fused frame against the f32 path."""
        frames, poses = _scene()
        d0, p0 = jnp.asarray(frames[0]), jnp.asarray(poses[0])

        vol32 = tsdf_new(128, 3.0, 0.06)
        planes = jnp.zeros(planes_shape(128), jnp.float32)
        out32, _ = _integrate_stream(vol32, planes, d0, p0)

        vol16 = tsdf_new(128, 3.0, 0.06, dtype=jnp.bfloat16)
        out16, _ = _integrate_stream(vol16, planes, d0, p0)

        w32 = np.asarray(out32.weight)
        w16 = np.asarray(out16.weight.astype(jnp.float32))
        np.testing.assert_array_equal(w32, w16)  # counts <= 128: exact

        t32 = np.asarray(out32.tsdf)
        t16 = np.asarray(out16.tsdf.astype(jnp.float32))
        m = w32 > 0
        # near the crossing (|t| < 0.1 = 6mm band) quantization is tiny
        near = m & (np.abs(t32) < 0.1)
        assert near.sum() > 500
        assert np.abs(t32[near] - t16[near]).max() < 5e-4  # < 0.03 mm
        # globally bounded by one bf16 ulp at |t|<=1
        assert np.abs(t32[m] - t16[m]).max() < 4.5e-3


class TestBilateralPallas:
    def test_matches_xla_bilateral(self):
        from housescan_tpu.kinfu.preprocess import bilateral_filter
        from housescan_tpu.ops.preprocess_pallas import bilateral_filter_pallas

        frames, _ = _scene()
        d = jnp.asarray(frames[0])
        # salt in some invalid pixels and a hard edge
        d = d.at[40:50, 60:70].set(0.0)
        d = d.at[:20, :].mul(2.0)
        want = np.asarray(bilateral_filter(d))
        got = np.asarray(bilateral_filter_pallas(d, interpret=True))
        np.testing.assert_allclose(got, want, atol=2e-5)
        # exact zero preservation at invalid pixels
        assert (got[40:50, 60:70] == 0).all()


class TestFreeSuperblockSplit:
    """The pure-free superblock shortcut (chunk_select.FreeWorkList +
    tsdf_stream._free_kernel) must be invisible: volume AND planes
    bit-identical to the unsplit streaming path over a multi-frame
    scene, for both volume layouts."""

    def _run(self, dtype, res=128, n=3):
        frames, poses = _scene(n=n, yaw=0.3)
        vol_a = tsdf_new(res, 3.0, 0.06, dtype=dtype)
        vol_b = tsdf_new(res, 3.0, 0.06, dtype=dtype)
        pa = jnp.zeros(planes_shape(res), jnp.float32)
        pb = jnp.zeros(planes_shape(res), jnp.float32)
        for d, p in zip(frames, poses):
            d, p = jnp.asarray(d), jnp.asarray(p)
            vol_a, pa = tsdf_integrate_stream(
                jax.tree_util.tree_map(jnp.copy, vol_a), jnp.copy(pa),
                d, p, INTR, interpret=True, free_split=True,
            )
            vol_b, pb = tsdf_integrate_stream(
                jax.tree_util.tree_map(jnp.copy, vol_b), jnp.copy(pb),
                d, p, INTR, interpret=True, free_split=False,
            )
        np.testing.assert_array_equal(
            np.asarray(vol_a.data), np.asarray(vol_b.data)
        )
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))

    def test_split_parity_packed(self):
        self._run(jnp.int32)

    def test_split_parity_float(self):
        self._run(jnp.float32, n=2)

    def test_split_actually_fires(self):
        """The scene must produce a non-empty free superblock list,
        otherwise the parity test is vacuous."""
        from housescan_tpu.ops.tsdf_stream import FIELD_SAT, N_QUARTERS

        frames, poses = _scene(n=2, yaw=0.3)
        res = 128
        vol = tsdf_new(res, 3.0, 0.06)
        planes = jnp.zeros(planes_shape(res), jnp.float32)
        vol, planes = _integrate_stream(
            vol, planes, jnp.asarray(frames[0]), jnp.asarray(poses[0])
        )
        pnp = np.asarray(planes)
        sat = pnp[:, :, :, FIELD_SAT, :N_QUARTERS].reshape(-1, N_QUARTERS) > 0.5
        neg = pnp[:, :, :, FIELD_SAT, N_QUARTERS].reshape(-1) > 0.5
        wl_plain = build_worklist(
            jnp.asarray(frames[1]), jnp.asarray(poses[1]), INTR, res,
            vol.voxel_size, vol.origin, vol.trunc,
            sat_quarters=jnp.asarray(sat),
        )
        wl_split, fwl = build_worklist(
            jnp.asarray(frames[1]), jnp.asarray(poses[1]), INTR, res,
            vol.voxel_size, vol.origin, vol.trunc,
            sat_quarters=jnp.asarray(sat), neg_flags=jnp.asarray(neg),
            free_split=True,
        )
        assert fwl is not None
        n_free = int(np.asarray(fwl.count)[0])
        assert n_free > 0
        # every free-kernel member chunk left the main list
        n_plain = int(np.asarray(wl_plain.count)[0])
        n_main = int(np.asarray(wl_split.count)[0])
        members = int(
            sum(bin(int(b)).count("1")
                for b in np.asarray(fwl.bitmap)[:n_free])
        )
        assert members >= n_free  # at least one member per superblock
        assert n_main <= n_plain
