"""Channel-major map layout (kinfu/maps.py): exactness of the matmul
downsampler, pack layout parity with the legacy interleaved packer, and
gradient parity with kinfu/icp._model_gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from housescan_tpu.kinfu import maps as mp
from housescan_tpu.kinfu.camera import Intrinsics
from housescan_tpu.kinfu.preprocess import (
    build_pyramid,
    depth_to_vertices,
    vertex_normals,
)
from housescan_tpu.kinfu.synthetic import furnished_room, orbit_poses, render_depth_stream

INTR = Intrinsics(width=160, height=120, fx=131.25, fy=131.25, cx=79.5, cy=59.5)


def _frame():
    half, boxes = furnished_room()
    poses = orbit_poses(2, radius=0.25, yaw_range=0.1, pitch=0.25)
    frames = render_depth_stream(INTR, poses, half, boxes=boxes)
    return jnp.asarray(frames[0]), jnp.asarray(poses[0])


class TestHalveMaps:
    def test_matmul_matches_strided_slice(self):
        """The MXU one-hot selection must be BIT-identical to [::2, ::2]
        (the whole point: same values, none of the gather cost). The
        matmul branch is forced by calling its body directly."""
        rng = np.random.default_rng(0)
        m = jnp.asarray(rng.normal(size=(7, 64, 128)).astype(np.float32))
        want = np.asarray(m)[:, ::2, ::2]
        # force the matmul path (CPU default takes the slice branch)
        c, h, w = m.shape
        sel_h = mp._half_selector(h, m.dtype)
        sel_w = mp._half_selector(w, m.dtype)
        x = jax.lax.dot_general(m, sel_w, (((2,), (1,)), ((), ())), precision="highest")
        x = jax.lax.dot_general(x, sel_h, (((1,), (1,)), ((), ())), precision="highest")
        got = np.asarray(x.transpose(0, 2, 1))
        np.testing.assert_array_equal(got, want)

    def test_pyramid_levels(self):
        m = jnp.arange(8 * 32 * 64, dtype=jnp.float32).reshape(8, 32, 64)
        pyr = mp.build_map_pyramid(m, 3)
        assert [p.shape for p in pyr] == [(8, 32, 64), (8, 16, 32), (8, 8, 16)]
        np.testing.assert_array_equal(
            np.asarray(pyr[2]), np.asarray(m)[:, ::4, ::4]
        )


class TestPackParity:
    def test_pack_icp_inputs_matches_legacy_packer(self):
        """pack_icp_inputs on channel-major maps must equal the legacy
        interleaved pack_level_maps row for row (the ICP kernel consumes
        this layout blind)."""
        from housescan_tpu.kinfu.icp import _model_gradients
        from housescan_tpu.ops.icp_pallas import BAND_H, pack_level_maps

        depth, pose = _frame()
        v = depth_to_vertices(depth, INTR)
        n = vertex_normals(v)
        mv = v @ pose[:3, :3] + pose[3, :3]
        mn = n @ pose[:3, :3]
        mok = (v[..., 2] > 0) & (jnp.linalg.norm(n, axis=-1) > 0.5)
        grads = _model_gradients(mv, mok)
        legacy = np.asarray(pack_level_maps(v, n, mv, mn, mok, grads))

        live = mp.live_from_hwc(v, n)
        model = mp.model_from_hwc(mv, mn, mok, depth)
        packed = np.asarray(
            mp.pack_icp_inputs(
                live, model, mp.model_gradients(model), band_h=BAND_H
            )
        )
        assert packed.shape == legacy.shape
        np.testing.assert_array_equal(packed, legacy)

    def test_model_gradients_parity(self):
        from housescan_tpu.kinfu.icp import _model_gradients

        depth, pose = _frame()
        v = depth_to_vertices(depth, INTR)
        n = vertex_normals(v)
        mv = v @ pose[:3, :3] + pose[3, :3]
        mok = (v[..., 2] > 0) & (jnp.linalg.norm(n, axis=-1) > 0.5)
        gu, gv = _model_gradients(mv, mok)
        model = mp.model_from_hwc(mv, n, mok, depth)
        g = np.asarray(mp.model_gradients(model))
        np.testing.assert_array_equal(g[0:3], np.moveaxis(np.asarray(gu), -1, 0))
        np.testing.assert_array_equal(g[3:6], np.moveaxis(np.asarray(gv), -1, 0))


class TestLivePyramidParity:
    def test_packed_pyramid_matches_interleaved_builders(self):
        """build_pyramid's packed rows must equal depth_to_vertices /
        vertex_normals on the same per-level depths (the channel-major
        rewrite is a layout change, not a math change)."""
        depth, _ = _frame()
        pyr = build_pyramid(depth, INTR, levels=3)
        for lvl in range(3):
            v = np.asarray(depth_to_vertices(pyr.depths[lvl], INTR.level(lvl)))
            n = np.asarray(vertex_normals(jnp.asarray(v)))
            got = np.asarray(pyr.maps[lvl])
            np.testing.assert_array_equal(got[0:3], np.moveaxis(v, -1, 0))
            np.testing.assert_allclose(
                got[3:6], np.moveaxis(n, -1, 0), atol=1e-6
            )


class TestRoundTrips:
    def test_model_hwc_round_trip(self):
        rng = np.random.default_rng(1)
        m = jnp.asarray(rng.normal(size=(8, 16, 32)).astype(np.float32))
        m = m.at[mp.MD_VALID].set((np.asarray(m[mp.MD_VALID]) > 0).astype(np.float32))
        v, n, ok, d = mp.model_to_hwc(m)
        back = mp.model_from_hwc(v, n, ok, d)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(m))
