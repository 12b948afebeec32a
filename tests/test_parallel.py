"""Multi-device tests on the virtual 8-device CPU mesh.

Covers the sharded TSDF fusion step (X-slab volume sharding, halo
exchange, psum'd ICP) and room-batch data parallelism — the multi-device
testing the reference never had (SURVEY.md section 4, item 6:
'Multi-node testing: n/a').
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from housescan_tpu.kinfu.camera import Intrinsics
from housescan_tpu.kinfu.synthetic import furnished_room, orbit_poses, render_depth_stream
from housescan_tpu.kinfu.tsdf import tsdf_new, tsdf_integrate
from housescan_tpu.parallel import (
    fit_cuboids_sharded,
    make_mesh,
    make_sharded_step,
    sharded_kinfu_init,
)
from housescan_tpu.solvers.cuboid_fit import cuboid_from_params

INTR = Intrinsics(width=160, height=120, fx=131.25, fy=131.25, cx=79.5, cy=59.5)

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


@pytest.fixture(scope="module")
def stream():
    half, boxes = furnished_room()
    poses = orbit_poses(3, radius=0.25, yaw_range=0.08, pitch=0.25)
    frames = render_depth_stream(INTR, poses, half, boxes=boxes)
    return poses, frames


@needs_8
class TestShardedFusion:
    def test_sharded_integrate_matches_single_device(self, mesh, stream):
        poses, frames = stream
        state = sharded_kinfu_init(
            mesh, INTR, resolution=64, size_m=3.0, trunc=0.1,
            init_pose=jnp.asarray(poses[0]),
        )
        step = make_sharded_step(mesh, INTR, max_raycast_steps=48)
        state = step(state, jnp.asarray(frames[0]))

        # Single-device reference integrate of the same frame.
        ref = tsdf_new(64, 3.0, 0.1)
        ref = tsdf_integrate(ref, jnp.asarray(frames[0]), jnp.asarray(poses[0]), INTR)

        np.testing.assert_allclose(
            np.asarray(state.volume.tsdf), np.asarray(ref.tsdf), atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(state.volume.weight), np.asarray(ref.weight)
        )

    def test_sharded_tracking_two_frames(self, mesh, stream):
        poses, frames = stream
        state = sharded_kinfu_init(
            mesh, INTR, resolution=64, size_m=3.0, trunc=0.1,
            init_pose=jnp.asarray(poses[0]),
        )
        step = make_sharded_step(mesh, INTR, max_raycast_steps=48)
        for i in range(3):
            state = step(state, jnp.asarray(frames[i]))
        err = float(jnp.linalg.norm(state.pose[3, :3] - jnp.asarray(poses[2])[3, :3]))
        # 64^3 voxels are 47mm; tracking within ~1.5 voxels is healthy here
        assert err < 0.07, f"sharded tracking err {err*1000:.1f}mm"
        assert float(jnp.mean(state.model_valid.astype(jnp.float32))) > 0.5

    def test_volume_is_actually_sharded(self, mesh, stream):
        poses, _ = stream
        state = sharded_kinfu_init(mesh, INTR, resolution=64)
        shard_shapes = {s.data.shape for s in state.volume.tsdf.addressable_shards}
        assert shard_shapes == {(8, 64, 64)}  # 64/8 X-slabs


@needs_8
class TestRoomBatchDP:
    def test_sharded_cuboid_fit_exact(self, mesh):
        rng = np.random.default_rng(3)
        batch = []
        for _ in range(8):
            p = np.concatenate(
                [rng.uniform(-2, 2, 3), rng.uniform(2, 5, 3), rng.normal(size=4)]
            )
            batch.append(np.asarray(cuboid_from_params(jnp.asarray(p, jnp.float32))))
        fit = fit_cuboids_sharded(jnp.asarray(np.stack(batch)), mesh)
        assert fit.params.shape == (8, 10)
        assert float(jnp.max(fit.error)) < 1e-3
