"""Batch-of-sharded-rooms offline re-fuse: DP x SP composed on one mesh.

The one parallelism composition the 1-D paths don't express
(SURVEY.md section 2c, communication backend row): N recorded room
streams fuse SIMULTANEOUSLY, each room's TSDF volume X-slab-sharded
across its row of a 2-D (rooms x slab) mesh (parallel/mesh.make_mesh2d).
This is the offline re-fuse workflow: trajectories are already known
(recorded by a live scan, or refined offline), so fusion is pure
integration at forced poses — no tracking feedback — and every
(room, slab) tile is embarrassingly parallel (the gather-side TSDF
design means no cross-shard writes exist, and with poses given there is
no ICP reduction either; the rooms axis never communicates at all,
which is exactly why it maps onto DCN across slices in a multi-slice
deployment while slab halos/reductions stay on ICI).

The reference's analog was re-running its external KinFu tool per room,
one GPU run at a time (ref README.md:14-16); here a whole building
re-fuses in one device program per frame step.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from housescan_tpu.kinfu.camera import Intrinsics
from housescan_tpu.kinfu.tsdf import TsdfVolume, integrate_core, make_volume, tsdf_new
from housescan_tpu.parallel.mesh import ROOMS_AXIS, VOLUME_AXIS


def refuse_rooms_2d(
    mesh2d: Mesh,
    streams: Sequence[np.ndarray],  # R x (N, H, W) float32 depth
    trajectories: Sequence[np.ndarray],  # R x (N, 4, 4) camera-to-world
    intr: Intrinsics,
    resolution: int = 128,
    size_m: float = 3.0,
    trunc: float = 0.06,
    max_weight: float = 128.0,
) -> List[TsdfVolume]:
    """Fuse ``R`` recorded streams at their recorded poses, each room
    X-slab-sharded over its mesh row. Returns the R fused volumes
    (gathered). All streams must share length and intrinsics; pad a
    short stream with zero frames (an all-invalid depth integrates as a
    no-op).

    The integrate body is kinfu.tsdf.integrate_core — the SAME math as
    the single-chip XLA path, applied per (room, slab) tile with a
    slab-local origin, so the result is exactly what R independent
    single-device fusions produce (asserted by tests/test_parallel.py).
    """
    n_rooms, n_slabs = mesh2d.devices.shape
    if len(streams) != n_rooms or len(trajectories) != n_rooms:
        raise ValueError(
            f"{len(streams)} streams / {len(trajectories)} trajectories "
            f"for a {n_rooms}-room mesh"
        )
    n_frames = len(streams[0])
    if any(len(s) != n_frames for s in streams):
        raise ValueError("all streams must share one length (pad with zeros)")

    vol0 = tsdf_new(resolution, size_m, trunc)
    vol_sharding = NamedSharding(mesh2d, P(ROOMS_AXIS, VOLUME_AXIS, None, None))
    rep = NamedSharding(mesh2d, P())
    rooms_sh = NamedSharding(mesh2d, P(ROOMS_AXIS))

    tsdf = jax.device_put(
        jnp.broadcast_to(vol0.tsdf, (n_rooms,) + vol0.tsdf.shape), vol_sharding
    )
    weight = jax.device_put(jnp.zeros_like(tsdf), vol_sharding)
    origin = jax.device_put(vol0.origin, rep)
    voxel_size = jax.device_put(vol0.voxel_size, rep)

    @partial(
        shard_map,
        mesh=mesh2d,
        in_specs=(
            P(ROOMS_AXIS, VOLUME_AXIS, None, None),  # tsdf (R, X, Y, Z)
            P(ROOMS_AXIS, VOLUME_AXIS, None, None),  # weight
            P(),  # origin
            P(),  # voxel size
            P(ROOMS_AXIS),  # depth (R, H, W)
            P(ROOMS_AXIS),  # pose (R, 4, 4)
        ),
        out_specs=(
            P(ROOMS_AXIS, VOLUME_AXIS, None, None),
            P(ROOMS_AXIS, VOLUME_AXIS, None, None),
        ),
    )
    def integrate_tiles(ts, wt, org, vs, depth, pose):
        # Tile = one room's one X-slab: (1, nx_local, ny, nz).
        slab = jax.lax.axis_index(VOLUME_AXIS)
        nx_local = ts.shape[1]
        local_origin = org + jnp.array([1.0, 0.0, 0.0], jnp.float32) * (
            slab.astype(jnp.float32) * nx_local * vs
        )
        vol = make_volume(ts[0], wt[0], local_origin, vs, jnp.float32(trunc))
        out = integrate_core(vol, depth[0], pose[0], intr, max_weight=max_weight)
        return out.tsdf[None], out.weight[None]

    step = jax.jit(integrate_tiles, donate_argnums=(0, 1))

    for k in range(n_frames):
        depth_k = jax.device_put(
            jnp.asarray(np.stack([s[k] for s in streams]), jnp.float32), rooms_sh
        )
        pose_k = jax.device_put(
            jnp.asarray(np.stack([t[k] for t in trajectories]), jnp.float32),
            rooms_sh,
        )
        tsdf, weight = step(tsdf, weight, origin, voxel_size, depth_k, pose_k)

    tsdf_h = np.asarray(tsdf)
    weight_h = np.asarray(weight)
    return [
        make_volume(
            jnp.asarray(tsdf_h[r]),
            jnp.asarray(weight_h[r]),
            vol0.origin,
            vol0.voxel_size,
            vol0.trunc,
        )
        for r in range(n_rooms)
    ]
