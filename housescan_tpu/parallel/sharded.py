"""Mesh-sharded KinFu: the multi-chip fusion step.

The volume-scaling strategy SURVEY.md section 5 calls for: the TSDF grid
is sharded into X-slabs across a 1-D device mesh (NamedSharding over ICI)
and every stage of the fusion step runs SPMD via shard_map:

  * integrate — embarrassingly shard-local: each device integrates its
    own slab (gather-side design pays off: no cross-shard writes exist).
  * raycast — each device marches rays through its slab only (with a
    2-voxel halo exchanged from neighbors via ppermute so surfaces
    straddling slab boundaries are seen); the first crossing is combined
    across shards with a pmin, and the winning shard's vertex is selected
    with a psum.
  * ICP fine level — pixel rows sharded; each device reduces its partial
    6x6 normal equations, one psum yields the global system (the ICI
    reduction the BASELINE.json north star names).

Coarse ICP levels and the depth preprocess run replicated: they are
KB-scale images, not worth a collective.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from housescan_tpu.geometry.transform import mm
from housescan_tpu.kinfu import maps as mp
from housescan_tpu.kinfu.camera import Intrinsics
from housescan_tpu.kinfu.icp import (
    _model_gradients,
    _normal_equations,
    _solve_increment,
    _twist_to_proj,
    icp_track,
)
from housescan_tpu.kinfu.preprocess import build_pyramid, vertex_normals
from housescan_tpu.kinfu.raycast import raycast
from housescan_tpu.kinfu.tsdf import TsdfVolume, integrate_core, make_volume, tsdf_new
from housescan_tpu.parallel.mesh import VOLUME_AXIS


class ShardedKinFuState(NamedTuple):
    volume: TsdfVolume  # tsdf/weight sharded on axis 0 (X-slabs)
    # Persistent per-sub-block surface planes, X-block-sharded like the
    # volume (the Pallas path's raycast acceleration structure +
    # free-space saturation flags); dummy (1,1,1,16,16) zeros for the
    # XLA path.
    planes: jnp.ndarray
    pose: jnp.ndarray
    # Channel-major packed model maps (kinfu/maps.py), replicated.
    model_maps: jnp.ndarray  # (8, H, W) f32
    frame_index: jnp.ndarray


def sharded_kinfu_init(
    mesh: Mesh,
    intr: Intrinsics,
    resolution: int = 128,
    size_m: float = 3.0,
    trunc: float = 0.06,
    init_pose=None,
    use_pallas: bool = False,
) -> ShardedKinFuState:
    """Allocate the volume already laid out in X-slabs across the mesh.

    ``use_pallas=True`` allocates the production int16-packed (X, Y, Z)
    volume layout plus the X-block-sharded persistent planes array the
    streaming-kernel path needs (resolution must tile (8, 8, 128) and
    split across the mesh)."""
    rep = NamedSharding(mesh, P())
    if use_pallas:
        vol = tsdf_new(resolution, size_m, trunc, dtype=jnp.int32)
        sharding = NamedSharding(mesh, P(VOLUME_AXIS, None, None))
    else:
        vol = tsdf_new(resolution, size_m, trunc)
        sharding = NamedSharding(mesh, P(None, VOLUME_AXIS, None, None))
    vol = TsdfVolume(
        data=jax.device_put(vol.data, sharding),
        origin=jax.device_put(vol.origin, rep),
        voxel_size=jax.device_put(vol.voxel_size, rep),
        trunc=jax.device_put(vol.trunc, rep),
    )
    if use_pallas:
        from housescan_tpu.ops.tsdf_stream import planes_shape

        n_dev = mesh.devices.size
        assert resolution % 128 == 0 and (resolution // 8) % n_dev == 0, (
            "pallas sharded path needs a (8,8,128)-tileable volume whose "
            f"X blocks split over {n_dev} devices"
        )
        planes = jax.device_put(
            jnp.zeros(planes_shape(resolution), jnp.float32),
            NamedSharding(mesh, P(VOLUME_AXIS)),
        )
    else:
        planes = jax.device_put(
            jnp.zeros((1, 1, 1, 16, 16), jnp.float32), rep
        )
    pose = jnp.eye(4, dtype=jnp.float32) if init_pose is None else jnp.array(init_pose, jnp.float32, copy=True)
    h, w = intr.height, intr.width
    return ShardedKinFuState(
        volume=vol,
        planes=planes,
        pose=jax.device_put(pose, rep),
        model_maps=jnp.zeros((mp.MODEL_ROWS, h, w), jnp.float32),
        frame_index=jnp.asarray(0, jnp.int32),
    )


def _local_volume(tsdf, weight, origin, voxel_size, trunc, axis_name):
    """The shard's slab as a self-contained TsdfVolume with local origin."""
    idx = jax.lax.axis_index(axis_name)
    nx_local = tsdf.shape[0]
    local_origin = origin + jnp.array([1.0, 0.0, 0.0], jnp.float32) * (
        idx.astype(jnp.float32) * nx_local * voxel_size
    )
    return make_volume(tsdf, weight, local_origin, voxel_size, trunc)


def _halo_extend_x(tsdf, weight, axis_name, halo: int):
    """Exchange ``halo`` X-planes with both neighbors via ppermute and
    concatenate, so slab-local sampling sees across the boundary."""
    n = jax.lax.psum(1, axis_name)
    perm_fwd = [(i, (i + 1) % n) for i in range(n)]  # send to right
    perm_bwd = [(i, (i - 1) % n) for i in range(n)]  # send to left

    def exchange(arr):
        top = arr[:halo]  # my lowest planes -> left neighbor's high halo
        bottom = arr[-halo:]  # my highest planes -> right neighbor's low halo
        from_left = jax.lax.ppermute(bottom, axis_name, perm_fwd)
        from_right = jax.lax.ppermute(top, axis_name, perm_bwd)
        return jnp.concatenate([from_left, arr, from_right], axis=0)

    ext_t = exchange(tsdf)
    ext_w = exchange(weight)
    # First and last shard received wrapped-around planes; mark them
    # unobserved so they cannot fabricate surfaces.
    idx = jax.lax.axis_index(axis_name)
    is_first = idx == 0
    is_last = idx == n - 1
    ext_w = ext_w.at[:halo].set(jnp.where(is_first, 0.0, ext_w[:halo]))
    ext_t = ext_t.at[:halo].set(jnp.where(is_first, 1.0, ext_t[:halo]))
    ext_w = ext_w.at[-halo:].set(jnp.where(is_last, 0.0, ext_w[-halo:]))
    ext_t = ext_t.at[-halo:].set(jnp.where(is_last, 1.0, ext_t[-halo:]))
    return ext_t, ext_w


def make_sharded_step(
    mesh: Mesh,
    intr: Intrinsics,
    levels: int = 3,
    iterations: Tuple[int, ...] = (4, 3, 3),
    max_raycast_steps: int = 96,
    halo: int = 2,
    use_pallas: bool = False,
    interpret: bool = False,
):
    """Build the jitted SPMD fusion step for ``mesh``.

    Returns step(state, raw_depth) -> state. One call tracks (coarse
    replicated + fine psum-sharded ICP), integrates the slab-sharded
    volume, and re-renders the model.

    ``use_pallas=True`` runs the PRODUCTION kernels inside shard_map —
    the streaming work-list integrate (with persistent per-slab planes
    and saturation gating) and the plane-candidate raycast with a pmin
    combine across slabs — so the multi-chip path has the single-chip
    path's speed characteristics (SURVEY.md section 7 step 6).
    ``interpret=True`` runs those kernels in interpret mode (the CPU
    test mesh). The default XLA kernels remain for volumes that don't
    tile (8, 8, 128).
    """
    axis = VOLUME_AXIS
    n_dev = mesh.devices.size

    # --- pallas path: streaming integrate + plane raycast per slab ----
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(axis),  # volume data slab: X is dim 0 packed, dim 1 float
            P(axis),  # planes slab (X-block dim 0)
            P(), P(), P(), P(), P(),
        ),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    def integrate_shards_pallas(data, planes, origin, voxel_size, trunc, depth, pose):
        from housescan_tpu.kinfu.tsdf import TsdfVolume as TV
        from housescan_tpu.ops.tsdf_stream import tsdf_integrate_stream

        idx = jax.lax.axis_index(axis)
        nx_local = data.shape[0] if data.ndim == 3 else data.shape[1]
        # GLOBAL origin + global X-block offset: the kernels compute
        # world coordinates as origin + (local + bx0)*8*vs, which is
        # bit-identical to the single-chip arithmetic (a slab-local
        # origin rounds differently in f32 and breaks exact parity).
        vol = TV(data=data, origin=origin, voxel_size=voxel_size, trunc=trunc)
        gnbx = (nx_local // 8) * n_dev
        bx0 = idx * (nx_local // 8)
        nv, npl = tsdf_integrate_stream(
            vol, planes, depth, pose, intr,
            interpret=interpret,
            global_blocks=(gnbx, bx0),
        )
        return nv.data, npl

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    def raycast_shards_pallas(data, planes, origin, voxel_size, trunc, pose):
        from housescan_tpu.kinfu.tsdf import TsdfVolume as TV
        from housescan_tpu.ops.raycast_pallas import RAW_BID, RAW_OCC
        from housescan_tpu.ops.raycast_tiles import raycast_tiles_maps

        idx = jax.lax.axis_index(axis)
        nx_local = data.shape[0] if data.ndim == 3 else data.shape[1]
        # Global origin + block offset: bit-identical geometry (see
        # integrate_shards_pallas).
        vol = TV(data=data, origin=origin, voxel_size=voxel_size, trunc=trunc)
        bx0 = idx * (nx_local // 8)
        raw = raycast_tiles_maps(
            planes, pose, intr, vol, z_min=0.3, interpret=interpret,
            block_x0=bx0,
        )  # (8, H, W) channel-major: depth, vertex, normal, bid
        # Nearest slab hit wins; sub-block ids are globally unique.
        # Combine with component-wise pmax over -BIG-masked losers: the
        # tile kernel itself resolves equal-depth ties by a per-
        # component max over the tied candidates, so this reproduces
        # the single-chip maps BIT-EXACTLY even when the tied planes
        # live in different slabs (vertices derive from the shared
        # best_t, so they are identical across tied slabs anyway).
        big = jnp.float32(1.0e9)
        depth_m = raw[mp.MD_DEPTH]
        my = jnp.where(depth_m > 0, depth_m, jnp.inf)
        best = jax.lax.pmin(my, axis)
        win = (depth_m > 0) & (my <= best)
        any_win = jax.lax.pmax(win.astype(jnp.float32), axis) > 0
        # One masked pmax combines vertex+normal rows AND the bid row
        # (bid's loser sentinel is -1; -big masks lower still).
        rows = jax.lax.pmax(jnp.where(win[None], raw[1:RAW_OCC], -big), axis)
        rows = jnp.where(any_win[None], rows, 0.0)
        bid_out = jnp.where(any_win, rows[RAW_BID - 1], -1.0)
        depth_out = jnp.where(any_win, jnp.where(jnp.isinf(best), 0.0, best), 0.0)
        # Occluder events compete GLOBALLY: the nearest gate-failed
        # block across all slabs must be able to suppress a surface
        # win from any other slab (finalize_plane_maps does the
        # suppression on this combined row — bit-exact single-chip
        # semantics; raw row 8 carries BIG where a slab saw none).
        occ_out = jax.lax.pmin(raw[RAW_OCC], axis)
        return jnp.concatenate(
            [depth_out[None], rows[: RAW_BID - 1], bid_out[None],
             occ_out[None]], axis=0
        )

    # --- integrate: shard-local ---------------------------------------
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None, None), P(), P(), P(), P(), P()),
        out_specs=(P(axis, None, None), P(axis, None, None)),
    )
    def integrate_shards(tsdf, weight, origin, voxel_size, trunc, depth, pose):
        vol = _local_volume(tsdf, weight, origin, voxel_size, trunc, axis)
        out = integrate_core(vol, depth, pose, intr)
        return out.tsdf, out.weight

    # --- raycast: slab march + pmin combine ----------------------------
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None, None), P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def raycast_shards(tsdf, weight, origin, voxel_size, trunc, pose):
        ext_t, ext_w = _halo_extend_x(tsdf, weight, axis, halo)
        vol = _local_volume(tsdf, weight, origin, voxel_size, trunc, axis)
        vol = make_volume(
            ext_t,
            ext_w,
            vol.origin - jnp.array([halo, 0, 0], jnp.float32) * voxel_size,
            voxel_size,
            trunc,
        )
        rc = raycast(vol, pose, intr, max_steps=max_raycast_steps)
        # Nearest crossing across shards wins.
        my_depth = jnp.where(rc.valid, rc.depth, jnp.inf)
        best = jax.lax.pmin(my_depth, axis)
        win = rc.valid & (my_depth <= best)
        verts = jax.lax.psum(jnp.where(win[..., None], rc.vertices, 0.0), axis)
        wins = jax.lax.psum(win.astype(jnp.float32), axis)
        # Ties across halo overlaps: average (identical values anyway).
        verts = verts / jnp.maximum(wins[..., None], 1.0)
        valid = wins > 0
        depth_out = jnp.where(valid, jnp.where(jnp.isinf(best), 0.0, best), 0.0)
        return verts, valid, depth_out

    # --- ICP fine level: rows sharded, psum'd normal equations ---------
    # The per-shard math is kinfu/icp.py's _normal_equations — the SAME
    # function the single-chip tracker runs per GN iteration (projective
    # association into the previous camera, linearized sub-pixel lookup,
    # distance/angle gates, Huber + incidence weighting) — applied to a
    # row-slab with a global row offset, then psum'd into the global 6x6
    # system. One quality story across single-chip, Pallas-sharded and
    # XLA-sharded paths.
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(axis, None, None),  # live vertices (rows sharded)
            P(axis, None, None),  # live normals
            P(axis, None, None),  # model vertices
            P(axis, None, None),  # model normals
            P(axis, None),  # model valid
            P(axis, None, None),  # model grad u
            P(axis, None, None),  # model grad v
            P(),  # pose
            P(),  # prev pose (association camera)
            P(),  # distance gate (traced scalar)
        ),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    def fine_normal_equations(lv, ln, mv, mn, mok, gu, gv, pose, prev_pose, dist):
        idx = jax.lax.axis_index(axis)
        row0 = idx * lv.shape[0]
        a, b, n_corr, sq = _normal_equations(
            pose, lv, ln, mv, mn, mok, (gu, gv), prev_pose, intr,
            dist, 0.5236, window=0, row0=row0,
        )
        return (
            jax.lax.psum(a, axis),
            jax.lax.psum(b, axis),
            jax.lax.psum(n_corr, axis),
            jax.lax.psum(sq, axis),
        )

    def _fuse(state, raw_depth, new_pose, tracked):
        """Integrate + re-render at ``new_pose`` (dropped frames fuse
        an all-invalid depth and keep the previous model maps)."""
        raw_depth = jnp.where(tracked, raw_depth, jnp.zeros_like(raw_depth))
        vol = state.volume
        if use_pallas:
            data, planes = integrate_shards_pallas(
                vol.data, state.planes, vol.origin, vol.voxel_size,
                vol.trunc, raw_depth, new_pose,
            )
            volume = vol._replace(data=data)
            raw = raycast_shards_pallas(
                volume.data, planes, volume.origin, volume.voxel_size,
                volume.trunc, new_pose,
            )
            from housescan_tpu.ops.raycast_pallas import finalize_plane_maps

            model_maps = finalize_plane_maps(
                raw, voxel_size=volume.voxel_size
            )
        else:
            planes = state.planes
            tsdf, weight = integrate_shards(
                vol.tsdf, vol.weight, vol.origin, vol.voxel_size, vol.trunc,
                raw_depth, new_pose,
            )
            volume = vol.replace_grids(tsdf=tsdf, weight=weight)

            verts, valid, _depth = raycast_shards(
                volume.tsdf, volume.weight, volume.origin, volume.voxel_size,
                volume.trunc, new_pose,
            )
            # Normals from the combined vertex map (replicated, small).
            rot = new_pose[:3, :3]
            v_cam = jnp.where(
                valid[..., None], mm(verts - new_pose[3, :3], rot.T), 0.0
            )
            n_cam = vertex_normals(v_cam)
            normals = mm(n_cam, rot)
            valid = valid & (jnp.sum(n_cam * n_cam, axis=-1) > 0.25)
            model_maps = mp.model_from_hwc(
                jnp.where(valid[..., None], verts, 0.0),
                jnp.where(valid[..., None], normals, 0.0),
                valid,
                _depth,
            )

        model_maps = jnp.where(tracked, model_maps, state.model_maps)
        return ShardedKinFuState(
            volume=volume,
            planes=planes,
            pose=new_pose,
            model_maps=model_maps,
            frame_index=state.frame_index + 1,
        )

    @jax.jit
    def step(
        state: ShardedKinFuState,
        raw_depth: jnp.ndarray,
        forced_pose: jnp.ndarray = None,
    ) -> ShardedKinFuState:
        """``forced_pose`` fuses the frame at an externally-known
        camera pose instead of tracking (kinfu_step's forced_pose,
        threaded here so building scans with known_poses can route
        rooms to the sharded volume too)."""
        is_first = state.frame_index == 0

        if forced_pose is not None:
            new_pose = jnp.asarray(forced_pose, jnp.float32)
            tracked = jnp.asarray(True)  # known pose: always fuse
            return _fuse(state, raw_depth, new_pose, tracked)

        pyr = build_pyramid(raw_depth, intr, levels=levels)
        model_pyr = mp.build_map_pyramid(state.model_maps, levels)

        if use_pallas:
            # The production tracker, replicated: the model maps are
            # KB-scale, so running icp_track identically on every device
            # costs less than any collective and keeps the multi-chip
            # pose trajectory NUMERICALLY IDENTICAL to the single-chip
            # pipeline's. (The row-sharded psum'd GN variant below
            # remains the XLA path's demonstrator for scale-out of the
            # 6x6 reduction.)
            # Per-level loose gates + adaptive tight gate mirroring
            # kinfu_step's defaults exactly (bit-exact parity with
            # single-chip; see kinfu/pipeline.py for the 0.5-voxel
            # formula).
            tight = jnp.maximum(0.5 * state.volume.voxel_size, 0.006)
            icp = icp_track(
                list(pyr.maps),
                model_pyr,
                state.pose,
                intr,
                iterations=iterations,
                dist_threshold=(tight, 0.05, 0.10),
                init_pose=state.pose,
                use_pallas=True,
                interpret=interpret,
                tight_threshold=tight,
            )
            pose = icp.pose
            icp_corr = icp.n_corr
        else:
            # XLA path (volumes that don't tile (8, 8, 128)): the SAME
            # quality machinery as the single-chip tracker — the
            # voxel-scaled tight gate at every level (kinfu/pipeline.py
            # 0.5-voxel formula), adaptive widening to the loose
            # per-level gates on correspondence collapse, and the
            # tracking-loss frame drop below.
            tight = jnp.maximum(0.5 * state.volume.voxel_size, 0.006)
            # Coarse levels replicated (small images).
            coarse = icp_track(
                list(pyr.maps),
                model_pyr,
                state.pose,
                intr,
                iterations=(0,) + tuple(iterations[1:]),
                dist_threshold=(tight, 0.05, 0.10),
                tight_threshold=tight,
            )
            pose = coarse.pose

            # Fine level: sharded psum'd Gauss-Newton iterations via the
            # shared _normal_equations (the finest level's loose gate IS
            # the tight gate — kinfu_step's dist_threshold[0] — so the
            # gate here is unconditionally tight; adaptive widening only
            # ever applies at the coarse levels handled above).
            lv0, ln0 = mp.live_to_hwc(pyr.maps[0])
            mv0, mn0, mok0, _ = mp.model_to_hwc(model_pyr[0])
            gu0, gv0 = _model_gradients(mv0, mok0)
            # Diagnostics from the FINEST level that actually had
            # correspondences, exactly like icp_track: the fine level's
            # identity-class association only engages at sub-pixel
            # projective flow (its ±1.5 px gate), so a normal-motion
            # frame legitimately reports nc=0 here — overwriting the
            # coarse count with that 0 made the tracking-loss gate drop
            # EVERY frame and freeze the pose at init (caught by the
            # 20-frame free-running orbit test this round).
            icp_corr = coarse.n_corr
            for _ in range(iterations[0]):
                a, b, nc, _sq = fine_normal_equations(
                    lv0, ln0, mv0, mn0, mok0, gu0, gv0, pose, state.pose,
                    tight,
                )
                x, ok = _solve_increment(a, b)
                pose = jnp.where(ok, mm(pose, _twist_to_proj(x)), pose)
                icp_corr = jnp.where(nc > 0, nc, icp_corr)

        new_pose = jnp.where(is_first, state.pose, pose)

        # Tracking-loss gate mirroring kinfu_step exactly (drop the
        # frame: previous pose, all-invalid depth -> no-op integrate;
        # sparse-model frames are growth phase, not loss). Applies to
        # BOTH the Pallas and XLA paths.
        min_corr = max(32, int(0.002 * intr.width * intr.height))
        model_px = jnp.sum(state.model_maps[mp.MD_VALID] > 0.5)
        # Correspondence + view-consistency gate, mirroring kinfu_step
        # exactly (see the comment there for why the depth arm exists).
        both_valid = (raw_depth > 0) & (state.model_maps[mp.MD_VALID] > 0.5)
        view_incons = jnp.sum(
            jnp.where(
                both_valid,
                jnp.minimum(
                    jnp.abs(raw_depth - state.model_maps[mp.MD_DEPTH]), 1.0
                ),
                0.0,
            )
        ) / jnp.maximum(jnp.sum(both_valid), 1)
        tracked = (
            is_first
            | ((icp_corr >= min_corr) & (view_incons <= 0.15))
            | (model_px < 4 * min_corr)
        )
        new_pose = jnp.where(tracked, new_pose, state.pose)
        return _fuse(state, raw_depth, new_pose, tracked)

    return step


def single_state_from_sharded(state: ShardedKinFuState):
    """Gather a sharded fusion state into a host-side single-chip
    KinFuState — the scan-checkpoint schema (kinfu/scan_checkpoint.py),
    giving SHARDED rooms the same frame-granular mid-scan resume the
    single-chip loop has. The sharded state conflates pose/model_pose
    and does not carry rmse diagnostics; the checkpoint records the
    conservative equivalents."""
    import numpy as np

    from housescan_tpu.kinfu.pipeline import KinFuState

    vol = state.volume
    volume = TsdfVolume(
        data=jnp.asarray(np.asarray(vol.data)),
        origin=jnp.asarray(np.asarray(vol.origin)),
        voxel_size=jnp.asarray(np.asarray(vol.voxel_size)),
        trunc=jnp.asarray(np.asarray(vol.trunc)),
    )
    pose = jnp.asarray(np.asarray(state.pose))
    return KinFuState(
        volume=volume,
        planes=jnp.asarray(np.asarray(state.planes)),
        pose=pose,
        model_maps=jnp.asarray(np.asarray(state.model_maps)),
        model_pose=pose,
        frame_index=jnp.asarray(np.asarray(state.frame_index)),
        last_rmse=jnp.asarray(0.0, jnp.float32),
        last_corr=jnp.asarray(0, jnp.int32),
        last_tracked=jnp.asarray(True),
    )


def sharded_state_from_single(
    mesh: Mesh, kstate, use_pallas: bool
) -> ShardedKinFuState:
    """Scatter a single-chip KinFuState (e.g. a loaded scan checkpoint)
    back into the X-slab-sharded layout (inverse of
    single_state_from_sharded)."""
    rep = NamedSharding(mesh, P())
    if use_pallas:
        data_sh = NamedSharding(mesh, P(VOLUME_AXIS, None, None))
        planes_sh = NamedSharding(mesh, P(VOLUME_AXIS))
    else:
        data_sh = NamedSharding(mesh, P(None, VOLUME_AXIS, None, None))
        planes_sh = rep
    vol = kstate.volume
    volume = TsdfVolume(
        data=jax.device_put(jnp.asarray(vol.data), data_sh),
        origin=jax.device_put(jnp.asarray(vol.origin), rep),
        voxel_size=jax.device_put(jnp.asarray(vol.voxel_size), rep),
        trunc=jax.device_put(jnp.asarray(vol.trunc), rep),
    )
    return ShardedKinFuState(
        volume=volume,
        planes=jax.device_put(jnp.asarray(kstate.planes), planes_sh),
        pose=jax.device_put(jnp.asarray(kstate.pose), rep),
        model_maps=jnp.asarray(kstate.model_maps),
        frame_index=jnp.asarray(kstate.frame_index),
    )


def sharded_fusion_step(state, raw_depth, mesh, intr, **kwargs):
    """Convenience one-shot wrapper (builds the step each call; for loops
    use make_sharded_step once)."""
    return make_sharded_step(mesh, intr, **kwargs)(state, raw_depth)
