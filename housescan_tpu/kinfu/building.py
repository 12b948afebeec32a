"""Building-scale streaming scan: N rooms back-to-back into one Scene.

BASELINE config 5 ("8+ rooms, multi-core sharded TSDF, real-time
fusion"). The reference assembled a building by hand: each room was a
separate external KinFu run, loaded with loadRoom and arranged
key-by-key (ref Main.hs:2448-2517 houseSetup; :1738-1762 loadRoom).
Here one orchestrator owns the whole run:

  * rooms fuse back-to-back — on the single-chip streaming Pallas
    pipeline, or on the X-slab-sharded multi-chip volume
    (parallel/sharded.py) when a ``jax.sharding.Mesh`` is supplied and
    the room's volume is large enough to want it;
  * every finished room is recorded in a building-level checkpoint, and
    the in-flight room reuses the mid-scan fusion checkpoint
    (kinfu/scan_checkpoint.py), so a crash anywhere in an hours-long
    building scan resumes mid-room, not from scratch;
  * assembly is data-parallel where it batches: corner suggestion per
    room on the host, then ONE device launch fitting every room's
    cuboid (parallel/rooms_batch.fit_cuboids_sharded — the room-DP
    analog of SURVEY.md section 2c);
  * rooms are chained wall-to-wall (the houseSetup arrangement),
    positions globally least-squares optimized, and the scene +
    .xf transforms exported.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from housescan_tpu.capture.replay import DepthStream
from housescan_tpu.config import Config
from housescan_tpu.kinfu.scan import scan_to_room_dir, write_room_outputs


@dataclass
class RoomScan:
    """One room's input to a building scan.

    ``known_poses`` fuses the room at externally-known camera poses
    (kinfu/scan.py known_poses) instead of tracking — honored on BOTH
    the single-chip and the sharded route (the sharded step takes the
    same per-frame forced_pose)."""

    name: str
    stream: DepthStream
    init_pose: Optional[np.ndarray] = None
    known_poses: Optional[np.ndarray] = None


def _scan_room_sharded(
    room: RoomScan,
    out_dir: Path,
    mesh,
    config: Config,
    progress: bool = False,
    write_mesh: bool = False,
    interpret: bool = False,
    checkpoint_every: int = 0,
    resume: bool = False,
) -> Path:
    """Fuse one room on the X-slab-sharded volume and write its room
    directory. The sharded state keeps the volume distributed across
    the mesh for the whole stream; only the final surface extraction —
    and the periodic mid-scan checkpoint — gathers it to the host.

    ``checkpoint_every=N`` / ``resume`` give sharded rooms the SAME
    frame-granular mid-room resume the single-chip loop has: every N
    frames the slabs gather into the standard scan-checkpoint schema
    (kinfu/scan_checkpoint.py), and a resumed run scatters it back
    across the mesh and continues from the next unfused frame."""
    from housescan_tpu.kinfu.tsdf import TsdfVolume
    from housescan_tpu.parallel.sharded import (
        make_sharded_step,
        sharded_kinfu_init,
        sharded_state_from_single,
        single_state_from_sharded,
    )

    intr = room.stream.intrinsics
    tsdf_cfg = config.tsdf
    use_pallas = (
        tsdf_cfg.resolution % 128 == 0
        and (tsdf_cfg.resolution // 8) % mesh.devices.size == 0
    )
    ckpt = out_dir / "scan_checkpoint.npz"
    start_frame = 0
    poses: List[np.ndarray] = []
    state = None
    if resume and ckpt.exists():
        from housescan_tpu.kinfu.scan_checkpoint import load_scan_state

        kstate, start_frame, trajectory = load_scan_state(ckpt, intr)
        poses = list(trajectory)
        if len(poses) != start_frame:
            raise ValueError(
                f"scan checkpoint stores {len(poses)} poses but resumes "
                f"at frame {start_frame}; refusing a misaligned trajectory"
            )
        state = sharded_state_from_single(mesh, kstate, use_pallas)
        if progress:
            print(f"  [{room.name}] resuming sharded scan at frame {start_frame}")
    if state is None:
        state = sharded_kinfu_init(
            mesh,
            intr,
            resolution=tsdf_cfg.resolution,
            size_m=tsdf_cfg.size_m,
            trunc=tsdf_cfg.trunc_dist,
            init_pose=None if room.init_pose is None else jnp.asarray(room.init_pose),
            use_pallas=use_pallas,
        )
    step = make_sharded_step(
        mesh, intr, use_pallas=use_pallas, interpret=interpret
    )
    for k, frame in enumerate(room.stream):
        if k < start_frame:
            continue
        state = step(
            state,
            jnp.asarray(frame),
            forced_pose=(
                None
                if room.known_poses is None
                else jnp.asarray(room.known_poses[k])
            ),
        )
        poses.append(np.asarray(state.pose))
        if checkpoint_every and (k + 1) % checkpoint_every == 0:
            from housescan_tpu.kinfu.scan_checkpoint import save_scan_state

            save_scan_state(
                single_state_from_sharded(state), k + 1, intr, ckpt,
                trajectory=np.stack(poses),
            )
        if progress and k % 10 == 0:
            print(f"  [{room.name}] frame {k}/{len(room.stream)} (sharded)")

    # Gather the slabs into one host-side volume for extraction/export.
    vol = state.volume
    full = TsdfVolume(
        data=jnp.asarray(np.asarray(vol.data)),
        origin=jnp.asarray(np.asarray(vol.origin)),
        voxel_size=jnp.asarray(np.asarray(vol.voxel_size)),
        trunc=jnp.asarray(np.asarray(vol.trunc)),
    )
    return write_room_outputs(
        full, poses, out_dir, config=config, write_mesh=write_mesh
    )


def cantor_slots(n: int) -> List[Tuple[int, int]]:
    """First ``n`` 2-D grid slots in Cantor-diagonal order — the
    reference's ``diagonalPairs`` room layout (ref Main.hs:2328-2331,
    used by devSetup/houseSetup :2491, :2504): (0,0), (1,0), (0,1),
    (2,0), (1,1), (0,2), ..."""
    out: List[Tuple[int, int]] = []
    d = 0
    while len(out) < n:
        for i in range(d + 1):
            out.append((d - i, i))
        d += 1
    return out[:n]


def cantor_slots_3d(n: int, floors) -> List[Tuple[int, int, int]]:
    """First ``n`` 3-D grid slots: rooms fill ``floors`` contiguous
    chunks bottom-up (the houseSetup shape — ground/first/second floor
    room lists, ref Main.hs:2448-2517), each floor laid out on the
    2-D Cantor grid. Returns (gx, floor, gz) with floor 0 at the
    bottom; floors share the same Cantor grid ordering, so any two
    floors' common slot prefix is vertically aligned and every such
    room has an upstairs/downstairs partner to chain ceiling-to-floor.

    ``floors`` is either an int (rooms split evenly, ceil per floor) or
    an explicit per-floor room-count sequence — the reference's
    houseSetup was 9+8+6 across its three floors."""
    if isinstance(floors, int):
        per = [-(-n // floors)] * floors  # ceil, evenly
    else:
        per = list(floors)
        if sum(per) < n:
            raise ValueError(
                f"floor split {per} holds {sum(per)} rooms < {n}"
            )
    out: List[Tuple[int, int, int]] = []
    f = 0
    in_floor = 0
    for _ in range(n):
        while in_floor >= per[f]:
            f += 1
            in_floor = 0
        gx, gz = cantor_slots(in_floor + 1)[in_floor]
        out.append((gx, f, gz))
        in_floor += 1
    return out


def scan_building(
    rooms: Sequence[RoomScan],
    out_dir: Union[str, Path],
    config: Optional[Config] = None,
    mesh=None,
    sharded_min_resolution: int = 512,
    checkpoint_every: int = 0,
    resume: bool = False,
    progress: bool = False,
    write_mesh: bool = False,
    gap: float = 0.1,
    interpret: bool = False,
    layout: str = "chain",
    floors: int = 1,
):
    """Scan every room, assemble, arrange, optimize, export.

    Returns ``(scene, fitted_rooms, out_dir)``. Rooms at/above
    ``sharded_min_resolution`` fuse on the sharded multi-chip volume
    when ``mesh`` is given; smaller rooms use the single-chip pipeline.
    BOTH paths get frame-granular mid-room resume via
    ``checkpoint_every``/``resume`` (the sharded loop gathers its slabs
    into the same scan-checkpoint schema).
    ``out_dir/building_checkpoint.json`` records finished rooms so a
    resumed building run skips them entirely. ``gap`` is the
    wall-to-wall spacing used when chaining rooms (ref Main.hs:2468:
    neighbouring rooms connected `opposite`).

    ``layout``: ``"chain"`` links rooms in one X line; ``"grid"``
    places rooms on the reference's Cantor-diagonal 2-D grid
    (config.rooms.grid_spacing meters apart, ref Main.hs:2504) and
    chains every grid-adjacent pair along BOTH the X and Z axes, so
    the position optimization solves a genuinely 2-D building.
    ``floors`` > 1 (an int, or an explicit per-floor room-count list
    like houseSetup's 9+8+6) stacks the grid into a 3-D building (the
    3-floor houseSetup, ref Main.hs:2448-2517): rooms split into
    contiguous per-floor chunks, floors stack on Y (upper floors at
    more-negative Y — world up is -Y), and vertically adjacent rooms
    chain ceiling-to-floor so the optimizer solves Y too."""
    from housescan_tpu.rooms import (
        Scene,
        WallRelation,
        adopt_bbox_corners,
        connect_walls,
        load_room,
        optimize_room_positions,
        suggest_corners,
        export_all_room_xf_files,
    )
    from housescan_tpu.rooms.cuboid import apply_cuboid_fit
    from housescan_tpu.solvers.cuboid_fit import fit_cuboid_batch

    config = config or Config()
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    bc_path = out_dir / "building_checkpoint.json"
    done: List[str] = []
    if resume and bc_path.exists():
        done = json.loads(bc_path.read_text()).get("rooms_done", [])
        if progress and done:
            print(f"building resume: rooms already scanned: {done}")

    # ---- fuse every room ----
    room_dirs = []
    for room in rooms:
        rd = out_dir / room.name
        room_dirs.append(rd)
        if room.name in done and (rd / "planes.txt").exists():
            continue
        use_sharded = (
            mesh is not None
            and config.tsdf.resolution >= sharded_min_resolution
        )
        if progress:
            kind = "sharded" if use_sharded else "single-chip"
            print(f"scanning {room.name} ({len(room.stream)} frames, {kind})")
        if use_sharded:
            _scan_room_sharded(
                room, rd, mesh, config,
                progress=progress, write_mesh=write_mesh,
                interpret=interpret,
                checkpoint_every=checkpoint_every, resume=resume,
            )
        else:
            scan_to_room_dir(
                room.stream,
                rd,
                config=config,
                init_pose=room.init_pose,
                write_mesh=write_mesh,
                progress=progress,
                checkpoint_every=checkpoint_every,
                resume=resume,
                known_poses=room.known_poses,
            )
        done.append(room.name)
        bc_path.write_text(json.dumps({"rooms_done": done}))

    # ---- assemble into one scene ----
    scene = Scene()
    loaded = []
    for rd in room_dirs:
        r = load_room(scene, rd)
        r = suggest_corners(scene, r)
        # >8 candidates (furniture-plane intersections): adopt the 8 at
        # the cloud extremes (rooms/corners.py adopt_bbox_corners — the
        # headless accept-on-click).
        r = adopt_bbox_corners(scene, r)
        loaded.append(r)

    # ---- batched cuboid fit: one device launch for the whole floor ----
    fit_rmse: dict = {}
    fit_idx = [i for i, r in enumerate(loaded) if len(r.corners) >= 8]
    fitted = list(loaded)
    if fit_idx:
        batch = jnp.asarray(
            np.stack(
                [
                    np.stack([c for _, c in loaded[i].corners[:8]])
                    for i in fit_idx
                ]
            ),
            jnp.float32,
        )
        if mesh is not None and len(fit_idx) % mesh.devices.size == 0:
            from housescan_tpu.parallel.rooms_batch import fit_cuboids_sharded

            fits = fit_cuboids_sharded(batch, mesh)
        else:
            fits = jax.jit(fit_cuboid_batch)(batch)
        for row, i in enumerate(fit_idx):
            new_room = apply_cuboid_fit(scene, loaded[i], fits.params[row])
            rmse = float(np.sqrt(np.asarray(fits.error[row])))
            fit_rmse[rooms[i].name] = rmse
            if progress:
                print(f"  {rooms[i].name}: cuboid RMSE {rmse*1000:.2f} mm")
            fitted[i] = new_room

    # ---- arrange + chain rooms wall-to-wall and optimize (houseSetup) ----
    from housescan_tpu.rooms.types import Axis
    from housescan_tpu.rooms.walls import best_axis

    def _connect_axis(ra, rb, axis_i):
        """Connect ra's high-``axis_i`` wall to rb's low one (inward
        normals: the +axis wall's inward normal points -axis, so ra's
        min-normal plane faces rb's max-normal plane). Only planes whose
        dominant normal IS the requested axis qualify — a partially
        scanned room without a wall on this axis simply stays
        unconnected (connect_walls would reject a cross-axis pair
        anyway, ref Main.hs:2056)."""
        if not ra.corners or not rb.corners:
            # optimize_room_positions refuses corner-less rooms (ref
            # Main.hs:2102-2103); a partially-scanned room stays
            # unconnected rather than poisoning the whole solve.
            return
        axis = (Axis.X, Axis.Y, Axis.Z)[axis_i]
        ca = [p for p in ra.planes if best_axis(p.normal) == axis]
        cb = [p for p in rb.planes if best_axis(p.normal) == axis]
        if not ca or not cb:
            return
        pa = min(ca, key=lambda p: p.normal[axis_i])
        pb = max(cb, key=lambda p: p.normal[axis_i])
        connect_walls(
            scene, pa.plane_id, pb.plane_id, WallRelation.opposite(gap)
        )

    if layout == "grid":
        from housescan_tpu.rooms import translate_room

        spacing = config.rooms.grid_spacing
        slots = cantor_slots_3d(len(fitted), floors)
        by_slot = {}
        for i, (gx, fl, gz) in enumerate(slots):
            r = scene.rooms[fitted[i].room_id]
            # World up is -Y (camera convention; rooms/align.py): upper
            # floors sit at more-negative Y.
            moved = translate_room(
                r,
                np.array(
                    [gx * spacing, -fl * spacing, gz * spacing], np.float32
                ),
            )
            scene.update_room(moved)
            fitted[i] = moved
            by_slot[(gx, fl, gz)] = i
        for (gx, fl, gz), i in by_slot.items():
            for dx, dz, axis_i in ((1, 0, 0), (0, 1, 2)):
                j = by_slot.get((gx + dx, fl, gz + dz))
                if j is not None:
                    _connect_axis(fitted[i], fitted[j], axis_i)
            # Vertical chaining: the UPSTAIRS room's floor (+Y face,
            # which faces downward) kisses this room's ceiling — in
            # _connect_axis terms ra=upstairs (its min-Y-normal plane
            # is its floor), rb=downstairs (max-Y-normal = ceiling),
            # Opposite with the slab gap (ref Main.hs:2328-2331 grid +
            # the 3-floor houseSetup :2448-2517).
            j = by_slot.get((gx, fl + 1, gz))
            if j is not None:
                _connect_axis(fitted[j], fitted[i], 1)
    else:
        for a in range(len(fitted) - 1):
            _connect_axis(fitted[a], fitted[a + 1], 0)
    results = optimize_room_positions(scene)
    if progress:
        for axis, nc, rmse in results:
            print(f"  aligned {axis.name} ({nc} constraints) RMSE {rmse:.5f}")
    fitted = [scene.rooms[r.room_id] for r in fitted]

    # Assembly diagnostics land in the building checkpoint so callers
    # (and tests) can verify every stage ENGAGED — a silently skipped
    # fit/connect/optimize is observable, not just printed.
    bc_path.write_text(json.dumps({
        "rooms_done": done,
        "fit_rmse": fit_rmse,
        "n_wall_connections": len(scene.connected_walls),
        "optimize": [
            [axis.name, int(nc), float(rmse)] for axis, nc, rmse in results
        ],
    }))
    export_all_room_xf_files(scene, out_dir / "xf")
    return scene, fitted, out_dir
