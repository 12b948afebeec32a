"""Per-stage timing of the KinFu fusion step on the real TPU.

Times each stage of kinfu_step separately (amortized over ITERS calls,
one forced readout at the end, minus the ~25ms relay readout cost) so
optimization effort goes where the milliseconds are.

Run sequentially (ONE TPU process):
  PYTHONPATH=/root/repo:/root/.axon_site nohup python scripts/profile_step.py > /tmp/profile.out 2>&1 &
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from housescan_tpu.kinfu.camera import Intrinsics
from housescan_tpu.kinfu.pipeline import kinfu_init, kinfu_step
from housescan_tpu.kinfu.synthetic import furnished_room, orbit_poses, render_depth_stream

RES = int(os.environ.get("HOUSESCAN_BENCH_RES", "512"))
W, H = 640, 480
ITERS = int(os.environ.get("PROFILE_ITERS", "20"))


def readout(x):
    return float(jnp.sum(x.reshape(-1)[:8]))


def timeit(name, fn, *args, iters=ITERS, force=None):
    out = fn(*args)
    if force is None:
        force = lambda o: readout(jax.tree_util.tree_leaves(o)[0])
    force(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    force(out)
    dt = (time.time() - t0 - 0.025) / iters * 1000.0
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return out, dt


def main():
    intr = Intrinsics(width=W, height=H, fx=525.0, fy=525.0, cx=W / 2 - 0.5, cy=H / 2 - 0.5)
    half, boxes = furnished_room()
    poses = orbit_poses(4, radius=0.25, yaw_range=0.06, pitch=0.25)
    frames = render_depth_stream(intr, poses, half, boxes=boxes)
    depth = jnp.asarray(frames[1])

    state = kinfu_init(intr, resolution=RES, size_m=3.0, trunc=0.03,
                       init_pose=jnp.asarray(poses[0]),
                       dtype=jnp.int32)  # int16-packed, like bench.py
    state = kinfu_step(state, jnp.asarray(frames[0]), intr, use_pallas=True)
    readout(state.pose)
    print(f"# backend={jax.default_backend()} res={RES}", flush=True)

    from housescan_tpu.kinfu.preprocess import build_pyramid
    from housescan_tpu.kinfu.icp import icp_track
    from housescan_tpu.ops.chunk_select import build_worklist
    from housescan_tpu.ops.tsdf_stream import tsdf_integrate_stream
    from housescan_tpu.ops.raycast_pallas import raycast_planes

    vol0 = state.volume
    pose = state.pose

    # --- work-list census ---
    jwl = jax.jit(
        lambda d, p: build_worklist(
            d, p, intr, RES, vol0.voxel_size, vol0.origin, vol0.trunc
        )
    )
    wl, _ = timeit("build_worklist (prepass)", jwl, depth, pose,
                   force=lambda o: readout(o.count.astype(jnp.float32)))
    from housescan_tpu.ops.chunk_select import decode_worklist

    rows = decode_worklist(wl)
    cls = np.asarray([r[3] for r in rows]) if rows else np.zeros(0)
    n = np.asarray(wl.packed).size
    count = int(np.asarray(wl.count)[0])
    print(
        f"# entries: total={n} listed={count} ({count/n:.1%}); chunks: "
        f"free={(cls==0).sum()} band={(cls==1).sum()} refine={(cls==3).sum()}",
        flush=True,
    )

    # --- stage: pyramid ---
    jit_pyr = jax.jit(lambda d: build_pyramid(d, intr, levels=3))
    pyr, _ = timeit("build_pyramid", jit_pyr, depth,
                    force=lambda o: readout(o.maps[0]))

    # --- stage: ICP (channel-major packed maps, kinfu/maps.py) ---
    from housescan_tpu.kinfu import maps as mp

    def icp_fn(live, model, mpose):
        return icp_track(list(live), mp.build_map_pyramid(model, 3),
                         mpose, intr,
                         iterations=(10, 5, 4), dist_threshold=0.10,
                         angle_threshold=0.5236, init_pose=mpose,
                         use_pallas=True)

    for its, nm in (((10,0,0),"L0 only (10 it, id-assoc)"),
                    ((0,5,0),"L1 only (5 it, win2)"),
                    ((0,0,4),"L2 only (4 it, win4)"),
                    ((1,1,1),"1 iter per level")):
        def icp_var(live, model, mpose, _its=its):
            return icp_track(list(live), mp.build_map_pyramid(model, 3),
                             mpose, intr,
                             iterations=_its, dist_threshold=0.10,
                             angle_threshold=0.5236, init_pose=mpose,
                             use_pallas=True)
        timeit("icp " + nm, jax.jit(icp_var),
               pyr.maps, state.model_maps, state.model_pose,
               force=lambda o: readout(o.pose))

    jicp = jax.jit(icp_fn)
    icp, _ = timeit("icp_track(10,5,4)+model pyramid", jicp,
                    pyr.maps, state.model_maps, state.model_pose,
                    force=lambda o: readout(o.pose))

    # --- stage: streaming integrate (donated, like the real loop) ---
    data, planes = vol0.data, state.planes

    def integ(data, planes, d, p):
        v = vol0._replace(data=data)
        nv, np_ = tsdf_integrate_stream(v, planes, d, p, intr)
        return nv.data, np_

    jint = jax.jit(integ, donate_argnums=(0, 1))
    data, planes = jint(data, planes, depth, pose)
    readout(planes)
    t0 = time.time()
    for _ in range(ITERS):
        data, planes = jint(data, planes, depth, pose)
    readout(planes)
    dt = (time.time() - t0 - 0.025) / ITERS * 1000.0
    print(f"{'tsdf_integrate_stream (donated)':44s} {dt:8.2f} ms", flush=True)

    # --- ablation sweep over the streaming kernel ---
    for ab in ("copy", "no_free", "no_band", "no_planes"):
        def integ_ab(data, planes, d, p, ab=ab):
            v = vol0._replace(data=data)
            nv, np_ = tsdf_integrate_stream(v, planes, d, p, intr, ablate=ab)
            return nv.data, np_

        ja = jax.jit(integ_ab, donate_argnums=(0, 1))
        da, pa = jnp.copy(data), jnp.copy(planes)
        da, pa = ja(da, pa, depth, pose)
        readout(pa)
        t0 = time.time()
        for _ in range(ITERS):
            da, pa = ja(da, pa, depth, pose)
        readout(pa)
        dt = (time.time() - t0 - 0.025) / ITERS * 1000.0
        print(f"{'integrate ablate=' + ab:44s} {dt:8.2f} ms", flush=True)

    # --- stage: raycast from persistent planes ---
    volp = vol0._replace(data=data)
    from housescan_tpu.ops.raycast_tiles import build_tile_candidates, raycast_tiles_maps
    jc = jax.jit(lambda pl_, p: build_tile_candidates(pl_, p, intr, volp, z_min=0.3))
    cand, _ = timeit("raycast phase1 (candidates)", jc, planes, pose,
                     force=lambda o: readout(o))
    jray = jax.jit(lambda pl_, p: raycast_planes(pl_, p, intr, volp, z_min=0.3))
    timeit("raycast_planes (full)", jray, planes, pose,
           force=lambda o: readout(o))

    # --- full step ---
    st = kinfu_init(intr, resolution=RES, size_m=3.0, trunc=0.03,
                    init_pose=jnp.asarray(poses[0]),
                    dtype=jnp.int32)
    st = kinfu_step(st, jnp.asarray(frames[0]), intr, use_pallas=True)
    st = kinfu_step(st, depth, intr, use_pallas=True)
    readout(st.pose)
    t0 = time.time()
    for i in range(ITERS):
        st = kinfu_step(st, jnp.asarray(frames[2 + (i % 2)]), intr, use_pallas=True)
    readout(st.pose)
    dt = (time.time() - t0 - 0.025) / ITERS * 1000.0
    print(f"{'kinfu_step (full)':44s} {dt:8.2f} ms  ({1000.0/dt:.1f} fps)", flush=True)


if __name__ == "__main__":
    main()

# Ablation sweep appended by main() when PROFILE_ABLATE=1.
