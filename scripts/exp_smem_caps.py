"""Two TPU experiments:

1. Can a Pallas input use SMEM blocks WITH an index_map (per-band scalar
   candidate tables), and how fast are scalar loads from it?
2. How much of the streaming integrate's time is per-grid-step pipeline
   overhead? (run the same kernel with grid 16384 vs 8192 on a work list
   that fits in both)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def readout(x):
    return float(jnp.sum(x.reshape(-1)[:8]))


def exp1():
    NB, NF, NC = 60, 16, 256

    def kernel(cand, out):
        b = pl.program_id(0)

        def body(c, acc):
            nx = cand[0, 0, c]
            ny = cand[0, 1, c]
            nz = cand[0, 2, c]
            return acc + nx * ny - nz

        acc = jax.lax.fori_loop(0, NC, body, jnp.float32(0.0))
        out[...] = jnp.full((8, 128), acc, jnp.float32)

    cand = jnp.arange(NB * NF * NC, dtype=jnp.float32).reshape(NB, NF, NC) * 1e-6
    try:
        f = pl.pallas_call(
            kernel,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec(
                    (1, NF, NC), lambda b: (b, 0, 0), memory_space=pltpu.SMEM
                )
            ],
            out_specs=pl.BlockSpec((8, 128), lambda b: (b % 8, 0)),
            out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
        )
        jf = jax.jit(f)
        out = jf(cand)
        readout(out)
        t0 = time.time()
        for _ in range(20):
            out = jf(cand)
        readout(out)
        dt = (time.time() - t0 - 0.025) / 20 * 1000.0
        per = dt / (NB * NC) * 1e6
        print(f"exp1 SMEM block index_map: OK  {dt:.3f} ms "
              f"({per:.0f} ns per 3-scalar candidate read)", flush=True)
    except Exception as e:
        print(f"exp1 SMEM block index_map FAILED: {type(e).__name__}: {e}"[:500],
              flush=True)


def exp2():
    from housescan_tpu.kinfu.camera import Intrinsics
    from housescan_tpu.kinfu.synthetic import furnished_room, orbit_poses, render_depth_stream
    from housescan_tpu.kinfu.pipeline import kinfu_init, kinfu_step
    from housescan_tpu.ops.tsdf_stream import tsdf_integrate_stream
    import housescan_tpu.ops.tsdf_stream as ts

    intr = Intrinsics(width=640, height=480, fx=525.0, fy=525.0, cx=319.5, cy=239.5)
    half, boxes = furnished_room()
    poses = orbit_poses(2, radius=0.25, yaw_range=0.02, pitch=0.25)
    frames = render_depth_stream(intr, poses, half, boxes=boxes)
    depth = jnp.asarray(frames[1])
    state = kinfu_init(intr, resolution=512, size_m=3.0, trunc=0.03,
                       init_pose=jnp.asarray(poses[0]))
    state = kinfu_step(state, jnp.asarray(frames[0]), intr, use_pallas=True)
    readout(state.pose)

    vol0 = state.volume
    pose = state.pose

    for cap in (16384, 8192, 6144):
        # monkeypatch the grid size through a sliced work list
        orig = ts.build_worklist

        def capped(*a, _cap=cap, **kw):
            wl = orig(*a, **kw)
            return type(wl)(
                packed=wl.packed[:_cap],
                count=jnp.minimum(wl.count, _cap),
                bi=wl.bi[:_cap],
                bj=wl.bj[:_cap],
                bk=wl.bk[:_cap],
            )

        ts.build_worklist = capped
        try:
            def integ(tsdf, w, planes, d, p):
                v = vol0._replace(tsdf=tsdf, weight=w)
                nv, np_ = tsdf_integrate_stream(v, planes, d, p, intr,
                                                ablate="copy")
                return nv.tsdf, nv.weight, np_

            ji = jax.jit(integ, donate_argnums=(0, 1, 2))
            t_, w_, p_ = (jnp.copy(vol0.tsdf), jnp.copy(vol0.weight),
                          jnp.copy(state.planes))
            t_, w_, p_ = ji(t_, w_, p_, depth, pose)
            readout(p_)
            t0 = time.time()
            for _ in range(20):
                t_, w_, p_ = ji(t_, w_, p_, depth, pose)
            readout(p_)
            dt = (time.time() - t0 - 0.025) / 20 * 1000.0
            print(f"exp2 copy-ablate grid cap={cap}: {dt:.2f} ms", flush=True)
        finally:
            ts.build_worklist = orig


if __name__ == "__main__":
    print(f"# backend={jax.default_backend()}", flush=True)
    exp1()
    exp2()
