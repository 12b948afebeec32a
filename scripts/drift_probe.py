"""Tracking-drift diagnosis harness (CPU interpret mode or real TPU).

Runs the synthetic furnished-room orbit (the bench.py scene) in one of
three modes and prints per-frame pose error, isolating drift sources:

  closed   : the production loop (track -> integrate at tracked pose).
             Errors feed back through the volume; this is bench.py.
  gt-vol   : integrate every frame at its GROUND-TRUTH pose, then track
             each frame against that model. No feedback: what remains is
             pure per-frame tracking error against the piecewise-planar
             raycast model.
  gt-track : integrate at ground-truth poses like gt-vol, but ALSO run
             the closed-loop state update (model rendered at the tracked
             pose). Separates "volume corrupted by pose error" from
             "model rendered at the wrong viewpoint".

Usage:
  python scripts/drift_probe.py [--res 128] [--frames 20] [--mode closed]
                                [--wh 320x240] [--tpu]

CPU by default (interpret-mode Pallas kernels, bit-faithful to the TPU
math); pass --tpu to run on the real chip.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--mode", choices=["closed", "gt-vol", "gt-track"],
                    default="closed")
    ap.add_argument("--wh", default="320x240")
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--radius", type=float, default=0.25)
    ap.add_argument("--trunc", type=float, default=None)
    ap.add_argument("--xla", action="store_true",
                    help="use the XLA TSDF-marcher raycast instead of the "
                    "Pallas plane raycast (quality reference)")
    ap.add_argument("--dist", type=float, default=None,
                    help="ICP fine-level distance gate override")
    ap.add_argument("--noise", type=float, default=0.0,
                    help="Kinect-like depth noise sigma at 2 m (meters)")
    ap.add_argument("--world", choices=["box", "curved"], default="box",
                    help="box: axis-aligned furniture only; curved: "
                    "spheres + cylinder + rotated boxes")
    ap.add_argument("--static-repeats", type=int, default=0, metavar="N",
                    help="closed mode: after the orbit, feed the LAST "
                    "frame N more times (a tripod pause) and print the "
                    "pose walk every 10 repeats — does the "
                    "refusion creep saturate or grow?")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from housescan_tpu.kinfu import maps as mp
    from housescan_tpu.kinfu.camera import Intrinsics
    from housescan_tpu.kinfu.icp import icp_track
    from housescan_tpu.kinfu.pipeline import (
        _integrate_dispatch,
        kinfu_init,
        kinfu_step,
    )
    from housescan_tpu.kinfu.preprocess import build_pyramid
    from housescan_tpu.kinfu.synthetic import (
        curved_furnished_room,
        furnished_room,
        orbit_poses,
        render_depth_stream,
    )
    from housescan_tpu.ops.raycast_pallas import raycast_planes

    width, height = (int(x) for x in args.wh.split("x"))
    intr = Intrinsics(
        width=width, height=height,
        fx=525.0 * width / 640, fy=525.0 * width / 640,
        cx=width / 2 - 0.5, cy=height / 2 - 0.5,
    )
    n = args.frames
    if args.world == "curved":
        half, boxes, spheres, cyls, obbs = curved_furnished_room()
        shapes = dict(boxes=boxes, spheres=spheres, cylinders=cyls, obbs=obbs)
    else:
        half, boxes = furnished_room()
        shapes = dict(boxes=boxes)
    poses = orbit_poses(n + 1, radius=args.radius, yaw_range=0.02 * n,
                        pitch=0.25)
    frames = render_depth_stream(intr, poses, half, noise=args.noise,
                                 **shapes)

    interpret = not args.tpu
    kw = dict(resolution=args.res, size_m=3.0,
              trunc=args.trunc or max(0.03, 3.0 / args.res * 2.5),
              init_pose=jnp.asarray(poses[0]),
              dtype=jnp.float32 if args.xla else jnp.int32)

    def perr(pose, i):
        return float(np.linalg.norm(
            np.asarray(pose)[3, :3] - poses[i][3, :3])) * 1000

    # The streaming Pallas integrate needs z % 128 == 0; smaller
    # resolutions take the XLA dense path automatically.
    use_pallas = (not args.xla) and args.res % 128 == 0

    if args.mode == "closed":
        state = kinfu_init(intr, **kw)
        dist = None if args.dist is None else (args.dist, 0.05, 0.10)
        e = 0.0
        for i in range(n + 1):
            state = kinfu_step(state, jnp.asarray(frames[i]), intr,
                               dist_threshold=dist,
                               use_pallas=use_pallas, interpret=interpret)
            if i > 0:
                e = perr(state.pose, i)
                print(f"frame {i:3d}: err {e:7.3f} mm  rmse "
                      f"{float(state.last_rmse)*1000:6.2f} mm  "
                      f"corr {int(state.last_corr)}")
        print(f"mode=closed final pose err after {n} frames: {e:.3f} mm "
              f"({e/n:.3f} mm/frame)")
        if args.static_repeats:
            e0 = e
            worst = e
            for k in range(1, args.static_repeats + 1):
                state = kinfu_step(state, jnp.asarray(frames[n]), intr,
                                   dist_threshold=dist,
                                   use_pallas=use_pallas,
                                   interpret=interpret)
                e = perr(state.pose, n)
                worst = max(worst, e)
                if k % 10 == 0 or k == args.static_repeats:
                    print(f"static {k:4d}: err {e:7.3f} mm  rmse "
                          f"{float(state.last_rmse)*1000:6.2f} mm  "
                          f"corr {int(state.last_corr)}")
            print(f"static-camera walk over {args.static_repeats} repeats: "
                  f"{e0:.3f} -> {e:.3f} mm (worst {worst:.3f})")
        return

    # gt-vol / gt-track: integrate at ground truth.
    st = kinfu_init(intr, **kw)
    volume, planes = st.volume, st.planes
    errs = []
    model = None  # rendered model from the previous iteration
    model_pose = None
    for i in range(n + 1):
        gt_pose = jnp.asarray(poses[i])
        if i > 0 and model is not None:
            pyr = build_pyramid(jnp.asarray(frames[i]), intr, levels=3)
            model_pyr = mp.build_map_pyramid(model, 3)
            # Mirror kinfu_step's production gates unless overridden.
            tight = args.dist or max(0.5 * 3.0 / args.res, 0.006)
            icp = icp_track(list(pyr.maps), model_pyr, model_pose, intr,
                            iterations=(10, 5, 4), use_pallas=True,
                            dist_threshold=(tight, 0.05, 0.10),
                            tight_threshold=tight,
                            interpret=interpret)
            e = perr(icp.pose, i)
            errs.append(e)
            print(f"frame {i:3d}: err {e:7.3f} mm  rmse "
                  f"{float(icp.rmse)*1000:6.2f} mm  corr {int(icp.n_corr)}")
        volume, planes = _integrate_dispatch(
            volume, planes, jnp.asarray(frames[i]), gt_pose, intr, 128.0,
            use_pallas, interpret=interpret)
        # Render for the next frame's tracking: at the GT pose (gt-vol)
        # or at the latest track (gt-track measures viewpoint effects).
        render_pose = gt_pose if args.mode == "gt-vol" or i == 0 else icp.pose
        model = raycast_planes(planes, render_pose, intr, volume,
                               interpret=interpret)
        model_pose = render_pose
    print(f"mode={args.mode} per-frame tracking err: "
          f"mean {np.mean(errs):.3f} mm  max {np.max(errs):.3f} mm")


if __name__ == "__main__":
    main()
