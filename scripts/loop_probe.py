"""Loop-closure problem statement: what happens when a tracked scan
REVISITS its oldest map sector? (VERDICT r4 item 10 — beyond-parity.)

KinFu has no loop closure (neither did the reference's PCL fork, ref
README.md:14,25-26): pose drift accumulated over a long trajectory
conflicts with the map built hundreds of frames earlier, and ICP must
either snap to the old sheet (abrupt pose jump) or fight it (smeared
double-walls). Every in-repo trajectory is frontier-only BY DESIGN
(kinfu/synthetic.py coverage_sweep_poses); this probe deliberately
breaks that rule with a >= 1.25-turn orbit so the camera re-enters the
first-mapped sector with whatever drift the orbit accumulated.

Measured per frame (printed as JSONL for plotting):
  * pose error vs ground truth (the headline drift curve),
  * ICP rmse / correspondence count,
  * VIEW CONSISTENCY: mean |live - model| depth over jointly-valid
    pixels, clipped at 1 m — the signal kinfu_step's loss gate uses
    (pipeline.py ~:235) and the natural revisit-conflict detector: on
    re-entry the live frame disagrees with the OLD sheet by the full
    accumulated drift, so a sustained elevation above the fresh-sector
    baseline flags the revisit without any ground truth.

Run (CPU, one core — serialize with other heavy runs):
  python scripts/loop_probe.py --res 64 --wh 160x120 --turns 1.6
"""

import argparse
import json
import math


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--wh", default="160x120")
    ap.add_argument("--turns", type=float, default=1.6,
                    help="orbit turns; >1 revisits the start sector")
    ap.add_argument("--rate", type=float, default=0.035,
                    help="yaw rad/frame (tracked envelope: 0.035)")
    ap.add_argument("--radius", type=float, default=0.2)
    ap.add_argument("--xla", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from housescan_tpu.kinfu.camera import Intrinsics
    from housescan_tpu.kinfu.pipeline import kinfu_init, kinfu_step
    from housescan_tpu.kinfu.synthetic import (
        flat_furnished_room,
        render_depth_stream,
    )

    width, height = (int(x) for x in args.wh.split("x"))
    intr = Intrinsics(
        width=width, height=height,
        fx=525.0 * width / 640, fy=525.0 * width / 640,
        cx=width / 2 - 0.5, cy=height / 2 - 0.5,
    )
    half, boxes = flat_furnished_room()

    # Level wall orbit at the tracked-envelope rate (the same pose_of
    # construction as coverage_sweep_poses, without the no-revisit cap).
    def pose_of(yaw: float) -> np.ndarray:
        forward = np.array([math.sin(yaw), 0.0, math.cos(yaw)])
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(up, forward)
        right /= np.linalg.norm(right)
        down = np.cross(forward, right)
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = np.stack([right, down, forward])
        m[3, :3] = np.array(
            [args.radius * math.sin(yaw), 0.0, args.radius * math.cos(yaw)]
        )
        return m

    n = int(args.turns * 2 * math.pi / args.rate)
    poses = np.stack([pose_of(args.rate * i) for i in range(n + 1)])
    frames = render_depth_stream(intr, poses, half, boxes=boxes)
    revisit_frame = int(2 * math.pi / args.rate)

    use_pallas = (not args.xla) and args.res % 128 == 0
    state = kinfu_init(
        intr, resolution=args.res, size_m=3.0,
        trunc=max(0.03, 3.0 / args.res * 2.5),
        init_pose=jnp.asarray(poses[0]),
        dtype=jnp.float32 if args.xla else jnp.int32,
    )

    worst = 0.0
    worst_fresh = 0.0  # worst error BEFORE the revisit boundary
    for i in range(n + 1):
        frame = jnp.asarray(frames[i])
        # View consistency vs the PREVIOUS step's model render (the
        # same pairing kinfu_step gates on), computed pre-step.
        vc = None
        if i > 0:
            md = np.asarray(state.model_maps[0])
            dv = np.asarray(frame)
            both = (md > 0) & (dv > 0)
            if both.sum() > 100:
                vc = float(
                    np.minimum(np.abs(md[both] - dv[both]), 1.0).mean()
                )
        state = kinfu_step(state, frame, intr,
                           use_pallas=use_pallas, interpret=use_pallas)
        err = float(
            np.linalg.norm(np.asarray(state.pose)[3, :3] - poses[i][3, :3])
        ) * 1000.0
        worst = max(worst, err)
        if i < revisit_frame:
            worst_fresh = max(worst_fresh, err)
        print(json.dumps({
            "frame": i,
            "yaw_deg": round(math.degrees(args.rate * i), 1),
            "revisit": i >= revisit_frame,
            "err_mm": round(err, 2),
            "rmse_mm": round(float(state.last_rmse) * 1000, 3),
            "corr": int(state.last_corr),
            "view_mm": None if vc is None else round(vc * 1000, 2),
            "tracked": bool(state.last_tracked),
        }))
    print(f"# {n} frames ({args.turns} turns), revisit at frame "
          f"{revisit_frame}: worst err {worst:.1f} mm "
          f"(fresh-sector worst {worst_fresh:.1f} mm)")


if __name__ == "__main__":
    main()
