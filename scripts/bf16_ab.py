"""bf16-vs-packed-int volume storage A/B on hardware (PERFORMANCE.md).

The open question from rounds 2-3: bfloat16 volume storage halves the
volume's HBM traffic (~+1 fps) but a SINGLE orbit measured +1.6 mm pose
drift — unresolvable against the ±2 mm between-build trajectory noise
floor. Statistical resolution needs repeated orbits per arm; identical
orbits are deterministic on the chip, so the repeats vary the orbit
GEOMETRY (pitch/radius perturbations around the bench orbit) and the
arms are compared PAIRED per variant.

Run on the real TPU:  python scripts/bf16_ab.py [n_variants]
Writes one JSON line per (variant, arm) and a paired summary.
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from housescan_tpu.config import enable_compilation_cache

    enable_compilation_cache()

    from housescan_tpu.kinfu.camera import Intrinsics
    from housescan_tpu.kinfu.pipeline import kinfu_init, kinfu_step
    from housescan_tpu.kinfu.synthetic import (
        furnished_room,
        orbit_poses,
        render_depth_stream,
    )

    n_variants = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    n_frames = 20
    res = 512
    intr = Intrinsics(width=640, height=480, fx=525.0, fy=525.0,
                      cx=319.5, cy=239.5)
    half, boxes = furnished_room()
    use_pallas = jax.default_backend() != "cpu"

    results = {}
    for v in range(n_variants):
        pitch = 0.25 + 0.02 * (v - n_variants // 2)
        radius = 0.25 + 0.015 * (v - n_variants // 2)
        poses = orbit_poses(
            n_frames + 1, radius=radius, yaw_range=0.02 * n_frames, pitch=pitch
        )
        frames = render_depth_stream(intr, poses, half, boxes=boxes)
        dev_frames = [jnp.asarray(f) for f in frames]
        for arm, dtype in (("packed_int", jnp.int32), ("bf16", jnp.bfloat16)):
            state = kinfu_init(
                intr, resolution=res, size_m=3.0, trunc=0.03,
                init_pose=jnp.asarray(poses[0]), dtype=dtype,
            )
            state = kinfu_step(state, dev_frames[0], intr, use_pallas=use_pallas)
            float(jnp.sum(state.pose))  # force (axon block_until_ready)
            t0 = time.time()
            for i in range(1, n_frames + 1):
                state = kinfu_step(state, dev_frames[i], intr,
                                   use_pallas=use_pallas)
            float(jnp.sum(state.pose))
            dt = time.time() - t0
            err = float(
                np.linalg.norm(
                    np.asarray(state.pose)[3, :3] - poses[n_frames][3, :3]
                )
            ) * 1000.0
            results.setdefault(arm, []).append(err)
            results.setdefault(arm + "_fps", []).append(n_frames / dt)
            print(json.dumps({
                "variant": v, "arm": arm, "pose_err_mm": round(err, 3),
                "fps": round(n_frames / dt, 2),
            }), flush=True)

    a = np.array(results["packed_int"])
    b = np.array(results["bf16"])
    d = b - a
    print(json.dumps({
        "summary": "bf16 minus packed_int, paired per orbit variant",
        "packed_int_err_mm": [round(x, 3) for x in a],
        "bf16_err_mm": [round(x, 3) for x in b],
        "paired_diff_mm": [round(x, 3) for x in d],
        "mean_diff_mm": round(float(d.mean()), 3),
        "std_diff_mm": round(float(d.std(ddof=1)), 3) if len(d) > 1 else None,
        "packed_int_fps": round(float(np.mean(results["packed_int_fps"])), 2),
        "bf16_fps": round(float(np.mean(results["bf16_fps"])), 2),
    }), flush=True)


if __name__ == "__main__":
    main()
