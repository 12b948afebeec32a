"""Plane-raycast model fidelity probe.

Builds a volume from N ground-truth-posed frames of the synthetic room,
raycasts the plane model at a held-out pose, and compares the model
depth map against the ANALYTIC ground-truth depth for that pose,
splitting the signed error by the hit block's fit quality so we can see
where the model bias that drives ICP drift actually lives.

Usage: python scripts/model_error_probe.py [--res 128] [--wh 320x240]
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--wh", default="320x240")
    ap.add_argument("--trunc", type=float, default=0.06)
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--world", choices=["box", "curved"], default="box",
                    help="box: axis-aligned furniture only (the model's "
                    "exactly-representable world); curved: spheres + "
                    "cylinder + rotated boxes (curvature bias visible)")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from housescan_tpu.kinfu import maps as mp
    from housescan_tpu.kinfu.camera import Intrinsics
    from housescan_tpu.kinfu.pipeline import _integrate_dispatch, kinfu_init
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
    poses = orbit_poses(n + 1, radius=0.25, yaw_range=0.02 * n, pitch=0.25)
    frames = render_depth_stream(intr, poses, half, **shapes)
    interpret = not args.tpu

    st = kinfu_init(intr, resolution=args.res, size_m=3.0, trunc=args.trunc,
                    init_pose=jnp.asarray(poses[0]), dtype=jnp.int32)
    volume, planes = st.volume, st.planes
    for i in range(n + 1):
        volume, planes = _integrate_dispatch(
            volume, planes, jnp.asarray(frames[i]), jnp.asarray(poses[i]),
            intr, 128.0, True, interpret=interpret)

    # Held-out pose: frame n's pose (the model was built from it too, but
    # we're measuring model surface fidelity, not generalization).
    pose = jnp.asarray(poses[n])
    model = raycast_planes(planes, pose, intr, volume, interpret=interpret)
    gt_depth = np.asarray(
        render_depth_stream(intr, poses[n:n + 1], half, **shapes)
    )[0].astype(np.float64)

    m = np.asarray(model)
    md = m[mp.MD_DEPTH]
    ok = (m[mp.MD_VALID] > 0.5) & (gt_depth > 0)
    err = np.where(ok, md - gt_depth, 0.0)
    ae = np.abs(err)
    sel = ok
    print(f"valid model px: {sel.sum()} / {ok.size} "
          f"({100*sel.mean():.1f}%)")
    print(f"depth err: mean {err[sel].mean()*1000:+.3f} mm  "
          f"median |e| {np.median(ae[sel])*1000:.3f} mm  "
          f"p90 |e| {np.percentile(ae[sel], 90)*1000:.3f} mm  "
          f"max |e| {ae[sel].max()*1000:.1f} mm")

    # Split by error magnitude: how much signed bias comes from the tail?
    for cut_mm in (2, 5, 10, 20):
        tail = sel & (ae > cut_mm * 1e-3)
        if tail.sum():
            print(f"  |e| > {cut_mm:3d} mm: {tail.sum():6d} px "
                  f"({100*tail.sum()/sel.sum():5.2f}% of valid), "
                  f"mean signed {err[tail].mean()*1000:+8.2f} mm")

    # Where are the bad pixels? Distance to the nearest gt depth edge
    # (silhouette proximity).
    gz = gt_depth
    edge = np.zeros_like(gz, bool)
    e_thr = 0.05
    edge[:-1] |= np.abs(gz[:-1] - gz[1:]) > e_thr
    edge[1:] |= np.abs(gz[1:] - gz[:-1]) > e_thr
    edge[:, :-1] |= np.abs(gz[:, :-1] - gz[:, 1:]) > e_thr
    edge[:, 1:] |= np.abs(gz[:, 1:] - gz[:, :-1]) > e_thr
    from scipy.ndimage import distance_transform_edt

    dist = distance_transform_edt(~edge)
    for lo, hi in ((0, 2), (2, 5), (5, 1e9)):
        band = sel & (dist >= lo) & (dist < hi)
        if band.sum():
            print(f"  {lo:3.0f}-{hi if hi < 1e9 else 999:3.0f} px from "
                  f"silhouette: {band.sum():6d} px, mean signed "
                  f"{err[band].mean()*1000:+7.3f} mm, median |e| "
                  f"{np.median(ae[band])*1000:6.3f} mm, "
                  f"p90 |e| {np.percentile(ae[band], 90)*1000:7.3f} mm")

    # Incidence split (grazing surfaces).
    v = np.moveaxis(m[mp.MD_V], 0, -1)
    nrm = np.moveaxis(m[mp.MD_N], 0, -1)
    cam = np.asarray(pose)[3, :3]
    ray = v - cam
    ray /= np.maximum(np.linalg.norm(ray, axis=-1, keepdims=True), 1e-9)
    inc = -np.sum(nrm * ray, axis=-1)
    for lo, hi in ((0.0, 0.3), (0.3, 0.7), (0.7, 1.01)):
        band = sel & (inc >= lo) & (inc < hi)
        if band.sum():
            print(f"  incidence {lo:.1f}-{hi:.1f}: {band.sum():6d} px, "
                  f"mean signed {err[band].mean()*1000:+7.3f} mm, median "
                  f"|e| {np.median(ae[band])*1000:6.3f} mm")


if __name__ == "__main__":
    main()
