"""Chunk-classification census (CPU): how many (8,8,128) / (8,8,32)
chunks of the bench volume are SKIP / FREE / BAND for the bench scene?

Sizes the win from selected-chunk streaming in the integrate kernel.
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from housescan_tpu.kinfu.camera import Intrinsics
from housescan_tpu.kinfu.synthetic import furnished_room, orbit_poses, render_depth_stream

RES = 512
SIZE = 3.0
TRUNC = 0.03
W, H = 640, 480


def census(chunk_z):
    intr = Intrinsics(width=W, height=H, fx=525.0, fy=525.0, cx=W / 2 - 0.5, cy=H / 2 - 0.5)
    half, boxes = furnished_room()
    poses = orbit_poses(2, radius=0.25, yaw_range=0.02, pitch=0.25)
    depth = np.asarray(render_depth_stream(intr, poses, half, boxes=boxes)[1])
    pose = np.asarray(poses[1])

    vs = SIZE / RES
    origin = np.array([-SIZE / 2, -SIZE / 2, -SIZE / 2])
    nbx = RES // 8
    nzc = RES // chunk_z

    # chunk corner coordinates (world), conservative outer bounds
    ii, jj, kk = np.meshgrid(np.arange(nbx), np.arange(nbx), np.arange(nzc), indexing="ij")
    corners = []
    for dx in (0, 8):
        for dy in (0, 8):
            for dz in (0, chunk_z):
                x = origin[0] + (ii * 8 + dx) * vs
                y = origin[1] + (jj * 8 + dy) * vs
                z = origin[2] + (kk * chunk_z + dz) * vs
                corners.append(np.stack([x, y, z], axis=-1))
    c = np.stack(corners, axis=-2)  # (nbx, nbx, nzc, 8, 3)

    rot = pose[:3, :3]
    t = pose[3, :3]
    cam = (c - t) @ rot.T  # matches kernel: xc = dx*r00 + dy*r01 + dz*r02
    z = cam[..., 2]
    zmin = z.min(-1)
    zmax = z.max(-1)
    clean = zmin > 1e-6

    safe_z = np.maximum(z, 1e-6)
    u = 525.0 * cam[..., 0] / safe_z + intr.cx
    v = 525.0 * cam[..., 1] / safe_z + intr.cy
    umin, umax = u.min(-1), u.max(-1)
    vmin, vmax = v.min(-1), v.max(-1)

    out_frustum = clean & ((umax < 0) | (umin > W - 1) | (vmax < 0) | (vmin > H - 1))
    skip_behind_cam = zmax <= 1e-6

    # footprint depth min/max from the true depth map (ideal oracle)
    dvalid = depth > 0
    dmax_img = np.where(dvalid, depth, 0.0)
    dmin_img = np.where(dvalid, depth, 1e9)

    u0 = np.clip(np.floor(umin).astype(int), 0, W - 1)
    u1 = np.clip(np.ceil(umax).astype(int), 0, W - 1)
    v0 = np.clip(np.floor(vmin).astype(int), 0, H - 1)
    v1 = np.clip(np.ceil(vmax).astype(int), 0, H - 1)

    # prefix min/max tables for O(1)-ish queries: use cummax over rows+cols
    # simpler: integral image trick unavailable for min/max -> loop in
    # blocks using 8x8 reduced mips (like the kernel's L3)
    bh, bw = H // 8, W // 8
    bmin = dmin_img[: bh * 8, : bw * 8].reshape(bh, 8, bw, 8).min((1, 3))
    bmax = dmax_img[: bh * 8, : bw * 8].reshape(bh, 8, bw, 8).max((1, 3))
    ball = dvalid[: bh * 8, : bw * 8].reshape(bh, 8, bw, 8).all((1, 3))

    flat_shape = ii.shape
    skip = np.zeros(flat_shape, bool)
    free = np.zeros(flat_shape, bool)
    band = np.zeros(flat_shape, bool)

    it = np.nditer(np.zeros(flat_shape), flags=["multi_index"])
    for _ in it:
        ix = it.multi_index
        if skip_behind_cam[ix] or out_frustum[ix]:
            skip[ix] = True
            continue
        if not clean[ix]:
            band[ix] = True
            continue
        r0, r1 = v0[ix] // 8, v1[ix] // 8 + 1
        c0, c1 = u0[ix] // 8, u1[ix] // 8 + 1
        r1 = min(r1, bh)
        c1 = min(c1, bw)
        fp_min = bmin[r0:r1, c0:c1].min() if r1 > r0 and c1 > c0 else 1e9
        fp_max = bmax[r0:r1, c0:c1].max() if r1 > r0 and c1 > c0 else 0.0
        fp_all = bool(ball[r0:r1, c0:c1].all()) if r1 > r0 and c1 > c0 else False
        if zmin[ix] - TRUNC > fp_max:
            skip[ix] = True
        elif (zmax[ix] + TRUNC < fp_min) and fp_max > 0 and fp_all:
            free[ix] = True
        else:
            band[ix] = True

    n = skip.size
    nonskip_cols = (~skip).any(axis=2).sum() / (nbx * nbx)
    print(
        f"chunk_z={chunk_z:4d}: n={n}  skip={skip.sum()/n:.3f}  "
        f"free={free.sum()/n:.3f}  band={band.sum()/n:.3f}  "
        f"visited={(free.sum()+band.sum())/n:.3f}  "
        f"nonskip-column-frac={nonskip_cols:.3f}",
        flush=True,
    )


if __name__ == "__main__":
    census(128)
    census(32)
