"""Decompose raycast phase-1 (build_tile_candidates) cost on the TPU.

Times cumulative prefixes of the pipeline so each stage's delta is
attributable: valid/transpose -> compaction -> pair emission -> pair
compaction+sort -> histogram/slots -> final candidate take.

Run sequentially (ONE TPU process):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/phase1_prof.py
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from housescan_tpu.kinfu.camera import Intrinsics
from housescan_tpu.kinfu.pipeline import kinfu_init, kinfu_step
from housescan_tpu.kinfu.synthetic import furnished_room, orbit_poses, render_depth_stream
from housescan_tpu.ops.planes_pallas import N_FIELDS, SUB_Z
from housescan_tpu.ops.raycast_tiles import MAX_CT, MAX_PAIRS, N_PREP

MAX_REAL_PAIRS = 65536  # the OLD pipeline's cap (inlined stages below measure it)

RES = int(os.environ.get("HOUSESCAN_BENCH_RES", "512"))
W, H = 640, 480
ITERS = 30


def readout(x):
    return float(jnp.sum(x.reshape(-1)[:8].astype(jnp.float32)))


def timeit(name, fn, *args):
    out = jax.jit(fn)(*args)
    readout(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(ITERS):
        out = jax.jit(fn)(*args)
    readout(jax.tree_util.tree_leaves(out)[0])
    dt = (time.time() - t0 - 0.025) / ITERS * 1000.0
    print(f"{name:52s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    intr = Intrinsics(width=W, height=H, fx=525.0, fy=525.0, cx=W / 2 - 0.5, cy=H / 2 - 0.5)
    half, boxes = furnished_room()
    poses = orbit_poses(4, radius=0.25, yaw_range=0.06, pitch=0.25)
    frames = render_depth_stream(intr, poses, half, boxes=boxes)

    state = kinfu_init(intr, resolution=RES, size_m=3.0, trunc=0.03,
                       init_pose=jnp.asarray(poses[0]))
    for k in range(2):
        state = kinfu_step(state, jnp.asarray(frames[k]), intr, use_pallas=True)
    readout(state.pose)
    planes, pose, vol = state.planes, state.pose, state.volume
    print(f"# valid sub-block planes: {int(jnp.sum(planes[:, :, :, 4, :] > 0.5))}")

    nbx = planes.shape[0]
    nsub = vol.tsdf.shape[2] // SUB_Z
    nb = nbx * nbx * nsub
    n_bands = intr.height // 8
    n_ut = -(-intr.width // 128)
    n_tiles = n_bands * n_ut
    z_min = 0.3

    def stage_geom(planes, pose):
        p = jnp.transpose(planes, (0, 1, 2, 4, 3)).reshape(nb, N_FIELDS)
        valid = p[:, 4] > 0.5
        ids = jnp.arange(nb)
        bi = ids // (nbx * nsub)
        bj = (ids // nsub) % nbx
        bs = ids % nsub
        vs = vol.voxel_size
        centers = jnp.stack(
            [
                vol.origin[0] + (bi * 8 + 4) * vs,
                vol.origin[1] + (bj * 8 + 4) * vs,
                vol.origin[2] + (bs * SUB_Z + SUB_Z // 2) * vs,
            ],
            axis=1,
        )
        radius = vs * (float(32 + SUB_Z * SUB_Z // 4) ** 0.5 + 1.0)
        rot = pose[:3, :3]
        t = pose[3, :3]
        cam = (centers - t) @ rot.T
        z = cam[:, 2]
        in_front = z + radius > z_min
        n_w = p[:, 0:3]
        facing = jnp.sum(n_w * (t - centers), axis=1) > -radius
        safe_z = jnp.maximum(z - radius, 0.05)
        u = intr.fx * cam[:, 0] / jnp.maximum(z, 1e-6) + intr.cx
        v = intr.fy * cam[:, 1] / jnp.maximum(z, 1e-6) + intr.cy
        pr_u = intr.fx * radius / safe_z
        pr_v = intr.fy * radius / safe_z
        u_overlap = (u + pr_u > 0) & (u - pr_u < intr.width)
        v_overlap = (v + pr_v > 0) & (v - pr_v < intr.height)
        keep = valid & in_front & facing & u_overlap & v_overlap
        b0 = jnp.clip(jnp.floor((v - pr_v) / 8.0), 0, n_bands - 1).astype(jnp.int32)
        b1 = jnp.clip(jnp.ceil((v + pr_v) / 8.0), 0, n_bands - 1).astype(jnp.int32)
        t0_ = jnp.clip(jnp.floor((u - pr_u) / 128.0), 0, n_ut - 1).astype(jnp.int32)
        t1_ = jnp.clip(jnp.ceil((u + pr_u) / 128.0), 0, n_ut - 1).astype(jnp.int32)
        return p, keep, b0, b1, t0_, t1_, z, n_w, t

    def stage_compact(planes, pose):
        p, keep, b0, b1, t0_, t1_, z, n_w, t = stage_geom(planes, pose)
        n_chunks = nb // 16
        chunk_valid = jnp.max(planes[:, :, :, 4, :], axis=-1).reshape(-1) > 0.5
        nc = min(4096, n_chunks)
        chunk_sel = jnp.argsort(~chunk_valid)[:nc]
        sub_ids = (chunk_sel[:, None] * 16 + jnp.arange(16)[None, :]).reshape(-1)
        keep_c = keep[sub_ids]
        nv = min(16384, sub_ids.shape[0])
        sel_order = jnp.argsort(~keep_c)[:nv]
        sel = sub_ids[sel_order]
        keep_s = keep_c[sel_order]
        return (p, sel, keep_s, b0[sel], b1[sel], t0_[sel], t1_[sel], z, n_w, t)

    def stage_pairs(planes, pose):
        p, sel, keep_s, b0_s, b1_s, t0_s, t1_s, z, n_w, t = stage_compact(planes, pose)
        nv = sel.shape[0]
        tspan_full = t1_s - t0_s + 1
        tspan = jnp.minimum(tspan_full, 4)
        shift_t = jnp.where(tspan_full > tspan, (tspan_full - tspan) // 2, 0)
        t0_s = t0_s + shift_t
        b_allow = jnp.maximum(MAX_PAIRS // jnp.maximum(tspan, 1), 1)
        bspan_full = b1_s - b0_s + 1
        bspan = jnp.minimum(bspan_full, b_allow)
        shift_b = jnp.where(bspan_full > bspan, (bspan_full - bspan) // 2, 0)
        b0_s = b0_s + shift_b
        k = jnp.arange(MAX_PAIRS)
        kb = k[None, :] // tspan[:, None]
        kt = k[None, :] % jnp.maximum(tspan[:, None], 1)
        pair_ok = keep_s[:, None] & (kb < bspan[:, None])
        pair_tile = jnp.where(
            pair_ok, (b0_s[:, None] + kb) * n_ut + (t0_s[:, None] + kt), n_tiles
        ).reshape(-1)
        pair_block = jnp.broadcast_to(sel[:, None], (nv, MAX_PAIRS)).reshape(-1)
        db = jnp.clip(z[sel] * (255.0 / 20.0), 0.0, 255.0).astype(jnp.int32)
        pair_key = pair_tile * 256 + jnp.broadcast_to(db[:, None], (nv, MAX_PAIRS)).reshape(-1)
        return p, pair_tile, pair_key, pair_block, n_w, t, z

    def stage_sort(planes, pose):
        p, pair_tile, pair_key, pair_block, n_w, t, z = stage_pairs(planes, pose)
        is_real = pair_tile < n_tiles
        cap = min(MAX_REAL_PAIRS, pair_tile.shape[0])
        first_real = jnp.argsort(~is_real)[:cap]
        pair_tile = pair_tile[first_real]
        pair_key = pair_key[first_real]
        pair_block = pair_block[first_real]
        sorted_keys, sorted_blocks = jax.lax.sort(
            (pair_key, pair_block.astype(jnp.int32)), num_keys=1
        )
        return p, pair_tile, sorted_keys, sorted_blocks, n_w, t

    def stage_slots(planes, pose):
        p, pair_tile, sorted_keys, sorted_blocks, n_w, t = stage_sort(planes, pose)
        counts = jnp.sum(pair_tile[:, None] == jnp.arange(n_tiles)[None, :], axis=0)
        start = jnp.concatenate([jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)[:-1]])
        slot = start[:, None] + jnp.arange(MAX_CT)[None, :]
        slot_c = jnp.clip(slot, 0, sorted_keys.shape[0] - 1)
        slot_ok = jnp.arange(MAX_CT)[None, :] < counts[:, None]
        slot_block = sorted_blocks[slot_c]
        return p, slot_block, slot_ok, n_w, t

    from housescan_tpu.ops.raycast_tiles import build_tile_candidates

    timeit("geom (project/keep/ranges)", stage_geom, planes, pose)
    timeit("+ compact (2 argsorts + gathers)", stage_compact, planes, pose)
    timeit("+ pair emission", stage_pairs, planes, pose)
    timeit("+ pair compaction + sort", stage_sort, planes, pose)
    timeit("+ histogram + slot gather", stage_slots, planes, pose)
    timeit("build_tile_candidates (full)", lambda pl_, po: build_tile_candidates(pl_, po, intr, vol), planes, pose)


def integrate_ablations():
    """Appended: integrate ablation sweep under the current kernel."""
    intr = Intrinsics(width=W, height=H, fx=525.0, fy=525.0, cx=W / 2 - 0.5, cy=H / 2 - 0.5)
    half, boxes = furnished_room()
    poses = orbit_poses(4, radius=0.25, yaw_range=0.06, pitch=0.25)
    frames = render_depth_stream(intr, poses, half, boxes=boxes)
    depth = jnp.asarray(frames[1])
    state = kinfu_init(intr, resolution=RES, size_m=3.0, trunc=0.03,
                       init_pose=jnp.asarray(poses[0]))
    state = kinfu_step(state, jnp.asarray(frames[0]), intr, use_pallas=True)
    readout(state.pose)
    vol0, pose = state.volume, state.pose

    from housescan_tpu.ops.tsdf_stream import tsdf_integrate_stream
    from housescan_tpu.ops.chunk_select import build_worklist, decode_worklist

    wl = jax.jit(lambda d, p: build_worklist(d, p, intr, RES, vol0.voxel_size, vol0.origin, vol0.trunc))(depth, pose)
    rows = decode_worklist(wl)
    lv = np.asarray([r[4] for r in rows if r[3] in (1,)])
    print(f"# band chunks per level: {[(l, int((lv==l).sum())) for l in range(4)]}", flush=True)

    data, planes = vol0.data, state.planes
    for ab in ("none", "copy", "no_free", "no_band", "no_planes"):
        def integ_ab(data, planes, d, p, ab=ab):
            v = vol0._replace(data=data)
            nv, np_ = tsdf_integrate_stream(v, planes, d, p, intr, ablate=ab)
            return nv.data, np_
        ja = jax.jit(integ_ab, donate_argnums=(0, 1))
        da, pa = jnp.copy(data), jnp.copy(planes)
        da, pa = ja(da, pa, depth, pose)
        readout(pa)
        t0 = time.time()
        for _ in range(20):
            da, pa = ja(da, pa, depth, pose)
        readout(pa)
        dt = (time.time() - t0 - 0.025) / 20 * 1000.0
        print(f"{'integrate ablate=' + ab:52s} {dt:8.2f} ms", flush=True)


if __name__ == "__main__":
    import sys
    if "--ablate-only" in sys.argv:
        integrate_ablations()
    else:
        main()
        integrate_ablations()
