"""X-sibling pairing census of the steady-state 512^3 bench worklist.

Motivated (and then condemned) the super_x=2 entry grouping: 95.8% of
the post-free-split main list has its x-sibling listed, but paired
(16, 8, 256) blocks measured 2x SLOWER on hardware (36.6 vs 74.9 fps)
— ops/chunk_select.py SUPER_X_CAP comment, PERFORMANCE.md "X-paired
work-list entries". Run sequentially (ONE TPU process):
  PYTHONPATH=/root/repo:/root/.axon_site nohup python scripts/pair_census.py > /tmp/pc.out 2>&1 &
"""
import numpy as np, jax, jax.numpy as jnp
from housescan_tpu.config import enable_compilation_cache
enable_compilation_cache()
from housescan_tpu.kinfu.camera import Intrinsics
from housescan_tpu.kinfu.pipeline import kinfu_init, kinfu_step
from housescan_tpu.kinfu.synthetic import furnished_room, orbit_poses, render_depth_stream
from housescan_tpu.ops.chunk_select import build_worklist
from housescan_tpu.ops.tsdf_stream import FIELD_SAT, N_QUARTERS

intr = Intrinsics(width=640, height=480, fx=525.0, fy=525.0, cx=319.5, cy=239.5)
half, boxes = furnished_room()
poses = orbit_poses(8, radius=0.25, yaw_range=0.14, pitch=0.25)
frames = render_depth_stream(intr, poses, half, boxes=boxes)
state = kinfu_init(intr, resolution=512, size_m=3.0, trunc=0.03,
                   init_pose=jnp.asarray(poses[0]), dtype=jnp.int32)
for i in range(7):
    state = kinfu_step(state, jnp.asarray(frames[i]), intr, use_pallas=True)
float(jnp.sum(state.pose))
planes = state.planes
sat_q = np.asarray(planes[:, :, :, FIELD_SAT, :N_QUARTERS].reshape(-1, N_QUARTERS) > 0.5)
neg_c = np.asarray(planes[:, :, :, FIELD_SAT, N_QUARTERS].reshape(-1) > 0.5)
wl, fwl = build_worklist(
    jnp.asarray(frames[7]), state.pose, intr, 512,
    state.volume.voxel_size, state.volume.origin, state.volume.trunc,
    sat_quarters=jnp.asarray(sat_q), neg_flags=jnp.asarray(neg_c), free_split=True)
n = int(np.asarray(wl.count).reshape(-1)[0])
bi = np.asarray(wl.bi)[:n]; bj = np.asarray(wl.bj)[:n]; bk = np.asarray(wl.bk)[:n]
print("main-list entries:", n, "free superblocks:", int(np.asarray(fwl.count).reshape(-1)[0]))
keys = set(zip(bi.tolist(), bj.tolist(), bk.tolist()))
pp = sum(1 for (i, j, k) in keys if i % 2 == 0 and (i + 1, j, k) in keys)
lone = len(keys) - 2 * pp
print(f"x-pairs both listed: {pp} ({2*pp} entries, {2*pp/max(n,1):.1%}); lone: {lone}")
# and the z-column stats for comparison (bk in superchunk units)
zp = sum(1 for (i, j, k) in keys if k % 2 == 0 and (i, j, k + 1) in keys)
print(f"z-pairs both listed: {zp} ({2*zp/max(n,1):.1%} of entries)")
# y-sibling stats too
yp = sum(1 for (i, j, k) in keys if j % 2 == 0 and (i, j + 1, k) in keys)
print(f"y-pairs both listed: {yp} ({2*yp/max(n,1):.1%} of entries)")
