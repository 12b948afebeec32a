"""KinectFusion on TPU.

The reference delegated this entire stage to an external C++/CUDA PCL
fork (ref README.md:14-17): depth preprocessing, TSDF volumetric
integration, TSDF raycasting, projective point-to-plane ICP tracking,
and marching-cubes export, producing the per-room files the in-repo
Haskell stage consumed. Here it is a first-class TPU subsystem:
fused-XLA preprocessing, gather-side TSDF integrate, lockstep ray
marching, MXU-reduced ICP normal equations, and device marching cubes
(SURVEY.md section 2b / section 7 step 5).
"""

from housescan_tpu.kinfu.camera import Intrinsics
from housescan_tpu.kinfu.pipeline import KinFuState, kinfu_init, kinfu_step
from housescan_tpu.kinfu.tsdf import TsdfVolume, tsdf_integrate, tsdf_new
from housescan_tpu.kinfu.raycast import raycast
from housescan_tpu.kinfu.icp import icp_track

__all__ = [
    "Intrinsics",
    "KinFuState",
    "kinfu_init",
    "kinfu_step",
    "TsdfVolume",
    "tsdf_integrate",
    "tsdf_new",
    "raycast",
    "icp_track",
]
