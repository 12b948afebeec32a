from housescan_tpu.io.pcd import load_pcd, save_pcd
from housescan_tpu.io.planes_txt import load_planes_txt, save_planes_txt
from housescan_tpu.io.ply import load_ply, save_ply
from housescan_tpu.io.xf import load_xf, save_xf

__all__ = [
    "load_pcd",
    "save_pcd",
    "load_planes_txt",
    "save_planes_txt",
    "load_ply",
    "save_ply",
    "load_xf",
    "save_xf",
]
