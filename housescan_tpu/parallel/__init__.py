from housescan_tpu.parallel.mesh import make_mesh
from housescan_tpu.parallel.sharded import (
    ShardedKinFuState,
    make_sharded_step,
    sharded_fusion_step,
    sharded_kinfu_init,
)
from housescan_tpu.parallel.rooms_batch import fit_cuboids_sharded

__all__ = [
    "make_mesh",
    "ShardedKinFuState",
    "sharded_fusion_step",
    "sharded_kinfu_init",
    "fit_cuboids_sharded",
]
