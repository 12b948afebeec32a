"""Room-level data parallelism.

The DP analog from SURVEY.md section 2c: independent rooms mapped over
mesh devices for batched cuboid fitting (and, via the same pattern, plane
detection and export). The reference fit rooms one at a time through GSL
on the CPU (ref FitCuboidBFGS.hs); here a building floor's rooms fit in
one sharded device launch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from housescan_tpu.parallel.mesh import VOLUME_AXIS
from housescan_tpu.solvers.cuboid_fit import CuboidFit, fit_cuboid_batch


def fit_cuboids_sharded(
    corners_batch: jnp.ndarray, mesh: Mesh, tol: float = 1e-8, max_iter: int = 2000
) -> CuboidFit:
    """Fit cuboids to a (B, 8, 3) batch sharded across the mesh.

    B must be divisible by the mesh size (pad with a repeated room if
    needed; fits are independent).
    """
    sharding = NamedSharding(mesh, P(VOLUME_AXIS, None, None))
    batch = jax.device_put(jnp.asarray(corners_batch, jnp.float32), sharding)
    fit = jax.jit(
        lambda b: fit_cuboid_batch(b, tol=tol, max_iter=max_iter),
        in_shardings=sharding,
    )
    return fit(batch)
