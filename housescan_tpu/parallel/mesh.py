"""Device mesh helpers.

The reference had no distributed computing at all (SURVEY.md section 2c);
this package's parallelism is JAX-native: a 1-D device mesh whose axis
shards either the TSDF volume (spatial parallelism over ICI — the
sequence-parallel analog called out in SURVEY.md section 5) or a batch of
rooms (data parallelism for fitting/export).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh


VOLUME_AXIS = "shard"
ROOMS_AXIS = "rooms"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = VOLUME_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)}; on CPU set "
                "XLA_FLAGS=--xla_force_host_platform_device_count="
                f"{n_devices}"
            )
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.array(devices), (axis_name,))


def make_mesh2d(n_rooms: int, n_slabs: int) -> Mesh:
    """2-D (rooms x slab) mesh: data parallelism over rooms composed
    with spatial volume sharding within each room — the DP x SP
    composition SURVEY.md section 2c's communication-backend row calls
    for (rooms ride the outer/DCN-class axis, slabs the inner/ICI-class
    axis; on a real multi-slice deployment the rooms axis maps across
    slices and each room's slab collectives stay intra-slice)."""
    devices = jax.devices()
    need = n_rooms * n_slabs
    if need > len(devices):
        raise ValueError(
            f"requested {n_rooms}x{n_slabs} devices, have {len(devices)}; on "
            f"CPU set XLA_FLAGS=--xla_force_host_platform_device_count={need}"
        )
    import numpy as np

    return Mesh(
        np.array(devices[:need]).reshape(n_rooms, n_slabs),
        (ROOMS_AXIS, VOLUME_AXIS),
    )
