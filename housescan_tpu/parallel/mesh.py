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
