"""planes.txt reader/writer — the PCL plane-detection interchange format.

The reference consumes ``planes.txt`` produced by its PCL-fork plane
detector: one plane per line, ``a b c d`` in PCL's ``ax+by+cz+d = 0``
convention, converted on load to the package's ``n.x = d`` Hessian form by
negating d (ref Main.hs:1379-1389). Our RANSAC detector writes the same
format so the two pipelines interoperate file-for-file.
"""

from __future__ import annotations

from pathlib import Path
from typing import Union

import numpy as np

from housescan_tpu.geometry.plane import PlaneEq, mk_plane_eq


class PlanesTxtError(ValueError):
    pass


def load_planes_txt(path: Union[str, Path]) -> PlaneEq:
    """Parse planes.txt into a batched PlaneEq (K planes).

    PCL's d sign is negated on import (ref Main.hs:1383-1385).
    """
    rows = []
    for ln, line in enumerate(Path(path).read_text().splitlines(), 1):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        if len(parts) != 4:
            raise PlanesTxtError(f"{path}:{ln}: expected 4 coefficients, got {len(parts)}")
        try:
            rows.append([float(p) for p in parts])
        except ValueError:
            raise PlanesTxtError(f"{path}:{ln}: non-numeric coefficient") from None
    if not rows:
        raise PlanesTxtError(f"{path}: no planes found")
    arr = np.asarray(rows, np.float32)
    import jax.numpy as jnp

    return mk_plane_eq(jnp.asarray(arr[:, :3]), jnp.asarray(-arr[:, 3]))


def save_planes_txt(path: Union[str, Path], eqs: PlaneEq) -> None:
    """Write planes in PCL's ``ax+by+cz+d = 0`` convention (negated d)."""
    normal = np.asarray(eqs.normal, np.float64)
    d = np.asarray(eqs.d, np.float64)
    if normal.ndim == 1:
        normal, d = normal[None], d[None]
    lines = [
        f"{n[0]:.9g} {n[1]:.9g} {n[2]:.9g} {-dv:.9g}" for n, dv in zip(normal, d)
    ]
    Path(path).write_text("\n".join(lines) + "\n")
