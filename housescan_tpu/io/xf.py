""".xf transform file format (plyxform-compatible).

The reference exports each room's cumulative transform as a 4-line .xf
file in the LEFT-multiplicative (column-vector) convention — transposing
its internal right-multiplication form (ref Main.hs:2287-2302,
:2316-2325). We store transforms the same row-vector way, so save/load
transpose symmetrically.
"""

from __future__ import annotations

from pathlib import Path
from typing import Union

import numpy as np


def save_xf(path: Union[str, Path], proj_rowvec: np.ndarray) -> None:
    """Write a row-vector 4x4 transform as a left-multiplicative .xf file."""
    m = np.asarray(proj_rowvec, np.float64).T  # to column-vector convention
    lines = [" ".join(repr(float(v)) for v in row) for row in m]
    Path(path).write_text("\n".join(lines) + "\n")


def load_xf(path: Union[str, Path]) -> np.ndarray:
    """Read a .xf file back into the package's row-vector convention."""
    values = [float(t) for t in Path(path).read_text().split()]
    if len(values) != 16:
        raise ValueError(f"{path}: .xf must contain 16 numbers, got {len(values)}")
    return np.asarray(values, np.float64).reshape(4, 4).T
