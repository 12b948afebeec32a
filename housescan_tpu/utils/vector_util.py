"""Order statistics over point arrays.

Capability parity with the reference's VectorUtil (ref VectorUtil.hs:11-19):
k-th smallest / largest element of a vector by a key function. The reference
used a heap-based partial sort on CPU; here the key is computed vectorized
and selection uses ``jax.lax.top_k`` (TPU) / ``numpy.partition`` (host).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def kth_smallest_by(key: Callable, k: int, points):
    """Element of ``points`` (axis 0) with the k-th smallest key, 1-indexed.

    ``kth_smallest_by(f, 1, v)`` is the minimum by ``f`` (ref VectorUtil.hs:11-15).
    """
    if k < 1:
        raise ValueError(f"kth_smallest_by: k must be >= 1, got {k}")
    keys = key(points)
    if isinstance(keys, np.ndarray):
        idx = int(np.argpartition(keys, k - 1)[k - 1])
        return points[idx]
    _, idxs = jax.lax.top_k(-keys, k)
    return points[idxs[k - 1]]


def kth_largest_by(key: Callable, k: int, points):
    """Element of ``points`` (axis 0) with the k-th largest key, 1-indexed.

    (ref VectorUtil.hs:18-19.)
    """
    if k < 1:
        raise ValueError(f"kth_largest_by: k must be >= 1, got {k}")
    keys = key(points)
    if isinstance(keys, np.ndarray):
        idx = int(np.argpartition(-keys, k - 1)[k - 1])
        return points[idx]
    _, idxs = jax.lax.top_k(keys, k)
    return points[idxs[k - 1]]


def top_fraction_threshold(values: jnp.ndarray, fraction: float) -> jnp.ndarray:
    """Key threshold below which all but the top ``fraction`` of values lie.

    Vectorized form of the reference's remove-ceiling selection
    (ref Main.hs:2649-2654): with ``fraction=0.2`` the returned threshold is
    the key of the ``n // 5``-th largest value.
    """
    n = values.shape[0]
    n_discard = n // int(round(1.0 / fraction)) if fraction > 0 else 0
    if n_discard < 1:
        return jnp.max(values) if n else jnp.asarray(jnp.inf, values.dtype)
    top, _ = jax.lax.top_k(values, n_discard)
    return top[-1]
