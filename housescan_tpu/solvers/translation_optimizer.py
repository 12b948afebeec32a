"""1-D least-squares positioning from pairwise signed-distance constraints.

Capability parity with the reference's TranslationOptimizer
(ref TranslationOptimizer.hs:36-72): given a constraint graph where edge
``(i, j) -> d`` means "node j should sit at signed offset d from node i",
find positions minimizing the squared constraint violations. Node 0 (the
first node of the first edge) is pinned at 0 by dropping its column from
the difference matrix (ref TranslationOptimizer.hs:53), which also makes
the system full-rank for a connected graph.

Two layers:
  * ``lst_sq_distances_dense`` — the pure jittable device core on index
    arrays (batched over problems via vmap when arranging many floors).
  * ``lst_sq_distances`` — the keyed host API taking ``{(a, b): d}`` like
    the reference, bijecting keys to dense indices.

Singular systems (possible despite connectivity-splitting if constraints
are degenerate) are reported via an ``ok`` flag, matching safeLinearSolveLS's
Maybe (ref TranslationOptimizer.hs:66).
"""

from __future__ import annotations

from typing import Dict, Hashable, Optional, Tuple, TypeVar

import jax
import jax.numpy as jnp
import numpy as np

from housescan_tpu.utils.bijection import biject, ord_nub

K = TypeVar("K", bound=Hashable)


def lst_sq_distances_dense(
    edges: jnp.ndarray, dists: jnp.ndarray, n_nodes: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Solve the dense-index least-squares positioning problem.

    Args:
      edges: (E, 2) int array of (i, j) node indices in [0, n_nodes).
      dists: (E,) desired signed offsets position[j] - position[i].
      n_nodes: static node count.

    Returns:
      positions: (n_nodes,) with position[0] == 0.
      rmse: scalar — sqrt(sum(residual^2) / E) (ref TranslationOptimizer.hs:70).
      ok: scalar bool — False if the system was rank-deficient.
    """
    e = edges.shape[0]
    dtype = dists.dtype
    # Difference matrix: -1 at column i, +1 at column j per row (ref :53-59),
    # built by scatter; then drop column 0 to pin x_0 = 0.
    rows = jnp.arange(e)
    a_full = jnp.zeros((e, n_nodes), dtype)
    a_full = a_full.at[rows, edges[:, 0]].add(-1.0)
    a_full = a_full.at[rows, edges[:, 1]].add(1.0)
    a = a_full[:, 1:]

    # Normal equations: (E,n) problems here are tiny (rooms per floor), and
    # gram-matrix solve is one MXU matmul + an (n-1)x(n-1) solve.
    gram = jnp.matmul(a.T, a, precision="highest")
    rhs = jnp.matmul(a.T, dists, precision="highest")
    # Rank check via diagonal of Cholesky-ish: use eigvalsh smallest.
    eigs = jnp.linalg.eigvalsh(gram)
    ok = eigs[0] > 1e-9 * jnp.maximum(eigs[-1], 1e-30)
    x = jnp.linalg.solve(jnp.where(ok, gram, jnp.eye(gram.shape[0], dtype=dtype)), rhs)
    x = jnp.where(ok, x, jnp.nan)

    positions = jnp.concatenate([jnp.zeros((1,), dtype), x])
    residual = jnp.matmul(a, x, precision="highest") - dists
    rmse = jnp.sqrt(jnp.sum(residual**2) / e)
    return positions, rmse, ok


def lst_sq_distances(
    dist_map: Dict[Tuple[K, K], float]
) -> Optional[Tuple[Dict[K, float], float]]:
    """Keyed API: ``{(a, b): d} -> ({node: position}, rmse)`` or None.

    The first node of the first edge is placed at 0 (ref
    TranslationOptimizer.hs:27-29). A dict input enforces one distance per
    edge, as in the reference (ref TranslationOptimizer.hs:31-35).
    """
    if not dist_map:
        return None
    keys = list(dist_map.keys())
    index_of, _ = biject([n for a, b in keys for n in (a, b)])
    nodes = ord_nub([n for a, b in keys for n in (a, b)])
    edges = np.array([[index_of(a), index_of(b)] for a, b in keys], dtype=np.int32)
    dists = np.array([dist_map[k] for k in keys], dtype=np.float64)

    positions, rmse, ok = _lst_sq_f64(edges, dists, len(nodes))
    if not bool(ok):
        return None
    return {node: float(positions[i]) for i, node in enumerate(nodes)}, float(rmse)


def _lst_sq_f64(edges: np.ndarray, dists: np.ndarray, n_nodes: int):
    """Host float64 path (tiny systems; numpy lstsq like the reference's
    LAPACK dgels). The jittable f32 device core above is used for batched
    device-side arrangement."""
    e = edges.shape[0]
    a_full = np.zeros((e, n_nodes))
    a_full[np.arange(e), edges[:, 0]] += -1.0
    a_full[np.arange(e), edges[:, 1]] += 1.0
    a = a_full[:, 1:]
    if n_nodes > 1 and np.linalg.matrix_rank(a) < n_nodes - 1:
        return np.full(n_nodes, np.nan), np.nan, False
    x, _, _, _ = np.linalg.lstsq(a, dists, rcond=None)
    positions = np.concatenate([[0.0], x])
    rmse = float(np.sqrt(np.sum((a @ x - dists) ** 2) / e))
    return positions, rmse, True
