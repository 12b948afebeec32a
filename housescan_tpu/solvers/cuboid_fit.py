"""Oriented-cuboid fitting to 8 corner points.

Capability parity with the reference's FitCuboidBFGS module
(ref FitCuboidBFGS.hs): a cuboid is 10 parameters — center (x, y, z),
dimensions (a, b, c), and an (unnormalized) quaternion (q1..q4)
(ref FitCuboidBFGS.hs:98-112). Three fitting strategies:

  * ``fit_cuboid``              — fixed point-to-corner correspondences
                                  (ref :205-233, errfun :51-65)
  * ``fit_cuboid_from_center``  — center pinned at the point mean, nearest
                                  corner as correspondence (ref :172-184)
  * ``fit_cuboid_from_center_first`` — the production two-stage strategy:
                                  center-pinned first, then all 10 free
                                  (ref :188-201); this is what
                                  fitCuboidToRoom uses (ref Main.hs:1825)

All objectives and solvers are pure jittable functions, so
``fit_cuboid_batch`` vmaps the whole two-stage fit over a batch of rooms —
a per-room CPU loop in the reference becomes one device launch here.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from housescan_tpu.geometry.transform import mm, quat_rot_mat
from housescan_tpu.solvers.nelder_mead import nelder_mead

# Corner sign pattern, in the reference's corner order
# (ref FitCuboidBFGS.hs:103-111): x slowest, z fastest.
_CORNER_SIGNS = jnp.array(
    [
        [-1, -1, -1],
        [-1, -1, 1],
        [-1, 1, -1],
        [-1, 1, 1],
        [1, -1, -1],
        [1, -1, 1],
        [1, 1, -1],
        [1, 1, 1],
    ],
    dtype=jnp.float32,
)


def cuboid_from_params(params: jnp.ndarray) -> jnp.ndarray:
    """(10,) params -> (8, 3) corner points.

    Spawns the cuboid centered at the origin, rotates by the quaternion,
    then translates the center to (x, y, z) (ref FitCuboidBFGS.hs:95-112).
    """
    center = params[0:3]
    dims = params[3:6]
    quat = params[6:10]
    local = _CORNER_SIGNS.astype(params.dtype) * (dims / 2.0)
    return mm(local, quat_rot_mat(quat)) + center


def errfun(points: jnp.ndarray, params: jnp.ndarray) -> jnp.ndarray:
    """Sum of squared distances with FIXED correspondences
    (ref FitCuboidBFGS.hs:51-65)."""
    est = cuboid_from_params(params)
    return jnp.sum((points - est) ** 2)


def errfun_closest_center(
    center: jnp.ndarray, points: jnp.ndarray, params7: jnp.ndarray
) -> jnp.ndarray:
    """Nearest-corner objective with pinned center; params are
    (a, b, c, q1..q4) (ref FitCuboidBFGS.hs:73-76)."""
    est = cuboid_from_params(jnp.concatenate([center, params7]))
    d2 = jnp.sum((points[:, None, :] - est[None, :, :]) ** 2, axis=-1)  # (8, 8)
    return jnp.sum(jnp.min(d2, axis=1))


def errfun_closest(points: jnp.ndarray, params: jnp.ndarray) -> jnp.ndarray:
    """Nearest-corner objective over all 10 params (ref FitCuboidBFGS.hs:68-70)."""
    return errfun_closest_center(params[0:3], points, params[3:10])


def guess_dims(points: jnp.ndarray) -> jnp.ndarray:
    """Seed (a, b, c) from sorted distances to the first corner.

    a, b = two smallest edge lengths from corner 0; the largest distance is
    the space diagonal, so c = sqrt(diag^2 - a^2 - b^2)
    (ref FitCuboidBFGS.hs:247-252). Clamped non-negative for noisy input
    (the reference would NaN there).
    """
    d = jnp.linalg.norm(points[1:] - points[0], axis=1)
    d = jnp.sort(d)
    a, b, diag = d[0], d[1], d[6]
    c = jnp.sqrt(jnp.maximum(diag**2 - a**2 - b**2, 0.0))
    return jnp.stack([a, b, c])


class CuboidFit(NamedTuple):
    params: jnp.ndarray  # (10,) x y z a b c q1 q2 q3 q4
    n_steps: jnp.ndarray  # int32 total simplex iterations
    error: jnp.ndarray  # final objective value (sum of squared distances)


# Quaternion multi-start seeds. The reference starts every fit from the
# single quaternion (0.1, 0.1, 0.1, 0.1) and its own self-test records
# convergence to bad local minima (it prints diagnostics when err > 1,
# ref FitCuboidBFGS.hs:273-282, instead of recovering). Multi-start over a
# small fixed set of orientations vmaps to a single batched device solve —
# essentially free on TPU — and removes that failure mode.
_QUAT_SEEDS = jnp.array(
    [
        [0.1, 0.1, 0.1, 0.1],  # the reference's seed (ref FitCuboidBFGS.hs:179)
        [0.0, 0.0, 0.0, 1.0],  # identity
        [0.383, 0.0, 0.0, 0.924],  # 45 deg about x
        [0.0, 0.383, 0.0, 0.924],  # 45 deg about y
        [0.0, 0.0, 0.383, 0.924],  # 45 deg about z
        [0.271, 0.271, 0.271, 0.884],  # 45 deg about diagonal
        [0.5, 0.5, 0.0, 0.707],
        [0.0, 0.5, 0.5, 0.707],
    ],
    dtype=jnp.float32,
)


def fit_cuboid_from_center(
    points: jnp.ndarray, tol: float = 1e-8, max_iter: int = 2000, n_starts: int = 8
) -> CuboidFit:
    """Stage 1: center fixed at the point mean, 7 free params, multi-start
    over quaternion seeds (ref FitCuboidBFGS.hs:172-184)."""
    center = jnp.mean(points, axis=0)
    a = guess_dims(points)[0]
    dtype = points.dtype
    dims0 = jnp.stack([a, a, a])
    steps = jnp.concatenate([dims0 / 10.0, jnp.full((4,), 0.1, dtype)])
    quats = _QUAT_SEEDS[:n_starts].astype(dtype)

    def solve(quat):
        initial = jnp.concatenate([dims0, quat])
        return nelder_mead(
            partial(errfun_closest_center, center, points),
            initial,
            steps,
            tol=tol,
            max_iter=max_iter,
        )

    res = jax.vmap(solve)(quats)
    best = jnp.argmin(res.fun)
    return CuboidFit(
        jnp.concatenate([center, res.x[best]]), jnp.sum(res.n_iter), res.fun[best]
    )


def fit_cuboid_from_center_first(
    points: jnp.ndarray,
    tol: float = 1e-8,
    max_iter: int = 2000,
    polish_bfgs: bool = False,
) -> CuboidFit:
    """Two-stage production fit: pinned-center first, then all 10 free
    (ref FitCuboidBFGS.hs:188-201). ``polish_bfgs=True`` adds a
    gradient-based BFGS polish of the simplex solution (kept only when it
    improves the nearest-corner objective)."""
    stage1 = fit_cuboid_from_center(points, tol=tol, max_iter=max_iter)
    a = guess_dims(points)[0]
    dtype = points.dtype
    steps = jnp.concatenate(
        [
            jnp.full((3,), 0.01, dtype),
            jnp.stack([a, a, a]) / 10.0,
            jnp.full((4,), 0.1, dtype),
        ]
    )
    res = nelder_mead(
        partial(errfun_closest, points), stage1.params, steps, tol=tol, max_iter=max_iter
    )
    fit = CuboidFit(res.x, stage1.n_steps + res.n_iter, res.fun)
    if polish_bfgs:
        x, err = refine_bfgs(points, fit.params)
        fit = CuboidFit(x, fit.n_steps, err)
    return fit


def fit_cuboid(points: jnp.ndarray, tol: float = 1e-8, max_iter: int = 2000) -> CuboidFit:
    """Fixed-correspondence fit: points must already be in corner order
    (ref FitCuboidBFGS.hs:205-233)."""
    dims = guess_dims(points)
    center = jnp.mean(points, axis=0)
    dtype = points.dtype
    initial = jnp.concatenate([center, dims, jnp.full((4,), 0.1, dtype)])
    steps = jnp.concatenate([jnp.full((3,), 0.01, dtype), dims[0] / 10.0 * jnp.ones((3,), dtype), jnp.full((4,), 0.1, dtype)])
    res = nelder_mead(partial(errfun, points), initial, steps, tol=tol, max_iter=max_iter)
    return CuboidFit(res.x, res.n_iter, res.fun)


@partial(jax.jit, static_argnames=("tol", "max_iter"))
def fit_cuboid_batch(
    points_batch: jnp.ndarray, tol: float = 1e-8, max_iter: int = 2000
) -> CuboidFit:
    """Fit cuboids to a (B, 8, 3) batch of corner sets in one device launch.

    The TPU-native replacement for the reference's one-room-at-a-time GSL
    loop; shard the leading axis with pjit for multi-chip room batches.
    """
    return jax.vmap(lambda p: fit_cuboid_from_center_first(p, tol=tol, max_iter=max_iter))(
        points_batch
    )


def refine_bfgs(points: jnp.ndarray, params: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Polish a simplex solution with BFGS on a smoothed nearest-corner
    objective (softmin replaces the hard min so the objective is C^1).

    This is the gradient-based path the reference's module name promised
    but never implemented; with JAX the objective is differentiable for
    free.
    """

    def smooth_obj(p):
        est = cuboid_from_params(p)
        d2 = jnp.sum((points[:, None, :] - est[None, :, :]) ** 2, axis=-1)
        # softmin with temperature ~ objective scale
        t = 1e-3 + jnp.min(d2)
        return jnp.sum(-t * jax.scipy.special.logsumexp(-d2 / t, axis=1))

    from jax.scipy.optimize import minimize

    res = minimize(smooth_obj, params, method="BFGS", options={"maxiter": 200})
    # Accept on the HARD nearest-corner objective (the softmin value is a
    # lower bound of it, so comparing across the two would accept
    # regressions) and guard against a diverged line search.
    cand_err = errfun_closest(points, res.x)
    better = jnp.all(jnp.isfinite(res.x)) & (
        cand_err < errfun_closest(points, params)
    )
    x = jnp.where(better, res.x, params)
    return x, errfun_closest(points, x)
