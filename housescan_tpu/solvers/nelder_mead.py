"""Jittable, vmappable Nelder-Mead simplex minimizer.

The reference drives all cuboid fits through GSL's NMSimplex2
(ref FitCuboidBFGS.hs:184, :201, :233 — despite the module name there is
no BFGS there). A derivative-free simplex method is genuinely the right
tool for the nearest-corner objective (piecewise-smooth in the
correspondences), so we keep it — but as a pure ``lax.while_loop`` program
with static shapes, which means ``vmap`` turns it into a batched fitter
that runs every room's cuboid fit in parallel on one chip, and ``pjit``
shards the batch across a mesh (the reference fits rooms one at a time on
the CPU).

``jax.scipy.optimize.minimize`` (BFGS) is available as a refinement pass in
cuboid_fit.py for the smooth fixed-correspondence objective.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class NelderMeadResult(NamedTuple):
    x: jnp.ndarray  # (n,) best vertex
    fun: jnp.ndarray  # scalar best value
    n_iter: jnp.ndarray  # scalar int32 iterations used
    converged: jnp.ndarray  # scalar bool — simplex size fell below tol


def nelder_mead(
    fun: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    step_sizes: jnp.ndarray,
    tol: float = 1e-8,
    max_iter: int = 2000,
) -> NelderMeadResult:
    """Minimize ``fun`` from ``x0`` with an axis-aligned initial simplex.

    ``step_sizes`` plays GSL's step_size role (ref FitCuboidBFGS.hs:183):
    vertex i+1 = x0 + step_sizes[i] * e_i. Convergence uses GSL
    NMSimplex2's size measure: the average distance of vertices from the
    simplex centroid, compared against ``tol``.

    Standard coefficients: reflection 1, expansion 2, contraction 0.5,
    shrink 0.5.
    """
    x0 = jnp.asarray(x0)
    dtype = x0.dtype
    n = x0.shape[0]
    step_sizes = jnp.asarray(step_sizes, dtype)

    # Tolerance floor: GSL's 1e-8 assumes float64; in float32 the simplex
    # bottoms out near eps * parameter scale, so clamp the tolerance there
    # instead of burning max_iter iterations making no progress.
    eps = jnp.finfo(dtype).eps
    scale = jnp.linalg.norm(x0) + jnp.linalg.norm(step_sizes) + 1.0
    eff_tol = jnp.maximum(jnp.asarray(tol, dtype), 8.0 * eps * scale)

    simplex0 = jnp.concatenate([x0[None, :], x0[None, :] + jnp.diag(step_sizes)], axis=0)
    fvals0 = jax.vmap(fun)(simplex0)

    def simplex_size(simplex):
        centroid = jnp.mean(simplex, axis=0)
        return jnp.mean(jnp.linalg.norm(simplex - centroid, axis=1))

    def cond(state):
        simplex, _fvals, it = state
        return jnp.logical_and(it < max_iter, simplex_size(simplex) > eff_tol)

    def body(state):
        simplex, fvals, it = state
        order = jnp.argsort(fvals)
        simplex = simplex[order]
        fvals = fvals[order]

        best_f = fvals[0]
        worst_f = fvals[n]
        second_worst_f = fvals[n - 1]
        centroid = jnp.mean(simplex[:n], axis=0)  # centroid excluding worst
        worst = simplex[n]

        reflected = centroid + (centroid - worst)
        f_reflected = fun(reflected)

        expanded = centroid + 2.0 * (centroid - worst)
        f_expanded = fun(expanded)

        # Contract toward the better of worst/reflected.
        use_outside = f_reflected < worst_f
        contract_base = jnp.where(use_outside, reflected, worst)
        contracted = centroid + 0.5 * (contract_base - centroid)
        f_contracted = fun(contracted)

        do_expand = jnp.logical_and(f_reflected < best_f, f_expanded < f_reflected)
        do_reflect = jnp.logical_and(~do_expand, f_reflected < second_worst_f)
        f_contract_ok = f_contracted < jnp.minimum(f_reflected, worst_f)
        do_contract = jnp.logical_and(~do_expand, jnp.logical_and(~do_reflect, f_contract_ok))
        do_shrink = ~(do_expand | do_reflect | do_contract)

        new_vertex = jnp.where(
            do_expand,
            expanded,
            jnp.where(do_reflect, reflected, contracted),
        )
        new_f = jnp.where(
            do_expand, f_expanded, jnp.where(do_reflect, f_reflected, f_contracted)
        )

        replaced_simplex = simplex.at[n].set(new_vertex)
        replaced_fvals = fvals.at[n].set(new_f)

        shrunk_simplex = simplex[0][None, :] + 0.5 * (simplex - simplex[0])
        shrunk_fvals = jax.vmap(fun)(shrunk_simplex)

        simplex = jnp.where(do_shrink, shrunk_simplex, replaced_simplex)
        fvals = jnp.where(do_shrink, shrunk_fvals, replaced_fvals)
        return simplex, fvals, it + 1

    simplex, fvals, n_iter = jax.lax.while_loop(
        cond, body, (simplex0, fvals0, jnp.asarray(0, jnp.int32))
    )
    best = jnp.argmin(fvals)
    return NelderMeadResult(
        x=simplex[best],
        fun=fvals[best],
        n_iter=n_iter,
        converged=simplex_size(simplex) <= eff_tol,
    )


def nelder_mead_batch(
    fun: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    step_sizes: jnp.ndarray,
    tol: float = 1e-8,
    max_iter: int = 2000,
) -> NelderMeadResult:
    """vmap over a (B, n) batch of starts (and a batched objective's data
    closed over per-instance via the caller's partials)."""
    solver = partial(nelder_mead, fun, tol=tol, max_iter=max_iter)
    return jax.vmap(solver)(x0, step_sizes)
