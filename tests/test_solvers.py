"""Tests for the solvers: translation LS, Nelder-Mead, cuboid fit.

Mirrors the reference's only automated tests — the QuickCheck properties
and self-test in FitCuboidBFGS.hs:134-168, 255-282 — but with asserted
bounds instead of pass/fail judged by eye (SURVEY.md section 4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from housescan_tpu.solvers import (
    cuboid_from_params,
    errfun,
    fit_cuboid,
    fit_cuboid_batch,
    fit_cuboid_from_center,
    fit_cuboid_from_center_first,
    guess_dims,
    lst_sq_distances,
    nelder_mead,
)
from housescan_tpu.geometry.transform import axis_angle_mat, rotate_around


class TestLstSqDistances:
    def test_simple_chain(self):
        # a at 0, b at 2, c at 5
        result = lst_sq_distances({("a", "b"): 2.0, ("b", "c"): 3.0})
        assert result is not None
        pos, rmse = result
        assert pos["a"] == pytest.approx(0.0)
        assert pos["b"] == pytest.approx(2.0)
        assert pos["c"] == pytest.approx(5.0)
        assert rmse == pytest.approx(0.0, abs=1e-9)

    def test_inconsistent_triangle_distributes_error(self):
        # a->b 1, b->c 1, a->c 3 cannot all hold; LS splits the error.
        result = lst_sq_distances({(0, 1): 1.0, (1, 2): 1.0, (0, 2): 3.0})
        assert result is not None
        pos, rmse = result
        assert rmse > 0.1
        # Least squares: positions minimize sum of squared violations
        assert pos[1] == pytest.approx(4.0 / 3.0, abs=1e-6)
        assert pos[2] == pytest.approx(8.0 / 3.0, abs=1e-6)

    def test_negative_distances(self):
        result = lst_sq_distances({("x", "y"): -4.0})
        assert result is not None
        pos, _ = result
        assert pos["y"] == pytest.approx(-4.0)

    def test_empty_returns_none(self):
        assert lst_sq_distances({}) is None

    def test_first_node_anchored_at_zero(self):
        pos, _ = lst_sq_distances({("r5", "r2"): 7.0, ("r2", "r9"): 1.0})
        assert pos["r5"] == 0.0


class TestNelderMead:
    def test_quadratic_bowl(self):
        res = nelder_mead(
            lambda x: jnp.sum((x - jnp.array([1.0, -2.0, 3.0])) ** 2),
            jnp.zeros(3),
            jnp.ones(3) * 0.5,
            tol=1e-8,
            max_iter=500,
        )
        np.testing.assert_allclose(np.asarray(res.x), [1.0, -2.0, 3.0], atol=1e-3)
        assert bool(res.converged)

    def test_rosenbrock_2d(self):
        def rosen(x):
            return 100.0 * (x[1] - x[0] ** 2) ** 2 + (1 - x[0]) ** 2

        res = nelder_mead(rosen, jnp.array([-1.2, 1.0]), jnp.array([0.1, 0.1]), tol=1e-10, max_iter=2000)
        np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=1e-2)

    def test_jittable_and_vmappable(self):
        def solve(target):
            return nelder_mead(
                lambda x: jnp.sum((x - target) ** 2), jnp.zeros(2), jnp.ones(2) * 0.3, max_iter=300
            ).x

        targets = jnp.array([[1.0, 2.0], [-3.0, 0.5], [0.0, 0.0]])
        out = jax.jit(jax.vmap(solve))(targets)
        np.testing.assert_allclose(np.asarray(out), np.asarray(targets), atol=1e-3)


def make_cuboid(rng, dims=None, rotate=True, translate=True):
    """Random ground-truth cuboid in reference corner order
    (ref FitCuboidBFGS.hs:143-168)."""
    dims = np.array(dims if dims is not None else rng.uniform(1, 10, size=3))
    signs = np.array(
        [[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)], dtype=np.float64
    )
    corners = signs * dims / 2
    if rotate:
        axis = rng.uniform(0, 3, size=3) + 1e-3
        theta = rng.uniform(0, 2 * np.pi)
        m = np.asarray(axis_angle_mat(jnp.asarray(axis, jnp.float32), theta))
        corners = corners @ m
    if translate:
        corners = corners + rng.uniform(-5, 5, size=3)
    return jnp.asarray(corners, jnp.float32), dims


class TestCuboidFromParams:
    def test_unit_cube_identity_quat(self):
        params = jnp.array([0.0, 0, 0, 2, 2, 2, 0, 0, 0, 1.0])
        corners = cuboid_from_params(params)
        np.testing.assert_allclose(np.abs(np.asarray(corners)), 1.0, atol=1e-6)

    def test_center_offset(self):
        params = jnp.array([10.0, 20, 30, 2, 4, 6, 0, 0, 0, 1.0])
        corners = cuboid_from_params(params)
        np.testing.assert_allclose(np.asarray(jnp.mean(corners, axis=0)), [10, 20, 30], atol=1e-5)

    def test_rotate_then_translate_equals_rotate_around_center(self, rng):
        # The identity the reference QuickChecks (ref FitCuboidBFGS.hs:134-140):
        # spawn-at-origin-rotate-translate == spawn-at-center-rotate-around-center.
        q = rng.normal(size=4)
        params = jnp.asarray(np.concatenate([rng.normal(size=3), rng.uniform(1, 5, 3), q]), jnp.float32)
        corners = cuboid_from_params(params)
        center = params[:3]
        from housescan_tpu.geometry.transform import quat_rot_mat

        local = cuboid_from_params(jnp.concatenate([center, params[3:6], jnp.array([0.0, 0, 0, 1])]))
        via_rotate_around = rotate_around(center, quat_rot_mat(params[6:10]), local)
        np.testing.assert_allclose(np.asarray(corners), np.asarray(via_rotate_around), atol=1e-5)


class TestGuessDims:
    def test_axis_aligned_exact(self):
        corners, dims = make_cuboid(np.random.default_rng(1), dims=[2, 3, 5], rotate=False, translate=False)
        guessed = np.sort(np.asarray(guess_dims(corners)))
        np.testing.assert_allclose(guessed, np.sort(dims), atol=1e-4)

    def test_rotated_exact(self, rng):
        corners, dims = make_cuboid(rng, dims=[4, 1.5, 7])
        guessed = np.sort(np.asarray(guess_dims(corners)))
        np.testing.assert_allclose(guessed, np.sort(dims), rtol=1e-3)


class TestFitCuboid:
    def test_fixed_correspondence_exact_cuboid(self, rng):
        corners, _ = make_cuboid(rng, dims=[2, 1, 1])
        fit = fit_cuboid(corners, tol=1e-8, max_iter=2000)
        # reference prints RMSE = sqrt(err) (ref Main.hs:1827)
        assert float(jnp.sqrt(fit.error)) < 1e-2

    def test_from_center_recovers_dims(self, rng):
        # The reference's self-test threshold is err > 1 "bad"
        # (ref FitCuboidBFGS.hs:278); we assert err below that, and dims match.
        for seed in range(5):
            r = np.random.default_rng(seed)
            corners, dims = make_cuboid(r, translate=False)
            fit = fit_cuboid_from_center(corners)
            assert float(fit.error) < 1.0, f"seed {seed}: err {float(fit.error)}"
            fitted_dims = np.sort(np.abs(np.asarray(fit.params[3:6])))
            np.testing.assert_allclose(fitted_dims, np.sort(dims), rtol=0.05)

    def test_two_stage_fit_translated_cuboid(self, rng):
        corners, dims = make_cuboid(rng, dims=[3, 4, 5])
        fit = fit_cuboid_from_center_first(corners)
        assert float(fit.error) < 1e-2
        fitted = cuboid_from_params(fit.params)
        # every true corner has a fitted corner within 5cm (meter scale)
        d = np.asarray(
            jnp.min(jnp.sum((corners[:, None, :] - fitted[None, :, :]) ** 2, -1), axis=1)
        )
        assert np.all(np.sqrt(d) < 0.05)

    def test_bfgs_polish_never_worse_and_improves_noisy_fit(self, rng):
        """The gradient polish must keep the nearest-corner objective
        monotone: never worse than the simplex solution, and finite even
        from a rough start."""
        from housescan_tpu.solvers.cuboid_fit import errfun_closest, refine_bfgs

        corners, dims = make_cuboid(rng, dims=[3, 4, 5])
        noisy = corners + 0.02 * rng.normal(size=corners.shape).astype(np.float32)
        plain = fit_cuboid_from_center_first(noisy)
        polished = fit_cuboid_from_center_first(noisy, polish_bfgs=True)
        assert float(polished.error) <= float(plain.error) + 1e-7
        assert np.all(np.isfinite(np.asarray(polished.params)))

        # polishing a deliberately-perturbed solution improves it
        rough = plain.params + 0.01
        x, err = refine_bfgs(noisy, rough)
        assert float(err) <= float(errfun_closest(noisy, rough)) + 1e-7

    def test_batch_fit_matches_single(self):
        rngs = [np.random.default_rng(s) for s in (10, 11, 12, 13)]
        batch = jnp.stack([make_cuboid(r)[0] for r in rngs])
        fits = fit_cuboid_batch(batch)
        assert fits.params.shape == (4, 10)
        for i in range(4):
            single = fit_cuboid_from_center_first(batch[i])
            # same algorithm, same data -> same error (up to float assoc)
            assert float(fits.error[i]) < max(2.0 * float(single.error) + 1e-3, 1e-2)

    def test_errfun_zero_for_exact_params(self):
        params = jnp.array([1.0, 2, 3, 2, 3, 4, 0.3, -0.2, 0.5, 0.8])
        corners = cuboid_from_params(params)
        assert float(errfun(corners, params)) < 1e-8
