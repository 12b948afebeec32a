"""Property tests for the geometry core.

Ports the reference's QuickCheck identity-check pattern
(ref FitCuboidBFGS.hs:134-140) to randomized numpy fixtures, and covers the
plane algebra the reference kept inline in Main.hs:1354-1735.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from housescan_tpu.geometry import (
    PlaneEq,
    apply_proj4,
    axis_angle_mat,
    fit_plane,
    flip_plane_eq,
    identity_proj4,
    mk_plane_eq,
    mk_plane_eq_abcd,
    plane_corner,
    plane_corners_batch,
    project_to_plane,
    proj4_from_translation,
    quat_rot_mat,
    rotate_around,
    rotation_between_normals,
    rotation_proj4_around,
    signed_distance_to_plane,
)
from housescan_tpu.geometry.plane import (
    rotate_plane_eq,
    rotate_plane_eq_around,
    transform_plane_eq,
    translate_plane_eq,
)
from housescan_tpu.geometry.transform import compose_proj4, transpose_for_export

ATOL = 1e-5


def random_rot(rng):
    q = rng.normal(size=4)
    return np.asarray(quat_rot_mat(jnp.asarray(q, jnp.float32)))


class TestRotations:
    def test_axis_angle_is_orthonormal(self, rng):
        for _ in range(10):
            m = np.asarray(axis_angle_mat(jnp.asarray(rng.normal(size=3), jnp.float32), rng.uniform(0, 2 * np.pi)))
            np.testing.assert_allclose(m @ m.T, np.eye(3), atol=ATOL)
            assert np.linalg.det(m) == pytest.approx(1.0, abs=1e-4)

    def test_quat_mat_orthonormal(self, rng):
        for _ in range(10):
            m = random_rot(rng)
            np.testing.assert_allclose(m @ m.T, np.eye(3), atol=ATOL)
            assert np.linalg.det(m) == pytest.approx(1.0, abs=1e-4)

    def test_axis_angle_right_hand_convention(self):
        # Row-vector convention: rotating +x by 90deg about +z gives +y.
        m = axis_angle_mat(jnp.array([0.0, 0.0, 1.0]), jnp.pi / 2)
        out = jnp.array([1.0, 0.0, 0.0]) @ m
        np.testing.assert_allclose(np.asarray(out), [0.0, 1.0, 0.0], atol=ATOL)

    def test_rotate_around_center_fixes_center(self, rng):
        center = jnp.asarray(rng.normal(size=3), jnp.float32)
        m = jnp.asarray(random_rot(rng))
        np.testing.assert_allclose(
            np.asarray(rotate_around(center, m, center)), np.asarray(center), atol=ATOL
        )

    def test_rotation_between_normals(self, rng):
        for _ in range(10):
            n1 = rng.normal(size=3)
            n2 = rng.normal(size=3)
            m = rotation_between_normals(jnp.asarray(n1, jnp.float32), jnp.asarray(n2, jnp.float32))
            rotated = np.asarray(jnp.asarray(n1, jnp.float32) @ m)
            cos = rotated @ n2 / (np.linalg.norm(rotated) * np.linalg.norm(n2))
            assert cos == pytest.approx(1.0, abs=1e-4)

    def test_rotation_between_parallel_normals_is_identity(self):
        n = jnp.array([0.0, 1.0, 0.0])
        m = rotation_between_normals(n, n)
        np.testing.assert_allclose(np.asarray(m), np.eye(3), atol=ATOL)

    def test_rotation_between_antiparallel(self):
        n = jnp.array([0.0, 1.0, 0.0])
        m = rotation_between_normals(n, -n)
        np.testing.assert_allclose(np.asarray(n @ m), [0.0, -1.0, 0.0], atol=ATOL)


class TestProj4:
    def test_translation_last_row(self):
        p = proj4_from_translation(jnp.array([1.0, 2.0, 3.0]))
        np.testing.assert_allclose(np.asarray(p[3, :3]), [1.0, 2.0, 3.0])
        pts = jnp.zeros((4, 3))
        np.testing.assert_allclose(np.asarray(apply_proj4(p, pts))[0], [1.0, 2.0, 3.0])

    def test_compose_order(self):
        t1 = proj4_from_translation(jnp.array([1.0, 0.0, 0.0]))
        r = rotation_proj4_around(
            jnp.zeros(3), axis_angle_mat(jnp.array([0.0, 0.0, 1.0]), jnp.pi / 2)
        )
        # first translate then rotate: (1,0,0) -> (0,1,0)
        m = compose_proj4(t1, r)
        out = apply_proj4(m, jnp.zeros((1, 3)))[0]
        np.testing.assert_allclose(np.asarray(out), [0.0, 1.0, 0.0], atol=ATOL)

    def test_rotation_around_center_proj4_matches_pointwise(self, rng):
        center = jnp.asarray(rng.normal(size=3), jnp.float32)
        rot = jnp.asarray(random_rot(rng))
        pts = jnp.asarray(rng.normal(size=(20, 3)), jnp.float32)
        via_proj = apply_proj4(rotation_proj4_around(center, rot), pts)
        direct = rotate_around(center, rot, pts)
        np.testing.assert_allclose(np.asarray(via_proj), np.asarray(direct), atol=1e-4)

    def test_export_transpose(self):
        p = proj4_from_translation(jnp.array([1.0, 2.0, 3.0]))
        e = transpose_for_export(p)
        # column-vector convention: translation in last column
        np.testing.assert_allclose(np.asarray(e[:3, 3]), [1.0, 2.0, 3.0])

    def test_identity(self):
        pts = jnp.arange(12.0).reshape(4, 3)
        np.testing.assert_allclose(
            np.asarray(apply_proj4(identity_proj4(), pts)), np.asarray(pts)
        )


class TestPlaneEq:
    def test_mk_plane_eq_normalizes(self):
        eq = mk_plane_eq(jnp.array([0.0, 2.0, 0.0]), 4.0)
        np.testing.assert_allclose(np.asarray(eq.normal), [0.0, 1.0, 0.0], atol=ATOL)
        assert float(eq.d) == pytest.approx(2.0)

    def test_signed_distance_and_flip(self):
        eq = mk_plane_eq(jnp.array([0.0, 1.0, 0.0]), 2.0)  # plane y = 2
        p = jnp.array([5.0, 3.0, 1.0])
        assert float(signed_distance_to_plane(eq, p)) == pytest.approx(1.0)
        assert float(signed_distance_to_plane(flip_plane_eq(eq), p)) == pytest.approx(-1.0)

    def test_project_to_plane_lands_on_plane(self, rng):
        eq = mk_plane_eq(jnp.asarray(rng.normal(size=3), jnp.float32), 1.5)
        pts = jnp.asarray(rng.normal(size=(50, 3)), jnp.float32)
        projected = project_to_plane(eq, pts)
        d = signed_distance_to_plane(eq, projected)
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-5)

    def test_pcl_sign_convention(self):
        # PCL form: 0x + 1y + 0z + (-2) = 0 is the plane y = 2; our form
        # negates d on import (ref Main.hs:1383-1385).
        eq = mk_plane_eq_abcd(0.0, 1.0, 0.0, -(-2.0))
        assert float(eq.d) == pytest.approx(2.0)

    def test_rotate_plane_eq_about_origin_keeps_d(self, rng):
        eq = mk_plane_eq(jnp.asarray(rng.normal(size=3), jnp.float32), 1.23)
        rot = jnp.asarray(random_rot(rng))
        eq2 = rotate_plane_eq(eq, rot)
        # d (origin distance) is invariant under rotation about the origin
        assert float(eq2.d) == pytest.approx(float(eq.d), abs=1e-5)

    def test_rotate_plane_eq_around_is_consistent_with_points(self, rng):
        # Points on the plane stay on the rotated plane.
        eq = mk_plane_eq(jnp.asarray(rng.normal(size=3), jnp.float32), 0.7)
        pts = project_to_plane(eq, jnp.asarray(rng.normal(size=(20, 3)), jnp.float32))
        center = jnp.asarray(rng.normal(size=3), jnp.float32)
        rot = jnp.asarray(random_rot(rng))
        eq2 = rotate_plane_eq_around(eq, center, rot)
        pts2 = rotate_around(center, rot, pts)
        np.testing.assert_allclose(
            np.asarray(signed_distance_to_plane(eq2, pts2)), 0.0, atol=1e-4
        )

    def test_translate_plane_eq_consistent_with_points(self, rng):
        eq = mk_plane_eq(jnp.asarray(rng.normal(size=3), jnp.float32), -0.4)
        pts = project_to_plane(eq, jnp.asarray(rng.normal(size=(20, 3)), jnp.float32))
        off = jnp.asarray(rng.normal(size=3), jnp.float32)
        eq2 = translate_plane_eq(eq, off)
        np.testing.assert_allclose(
            np.asarray(signed_distance_to_plane(eq2, pts + off)), 0.0, atol=1e-4
        )

    def test_transform_plane_eq_full_proj(self, rng):
        eq = mk_plane_eq(jnp.asarray(rng.normal(size=3), jnp.float32), 0.9)
        pts = project_to_plane(eq, jnp.asarray(rng.normal(size=(20, 3)), jnp.float32))
        rot = jnp.asarray(random_rot(rng))
        proj = compose_proj4(
            rotation_proj4_around(jnp.asarray(rng.normal(size=3), jnp.float32), rot),
            proj4_from_translation(jnp.asarray(rng.normal(size=3), jnp.float32)),
        )
        eq2 = transform_plane_eq(eq, proj)
        pts2 = apply_proj4(proj, pts)
        np.testing.assert_allclose(
            np.asarray(signed_distance_to_plane(eq2, pts2)), 0.0, atol=1e-4
        )

    def test_batched_planes(self):
        normals = jnp.array([[1.0, 0.0, 0.0], [0.0, 2.0, 0.0]])
        eq = mk_plane_eq(normals, jnp.array([1.0, 4.0]))
        assert eq.normal.shape == (2, 3)
        np.testing.assert_allclose(np.asarray(eq.d), [1.0, 2.0])


class TestPlaneCorner:
    def test_axis_planes_intersect_at_expected_point(self):
        ex = mk_plane_eq(jnp.array([1.0, 0.0, 0.0]), 1.0)
        ey = mk_plane_eq(jnp.array([0.0, 1.0, 0.0]), 2.0)
        ez = mk_plane_eq(jnp.array([0.0, 0.0, 1.0]), 3.0)
        corner, valid = plane_corner(ex, ey, ez)
        assert bool(valid)
        np.testing.assert_allclose(np.asarray(corner), [1.0, 2.0, 3.0], atol=ATOL)

    def test_parallel_planes_flagged_invalid(self):
        e1 = mk_plane_eq(jnp.array([1.0, 0.0, 0.0]), 1.0)
        e2 = mk_plane_eq(jnp.array([1.0, 0.0, 0.0]), 2.0)
        e3 = mk_plane_eq(jnp.array([0.0, 1.0, 0.0]), 0.0)
        corner, valid = plane_corner(e1, e2, e3)
        assert not bool(valid)
        assert np.all(np.isnan(np.asarray(corner)))

    def test_batch_matches_single(self, rng):
        normals = jnp.asarray(rng.normal(size=(6, 3)), jnp.float32)
        ds = jnp.asarray(rng.normal(size=6), jnp.float32)
        eqs = mk_plane_eq(normals, ds)
        triples = jnp.array([[0, 1, 2], [3, 4, 5], [0, 2, 4]])
        pts, valid = plane_corners_batch(eqs, triples)
        assert pts.shape == (3, 3)
        for t in range(3):
            i, j, k = (int(x) for x in triples[t])
            single, v = plane_corner(
                PlaneEq(eqs.normal[i], eqs.d[i]),
                PlaneEq(eqs.normal[j], eqs.d[j]),
                PlaneEq(eqs.normal[k], eqs.d[k]),
            )
            assert bool(v) == bool(valid[t])
            if bool(v):
                np.testing.assert_allclose(np.asarray(pts[t]), np.asarray(single), atol=1e-4)


class TestFitPlane:
    def test_recovers_known_plane(self, rng):
        eq_true = mk_plane_eq(jnp.asarray(rng.normal(size=3), jnp.float32), 2.0)
        pts = project_to_plane(eq_true, jnp.asarray(rng.normal(size=(200, 3)), jnp.float32) * 5)
        eq = fit_plane(pts)
        d = signed_distance_to_plane(eq, pts)
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-3)

    def test_noisy_plane_normal_direction(self, rng):
        # Plane z = 5 with small noise
        pts = np.concatenate(
            [rng.uniform(-3, 3, size=(500, 2)), 5.0 + 0.01 * rng.normal(size=(500, 1))],
            axis=1,
        )
        eq = fit_plane(jnp.asarray(pts, jnp.float32))
        n = np.abs(np.asarray(eq.normal))
        np.testing.assert_allclose(n, [0.0, 0.0, 1.0], atol=0.01)
        assert float(eq.d) == pytest.approx(5.0, abs=0.01)
