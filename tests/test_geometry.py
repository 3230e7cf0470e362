"""Property + parity tests for the geometry core (SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp

from fusion3dseg_tpu.geometry import quaternion as quat
from fusion3dseg_tpu.geometry import camera, intersections

import oracle


def random_quat(rng, shape=()):
    q = rng.normal(size=shape + (4,))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


class TestQuaternion:
    def test_rotate_matches_oracle(self, rng):
        q = random_quat(rng)
        p = rng.normal(size=(100, 3))
        got = np.asarray(quat.rotate(jnp.asarray(q), jnp.asarray(p)))
        want = oracle.quat_rotate(q, p)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_rotate_inverse_roundtrip(self, rng):
        q = random_quat(rng)
        p = rng.normal(size=(50, 3))
        back = quat.rotate_inverse(jnp.asarray(q), quat.rotate(jnp.asarray(q), jnp.asarray(p)))
        np.testing.assert_allclose(np.asarray(back), p, atol=1e-6)

    def test_rotation_matrix_agrees_with_rotate(self, rng):
        q = random_quat(rng)
        p = rng.normal(size=(20, 3))
        R = np.asarray(quat.to_rotation_matrix(jnp.asarray(q)))
        want = oracle.quat_rotate(q, p)
        np.testing.assert_allclose(p @ R.T, want, atol=1e-6)

    def test_batched_rotate(self, rng):
        qs = random_quat(rng, (5,))
        p = rng.normal(size=(5, 7, 3))
        got = np.asarray(quat.rotate(jnp.asarray(qs), jnp.asarray(p)))
        for f in range(5):
            np.testing.assert_allclose(got[f], oracle.quat_rotate(qs[f], p[f]), atol=1e-6)

    def test_multiply_is_composition(self, rng):
        q1, q2 = random_quat(rng), random_quat(rng)
        p = rng.normal(size=(10, 3))
        q12 = quat.multiply(jnp.asarray(q1), jnp.asarray(q2))
        a = quat.rotate(q12, jnp.asarray(p))
        b = quat.rotate(jnp.asarray(q1), quat.rotate(jnp.asarray(q2), jnp.asarray(p)))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_between_vectors(self, rng):
        v1, v2 = rng.normal(size=3), rng.normal(size=3)
        q = quat.between_vectors(jnp.asarray(v1), jnp.asarray(v2))
        got = np.asarray(quat.rotate(q, jnp.asarray(v1[None] / np.linalg.norm(v1))))
        np.testing.assert_allclose(got[0], v2 / np.linalg.norm(v2), atol=1e-6)

    def test_between_vectors_antiparallel(self):
        # w = 1 + dot = 0 and cross = 0: must return a finite 180-degree
        # rotation, not the normalized zero quaternion (NaN)
        for v in ([1.0, 0, 0], [0, 1.0, 0], [0, 0, -1.0], [0.6, -0.64, 0.48]):
            v1 = jnp.asarray(v)
            q = quat.between_vectors(v1, -v1)
            assert np.isfinite(np.asarray(q)).all()
            got = np.asarray(quat.rotate(q, v1[None]))
            np.testing.assert_allclose(got[0], -np.asarray(v1), atol=1e-6)


class TestCamera:
    def _setup(self, rng):
        K = np.array([[400.0, 0, 96.0], [0, 400.0, 128.0], [0, 0, 1.0]])
        q = random_quat(rng)
        t = rng.normal(size=3)
        pts = rng.normal(size=(1000, 3)) * 2 + np.array([0, 0, 3.0])
        return K, q, t, pts

    def test_projection_matches_oracle(self, rng):
        K, q, t, pts = self._setup(rng)
        u, v, z = camera.project_points(
            jnp.asarray(pts), jnp.asarray(K), jnp.asarray(q), jnp.asarray(t)
        )
        ou, ov, oz = oracle.project_points(pts, K, q, t)
        # Compare where the projection is numerically meaningful (points near
        # the camera plane produce huge uv where f32 absolute error explodes;
        # such points are culled by the z-buffer in the real pipeline anyway).
        sel = (oz > 0.3) & (np.abs(ou) < 2000) & (np.abs(ov) < 2000)
        assert sel.sum() > 50
        u, v = np.asarray(u)[sel], np.asarray(v)[sel]
        # floor() at f32 can flip on exact-boundary pixels; allow off-by-one
        assert np.mean(u == ou[sel]) > 0.98
        assert np.abs(u - ou[sel]).max() <= 1
        assert np.mean(v == ov[sel]) > 0.98
        assert np.abs(v - ov[sel]).max() <= 1
        np.testing.assert_allclose(np.asarray(z)[sel], oz[sel], rtol=1e-4, atol=1e-4)

    def test_backproject_project_roundtrip(self, rng):
        K = np.array([[400.0, 0, 96.0], [0, 400.0, 128.0], [0, 0, 1.0]])
        depth = rng.uniform(0.5, 4.0, size=(64, 48)).astype(np.float32)
        pts = camera.backproject_depth(jnp.asarray(depth), jnp.asarray(K))
        np.testing.assert_allclose(
            np.asarray(pts), oracle.backproject(depth, K), atol=1e-4
        )
        # identity pose: project back to the originating pixel
        q = np.array([1.0, 0, 0, 0])
        u, v, z = camera.project_points(pts, jnp.asarray(K), jnp.asarray(q), jnp.zeros(3))
        uu, vv = np.meshgrid(np.arange(48), np.arange(64))
        np.testing.assert_array_equal(np.asarray(u), uu.reshape(-1))
        np.testing.assert_array_equal(np.asarray(v), vv.reshape(-1))
        np.testing.assert_allclose(np.asarray(z), depth.reshape(-1), rtol=1e-5)

    def test_world_roundtrip(self, rng):
        K, q, t, pts = self._setup(rng)
        cam_pts = quat.rotate_inverse(jnp.asarray(q), jnp.asarray(pts - t))
        world = camera.camera_to_world(cam_pts, jnp.asarray(q), jnp.asarray(t))
        np.testing.assert_allclose(np.asarray(world), pts, atol=1e-5)

    def test_frustum_contains_visible_points(self, rng):
        K = np.array([[400.0, 0, 96.0], [0, 400.0, 128.0], [0, 0, 1.0]])
        w, h = 192, 256
        q = np.array([1.0, 0, 0, 0])
        t = np.zeros(3)
        ppts, pns = camera.frustum_world_planes(
            jnp.asarray(K), w, h, jnp.asarray(q), jnp.asarray(t), max_depth=10.0
        )
        # points on pixel rays inside the image must be inside
        depth = rng.uniform(0.5, 8.0, size=(h, w)).astype(np.float32)
        pts = camera.backproject_depth(jnp.asarray(depth), jnp.asarray(K))
        # keep away from borders (plane orientation is exact at the border)
        inner = np.zeros((h, w), bool)
        inner[5:-5, 5:-5] = True
        inside = intersections.points_inside_polyhedra(pts, ppts, pns)
        assert np.asarray(inside)[inner.reshape(-1)].all()
        # far-away / behind points must be outside
        outside_pts = jnp.asarray([[0, 0, 20.0], [0, 0, -1.0], [100, 0, 1.0]])
        assert not np.asarray(
            intersections.points_inside_polyhedra(outside_pts, ppts, pns)
        ).any()

    def test_polyhedron_matches_oracle(self, rng):
        pts = rng.normal(size=(500, 3))
        ppts = rng.normal(size=(5, 3))
        pns = rng.normal(size=(5, 3))
        pns /= np.linalg.norm(pns, axis=-1, keepdims=True)
        got = np.asarray(
            intersections.points_inside_polyhedra(
                jnp.asarray(pts), jnp.asarray(ppts), jnp.asarray(pns)
            )
        )
        want = oracle.point_inside_polyhedra(pts, ppts, pns)
        assert (got == want).mean() > 0.999  # f32 boundary flips only


class TestIntersections:
    def test_ray_plane(self, rng):
        o = rng.normal(size=(10, 3))
        d = rng.normal(size=(10, 3))
        pp = np.array([0.0, 0, 5.0])
        pn = np.array([0.0, 0, 1.0])
        pts, t = intersections.ray_plane_intersections(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(pp), jnp.asarray(pn)
        )
        np.testing.assert_allclose(np.asarray(pts)[:, 2], 5.0, atol=1e-4)

    def test_project_points_to_plane(self, rng):
        pts = rng.normal(size=(20, 3))
        proj, dist = intersections.project_points_to_plane(
            jnp.asarray(pts), jnp.zeros(3), jnp.asarray([0.0, 0, 1.0])
        )
        np.testing.assert_allclose(np.asarray(proj)[:, 2], 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(dist), pts[:, 2], atol=1e-6)

    def test_ray_ray_closest(self):
        o1 = jnp.asarray([[0.0, 0, 0]])
        d1 = jnp.asarray([[1.0, 0, 0]])
        o2 = jnp.asarray([[0.0, 1, 5]])
        d2 = jnp.asarray([[0.0, 0, 1]])
        p1, p2 = intersections.ray_ray_closest_points(o1, d1, o2, d2)
        np.testing.assert_allclose(np.asarray(p1)[0], [0, 0, 0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(p2)[0], [0, 1, 0], atol=1e-5)
