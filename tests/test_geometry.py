"""Unit tests for tracer.geometry vs scalar NumPy oracles."""

import numpy as np
import jax.numpy as jnp

from tracer.geometry import aabb, plane, sphere
from tracer.scene import types as T

from oracle import _hit_plane, _hit_sphere

K_INF = 1e32


class TestSphere:
    def test_roots_match_oracle(self):
        g = np.random.default_rng(0)
        origins = g.normal(size=(64, 3), scale=5).astype(np.float32)
        dirs = g.normal(size=(64, 3)).astype(np.float32)
        centers = g.normal(size=(7, 3), scale=3).astype(np.float32)
        radii = g.uniform(0.5, 2.5, size=(7,)).astype(np.float32)

        ts = np.asarray(
            sphere.sphere_ts(jnp.asarray(origins), jnp.asarray(dirs), jnp.asarray(centers), jnp.asarray(radii), 1e-3, 1e30)
        )
        for r in range(64):
            for s in range(7):
                want = _hit_sphere(origins[r], dirs[r], centers[s], radii[s], 1e-3, 1e30)
                if want is None:
                    assert ts[r, s] >= K_INF
                else:
                    np.testing.assert_allclose(ts[r, s], want, rtol=2e-4, atol=1e-4)

    def test_inside_sphere_uses_far_root(self):
        # reference sphere.h:38-44: near root rejected (negative), far used.
        o = jnp.array([[0.0, 0.0, 0.0]])
        d = jnp.array([[1.0, 0.0, 0.0]])
        t = sphere.sphere_ts(o, d, jnp.array([[0.0, 0.0, 0.0]]), jnp.array([2.0]), 1e-3, 1e30)
        np.testing.assert_allclose(np.asarray(t), [[2.0]], rtol=1e-6)

    def test_record_face_normal_and_uv(self):
        o = jnp.array([[0.0, 0.0, -5.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        c = jnp.array([[0.0, 0.0, 0.0]])
        r = jnp.array([1.0])
        t = sphere.sphere_ts(o, d, c, r, 1e-3, 1e30)[:, 0]
        point, normal, front, u, v = sphere.sphere_record(o, d, t, c, r)
        np.testing.assert_allclose(np.asarray(point), [[0, 0, -1]], atol=1e-6)
        np.testing.assert_allclose(np.asarray(normal), [[0, 0, -1]], atol=1e-6)
        assert bool(front[0])
        # outward normal (0,0,-1): theta=acos(0)=pi/2 -> v=0.5;
        # phi=atan2(1,0)+pi=3pi/2 -> u=0.75 (sphere.h:16-22)
        np.testing.assert_allclose(np.asarray(u), [0.75], atol=1e-6)
        np.testing.assert_allclose(np.asarray(v), [0.5], atol=1e-6)


def _mk_planes(ptype, base, u, v):
    return T.make_planes([ptype], [base], [u], [v], [0])


class TestPlane:
    def test_quad_interior_bounds(self):
        pl = _mk_planes(T.QUAD, [0, 0, 0], [1, 0, 0], [0, 1, 0])
        o = jnp.array([[0.5, 0.5, 1.0], [1.5, 0.5, 1.0], [1.0, 1.0, 1.0]])
        d = jnp.tile(jnp.array([0.0, 0.0, -1.0]), (3, 1))
        t = np.asarray(plane.plane_ts(o, d, pl, 1e-3, 1e30))[:, 0]
        assert abs(t[0] - 1.0) < 1e-6
        assert t[1] >= K_INF  # alpha = 1.5 outside
        assert abs(t[2] - 1.0) < 1e-6  # closed interval includes corner (plane.h:32)

    def test_ellipse_interior(self):
        pl = _mk_planes(T.ELLIPSE, [0, 0, 0], [2, 0, 0], [0, 2, 0])
        # center (alpha=beta=0.5) inside; corner (alpha=beta=0.02) outside
        o = jnp.array([[1.0, 1.0, 1.0], [0.04, 0.04, 1.0]])
        d = jnp.tile(jnp.array([0.0, 0.0, -1.0]), (2, 1))
        t = np.asarray(plane.plane_ts(o, d, pl, 1e-3, 1e30))[:, 0]
        assert t[0] < K_INF and t[1] >= K_INF

    def test_triangle_interior(self):
        pl = _mk_planes(T.TRIANGLE, [0, 0, 0], [1, 0, 0], [0, 1, 0])
        o = jnp.array([[0.25, 0.25, 1.0], [0.75, 0.75, 1.0]])
        d = jnp.tile(jnp.array([0.0, 0.0, -1.0]), (2, 1))
        t = np.asarray(plane.plane_ts(o, d, pl, 1e-3, 1e30))[:, 0]
        assert t[0] < K_INF and t[1] >= K_INF  # alpha+beta=1.5 > 1

    def test_parallel_ray_rejected(self):
        pl = _mk_planes(T.QUAD, [0, 0, 0], [1, 0, 0], [0, 1, 0])
        o = jnp.array([[0.5, 0.5, 1.0]])
        d = jnp.array([[1.0, 0.0, 0.0]])
        t = np.asarray(plane.plane_ts(o, d, pl, 1e-3, 1e30))[:, 0]
        assert t[0] >= K_INF

    def test_matches_oracle_random(self):
        g = np.random.default_rng(3)
        base = g.normal(size=(5, 3)).astype(np.float32)
        u = g.normal(size=(5, 3)).astype(np.float32)
        v = g.normal(size=(5, 3)).astype(np.float32)
        ptype = np.array([0, 1, 2, 0, 2], np.int32)
        pls = T.make_planes(ptype, base, u, v, np.zeros(5, np.int32))
        origins = g.normal(size=(40, 3), scale=3).astype(np.float32)
        dirs = g.normal(size=(40, 3)).astype(np.float32)
        ts = np.asarray(plane.plane_ts(jnp.asarray(origins), jnp.asarray(dirs), pls, 1e-3, 1e30))
        for k in range(5):
            pl_dict = {
                "ptype": int(ptype[k]),
                "base": base[k],
                "u": u[k],
                "v": v[k],
                "normal": np.asarray(pls.normal)[k],
                "d": np.asarray(pls.d)[k],
                "w": np.asarray(pls.w)[k],
            }
            for r in range(40):
                want = _hit_plane(origins[r], dirs[r], pl_dict, 1e-3, 1e30)
                if want is None:
                    assert ts[r, k] >= K_INF, (r, k)
                else:
                    np.testing.assert_allclose(ts[r, k], want[0], rtol=2e-4, atol=1e-4)


class TestAABB:
    def test_slab_hit_and_miss(self):
        o = jnp.array([[0.0, 0.0, -5.0], [3.0, 0.0, -5.0], [0.0, 0.0, 5.0]])
        d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        bmin = jnp.tile(jnp.array([-1.0, -1.0, -1.0]), (3, 1))
        bmax = jnp.tile(jnp.array([1.0, 1.0, 1.0]), (3, 1))
        got = np.asarray(aabb.slab_hit(o, d, bmin, bmax, 1e-3, 1e30))
        np.testing.assert_array_equal(got, [True, False, False])

    def test_negative_direction(self):
        o = jnp.array([[0.0, 0.0, 5.0]])
        d = jnp.array([[0.0, 0.0, -1.0]])
        got = np.asarray(
            aabb.slab_hit(o, d, jnp.array([[-1.0, -1, -1]]), jnp.array([[1.0, 1, 1]]), 1e-3, 1e30)
        )
        assert got[0]

    def test_plane_boxes_triangle_excludes_p3(self):
        # reference bvh_builder.h:38-46: p3 only folded in for QUAD/ELLIPSE
        base = np.zeros((2, 3), np.float32)
        u = np.tile(np.array([1, 0, 0], np.float32), (2, 1))
        v = np.tile(np.array([0, 1, 0], np.float32), (2, 1))
        lo, hi = aabb.plane_boxes(base, u, v, np.array([0, 2]))  # quad, tri
        assert hi[0, 0] >= 1.0 and hi[0, 1] >= 1.0
        np.testing.assert_allclose(hi[1, :2], [1.0, 1.0], atol=1e-6)
        # degenerate z axis padded by delta (aabb.h:92-97)
        assert hi[0, 2] - lo[0, 2] >= 1e-4 - 1e-7
