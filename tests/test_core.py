"""Unit tests for tracer.core: vec math and RNG vs pure-Python oracles."""

import numpy as np
import jax.numpy as jnp

from tracer.core import rng, vec

M32 = 0xFFFFFFFF


def wang_hash_py(seed: int) -> int:
    """Pure-Python oracle of reference include/random_utils.h:7-14."""
    seed = ((seed ^ 61) ^ (seed >> 16)) & M32
    seed = (seed * 9) & M32
    seed = (seed ^ (seed >> 4)) & M32
    seed = (seed * 0x27D4EB2D) & M32
    seed = (seed ^ (seed >> 15)) & M32
    return seed


class TestWangHash:
    def test_vectors_match_python_oracle(self):
        seeds = np.array(
            [0, 1, 2, 61, 12345, 0xDEADBEEF, M32, 2**31, 999999937], dtype=np.uint32
        )
        got = np.asarray(rng.wang_hash(jnp.asarray(seeds)))
        want = np.array([wang_hash_py(int(s)) for s in seeds], dtype=np.uint32)
        np.testing.assert_array_equal(got, want)

    def test_random_float_stream(self):
        # random_float advances the seed in place and divides by 2^32
        # (random_utils.h:16-19); check a 3-step stream.
        s = 42
        seed = jnp.asarray(np.uint32(s))
        for _ in range(3):
            seed, u = rng.random_float(seed)
            s = wang_hash_py(s)
            assert int(seed) == s
            # reference random_utils.h:18: static_cast<float>(seed) / 2^32f —
            # the uint32 is rounded to float32 *before* the divide.
            want = np.float32(s) * np.float32(1.0 / 2**32)
            assert np.float32(u) == want

    def test_random_float_in_unit_interval(self):
        seeds = jnp.arange(4096, dtype=jnp.uint32)
        _, u = rng.random_float(seeds)
        u = np.asarray(u)
        assert (u >= 0.0).all() and (u < 1.0).all()
        # wang_hash is a decent mixer: the mean of 4k draws should be ~0.5
        assert abs(u.mean() - 0.5) < 0.02


class TestSphereSamplers:
    def test_unit_vector_is_unit_and_uniform(self):
        seeds = jnp.arange(20000, dtype=jnp.uint32) * jnp.uint32(2654435761)
        _, d = rng.random_unit_vector(seeds)
        d = np.asarray(d)
        np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
        # each component of a uniform sphere direction has mean 0, var 1/3
        assert np.abs(d.mean(axis=0)).max() < 0.02
        np.testing.assert_allclose(d.var(axis=0), 1.0 / 3.0, atol=0.02)

    def test_in_unit_sphere_volume_uniform(self):
        seeds = jnp.arange(20000, dtype=jnp.uint32) * jnp.uint32(40503)
        _, p = rng.random_in_unit_sphere(seeds)
        r = np.linalg.norm(np.asarray(p), axis=-1)
        assert (r <= 1.0 + 1e-6).all()
        # volume-uniform radius: E[r] = 3/4, E[r^3] = 1/2
        assert abs(r.mean() - 0.75) < 0.01
        assert abs((r**3).mean() - 0.5) < 0.01

    def test_hemisphere_respects_normal(self):
        seeds = jnp.arange(1000, dtype=jnp.uint32) + jnp.uint32(7)
        n = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (1000, 1))
        _, d = rng.random_in_hemisphere(n, seeds)
        assert (np.asarray(vec.dot(d, n)) > 0.0).all()


class TestPixelSeeds:
    def test_reference_quirk_seed(self):
        # reference src/camera.cu:25 uses wang_hash(i*width + j)
        got = int(rng.pixel_seed(3, 5, width=200, reference_quirk=True))
        assert got == wang_hash_py(3 * 200 + 5)
        got_fixed = int(rng.pixel_seed(3, 5, width=200, reference_quirk=False))
        assert got_fixed == wang_hash_py(5 * 200 + 3)

    def test_sample_seed(self):
        # reference src/camera.cu:28: wang_hash(base + s)
        base = wang_hash_py(777)
        got = int(rng.sample_seed(jnp.uint32(base), 12))
        assert got == wang_hash_py(base + 12)


class TestVec:
    def test_cross_matches_numpy(self):
        a = np.random.default_rng(0).normal(size=(32, 3)).astype(np.float32)
        b = np.random.default_rng(1).normal(size=(32, 3)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(vec.cross(jnp.asarray(a), jnp.asarray(b))),
            np.cross(a, b),
            rtol=1e-5,
            atol=1e-6,
        )

    def test_reflect(self):
        # reference include/vec3.h:63: v - 2*dot(v,n)*n
        v = jnp.array([1.0, -1.0, 0.0])
        n = jnp.array([0.0, 1.0, 0.0])
        np.testing.assert_allclose(np.asarray(vec.reflect(v, n)), [1.0, 1.0, 0.0])

    def test_refract_straight_through_at_eta_1(self):
        uv = vec.unit_vector(jnp.array([1.0, -1.0, 0.0]))
        n = jnp.array([0.0, 1.0, 0.0])
        out = vec.refract(uv, n, 1.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(uv), atol=1e-6)

    def test_refract_snell_angle(self):
        # 45 deg incidence, eta = 1/1.5: sin(theta_t) = sin(45)/1.5
        uv = vec.unit_vector(jnp.array([1.0, -1.0, 0.0]))
        n = jnp.array([0.0, 1.0, 0.0])
        out = np.asarray(vec.refract(uv, n, 1.0 / 1.5))
        sin_t = abs(out[0]) / np.linalg.norm(out)
        np.testing.assert_allclose(sin_t, np.sin(np.pi / 4) / 1.5, rtol=1e-5)

    def test_near_zero(self):
        v = jnp.array([[1e-9, 1e-9, 1e-9], [1e-7, 0.0, 0.0]])
        np.testing.assert_array_equal(np.asarray(vec.near_zero(v)), [True, False])

    def test_unit_vector_guard_eps(self):
        z = jnp.zeros((3,))
        out = np.asarray(vec.unit_vector(z, eps=1e-20))
        assert np.isfinite(out).all()
