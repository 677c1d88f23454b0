"""Unit tests for tracer.materials: texture sampling and scatter physics."""

import numpy as np
import jax.numpy as jnp

from tracer.materials import scatter as S
from tracer.materials import texture as TX
from tracer.scene import types as T

from oracle import _tex2d


def _scatter_batch(mtype, n=4096, fuzz=0.0, ir=1.5, absorption=(0, 0, 0),
                   albedo=(0.8, 0.6, 0.4), front=True, normal=(0, 0, 1),
                   ray_dir=(0.6, 0.0, -0.8), seed0=123):
    r = n
    normal_a = jnp.tile(jnp.asarray(normal, jnp.float32), (r, 1))
    return S.scatter(
        ray_origin=jnp.zeros((r, 3)),
        ray_dir=jnp.tile(jnp.asarray(ray_dir, jnp.float32), (r, 1)),
        point=jnp.tile(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (r, 1)),
        normal=normal_a,
        front_face=jnp.full((r,), front),
        mtype=jnp.full((r,), mtype, jnp.int32),
        fuzz=jnp.full((r,), fuzz, jnp.float32),
        ir=jnp.full((r,), ir, jnp.float32),
        absorption=jnp.tile(jnp.asarray(absorption, jnp.float32), (r, 1)),
        albedo=jnp.tile(jnp.asarray(albedo, jnp.float32), (r, 1)),
        seed=jnp.arange(seed0, seed0 + r, dtype=jnp.uint32) * jnp.uint32(2654435761),
    )


class TestLambertian:
    def test_hemisphere_and_albedo(self):
        _, origin, d, att, ok = _scatter_batch(T.LAMBERTIAN)
        d = np.asarray(d)
        assert np.asarray(ok).all()
        # all directions in the +normal hemisphere (materials.h:74)
        assert (d[:, 2] > 0).all()
        np.testing.assert_allclose(np.asarray(att)[0], [0.8, 0.6, 0.4], atol=1e-6)
        # uniform hemisphere: E[cos] = 0.5
        cosines = d[:, 2] / np.linalg.norm(d, axis=1)
        assert abs(cosines.mean() - 0.5) < 0.02


class TestMetal:
    def test_zero_fuzz_specular_fraction(self):
        _, _, d, att, ok = _scatter_batch(T.METAL, fuzz=0.0)
        d = np.asarray(d) / np.linalg.norm(np.asarray(d), axis=1, keepdims=True)
        # mirror of unit(0.6,0,-0.8) about z: (0.6, 0, 0.8)
        spec = np.isclose(d, [0.6, 0.0, 0.8], atol=1e-5).all(axis=1)
        # p_metal = 0.8 (materials.h:82)
        assert abs(spec.mean() - 0.8) < 0.03
        assert np.asarray(ok).all()

    def test_fuzz_below_horizon_kills(self):
        # huge fuzz pushes many reflections below the surface -> ok False
        _, _, d, _, ok = _scatter_batch(T.METAL, fuzz=5.0)
        ok = np.asarray(ok)
        assert (~ok).sum() > 0
        d = np.asarray(d)
        # every *successful specular* ray is above the horizon (materials.h:87)
        assert (d[ok][:, 2] > 0).all()


class TestDielectric:
    def test_front_face_attenuation_is_one(self):
        _, _, _, att, ok = _scatter_batch(T.DIELECTRIC, ir=1.5, front=True)
        att = np.asarray(att)
        # front-face: attenuation (1,1,1), RR p = 1, never absorbed
        np.testing.assert_allclose(att, 1.0, atol=1e-6)
        assert np.asarray(ok).all()

    def test_total_internal_reflection(self):
        # grazing from inside (front_face=False, ratio=ir=1.5 > 1):
        # sin_theta * ratio > 1 -> always reflect
        _, _, d, _, _ = _scatter_batch(
            T.DIELECTRIC, ir=1.5, front=False, ray_dir=(0.9, 0.0, -0.436), normal=(0, 0, 1)
        )
        d = np.asarray(d)
        ud = np.array([0.9, 0.0, -0.436])
        ud /= np.linalg.norm(ud)
        want = ud - 2 * ud[2] * np.array([0.0, 0.0, 1.0])
        np.testing.assert_allclose(d, np.broadcast_to(want, d.shape), atol=1e-5)

    def test_beer_lambert_and_rr(self):
        absorption = (0.5, 1.0, 2.0)
        _, _, _, att, ok = _scatter_batch(
            T.DIELECTRIC, ir=1.5, front=False, absorption=absorption,
            ray_dir=(0.0, 0.0, -1.0), normal=(0, 0, 1),
        )
        att, ok = np.asarray(att), np.asarray(ok)
        # distance |point - origin| = 1; transmission = exp(-a)
        trans = np.exp(-np.asarray(absorption))
        p = trans.max()
        # survivors carry transmission / p (materials.h:123-125)
        np.testing.assert_allclose(att[ok], np.broadcast_to(trans / p, att[ok].shape), rtol=1e-5)
        # kill rate == 1 - p
        assert abs((~ok).mean() - (1 - p)) < 0.02

    def test_refraction_snell(self):
        # straight-on entry refracts straight through
        _, origin, d, _, _ = _scatter_batch(
            T.DIELECTRIC, ir=1.5, front=True, ray_dir=(0.0, 0.0, -1.0), normal=(0, 0, 1)
        )
        d = np.asarray(d)
        # normal incidence: reflect -> (0,0,1), refract -> (0,0,-1);
        # schlick at cos=1 gives r0=(0.5/2.5)^2=0.04 -> ~4% reflect
        frac_refract = (d[:, 2] < 0).mean()
        assert abs(frac_refract - 0.96) < 0.02
        # spawn origin offset 1e-4 along the outgoing side (materials.h:127-128)
        o = np.asarray(origin)
        assert np.allclose(np.abs(o[:, 2] - 1.0), 1e-4, atol=1e-7)


class TestDiffuseLight:
    def test_absorbs(self):
        _, _, _, _, ok = _scatter_batch(T.DIFFUSE_LIGHT, n=64)
        assert not np.asarray(ok).any()


class TestSeedBudget:
    def test_eight_advances_regardless_of_type(self):
        from tracer.core import rng

        for mtype in [T.LAMBERTIAN, T.METAL, T.DIELECTRIC, T.DIFFUSE_LIGHT]:
            seed, *_ = _scatter_batch(mtype, n=8, seed0=999)
            s0 = np.uint32(999 * 2654435761 % 2**32)
            want = jnp.asarray(s0)
            for _ in range(8):
                want = rng.wang_hash(want)
            assert int(np.asarray(seed)[0]) == int(want)


class TestTexture:
    def test_bilinear_matches_oracle(self):
        g = np.random.default_rng(7)
        tex = g.uniform(size=(1, 9, 13, 3)).astype(np.float32)
        us = g.uniform(-1.5, 2.5, size=(200,)).astype(np.float32)
        vs = g.uniform(-1.5, 2.5, size=(200,)).astype(np.float32)
        got = np.asarray(
            TX.sample_bilinear(jnp.asarray(tex), jnp.zeros(200, jnp.int32), jnp.asarray(us), jnp.asarray(vs))
        )
        want = np.stack([_tex2d(tex[0], float(u), float(v)) for u, v in zip(us, vs)])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
