"""Furnace-style energy tests: analytically exact radiance checks.

A camera looking straight down at an effectively infinite lambertian
floor under a uniform background L: every primary ray hits the floor,
every scattered ray leaves upward and escapes, so EVERY sample returns
exactly albedo * L (one bounce of throughput, then the background term,
camera.cu:226-229 + materials.h:73-79). This pins the energy chain
(beta accumulation, background add, emission order) with zero Monte
Carlo variance — a check the pixel-parity tests can't give.
"""

import numpy as np
import jax.numpy as jnp

from tracer.render import camera as C
from tracer.render import renderer
from tracer.scene import types as T

L = (0.6, 0.8, 1.0)
W, H = 8, 6


def _floor_scene(mtype, albedo=(0.7, 0.5, 0.3), fuzz=0.3, ir=1.5,
                 absorption=(0.0, 0.0, 0.0)):
    planes = T.make_planes(
        [T.QUAD], [[-5000, -5000, 0]], [[10000, 0, 0]], [[0, 10000, 0]], [0]
    )
    mats = T.make_materials(
        [mtype], [fuzz], [ir], [list(absorption)], [list(albedo)],
        [[0, 0, 0]], [-1],
    )
    return T.Scene(T.empty_spheres(), planes, mats, None, None)


def _cam():
    # look straight down from above; floor fills the view
    return C.build_camera_data([0, 0, 10.0], [0, 0, 0], W, H, 60.0,
                               vup=(0, 1, 0), background=L)


def _render(scene, spp=8, depth=4):
    fb = renderer.render_frame(scene, _cam(), W, H, spp=spp, max_depth=depth, chunk=W * H)
    return np.asarray(fb) / spp


def test_lambertian_furnace_exact():
    img = _render(_floor_scene(T.LAMBERTIAN, albedo=(0.7, 0.5, 0.3)))
    want = np.array([0.7, 0.5, 0.3]) * np.array(L)
    np.testing.assert_allclose(img, np.broadcast_to(want, img.shape), rtol=1e-5)


def test_metal_furnace_exact():
    # specular (0.8): reflect up -> background; diffuse (0.2): up -> background.
    # both carry albedo once -> exactly albedo * L.
    img = _render(_floor_scene(T.METAL, albedo=(0.9, 0.8, 0.7), fuzz=0.2))
    want = np.array([0.9, 0.8, 0.7]) * np.array(L)
    np.testing.assert_allclose(img, np.broadcast_to(want, img.shape), rtol=1e-5)


def test_dielectric_no_absorption_is_lossless():
    # attenuation (1,1,1) front-face, RR p=1: reflected rays escape with
    # exactly L; refracted rays pass through the (infinitely thin) floor
    # downward and miss everything -> also L.
    img = _render(_floor_scene(T.DIELECTRIC, ir=1.5))
    np.testing.assert_allclose(img, np.broadcast_to(L, img.shape), rtol=1e-5)


def test_depth_one_kills_all_paths():
    # depth 1: hit floor, scatter consumes the only bounce -> no
    # background term ever added -> pitch black (camera.cu:223 semantics).
    img = _render(_floor_scene(T.LAMBERTIAN), depth=1)
    np.testing.assert_allclose(img, 0.0, atol=1e-7)


def test_emissive_floor_adds_before_scatter():
    # floor emits E and is DIFFUSE_LIGHT (absorbs): pixel = E exactly.
    planes = T.make_planes(
        [T.QUAD], [[-5000, -5000, 0]], [[10000, 0, 0]], [[0, 10000, 0]], [0]
    )
    mats = T.make_materials(
        [T.DIFFUSE_LIGHT], [0.0], [1.0], [[0, 0, 0]], [[0, 0, 0]],
        [[2.0, 3.0, 4.0]], [-1],
    )
    scene = T.Scene(T.empty_spheres(), planes, mats, None, None)
    img = _render(scene)
    np.testing.assert_allclose(img, np.broadcast_to([2.0, 3.0, 4.0], img.shape), rtol=1e-6)
