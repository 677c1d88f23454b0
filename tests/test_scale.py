"""Large-scene configurations (BASELINE.md configs 4-5, shrunk for CI).

500- and 2000-sphere scenes exercise the BVH path at depth ~11 and the
builders at scale; renders are tiny but end-to-end.
"""

import numpy as np
import jax.numpy as jnp

from tracer.bvh import builder as bvh_builder
from tracer.bvh import traverse as bt
from tracer.render import camera as C
from tracer.render import hit as hm
from tracer.render import renderer
from tracer.scene import types as T


def _big_scene(num_spheres, seed=0):
    g = np.random.default_rng(seed)
    centers = g.uniform(-20, 20, size=(num_spheres, 3)).astype(np.float32)
    centers[:, 2] = g.uniform(0.5, 8, size=num_spheres)
    radii = g.uniform(0.3, 1.2, size=num_spheres).astype(np.float32)
    mat_idx = g.integers(0, 3, size=num_spheres).astype(np.int32)
    spheres = T.make_spheres(centers, radii, mat_idx)
    planes = T.make_planes([T.QUAD], [[-30, -30, 0]], [[60, 0, 0]], [[0, 60, 0]], [3])
    mats = T.make_materials(
        [T.LAMBERTIAN, T.METAL, T.DIFFUSE_LIGHT, T.LAMBERTIAN],
        [0, 0.2, 0, 0], [1, 1, 1, 1], np.zeros((4, 3)),
        [[0.6, 0.4, 0.3], [0.8, 0.8, 0.9], [0, 0, 0], [0.5, 0.5, 0.5]],
        [[0, 0, 0], [0, 0, 0], [6, 6, 6], [0, 0, 0]], [-1] * 4,
    )
    bvh = bvh_builder.build_bvh_arrays(
        centers, radii,
        np.asarray(planes.base), np.asarray(planes.u), np.asarray(planes.v),
        np.asarray(planes.ptype),
    )
    return T.Scene(spheres, planes, mats, None, bvh)


class TestScale500:
    def test_bvh_matches_brute(self):
        scene = _big_scene(500)
        g = np.random.default_rng(1)
        o = jnp.asarray(g.uniform(-25, 25, size=(128, 3)).astype(np.float32))
        d = jnp.asarray(g.normal(size=(128, 3)).astype(np.float32))
        rb = hm.hit_scene_brute(scene, o, d)
        rv = bt.hit_scene_bvh(scene, o, d)
        np.testing.assert_array_equal(np.asarray(rb.hit), np.asarray(rv.hit))
        both = np.asarray(rb.hit)
        np.testing.assert_allclose(
            np.asarray(rv.t)[both], np.asarray(rb.t)[both], rtol=1e-5
        )

    def test_render_small_frame(self):
        scene = _big_scene(500)
        cam = C.build_camera_data([0, -40, 10], [0, 0, 2], 16, 12, 50.0,
                                  background=(0.2, 0.3, 0.5))
        fb = np.asarray(
            renderer.render_frame(scene, cam, 16, 12, spp=1, max_depth=3,
                                  intersector="bvh", chunk=192)
        )
        assert np.isfinite(fb).all() and fb.max() > 0


class TestScale2K:
    def test_bvh_2000_spheres(self):
        scene = _big_scene(2000, seed=2)
        assert scene.bvh.left.shape[0] == 2 * 2001 - 1
        g = np.random.default_rng(3)
        o = jnp.asarray(g.uniform(-25, 25, size=(64, 3)).astype(np.float32))
        d = jnp.asarray(g.normal(size=(64, 3)).astype(np.float32))
        rb = hm.hit_scene_brute(scene, o, d)
        rv = bt.hit_scene_bvh(scene, o, d)
        np.testing.assert_array_equal(np.asarray(rb.hit), np.asarray(rv.hit))
        both = np.asarray(rb.hit)
        np.testing.assert_allclose(
            np.asarray(rv.t)[both], np.asarray(rb.t)[both], rtol=1e-5
        )
