"""Tests for the BVH: builder invariants and traversal vs brute force."""

import io

import numpy as np
import jax.numpy as jnp

from tracer.bvh import builder as bb
from tracer.bvh import traverse as bt
from tracer.render import hit as hm
from tracer.scene import builders, config


def _scene():
    params = config.read_scene_params(io.StringIO(config.smoke_config_text()))
    return builders.create_scene(params, with_bvh=True, texture_loader=lambda _: None)


class TestBuilder:
    def test_node_counts_and_structure(self):
        scene = _scene()
        bvh = scene.bvh
        n_prims = scene.num_spheres + scene.num_planes
        n = bvh.left.shape[0]
        assert n == 2 * n_prims - 1  # one-primitive leaves (bvh_builder.h:64)
        left = np.asarray(bvh.left)
        right = np.asarray(bvh.right)
        kind = np.asarray(bvh.kind)
        leaves = left < 0
        assert leaves.sum() == n_prims
        # every primitive appears exactly once in a leaf
        s_idx = sorted(right[leaves & (kind == 0)])
        p_idx = sorted(right[leaves & (kind == 1)])
        assert s_idx == list(range(scene.num_spheres))
        assert p_idx == list(range(scene.num_planes))
        # internal children point forward (preorder) and are in range
        internal = ~leaves
        assert (right[internal] > 0).all() and (right[internal] < n).all()
        assert (left[internal] > 0).all() and (left[internal] < n).all()
        ax = np.asarray(bvh.axis)
        assert ((ax >= 0) & (ax <= 2)).all()

    def test_tree_depth_and_stack_capacity(self):
        scene = _scene()
        bvh = scene.bvh
        d = bb.tree_depth(bvh.left, bvh.right)
        assert 1 <= d <= bt._stack_depth(bvh.left.shape[0])
        bb.check_stack_capacity(bvh.left, bvh.right)  # must not raise

    def test_stack_overflow_is_loud(self):
        # A pathological right-spine chain: depth = P, far beyond the
        # log-sized stack the traversal allocates. check_stack_capacity
        # must refuse it rather than let traversal drop pushes silently.
        import pytest

        p = 64
        n = 2 * p - 1
        left = np.full(n, -1, np.int32)
        right = np.zeros(n, np.int32)
        # internal nodes at even indices: left child = leaf (i+1),
        # right child = next internal (i+2) -> a depth-p right spine
        for i in range(0, n - 1, 2):
            left[i] = i + 1
            right[i] = i + 2
        assert bb.tree_depth(left, right) == p
        with pytest.raises(ValueError, match="stack capacity"):
            bb.check_stack_capacity(left, right)

    def test_degenerate_centroids_stay_balanced(self):
        # 257 coincident spheres: identical centroids are the classic
        # median-split worst case; the mid-index partition must still
        # produce a balanced (log-depth) tree that fits the stack.
        p = 257
        centers = np.zeros((p, 3), np.float32)
        radii = np.ones(p, np.float32)
        z3 = np.zeros((0, 3), np.float32)
        bvh = bb.build_bvh_arrays(centers, radii, z3, z3, z3,
                                  np.zeros(0, np.int32))
        d = bb.tree_depth(bvh.left, bvh.right)
        assert d <= bt._stack_depth(bvh.left.shape[0])

    def test_boxes_contain_children(self):
        scene = _scene()
        bvh = scene.bvh
        bmin = np.asarray(bvh.box_min)
        bmax = np.asarray(bvh.box_max)
        left = np.asarray(bvh.left)
        right = np.asarray(bvh.right)
        internal = left >= 0
        eps = 1e-5
        for node in np.where(internal)[0]:
            for ch in (left[node], right[node]):
                assert (bmin[node] <= bmin[ch] + eps).all()
                assert (bmax[node] >= bmax[ch] - eps).all()

    def test_empty(self):
        out = bb.build_bvh_numpy(
            np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32),
            np.zeros((0, 3), np.float32), np.zeros(0, np.int32), np.zeros(0, np.int32),
        )
        assert out[2].shape == (0,)


class TestTraversal:
    def test_matches_brute_force(self):
        scene = _scene()
        g = np.random.default_rng(0)
        o = jnp.asarray(g.normal(size=(512, 3), scale=10).astype(np.float32))
        d = jnp.asarray(g.normal(size=(512, 3)).astype(np.float32))
        rb = hm.hit_scene_brute(scene, o, d)
        rv = bt.hit_scene_bvh(scene, o, d)
        hb, hv = np.asarray(rb.hit), np.asarray(rv.hit)
        np.testing.assert_array_equal(hb, hv)
        both = hb & hv
        np.testing.assert_allclose(np.asarray(rv.t)[both], np.asarray(rb.t)[both], rtol=1e-5)
        np.testing.assert_array_equal(
            np.asarray(rv.material_idx)[both], np.asarray(rb.material_idx)[both]
        )
        np.testing.assert_allclose(
            np.asarray(rv.normal)[both], np.asarray(rb.normal)[both], atol=1e-5
        )

    def test_render_parity_with_brute(self):
        from tracer.render import camera as C, renderer

        scene = _scene()
        cam = C.build_camera_data([-15.0, 0.0, 4.5], [0.0, 4.5, 0.0], 24, 16, 90.0)
        fb_b = np.asarray(renderer.render_frame(scene, cam, 24, 16, spp=2, max_depth=4, intersector="brute", chunk=384))
        fb_v = np.asarray(
            renderer.render_frame(scene, cam, 24, 16, spp=2, max_depth=4, intersector="bvh", chunk=384)
        )
        np.testing.assert_allclose(fb_v, fb_b, atol=1e-4)


class TestNativeBuilder:
    def test_native_matches_numpy_invariants(self):
        from tracer.bvh import native

        if not native.available():
            import pytest

            pytest.skip("libtracer_bvh.so not built (make -C tracer/bvh/native)")
        g = np.random.default_rng(5)
        n = 300
        lo = g.normal(size=(n, 3)).astype(np.float32)
        hi = lo + g.uniform(0.1, 1, size=(n, 3)).astype(np.float32)
        cent = (lo + hi) / 2
        kind = (g.uniform(size=n) > 0.5).astype(np.int32)
        idx = np.arange(n, dtype=np.int32)
        out_c = native.build_bvh(lo, hi, cent, kind, idx)
        out_py = bb.build_bvh_numpy(lo, hi, cent, kind, idx)
        assert out_c[2].shape == out_py[2].shape == (2 * n - 1,)
        # same root box; same leaf multiset; child-containment on both
        np.testing.assert_allclose(out_c[0][0], out_py[0][0])
        np.testing.assert_allclose(out_c[1][0], out_py[1][0])
        for bmin, bmax, left, right, nkind, _ in (out_c, out_py):
            leaves = left < 0
            assert leaves.sum() == n
            assert sorted(right[leaves].tolist()) == sorted((idx[kind == 0].tolist() + idx[kind == 1].tolist()))
            for node in np.where(~leaves)[0][:80]:
                for ch in (left[node], right[node]):
                    assert (bmin[node] <= bmin[ch] + 1e-5).all()
                    assert (bmax[node] >= bmax[ch] - 1e-5).all()
