"""Megakernel parity: Pallas (interpret mode on CPU) vs XLA renderer.

The kernel consumes the identical wang_hash streams, so agreement is
near-exact (f32 reassociation only).
"""

import io
import os

import numpy as np
import pytest

from tracer.pallas import megakernel
from tracer.render import camera as C
from tracer.render import renderer
from tracer.scene import builders, config


def _scene():
    params = config.read_scene_params(io.StringIO(config.smoke_config_text()))
    return builders.create_scene(params, texture_loader=lambda _: None)


def _cam(w, h):
    return C.build_camera_data([-15.0, 0.0, 4.5], [0.0, 4.5, 0.0], w, h, 90.0)


@pytest.mark.parametrize("quirk", [True, False])
def test_megakernel_matches_xla(quirk):
    scene = _scene()
    w, h = 32, 8  # 256 pixels = 2 tiles
    cam = _cam(w, h)
    ref = np.asarray(
        renderer.render_frame(
            scene, cam, w, h, spp=2, max_depth=4, reference_quirk=quirk, chunk=256
        )
    )
    got = np.asarray(
        megakernel.render_frame_pallas(
            scene, cam, w, h, spp=2, max_depth=4, reference_quirk=quirk, interpret=True
        )
    )
    diff = np.abs(got - ref).max(axis=-1)
    assert (diff < 1e-3).mean() > 0.99, f"max {diff.max()}, frac {(diff < 1e-3).mean()}"


def test_megakernel_partial_tile():
    # 100 pixels: one partial tile — padding lanes must not pollute output
    scene = _scene()
    w, h = 20, 5
    cam = _cam(w, h)
    ref = np.asarray(renderer.render_frame(scene, cam, w, h, spp=1, max_depth=3, chunk=128))
    got = np.asarray(
        megakernel.render_frame_pallas(scene, cam, w, h, spp=1, max_depth=3, interpret=True)
    )
    diff = np.abs(got - ref).max(axis=-1)
    assert (diff < 1e-3).mean() > 0.98, f"max {diff.max()}"


def test_megakernel_big_texture_demand_paged():
    """Textures above MAX_TEX_DIM stay in HBM and are demand-paged in
    128x128 blocks through the in-kernel VMEM cache (round 2); results
    must match the XLA sampler on the same tex2D_cpu semantics."""
    import sys as _sys

    import jax.numpy as jnp

    _sys.path.insert(0, os.path.dirname(__file__))
    from test_parity import _full_scene

    scene, _ = _full_scene(with_texture=True)
    g = np.random.default_rng(7)
    big = megakernel.MAX_TEX_DIM  # 300 > cap in one dim, 520 in the other
    tex = g.uniform(0.1, 1.0, size=(1, big + 44, 2 * big + 8, 3)).astype(np.float32)
    scene = scene._replace(textures=jnp.asarray(tex))
    w, h = 16, 12
    cam = _cam(w, h)
    ref = np.asarray(renderer.render_frame(scene, cam, w, h, spp=2, max_depth=4, chunk=192))
    got = np.asarray(
        megakernel.render_frame_pallas(
            scene, cam, w, h, spp=2, max_depth=4, interpret=True
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.parametrize("cluster_k", [0, 8])
def test_megakernel_textured_matches_xla(cluster_k):
    """In-kernel bilinear texture fetch (one-hot matmuls) vs the XLA
    sampler — exact tex2D_cpu semantics on both sides."""
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(__file__))
    from test_parity import _full_scene

    scene, _ = _full_scene(with_texture=True)  # 8x8 texture on the floor metal
    w, h = 16, 12
    cam = _cam(w, h)
    ref = np.asarray(renderer.render_frame(scene, cam, w, h, spp=2, max_depth=4, chunk=192))
    got = np.asarray(
        megakernel.render_frame_pallas(
            scene, cam, w, h, spp=2, max_depth=4, interpret=True, cluster_k=cluster_k
        )
    )
    diff = np.abs(got - ref).max(axis=-1)
    assert (diff < 1e-3).mean() > 0.99, f"max {diff.max()}, frac {(diff < 1e-3).mean()}"


def test_diff_megakernel_grads_match_xla():
    """custom_vjp: pallas forward (interpret), XLA backward."""
    import jax
    import jax.numpy as jnp

    from tracer.pallas import diff as pdiff

    scene = _scene()
    w, h = 16, 8
    cam = _cam(w, h)

    def loss_pallas(albedo):
        s = scene._replace(materials=scene.materials._replace(albedo=albedo))
        fb = pdiff.render_frame_diff(s, cam, w, h, 2, 3, True)
        return jnp.sum(fb * fb)

    def loss_xla(albedo):
        s = scene._replace(materials=scene.materials._replace(albedo=albedo))
        fb = renderer.render_frame(s, cam, w, h, spp=2, max_depth=3, chunk=w * h)
        return jnp.sum(fb * fb)

    a0 = scene.materials.albedo
    v_p, g_p = jax.value_and_grad(loss_pallas)(a0)
    v_x, g_x = jax.value_and_grad(loss_xla)(a0)
    np.testing.assert_allclose(float(v_p), float(v_x), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("k", [8, 16])
def test_clustered_megakernel_matches_brute(k):
    scene = _scene()  # 94 spheres + 105 planes
    w, h = 32, 8
    cam = _cam(w, h)
    brute = np.asarray(
        megakernel.render_frame_pallas(scene, cam, w, h, spp=2, max_depth=4, interpret=True)
    )
    clus = np.asarray(
        megakernel.render_frame_pallas(
            scene, cam, w, h, spp=2, max_depth=4, interpret=True, cluster_k=k
        )
    )
    diff = np.abs(clus - brute).max(axis=-1)
    assert (diff < 1e-3).mean() > 0.99, f"max {diff.max()}, frac {(diff < 1e-3).mean()}"


def test_megakernel_sphere_only_scene():
    import jax.numpy as jnp
    from tracer.scene import types as T

    spheres = T.make_spheres([[0, 0, 1.0], [3, 3, 5.0]], [1.0, 2.0], [0, 1])
    mats = T.make_materials(
        [T.LAMBERTIAN, T.DIFFUSE_LIGHT], [0, 0], [1, 1], np.zeros((2, 3)),
        [[0.7, 0.3, 0.3], [0, 0, 0]], [[0, 0, 0], [8, 8, 8]], [-1, -1],
    )
    scene = T.Scene(spheres, T.empty_planes(), mats, None, None)
    cam = C.build_camera_data([4, -4, 2.5], [0, 0, 1], 16, 8, 60.0, background=(0.1, 0.1, 0.2))
    ref = np.asarray(renderer.render_frame(scene, cam, 16, 8, spp=2, max_depth=3, chunk=128))
    got = np.asarray(
        megakernel.render_frame_pallas(scene, cam, 16, 8, spp=2, max_depth=3, interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=1e-4)
    clus = np.asarray(
        megakernel.render_frame_pallas(
            scene, cam, 16, 8, spp=2, max_depth=3, interpret=True, cluster_k=8
        )
    )
    np.testing.assert_allclose(clus, ref, atol=1e-4)


@pytest.mark.parametrize("tile_px", [128, 1024])
def test_tile_sizes_agree(tile_px):
    scene = _scene()
    w, h = 40, 30  # 1200 px: crosses the 1024-tile boundary
    cam = _cam(w, h)
    ref = np.asarray(renderer.render_frame(scene, cam, w, h, spp=1, max_depth=3, chunk=1200))
    got = np.asarray(
        megakernel.render_frame_pallas(
            scene, cam, w, h, spp=1, max_depth=3, interpret=True, tile_px=tile_px
        )
    )
    diff = np.abs(got - ref).max(axis=-1)
    assert (diff < 1e-3).mean() > 0.99, f"tile {tile_px}: max {diff.max()}"


def test_stratified_megakernel_matches_xla():
    scene = _scene()
    w, h = 16, 8
    cam = _cam(w, h)
    ref = np.asarray(
        renderer.render_frame(scene, cam, w, h, spp=4, max_depth=3, chunk=128, stratify=True)
    )
    got = np.asarray(
        megakernel.render_frame_pallas(
            scene, cam, w, h, spp=4, max_depth=3, interpret=True, stratify=True
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_clustered_megakernel_500_spheres():
    """Packet culling at scale: 500-sphere scene vs the XLA renderer."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_scale import _big_scene

    scene = _big_scene(500)._replace(bvh=None)
    w, h = 16, 8
    cam = C.build_camera_data([0, -40, 10], [0, 0, 2], w, h, 50.0, background=(0.2, 0.3, 0.5))
    ref = np.asarray(renderer.render_frame(scene, cam, w, h, spp=1, max_depth=3, chunk=128))
    got = np.asarray(
        megakernel.render_frame_pallas(
            scene, cam, w, h, spp=1, max_depth=3, interpret=True, cluster_k=16
        )
    )
    diff = np.abs(got - ref).max(axis=-1)
    assert (diff < 1e-3).mean() > 0.99, f"max {diff.max()}"


def test_sample_major_matches_default():
    scene = _scene()
    w, h = 40, 30
    cam = _cam(w, h)
    ref = np.asarray(
        megakernel.render_frame_pallas(scene, cam, w, h, spp=5, max_depth=4, interpret=True, tile_px=128)
    )
    got = np.asarray(
        megakernel.render_frame_pallas(
            scene, cam, w, h, spp=5, max_depth=4, interpret=True, tile_px=128, sample_block=8
        )
    )
    # same per-sample streams, different accumulation order
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("tile_px", [128, 1024])
def test_persistent_matches_sample_loop(tile_px):
    # Per-lane path regeneration (round 2) must be BIT-identical to the
    # round-1 per-sample loop: same RNG streams (seeds depend only on
    # (pixel, sample)) and same f32 summation grouping (per-sample final
    # folds into acc at sample end).
    scene = _scene()
    w, h = 36, 7  # 252 px: partial tiles in both tile sizes
    cam = _cam(w, h)
    base = np.asarray(
        megakernel.render_frame_pallas(
            scene, cam, w, h, spp=3, max_depth=4, interpret=True,
            persistent=False, tile_px=128,
        )
    )
    got = np.asarray(
        megakernel.render_frame_pallas(
            scene, cam, w, h, spp=3, max_depth=4, interpret=True,
            persistent=True, tile_px=tile_px,
        )
    )
    np.testing.assert_array_equal(got, base)


def test_lane_major_matches_default():
    # Round-5 closed experiment (kept tested): the (1, tile_px)
    # lane-major layout must be BIT-identical to the default
    # (tile_px//128, 128) sublane-major persistent kernel — same RNG
    # streams, same summation grouping. (Measured slower on v5e: wide
    # tiles wait on their slowest lane's total budget; see the
    # render_frame_pallas docstring.)
    scene = _scene()
    w, h = 36, 7
    cam = _cam(w, h)
    base = np.asarray(
        megakernel.render_frame_pallas(
            scene, cam, w, h, spp=3, max_depth=4, interpret=True,
        )
    )
    got = np.asarray(
        megakernel.render_frame_pallas(
            scene, cam, w, h, spp=3, max_depth=4, interpret=True,
            tile_px=512, lane_major=True,
        )
    )
    np.testing.assert_array_equal(got, base)


def test_interleave_matches_default():
    # Round-5 closed experiment (kept tested): interleave=G splits the
    # tile's spp into G independent sample-stream groups advanced in one
    # loop body. Same streams and estimator; only the f32 accumulation
    # grouping differs (per-group sums combined at the end). Measured
    # slower on v5e — see the render_frame_pallas docstring.
    scene = _scene()
    w, h = 36, 7
    cam = _cam(w, h)
    base = np.asarray(
        megakernel.render_frame_pallas(
            scene, cam, w, h, spp=4, max_depth=4, interpret=True,
        )
    )
    for g in (2, 4):
        got = np.asarray(
            megakernel.render_frame_pallas(
                scene, cam, w, h, spp=4, max_depth=4, interpret=True,
                interleave=g,
            )
        )
        np.testing.assert_allclose(got, base, rtol=1e-6, atol=1e-6)


def test_persistent_stratified_matches_sample_loop():
    scene = _scene()
    w, h = 32, 8
    cam = _cam(w, h)
    base = np.asarray(
        megakernel.render_frame_pallas(
            scene, cam, w, h, spp=4, max_depth=3, interpret=True,
            persistent=False, tile_px=128, stratify=True,
        )
    )
    got = np.asarray(
        megakernel.render_frame_pallas(
            scene, cam, w, h, spp=4, max_depth=3, interpret=True,
            persistent=True, tile_px=1024, stratify=True,
        )
    )
    np.testing.assert_array_equal(got, base)


def test_culled_matches_legacy_clustered():
    """The round-2 demand-driven culled intersector must reproduce the
    legacy per-cluster-cond path exactly (same tables, same winner
    tie-breaks) — and run under the persistent kernel."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_scale import _big_scene

    scene = _big_scene(300)._replace(bvh=None)
    w, h = 32, 8
    cam = C.build_camera_data([0, -40, 10], [0, 0, 2], w, h, 50.0,
                              background=(0.2, 0.3, 0.5))
    legacy = np.asarray(
        megakernel.render_frame_pallas(
            scene, cam, w, h, spp=2, max_depth=3, interpret=True,
            cluster_k=16, culled=False, persistent=False,
        )
    )
    for pers in (False, True):
        got = np.asarray(
            megakernel.render_frame_pallas(
                scene, cam, w, h, spp=2, max_depth=3, interpret=True,
                cluster_k=16, culled=True, persistent=pers, cull_group=3,
            )
        )
        np.testing.assert_array_equal(got, legacy)


def test_culled_matches_legacy_with_padding_clusters():
    """Cluster count NOT divisible by 8: the padded demand rows carry
    empty (lo=+inf, hi=-inf) boxes that the slab test would classify
    VISIBLE (per-axis min/max erases the inversion), making the loop
    visit out-of-range cluster ids and corrupt the image (advisor
    round-2 high finding). 30 spheres at k=16 -> 2 or 3 real clusters in
    an 8-row padded demand table."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_scale import _big_scene

    scene = _big_scene(30)._replace(bvh=None)
    w, h = 32, 8
    cam = C.build_camera_data([0, -40, 10], [0, 0, 2], w, h, 50.0,
                              background=(0.2, 0.3, 0.5))
    legacy = np.asarray(
        megakernel.render_frame_pallas(
            scene, cam, w, h, spp=2, max_depth=3, interpret=True,
            cluster_k=16, culled=False, persistent=False,
        )
    )
    got = np.asarray(
        megakernel.render_frame_pallas(
            scene, cam, w, h, spp=2, max_depth=3, interpret=True,
            cluster_k=16, culled=True, persistent=False, cull_group=3,
        )
    )
    np.testing.assert_array_equal(got, legacy)


def test_record_with_big_texture():
    """Recording forward + HBM demand-paged texture compose (both extra
    output and texture scratch are live in one kernel)."""
    import sys as _sys

    import jax.numpy as jnp

    _sys.path.insert(0, os.path.dirname(__file__))
    from test_parity import _full_scene

    scene, _ = _full_scene(with_texture=True)
    g = np.random.default_rng(7)
    tex = g.uniform(0.1, 1.0, size=(1, 300, 520, 3)).astype(np.float32)
    scene = scene._replace(textures=jnp.asarray(tex))
    w, h = 32, 16
    cam = _cam(w, h)
    plain = np.asarray(
        megakernel.render_frame_pallas(
            scene, cam, w, h, 2, 4, interpret=True, persistent=False, tile_px=128
        )
    )
    fb, idx, tex = megakernel.render_frame_pallas_record(
        scene, cam, w, h, 2, 4, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(fb), plain)
    assert tex.shape == (2, 4, w * h, 3)

    from tracer.pallas import replay

    # replay via the recorded texture-multiplier tape (no gathers): must
    # reproduce the kernel radiance
    rep_t = np.asarray(replay.render_frame_replay(
        scene, cam, idx, w, h, 2, 4, tex_tape=tex))
    np.testing.assert_allclose(rep_t, np.asarray(fb), atol=1e-5)

    # replay via live texture sampling must agree too (the tape records
    # exactly what the sampler computes)
    rep = np.asarray(replay.render_frame_replay(scene, cam, idx, w, h, 2, 4))
    np.testing.assert_allclose(rep, np.asarray(fb), atol=1e-5)


class TestRussianRoulette:
    """Opt-in throughput RR (rr_start): engine parity + unbiasedness."""

    def test_megakernel_matches_xla_with_rr(self):
        scene = _scene()
        w, h = 32, 8
        cam = _cam(w, h)
        ref = np.asarray(renderer.render_frame(
            scene, cam, w, h, spp=2, max_depth=8, chunk=256, rr_start=2))
        got = np.asarray(megakernel.render_frame_pallas(
            scene, cam, w, h, spp=2, max_depth=8, interpret=True, rr_start=2))
        diff = np.abs(got - ref).max(axis=-1)
        assert (diff < 1e-3).mean() > 0.99, f"max {diff.max()}"

    def test_rr_sample_loop_matches_persistent(self):
        scene = _scene()
        w, h = 32, 8
        cam = _cam(w, h)
        a = np.asarray(megakernel.render_frame_pallas(
            scene, cam, w, h, spp=2, max_depth=8, interpret=True,
            rr_start=2, persistent=True))
        b = np.asarray(megakernel.render_frame_pallas(
            scene, cam, w, h, spp=2, max_depth=8, interpret=True,
            rr_start=2, persistent=False))
        np.testing.assert_array_equal(a, b)

    def test_rr_unbiased(self):
        """RR keeps the estimator unbiased: the frame MEAN with roulette
        converges to the plain mean (per-pixel values differ — the
        estimator is randomized — but the expectation is identical)."""
        scene = _scene()
        w, h, spp = 24, 16, 64
        cam = _cam(w, h)
        plain = np.asarray(renderer.render_frame(
            scene, cam, w, h, spp=spp, max_depth=10, chunk=w * h))
        rr = np.asarray(renderer.render_frame(
            scene, cam, w, h, spp=spp, max_depth=10, chunk=w * h, rr_start=2))
        m0, m1 = plain.mean() / spp, rr.mean() / spp
        assert abs(m1 - m0) / max(m0, 1e-6) < 0.05, (m0, m1)


class TestSampleMajorPersistent:
    """sample_block > 1 with persistent=True: ps0 concurrent samples of
    the same 128 pixels per tile, per-row intersection, (ps0, 128)
    shading. Same per-sample radiance paths as every other engine; only
    the final per-pixel f32 summation grouping differs (cross-sublane
    fold), hence tolerance rather than bit parity."""

    @pytest.mark.parametrize("spp", [8, 6, 16])
    def test_matches_xla(self, spp):
        scene = _scene()
        w, h = 32, 8
        cam = _cam(w, h)
        ref = np.asarray(renderer.render_frame(
            scene, cam, w, h, spp=spp, max_depth=4, chunk=256))
        got = np.asarray(megakernel.render_frame_pallas(
            scene, cam, w, h, spp=spp, max_depth=4, interpret=True,
            sample_block=8, persistent=True))
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-5)

    def test_partial_tile_and_rr(self):
        scene = _scene()
        w, h = 20, 5  # 100 pixels: padding lanes must stay silent
        cam = _cam(w, h)
        ref = np.asarray(renderer.render_frame(
            scene, cam, w, h, spp=8, max_depth=6, chunk=128, rr_start=2))
        got = np.asarray(megakernel.render_frame_pallas(
            scene, cam, w, h, spp=8, max_depth=6, interpret=True,
            sample_block=8, persistent=True, rr_start=2))
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-5)

    def test_stratified(self):
        scene = _scene()
        w, h = 32, 8
        cam = _cam(w, h)
        ref = np.asarray(megakernel.render_frame_pallas(
            scene, cam, w, h, spp=16, max_depth=4, interpret=True,
            stratify=True, persistent=True))
        got = np.asarray(megakernel.render_frame_pallas(
            scene, cam, w, h, spp=16, max_depth=4, interpret=True,
            stratify=True, sample_block=8, persistent=True))
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-5)


class TestNoFarProof:
    """fast_math drops the sphere far root ONLY when the static proof
    holds (no dielectric, pairwise non-overlapping spheres clear of all
    planes, camera outside); the optimized render must match the
    far-root render on such scenes."""

    def _separated_scene(self, extra_mtype=None):
        import numpy as np

        from tracer.scene import types as T

        g = np.random.default_rng(7)
        n = 24
        radii = g.uniform(0.3, 0.8, size=(n,)).astype(np.float32)
        gx, gy = np.meshgrid(np.arange(6), np.arange(4), indexing="ij")
        cell = np.stack([gx.ravel() * 2.0 - 5.0, gy.ravel() * 2.0 - 3.0], -1)
        centers = np.zeros((n, 3), np.float32)
        centers[:, :2] = cell + g.uniform(-1, 1, (n, 2)) * (1.0 - radii - 0.02)[:, None]
        centers[:, 2] = radii + 0.05 + g.uniform(0, 2, n)
        mtypes = [T.LAMBERTIAN, T.METAL, T.DIFFUSE_LIGHT]
        if extra_mtype is not None:
            mtypes.append(extra_mtype)
        m = len(mtypes)
        mats = T.make_materials(
            mtype=np.asarray(mtypes, np.int32),
            fuzz=np.zeros(m, np.float32), ir=np.ones(m, np.float32),
            absorption=np.zeros((m, 3), np.float32),
            albedo=np.tile(np.float32([0.6, 0.5, 0.4]), (m, 1)),
            emit=np.float32([[0, 0, 0], [0, 0, 0], [7, 7, 7]] + [[0, 0, 0]] * (m - 3)),
            tex_id=np.full(m, -1, np.int32),
        )
        planes = T.make_planes(
            np.asarray([T.QUAD], np.int32), np.float32([[-10, -10, 0]]),
            np.float32([[20, 0, 0]]), np.float32([[0, 20, 0]]),
            np.asarray([0], np.int32),
        )
        spheres = T.make_spheres(centers, radii, (np.arange(n) % 3).astype(np.int32))
        return T.Scene(spheres, planes, mats, None, None)

    def test_proof_gating(self):
        from tracer.scene import types as T

        cam = _cam(16, 8)
        assert megakernel._interior_free(self._separated_scene(), cam)
        # an (unused) dielectric material in the table disables the proof
        assert not megakernel._interior_free(
            self._separated_scene(extra_mtype=T.DIELECTRIC), cam)

    def test_no_far_image_unchanged(self):
        w, h = 32, 8
        cam = _cam(w, h)
        safe = self._separated_scene()
        from tracer.scene import types as T

        unsafe = self._separated_scene(extra_mtype=T.DIELECTRIC)  # same geometry
        a = np.asarray(megakernel.render_frame_pallas(
            safe, cam, w, h, spp=4, max_depth=6, interpret=True, fast_math=True))
        b = np.asarray(megakernel.render_frame_pallas(
            unsafe, cam, w, h, spp=4, max_depth=6, interpret=True, fast_math=True))
        d = np.abs(a - b).max(axis=-1)
        assert (d < 1e-4).mean() > 0.99, f"max {d.max()}"
