"""Gradient correctness: jax.grad vs central finite differences.

SURVEY.md §7 stage 6 / BASELINE.md gradient-parity gate: pixel losses
must backpropagate to sphere centers/radii, material albedo/fuzz/ir/
absorption/emit, and camera parameters. Finite differences are computed
with the SAME renderer (straight-through convention: discrete decisions
— hit selection, RNG gates — are fixed; at these scene params no gate
flips within +-h, so FD and AD see the same smooth branch).
"""

import numpy as np
import jax
import jax.numpy as jnp

from tracer.render import camera as C
from tracer.render import renderer
from tracer.scene import types as T

W, H, SPP, DEPTH = 12, 8, 2, 4


def _scene(center_z=1.0, radius=1.0, albedo=(0.7, 0.3, 0.3), emit=(6.0, 5.0, 4.0),
           fuzz=0.25, ir=1.5, absorption=(0.3, 0.5, 0.1)):
    spheres = T.make_spheres(
        [[0.0, 0.0, center_z], [2.2, 0.0, 1.0], [-2.2, 0.0, 1.0], [0.0, 2.5, 4.0]],
        [radius, 1.0, 1.0, 1.0],
        [0, 1, 2, 3],
    )
    planes = T.make_planes([T.QUAD], [[-8, -8, 0]], [[16, 0, 0]], [[0, 16, 0]], [4])
    mats = T.make_materials(
        mtype=[T.LAMBERTIAN, T.METAL, T.DIELECTRIC, T.DIFFUSE_LIGHT, T.LAMBERTIAN],
        fuzz=[0.0, fuzz, 0.0, 0.0, 0.0],
        ir=[1.0, 1.0, ir, 1.0, 1.0],
        absorption=[[0, 0, 0], [0, 0, 0], list(absorption), [0, 0, 0], [0, 0, 0]],
        albedo=[list(albedo), [0.8, 0.8, 0.9], [1, 1, 1], [0, 0, 0], [0.5, 0.5, 0.5]],
        emit=[[0, 0, 0], [0, 0, 0], [0, 0, 0], list(emit), [0, 0, 0]],
        tex_id=[-1] * 5,
    )
    return T.Scene(spheres, planes, mats, None, None)


CAM = None


def _cam():
    global CAM
    if CAM is None:
        CAM = C.build_camera_data([5.0, -6.0, 3.0], [0.0, 0.0, 1.0], W, H, 55.0,
                                  background=(0.05, 0.07, 0.1))
    return CAM


def _loss_fb(scene, cam=None):
    fb = renderer.render_frame(scene, cam or _cam(), W, H, spp=SPP, max_depth=DEPTH, chunk=W * H)
    return jnp.sum(fb * fb) / (W * H * SPP)


def _fd_check(param_get, param_set, h, rtol=0.08, atol=2e-3, name=""):
    """Compare AD grad vs central differences on a scalar parameter."""
    scene = _scene()

    def loss_of(v):
        return _loss_fb(param_set(scene, v))

    v0 = param_get(scene)
    g_ad = jax.grad(loss_of)(v0)
    g_fd = (loss_of(v0 + h) - loss_of(v0 - h)) / (2 * h)
    g_ad, g_fd = float(g_ad), float(g_fd)
    assert np.isfinite(g_ad) and np.isfinite(g_fd), name
    if abs(g_fd) < 5 * atol:  # tiny/zero gradient: absolute check
        assert abs(g_ad - g_fd) < 10 * atol, f"{name}: ad={g_ad} fd={g_fd}"
    else:
        assert abs(g_ad - g_fd) <= rtol * abs(g_fd) + atol, f"{name}: ad={g_ad} fd={g_fd}"


class TestSceneGradients:
    def test_sphere_center_z(self):
        _fd_check(
            lambda s: s.spheres.center[0, 2],
            lambda s, v: s._replace(spheres=s.spheres._replace(center=s.spheres.center.at[0, 2].set(v))),
            h=2e-3,
            name="center_z",
        )

    def test_sphere_radius(self):
        _fd_check(
            lambda s: s.spheres.radius[0],
            lambda s, v: s._replace(spheres=s.spheres._replace(radius=s.spheres.radius.at[0].set(v))),
            h=2e-3,
            name="radius",
        )

    def test_albedo(self):
        _fd_check(
            lambda s: s.materials.albedo[0, 0],
            lambda s, v: s._replace(materials=s.materials._replace(albedo=s.materials.albedo.at[0, 0].set(v))),
            h=1e-3,
            name="albedo",
        )

    def test_emit(self):
        _fd_check(
            lambda s: s.materials.emit[3, 1],
            lambda s, v: s._replace(materials=s.materials._replace(emit=s.materials.emit.at[3, 1].set(v))),
            h=1e-2,
            name="emit",
        )

    def test_metal_fuzz(self):
        _fd_check(
            lambda s: s.materials.fuzz[1],
            lambda s, v: s._replace(materials=s.materials._replace(fuzz=s.materials.fuzz.at[1].set(v))),
            h=2e-3,
            name="fuzz",
        )

    def test_dielectric_absorption(self):
        _fd_check(
            lambda s: s.materials.absorption[2, 1],
            lambda s, v: s._replace(materials=s.materials._replace(absorption=s.materials.absorption.at[2, 1].set(v))),
            h=2e-3,
            name="absorption",
        )

    def test_camera_origin(self):
        scene = _scene()
        cam = _cam()

        def loss_of(v):
            c = cam._replace(origin=cam.origin.at[0].set(v))
            # the viewport basis depends on origin too — rebuild from scratch
            c2 = C.build_camera_data(
                jnp.stack([v, cam.origin[1], cam.origin[2]]),
                [0.0, 0.0, 1.0], W, H, 55.0, background=(0.05, 0.07, 0.1),
            )
            return _loss_fb(scene, c2)

        v0 = cam.origin[0]
        g_ad = float(jax.grad(loss_of)(v0))
        h = 2e-3
        g_fd = float((loss_of(v0 + h) - loss_of(v0 - h)) / (2 * h))
        assert np.isfinite(g_ad)
        assert abs(g_ad - g_fd) <= 0.1 * abs(g_fd) + 5e-3, f"ad={g_ad} fd={g_fd}"

    def test_full_scene_pytree_grads_finite(self):
        scene = _scene()
        _, grads = jax.value_and_grad(_loss_fb, allow_int=True)(scene)
        for leaf in jax.tree_util.tree_leaves(grads):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                assert np.isfinite(np.asarray(leaf)).all()


class TestReplayVJP:
    """Round-2 fast backward: record-forward + gather-replay VJP
    (tracer.pallas.replay) must agree with the remat oracle."""

    def test_replay_reproduces_recorded_forward(self):
        from tracer.pallas import megakernel, replay

        scene = _scene()
        fb, idx = megakernel.render_frame_pallas_record(
            scene, _cam(), W, H, SPP, DEPTH, interpret=True
        )
        fb_rep = replay.render_frame_replay(scene, _cam(), idx, W, H, SPP, DEPTH)
        # same streams and branches; only ulp-level f32 phrasing differs
        np.testing.assert_allclose(np.asarray(fb_rep), np.asarray(fb), atol=1e-6)

    def test_persistent_record_matches_sample_loop_tape(self):
        """The persistent kernel's scatter-recorded tape must agree with
        the sample-loop tape on every live bounce (dead-lane slots are -1
        in persistent mode vs garbage in sample-loop mode; the replay
        masks both), and replay radiance must be identical."""
        from tracer.pallas import megakernel, replay

        scene = _scene()
        fb_s, idx_s = megakernel.render_frame_pallas_record(
            scene, _cam(), W, H, SPP, DEPTH, interpret=True, persistent=False
        )
        fb_p, idx_p = megakernel.render_frame_pallas_record(
            scene, _cam(), W, H, SPP, DEPTH, interpret=True, persistent=True
        )
        np.testing.assert_array_equal(np.asarray(fb_s), np.asarray(fb_p))
        a, b = np.asarray(idx_s), np.asarray(idx_p)
        live = b != -1
        assert live.any()
        np.testing.assert_array_equal(a[live], b[live])
        r_s = replay.render_frame_replay(scene, _cam(), idx_s, W, H, SPP, DEPTH)
        r_p = replay.render_frame_replay(scene, _cam(), idx_p, W, H, SPP, DEPTH)
        np.testing.assert_array_equal(np.asarray(r_s), np.asarray(r_p))

    def test_replay_grads_match_remat(self):
        from tracer.pallas import diff as pdiff

        scene = _scene()

        def loss(scene, mode):
            fb = pdiff.render_frame_diff(scene, _cam(), W, H, SPP, DEPTH,
                                         mode=mode)
            return jnp.sum(fb * fb) / (W * H * SPP)

        g_rep = jax.grad(lambda s: loss(s, "replay"), allow_int=True)(scene)
        g_rem = jax.grad(lambda s: loss(s, "remat"), allow_int=True)(scene)
        for a, b in zip(jax.tree_util.tree_leaves(g_rep),
                        jax.tree_util.tree_leaves(g_rem)):
            if jnp.issubdtype(a.dtype, jnp.floating):
                an, bn = np.asarray(a), np.asarray(b)
                tol = 1e-5 * max(1.0, float(np.abs(bn).max()))
                np.testing.assert_allclose(an, bn, atol=tol, rtol=1e-4)

    def test_rr_record_replay(self):
        """rr_start composes with record/replay (round 3): the recorded
        forward with RR must match the plain RR forward, the replay must
        reproduce it (kill decisions recomputed from the streams, never
        misread as background misses), and replay gradients must match
        the remat oracle differentiating the same RR estimator."""
        from tracer.pallas import diff as pdiff
        from tracer.pallas import megakernel, replay

        scene = _scene()
        rr = 2
        plain = megakernel.render_frame_pallas(
            scene, _cam(), W, H, SPP, DEPTH, interpret=True, rr_start=rr
        )
        fb, idx = megakernel.render_frame_pallas_record(
            scene, _cam(), W, H, SPP, DEPTH, interpret=True, rr_start=rr
        )
        np.testing.assert_array_equal(np.asarray(fb), np.asarray(plain))
        norr = megakernel.render_frame_pallas(
            scene, _cam(), W, H, SPP, DEPTH, interpret=True
        )
        assert not np.array_equal(np.asarray(plain), np.asarray(norr)), \
            "rr_start must actually kill paths at this depth"
        fb_rep = replay.render_frame_replay(
            scene, _cam(), idx, W, H, SPP, DEPTH, rr_start=rr
        )
        np.testing.assert_allclose(np.asarray(fb_rep), np.asarray(fb), atol=1e-5)

        def loss(scene, mode):
            fbd = pdiff.render_frame_diff(scene, _cam(), W, H, SPP, DEPTH,
                                          mode=mode, rr_start=rr)
            return jnp.sum(fbd * fbd) / (W * H * SPP)

        g_rep = jax.grad(lambda s: loss(s, "replay"), allow_int=True)(scene)
        g_rem = jax.grad(lambda s: loss(s, "remat"), allow_int=True)(scene)
        for a, b in zip(jax.tree_util.tree_leaves(g_rep),
                        jax.tree_util.tree_leaves(g_rem)):
            if jnp.issubdtype(a.dtype, jnp.floating):
                an, bn = np.asarray(a), np.asarray(b)
                tol = 1e-5 * max(1.0, float(np.abs(bn).max()))
                np.testing.assert_allclose(an, bn, atol=tol, rtol=1e-4)


class TestTexturedReplayGrads:
    def test_textured_replay_grads_match_remat(self):
        """Textured scene: replay-VJP gradients (texture multipliers from
        the recorded tape, texture IMAGE stop-gradded) must match the
        remat oracle on every leaf except the texture image itself."""
        import jax
        import jax.numpy as jnp

        from tracer.pallas import diff as pdiff

        scene = _scene()
        g = np.random.default_rng(5)
        tex = g.uniform(0.2, 1.0, size=(1, 40, 56, 3)).astype(np.float32)
        mats = scene.materials
        tex_id = np.asarray(mats.tex_id).copy()
        tex_id[0] = 0  # first material textured
        scene = scene._replace(
            textures=jnp.asarray(tex),
            materials=mats._replace(tex_id=jnp.asarray(tex_id)),
        )

        def loss(scene, mode):
            fb = pdiff.render_frame_diff(scene, _cam(), W, H, SPP, DEPTH,
                                         mode=mode)
            return jnp.mean(fb * fb)

        g_rep = jax.grad(lambda s: loss(s, "replay"), allow_int=True)(scene)
        g_smp = jax.grad(lambda s: loss(s, "replay-sample"), allow_int=True)(scene)
        g_rem = jax.grad(lambda s: loss(s, "remat"), allow_int=True)(scene)
        # material gradients: exact in BOTH replay modes
        for g_fast in (g_rep, g_smp):
            np.testing.assert_allclose(
                np.asarray(g_fast.materials.albedo),
                np.asarray(g_rem.materials.albedo), rtol=1e-4, atol=1e-7)
        # geometry gradients: the sampling replay keeps the d(texel)/d(uv)
        # term and matches the oracle; the tape replay freezes the texel
        # (documented approximation) so only the sampling mode is pinned
        np.testing.assert_allclose(
            np.asarray(g_smp.spheres.center), np.asarray(g_rem.spheres.center),
            rtol=1e-4, atol=1e-6)
        # the texture image gradient is deliberately stopped in replay
        assert float(np.abs(np.asarray(g_rep.textures)).max()) == 0.0
        assert float(np.abs(np.asarray(g_smp.textures)).max()) == 0.0
        assert float(np.abs(np.asarray(g_rem.textures)).max()) > 0.0


class TestMaskedBranchNaN:
    def test_refract_grad_finite_at_exact_grazing(self):
        """ir=1 + grazing incidence makes refract's sqrt argument exactly
        0; the masked-out dielectric branch then multiplies a REAL zero
        cotangent into the infinite sqrt derivative (0*inf = NaN), which
        poisoned every geometry gradient at high ray counts until the
        gradient-safe sqrt. Pin the mechanism directly."""
        from tracer.core import vec

        uv = jnp.asarray([[1.0, 0.0, 0.0]])  # perpendicular to n: grazing
        n = jnp.asarray([[0.0, 0.0, 1.0]])

        def f(ir):
            out = vec.refract(uv, n, ir)
            # masked-out consumer: the where VJP sends a real zero
            # cotangent through refract
            masked = jnp.where(jnp.zeros((1, 1), bool), out, 0.0)
            return jnp.sum(masked) + 0.0 * jnp.sum(out)

        g = jax.grad(f)(jnp.float32(1.0))
        assert np.isfinite(float(g)), g

    def test_length_grad_finite_at_zero(self):
        from tracer.core import vec

        def f(v):
            return jnp.sum(jnp.where(False, vec.length(v), 0.0))

        g = jax.grad(f)(jnp.zeros((4, 3), jnp.float32))
        assert np.isfinite(np.asarray(g)).all()


class TestKernelBackward:
    """Round-3 fused Pallas backward (tracer.pallas.bwd): the whole
    gradient step in one kernel must reproduce the XLA replay's
    gradients (same tape, same gradient definition) on every leaf."""

    def _cmp(self, g_k, g_r, atol_scale=1e-5):
        for a, b in zip(jax.tree_util.tree_leaves(g_k),
                        jax.tree_util.tree_leaves(g_r)):
            if jnp.issubdtype(a.dtype, jnp.floating):
                an, bn = np.asarray(a), np.asarray(b)
                tol = atol_scale * max(1.0, float(np.abs(bn).max()))
                np.testing.assert_allclose(an, bn, atol=tol, rtol=1e-4)

    def test_scene_grads_match_replay(self):
        from tracer.pallas import diff as pdiff

        scene = _scene()

        def loss(scene, mode):
            fb = pdiff.render_frame_diff(scene, _cam(), W, H, SPP, DEPTH,
                                         mode=mode)
            return jnp.sum(fb * fb) / (W * H * SPP)

        g_k = jax.grad(lambda s: loss(s, "replay-kernel"), allow_int=True)(scene)
        g_r = jax.grad(lambda s: loss(s, "replay"), allow_int=True)(scene)
        self._cmp(g_k, g_r)

    def test_camera_grads_match_replay(self):
        from tracer.pallas import diff as pdiff

        scene = _scene()

        def loss(cam, mode):
            fb = pdiff.render_frame_diff(scene, cam, W, H, SPP, DEPTH,
                                         mode=mode)
            return jnp.sum(fb * fb) / (W * H * SPP)

        g_k = jax.grad(lambda c: loss(c, "replay-kernel"))(_cam())
        g_r = jax.grad(lambda c: loss(c, "replay"))(_cam())
        self._cmp(g_k, g_r)

    def test_rr_grads_match_replay(self):
        from tracer.pallas import diff as pdiff

        scene = _scene()

        def loss(scene, mode):
            fb = pdiff.render_frame_diff(scene, _cam(), W, H, SPP, DEPTH,
                                         mode=mode, rr_start=2)
            return jnp.sum(fb * fb) / (W * H * SPP)

        g_k = jax.grad(lambda s: loss(s, "replay-kernel"), allow_int=True)(scene)
        g_r = jax.grad(lambda s: loss(s, "replay"), allow_int=True)(scene)
        self._cmp(g_k, g_r)

    def test_textured_grads_match_replay(self):
        from tracer.pallas import diff as pdiff

        scene = _scene()
        g = np.random.default_rng(5)
        tex = g.uniform(0.2, 1.0, size=(1, 40, 56, 3)).astype(np.float32)
        mats = scene.materials
        tex_id = np.asarray(mats.tex_id).copy()
        tex_id[0] = 0
        scene = scene._replace(
            textures=jnp.asarray(tex),
            materials=mats._replace(tex_id=jnp.asarray(tex_id)),
        )

        def loss(scene, mode, texture_grads=False):
            fb = pdiff.render_frame_diff(scene, _cam(), W, H, SPP, DEPTH,
                                         mode=mode,
                                         texture_grads=texture_grads)
            return jnp.mean(fb * fb)

        g_k = jax.grad(lambda s: loss(s, "replay-kernel"), allow_int=True)(scene)
        g_r = jax.grad(lambda s: loss(s, "replay"), allow_int=True)(scene)
        g_s = jax.grad(lambda s: loss(s, "replay-sample"), allow_int=True)(scene)
        # material gradients: all tape modes agree exactly
        np.testing.assert_allclose(
            np.asarray(g_k.materials.albedo), np.asarray(g_r.materials.albedo),
            rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(g_k.materials.emit), np.asarray(g_r.materials.emit),
            rtol=1e-4, atol=1e-6)
        # geometry gradients (round 4): the kernel's 9-field tape
        # linearizes the texel around the recorded hit, so it keeps the
        # d(texel)/d(uv) term — it must match the SAMPLING replay (which
        # has the term live), NOT the frozen 3-field XLA replay
        np.testing.assert_allclose(
            np.asarray(g_k.spheres.center), np.asarray(g_s.spheres.center),
            rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(g_k.planes.base), np.asarray(g_s.planes.base),
            rtol=1e-4, atol=1e-6)
        # default (texture_grads=False): the tape freezes the texture
        # IMAGE — its cotangent is identically zero in both tape modes
        assert float(np.abs(np.asarray(g_k.textures)).max()) == 0.0
        # opt-in texture_grads=True: the 13-field tape routes exact
        # cotangents to the texture pixels — must match the remat oracle
        # (the only other mode with texture-image gradients)
        g_kt = jax.grad(
            lambda s: loss(s, "replay-kernel", texture_grads=True),
            allow_int=True)(scene)
        g_rem = jax.grad(lambda s: loss(s, "remat"), allow_int=True)(scene)
        assert float(np.abs(np.asarray(g_rem.textures)).max()) > 0.0
        np.testing.assert_allclose(
            np.asarray(g_kt.textures), np.asarray(g_rem.textures),
            rtol=1e-4, atol=1e-7)

    def test_textured_grads_big_texture_demand_paged(self):
        """The same d(texel)/d(uv)-exact geometry gradients through the
        HBM demand-paged texture path (want_grad=True in
        _tex_demand_fetch: the fused weight-folded selectors also
        accumulate the dT/dpx / dT/dpy rows)."""
        from tracer.pallas import diff as pdiff
        from tracer.pallas import megakernel

        scene = _scene()
        g = np.random.default_rng(9)
        big = megakernel.MAX_TEX_DIM
        tex = g.uniform(0.2, 1.0, size=(1, big + 20, big + 60, 3)).astype(
            np.float32)
        mats = scene.materials
        tex_id = np.asarray(mats.tex_id).copy()
        tex_id[0] = 0
        scene = scene._replace(
            textures=jnp.asarray(tex),
            materials=mats._replace(tex_id=jnp.asarray(tex_id)),
        )

        def loss(scene, mode):
            fb = pdiff.render_frame_diff(scene, _cam(), W, H, 1, 3,
                                         mode=mode)
            return jnp.mean(fb * fb)

        g_k = jax.grad(lambda s: loss(s, "replay-kernel"), allow_int=True)(scene)
        g_s = jax.grad(lambda s: loss(s, "replay-sample"), allow_int=True)(scene)
        np.testing.assert_allclose(
            np.asarray(g_k.spheres.center), np.asarray(g_s.spheres.center),
            rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(g_k.materials.albedo), np.asarray(g_s.materials.albedo),
            rtol=1e-4, atol=1e-6)

    def test_kernel_forward_replay_matches_record(self):
        """The kernel's in-flight forward replay (a free output) must
        reproduce the recorded framebuffer — same joins, same _shade."""
        from tracer.pallas import bwd, megakernel

        scene = _scene()
        fb, idx = megakernel.render_frame_pallas_record(
            scene, _cam(), W, H, SPP, DEPTH, interpret=True
        )
        gz = jnp.zeros((H, W, 3), jnp.float32)
        _, _, fb_re = bwd.scene_cam_grads(
            scene, _cam(), idx, gz, W, H, SPP, DEPTH, interpret=True
        )
        np.testing.assert_allclose(np.asarray(fb_re), np.asarray(fb),
                                   atol=1e-5)

    def test_kernel_grads_finite_differences(self):
        """FD pin directly on the fused-kernel gradients (sphere z and
        albedo — the same probes TestSceneGradients uses)."""
        from tracer.pallas import diff as pdiff

        def loss_at(cz):
            scene = _scene(center_z=cz)
            fb = pdiff.render_frame_diff(scene, _cam(), W, H, SPP, DEPTH,
                                         mode="replay-kernel")
            return jnp.sum(fb * fb) / (W * H * SPP)

        g = jax.grad(loss_at)(jnp.float32(1.0))
        eps = 1e-3
        fd = (loss_at(jnp.float32(1.0 + eps)) - loss_at(jnp.float32(1.0 - eps))) / (2 * eps)
        np.testing.assert_allclose(float(g), float(fd), rtol=2e-2)


def test_tex_scatter_kernel_matches_xla_scatter():
    """The MXU block-accumulation scatter (tracer.pallas.tex_scatter)
    must reproduce bwd.texture_image_grads (the XLA .at[].add oracle)
    on random addressing, including wrap corners (x0=tw-1, y0=th-1) and
    zero-cotangent (untextured) rows — up to f32 addition order."""
    from tracer.pallas import bwd, tex_scatter

    rng = np.random.default_rng(0)
    spp, depth = 2, 3
    R = spp * depth
    P = 3 * 128
    th, tw = 40, 200  # forces row/col padding in the blocked layout
    g = rng.normal(size=(3 * R, P)).astype(np.float32)
    live = rng.random((R, P)) < 0.5
    g = g * np.repeat(live[None], 3, axis=0).reshape(3 * R, P)
    t2 = np.ones((13 * R, P), np.float32)
    t2[9 * R:10 * R] = rng.integers(0, tw, size=(R, P))
    t2[10 * R:11 * R] = rng.integers(0, th, size=(R, P))
    t2[11 * R:12 * R] = rng.random((R, P))
    t2[12 * R:13 * R] = rng.random((R, P))

    ref = np.asarray(bwd.texture_image_grads(
        jnp.asarray(g), jnp.asarray(t2), spp, depth, th, tw))
    got = np.asarray(tex_scatter.texture_image_grads_kernel(
        jnp.asarray(g), jnp.asarray(t2), spp, depth, th, tw,
        interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


class TestChunkedGradients:
    """spp-chunked kernel backward (round 3, VERDICT item 4): tape memory
    bounded by spp_chunk makes the reference's real max_depth=50
    differentiable (config.txt:16). Chunk sums must equal the one-shot
    full-tape gradients up to f32 addition order."""

    def test_chunked_matches_full_tape(self):
        from tracer.pallas import bwd, megakernel

        scene = _scene()
        spp = 4
        g = np.random.default_rng(7)
        g_fb = jnp.asarray(g.normal(size=(H, W, 3)).astype(np.float32))

        _, idx = megakernel.render_frame_pallas_record(
            scene, _cam(), W, H, spp, DEPTH, interpret=True)
        gs_full, gc_full, _ = bwd.scene_cam_grads(
            scene, _cam(), idx, g_fb, W, H, spp, DEPTH, interpret=True)

        gs_ch, gc_ch = bwd.scene_grads_chunked(
            scene, _cam(), g_fb, W, H, spp, DEPTH, spp_chunk=2,
            interpret=True)

        for a, b in zip(jax.tree_util.tree_leaves(gs_ch) + jax.tree_util.tree_leaves(gc_ch),
                        jax.tree_util.tree_leaves(gs_full) + jax.tree_util.tree_leaves(gc_full)):
            if jnp.issubdtype(a.dtype, jnp.floating):
                an, bn = np.asarray(a), np.asarray(b)
                tol = 1e-5 * max(1.0, float(np.abs(bn).max()))
                np.testing.assert_allclose(an, bn, atol=tol, rtol=1e-4)

    def test_bucketed_matches_full_tape(self):
        """Depth-bucketed backward (round 4): tiles gather into static-
        depth buckets, skipping each tile's provably-dead tail slots
        (beyond the first all-(-1) tape row every lane is dead, so the
        skipped vjps are identity on the radiance cotangent and zero on
        the tables). Must equal the full-depth kernel up to f32
        addition order. Exercises the scalar-prefetched tile-base path
        (gathered tiles keep pixel-exact seeds) and the pad tiles."""
        from tracer.pallas import bwd, megakernel

        scene = _scene()
        spp, depth = 1, 6  # deep enough that tiles bucket differently
        g = np.random.default_rng(3)
        g_fb = jnp.asarray(g.normal(size=(H, W, 3)).astype(np.float32))
        _, idx = megakernel.render_frame_pallas_record(
            scene, _cam(), W, H, spp, depth, interpret=True)
        gs_full, gc_full, _ = bwd.scene_cam_grads(
            scene, _cam(), idx, g_fb, W, H, spp, depth, interpret=True)
        gs_b, gc_b = bwd.scene_grads_bucketed(
            scene, _cam(), idx, g_fb, W, H, spp, depth, interpret=True,
            buckets=(2, 4, 6))
        for a, b in zip(jax.tree_util.tree_leaves(gs_b) + jax.tree_util.tree_leaves(gc_b),
                        jax.tree_util.tree_leaves(gs_full) + jax.tree_util.tree_leaves(gc_full)):
            if jnp.issubdtype(a.dtype, jnp.floating):
                an, bn = np.asarray(a), np.asarray(b)
                tol = 1e-5 * max(1.0, float(np.abs(bn).max()))
                np.testing.assert_allclose(an, bn, atol=tol, rtol=1e-4)

    def test_segmented_backward_matches_unsegmented(self):
        """Depth-segment checkpointing (the VMEM fix that makes d50
        compile: the unrolled vjp residual chain is ~430 KB/bounce, d50
        overflowed the 16 MB scoped limit) recomputes mathematically
        identical ops — seg_size=2 (3 segments at depth 6) vs one
        segment agrees to compiler-reassociation ulps (measured max
        2.8e-9 abs / 5.5e-6 rel on CPU: the different unroll structure
        fuses differently)."""
        from tracer.pallas import bwd, megakernel

        scene = _scene()
        spp, depth = 2, 6
        g = np.random.default_rng(7)
        g_fb = jnp.asarray(g.normal(size=(H, W, 3)).astype(np.float32))
        _, idx = megakernel.render_frame_pallas_record(
            scene, _cam(), W, H, spp, depth, interpret=True)
        out = {}
        for seg in (2, 8):
            out[seg] = bwd.scene_cam_grads(
                scene, _cam(), idx, g_fb, W, H, spp, depth,
                interpret=True, seg_size=seg)
        for a, b in zip(jax.tree_util.tree_leaves(out[2]),
                        jax.tree_util.tree_leaves(out[8])):
            if jnp.issubdtype(a.dtype, jnp.floating):
                an, bn = np.asarray(a), np.asarray(b)
                tol = 1e-6 * max(1.0, float(np.abs(bn).max()))
                np.testing.assert_allclose(an, bn, atol=tol, rtol=1e-5)

    def test_l2_grads_deep_multi_segment(self):
        """Deep-depth differentiability: depth 10 = 2 backward segments
        (seg_size 8, uneven 8+2 tail) + the chunked driver, the same
        code path as the reference's max_depth=50 (config.txt:16).
        Depth 50 itself is validated ON HARDWARE (2026-08-19: 256x192
        spp8, 800x600 spp32 and 1080x720 spp64 d50 chunked grad steps
        all finite on v5e) — interpret-mode XLA-CPU compile scales
        superlinearly in the unrolled bounce bodies (depth 20 measured
        >60 min of suite time on a 4-core box; depth 10 covers the
        multi-segment + tail logic at a fraction of that)."""
        from tracer.pallas import bwd

        scene = _scene()
        spp, depth = 1, 10
        target = np.zeros((H, W, 3), np.float32)

        loss, gs, gc = bwd.l2_grads_deep(
            scene, _cam(), target, W, H, spp, depth, spp_chunk=1,
            interpret=True)
        assert np.isfinite(float(loss))
        leaves = [np.asarray(x) for x in
                  jax.tree_util.tree_leaves(gs) + jax.tree_util.tree_leaves(gc)
                  if jnp.issubdtype(x.dtype, jnp.floating)]
        assert all(np.isfinite(a).all() for a in leaves)
        assert any(np.abs(a).max() > 0 for a in leaves)
