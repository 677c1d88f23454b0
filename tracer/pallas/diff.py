"""Differentiable megakernel: Pallas forward, replay (or remat) reverse.

The custom-VJP boundary of SURVEY.md §7 stage 6, upgraded in round 2:

mode="replay" (default) — the forward runs the fused Pallas kernel in
RECORDING mode (megakernel.render_frame_pallas_record), which writes the
winning primitive index of every (pixel, sample, bounce) to HBM. The
backward differentiates tracer.pallas.replay.render_frame_replay, which
re-shades each bounce by gathering that recorded winner — no O(prims)
intersection search, which is what dominated the round-1 remat backward.
Identical RNG streams and discrete branches make the replayed primal
bit-equal to the kernel output, so the VJP is exact for this program.

mode="remat" — round-1 behavior, kept as the oracle: no residuals, the
backward re-traces the mathematically identical XLA renderer under
reverse-mode AD. tests/test_grad pins replay gradients against both this
and finite differences.
"""

from __future__ import annotations

import functools

import jax

from tracer.pallas import megakernel
from tracer.render import renderer


# ----------------------------------------------------------------------
# replay-mode VJP (round 2): record forward, gather-replay backward
# ----------------------------------------------------------------------


def _record(scene, cam, width, height, spp, max_depth, reference_quirk,
            rr_start=None, fast_math=False, tape_fields=3):
    out = megakernel.render_frame_pallas_record(
        scene, cam, width, height, spp, max_depth,
        reference_quirk=reference_quirk,
        interpret=jax.default_backend() == "cpu",
        rr_start=rr_start, fast_math=fast_math, tape_fields=tape_fields,
    )
    # textured scenes also record the per-bounce texture multipliers
    # (fb, idx, tex); untextured return (fb, idx)
    if len(out) == 3:
        return out
    return out + (None,)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _render_replay_diff(scene, cam, width, height, spp, max_depth,
                        reference_quirk=True, rr_start=None):
    fb, _, _ = _record(scene, cam, width, height, spp, max_depth,
                       reference_quirk, rr_start)
    return fb


def _replay_fwd(scene, cam, width, height, spp, max_depth, reference_quirk,
                rr_start):
    fb, idx, tex = _record(scene, cam, width, height, spp, max_depth,
                           reference_quirk, rr_start)
    return fb, (scene, cam, idx, tex)


def _replay_bwd(width, height, spp, max_depth, reference_quirk, rr_start,
                residuals, g):
    from tracer.pallas import replay

    scene, cam, idx, tex = residuals

    def replay_render(scene, cam):
        return replay.render_frame_replay(
            scene, cam, idx, width, height, spp, max_depth,
            reference_quirk=reference_quirk,
            chunk=min(renderer.DEFAULT_CHUNK, width * height),
            tex_tape=tex, rr_start=rr_start,
        )

    _, vjp = jax.vjp(replay_render, scene, cam)
    return vjp(g)


# "replay-sample" — replay backward with LIVE texture sampling instead of
# the recorded multiplier tape: slower (per-ray gathers) but keeps the
# d(texture)/d(uv) geometry term the tape freezes out. Material gradients
# are identical between the two.


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _render_replay_sample_diff(scene, cam, width, height, spp, max_depth,
                               reference_quirk=True, rr_start=None):
    fb, _, _ = _record(scene, cam, width, height, spp, max_depth,
                       reference_quirk, rr_start)
    return fb


def _replay_sample_fwd(scene, cam, width, height, spp, max_depth,
                       reference_quirk, rr_start):
    fb, idx, _ = _record(scene, cam, width, height, spp, max_depth,
                         reference_quirk, rr_start)
    return fb, (scene, cam, idx)


def _replay_sample_bwd(width, height, spp, max_depth, reference_quirk,
                       rr_start, residuals, g):
    from tracer.pallas import replay

    scene, cam, idx = residuals

    def replay_render(scene, cam):
        return replay.render_frame_replay(
            scene, cam, idx, width, height, spp, max_depth,
            reference_quirk=reference_quirk,
            chunk=min(renderer.DEFAULT_CHUNK, width * height),
            rr_start=rr_start,
        )

    _, vjp = jax.vjp(replay_render, scene, cam)
    return vjp(g)


_render_replay_sample_diff.defvjp(_replay_sample_fwd, _replay_sample_bwd)


_render_replay_diff.defvjp(_replay_fwd, _replay_bwd)


# "replay-kernel" (round 3) — record forward + the FUSED Pallas backward
# (tracer.pallas.bwd): the whole gradient step (forward replay from the
# tape + manual reverse bounces + one-hot table-cotangent transposes)
# runs as ONE kernel per tile instead of the XLA replay's ~30 small
# fusions per bounce step. Same gradient definition (the kernel vjp's
# the same ops); texture tape semantics identical to "replay".


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def _render_kernel_diff(scene, cam, width, height, spp, max_depth,
                        reference_quirk=True, rr_start=None,
                        fast_math=False, texture_grads=False):
    fb, _, _ = _record(scene, cam, width, height, spp, max_depth,
                       reference_quirk, rr_start, fast_math)
    return fb


def _kernel_fwd(scene, cam, width, height, spp, max_depth, reference_quirk,
                rr_start, fast_math, texture_grads):
    # 13-field tape (round 4): rows 3-8 carry d(texel)/d(uv) so the
    # backward kernel linearizes the frozen texel around the recorded
    # hit — geometry gradients on textured surfaces keep the exact
    # d(texel)/d(uv) term the 3-field tape loses; rows 9-12 carry the
    # bilinear addressing for texture-IMAGE cotangents (gradients flow
    # to the texture pixels themselves, matching the remat oracle)
    texture_grads = texture_grads and scene.textures is not None
    fb, idx, tex = _record(scene, cam, width, height, spp, max_depth,
                           reference_quirk, rr_start, fast_math,
                           tape_fields=13 if texture_grads else 9)
    return fb, (scene, cam, idx, tex)


def _kernel_bwd(width, height, spp, max_depth, reference_quirk, rr_start,
                fast_math, texture_grads, residuals, g):
    # fast_math affects only WHICH winners got recorded (razor-edge
    # flips); given the tape, the backward replays/differentiates the
    # recorded paths at full precision — the gradient stays a valid
    # estimator of the fast-math forward's image
    from tracer.pallas import bwd

    scene, cam, idx, tex = residuals
    g_scene, g_cam, _ = bwd.scene_cam_grads(
        scene, cam, idx, g, width, height, spp, max_depth,
        reference_quirk=reference_quirk, rr_start=rr_start, tex_tape=tex,
        interpret=jax.default_backend() == "cpu",
        texture_grads=texture_grads and scene.textures is not None,
    )
    return g_scene, g_cam


_render_kernel_diff.defvjp(_kernel_fwd, _kernel_bwd)


# ----------------------------------------------------------------------
# remat-mode VJP (round 1): no residuals, full re-trace backward
# ----------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _render_remat_diff(scene, cam, width, height, spp, max_depth,
                       reference_quirk=True, rr_start=None):
    return megakernel.render_frame_pallas(
        scene, cam, width, height, spp, max_depth, reference_quirk=reference_quirk,
        interpret=jax.default_backend() == "cpu", rr_start=rr_start,
    )


def _remat_fwd(scene, cam, width, height, spp, max_depth, reference_quirk,
               rr_start):
    out = _render_remat_diff(scene, cam, width, height, spp, max_depth,
                             reference_quirk, rr_start)
    return out, (scene, cam)


def _remat_bwd(width, height, spp, max_depth, reference_quirk, rr_start,
               residuals, g):
    scene, cam = residuals

    def xla_render(scene, cam):
        return renderer.render_frame(
            scene, cam, width, height, spp=spp, max_depth=max_depth,
            reference_quirk=reference_quirk,
            chunk=min(renderer.DEFAULT_CHUNK, width * height),
            rr_start=rr_start,
        )

    _, vjp = jax.vjp(xla_render, scene, cam)
    return vjp(g)


_render_remat_diff.defvjp(_remat_fwd, _remat_bwd)


def render_frame_diff(scene, cam, width, height, spp, max_depth,
                      reference_quirk=True, mode="replay-kernel",
                      rr_start=None, fast_math=False, texture_grads=False):
    """Raw sample sums [H, W, 3]; forward = Pallas, backward = `mode`.

    texture_grads=True (replay-kernel only, OPT-IN): records a 13-field
    texture tape (+44% tape HBM over the 9-field default, plus an extra
    [3*spp*D, grid*128] f32 kernel output and a host scatter) so texture
    IMAGE pixels receive exact cotangents, matching the remat oracle.
    Leave False unless the texture image itself is being optimized —
    geometry d(texel)/d(uv) gradients are carried by the 9-field tape
    either way. Passing True with a mode that ignores it raises.

    mode="replay-kernel" (default since round 3): the fused Pallas
    backward — measured 18.0 vs 11.9 Mrays/s fwd+bwd on v5e at 800x600
    spp32 d8, and the VJP compiles in ~15 s where the XLA replay took
    494-682 s through the tunneled compiler. Same gradient definition as
    "replay" (the kernel `jax.vjp`s the same ops; tests pin both against
    remat and finite differences), including the texture-multiplier tape
    semantics on textured scenes.

    mode="replay": the round-2 XLA replay backward, kept as the
    cross-check. On textured scenes the recorded texture-multiplier tape
    replaces in-replay sampling — material gradients are exact, but
    geometry gradients on textured surfaces lose the d(texel)/d(uv) term
    (the texel value is frozen at the recorded hit). mode="replay-sample"
    keeps that term via live bilinear sampling (texture IMAGE still
    stop-gradded; much slower on TPU — per-ray gathers). mode="remat" is
    the full oracle including texture-image gradients.
    """
    fn = {"replay": _render_replay_diff,
          "replay-sample": _render_replay_sample_diff,
          "replay-kernel": _render_kernel_diff,
          "remat": _render_remat_diff}[mode]
    if mode == "replay-kernel":
        return fn(scene, cam, width, height, spp, max_depth, reference_quirk,
                  rr_start, fast_math, texture_grads)
    if fast_math:
        raise ValueError(f"fast_math requires mode='replay-kernel', not {mode!r}")
    if texture_grads and mode != "remat":
        raise ValueError(
            f"texture_grads requires mode='replay-kernel' (or 'remat', where "
            f"texture-image gradients are always on), not {mode!r}")
    return fn(scene, cam, width, height, spp, max_depth, reference_quirk,
              rr_start)
