"""Differentiable megakernel: Pallas forward, XLA reverse.

The custom-VJP boundary of SURVEY.md §7 stage 6: the fused Pallas
megakernel is the speed-of-light forward, and the backward pass re-traces
the mathematically identical XLA renderer (same wang_hash streams, same
fixed 8-draw scatter, same masks) under reverse-mode AD. Because both
paths consume identical RNG and make identical discrete decisions, the
recomputed primal matches the kernel's output (modulo f32 reassociation)
and the straight-through gradients are consistent with tests/test_grad's
finite-difference checks.

This is the standard remat-style trade: no residuals are saved by the
kernel at all; the backward recomputes everything once.
"""

from __future__ import annotations

import functools

import jax

from tracer.pallas import megakernel
from tracer.render import renderer


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6)
)
def render_frame_diff(
    scene,
    cam,
    width: int,
    height: int,
    spp: int,
    max_depth: int,
    reference_quirk: bool = True,
):
    """Raw sample sums [H, W, 3]; forward = Pallas, backward = XLA remat."""
    return megakernel.render_frame_pallas(
        scene, cam, width, height, spp, max_depth, reference_quirk=reference_quirk,
        interpret=jax.default_backend() == "cpu",
    )


def _fwd(scene, cam, width, height, spp, max_depth, reference_quirk):
    out = render_frame_diff(scene, cam, width, height, spp, max_depth, reference_quirk)
    return out, (scene, cam)


def _bwd(width, height, spp, max_depth, reference_quirk, residuals, g):
    scene, cam = residuals

    def xla_render(scene, cam):
        return renderer.render_frame(
            scene, cam, width, height, spp=spp, max_depth=max_depth,
            reference_quirk=reference_quirk,
            chunk=min(renderer.DEFAULT_CHUNK, width * height),
        )

    _, vjp = jax.vjp(xla_render, scene, cam)
    return vjp(g)


render_frame_diff.defvjp(_fwd, _bwd)
