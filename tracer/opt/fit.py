"""Inverse rendering: gradient-descent fitting of scene parameters.

The capability the reference lacks and the north star demands: pixel
losses backpropagate to sphere centers/radii, material albedo/fuzz/
ir/absorption/emit, and camera parameters. This module runs the
optimization loop (optax) with periodic checkpointing so long fits
resume after preemption — the checkpoint/resume subsystem the reference
has no analog for (SURVEY.md §5: scene params + optimizer state are the
full training state).

Parameters are addressed by dotted paths into the Scene pytree
(e.g. "spheres.center", "materials.albedo"), so any differentiable
subset can be optimized while the rest stays frozen.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from tracer.render import camera as camera_mod
from tracer.render import renderer
from tracer.scene.types import Scene

DEFAULT_PARAMS = ("spheres.center", "spheres.radius", "materials.albedo")


def get_path(tree, path: str):
    for part in path.split("."):
        tree = getattr(tree, part)
    return tree


def set_path(tree, path: str, value):
    """Functional set on nested NamedTuples."""
    parts = path.split(".")
    if len(parts) == 1:
        return tree._replace(**{parts[0]: value})
    head = parts[0]
    sub = set_path(getattr(tree, head), ".".join(parts[1:]), value)
    return tree._replace(**{head: sub})


def extract_params(scene: Scene, paths: Iterable[str]) -> Dict[str, jnp.ndarray]:
    return {p: get_path(scene, p) for p in paths}


def apply_params(scene: Scene, params: Dict[str, jnp.ndarray]) -> Scene:
    for p, v in params.items():
        scene = set_path(scene, p, v)
    return scene


def render_loss_fn(
    scene: Scene,
    cam: camera_mod.CameraData,
    target,  # [H, W, 3] mean radiance
    width: int,
    height: int,
    spp: int,
    max_depth: int,
    chunk: Optional[int] = None,
    engine: str = "xla",
) -> Callable:
    """L2 image loss as a function of a params dict.

    engine="pallas" uses the fused megakernel for the forward pass with
    the XLA renderer as the rematerialized backward (tracer.pallas.diff)
    — faster iterations on TPU, identical gradients.
    """
    # Host round-trip the target before it's captured in the closure.
    # On the tunneled TPU backend, a pallas-produced device array embedded
    # as a jit closure constant in a program that itself contains a pallas
    # call is read with a permuted layout (silent image scramble → bogus
    # loss). A numpy round-trip normalizes the layout; fit() additionally
    # passes the target as a jit argument, which sidesteps constant
    # embedding entirely.
    target = jnp.asarray(np.asarray(target), jnp.float32)
    chunk = chunk or min(renderer.DEFAULT_CHUNK, width * height)

    def loss(params, target=target, scene=scene):
        # scene is overridable so fit() can pass ALL its leaves as jit
        # arguments — the non-optimized ones (textures especially: tens
        # of MB) otherwise embed as closure constants, which the same
        # backend bug reads with a permuted layout
        s = apply_params(scene, params)
        if engine == "pallas":
            from tracer.pallas import diff as pallas_diff

            fb = pallas_diff.render_frame_diff(s, cam, width, height, spp, max_depth)
        else:
            fb = renderer.render_frame(
                s, cam, width, height, spp=spp, max_depth=max_depth, chunk=chunk
            )
        return jnp.mean((fb / spp - target) ** 2)

    return loss


def save_checkpoint(path: str, step: int, params: Dict, opt_state) -> None:
    """Flat npz checkpoint: step + params + optimizer state leaves."""
    flat_opt, treedef = jax.tree_util.tree_flatten(opt_state)
    arrays = {f"param:{k}": np.asarray(v) for k, v in params.items()}
    arrays.update({f"opt:{i}": np.asarray(v) for i, v in enumerate(flat_opt)})
    arrays["step"] = np.asarray(step)
    tmp = path + ".tmp.npz"  # np.savez appends .npz unless present
    np.savez(tmp, **arrays)
    os.replace(tmp, path)  # atomic publish


def load_checkpoint(path: str, params_template: Dict, opt_state_template):
    """Inverse of save_checkpoint; returns (step, params, opt_state)."""
    with np.load(path) as z:
        step = int(z["step"])
        params = {k: jnp.asarray(z[f"param:{k}"]) for k in params_template}
        flat_t, treedef = jax.tree_util.tree_flatten(opt_state_template)
        flat = [jnp.asarray(z[f"opt:{i}"]) for i in range(len(flat_t))]
        opt_state = jax.tree_util.tree_unflatten(treedef, flat)
    return step, params, opt_state


def fit(
    scene: Scene,
    cam: camera_mod.CameraData,
    target,
    width: int,
    height: int,
    spp: int = 4,
    max_depth: int = 6,
    param_paths: Iterable[str] = DEFAULT_PARAMS,
    steps: int = 100,
    learning_rate: float = 1e-2,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 25,
    log_every: int = 10,
    log=print,
    engine: str = "xla",
):
    """Fit the named scene parameters to a target image.

    Returns (fitted_scene, losses). If `checkpoint_path` exists, training
    resumes from it (step counter, params, optimizer moments).
    """
    loss_fn = render_loss_fn(scene, cam, target, width, height, spp, max_depth,
                             engine=engine)
    target_arg = jnp.asarray(np.asarray(target), jnp.float32)

    opt = optax.adam(learning_rate)
    params = extract_params(scene, param_paths)
    opt_state = opt.init(params)
    start_step = 0

    if checkpoint_path and os.path.exists(checkpoint_path):
        start_step, params, opt_state = load_checkpoint(checkpoint_path, params, opt_state)
        log(f"resumed from {checkpoint_path} at step {start_step}")

    @jax.jit
    def update(params, opt_state, target, scene):
        # target AND the scene are jit ARGUMENTS, never closure
        # constants — see the layout-miscompile note in render_loss_fn.
        loss, grads = jax.value_and_grad(loss_fn)(params, target, scene)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for step in range(start_step, steps):
        params, opt_state, loss = update(params, opt_state, target_arg, scene)
        losses.append(float(loss))
        if log_every and step % log_every == 0:
            log(f"step {step}\tloss {float(loss):.6g}")
        if checkpoint_path and checkpoint_every and (step + 1) % checkpoint_every == 0:
            save_checkpoint(checkpoint_path, step + 1, params, opt_state)

    if checkpoint_path:
        save_checkpoint(checkpoint_path, steps, params, opt_state)
    return apply_params(scene, params), losses
