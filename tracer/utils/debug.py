"""Debug-mode guards: NaN/Inf detection for render and gradient paths.

The reference has no sanitizers (SURVEY.md §5) — its design is race-free
by construction and so is ours (pure JAX). What CAN go wrong on a vector
machine is silent NaN poisoning through masked lanes (0 * inf in reverse
mode — see tracer.geometry.sphere). These helpers make that loud.
"""

from __future__ import annotations

import contextlib

import numpy as np
import jax


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Scoped jax_debug_nans: computations raise at the first NaN."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def check_finite(tree, name: str = "value") -> None:
    """Assert every float leaf of a pytree is finite (host-side)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            bad = int((~np.isfinite(arr)).sum())
            raise FloatingPointError(
                f"{name}{jax.tree_util.keystr(path)}: {bad}/{arr.size} non-finite values"
            )


def check_framebuffer(fb, name: str = "framebuffer") -> None:
    """Sanity for raw sample sums: finite and non-negative."""
    arr = np.asarray(fb)
    if not np.isfinite(arr).all():
        raise FloatingPointError(f"{name}: non-finite pixels")
    if (arr < 0).any():
        raise FloatingPointError(f"{name}: negative radiance")
