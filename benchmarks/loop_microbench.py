"""Standalone persistent-loop microkernel: time vs (iterations, rows).

Measures the raw Mosaic cost model of the megakernel's shape — a
while-loop per 128-px grid step whose body does `rows` of (rows, 128)
elementwise work — with everything else stripped. Answers two
questions the full kernel can't cleanly:

  1. does a scalar-carry while_loop actually exit early (time ~ iters)?
  2. what is the per-(row x iter) elementwise cost and the per-iteration
     fixed overhead on this chip?

Usage: python benchmarks/loop_microbench.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GRID = 3750  # 800x600 / 128


def make_fn(iters, rows, ops=16):
    def kernel(tab_ref, out_ref):
        def body(c):
            x = tab_ref[:, :] * (1.0 + 1e-7 * c.astype(jnp.float32))
            for _ in range(ops // 4):
                x = x * x + x
                x = jnp.minimum(x, 3.0)
            # cheap reduction so nothing is dead
            out_ref[0:1, :] = out_ref[0:1, :] + jnp.min(x, axis=0, keepdims=True)
            return c + 1

        jax.lax.while_loop(lambda c: c < iters, body, jnp.int32(0))

    @jax.jit
    def run(tab):
        return pl.pallas_call(
            kernel,
            grid=(GRID,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda g: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(tab)

    return run


probe = jax.jit(lambda x: x.ravel()[0])


def timeit(fn, *a):
    float(probe(fn(*a)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(probe(fn(*a)))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print("iters\trows\tops\ts\tns_per_iter_tile", flush=True)
    for iters in (36, 72, 144, 260):
        for rows in (8, 256, 2048):
            tab = jnp.ones((rows, 128), jnp.float32) * 0.5
            t = timeit(make_fn(iters, rows), tab)
            print(f"{iters}\t{rows}\t16\t{t:.4f}\t{t / (GRID * iters) * 1e9:.1f}",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
