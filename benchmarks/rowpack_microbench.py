"""Do (1,128) row ops cost the same as one packed (3,128)/(8,128) op?

The persistent kernel's per-iteration FIXED cost (~360 ns, round-4
ablation) is a chain of many small (1,128) elementwise ops in
_shade/join/state. If the VPU charges one issue slot per OP regardless
of sublane occupancy, packing 3 independent component rows (x,y,z of a
vec3 chain) into one (3,128) op would cut that chain ~3x. If instead a
(1,128) op is charged ~1/8 of an (8,128) op (sub-tile issue), packing
buys nothing. This microbench settles it: the same op chain run as
  a) `rows` separate (1,128) arrays, ops applied per row
  b) one (rows,128) array, ops applied once
inside the exact Mosaic while-loop shape the megakernel uses.

Usage: python benchmarks/rowpack_microbench.py
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
ITERS = 64
OPS = 24  # elementwise ops per chain per iteration


def make_fn(rows, packed):
    def kernel(tab_ref, out_ref):
        def body(c):
            s = 1.0 + 1e-7 * c.astype(jnp.float32)
            if packed:
                x = tab_ref[0:rows, :] * s
                for _ in range(OPS // 4):
                    x = x * x + x
                    x = jnp.minimum(x * 1.0000001, 3.0)
                    x = x + 0.5
                out_ref[0:1, :] = (
                    out_ref[0:1, :] + jnp.min(x, axis=0, keepdims=True)
                )
            else:
                acc = None
                for r in range(rows):
                    x = tab_ref[r:r + 1, :] * s
                    for _ in range(OPS // 4):
                        x = x * x + x
                        x = jnp.minimum(x * 1.0000001, 3.0)
                        x = x + 0.5
                    acc = x if acc is None else jnp.minimum(acc, x)
                out_ref[0:1, :] = out_ref[0:1, :] + acc
            return c + 1

        jax.lax.while_loop(lambda c: c < ITERS, body, jnp.int32(0))

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


def main():
    probe = jax.jit(lambda x: x.ravel()[0])
    tab = jnp.linspace(0.0, 0.5, 8 * 128).reshape(8, 128)
    print("rows\tlayout\tns/iter\tns/(row*iter)")
    for rows in (1, 2, 3, 4, 8):
        for packed in (False, True):
            if rows == 1 and packed:
                continue
            run = make_fn(rows, packed)
            float(probe(run(tab)))  # compile
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(probe(run(tab)))
                times.append(time.perf_counter() - t0)
            best = min(times)
            ns_iter = best / (GRID * ITERS) * 1e9
            print(f"{rows}\t{'packed' if packed else 'rowwise'}\t"
                  f"{ns_iter:.1f}\t{ns_iter / rows:.2f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
