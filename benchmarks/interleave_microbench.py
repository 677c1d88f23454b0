"""Does interleaving G independent serial chains hide loop latency?

rowpack_microbench showed 8 independent 24-op row chains cost the same
per iteration as one (165 vs 169 ns) — the Mosaic while-loop is
LATENCY-bound. This bench models the megakernel's real shape more
closely: G independent "path states" (each a few (1,128) scratch rows,
RMW'd every iteration) each advancing through a LONG serial op chain
per iteration, plus a shared throughput term (a matmul against a prim
table). If time/iteration stays ~flat as G grows, processing G tiles'
lane-groups per persistent-loop iteration multiplies forward
throughput by ~G on the latency-bound part.

Usage: python benchmarks/interleave_microbench.py
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

ITERS = 64
CHAIN = 96   # serial elementwise ops per group per iteration
ROWS = 200   # prim-table rows for the shared matmul (throughput term)


def make_fn(groups, with_matmul, grid):
    def kernel(tab_ref, prim_ref, out_ref, scr):
        def body(c):
            s = 1.0 + 1e-7 * c.astype(jnp.float32)
            for g in range(groups):
                x = scr[g:g + 1, :] * s
                if with_matmul:
                    # shared throughput term: [ROWS, 8] @ [8, 128] then a
                    # reduce — stands in for the intersection tests
                    t = jax.lax.dot_general(
                        prim_ref[:, :], tab_ref[:, :],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    x = x + jnp.min(t, axis=0, keepdims=True)
                for _ in range(CHAIN // 4):
                    x = x * x + x
                    x = jnp.minimum(x * 1.0000001, 3.0)
                    x = x + 0.5
                    x = x * 0.9
                scr[g:g + 1, :] = x
            return c + 1

        jax.lax.while_loop(lambda c: c < ITERS, body, jnp.int32(0))
        out_ref[0:1, :] = scr[0:1, :]

    @jax.jit
    def run(tab, prim):
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda g: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((max(groups, 8), 128), jnp.float32)],
        )(tab, prim)

    return run


def main():
    probe = jax.jit(lambda x: x.ravel()[0])
    tab = jnp.linspace(0.0, 0.5, 8 * 128).reshape(8, 128)
    prim = jnp.linspace(0.0, 1.0, ROWS * 8).reshape(ROWS, 8)
    base_grid = 3750
    print("groups\tmatmul\tgrid\tns/iter\tns/(group*iter)")
    for with_matmul in (False, True):
        for groups in (1, 2, 4, 8):
            # keep total work constant: G groups per step -> grid/G steps
            grid = max(1, base_grid // groups)
            run = make_fn(groups, with_matmul, grid)
            float(probe(run(tab, prim)))
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(probe(run(tab, prim)))
                times.append(time.perf_counter() - t0)
            best = min(times)
            ns_iter = best / (grid * ITERS) * 1e9
            print(f"{groups}\t{int(with_matmul)}\t{grid}\t{ns_iter:.1f}\t"
                  f"{ns_iter / groups:.1f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
