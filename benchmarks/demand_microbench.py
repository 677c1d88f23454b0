"""Ablate the texture demand-loop's per-iteration cost components.

Replicates the megakernel demand loop's structure in isolation and
strips pieces to find where ~600 ns/iteration goes:

  full      want(vector) -> scalar max -> slot math -> pl.when DMA
            -> dyn-slice block read -> one-hot build -> matmul pair
            -> fused reduce -> flag writes
  noscalar  block id is the loop counter (no vector->scalar reduce)
  nodma     no pl.when / DMA (always serve from slot 0)
  nomm      no matmul (serve = elementwise fold of the block)
  bare      scalar loop only

Usage: python benchmarks/demand_microbench.py
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

GRID = 3750
ITERS = 150  # demand iterations per tile (matches canonical measurement)
BH = 32
SLOTS = 16
BH3 = 3 * BH


def make_fn(mode):
    def kernel(tex_hbm, out_ref, blk_ref, cached_ref, sem, aux_ref):
        iota128 = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
        iota_bh = jax.lax.broadcasted_iota(jnp.int32, (BH, 1), 0)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        for s in range(SLOTS):
            cached_ref[0, s] = -1

        if mode == "auxfull":
            aux_ref[...] = jnp.zeros_like(aux_ref)

        def body(c):
            if mode == "bare":
                return c + 1
            # fake per-lane demand state (varies per iteration)
            if mode == "auxfull":
                # want built from 4 flag rows in VMEM, like production
                want = jnp.full((1, 128), -1, jnp.int32)
                for f in range(4):
                    m = aux_ref[3 + f:4 + f, :] < 0.5
                    bid = (lanes * 7 + c * 13 + f) % 672
                    want = jnp.maximum(want, jnp.where(m, bid, -1))
            else:
                want = (lanes * 7 + c * 13) % 672
            if mode == "noscalar":
                b = c % 672
            else:
                b = jnp.max(want)  # vector -> scalar
            by = b // 16
            bx = b - by * 16
            slot = (bx + 3 * by) % SLOTS
            base = slot * BH3

            if mode == "alwaysdma":
                # branchless: no tags, always copy the wanted block into a
                # round-robin slot (hit = harmless re-copy)
                base = (c % SLOTS) * BH3
                cp = pltpu.make_async_copy(
                    tex_hbm.at[pl.ds(b * BH3, BH3), :],
                    blk_ref.at[pl.ds(base, BH3), :],
                    sem,
                )
                cp.start()
                cp.wait()
            elif mode == "dmaonly":
                cp = pltpu.make_async_copy(
                    tex_hbm.at[pl.ds(b * BH3, BH3), :],
                    blk_ref.at[pl.ds(0, BH3), :],
                    sem,
                )
                cp.start()
                cp.wait()
                out_ref[0:1, :] = out_ref[0:1, :] + blk_ref[0:1, :]
                return c + 1
            elif mode == "whenonly":
                # branch present, no DMA inside: isolates branch cost
                @pl.when(b != cached_ref[0, slot])
                def _mark():
                    cached_ref[0, slot] = b
            elif mode == "statslot":
                # static SMEM slot index: isolates dynamic-index cost
                @pl.when(b != cached_ref[0, 0])
                def _fetch_s():
                    cp = pltpu.make_async_copy(
                        tex_hbm.at[pl.ds(b * BH3, BH3), :],
                        blk_ref.at[pl.ds(0, BH3), :],
                        sem,
                    )
                    cp.start()
                    cp.wait()
                    cached_ref[0, 0] = b
                base = 0
            elif mode != "nodma":
                @pl.when(b != cached_ref[0, slot])
                def _fetch():
                    cp = pltpu.make_async_copy(
                        tex_hbm.at[pl.ds(b * BH3, BH3), :],
                        blk_ref.at[pl.ds(base, BH3), :],
                        sem,
                    )
                    cp.start()
                    cp.wait()
                    cached_ref[0, slot] = b
            else:
                base = 0

            bfull = blk_ref[pl.ds(base, BH3), :]
            if mode == "nomm":
                v = jnp.sum(bfull[0:BH, :], axis=0, keepdims=True)
                out_ref[0:1, :] = out_ref[0:1, :] + v
                return c + 1
            bhi = bfull.astype(jnp.bfloat16).astype(jnp.float32)
            blo = bfull - bhi
            lx0 = (lanes + c) % 128
            lx1 = (lx0 + 1) % 128
            ohx = jnp.concatenate([
                (iota128 == lx0).astype(jnp.float32),
                (iota128 == lx1).astype(jnp.float32)], axis=1)
            col = (jax.lax.dot_general(
                bhi, ohx, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) +
                jax.lax.dot_general(
                    blo, ohx, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            ly0 = (lanes * 3 + c) % BH
            oh0 = (iota_bh == ly0).astype(jnp.float32)
            oh1 = (iota_bh == ((ly0 + 1) % BH)).astype(jnp.float32)
            if mode == "auxfull":
                hits = [((aux_ref[3 + f:4 + f, :] < 0.5) &
                         (((lanes * 7 + c * 13 + f) % 672) == b))
                        for f in range(4)]
                w = [jnp.where(hits[f], 0.25, 0.0) for f in range(4)]
                wa = oh0 * w[0] + oh1 * w[2]
                wb = oh0 * w[1] + oh1 * w[3]
                for ci in range(3):
                    c0 = col[ci * BH:(ci + 1) * BH, 0:128]
                    c1 = col[ci * BH:(ci + 1) * BH, 128:256]
                    add = jnp.sum(wa * c0 + wb * c1, axis=0, keepdims=True)
                    aux_ref[ci:ci + 1, :] = aux_ref[ci:ci + 1, :] + add
                for f in range(4):
                    # write 0.0 (not 1.0) so flags stay "unserved" and the
                    # fixed-ITERS loop never sees want = -1; same op cost
                    aux_ref[3 + f:4 + f, :] = jnp.where(
                        hits[f], 0.0, aux_ref[3 + f:4 + f, :])
                out_ref[0:1, :] = aux_ref[0:1, :]
                return c + 1
            wa = oh0 * 0.25 + oh1 * 0.25
            for ci in range(3):
                c0 = col[ci * BH:(ci + 1) * BH, 0:128]
                c1 = col[ci * BH:(ci + 1) * BH, 128:256]
                add = jnp.sum(wa * c0 + wa * c1, axis=0, keepdims=True)
                out_ref[ci:ci + 1, :] = out_ref[ci:ci + 1, :] + add
            return c + 1

        out_ref[...] = jnp.zeros_like(out_ref)
        jax.lax.while_loop(lambda c: c < ITERS, body, jnp.int32(0))

    @jax.jit
    def run(tex):
        return pl.pallas_call(
            kernel,
            grid=(GRID,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((8, 128), lambda g: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((SLOTS * BH3, 128), jnp.float32),
                pltpu.SMEM((1, SLOTS), jnp.int32),
                pltpu.SemaphoreType.DMA,
                pltpu.VMEM((8, 128), jnp.float32),
            ],
        )(tex)

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
    tex = jnp.ones((672 * BH3, 128), jnp.float32) * 0.5
    print("mode\ts\tns_per_demand_iter", flush=True)
    for mode in ("dmaonly", "alwaysdma", "full"):
        t = timeit(make_fn(mode), tex)
        print(f"{mode}\t{t:.4f}\t{t / (GRID * ITERS) * 1e9:.1f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
