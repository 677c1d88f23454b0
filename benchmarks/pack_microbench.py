"""Does packing 3 identical (1,128) chains into one (3,128) chain cut
Mosaic loop-body cost? Models _shade's color-channel pipeline
(beta/final/attenuation triples).

Measured v5e 2026-08-20: packed=False 149.7 ns/iter, packed=True 150.2
ns/iter — IDENTICAL. Mosaic executes 3 independent (1,128) chains at
the same cost as the packed (3,128) chain (auto-packing or free
overlap), so channel-packing _shade's color pipeline cannot win.
Run: python benchmarks/pack_microbench.py (needs the TPU)."""
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 256
CHAIN = 8  # exp/where chains per iteration (like tr/attenuation)

def make(packed, grid):
    def kernel(out_ref, scr):
        def body(c):
            s = 1.0 + 1e-7 * c.astype(jnp.float32)
            if packed:
                x = scr[0:3, :] * s
                for _ in range(CHAIN):
                    x = jnp.exp(-x * 0.3)
                    x = jnp.where(x > 0.5, x * 0.9, x + 0.01)
                scr[0:3, :] = x
            else:
                for r in range(3):
                    x = scr[r:r + 1, :] * s
                    for _ in range(CHAIN):
                        x = jnp.exp(-x * 0.3)
                        x = jnp.where(x > 0.5, x * 0.9, x + 0.01)
                    scr[r:r + 1, :] = x
            return c + 1
        jax.lax.while_loop(lambda c: c < ITERS, body, jnp.int32(0))
        out_ref[0:3, :] = scr[0:3, :]

    @jax.jit
    def run():
        return pl.pallas_call(
            kernel, grid=(grid,),
            out_specs=pl.BlockSpec((8, 128), lambda g: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        )()
    return run

probe = jax.jit(lambda x: x.ravel()[0])
for packed in (False, True):
    run = make(packed, 2000)
    float(probe(run()))
    times = []
    for _ in range(3):
        t0 = time.perf_counter(); float(probe(run())); times.append(time.perf_counter() - t0)
    ns = min(times) / (2000 * ITERS) * 1e9
    print(f"packed={packed}: {ns:.1f} ns/iter", flush=True)
