"""jax.profiler trace of the persistent forward / record / bwd kernels.

Usage: python benchmarks/profile_probe.py [fwd|record|bwd] [outdir]
"""
import io
import sys
import time

import jax
import jax.numpy as jnp

from tracer.render import camera as camera_mod
from tracer.scene import builders, config
from tracer.pallas import megakernel, bwd

WHAT = sys.argv[1] if len(sys.argv) > 1 else "fwd"
OUT = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/trace_{WHAT}"
W, H, SPP, DEPTH = 800, 600, 32, 8

params = config.read_scene_params(io.StringIO(config.default_config_text()))
scene = builders.create_scene(params)._replace(textures=None)
cam = camera_mod.camera_at(params.camera_path, 1, params.num_frames, W, H,
                           params.fov_degrees)
probe = jax.jit(lambda x: x.ravel()[0])

if WHAT == "fwd":
    fn = jax.jit(lambda c: megakernel.render_frame_pallas(
        scene, c, W, H, spp=SPP, max_depth=50, fast_math=True))
    run = lambda: float(probe(fn(cam)))
elif WHAT == "record":
    fn = jax.jit(lambda c: megakernel.render_frame_pallas_record(
        scene, c, W, H, SPP, DEPTH)[0])
    run = lambda: float(probe(fn(cam)))
else:
    rec = jax.jit(lambda c: megakernel.render_frame_pallas_record(
        scene, c, W, H, SPP, DEPTH))
    idx = rec(cam)[1]
    g_fb = jnp.ones((H, W, 3), jnp.float32)
    fn = jax.jit(lambda i, g: bwd.scene_cam_grads(
        scene, cam, i, g, W, H, SPP, DEPTH)[2])
    run = lambda: float(probe(fn(idx, g_fb)))

run()  # compile
t0 = time.perf_counter(); run(); print("warm:", time.perf_counter() - t0)
with jax.profiler.trace(OUT):
    run()
print("trace written to", OUT)
