"""Quick hardware probe: fused Pallas backward vs round-2 XLA replay.

Times jax.grad through mode="replay-kernel" at the bench fwd+bwd shape
(800x600 spp32 d8) on the real chip. Round-2 reference: mode="replay"
measured 11.8 Mrays/s (BASELINE.md), compile 494-682 s through the
tunnel; forward alone 37.5.
"""
import io
import sys
import time

import jax
import jax.numpy as jnp

from tracer.render import camera as camera_mod
from tracer.scene import builders, config
from tracer.pallas import diff as pallas_diff

MODE = sys.argv[1] if len(sys.argv) > 1 else "replay-kernel"
W, H, SPP, DEPTH = 800, 600, 32, 8
RR = int(sys.argv[2]) if len(sys.argv) > 2 else 0

params = config.read_scene_params(io.StringIO(config.default_config_text()))
scene = builders.create_scene(params)._replace(textures=None)

def cam_at(k):
    return camera_mod.camera_at(
        params.camera_path, k, params.num_frames, W, H, params.fov_degrees)

def loss(scene, cam):
    fb = pallas_diff.render_frame_diff(
        scene, cam, W, H, SPP, DEPTH, mode=MODE,
        rr_start=RR if RR > 0 else None)
    return jnp.mean(fb * fb)

grad_fn = jax.jit(jax.grad(loss, allow_int=True))

def run(cam):
    g = grad_fn(scene, cam)
    return float(g.materials.albedo[0, 0])

t0 = time.perf_counter()
v = run(cam_at(0))
compile_s = time.perf_counter() - t0
print(f"mode={MODE} rr={RR} compile+first: {compile_s:.1f}s  g={v:.6g}")

times = []
for k in range(1, 4):
    t0 = time.perf_counter()
    run(cam_at(k))
    times.append(time.perf_counter() - t0)
best = min(times)
print(f"mode={MODE} best {best*1e3:.1f} ms -> {W*H*SPP/best/1e6:.2f} Mrays/s")
