"""Split timing: record forward vs fused-backward kernel vs plain forward."""
import io
import time

import jax
import jax.numpy as jnp

from tracer.render import camera as camera_mod
from tracer.scene import builders, config
from tracer.pallas import megakernel, bwd

W, H, SPP, DEPTH = 800, 600, 32, 8

params = config.read_scene_params(io.StringIO(config.default_config_text()))
scene = builders.create_scene(params)._replace(textures=None)
cam = camera_mod.camera_at(params.camera_path, 1, params.num_frames, W, H,
                           params.fov_degrees)
probe = jax.jit(lambda x: x.ravel()[0])


def timeit(name, fn, n=3):
    fn()  # compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{name:28s} {best*1e3:8.1f} ms   {W*H*SPP/best/1e6:7.2f} Mrays/s")
    return best


fwd = jax.jit(lambda c: megakernel.render_frame_pallas(
    scene, c, W, H, spp=SPP, max_depth=DEPTH, fast_math=True))
timeit("forward (fast_math)", lambda: float(probe(fwd(cam))))

rec = jax.jit(lambda c: megakernel.render_frame_pallas_record(
    scene, c, W, H, SPP, DEPTH))
out = rec(cam)
idx = out[1]
timeit("record forward", lambda: float(probe(rec(cam)[0])))

g_fb = jnp.ones((H, W, 3), jnp.float32)
bk = jax.jit(lambda i, g: bwd.scene_cam_grads(
    scene, cam, i, g, W, H, SPP, DEPTH)[2])
timeit("bwd kernel (incl pack vjp)", lambda: float(probe(bk(idx, g_fb))))
