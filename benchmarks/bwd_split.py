"""Phase split of the fwd+bwd gradient step (bench shape 800x600x32 d8).

Times, separately: plain forward, recording forward (idx tape), the
fused backward kernel alone, and the end-to-end grad step — to locate
where 1/16.3 Mrays/s goes.

Usage: python benchmarks/bwd_split.py [rr_start]
"""

from __future__ import annotations

import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tracer.render import camera as camera_mod
from tracer.scene import builders, config
from tracer.pallas import megakernel, bwd

W, H, SPP, D = 800, 600, 32, 8
RR = int(sys.argv[1]) if len(sys.argv) > 1 else None


def main():
    import jax
    import jax.numpy as jnp
    probe = jax.jit(lambda x: jnp.ravel(x)[0])

    params = config.read_scene_params(io.StringIO(config.default_config_text()))
    scene = builders.create_scene(params)._replace(textures=None)
    cam = camera_mod.camera_at(
        params.camera_path, 1, params.num_frames, W, H, params.fov_degrees)
    rays = W * H * SPP

    def timed(run, n=3):
        run()
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        return best

    # 1. plain forward
    t_fwd = timed(lambda: float(probe(megakernel.render_frame_pallas(
        scene, cam, W, H, spp=SPP, max_depth=D, rr_start=RR))))
    print(f"fwd plain:   {t_fwd:.4f}s  {rays / t_fwd / 1e6:6.1f} Mrays/s")

    # 1b. forward fast_math (what the fwd bench reports)
    t_fm = timed(lambda: float(probe(megakernel.render_frame_pallas(
        scene, cam, W, H, spp=SPP, max_depth=D, fast_math=True, rr_start=RR))))
    print(f"fwd fastm:   {t_fm:.4f}s  {rays / t_fm / 1e6:6.1f} Mrays/s")

    # 2. recording forward
    def rec():
        out = megakernel.render_frame_pallas_record(
            scene, cam, W, H, SPP, D, rr_start=RR)
        float(probe(out[0]))
        return out
    t_rec = timed(rec)
    print(f"fwd record:  {t_rec:.4f}s  {rays / t_rec / 1e6:6.1f} Mrays/s")

    # 3. backward kernel alone (tape fixed)
    out = rec()
    idx = out[1]
    g_fb = jnp.ones((H, W, 3), jnp.float32)

    def bwd_only():
        gs, gc, _ = bwd.scene_cam_grads(
            scene, cam, idx, g_fb, W, H, SPP, D, rr_start=RR)
        float(probe(gs.materials.albedo))
    t_bwd = timed(bwd_only)
    print(f"bwd kernel:  {t_bwd:.4f}s  {rays / t_bwd / 1e6:6.1f} Mrays/s")

    # 4. end-to-end grad step (the bench's metric)
    from tracer.pallas import diff as pallas_diff

    def loss(scene, cam):
        fb = pallas_diff.render_frame_diff(scene, cam, W, H, SPP, D,
                                           rr_start=RR)
        return jnp.mean(fb * fb)
    grad_fn = jax.jit(jax.grad(loss, allow_int=True))

    def e2e():
        g = grad_fn(scene, cam)
        float(probe(g.materials.albedo))
    t_e2e = timed(e2e)
    print(f"end-to-end:  {t_e2e:.4f}s  {rays / t_e2e / 1e6:6.1f} Mrays/s")
    print(f"sum rec+bwd: {t_rec + t_bwd:.4f}s  "
          f"(e2e overhead {t_e2e - t_rec - t_bwd:.4f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
