"""TPU configuration sweep: engine / strategy / tile / chunk timings.

Times the canonical scene (BASELINE config 3 shapes, reduced spp for
sweep speed) across: XLA path (early-exit, two chunk sizes), Pallas
brute, Pallas clustered (several K), both tile sizes. Prints a TSV.

Run alone — the tunneled chip is single-session.
"""

from __future__ import annotations

import io
import sys
import time

import numpy as np


def main() -> int:
    from tracer.pallas import megakernel
    from tracer.render import camera as camera_mod
    from tracer.render import renderer
    from tracer.scene import builders, config

    W, H, SPP, DEPTH = 800, 600, int(sys.argv[1]) if len(sys.argv) > 1 else 8, 50

    params = config.read_scene_params(io.StringIO(config.default_config_text()))
    scene = builders.create_scene(params, texture_loader=lambda _: None)
    lf, la = camera_mod.camera_path_position(params.camera_path, 1, params.num_frames)
    cam = camera_mod.build_camera_data(origin=lf, look_at=la, width=W, height=H,
                                       vfov=params.fov_degrees)
    lf2, la2 = camera_mod.camera_path_position(params.camera_path, 2, params.num_frames)
    cam2 = camera_mod.build_camera_data(origin=lf2, look_at=la2, width=W, height=H,
                                        vfov=params.fov_degrees)
    rays = W * H * SPP

    def bench(name, fn):
        try:
            t0 = time.perf_counter()
            out = fn(cam)
            float(out[0, 0, 0])
            compile_s = time.perf_counter() - t0
            times = []
            for c in (cam2, cam, cam2):
                t0 = time.perf_counter()
                out = fn(c)
                float(out[0, 0, 0])
                times.append(time.perf_counter() - t0)
            best = min(times)
            print(f"{name}\t{compile_s:.1f}\t{best:.3f}\t{rays/best/1e6:.2f}", flush=True)
        except Exception as e:
            print(f"{name}\tFAIL\t{type(e).__name__}: {str(e)[:160]}", flush=True)

    print("config\tcompile_s\tbest_s\tMrays_s", flush=True)

    bench("xla_chunk16k", lambda c: renderer.render_frame(
        scene, c, W, H, spp=SPP, max_depth=DEPTH, chunk=16384, early_exit=True))
    bench("xla_chunk64k", lambda c: renderer.render_frame(
        scene, c, W, H, spp=SPP, max_depth=DEPTH, chunk=65536, early_exit=True))
    bench("pallas_brute_t1024", lambda c: megakernel.render_frame_pallas(
        scene, c, W, H, spp=SPP, max_depth=DEPTH))
    bench("pallas_brute_t128", lambda c: megakernel.render_frame_pallas(
        scene, c, W, H, spp=SPP, max_depth=DEPTH, tile_px=128))
    for k in (8, 16, 32):
        bench(f"pallas_cluster{k}_t1024", lambda c, k=k: megakernel.render_frame_pallas(
            scene, c, W, H, spp=SPP, max_depth=DEPTH, cluster_k=k))
    bench("pallas_cluster16_t128", lambda c: megakernel.render_frame_pallas(
        scene, c, W, H, spp=SPP, max_depth=DEPTH, cluster_k=16, tile_px=128))
    return 0


if __name__ == "__main__":
    sys.exit(main())
