"""Benchmark: forward path-trace throughput on the canonical scene.

Renders the reference config.txt scene (SURVEY.md §6: ~105 planes + ~94
spheres) at 800x600, 32 spp, depth 50 (BASELINE.md measurement config 3)
on the default JAX backend and prints ONE JSON line:

  {"metric": "fwd_mrays_per_s", "value": N, "unit": "Mrays/s",
   "vs_baseline": N}

`vs_baseline` is measured Mrays/s divided by the BASELINE.json single-
chip target (1 Grays/s on a v5p-8 ~= 250 Mrays/s per chip; this chip is
a v5e, but the target is kept fixed so rounds are comparable).
"""

from __future__ import annotations

import io
import json
import sys
import time

BASELINE_MRAYS_PER_CHIP = 250.0

WIDTH, HEIGHT, SPP, DEPTH = 800, 600, 32, 50


def main() -> int:
    from tracer.render import camera as camera_mod
    from tracer.render import renderer
    from tracer.scene import builders, config

    params = config.read_scene_params(io.StringIO(config.default_config_text()))
    scene = builders.create_scene(params, texture_loader=lambda _: None)

    lookfrom, lookat = camera_mod.camera_path_position(
        params.camera_path, 0, params.num_frames
    )
    cam = camera_mod.build_camera_data(
        origin=lookfrom, look_at=lookat, width=WIDTH, height=HEIGHT,
        vfov=params.fov_degrees,
    )

    def run(cam):
        fb = renderer.render_frame(
            scene, cam, WIDTH, HEIGHT, spp=SPP, max_depth=DEPTH, chunk=65536,
            early_exit=True,
        )
        # block_until_ready does not reliably block on the tunneled axon
        # backend; a (tiny) host fetch is the only trustworthy sync.
        float(fb[0, 0, 0])
        return fb

    run(cam)  # compile
    # Time 3 frames with distinct camera params (defeats any caching).
    times = []
    for k in range(1, 4):
        lf, la = camera_mod.camera_path_position(params.camera_path, k, params.num_frames)
        cam_k = camera_mod.build_camera_data(
            origin=lf, look_at=la, width=WIDTH, height=HEIGHT, vfov=params.fov_degrees
        )
        t0 = time.perf_counter()
        run(cam_k)
        times.append(time.perf_counter() - t0)

    best = min(times)
    rays = WIDTH * HEIGHT * SPP
    mrays = rays / best / 1e6
    print(
        json.dumps(
            {
                "metric": "fwd_mrays_per_s",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / BASELINE_MRAYS_PER_CHIP, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
