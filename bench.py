"""Benchmark: forward path-trace throughput on the canonical scene.

Renders the reference config.txt scene (SURVEY.md §6: ~105 planes + ~94
spheres) at 800x600, 32 spp, depth 50 (BASELINE.md measurement config 3)
on the default JAX backend and prints ONE JSON line:

  {"metric": "fwd_mrays_per_s", "value": N, "unit": "Mrays/s",
   "vs_baseline": N, "engine": "..."}

`vs_baseline` is measured Mrays/s divided by the BASELINE.json single-
chip target (1 Grays/s on a v5p-8 ~= 250 Mrays/s per chip; this chip is
a v5e, but the target is kept fixed so rounds are comparable).

The fused Pallas megakernel (packet-culled) is tried first; the chunked
XLA renderer is the fallback. Timing syncs with a tiny host fetch
(block_until_ready does not block on the tunneled axon backend), and the
measurement runs in a watchdog subprocess so a dead TPU tunnel produces
a JSON error line instead of a hang.
"""

from __future__ import annotations

import io
import json
import os
import subprocess
import sys
import time

BASELINE_MRAYS_PER_CHIP = 250.0

WIDTH, HEIGHT, SPP, DEPTH = 800, 600, 32, 50
CHILD_TIMEOUT_S = int(os.environ.get("TRACER_BENCH_TIMEOUT", "1500"))


def _measure() -> int:
    from tracer.render import camera as camera_mod
    from tracer.render import renderer
    from tracer.scene import builders, config

    params = config.read_scene_params(io.StringIO(config.default_config_text()))
    scene = builders.create_scene(params, texture_loader=lambda _: None)

    def cam_at(k):
        lf, la = camera_mod.camera_path_position(params.camera_path, k, params.num_frames)
        return camera_mod.build_camera_data(
            origin=lf, look_at=la, width=WIDTH, height=HEIGHT, vfov=params.fov_degrees
        )

    def run_pallas(cam):
        from tracer.pallas import megakernel

        fb = megakernel.render_frame_pallas(
            scene, cam, WIDTH, HEIGHT, spp=SPP, max_depth=DEPTH,
            tile_px=128,  # 128-px tiles exit the bounce loop most coherently
            fast_math=True,  # bf16x3 matmuls: statistically identical images
        )
        float(fb[0, 0, 0])  # reliable sync (tiny host fetch)
        return fb

    def run_xla(cam):
        fb = renderer.render_frame(
            scene, cam, WIDTH, HEIGHT, spp=SPP, max_depth=DEPTH, chunk=16384,
            early_exit=True,
        )
        float(fb[0, 0, 0])
        return fb

    engine, run = "pallas", run_pallas
    try:
        run(cam_at(0))  # compile check
    except Exception as e:
        print(f"pallas engine unavailable ({type(e).__name__}); falling back to XLA",
              file=sys.stderr)
        engine, run = "xla", run_xla
        run(cam_at(0))

    # Time 3 frames with distinct camera params (defeats any caching).
    times = []
    for k in range(1, 4):
        t0 = time.perf_counter()
        run(cam_at(k))
        times.append(time.perf_counter() - t0)

    best = min(times)
    mrays = WIDTH * HEIGHT * SPP / best / 1e6
    print(
        json.dumps(
            {
                "metric": "fwd_mrays_per_s",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / BASELINE_MRAYS_PER_CHIP, 4),
                "engine": engine,
            }
        )
    )
    return 0


def main() -> int:
    if os.environ.get("TRACER_BENCH_CHILD") == "1":
        return _measure()

    env = dict(os.environ, TRACER_BENCH_CHILD="1")
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, timeout=CHILD_TIMEOUT_S, capture_output=True, text=True,
        )
        sys.stdout.write(r.stdout)
        sys.stderr.write(r.stderr[-2000:])
        return r.returncode
    except subprocess.TimeoutExpired as e:
        if e.stdout:
            out = e.stdout.decode() if isinstance(e.stdout, bytes) else e.stdout
            if '"metric"' in out:  # child measured but hung on teardown
                sys.stdout.write(out)
                return 0
        print(
            json.dumps(
                {
                    "metric": "fwd_mrays_per_s",
                    "value": 0.0,
                    "unit": "Mrays/s",
                    "vs_baseline": 0.0,
                    "error": "accelerator backend unreachable (watchdog timeout)",
                }
            )
        )
        return 1


if __name__ == "__main__":
    sys.exit(main())
