"""Scaling-efficiency benchmark: Mrays/s at 1..N devices.

BASELINE.md target: >= 90% scaling efficiency at N >= 2 hosts. This
harness measures the tile-sharded renderer (tracer.dist.sharding) on
meshes of growing size over whatever devices the backend exposes —
real chips on a pod slice, or the virtual CPU mesh for a functional
check (virtual devices share host cores, so CPU efficiency numbers are
not meaningful; the harness exists so pod runs are one command).

Usage:
  python benchmarks/scaling.py [--width 800] [--height 600] [--spp 8]
                               [--depth 20] [--devices 1,2,4,8]
                               [--engine xla|pallas]

Prints one TSV row per mesh size: n_devices, seconds, Mrays/s,
efficiency (vs 1 device).
"""

from __future__ import annotations

import argparse
import io
import sys
import time

import jax


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--depth", type=int, default=20)
    ap.add_argument("--devices", type=str, default="")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend (virtual mesh)")
    ap.add_argument("--engine", choices=("xla", "pallas"), default="xla",
                    help="sharded engine: chunked XLA renderer or the fused "
                         "Pallas megakernel (row-band shard_map)")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)

    from tracer.dist import sharding
    from tracer.render import camera as camera_mod
    from tracer.scene import builders, config

    devices = jax.devices()
    counts = (
        [int(x) for x in args.devices.split(",")]
        if args.devices
        else sorted({1, 2, len(devices)} & set(range(1, len(devices) + 1)) | {1})
    )
    counts = [c for c in counts if c <= len(devices)]

    params = config.read_scene_params(io.StringIO(config.default_config_text()))
    scene = builders.create_scene(params, texture_loader=lambda _: None)
    lf, la = camera_mod.camera_path_position(params.camera_path, 0, params.num_frames)
    cam = camera_mod.build_camera_data(
        origin=lf, look_at=la, width=args.width, height=args.height,
        vfov=params.fov_degrees,
    )

    rays = args.width * args.height * args.spp
    base_rate = None
    print("n_devices\tseconds\tMrays_per_s\tefficiency")
    for n in counts:
        mesh = sharding.make_mesh(devices[:n])

        def run():
            if args.engine == "pallas":
                fb = sharding.render_frame_pallas_sharded(
                    scene, cam, args.width, args.height, args.spp, args.depth,
                    mesh, interpret=jax.default_backend() == "cpu",
                    fast_math=True,
                )
            else:
                fb = sharding.render_frame_sharded(
                    scene, cam, args.width, args.height, args.spp, args.depth, mesh
                )
            float(fb[0, 0, 0])  # reliable sync

        run()  # compile
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
        rate = rays / dt / 1e6
        if base_rate is None:
            base_rate = rate / counts[0]  # per-device rate of the first mesh
        eff = (rate / n) / base_rate
        print(f"{n}\t{dt:.3f}\t{rate:.2f}\t{eff:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
