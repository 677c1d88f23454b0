"""Primitive-count scaling curve: brute vs culled vs XLA-BVH on TPU.

Settles the >2K-prim acceleration-structure question with data
(reference analog: the BVH `include/bvh.h:19-65` is the reference's
core scaling device; ours must either win somewhere or have its ceiling
written down). Scenes are non-overlapping sphere grids (so the kernel's
static interior-free proof can drop the far root under fast_math) at
N in {2000, 5000, 10000, 20000}, rendered at 800x600.

Engines:
  brute     - Pallas persistent megakernel, cluster_k=0 (the default)
  culled    - Pallas demand-driven packet culling, cluster_k=16
  xla-bvh   - XLA renderer with the wavefront short-stack BVH traversal

Each (engine, N) measurement runs in ITS OWN SUBPROCESS: big XLA-BVH
renders have crashed the tunneled TPU worker before (docs/ROADMAP.md),
and a worker crash must not take the rest of the sweep down. One retry
per cell on a dead-child (the worker self-restarts in ~2 min).

Usage:
  python benchmarks/prim_scaling.py                   # full sweep, TSV
  python benchmarks/prim_scaling.py --ns 2000,5000
  python benchmarks/prim_scaling.py --engines brute,culled
  python benchmarks/prim_scaling.py --cell brute 2000  # one measurement
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

WIDTH = int(os.environ.get("PRIM_SCALING_W", "800"))
HEIGHT = int(os.environ.get("PRIM_SCALING_H", "600"))
SPP = int(os.environ.get("PRIM_SCALING_SPP", "4"))
DEPTH = int(os.environ.get("PRIM_SCALING_DEPTH", "10"))
CELL_TIMEOUT_S = 1500
RETRY_WAIT_S = 150


def build_field(n):
    """Non-overlapping sphere field + floor quad (same construction as
    bench.py's config-5 scene, scaled to n)."""
    import numpy as np

    from tracer.scene import types as T

    g = np.random.default_rng(3)
    cols = int(np.ceil(np.sqrt(n * 1.25)))
    rows = int(np.ceil(n / cols))
    radii = g.uniform(0.3, 0.95, size=(n,)).astype(np.float32)
    gx, gy = np.meshgrid(np.arange(cols), np.arange(rows), indexing="ij")
    cell = np.stack(
        [gx.ravel() * 2.0 - (cols - 1.0), gy.ravel() * 2.0 - (rows - 1.0)], -1
    )[:n]
    slack = (1.0 - radii - 0.02)[:, None]
    centers = np.zeros((n, 3), np.float32)
    centers[:, :2] = cell + g.uniform(-1, 1, size=(n, 2)) * slack
    centers[:, 2] = radii + 0.05 + g.uniform(0, 6, size=(n,))
    half = float(cols + 10)
    mats = T.make_materials(
        mtype=np.array([T.LAMBERTIAN, T.METAL, T.DIFFUSE_LIGHT], np.int32),
        fuzz=np.array([0, 0.2, 0], np.float32),
        ir=np.ones(3, np.float32),
        absorption=np.zeros((3, 3), np.float32),
        albedo=np.array(
            [[0.7, 0.5, 0.4], [0.8, 0.8, 0.9], [0, 0, 0]], np.float32
        ),
        emit=np.array([[0, 0, 0], [0, 0, 0], [9, 8, 7]], np.float32),
        tex_id=np.full(3, -1, np.int32),
    )
    scene = T.Scene(
        spheres=T.make_spheres(
            centers, radii, (np.arange(n) % 3).astype(np.int32)
        ),
        planes=T.make_planes(
            np.array([T.QUAD], np.int32),
            np.array([[-half, -half, 0]], np.float32),
            np.array([[2 * half, 0, 0]], np.float32),
            np.array([[0, 2 * half, 0]], np.float32),
            np.array([0], np.int32),
        ),
        materials=mats,
        textures=None,
        bvh=None,
    )
    return scene, cols


def cam_for(cols):
    import numpy as np

    from tracer.render import camera as camera_mod

    d = cols * 1.6
    return camera_mod.build_camera_data(
        origin=[d, 0.0, d * 0.45], look_at=[0.0, 0.0, 3.0],
        width=WIDTH, height=HEIGHT, vfov=55.0,
    )


def measure_cell(engine, n, rr_start):
    import jax

    if os.environ.get("PRIM_SCALING_CPU"):
        # the container sitecustomize pins the tunneled TPU backend via
        # jax.config, overriding JAX_PLATFORMS — counter it explicitly
        # (CPU smoke runs must never contend with a TPU job)
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    scene, cols = build_field(n)
    cam = cam_for(cols)
    probe = jax.jit(lambda x: x[0, 0, 0])

    if engine in ("brute", "culled"):
        from tracer.pallas import megakernel

        ck = 0 if engine == "brute" else 16

        def run():
            fb = megakernel.render_frame_pallas(
                scene, cam, WIDTH, HEIGHT, spp=SPP, max_depth=DEPTH,
                fast_math=True, cluster_k=ck, rr_start=rr_start,
            )
            float(probe(fb))
    elif engine == "xla-bvh":
        from tracer.bvh import builder as bvh_builder
        from tracer.render import renderer

        bvh = bvh_builder.build_bvh_arrays(
            np.asarray(scene.spheres.center),
            np.asarray(scene.spheres.radius),
            np.asarray(scene.planes.base),
            np.asarray(scene.planes.u),
            np.asarray(scene.planes.v),
            np.asarray(scene.planes.ptype),
        )
        scene = scene._replace(bvh=bvh)

        def run():
            fb = renderer.render_frame(
                scene, cam, WIDTH, HEIGHT, spp=SPP, max_depth=DEPTH,
                intersector="bvh", chunk=16384, early_exit=True,
                rr_start=rr_start,
            )
            float(probe(fb))
    else:
        raise ValueError(engine)

    run()  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    best = min(times)
    return {
        "engine": engine, "n": n, "rr_start": rr_start,
        "seconds": round(best, 3),
        "mrays_per_s": round(WIDTH * HEIGHT * SPP / best / 1e6, 3),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", default="2000,5000,10000,20000")
    ap.add_argument("--engines", default="brute,culled,xla-bvh")
    ap.add_argument("--rr", type=int, default=3,
                    help="rr_start bounce (-1 = off)")
    ap.add_argument("--cell", nargs=2, metavar=("ENGINE", "N"), default=None)
    args = ap.parse_args()
    rr = None if args.rr < 0 else args.rr

    if args.cell:
        rec = measure_cell(args.cell[0], int(args.cell[1]), rr)
        print(json.dumps(rec), flush=True)
        return 0

    ns = [int(x) for x in args.ns.split(",") if x]
    engines = [e for e in args.engines.split(",") if e]
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compilation_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.0")
    print("engine\tn\tseconds\tMrays/s", flush=True)
    for n in ns:
        for engine in engines:
            rec = None
            for attempt in range(2):
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--cell", engine, str(n), "--rr", str(args.rr)],
                    env=env, capture_output=True, text=True,
                    timeout=CELL_TIMEOUT_S,
                )
                for line in proc.stdout.splitlines():
                    if line.startswith("{"):
                        rec = json.loads(line)
                        break
                if rec:
                    break
                sys.stderr.write(
                    f"[{engine} n={n}] child rc={proc.returncode}; "
                    f"stderr tail: {proc.stderr[-500:]}\n"
                )
                if attempt == 0:
                    time.sleep(RETRY_WAIT_S)  # let a crashed worker revive
            if rec:
                print(f"{engine}\t{n}\t{rec['seconds']}\t"
                      f"{rec['mrays_per_s']}", flush=True)
            else:
                print(f"{engine}\t{n}\tFAILED\tFAILED", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
