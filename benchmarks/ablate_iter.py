"""Per-iteration cost attribution for the persistent megakernel.

Two controlled workloads with EXACT per-lane iteration counts:

  miss  — n spheres far behind the camera: every sample misses on its
          first bounce, so path length L = 1 and every iteration pays
          the full regen + intersection + shade + fold sequence.
  lam   — same n spheres + one huge lambertian sphere enclosing the
          camera: paths never die, L = max_depth exactly, regen costs
          amortize over L bounces.

Iteration counts are MEASURED per tile with the kernel's debug_iters
counter (numerical edge deaths make the analytic count optimistic), so

    ns_per_iter = T / sum_tiles(iters_tile)

and a linear fit of ns_per_iter vs n_pad splits the per-prim-row slope
(the elementwise intersection tests) from the fixed per-iteration
intercept (regen + winner join + shade + loop/state overhead).

Usage: python benchmarks/ablate_iter.py [spp] — prints a TSV.
Run alone, the tunneled chip is single-session.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tracer.pallas import megakernel
from tracer.pallas.kernel_lib import PERSIST_UNROLL, _round_up
from tracer.render import camera as C
from tracer.scene import types as T

W, H, DEPTH_LAM = 800, 600, 8
SPP = int(sys.argv[1]) if len(sys.argv) > 1 else 32
TILES = (W * H + 127) // 128


def _scene(n, enclose):
    g = np.random.default_rng(0)
    centers = g.uniform(-20, 20, size=(n, 3)).astype(np.float32)
    # camera looks along +x (z-up convention): park the field far behind
    centers[:, 0] = g.uniform(-1000.0, -900.0, size=n)
    radii = g.uniform(0.3, 1.2, size=n).astype(np.float32)
    mat = np.zeros(n, np.int32)
    if enclose:
        centers = np.concatenate([centers, [[0, 0, 0]]]).astype(np.float32)
        radii = np.concatenate([radii, [1e4]]).astype(np.float32)
        mat = np.concatenate([mat, [0]]).astype(np.int32)
    spheres = T.make_spheres(centers, radii, mat)
    mats = T.make_materials(
        [T.LAMBERTIAN], [0.0], [1.0], np.zeros((1, 3)),
        [[0.5, 0.5, 0.5]], [[0.0, 0.0, 0.0]], [-1],
    )
    return T.Scene(spheres, T.empty_planes(), mats, None, None)


_probe = jax.jit(lambda x: x.ravel()[0])


def _time(fn, *args):
    out = fn(*args)
    float(_probe(out))  # compile + sync (4-byte fetch, not the whole fb)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        float(_probe(out))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    cam = C.build_camera_data([0, 0, 0], [10, 0, 0], W, H, 60.0,
                              background=(0.5, 0.6, 0.7))
    assert not np.isnan(np.asarray(cam.pixel00_loc)).any(), "degenerate camera"
    print("workload\tn\tn_pad\ts\tns_per_iter", flush=True)
    rows = {"miss": [], "lam": []}
    for n in (1, 64, 128, 256, 512, 1024, 2048):
        for wl in ("miss", "lam"):
            enclose = wl == "lam"
            scene = _scene(n, enclose)
            L = DEPTH_LAM if enclose else 1
            md = DEPTH_LAM if enclose else 5
            fn = lambda c: megakernel.render_frame_pallas(
                scene, c, W, H, spp=SPP, max_depth=md, fast_math=True,
            )
            t = _time(fn, cam)
            dbg = np.asarray(megakernel.render_frame_pallas(
                scene, cam, W, H, spp=SPP, max_depth=md, fast_math=True,
                debug_iters=True))
            iters = float(dbg[:, :, 0].mean())  # every pixel carries its
            # tile's count, so the pixel mean IS the tile mean
            nspi = t / (TILES * iters) * 1e9
            n_tot = n + (1 if enclose else 0)
            rows[wl].append((_round_up(max(n_tot, 8), 8), nspi))
            print(f"{wl}\t{n}\t{_round_up(max(n_tot, 8), 8)}\t{t:.4f}\t{nspi:.1f}",
                  flush=True)
    for wl, pts in rows.items():
        x = np.array([p[0] for p in pts], np.float64)
        y = np.array([p[1] for p in pts], np.float64)
        slope, icept = np.polyfit(x, y, 1)
        print(f"# {wl}: slope {slope*1000:.2f} ps/(prim-row*iter), "
              f"intercept {icept:.1f} ns/iter", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
