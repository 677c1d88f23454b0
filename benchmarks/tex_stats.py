"""Texture-tax breakdown on the canonical textured scene.

Uses the kernel's debug_iters counters (R = persistent-loop iterations,
G = texture demand-loop iterations, B = DMA block misses, all per tile)
to attribute the textured-vs-untextured gap (19.7 vs 37.5 Mrays/s in
BENCH_r03) between demand-loop serve cost and DMA wait.

Usage: python benchmarks/tex_stats.py [spp]
"""

from __future__ import annotations

import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import WIDTH, HEIGHT, DEPTH, _floor_texture_loader
from tracer.render import camera as camera_mod
from tracer.scene import builders, config
from tracer.pallas import megakernel

SPP = int(sys.argv[1]) if len(sys.argv) > 1 else 32


def main():
    import jax
    probe = jax.jit(lambda x: x[0, 0, 0])

    params = config.read_scene_params(io.StringIO(config.default_config_text()))
    scene_tex = builders.create_scene(params, texture_loader=_floor_texture_loader)
    scene_untex = scene_tex._replace(textures=None)
    cam = camera_mod.camera_at(
        params.camera_path, 1, params.num_frames, WIDTH, HEIGHT,
        params.fov_degrees)

    def timed(scene, **kw):
        def run():
            fb = megakernel.render_frame_pallas(
                scene, cam, WIDTH, HEIGHT, spp=SPP, max_depth=DEPTH,
                fast_math=True, **kw)
            float(probe(fb))
            return fb
        run()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        return best

    t_untex = timed(scene_untex)
    t_tex = timed(scene_tex)
    rays = WIDTH * HEIGHT * SPP
    tiles = (WIDTH * HEIGHT + 127) // 128
    print(f"untextured: {t_untex:.4f}s = {rays / t_untex / 1e6:.1f} Mrays/s")
    print(f"textured:   {t_tex:.4f}s = {rays / t_tex / 1e6:.1f} Mrays/s "
          f"(tax {t_tex - t_untex:.4f}s)")

    dbg = np.asarray(megakernel.render_frame_pallas(
        scene_tex, cam, WIDTH, HEIGHT, spp=SPP, max_depth=DEPTH,
        fast_math=True, debug_iters=True))
    # every pixel of a tile carries the tile's counters; tile = 128 px run
    flat = dbg.reshape(-1, 3)[::128]
    iters, dem, miss = flat[:, 0], flat[:, 1], flat[:, 2]
    dbg_u = np.asarray(megakernel.render_frame_pallas(
        scene_untex, cam, WIDTH, HEIGHT, spp=SPP, max_depth=DEPTH,
        fast_math=True, debug_iters=True))
    iters_u = dbg_u.reshape(-1, 3)[::128][:, 0]

    print(f"tiles {tiles}")
    print(f"loop iters/tile:   tex mean {iters.mean():.1f}  "
          f"untex mean {iters_u.mean():.1f}  (max {iters.max():.0f})")
    print(f"demand iters/tile: mean {dem.mean():.1f}  max {dem.max():.0f}  "
          f"per loop-iter {dem.mean() / iters.mean():.2f}")
    print(f"DMA misses/tile:   mean {miss.mean():.1f}  max {miss.max():.0f}  "
          f"miss rate {miss.sum() / max(dem.sum(), 1):.3f}")
    tax_ns_per_loop_iter = (t_tex - t_untex) / (iters * 1.0).sum() * 1e9
    tax_ns_per_demand = (t_tex - t_untex) / max(dem.sum(), 1) * 1e9
    print(f"tax per loop-iter  {tax_ns_per_loop_iter:.0f} ns "
          f"(vs untex iters: {(t_tex - t_untex) / iters_u.sum() * 1e9:.0f})")
    print(f"tax per demand-it  {tax_ns_per_demand:.0f} ns")
    return 0


if __name__ == "__main__":
    sys.exit(main())
