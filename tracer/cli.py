"""Command-line driver.

Covers the reference CLI (src/main.cu:572-606): no args / `--gpu` render
from a stdin config on the accelerator, `--cpu` on CPU, `--default`
prints the sample config (main.cu:552-570). Extends it with explicit
flags: --config FILE, --backend tpu|cpu, --format bin|png|ppm, --frames,
--bvh, --smoke.

Usage:
  python -m tracer.cli --default > config.txt
  python -m tracer.cli --gpu < config.txt
  python -m tracer.cli --config config.txt --backend tpu --format png
"""

from __future__ import annotations

import argparse
import os
import sys


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="tracer", description=__doc__)
    p.add_argument("--gpu", action="store_true", help="render on the accelerator (reference --gpu)")
    p.add_argument("--cpu", action="store_true", help="render on CPU (reference --cpu)")
    p.add_argument("--default", action="store_true", help="print the sample config and exit")
    p.add_argument("--smoke", action="store_true", help="print the fast smoke-test config and exit")
    p.add_argument("--config", type=str, default=None, help="config file (default: stdin)")
    p.add_argument("--backend", choices=["tpu", "cpu", "auto"], default="auto")
    p.add_argument("--format", choices=["bin", "png", "ppm"], default="bin",
                   help="output format (bin matches the reference BinarySaver)")
    p.add_argument("--frames", type=int, default=None, help="render only the first N frames")
    p.add_argument("--bvh", action="store_true", help="use BVH traversal instead of brute force")
    p.add_argument("--pallas", action="store_true",
                   help="use the fused Pallas megakernel (untextured scenes)")
    p.add_argument("--no-quirk", action="store_true",
                   help="use corrected j*width+i pixel seeding instead of the reference quirk")
    return p


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)

    from tracer.scene import config as config_mod

    if args.default:
        sys.stdout.write(config_mod.default_config_text())
        return 0
    if args.smoke:
        sys.stdout.write(config_mod.smoke_config_text())
        return 0

    backend = args.backend
    if args.cpu:
        backend = "cpu"
    elif args.gpu:
        backend = "auto"
    if backend == "cpu":
        # A sitecustomize may have pinned an accelerator platform via
        # jax.config (which overrides the env var) — force it back.
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    try:
        if args.config:
            with open(args.config) as f:
                params = config_mod.read_scene_params(f)
        else:
            params = config_mod.read_scene_params(sys.stdin)
    except (ValueError, OSError) as e:
        print(f"tracer: bad config: {e}", file=sys.stderr)
        return 2
    if args.frames is not None:
        params.num_frames = min(params.num_frames, args.frames)

    from tracer.render import driver
    from tracer.scene import builders

    scene = builders.create_scene(params, with_bvh=args.bvh)
    out_dir = os.path.dirname(params.output_path)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    driver.render_animation(
        scene,
        params,
        intersector="bvh" if args.bvh else "fast",
        saver=args.format,
        reference_quirk=not args.no_quirk,
        engine="pallas" if args.pallas else "xla",
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
