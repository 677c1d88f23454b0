"""Animation frame driver: camera path, per-frame timing TSV, savers.

TPU-native analog of reference `gpu_render` / `cpu_render`
(src/camera.cu:290-394): a sequential frame loop evaluating the
sinusoidal camera path, rendering with the jitted frame renderer (the
compile is amortized across frames — same shapes), timing each frame
with `block_until_ready` (the cudaEvent analog, camera.cu:333-343), and
printing the identical `frame \t ms \t total_rays` TSV (camera.cu:344-346)
from which Mrays/s is derived offline.
"""

from __future__ import annotations

import sys
import time

import numpy as np

from tracer.io import image as image_io
from tracer.render import camera as camera_mod
from tracer.render import renderer
from tracer.scene.params import SceneParams
from tracer.scene.types import Scene


def _sync_probe(fb):
    import jax

    global _sync_probe_jit
    try:
        return _sync_probe_jit(fb)
    except NameError:
        _sync_probe_jit = jax.jit(lambda x: x[0, 0, 0])
        return _sync_probe_jit(fb)


def render_animation(
    scene: Scene,
    params: SceneParams,
    intersector: str = "fast",
    saver: str = "bin",
    out=sys.stdout,
    reference_quirk: bool = True,
    chunk: int = renderer.DEFAULT_CHUNK,
    frames=None,
    early_exit: bool = True,
    engine: str = "xla",
    saver_spp_quirk: bool = True,
    mesh=None,
    rng_mode: str = "fixed",
    stratify: bool = False,
    fast_math: bool = False,
    retries: int = 0,
    rr_start=None,
    spp_chunk=None,
):
    """Render `params.num_frames` frames; returns the last framebuffer.

    `spp_chunk` (pallas engine): samples per kernel dispatch; None =
    auto (bounds each dispatch at ~128M rays so reference-scale spp
    counts neither risk the tunneled worker's long-dispatch kill nor
    lose progress granularity). The chunk sum equals the one-dispatch
    frame up to f32 addition order.

    `saver` picks the output writer ('bin' matches the reference drivers,
    camera.cu:300; 'png'/'ppm' also available). `frames` optionally
    restricts to an iterable of frame indices. `engine` selects the
    compute path: "xla" (chunked renderer, any intersector, textures) or
    "pallas" (fused megakernel; untextured scenes only — interpret mode
    is used automatically off-TPU).

    `saver_spp_quirk`: the reference drivers construct their savers with
    sqrt_rays_per_pixel while accumulating sqrt_spp^2 samples
    (camera.cu:300/357 vs :319-320), so reference image bytes are
    quantize(sum / sqrt_spp) — over-bright by sqrt(spp) in linear terms.
    True (default) replicates that for byte parity with reference
    output; False divides by the true sample count.

    `mesh`: optional jax.sharding.Mesh — tile-shards each frame over it
    (tracer.dist.sharding) instead of the single-device renderer.
    """
    sqrt_spp = params.render.sqrt_rays_per_pixel
    spp = sqrt_spp * sqrt_spp  # camera.cu:319-320
    saver_divisor = sqrt_spp if saver_spp_quirk else spp
    width, height = params.width, params.height
    writer = image_io.SAVERS[saver]
    rays = renderer.total_rays(width, height, sqrt_spp)

    # Async writer: quantize + encode + disk write happen on a background
    # thread so the accelerator starts frame n+1 while frame n is being
    # written (the reference writes synchronously in-loop,
    # camera.cu:211-215). bin/ppm use the native C++ writer when built;
    # png (and any native-less install) uses the Python thread writer.
    async_writer = None
    if saver in ("bin", "ppm"):
        try:
            from tracer.io import native as io_native

            if io_native.available():
                async_writer = io_native.AsyncFrameWriter()
        except Exception:
            async_writer = None
    if async_writer is None:
        async_writer = image_io.ThreadedWriter()

    fb = None
    frame_iter = range(params.num_frames) if frames is None else frames
    for n in frame_iter:
        # one-dispatch fused path eval + camera build (camera.cu:303-324;
        # the eager composition costs ~100 device roundtrips per frame
        # through a remote backend)
        cam = camera_mod.camera_at(
            params.camera_path, n, params.num_frames, width, height,
            params.fov_degrees, background=(0.0, 0.0, 0.0),  # camera.cu:323
        )
        t0 = time.perf_counter()
        if engine == "pallas" and rng_mode != "fixed":
            # the megakernel implements only the fixed-budget RNG
            print(f"pallas engine does not support rng_mode={rng_mode!r}; "
                  "using XLA", file=sys.stderr)
            engine = "xla"

        def render_frame_once():
            nonlocal engine  # a PallasUnsupported fallback sticks across frames
            fb_dev = None
            if engine == "pallas":
                from tracer.pallas import megakernel
                import jax

                try:
                    if mesh is not None:
                        from tracer.dist import sharding

                        fb_dev = sharding.render_frame_pallas_sharded(
                            scene, cam, width, height, spp,
                            params.render.max_depth, mesh,
                            reference_quirk=reference_quirk,
                            interpret=jax.default_backend() == "cpu",
                            stratify=stratify, fast_math=fast_math,
                            rr_start=rr_start,
                        )
                    else:
                        # Bound single-dispatch duration: the megakernel
                        # renders all spp in one kernel, and at reference
                        # scale (config.txt = 2500 spp at 1080x720 = 1.9G
                        # rays ~= 80 s) one dispatch risks the tunneled
                        # worker's long-dispatch kill (docs/ROADMAP.md) and
                        # gives no progress granularity. Chunk the sample
                        # axis so each dispatch stays <= ~128M rays; the
                        # summed chunk frames are the identical estimator
                        # up to f32 addition order (disjoint global sample
                        # ids via sample_start — measured on v5e: chunked
                        # 2500 spp runs at 23.4 Mrays/s, no slower than
                        # one-dispatch).
                        ch = spp_chunk
                        if ch is None:
                            max_rays = 128 * 1024 * 1024
                            ch = max(1, max_rays // (width * height))
                        fb_dev = None
                        for c0 in range(0, spp, ch):
                            part = megakernel.render_frame_pallas(
                                scene, cam, width, height,
                                spp=min(ch, spp - c0),
                                max_depth=params.render.max_depth,
                                reference_quirk=reference_quirk,
                                interpret=jax.default_backend() == "cpu",
                                stratify=stratify, fast_math=fast_math,
                                rr_start=rr_start, sample_start=c0,
                            )
                            fb_dev = part if fb_dev is None else fb_dev + part
                except megakernel.PallasUnsupported as e:
                    print(f"pallas engine unavailable ({e}); using XLA",
                          file=sys.stderr)
                    engine = "xla"
            if fb_dev is not None:
                pass  # pallas rendered above (sharded when a mesh was given)
            elif mesh is not None:
                from tracer.dist import sharding

                fb_dev = sharding.render_frame_sharded(
                    scene, cam, width, height, spp,
                    params.render.max_depth, mesh,
                    intersector=intersector, reference_quirk=reference_quirk,
                    chunk=chunk, rng_mode=rng_mode, stratify=stratify,
                    rr_start=rr_start,
                )
            else:
                fb_dev = renderer.render_frame(
                    scene, cam, width, height, spp=spp,
                    max_depth=params.render.max_depth, intersector=intersector,
                    reference_quirk=reference_quirk, chunk=chunk, early_exit=early_exit,
                    rng_mode=rng_mode, stratify=stratify, rr_start=rr_start,
                )
            # A tiny host fetch is the reliable sync (block_until_ready
            # does not block on some tunneled backends); cudaEvent analog.
            # The probe is jitted so the sync costs ONE dispatch + one
            # scalar fetch instead of an eager slice + fetch roundtrip.
            float(_sync_probe(fb_dev))
            return fb_dev

        if retries > 0:
            # ride through transient backend failures (preempted worker,
            # dropped tunnel) — the reference has no failure story at all
            from tracer.utils import resilience

            fb_dev = resilience.retry_transient(
                render_frame_once, retries=retries,
                on_retry=lambda k, e: print(
                    f"tracer: frame {n} transient backend failure "
                    f"(retry {k}): {str(e).splitlines()[0][:120]}",
                    file=sys.stderr),
            )
        else:
            fb_dev = render_frame_once()
        ms = (time.perf_counter() - t0) * 1e3
        print(f"{n}\t{ms}\t{rays}", file=out)

        fb = np.asarray(fb_dev)
        try:
            filename = params.output_path % n  # snprintf(path, n), camera.cu:298-300
        except TypeError:
            filename = params.output_path
        if async_writer is not None:
            async_writer.submit(filename, fb, saver_divisor, fmt=saver)
        else:
            writer(filename, fb, saver_divisor)
    if async_writer is not None:
        # close() drains + re-raises worker errors AND always joins the
        # thread (a separate wait() first would skip cleanup on error)
        async_writer.close()
    return fb
