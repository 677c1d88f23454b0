"""Differentiable bounce replay: the fast backward for the megakernel.

The remat backward (renderer.render_frame under jax.grad) re-runs the
full O(prims)-per-bounce intersection search in reverse — that search
dominated round-1's 1.9 Mrays/s fwd+bwd. The round-2 design splits the
work the TPU way:

  forward : megakernel.render_frame_pallas_record — the fused Pallas
            kernel, which ALSO writes the winning primitive index of
            every (pixel, sample, bounce) to HBM (an index "tape").
  backward: this module re-shades every bounce in pure JAX by GATHERING
            the recorded winner (t / point / normal / uv recomputed
            differentiably from that one primitive's parameters —
            reference camera.cu:218-288 semantics via the shared
            integrator code) and lets autodiff transpose it. No search:
            O(1) primitives per bounce instead of O(prims).

The replay consumes bit-identical RNG streams (seeds depend only on
(pixel, sample), tracer.core.rng), takes the same discrete branches,
and reproduces the forward radiance — which doubles as the correctness
check (tests/test_grad.py). Gradients follow the straight-through
convention for the discrete winner choice (SURVEY.md §7 stage 6), the
same convention the remat path and the BVH intersector already use.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tracer.core import rng
from tracer.geometry import plane as plane_mod
from tracer.geometry import sphere as sphere_mod
from tracer.render import camera as camera_mod
from tracer.render import hit as hit_mod
from tracer.render import hit_fast
from tracer.render import integrator
from tracer.render import renderer
from tracer.scene.types import K_INFINITY, Scene


def _joined_hit_recorded(scene: Scene, origin, direction, rec_idx):
    """JoinedHit for the RECORDED winner (packed index: spheres then
    planes, -1 = miss) — differentiable, no search."""
    r = origin.shape[0]
    hit = rec_idx >= 0
    num_s, num_p = scene.num_spheres, scene.num_planes
    is_sphere = hit & (rec_idx < num_s)
    safe_idx = jnp.maximum(rec_idx, 0)

    if num_s > 0:
        s_idx = jnp.clip(jnp.where(is_sphere, safe_idx, 0), 0, num_s - 1)
        t_s = sphere_mod.sphere_t_gathered(
            origin, direction,
            scene.spheres.center[s_idx], scene.spheres.radius[s_idx],
            hit_mod.T_MIN, hit_mod.T_MAX,
        )
    else:
        s_idx = jnp.zeros((r,), jnp.int32)
        t_s = jnp.full((r,), K_INFINITY)
    if num_p > 0:
        pla = scene.planes
        p_idx = jnp.clip(jnp.where(is_sphere, 0, safe_idx - num_s), 0, num_p - 1)
        t_p = plane_mod.plane_t_gathered(
            origin, direction, pla.ptype[p_idx], pla.base[p_idx], pla.u[p_idx],
            pla.v[p_idx], pla.normal[p_idx], pla.d[p_idx], pla.w[p_idx],
            hit_mod.T_MIN, hit_mod.T_MAX,
        )
    else:
        p_idx = jnp.zeros((r,), jnp.int32)
        t_p = jnp.full((r,), K_INFINITY)

    t_best = jnp.where(hit, jnp.where(is_sphere, t_s, t_p), K_INFINITY)
    rec = hit_mod._winner_record(
        scene, origin, direction, t_best, hit, is_sphere, s_idx, p_idx
    )
    mats = scene.materials
    midx = rec.material_idx
    return hit_fast.JoinedHit(
        hit=rec.hit, t=rec.t, point=rec.point, normal=rec.normal,
        front_face=rec.front_face, u=rec.u, v=rec.v,
        mtype=mats.mtype[midx], fuzz=mats.fuzz[midx], ir=mats.ir[midx],
        absorption=mats.absorption[midx], albedo=mats.albedo[midx],
        emit=mats.emit[midx], tex_id=mats.tex_id[midx],
    )


def render_pixels_replay(
    scene: Scene,
    cam: camera_mod.CameraData,
    i_flat,
    j_flat,
    base_seed,
    idx,
    spp: int,
    max_depth: int,
    chunk: int = renderer.DEFAULT_CHUNK,
    stratify: bool = False,
    sample_start: int = 0,
    strat_sqrt_spp: int = 0,
):
    """Raw sample sums [N, 3] by replaying the recorded index tape.

    Mirrors renderer.render_pixels exactly (same seeds, rays, chunking),
    with the per-bounce intersection replaced by the recorded gather.
    idx: [spp, max_depth, N] i32.
    """
    n = i_flat.shape[0]
    chunk = min(chunk, n)
    pad = (-n) % chunk
    if pad:
        i_flat = jnp.pad(i_flat, (0, pad))
        j_flat = jnp.pad(j_flat, (0, pad))
        base_seed = jnp.pad(base_seed, (0, pad))
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, pad)), constant_values=-1)
    num_chunks = (n + pad) // chunk

    sqrt_spp = (strat_sqrt_spp or int(round(spp ** 0.5))) if stratify else 0

    def one_sample(i, j, base, s, idx_s):
        seed = rng.sample_seed(base, s)
        seed, origin, direction = camera_mod.get_rays(
            cam, i, j, seed, sample_index=s if stratify else None, sqrt_spp=sqrt_spp
        )
        beta = jnp.ones_like(origin)
        final = jnp.zeros_like(origin)
        alive = seed == seed
        carry = (origin, direction, beta, final, seed, alive)

        def body(carry, idx_row):
            fn = lambda sc, o, d, _i: _joined_hit_recorded(sc, o, d, idx_row)
            return (
                integrator._bounce(scene, cam.background, carry, None,
                                   joined_hit_fn=fn),
                None,
            )

        carry, _ = jax.lax.scan(body, carry, idx_s)  # idx_s: [D, chunk]
        return carry[3]

    one_sample = jax.checkpoint(one_sample)

    def per_chunk(args):
        i, j, base, idx_c = args  # idx_c: [spp, D, chunk]

        def body(acc, xs):
            s, idx_s = xs
            return acc + one_sample(i, j, base, s, idx_s), None

        acc0 = jnp.zeros_like(i, dtype=jnp.float32, shape=(chunk, 3))
        samples = jnp.arange(spp, dtype=jnp.uint32) + jnp.uint32(sample_start)
        acc, _ = jax.lax.scan(body, acc0, (samples, idx_c))
        return acc

    i_c = i_flat.reshape(num_chunks, chunk)
    j_c = j_flat.reshape(num_chunks, chunk)
    seed_c = base_seed.reshape(num_chunks, chunk)
    # [spp, D, C, chunk] -> [C, spp, D, chunk] so lax.map slices chunks
    idx_c = jnp.moveaxis(
        idx.reshape(spp, max_depth, num_chunks, chunk), 2, 0
    )
    fb = jax.lax.map(per_chunk, (i_c, j_c, seed_c, idx_c)).reshape(-1, 3)
    return fb[:n]


@partial(
    jax.jit,
    static_argnames=("width", "height", "spp", "max_depth", "reference_quirk",
                     "chunk", "stratify", "strat_sqrt_spp"),
)
def render_frame_replay(
    scene: Scene,
    cam: camera_mod.CameraData,
    idx,
    width: int,
    height: int,
    spp: int,
    max_depth: int,
    reference_quirk: bool = True,
    chunk: int = renderer.DEFAULT_CHUNK,
    stratify: bool = False,
    sample_start: int = 0,
    strat_sqrt_spp: int = 0,
):
    """Replayed frame render; must reproduce the recording forward's
    radiance (same streams, same branches — validated in tests)."""
    i_flat, j_flat, base_seed = renderer.pixel_grid(width, height, reference_quirk)
    fb = render_pixels_replay(
        scene, cam, i_flat, j_flat, base_seed, idx, spp, max_depth,
        chunk=chunk, stratify=stratify, sample_start=sample_start,
        strat_sqrt_spp=strat_sqrt_spp,
    )
    return fb.reshape(height, width, 3)
