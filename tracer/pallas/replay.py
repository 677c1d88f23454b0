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


def _recorded_join_table(scene: Scene):
    """[N, 35] per-primitive parameter table for the one-hot winner join
    (spheres then planes — the megakernel's packed order).

    One-hot matmul joins are the TPU-correct replacement for per-ray
    `array[idx]` gathers here: an [R]-indexed gather lowers to a slow
    serial gather AND its VJP is a scatter-add — both glacial on TPU and
    the reason the first replay backward measured SLOWER than remat. A
    matmul's transpose is another matmul (MXU both ways).

    Columns: center3, radius, is_sph, normal3, d, w3, base3, u3, v3,
    ptype, mat13 (mtype, fuzz, ir, abs3, albedo3, emit3, tex_id).
    """
    num_s, num_p = scene.num_spheres, scene.num_planes
    cols = []
    if num_s:
        sph = scene.spheres
        z = jnp.zeros((num_s, 1), jnp.float32)
        z3 = jnp.zeros((num_s, 3), jnp.float32)
        cols.append(jnp.concatenate(
            [sph.center, sph.radius[:, None], jnp.ones((num_s, 1), jnp.float32),
             z3, z, jnp.ones((num_s, 3), jnp.float32),  # w=1: div-safe
             z3, jnp.ones((num_s, 3), jnp.float32), jnp.ones((num_s, 3), jnp.float32),
             z],
            axis=1,
        ))
    if num_p:
        pla = scene.planes
        z = jnp.zeros((num_p, 1), jnp.float32)
        z3 = jnp.zeros((num_p, 3), jnp.float32)
        cols.append(jnp.concatenate(
            [z3, jnp.ones((num_p, 1), jnp.float32), z,  # radius=1 div-safe
             pla.normal, pla.d[:, None], pla.w,
             pla.base, pla.u, pla.v,
             pla.ptype[:, None].astype(jnp.float32)],
            axis=1,
        ))
    geo = jnp.concatenate(cols, axis=0)
    prim_mat_idx = jnp.concatenate(
        ([scene.spheres.material_idx] if num_s else [])
        + ([scene.planes.material_idx] if num_p else [])
    )
    return jnp.concatenate(
        [geo, hit_fast._material_table(scene, prim_mat_idx)], axis=1
    )  # [N, 22 + 13]


def _exact_onehot_mm(onehot, table):
    """onehot (0/1 f32) @ table in THREE bf16 MXU passes, exactly.

    f32 = hi + mid + lo with each part bf16-representable (8+8+8 mantissa
    bits), and 0/1 selectors are bf16-exact, so every partial product is
    exact and the f32 accumulation is as precise as XLA's HIGHEST 6-pass
    emulation at half the passes. With one nonzero per row (a one-hot
    join) the result is BIT-equal to the gather it replaces. This matmul
    is what dominates the replay backward (profiled: ~60% of the grad
    step at HIGHEST), so the pass count is the wall clock.
    """
    oh = onehot.astype(jnp.bfloat16)
    out = None
    x = table
    for _ in range(3):
        part = x.astype(jnp.bfloat16)
        term = jnp.dot(oh, part, preferred_element_type=jnp.float32)
        out = term if out is None else out + term
        x = x - part.astype(jnp.float32)
    return out


@jax.custom_vjp
def _join_exact(onehot, table):
    return _exact_onehot_mm(onehot, table)


def _join_exact_fwd(onehot, table):
    return _exact_onehot_mm(onehot, table), onehot


def _join_exact_bwd(onehot, g):
    # d(table) = onehot^T @ g with the same exact 3-pass split (of g this
    # time); the selector comes from the int tape and takes no cotangent.
    # The [R, N] residual only lives inside one checkpointed scan step.
    return jnp.zeros_like(onehot), _exact_onehot_mm(onehot.T, g)


_join_exact.defvjp(_join_exact_fwd, _join_exact_bwd)


def _joined_hit_recorded(scene: Scene, origin, direction, rec_idx):
    """JoinedHit for the RECORDED winner (packed index: spheres then
    planes, -1 = miss) — differentiable, no search, no gathers."""
    hit = rec_idx >= 0
    num_s, num_p = scene.num_spheres, scene.num_planes
    n = num_s + num_p

    # checkpoint the one-hot join: without it, reverse mode saves every
    # bounce's [R, N] selector as a scan residual — 12 GB at 512x384
    # spp 8 (the no-remat OOM) — even though it is a pure function of the
    # i32 tape. Rematerialized, the residual is the tape row itself and
    # the backward's d(table) transpose is another MXU matmul.
    @jax.checkpoint
    def _join(table, idx_row):
        onehot = (idx_row[:, None] == jnp.arange(n)[None, :]).astype(jnp.float32)
        return _join_exact(onehot, table)

    rec = _join(_recorded_join_table(scene), rec_idx)  # [R, 35]

    center, radius = rec[:, 0:3], rec[:, 3]
    is_sphere = rec[:, 4] > 0.5
    p_normal, p_d, p_w = rec[:, 5:8], rec[:, 8], rec[:, 9:12]
    p_base, p_u, p_v = rec[:, 12:15], rec[:, 15:18], rec[:, 18:21]
    ptype = jnp.round(rec[:, 21]).astype(jnp.int32)
    mtype = jnp.round(rec[:, 22]).astype(jnp.int32)
    fuzz, ir = rec[:, 23], rec[:, 24]
    absorption, albedo, emit = rec[:, 25:28], rec[:, 28:31], rec[:, 31:34]
    tex_id = jnp.round(rec[:, 34]).astype(jnp.int32)
    # miss lanes join all-zero rows; make the div-safe fields safe again
    # (ir especially: 1/ir in the dielectric branch emits 0*inf = NaN
    # into d(ir) through reverse mode even though the forward is masked)
    radius = jnp.where(hit, radius, 1.0)
    ir = jnp.where(hit, ir, 1.0)
    p_w = jnp.where(hit[:, None], p_w, 1.0)
    p_u = jnp.where(hit[:, None], p_u, 1.0)
    p_v = jnp.where(hit[:, None], p_v, 1.0)

    # differentiable t recompute for the winner only
    t_s = sphere_mod.sphere_t_gathered(
        origin, direction, center, radius, hit_mod.T_MIN, hit_mod.T_MAX
    )
    t_p = plane_mod.plane_t_gathered(
        origin, direction, ptype, p_base, p_u, p_v, p_normal, p_d, p_w,
        hit_mod.T_MIN, hit_mod.T_MAX,
    )
    t_best = jnp.where(hit, jnp.where(is_sphere, t_s, t_p), K_INFINITY)

    # record math on the joined parameters (miss lanes sanitized)
    t_calc = jnp.where(hit, t_best, 1.0)
    s_point, s_normal, s_front, s_u, s_v = sphere_mod.sphere_record(
        origin, direction, t_calc, center, radius
    )
    pp_point, pp_normal, pp_front, pp_u, pp_v = plane_mod.plane_record(
        origin, direction, t_calc, p_base, p_u, p_v, p_normal, p_d, p_w
    )
    sel = is_sphere[:, None]
    # miss lanes join a ZERO plane normal; with it, refract's
    # sqrt(|1 - |perp|^2|) lands exactly on 0 and reverse mode emits
    # 0-cotangent * inf = NaN into d(ir). Give misses a real unit normal
    # (their forward values are fully masked anyway).
    normal = jnp.where(sel, s_normal, pp_normal)
    normal = jnp.where(hit[:, None], normal,
                       jnp.array([0.0, 0.0, 1.0], jnp.float32))
    return hit_fast.JoinedHit(
        hit=hit,
        t=t_best,
        point=jnp.where(sel, s_point, pp_point),
        normal=normal,
        front_face=jnp.where(is_sphere, s_front, pp_front),
        u=jnp.where(is_sphere, s_u, pp_u),
        v=jnp.where(is_sphere, s_v, pp_v),
        mtype=mtype, fuzz=fuzz, ir=ir,
        absorption=absorption, albedo=albedo, emit=emit, tex_id=tex_id,
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
    remat_samples: bool = True,
    diff_textures: bool = False,
    tex_tape=None,
    rr_start=None,
):
    """Raw sample sums [N, 3] by replaying the recorded index tape.

    Mirrors renderer.render_pixels exactly (same seeds, rays, chunking),
    with the per-bounce intersection replaced by the recorded gather.
    idx: [spp, max_depth, N] i32.

    diff_textures=False (default) stops gradients at the texture IMAGE:
    its cotangent is a per-texel scatter-add over millions of texels,
    which measured ~30x slower than the whole rest of the backward.
    Every other parameter (incl. the albedo that the texture modulates)
    keeps exact gradients; texture-image gradients remain available
    through the remat oracle (diff.render_frame_diff(mode="remat")) or
    diff_textures=True.
    """
    if scene.textures is not None and not diff_textures:
        scene = scene._replace(textures=jax.lax.stop_gradient(scene.textures))
    if tex_tape is not None:
        # the recorded per-bounce multipliers replace in-replay texture
        # sampling entirely (and are constants of the tape — no image
        # gradient; use diff_textures/remat for that)
        tex_tape = jax.lax.stop_gradient(tex_tape)
    n = i_flat.shape[0]
    chunk = min(chunk, n)
    pad = (-n) % chunk
    if pad:
        i_flat = jnp.pad(i_flat, (0, pad))
        j_flat = jnp.pad(j_flat, (0, pad))
        base_seed = jnp.pad(base_seed, (0, pad))
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, pad)), constant_values=-1)
        if tex_tape is not None:
            tex_tape = jnp.pad(tex_tape, ((0, 0), (0, 0), (0, pad), (0, 0)),
                               constant_values=1.0)
    num_chunks = (n + pad) // chunk

    sqrt_spp = (strat_sqrt_spp or int(round(spp ** 0.5))) if stratify else 0

    def one_sample(i, j, base, s, idx_s, tex_s):
        seed = rng.sample_seed(base, s)
        seed, origin, direction = camera_mod.get_rays(
            cam, i, j, seed, sample_index=s if stratify else None, sqrt_spp=sqrt_spp
        )
        beta = jnp.ones_like(origin)
        final = jnp.zeros_like(origin)
        alive = seed == seed
        carry = (origin, direction, beta, final, seed, alive)

        def body(carry, xs):
            depth, idx_row, tex_row = xs
            fn = lambda sc, o, d, _i: _joined_hit_recorded(sc, o, d, idx_row)
            sc = scene._replace(textures=None) if tex_row is not None else scene
            # rr_start: the kill decision is RECOMPUTED, not recorded —
            # beta replays bit-identically and the kill draw comes from
            # the same deterministic per-lane stream, so an RR-killed
            # lane replays dead (its later -1 tape rows are masked by
            # `alive`, never misread as background misses).
            return (
                integrator._bounce(sc, cam.background, carry, None,
                                   joined_hit_fn=fn, tex_mult=tex_row,
                                   rr_start=rr_start, depth=depth),
                None,
            )

        depths = jnp.arange(max_depth, dtype=jnp.int32)
        xs = (depths, idx_s, tex_s)  # idx_s: [D, chunk]; tex_s: [D, chunk, 3] | None
        carry, _ = jax.lax.scan(body, carry, xs)
        return carry[3]

    if remat_samples:
        # recompute each sample's replay in the backward instead of
        # saving every bounce residual (memory-bound shapes); turn off
        # when the residuals fit — saves one forward recompute
        one_sample = jax.checkpoint(one_sample)

    def per_chunk(args):
        i, j, base, idx_c, tex_c = args  # idx_c: [spp, D, chunk]

        def body(acc, xs):
            s, idx_s, tex_s = xs
            return acc + one_sample(i, j, base, s, idx_s, tex_s), None

        # zeros_like(base): under shard_map the per-pixel seeds are always
        # device-varying (i alone may not be — row-band sharding varies
        # only j), and the scan carry must match the body's vma type
        acc0 = jnp.zeros_like(base, dtype=jnp.float32, shape=(chunk, 3))
        samples = jnp.arange(spp, dtype=jnp.uint32) + jnp.uint32(sample_start)
        acc, _ = jax.lax.scan(body, acc0, (samples, idx_c, tex_c))
        return acc

    i_c = i_flat.reshape(num_chunks, chunk)
    j_c = j_flat.reshape(num_chunks, chunk)
    seed_c = base_seed.reshape(num_chunks, chunk)
    # [spp, D, C, chunk] -> [C, spp, D, chunk] so lax.map slices chunks
    idx_c = jnp.moveaxis(
        idx.reshape(spp, max_depth, num_chunks, chunk), 2, 0
    )
    tex_c = (jnp.moveaxis(
        tex_tape.reshape(spp, max_depth, num_chunks, chunk, 3), 2, 0)
        if tex_tape is not None else None)
    fb = jax.lax.map(per_chunk, (i_c, j_c, seed_c, idx_c, tex_c)).reshape(-1, 3)
    return fb[:n]


@partial(
    jax.jit,
    static_argnames=("width", "height", "spp", "max_depth", "reference_quirk",
                     "chunk", "stratify", "strat_sqrt_spp", "remat_samples",
                     "diff_textures", "rr_start"),
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
    remat_samples: bool = True,
    diff_textures: bool = False,
    tex_tape=None,
    rr_start=None,
):
    """Replayed frame render; must reproduce the recording forward's
    radiance (same streams, same branches — validated in tests).

    tex_tape ([spp, max_depth, N, 3], from render_frame_pallas_record on
    a textured scene) replaces in-replay texture sampling with the
    multipliers the forward kernel actually used — exact parity and no
    per-ray gathers."""
    i_flat, j_flat, base_seed = renderer.pixel_grid(width, height, reference_quirk)
    fb = render_pixels_replay(
        scene, cam, i_flat, j_flat, base_seed, idx, spp, max_depth,
        chunk=chunk, stratify=stratify, sample_start=sample_start,
        strat_sqrt_spp=strat_sqrt_spp, remat_samples=remat_samples,
        diff_textures=diff_textures, tex_tape=tex_tape, rr_start=rr_start,
    )
    return fb.reshape(height, width, 3)
