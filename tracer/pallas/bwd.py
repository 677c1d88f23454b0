"""Fused Pallas backward: replay the tape and hand-accumulate cotangents.

Round-3 design (docs/ROADMAP.md "Round-3 design sketch"): the XLA replay
backward is fragmentation-bound (~30 small fusions per bounce step,
~100 us/step — neither chunk size nor matmul precision moves it), so the
fix is the same move that won the forward: fuse the WHOLE gradient step
into one Pallas kernel per 128-pixel tile.

Per tile, per sample:
  forward replay — regenerate the primary ray from the deterministic
  seed streams (bit-identical to the recording kernel,
  tracer/pallas/kernels.py), then for each bounce join the RECORDED
  winner from the index tape with a one-hot MXU matmul (never a per-ray
  gather), recompute its hit parameter t differentiably from the joined
  geometry (the reference hit math, sphere.h / plane.h:58-70, via the
  same conventions as tracer.pallas.replay._joined_hit_recorded), and
  run the shared in-kernel scatter `_shade` under `jax.vjp`.
  reverse    — walk the recorded bounce chain backwards, feeding each
  bounce's state cotangent into its VJP; per-bounce table cotangents
  transpose through the one-hot join as d(table) += g_rec @ onehot^T
  (an MXU matmul per bounce into a VMEM accumulator — the transpose of a
  matmul is a matmul, MXU both ways). Camera cotangents flow through the
  primary-ray VJP; the background through each bounce's miss term.

The per-bounce chain rules are not hand-derived: `jax.vjp` inside the
kernel body transposes the very ops the forward kernel runs (including
Russian roulette's 1/p throughput scaling), so the gradient definition
is identical to the XLA replay's by construction — tests pin both
against the remat oracle and finite differences.

Outputs are accumulated across the (sequential) TPU grid into single
blocks: d(combined join+geo table) [TROWS, Npad], d(camera rows)
[16, 128], plus the replayed frame (a free validation artifact). Scene
cotangents come back through `jax.vjp` of the differentiable table
packing (pack_bwd_tables) — the same linearization trick the XLA replay
uses for its join table. All one-hot joins and their cotangent
transposes run as exact 3-pass bf16 matmuls (replay._exact_onehot_mm's
trick) instead of 6-pass HIGHEST.

Textured scenes consume the recorded texture-multiplier tape (albedo
rows are pre-scaled by the frozen multipliers before _shade), matching
the XLA replay's default tape semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tracer.core import vec
from tracer.render import camera as camera_mod
from tracer.scene.types import K_INFINITY, Scene
from tracer.pallas.kernel_lib import (
    DENOM_EPS, JROWS, T_MIN, T_MAX,
    J_ALB0, J_CX, J_CY, J_CZ, J_IR, J_ISSPH, J_NX, J_NY, J_NZ, J_RAD,
    _U, _rand, _round_up, _shade, _wang_hash,
)

GROWS = 16  # aux geometry rows appended after JROWS
G_PD = 0  # plane d
# plane uv frame (round 4, d(texel)/d(uv) replay): alpha/beta =
# dot(A/B, hitpoint) - base_a/b with A = cross(v, w), B = cross(w, u)
# (tracer.geometry.plane.plane_alpha_beta / pack_scene's a_vec/b_vec)
G_AX, G_AY, G_AZ = 1, 2, 3
G_BX, G_BY, G_BZ = 4, 5, 6
G_BA, G_BB = 7, 8
TROWS = 24 + GROWS  # combined table height (JROWS + geo rows, sublane-aligned)
CAMV_ROWS = 16  # p00(0:3) du(3:6) dv(6:9) origin(9:12) background(12:15)


def pack_bwd_tables(scene: Scene):
    """Combined [TROWS, Npad] table (join rows + geo rows), differentiably.

    The first JROWS rows mirror kernel_lib.pack_scene's join exactly (so
    the in-kernel `_shade` consumes the joined record unchanged); row
    JROWS+G_PD carries the plane d the join table lacks. One table means
    ONE one-hot join matmul per bounce (and one cotangent transpose)
    instead of two. Built with plain jnp ops so `jax.vjp` of this
    function maps table cotangents back onto the Scene pytree.
    """
    sph, pla = scene.spheres, scene.planes
    num_s, num_p = scene.num_spheres, scene.num_planes
    n = num_s + num_p
    n_pad = _round_up(max(n, 8), 8)

    join = jnp.zeros((JROWS, n_pad), jnp.float32)
    mats = scene.materials
    if num_s:
        join = join.at[J_CX, :num_s].set(sph.center[:, 0])
        join = join.at[J_CY, :num_s].set(sph.center[:, 1])
        join = join.at[J_CZ, :num_s].set(sph.center[:, 2])
        join = join.at[J_RAD, :num_s].set(sph.radius)
        join = join.at[J_ISSPH, :num_s].set(1.0)
    if num_p:
        sl = slice(num_s, n)
        join = join.at[J_RAD, sl].set(1.0)  # div-safe placeholder
        join = join.at[J_NX, sl].set(pla.normal[:, 0])
        join = join.at[J_NY, sl].set(pla.normal[:, 1])
        join = join.at[J_NZ, sl].set(pla.normal[:, 2])
    join = join.at[J_RAD, n:].set(1.0)
    midx = jnp.concatenate(
        ([sph.material_idx] if num_s else []) + ([pla.material_idx] if num_p else [])
    )
    from tracer.pallas.kernel_lib import J_MTYPE, J_TEXID

    mat_rows = jnp.stack(
        [
            mats.mtype[midx].astype(jnp.float32),
            mats.fuzz[midx],
            mats.ir[midx],
            mats.absorption[midx, 0],
            mats.absorption[midx, 1],
            mats.absorption[midx, 2],
            mats.albedo[midx, 0],
            mats.albedo[midx, 1],
            mats.albedo[midx, 2],
            mats.emit[midx, 0],
            mats.emit[midx, 1],
            mats.emit[midx, 2],
        ]
    )
    join = join.at[J_MTYPE : J_MTYPE + 12, :n].set(mat_rows)
    join = join.at[J_TEXID, :].set(-1.0)
    join = join.at[J_TEXID, :n].set(mats.tex_id[midx].astype(jnp.float32))

    geo = jnp.zeros((GROWS, n_pad), jnp.float32)
    if num_p:
        sl = slice(num_s, n)
        geo = geo.at[G_PD, sl].set(pla.d)
        a_vec = vec.cross(pla.v, pla.w)
        b_vec = vec.cross(pla.w, pla.u)
        for c, (ga, gb) in enumerate(((G_AX, G_BX), (G_AY, G_BY),
                                      (G_AZ, G_BZ))):
            geo = geo.at[ga, sl].set(a_vec[:, c])
            geo = geo.at[gb, sl].set(b_vec[:, c])
        geo = geo.at[G_BA, sl].set(jnp.sum(pla.base * a_vec, axis=-1))
        geo = geo.at[G_BB, sl].set(jnp.sum(pla.base * b_vec, axis=-1))
    return jnp.concatenate([join, geo], axis=0)


def pack_tables(scene, cam):
    """(combined table [TROWS, Npad], camera rows [16, 128]) — the two
    kernel inputs whose cotangents carry ALL scene/camera gradients;
    `jax.vjp` of this function maps them back onto the pytrees."""
    comb = pack_bwd_tables(scene)
    vals = jnp.concatenate([
        cam.pixel00_loc, cam.pixel_delta_u, cam.pixel_delta_v,
        cam.origin, cam.background, jnp.zeros((1,), jnp.float32),
    ])  # [16]
    camv = jnp.broadcast_to(vals[:, None], (CAMV_ROWS, 128))
    return comb, camv


def _dot3_join(table, onehot):
    """table [R, Npad] f32 @ onehot [Npad, 128] 0/1, exact in 3 bf16 passes.

    f32 = hi + mid + lo, each part bf16-representable; 0/1 selectors are
    bf16-exact, so every partial product is exact and the result is
    BIT-equal to the 6-pass HIGHEST matmul it replaces (the same trick
    as replay._exact_onehot_mm, at half the MXU passes).
    """
    oh = onehot.astype(jnp.bfloat16)
    out, x = None, table
    for _ in range(3):
        part = x.astype(jnp.bfloat16)
        term = jax.lax.dot_general(
            part, oh, ((((1,), (0,))), ((), ())),
            preferred_element_type=jnp.float32)
        out = term if out is None else out + term
        x = x - part.astype(jnp.float32)
    return out


def _dot3_lanes(g, onehot):
    """g [R, 128] f32 x onehot [Npad, 128] -> [R, Npad], contracting the
    lane dim, exact in 3 bf16 passes (the cotangent transpose of the
    one-hot join: this time g is the operand that gets hi/mid/lo-split)."""
    oh = onehot.astype(jnp.bfloat16)
    out, x = None, g
    for _ in range(3):
        part = x.astype(jnp.bfloat16)
        term = jax.lax.dot_general(
            part, oh, ((((1,), (1,))), ((), ())),
            preferred_element_type=jnp.float32)
        out = term if out is None else out + term
        x = x - part.astype(jnp.float32)
    return out


def _bwd_kernel(
    tbase_ref,    # scalar-prefetch [grid] i32: base pixel id per tile
    params_ref,   # SMEM [1, 24]: slots 15/16 = row_offset / sample_start
    camv_ref,     # VMEM [16, 128]: camera param broadcast rows
    tableT_ref,   # VMEM [TROWS, Npad] combined join+geo table
    idx_ref,      # VMEM [spp*D, 128] i32 tape block for this tile
    gfb_ref,      # VMEM [3, 128] loss cotangent block for this tile
    *refs,
    spp: int,
    max_depth: int,
    width: int,
    num_pixels: int,
    quirk: bool,
    rr_start,
    strat_k: int,
    has_textape: bool,
    seg_size: int,
    tape_f: int = 3,
    want_texgrad: bool = False,
):
    refs = list(refs)
    textape_ref = refs.pop(0) if has_textape else None
    gtex_ref = refs.pop() if want_texgrad else None
    dtable_ref, dcam_ref, fb_ref = refs

    pid = pl.program_id(0)
    n_pad = tableT_ref.shape[1]

    @pl.when(pid == 0)
    def _init():
        dtable_ref[...] = jnp.zeros_like(dtable_ref)
        dcam_ref[...] = jnp.zeros_like(dcam_ref)

    fb_ref[...] = jnp.zeros_like(fb_ref)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    # the tile's TRUE base pixel id rides scalar prefetch so depth-
    # bucketed calls (scene_grads_bucketed) can gather arbitrary tile
    # subsets while keeping pixel-exact seeds and camera math; plain
    # band calls pass arange(grid)*128
    lin = tbase_ref[pid] + lane
    valid = lin < num_pixels
    lin = jnp.minimum(lin, num_pixels - 1)
    row0 = params_ref[0, 15].astype(jnp.int32)
    samp0 = params_ref[0, 16].astype(jnp.int32)
    i_int = lin % width
    j_int = lin // width + row0
    i_px = i_int.astype(jnp.float32)
    j_px = j_int.astype(jnp.float32)
    iu = (lin + row0 * width).astype(_U)
    base_lin = (i_int.astype(_U) * _U(width) + j_int.astype(_U)) if quirk else iu
    base_seed = _wang_hash(base_lin)

    iota_n = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 128), 0)
    cam_rows = tuple(camv_ref[i : i + 1, :] for i in range(12))
    bg_rows = tuple(camv_ref[12 + c : 13 + c, :] for c in range(3))
    kf = jnp.float32(strat_k) if strat_k else None
    g0 = jnp.zeros((1, 128), jnp.float32)

    def sample_body(s, carry):
        # ---- primary ray: the recording kernel's exact streams --------
        s_g = (s + samp0).astype(jnp.float32)
        seed_r = _wang_hash(base_seed + (s + samp0).astype(_U))
        seed_r, ux = _rand(seed_r)
        seed_r, uy = _rand(seed_r)
        if strat_k:
            cell_x = jnp.mod(s_g, kf)
            cell_y = jnp.floor(s_g / kf)
            offx = (cell_x + ux) / kf - 0.5
            offy = (cell_y + uy) / kf - 0.5
        else:
            offx = ux - 0.5
            offy = uy - 0.5

        def gen(p00x, p00y, p00z, dux, duy, duz, dvx, dvy, dvz, ox0, oy0, oz0):
            pcx = p00x + i_px * dux + j_px * dvx
            pcy = p00y + i_px * duy + j_px * dvy
            pcz = p00z + i_px * duz + j_px * dvz
            rdx = pcx + offx * dux + offy * dvx - ox0
            rdy = pcy + offx * duy + offy * dvy - oy0
            rdz = pcz + offx * duz + offy * dvz - oz0
            return ox0, oy0, oz0, rdx, rdy, rdz

        prim, gen_vjp = jax.vjp(gen, *cam_rows)
        ox, oy, oz, dx, dy, dz = prim
        ox = jnp.broadcast_to(ox, (1, 128))
        oy = jnp.broadcast_to(oy, (1, 128))
        oz = jnp.broadcast_to(oz, (1, 128))
        state = (ox, oy, oz, dx, dy, dz,
                 jnp.ones((1, 128), jnp.float32), jnp.ones((1, 128), jnp.float32),
                 jnp.ones((1, 128), jnp.float32),
                 g0, g0, g0)
        alive = valid
        seed = seed_r

        def tm_of(d):
            if not has_textape:
                return None
            rows = spp * max_depth
            return tuple(
                textape_ref[pl.ds(c * rows + s * max_depth + d, 1), :]
                for c in range(tape_f)
            )

        def seg_inputs(lo, hi):
            """Per-bounce tape joins for bounces [lo, hi) plus the
            segment one-hot block for the batched cotangent transpose.
            (Batching the JOIN matmuls into one wide (TROWS, seg*128)
            contraction was measured SLOWER on v5e — the comb_all
            slices/concats cost more than the per-matmul overhead they
            save; only the transpose batches, below, where the lane-dim
            contraction also fuses the per-bounce dtable accumulates.)"""
            onehots, per_d = [], []
            for d in range(lo, hi):
                idx_row = idx_ref[pl.ds(s * max_depth + d, 1), :]
                oh = ((iota_n == jnp.broadcast_to(idx_row, (n_pad, 128)))
                      ).astype(jnp.float32)
                onehots.append(oh)
                per_d.append((idx_row >= 0, _dot3_join(tableT_ref[...], oh),
                              tm_of(d)))
            return jnp.concatenate(onehots, axis=1), per_d

        # ---- forward replay with depth-segment checkpointing ----------
        # The unrolled 50-bounce vjp residual chain is ~430 KB/bounce of
        # VMEM stack (d50 overflowed the 16 MB scoped limit by 6 MB), so
        # bounces are grouped into segments of `seg_size`: the forward
        # saves only each segment's entry state (12 rows + seed + alive),
        # and the reverse sweep recomputes that segment's vjps from its
        # checkpoint. Peak residual stack = seg_size bounces.
        #
        # The forward replay STOPS at the last segment's entry: that
        # segment's reverse rebuild regenerates its bounces anyway, and
        # the final state (the replayed-frame fold) falls out of it for
        # free. At max_depth <= seg_size this removes the forward replay
        # entirely — one of the kernel's ~3 passes (round 4: bwd-alone
        # 22.1 -> measured after this change below).
        n_seg = -(-max_depth // seg_size)
        last_lo = (n_seg - 1) * seg_size
        seg_starts = []
        for si in range(n_seg - 1):
            seg_starts.append((state, seed, alive))
            lo = si * seg_size
            _, per_d = seg_inputs(lo, lo + seg_size)
            for i, d in enumerate(range(lo, lo + seg_size)):
                hit, comb_rec, tm = per_d[i]
                state, (seed, alive) = _bounce_fn(
                    comb_rec, bg_rows, state, hit=hit, seed=seed,
                    alive=alive, tm=tm, rr_start=rr_start, depth=d)
        seg_starts.append((state, seed, alive))  # last segment's entry

        # ---- reverse: per segment, rebuild vjps from the checkpoint,
        # then flow the state cotangent back through its bounces --------
        g_state = (g0, g0, g0, g0, g0, g0, g0, g0, g0,
                   gfb_ref[0:1, :], gfb_ref[1:2, :], gfb_ref[2:3, :])
        g_bg_acc = (g0, g0, g0)
        for si in reversed(range(n_seg)):
            st, sd, al = seg_starts[si]
            lo = si * seg_size
            hi = min(max_depth, lo + seg_size)
            onehot_seg, per_d = seg_inputs(lo, hi)
            vjps = []
            for i, d in enumerate(range(lo, hi)):
                hit, comb_rec, tm = per_d[i]
                bounce = functools.partial(
                    _bounce_fn, hit=hit, seed=sd, alive=al, tm=tm,
                    rr_start=rr_start, depth=d,
                )
                if want_texgrad:
                    # texel-value tape rows join the vjp as a 4th
                    # differentiated arg: their cotangent is
                    # dL/d(texel-at-hit), the texture-IMAGE gradient
                    # source (scattered to bilinear corners by
                    # texture_image_grads from the addressing rows)
                    st, fvjp, aux = jax.vjp(
                        lambda cr, bg, st_, t3, _b=bounce: _b(
                            cr, bg, st_, tm3=t3),
                        comb_rec, bg_rows, st, tuple(tm[:3]), has_aux=True)
                else:
                    (st, aux), fvjp = _vjp3(bounce, comb_rec, bg_rows, st)
                sd, al = aux
                vjps.append(fvjp)
            if si == n_seg - 1:
                # st is the final bounce state: fold this sample's
                # radiance into the tile framebuffer (the replayed
                # forward — free validation against the recorded fb)
                fb_ref[0:1, :] = fb_ref[0:1, :] + st[9]
                fb_ref[1:2, :] = fb_ref[1:2, :] + st[10]
                fb_ref[2:3, :] = fb_ref[2:3, :] + st[11]
            g_combs = [None] * (hi - lo)
            for d in reversed(range(lo, hi)):
                if want_texgrad:
                    g_comb, g_bg, g_state, g_tm = vjps[d - lo](g_state)
                    rows_t = spp * max_depth
                    for c in range(3):
                        gtex_ref[pl.ds(
                            c * rows_t + s * max_depth + d, 1), :] = g_tm[c]
                else:
                    g_comb, g_bg, g_state = vjps[d - lo](g_state)
                g_combs[d - lo] = g_comb
                g_bg_acc = tuple(a + b for a, b in zip(g_bg_acc, g_bg))
            # ONE batched cotangent transpose per segment: the lane-dim
            # contraction sums the per-bounce d(table) contributions
            # inside the MXU accumulate — seg matmuls and seg table RMWs
            # become one of each
            g_all = jnp.concatenate(g_combs, axis=1)  # (TROWS, nb*128)
            dtable_ref[...] = dtable_ref[...] + _dot3_lanes(g_all, onehot_seg)

        # one batched [16, 128] accumulate per sample: 12 camera-gen rows
        # + 3 background rows + a zero pad row (vs 15 separate row RMWs)
        g_cam12 = gen_vjp(g_state[0:6])
        dcam_ref[...] = dcam_ref[...] + jnp.concatenate(
            list(g_cam12) + list(g_bg_acc) + [g0], axis=0)
        return carry

    jax.lax.fori_loop(0, spp, sample_body, jnp.int32(0))


def _vjp3(f, comb_rec, bg_rows, state):
    out, fvjp, aux = jax.vjp(f, comb_rec, bg_rows, state, has_aux=True)

    def vjp_fn(g_state):
        g_comb, g_bg, g_st = fvjp(g_state)
        return g_comb, g_bg, g_st

    return (out, aux), vjp_fn


def _bounce_fn(comb_rec, bg_rows, state, *, hit, seed, alive, tm,
               rr_start, depth, tm3=None):
    """One differentiable replay bounce on (1, 128) rows.

    The winner is fixed by the tape (`hit`, via the one-hot joined
    records); t is recomputed differentiably from the joined geometry
    with the XLA replay's conventions (tracer.geometry.sphere
    sphere_t_gathered / plane plane_alpha_beta root), except that
    validity masks only pick the sphere root — the tape already proved
    the winner valid, so razor-edge ulp flips cannot send t to +inf.
    Shading and scatter are the SHARED in-kernel `_shade` (the same ops
    the forward ran), with the NaN-safe sqrt for reverse mode.
    """
    ox, oy, oz, dx, dy, dz, b0, b1, b2, f0, f1, f2 = state
    row = lambda r: comb_rec[r : r + 1, :]
    hitf = hit  # (1, 128) bool

    # miss-lane sanitization (replay.py:_joined_hit_recorded): the all-
    # zero joined row would otherwise put 1/0 and sqrt'(0) infinities
    # into reverse mode through the masked branches
    rad = jnp.where(hitf, row(J_RAD), 1.0)
    ir_safe = jnp.where(hitf, row(J_IR), 1.0)
    pnx = row(J_NX)
    pny = row(J_NY)
    pnz = jnp.where(hitf, row(J_NZ), 1.0)  # misses get a unit z normal
    cx, cy, cz = row(J_CX), row(J_CY), row(J_CZ)
    is_sph = row(J_ISSPH) > 0.5
    pd = comb_rec[JROWS + G_PD : JROWS + G_PD + 1, :]

    a = dx * dx + dy * dy + dz * dz
    # sphere: nearest valid root (sphere.h quadratic; fall back to the
    # far root when the near one is out of range — interior exits)
    ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
    half_b = ocx * dx + ocy * dy + ocz * dz
    c_q = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
    disc = half_b * half_b - a * c_q
    dpos = disc >= 0.0
    sq = vec._sqrt_grad_safe(jnp.where(dpos, disc, 1.0))
    inv_a = 1.0 / a
    t_near = (-half_b - sq) * inv_a
    near_ok = dpos & (t_near >= T_MIN) & (t_near <= T_MAX)
    t_s = jnp.where(near_ok, t_near, (-half_b + sq) * inv_a)
    # plane: single root (plane.h:58-61)
    denom = pnx * dx + pny * dy + pnz * dz
    safe_denom = jnp.where(jnp.abs(denom) < DENOM_EPS, 1.0, denom)
    t_p = (pd - (pnx * ox + pny * oy + pnz * oz)) / safe_denom
    t_row = jnp.where(hitf, jnp.where(is_sph, t_s, t_p), K_INFINITY)

    rec = comb_rec  # extra geo tail rows are inert to _shade (row ids < JROWS)
    if tm is not None:
        # recorded texture multipliers pre-scale the albedo rows. With a
        # 3-field tape the texel is frozen (the XLA replay's semantics);
        # a 9-field tape (round 4) adds the recorded d(texel)/d(u,v), and
        # the multiplier is linearized around the recorded hit:
        #   mult = T + dT/du (u - sg u) + dT/dv (v - sg v)
        # — VALUE-identical to the frozen texel (the deltas are zero),
        # but the gradient carries the exact d(texel)/d(uv) chain
        # (bilinear is separately linear in u and v, so the first-order
        # term IS the derivative at the hit). u, v are recomputed
        # differentiably: planes from the A/B frame rows (geo table),
        # spheres from the outward normal via the Cephes inverse trig.
        # Only the DERIVATIVE of the recompute matters, so inputs are
        # sanitized freely against the masked-branch NaN class
        # (pole/degenerate lanes get derivative 0).
        from tracer.pallas.kernel_lib import (
            J_TEXID, _acos_cephes, _atan2_cephes)

        textured_l = hitf & (row(J_TEXID) > -0.5)
        if tm3 is not None:
            # texture-IMAGE gradients: tm3 is the same texel-value rows
            # passed as a DIFFERENTIATED vjp argument. Untextured lanes
            # hold the tape's neutral 1.0, so masking to a literal 1.0
            # is value-identical — it exists to zero the image cotangent
            # on lanes whose albedo was never texture-scaled.
            mult = [jnp.where(textured_l, tm3[c], 1.0) for c in range(3)]
        else:
            mult = list(tm[:3])
        if len(tm) >= 9:
            t_hit = jnp.where(hitf, t_row, 1.0)
            hx = ox + t_hit * dx
            hy = oy + t_hit * dy
            hz = oz + t_hit * dz
            grow = lambda r: comb_rec[JROWS + r : JROWS + r + 1, :]
            u_p = (grow(G_AX) * hx + grow(G_AY) * hy + grow(G_AZ) * hz
                   - grow(G_BA))
            v_p = (grow(G_BX) * hx + grow(G_BY) * hy + grow(G_BZ) * hz
                   - grow(G_BB))
            sph_tex = textured_l & is_sph
            inv_r = 1.0 / rad
            onx = (hx - cx) * inv_r
            ony = (hy - cy) * inv_r
            onz = (hz - cz) * inv_r
            # pole/degenerate sanitization: off-case lanes and exact
            # poles get constant inputs (derivative 0, value unused)
            r2_ok = sph_tex & (onx * onx + onz * onz > 1e-12)
            onx_s = jnp.where(r2_ok, onx, 1.0)
            onz_s = jnp.where(r2_ok, onz, 0.0)
            ony_s = jnp.clip(jnp.where(sph_tex, ony, 0.0),
                             -1.0 + 1e-6, 1.0 - 1e-6)
            u_s = (_atan2_cephes(-onz_s, onx_s) + jnp.float32(jnp.pi)) / (
                2.0 * jnp.float32(jnp.pi))
            v_s = _acos_cephes(ony_s) / jnp.float32(jnp.pi)
            u_r = jnp.where(is_sph, u_s, u_p)
            v_r = jnp.where(is_sph, v_s, v_p)
            sg = jax.lax.stop_gradient
            du, dv = u_r - sg(u_r), v_r - sg(v_r)
            # build on the already-selected mult: tm3 (the DIFFERENTIATED
            # texel rows) when texture-image grads are on, tm[:3]
            # otherwise. Reassigning from tm[c] here would silently
            # discard the tm3 cotangent path (texture-image gradients
            # identically zero). Untextured lanes are unaffected: their
            # tape du/dv rows are zero.
            mult = [mult[c] + tm[3 + c] * du + tm[6 + c] * dv
                    for c in range(3)]
        alb = jnp.concatenate(
            [rec[J_ALB0 + c : J_ALB0 + c + 1, :] * mult[c] for c in range(3)],
            axis=0,
        )
        rec = jnp.concatenate(
            [rec[:J_ALB0], alb, rec[J_ALB0 + 3 :]], axis=0
        )
    # the sanitized rows must reach _shade (it re-reads them from rec)
    rec = jnp.concatenate(
        [rec[:J_RAD], rad, rec[J_RAD + 1 : J_NZ], pnz,
         rec[J_NZ + 1 : J_IR], ir_safe, rec[J_IR + 1 :]],
        axis=0,
    )

    out = _shade(
        rec, t_row, ox, oy, oz, dx, dy, dz, a,
        (b0, b1, b2), (f0, f1, f2), seed, alive, bg_rows,
        to_px=lambda r: r, pu=None, pv=None, tex_refs=None, flat=None,
        big_tex=None, ps=(1, 128), rr_start=rr_start, depth=depth,
        sqrt_fn=vec._sqrt_grad_safe,
    )
    (nox, noy, noz), (ndx, ndy, ndz), (nb0, nb1, nb2), (nf0, nf1, nf2), \
        seed2, live = out
    new_state = (nox, noy, noz, ndx, ndy, ndz, nb0, nb1, nb2, nf0, nf1, nf2)
    return new_state, (seed2, live)


@functools.partial(
    jax.jit,
    static_argnames=("spp", "max_depth", "width", "num_pixels", "quirk",
                     "rr_start", "strat_k", "interpret", "has_textape",
                     "seg_size", "tape_f", "want_texgrad"),
)
def _bwd_call(params, tbase, camv, tableT, idx2, gfb2, textape2, *,
              spp, max_depth, width, num_pixels, quirk, rr_start, strat_k,
              interpret, has_textape, seg_size, tape_f=3,
              want_texgrad=False):
    n_pad = tableT.shape[1]
    grid = gfb2.shape[1] // 128
    kernel = functools.partial(
        _bwd_kernel, spp=spp, max_depth=max_depth, width=width,
        num_pixels=num_pixels, quirk=quirk, rr_start=rr_start,
        strat_k=strat_k, has_textape=has_textape, seg_size=seg_size,
        tape_f=tape_f, want_texgrad=want_texgrad,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec((spp * max_depth, 128), lambda g, tb: (0, g),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 128), lambda g, tb: (0, g), memory_space=pltpu.VMEM),
    ]
    inputs = [params, camv, tableT, idx2, gfb2]
    if has_textape:
        in_specs.append(pl.BlockSpec((tape_f * spp * max_depth, 128),
                                     lambda g, tb: (0, g),
                                     memory_space=pltpu.VMEM))
        inputs.append(textape2)
    out_specs = [
        pl.BlockSpec((TROWS, n_pad), lambda g, tb: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((CAMV_ROWS, 128), lambda g, tb: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 128), lambda g, tb: (0, g), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((TROWS, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((CAMV_ROWS, 128), jnp.float32),
        jax.ShapeDtypeStruct((3, grid * 128), jnp.float32),
    ]
    if want_texgrad:
        out_specs.append(pl.BlockSpec((3 * spp * max_depth, 128),
                                      lambda g, tb: (0, g),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct(
            (3 * spp * max_depth, grid * 128), jnp.float32))
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(tbase, *inputs)


def texture_image_grads(gtex2, t2, spp, max_depth, th, tw):
    """d(texture image) [th, tw, 3] from per-bounce texel cotangents.

    `gtex2` [3*spp*D, P] is the backward kernel's cotangent on the
    tape's texel-value rows — dL/d(texel-at-hit) per (sample, bounce,
    pixel), already masked to textured lanes. `t2` is the field-major
    13-field tape whose rows 9-12 carry the recording kernel's exact
    bilinear addressing (x0, y0, fu, fv — kernel_lib._tex_addressing,
    the tex2D_cpu semantics of materials.h:20-51). The bilinear fetch is
    texel = sum_c w_c(fu, fv) * tex[corner_c], so the image cotangent is
    four weighted scatter-adds — no texture-sized gathers anywhere, and
    untextured/dead slots contribute exactly zero (their g is 0).
    """
    rows = spp * max_depth
    g = jnp.stack([gtex2[c * rows:(c + 1) * rows] for c in range(3)],
                  axis=-1)  # [rows, P, 3]
    x0 = t2[9 * rows:10 * rows].astype(jnp.int32)
    y0 = t2[10 * rows:11 * rows].astype(jnp.int32)
    fu = t2[11 * rows:12 * rows]
    fv = t2[12 * rows:13 * rows]
    x1 = jnp.where(x0 + 1 < tw, x0 + 1, 0)  # neighbor wrap
    y1 = jnp.where(y0 + 1 < th, y0 + 1, 0)
    dflat = jnp.zeros((th * tw, 3), jnp.float32)
    for yy, xx, w in ((y0, x0, (1.0 - fu) * (1.0 - fv)),
                      (y0, x1, fu * (1.0 - fv)),
                      (y1, x0, (1.0 - fu) * fv),
                      (y1, x1, fu * fv)):
        dflat = dflat.at[(yy * tw + xx).reshape(-1)].add(
            (w[..., None] * g).reshape(-1, 3))
    return dflat.reshape(th, tw, 3)


def scene_cam_grads(scene: Scene, cam: camera_mod.CameraData, idx, g_fb,
                    width: int, height: int, spp: int, max_depth: int,
                    reference_quirk: bool = True, rr_start=None,
                    stratify: bool = False, sample_start: int = 0,
                    row_offset: int = 0, tex_tape=None, interpret=False,
                    seg_size: int = 8, texture_grads: bool = False):
    """(d(scene), d(cam), fb_replayed) for cotangent g_fb [H, W, 3].

    The kernel produces cotangents on the packed tables and the camera
    rows; `jax.vjp` of the (differentiable) packing maps them back onto
    the Scene/CameraData pytrees — the transpose of pack_bwd_tables is
    a handful of scatters on tiny [N]-shaped leaves, negligible next to
    the kernel.
    """
    num_pixels = width * height

    (tableT, camv), vjp_tables = jax.vjp(pack_tables, scene, cam)

    strat_k = 0
    if stratify:
        strat_k = int(round(spp ** 0.5))
        assert strat_k * strat_k == spp, "stratify requires square spp"

    tex_shape = None
    if texture_grads:
        assert scene.textures is not None
        tex_shape = tuple(scene.textures.shape[1:3])
    out = band_cotangents(
        tableT, camv, idx, g_fb, width, height, spp, max_depth,
        row_offset=row_offset, sample_start=sample_start,
        reference_quirk=reference_quirk, rr_start=rr_start, strat_k=strat_k,
        tex_tape=tex_tape, interpret=interpret, seg_size=seg_size,
        texture_grads=texture_grads, tex_shape=tex_shape,
    )
    dtable, dcam, fb2 = out[:3]
    g_scene, g_cam = vjp_tables((dtable, dcam))
    if texture_grads:
        # the megakernel supports one texture layer (tex_id 0); graft its
        # image cotangent onto the (otherwise-zero) textures leaf
        g_scene = g_scene._replace(
            textures=g_scene.textures.at[0].add(out[3]))
    fb = jnp.moveaxis(fb2[:, :num_pixels], 0, 1).reshape(height, width, 3)
    return g_scene, g_cam, fb


def band_cotangents(tableT, camv, idx, g_fb, width, band_rows, spp, max_depth,
                    *, row_offset=0, sample_start=0, reference_quirk=True,
                    rr_start=None, strat_k=0, tex_tape=None, interpret=False,
                    seg_size=8, texture_grads=False, tex_shape=None):
    """(dtable, dcam, fb2[, dtex]) for one `band_rows`-tall row band.

    texture_grads=True (requires a 13-field tex_tape and tex_shape =
    (th, tw)) appends the texture-IMAGE cotangent [th, tw, 3] — the
    kernel emits per-bounce texel cotangents and texture_image_grads
    scatters them to the bilinear corners. Pure XLA on top of the same
    kernel call, so it composes under shard_map (psum dtex like dtable).

    The shard_map-safe core of scene_cam_grads: row_offset and
    sample_start may be TRACED values (they ride the params row into
    SMEM), so a device can process its own band of a taller frame —
    tracer.dist.sharding composes this per-device and psums the two
    cotangent blocks. idx is [spp, max_depth, band_rows*width] (or any
    shape reshapable to it), g_fb any shape reshapable to
    [band_rows*width, 3].
    """
    num_pixels = width * band_rows
    grid = -(-num_pixels // 128)
    pad = grid * 128 - num_pixels

    params = jnp.concatenate([
        jnp.zeros((15,), jnp.float32),
        jnp.asarray(row_offset, jnp.float32).reshape(1),
        jnp.asarray(sample_start, jnp.float32).reshape(1),
        jnp.zeros((7,), jnp.float32),
    ]).reshape(1, 24)

    idx2 = idx.reshape(spp * max_depth, num_pixels)
    idx2 = jnp.pad(idx2, ((0, 0), (0, pad)), constant_values=-1)
    gfb2 = jnp.moveaxis(
        jnp.asarray(g_fb, jnp.float32).reshape(num_pixels, 3), 0, 1)
    gfb2 = jnp.pad(gfb2, ((0, 0), (0, pad)))
    has_textape = tex_tape is not None
    tape_f = 3
    if has_textape:
        # [spp, D, N, F] -> field-major rows [F*spp*D, N] (tape layout);
        # F=3 freezes texels, F=9 adds the d(texel)/d(uv) rows
        tape_f = tex_tape.shape[-1]
        t2 = jnp.moveaxis(
            tex_tape.reshape(spp * max_depth, num_pixels, tape_f),
            2, 0).reshape(tape_f * spp * max_depth, num_pixels)
        t2 = jnp.pad(t2, ((0, 0), (0, pad)), constant_values=1.0)
    else:
        t2 = None

    tbase = jnp.arange(grid, dtype=jnp.int32) * 128
    if texture_grads:
        assert has_textape and tape_f >= 13, \
            "texture_grads needs a 13-field tape (tape_fields=13)"
        assert tex_shape is not None
    out = _bwd_call(
        params, tbase, camv, tableT, idx2, gfb2, t2,
        spp=spp, max_depth=max_depth, width=width, num_pixels=num_pixels,
        quirk=reference_quirk, rr_start=rr_start, strat_k=strat_k,
        interpret=interpret, has_textape=has_textape,
        seg_size=min(seg_size, max_depth), tape_f=tape_f,
        want_texgrad=texture_grads,
    )
    if not texture_grads:
        return out
    dtable, dcam, fb2, gtex2 = out
    # MXU block-accumulation kernel (tracer.pallas.tex_scatter) instead
    # of the XLA .at[].add scatter: ~200M serialized corner updates per
    # spp chunk made texture_grads 24x slower than the same backward
    # without it (round-5 measurement). texture_image_grads stays as the
    # cross-check oracle (tests pin both).
    from tracer.pallas import tex_scatter

    dtex = tex_scatter.texture_image_grads_kernel(
        gtex2, t2, spp, max_depth, *tex_shape, interpret=interpret)
    return dtable, dcam, fb2, dtex


# ----------------------------------------------------------------------
# depth-bucketed backward: skip the dead tail of deep tapes
# ----------------------------------------------------------------------


def _needed_depth_per_tile(idx, spp, max_depth, grid):
    """[grid] i32: bounces a tile actually needs, from the tape alone.

    A lane's last recorded hit row k means bounce k+1 may still add the
    background (a live miss); every row after the first all-(-1) row of
    a sample is provably inert (a -1 row kills every lane that reached
    it: miss -> dead, absorbed -> already dead). Per tile the bound is
    the max over its samples/lanes. Measured on the canonical d50 tape
    (1080x720 spp8): mean needed depth 6.2 of 50; per-tile bucketing
    keeps only ~20% of the slots."""
    import numpy as np

    pad = grid * 128 - idx.shape[-1]
    idxp = jnp.pad(idx.reshape(spp, max_depth, -1), ((0, 0), (0, 0), (0, pad)),
                   constant_values=-1).reshape(spp, max_depth, grid, 128)
    hit_any = (idxp >= 0).any(axis=3)  # [spp, D, grid]
    rev = jnp.flip(hit_any, axis=1)
    last_hit = jnp.where(hit_any.any(axis=1),
                         max_depth - 1 - jnp.argmax(rev, axis=1), -1)
    need = jnp.minimum(last_hit + 2, max_depth)  # [spp, grid]
    return np.asarray(jnp.max(need, axis=0), dtype=np.int32)


def _bucket_pitch(n):
    """Round a bucket's tile count up to a coarse pitch (pow2 below 64,
    quarter-pow2 granularity above) so the jit cache sees a bounded set
    of shapes without over-padding small grids."""
    p = 1
    while p < n and p < 64:
        p *= 2
    while p < n:
        p2 = p + max(64, p // 4)
        if p2 >= n:
            return p2
        p = p2
    return p


def scene_grads_bucketed(scene: Scene, cam, idx, g_fb, width: int,
                         height: int, spp: int, max_depth: int,
                         reference_quirk: bool = True, rr_start=None,
                         sample_start: int = 0, tex_tape=None,
                         interpret=False, seg_size: int = 8,
                         buckets=(4, 8, 16, 24, 36, 50),
                         texture_grads: bool = False):
    """(d(scene), d(cam)) — the band backward, depth-bucketed per tile.

    Gathers each tile into the smallest bucket covering its needed
    depth (from the tape, _needed_depth_per_tile) and runs one kernel
    call per non-empty bucket at that STATIC max_depth; the kernel's
    scalar-prefetched tile-base ids keep pixel-exact seeds under the
    gather. Dead (s, d) slots beyond a tile's needed depth contribute
    exactly nothing (their vjps are identity on the radiance cotangent
    and zero on the tables), so the bucketed cotangents equal the
    full-depth kernel's up to f32 addition order.

    This is the deep-tape (d50) win: the straight-line kernel cannot
    skip dead bounces dynamically (unrolled vjps), so the skipping
    happens at the call layer instead.
    """
    import numpy as np

    num_pixels = width * height
    grid = -(-num_pixels // 128)
    pad = grid * 128 - num_pixels

    (tableT, camv), vjp_tables = jax.vjp(pack_tables, scene, cam)

    need = _needed_depth_per_tile(idx, spp, max_depth, grid)
    buckets = sorted(set(min(b, max_depth) for b in buckets))
    if buckets[-1] < max_depth:
        buckets.append(max_depth)

    idx3 = jnp.pad(idx.reshape(spp, max_depth, num_pixels),
                   ((0, 0), (0, 0), (0, pad)),
                   constant_values=-1).reshape(spp, max_depth, grid, 128)
    gfb2 = jnp.moveaxis(
        jnp.asarray(g_fb, jnp.float32).reshape(num_pixels, 3), 0, 1)
    gfb2 = jnp.pad(gfb2, ((0, 0), (0, pad))).reshape(3, grid, 128)
    has_textape = tex_tape is not None
    tape_f = 3
    if has_textape:
        tape_f = tex_tape.shape[-1]
        t3 = jnp.moveaxis(
            tex_tape.reshape(spp * max_depth, num_pixels, tape_f),
            2, 0).reshape(tape_f, spp, max_depth, num_pixels)
        t3 = jnp.pad(t3, ((0, 0), (0, 0), (0, 0), (0, pad)),
                     constant_values=1.0).reshape(
                         tape_f, spp, max_depth, grid, 128)

    params = jnp.concatenate([
        jnp.zeros((15,), jnp.float32),
        jnp.zeros((1,), jnp.float32),  # row_offset = 0 (single band)
        jnp.asarray(sample_start, jnp.float32).reshape(1),
        jnp.zeros((7,), jnp.float32),
    ]).reshape(1, 24)

    dtable = jnp.zeros((TROWS, tableT.shape[1]), jnp.float32)
    dcam = jnp.zeros((CAMV_ROWS, 128), jnp.float32)
    dtex = None
    if texture_grads:
        assert has_textape and tape_f >= 13 and scene.textures is not None
        th, tw = scene.textures.shape[1:3]
        dtex = jnp.zeros((th, tw, 3), jnp.float32)
    lo = 0
    for b in buckets:
        sel = np.nonzero((need > lo) & (need <= b))[0]
        lo = b
        if sel.size == 0:
            continue
        nb = _bucket_pitch(sel.size)
        # pad with repeats of the first tile, cotangent-zeroed below
        tiles = np.full(nb, sel[0], np.int32)
        tiles[: sel.size] = sel
        tiles_d = jnp.asarray(tiles)
        live = (jnp.arange(nb) < sel.size).astype(jnp.float32)

        idx_b = jnp.take(idx3[:, :b], tiles_d, axis=2)  # [spp, b, nb, 128]
        idx_b = idx_b.reshape(spp * b, nb * 128)
        gfb_b = (jnp.take(gfb2, tiles_d, axis=1) * live[None, :, None]
                 ).reshape(3, nb * 128)
        if has_textape:
            t_b = jnp.take(t3[:, :, :b], tiles_d, axis=3).reshape(
                tape_f * spp * b, nb * 128)
        else:
            t_b = None
        tbase = tiles_d * 128
        out = _bwd_call(
            params, tbase, camv, tableT, idx_b, gfb_b, t_b,
            spp=spp, max_depth=b, width=width, num_pixels=num_pixels,
            quirk=reference_quirk, rr_start=rr_start, strat_k=0,
            interpret=interpret, has_textape=has_textape,
            seg_size=min(seg_size, b), tape_f=tape_f,
            want_texgrad=texture_grads,
        )
        dtable = dtable + out[0]
        dcam = dcam + out[1]
        if texture_grads:
            dtex = dtex + texture_image_grads(out[3], t_b, spp, b, th, tw)
    g_scene, g_cam = vjp_tables((dtable, dcam))
    if texture_grads:
        g_scene = g_scene._replace(textures=g_scene.textures.at[0].add(dtex))
    return g_scene, g_cam


# ----------------------------------------------------------------------
# spp-chunked gradients: reference-depth (d50) differentiable rendering
# ----------------------------------------------------------------------


def scene_grads_chunked(scene: Scene, cam, g_fb, width: int, height: int,
                        spp: int, max_depth: int, spp_chunk: int = 4,
                        reference_quirk: bool = True, rr_start=None,
                        interpret=False, bucketed=None, fast_math=False,
                        texture_grads: bool = False):
    """(d(scene), d(cam)) with tape memory bounded by `spp_chunk`.

    The full-tape VJP needs spp x max_depth i32 rows per pixel — at the
    reference's real max_depth=50 (config.txt:16) and 1080p 64 spp that
    is ~29 GB, which is why round 2 quietly benched d8. Samples are
    independent (fb = sum over chunk fbs, so every chunk's output
    cotangent is the frame cotangent g_fb unchanged); this records and
    back-propagates one spp chunk at a time and sums the cotangents:
    peak tape = spp_chunk x max_depth rows. Gradients equal the
    full-tape kernel's exactly per chunk (the chunk sum order can differ
    from a one-shot run by f32 addition order only).

    g_fb is the loss cotangent on the RAW SAMPLE SUMS frame [H, W, 3]
    (the render_frame_pallas contract). Textured scenes ride the
    recorded texture-multiplier tape, same semantics as mode="replay".
    Runs as a host loop of jitted chunk steps — use it for big shapes;
    for tapes that fit, mode="replay-kernel" is one fused graph.
    """
    from tracer.pallas import megakernel

    assert spp % spp_chunk == 0, f"spp {spp} % spp_chunk {spp_chunk} != 0"
    if bucketed is None:
        # the dead-tail fraction (and so the win) grows with depth; at
        # shallow depths the gather overhead is not worth it. interpret
        # mode (CPU tests) defaults off: per-bucket kernel re-traces
        # cost minutes there and bucketing is pinned by its own test.
        bucketed = max_depth >= 16 and not interpret
    texture_grads = texture_grads and scene.textures is not None
    tape_fields = 3
    if scene.textures is not None:
        tape_fields = 13 if texture_grads else 9
    g_scene = g_cam = None
    for c in range(spp // spp_chunk):
        out = megakernel.render_frame_pallas_record(
            scene, cam, width, height, spp_chunk, max_depth,
            reference_quirk=reference_quirk, interpret=interpret,
            sample_start=c * spp_chunk, rr_start=rr_start,
            fast_math=fast_math,
            tape_fields=tape_fields,
        )
        idx = out[1]
        tex = out[2] if len(out) == 3 else None
        if bucketed:
            gs, gc = scene_grads_bucketed(
                scene, cam, idx, g_fb, width, height, spp_chunk, max_depth,
                reference_quirk=reference_quirk, rr_start=rr_start,
                sample_start=c * spp_chunk, tex_tape=tex, interpret=interpret,
                texture_grads=texture_grads,
            )
        else:
            gs, gc, _ = scene_cam_grads(
                scene, cam, idx, g_fb, width, height, spp_chunk, max_depth,
                reference_quirk=reference_quirk, rr_start=rr_start,
                sample_start=c * spp_chunk, tex_tape=tex, interpret=interpret,
                texture_grads=texture_grads,
            )
        if g_scene is None:
            g_scene, g_cam = gs, gc
        else:
            g_scene = jax.tree.map(_acc_grad, g_scene, gs)
            g_cam = jax.tree.map(_acc_grad, g_cam, gc)
    return g_scene, g_cam


def _acc_grad(a, b):
    if not hasattr(a, "dtype") or a.dtype == jax.dtypes.float0:
        return a  # int leaves (mtype, indices) carry float0 cotangents
    return a + b


def l2_grads_deep(scene: Scene, cam, target, width: int, height: int,
                  spp: int, max_depth: int, spp_chunk: int = 4,
                  reference_quirk: bool = True, rr_start=None,
                  interpret=False, fwd_spp_chunk=None, fast_math=False,
                  bucketed=None, texture_grads: bool = False):
    """(loss, d(scene), d(cam)) for mean((fb/spp - target)^2) at any depth.

    Phase 1 renders the frame with the plain persistent kernel (no tape)
    to evaluate the loss and its frame cotangent; phase 2 accumulates
    gradients chunk-by-chunk via scene_grads_chunked. Total cost is
    ~2x forward + backward regardless of spp/depth — this is the honest
    north-star shape (1080p, 64 spp, depth 50) made tractable.
    """
    from tracer.pallas import megakernel

    # fwd_spp_chunk bounds single-dispatch duration on huge frames (see
    # dist.sharding.l2_grads_deep_sharded — a ~190 s dispatch crashed
    # the tunneled TPU worker); summed chunk frames are the identical
    # estimator up to f32 addition order.
    if fwd_spp_chunk and fwd_spp_chunk < spp:
        assert spp % fwd_spp_chunk == 0
        fb = None
        for c in range(spp // fwd_spp_chunk):
            part = megakernel.render_frame_pallas(
                scene, cam, width, height, fwd_spp_chunk, max_depth,
                reference_quirk=reference_quirk, interpret=interpret,
                rr_start=rr_start, sample_start=jnp.int32(c * fwd_spp_chunk),
                fast_math=fast_math,
            )
            fb = part if fb is None else fb + part
    else:
        fb = megakernel.render_frame_pallas(
            scene, cam, width, height, spp, max_depth,
            reference_quirk=reference_quirk, interpret=interpret,
            rr_start=rr_start, fast_math=fast_math,
        )

    def loss_of(fb):
        return jnp.mean((fb / spp - jnp.asarray(target, jnp.float32)) ** 2)

    loss, loss_vjp = jax.vjp(loss_of, fb)
    (g_fb,) = loss_vjp(jnp.ones((), jnp.float32))
    g_scene, g_cam = scene_grads_chunked(
        scene, cam, g_fb, width, height, spp, max_depth, spp_chunk,
        reference_quirk=reference_quirk, rr_start=rr_start,
        interpret=interpret, fast_math=fast_math, bucketed=bucketed,
        texture_grads=texture_grads,
    )
    return loss, g_scene, g_cam
