"""The fused render kernel body (generate -> intersect -> shade).

`_kernel` is the single Pallas kernel behind every megakernel mode:
persistent per-lane path regeneration (the live fast path), the legacy
sample-loop, sample-major shading, recording (winner-index + texture
tapes for the replay VJP), brute / clustered / demand-culled
intersection, VMEM-resident and HBM demand-paged textures, stratified
sampling, Russian roulette. See megakernel.py for the engine overview;
pallas_call wrappers and scene packing live there and in kernel_lib.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tracer.scene.types import K_INFINITY
from tracer.pallas.kernel_lib import (
    JROWS, PERSIST_UNROLL, TEX_SLOTS, _U,
    _intersect_brute, _intersect_brute_rows, _rand, _round_up,
    _shade, _shade_draws, _wang_hash,
)
from tracer.pallas.culling import _intersect_clustered, _intersect_culled


# ----------------------------------------------------------------------
# the kernel
# ----------------------------------------------------------------------


def _kernel(
    params_ref,  # SMEM [1, 24] f32: camera + background
    *refs,
    clustered: bool,
    tile_px: int,
    num_s: int,
    num_p: int,
    n_pad: int,
    num_clusters: int,
    k: int,
    spp: int,
    max_depth: int,
    width: int,
    num_pixels: int,
    quirk: bool,
    strat_k: int = 0,
    has_tex: bool = False,
    sample_block: int = 1,
    fast_math: bool = False,
    persistent: bool = False,
    big_tex: bool = False,
    tex_th: int = 0,
    tex_tw: int = 0,
    record_idx: bool = False,
    culled: bool = False,
    cull_group: int = 4,
    rr_start=None,
    no_far: bool = False,
    tape_fields: int = 3,
    debug_iters: bool = False,
    lane_major: bool = False,
    interleave: int = 1,
):
    refs = list(refs)
    cull_scr = None
    if culled:  # scratch order: [persistent..., tex..., cull...] -> pop cull first
        cull_scr = tuple(refs[-2:])  # demand [Cp,128] f32, best [JROWS+3,T] f32
        del refs[-2:]
    tex_scr = None
    if big_tex:  # scratch order: [persistent..., tex...] -> pop tex first
        tex_scr = tuple(refs[-4:])  # blk (f32), aux (f32), cached (SMEM), sem
        del refs[-4:]
    scratch_refs = ()
    if persistent:
        scratch_refs = tuple(refs[-2:])  # state (f32), seed (u32)
        del refs[-2:]
    idx_ref = None
    textape_ref = None
    if record_idx:
        assert not (clustered or sample_block > 1)
        # persistent recording scatters by per-lane (sample, depth) slot;
        # 128-px tiles keep the tape row dim == lane dim relayout-free
        assert not persistent or tile_px == 128
        if has_tex:
            # [tape_fields*spp*max_depth, tile] f32; fields 0-2 (texel
            # multipliers) are neutral at 1.0, derivative/addressing
            # fields (3+, round 3) at 0.0
            textape_ref = refs.pop()
            rows3 = 3 * spp * max_depth
            textape_ref[0:rows3, :] = jnp.ones((rows3, tile_px), jnp.float32)
            if tape_fields > 3:
                rest = (tape_fields - 3) * spp * max_depth
                textape_ref[rows3:rows3 + rest, :] = jnp.zeros(
                    (rest, tile_px), jnp.float32)
        idx_ref = refs.pop()  # second output: [spp*max_depth, tile] i32
        idx_ref[...] = jnp.full(idx_ref.shape, -1, jnp.int32)
    tex_refs = None
    big = None
    if has_tex:
        if big_tex:
            # ONE pre-blocked HBM ref (block-major: rows [b*3*BH, ...))
            t1 = refs[-2]
            del refs[-2]
            nbx = _round_up(tex_tw, 128) // 128
            big = (t1,) + tex_scr + (tex_th, tex_tw, nbx, debug_iters)
            for _sl in range(TEX_SLOTS):  # invalidate every cache slot
                tex_scr[2][0, _sl] = -1
            if debug_iters:  # zero the demand-iter / DMA-miss counters
                tex_scr[2][0, TEX_SLOTS] = 0
                tex_scr[2][0, TEX_SLOTS + 1] = 0
        else:
            tex_refs = tuple(refs[-4:-1])
            del refs[-4:-1]
    if clustered:
        cbox_ref, proj_ref, const_ref, join_ref, out_ref = refs
    else:
        proj_ref, const_ref, join_ref, out_ref = refs
        cbox_ref = None

    pid = pl.program_id(0)
    if sample_block > 1:
        # sample-major: the tile is 128 PIXELS x sample_block concurrent
        # SAMPLES (sublane dim). Samples of the same pixel share primary
        # geometry, so the per-tile bounce loop stays exit-coherent while
        # every op runs at full (8, 128) sublane utilization.
        assert tile_px == 128
        ps = (sample_block, 128)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        lin = pid * 128 + lane  # (1, 128) pixel ids, broadcast over samples
        valid_px = lin < num_pixels
        lin = jnp.minimum(lin, num_pixels - 1)
        s_off = jax.lax.broadcasted_iota(jnp.int32, (sample_block, 1), 0)
    else:
        # lane-major (round 5): the whole tile is ONE (1, tile_px) vector
        # row instead of (tile_px//128, 128) sublane-major. flat()/to_px
        # become identity (no (8,128)<->(1,T) relayouts — what sank the
        # round-2 t1024 experiment) and every elementwise chain in
        # shade/regen/state runs once over T lanes, amortizing the
        # latency-bound per-iteration fixed cost (~360 ns, round-4
        # ablation; benchmarks/interleave_microbench.py shows independent
        # lanes in one op are near-free) over T/128 x more paths.
        # Exit/regeneration stays per-LANE, so the t128 exit-coherence
        # win is unaffected.
        if lane_major:
            assert persistent and not clustered and not record_idx
            ps = (1, tile_px)
        else:
            ps = (tile_px // 128, 128)  # pixel-tile shape: (1,128) or (8,128)
        sub = jax.lax.broadcasted_iota(jnp.int32, ps, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, ps, 1)
        lin = pid * tile_px + sub * 128 + lane
        valid = lin < num_pixels
        lin = jnp.minimum(lin, num_pixels - 1)
        s_off = None
    # row_offset (params slot 15) shifts local rows to GLOBAL image rows
    # so a shard_map'd kernel keeps globally-consistent seeds and camera
    # math — sharded output is bit-identical to single-device
    row0 = params_ref[0, 15].astype(jnp.int32)
    # sample_start (params slot 16) offsets the per-pixel sample stream so
    # callers can chunk spp (disjoint global sample ids, same streams)
    samp0 = params_ref[0, 16].astype(jnp.int32)
    i_int = lin % width  # column (i32)
    j_int = lin // width + row0  # global row
    i_px = i_int.astype(jnp.float32)
    j_px = j_int.astype(jnp.float32)

    p = [params_ref[0, idx] for idx in range(15)]
    (ox0, oy0, oz0, p00x, p00y, p00z, dux, duy, duz, dvx, dvy, dvz,
     bgr, bgg, bgb) = p

    # integer->uint32 only (Mosaic has no f32->u32 cast)
    iu = (lin + row0 * width).astype(_U)  # global linear pixel id
    wu = _U(width)
    base_lin = (i_int.astype(_U) * wu + j_int.astype(_U)) if quirk else iu
    base_seed = _wang_hash(base_lin)

    flat_n = ps[0] * ps[1]  # elements per tile (pixels x samples)

    if persistent:
        # ------------------------------------------------------------------
        # Persistent per-lane path regeneration (round 2): ONE while-loop
        # per tile; every lane carries its own (sample, depth) progress and
        # starts its next sample the moment its path terminates. This gets
        # the exit coherence that made 128-px tiles win in round 1 at LANE
        # granularity while shading runs at full (8, 128) sublane shapes —
        # the two effects ROADMAP.md round-2 priority 1 asked to combine.
        # RNG streams are bit-identical to the sample-loop mode (seeds
        # depend only on (pixel, sample)); per-sample radiance accumulates
        # into `final` and folds into `acc` at sample end, preserving the
        # exact f32 summation grouping of the other engines.
        # ------------------------------------------------------------------
        # sample-major persistent (smaj): ps0 sublane rows are ps0
        # CONCURRENT SAMPLES of the same 128 pixels; lane (r, c) walks
        # sample stream r, r+ps0, r+2*ps0, ... of pixel c. All per-lane
        # state/shading runs at native (ps0, 128) full-sublane shapes and
        # the intersection loops per row (_intersect_brute_rows), so no
        # (ps0,128)<->(1, ps0*128) relayouts happen anywhere on the
        # untextured path — the combination 1024-px tiles couldn't reach.
        smaj = sample_block > 1
        if smaj:
            valid = jnp.broadcast_to(valid_px, ps)
        # per-lane state lives in VMEM scratch refs, NOT loop carries:
        # only a scalar `remaining` count is carried, which keeps Mosaic's
        # while-carry layout inference out of the picture entirely (vector
        # carries with mixed replicated/offset layouts hit unimplemented
        # relayouts: "Sublane broadcast").
        state_ref, seed_ref = scratch_refs
        ps0 = ps[0]
        F_S, F_DEPTH, F_ALIVE = 0, 1, 2
        F_O, F_D, F_B, F_F, F_A = 3, 6, 9, 12, 15

        # interleave (round 5): G independent SAMPLE-STREAM groups of the
        # same 128 pixels advance back-to-back inside one loop body.
        # Group g owns samples [g*spp/G, (g+1)*spp/G) and its own 18-row
        # state block + seed row, so the G chains have no data deps and
        # the Mosaic scheduler overlaps them (measured: 2 independent
        # chains cost ~1.4x of one, benchmarks/interleave_microbench.py)
        # — amortizing the latency-bound per-iteration fixed cost. Unlike
        # lane-major wider tiles, the groups cover the SAME pixels, so
        # their total bounce budgets are near-identical and the shared
        # loop exit loses almost no occupancy. G=1 is the unchanged
        # default path.
        G = interleave
        if G > 1:
            assert not smaj and not clustered and not record_idx \
                and not debug_iters and spp % G == 0, \
                "interleave: persistent brute forward, spp % G == 0"

        def accessors(g):
            off = 18 * g
            row = lambda i: state_ref[(off + i) * ps0:(off + i + 1) * ps0, :]

            def put(i, v):
                state_ref[(off + i) * ps0:(off + i + 1) * ps0, :] = v

            def put3(i, v3):
                for c in range(3):
                    put(i + c, v3[c])

            seed_get = lambda: seed_ref[g * ps0:(g + 1) * ps0, :]

            def seed_put(v):
                seed_ref[g * ps0:(g + 1) * ps0, :] = v

            return row, put, put3, seed_get, seed_put

        row, put, put3, _, _ = accessors(0)

        flat = lambda x: jnp.broadcast_to(x, ps).reshape(1, flat_n)
        # smaj state is ALREADY tile-shaped; everything else reshapes the
        # flat intersection row back to the tile
        to_px = (lambda r: r) if smaj else (lambda r: r.reshape(ps))

        # per-lane primary-ray pixel centers (camera.cu:218-224)
        pcx = p00x + i_px * dux + j_px * dvx
        pcy = p00y + i_px * duy + j_px * dvy
        pcz = p00z + i_px * duz + j_px * dvz

        kf = jnp.float32(strat_k) if strat_k else None

        # s/depth bookkeeping is f32 (exact for these tiny ranges)
        spp_f = jnp.float32(spp)
        maxd_f = jnp.float32(max_depth)
        # sample stride: smaj lane (r, c) walks samples r, r+ps0, ...
        s_stride = jnp.float32(ps0 if smaj else 1)
        s_first = s_off.astype(jnp.float32) - s_stride if smaj else -1.0

        sppg_f = jnp.float32(spp // G)
        for g in range(G):
            g_row, g_put, g_put3, _, g_seed_put = accessors(g)
            lo_f = jnp.float32(g * (spp // G))
            hi_f = lo_f + sppg_f  # group sample bound (== spp_f at G=1)
            first_g = s_first if smaj else lo_f - 1.0
            g_put(F_S, jnp.where(valid, first_g, hi_f))  # about to start
            g_put(F_DEPTH, jnp.broadcast_to(maxd_f, ps))  # regen on entry
            g_put(F_ALIVE, jnp.zeros(ps, jnp.float32))
            zero3 = (jnp.zeros(ps, jnp.float32),) * 3
            g_put3(F_O, zero3)
            g_put3(F_D, zero3)
            g_put3(F_B, zero3)
            g_put3(F_F, zero3)
            g_put3(F_A, zero3)
            g_seed_put(jnp.broadcast_to(base_seed, ps))

        def cond(remaining):
            return remaining > 0

        def step_group(g):
            row, put, put3, seed_get, seed_put = accessors(g)
            lo_f = jnp.float32(g * (spp // G))
            hi_f = lo_f + sppg_f  # group sample bound (== spp_f at G=1)
            s = row(F_S)
            depth = row(F_DEPTH)
            alive = row(F_ALIVE) > 0.5
            ox, oy, oz = row(F_O), row(F_O + 1), row(F_O + 2)
            dx, dy, dz = row(F_D), row(F_D + 1), row(F_D + 2)
            b0, b1, b2 = row(F_B), row(F_B + 1), row(F_B + 2)
            f0, f1, f2 = row(F_F), row(F_F + 1), row(F_F + 2)
            seed = seed_get()

            # -- sample boundary: fold the finished sample, regenerate ----
            over = (~alive) | (depth >= maxd_f)
            put(F_A + 0, row(F_A + 0) + jnp.where(over, f0, 0.0))
            put(F_A + 1, row(F_A + 1) + jnp.where(over, f1, 0.0))
            put(F_A + 2, row(F_A + 2) + jnp.where(over, f2, 0.0))
            f0 = jnp.where(over, 0.0, f0)
            f1 = jnp.where(over, 0.0, f1)
            f2 = jnp.where(over, 0.0, f2)
            s = jnp.where(over, jnp.minimum(s + s_stride, hi_f), s)
            can = over & (s < hi_f) & valid

            s_g = s + samp0.astype(jnp.float32)  # global sample id
            seed_r = _wang_hash(base_seed + s_g.astype(jnp.int32).astype(_U))
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
            rdx = pcx + offx * dux + offy * dvx - ox0
            rdy = pcy + offx * duy + offy * dvy - oy0
            rdz = pcz + offx * duz + offy * dvz - oz0

            ox = jnp.where(can, ox0, ox)
            oy = jnp.where(can, oy0, oy)
            oz = jnp.where(can, oz0, oz)
            dx = jnp.where(can, rdx, dx)
            dy = jnp.where(can, rdy, dy)
            dz = jnp.where(can, rdz, dz)
            b0 = jnp.where(can, 1.0, b0)
            b1 = jnp.where(can, 1.0, b1)
            b2 = jnp.where(can, 1.0, b2)
            seed = jnp.where(can, seed_r, seed)
            depth = jnp.where(over, 0.0, depth)
            # no bool select_n in Mosaic (i8->i1 trunc): use logical masks
            alive = (over & can) | (~over & alive)

            # scatter draws depend only on the post-regen seed — hoisted
            # ahead of the intersection (measured perf-neutral: the
            # scheduler already overlaps by dataflow; streams and values
            # bit-identical — see _shade_draws)
            draws = _shade_draws(seed)

            # -- one bounce for every live lane ---------------------------
            a = dx * dx + dy * dy + dz * dz
            od = ox * dx + oy * dy + oz * dz
            oo = ox * ox + oy * oy + oz * oz

            if smaj:
                assert not clustered and not record_idx
                t_best, rec, pu, pv = _intersect_brute_rows(
                    proj_ref, const_ref, join_ref,
                    (ox, oy, oz), (dx, dy, dz), a, od, oo,
                    num_s=num_s, num_p=num_p, n_pad=n_pad,
                    fast_math=fast_math, ps0=ps0, no_far=no_far,
                )
                o3, d3, beta, fin, seed, alive = _shade(
                    rec, t_best, ox, oy, oz, dx, dy, dz, a, (b0, b1, b2),
                    (f0, f1, f2), seed, alive, (bgr, bgg, bgb), to_px,
                    pu=pu, pv=pv, tex_refs=tex_refs, flat=flat, big_tex=big,
                    ps=ps, rr_start=rr_start, depth=depth, rec_rows=ps0,
                    draws=draws,
                )
                put(F_S, s)
                put(F_DEPTH, depth + 1.0)
                put(F_ALIVE, jnp.where(alive, 1.0, 0.0))
                put3(F_O, o3)
                put3(F_D, d3)
                put3(F_B, beta)
                put3(F_F, fin)
                seed_put(seed)
                return jnp.sum((s < hi_f).astype(jnp.int32))

            o8 = jnp.concatenate(
                [flat(ox), flat(oy), flat(oz), jnp.zeros((5, flat_n), jnp.float32)],
                axis=0,
            )
            d8 = jnp.concatenate(
                [flat(dx), flat(dy), flat(dz), jnp.zeros((5, flat_n), jnp.float32)],
                axis=0,
            )

            if clustered and culled:
                t_best, rec, pu, pv = _intersect_culled(
                    proj_ref, const_ref, join_ref, cbox_ref, cull_scr,
                    o8, d8, flat(a), flat(od), flat(oo),
                    ox, oy, oz, dx, dy, dz, num_clusters=num_clusters, k=k,
                    group=cull_group, tile_px=flat_n, fast_math=fast_math,
                )
            elif clustered:
                t_best, rec, pu, pv = _intersect_clustered(
                    proj_ref, const_ref, join_ref, cbox_ref, o8, d8,
                    flat(a), flat(od), flat(oo),
                    ox, oy, oz, dx, dy, dz, num_clusters=num_clusters, k=k,
                    tile_px=flat_n, fast_math=fast_math,
                )
            else:
                t_best, rec, pu, pv, widx = _intersect_brute(
                    proj_ref, const_ref, join_ref, o8, d8,
                    flat(a), flat(od), flat(oo),
                    num_s=num_s, num_p=num_p, n_pad=n_pad, tile_px=flat_n,
                    fast_math=fast_math, no_far=no_far,
                )

            if record_idx:
                # Per-lane tape scatter: each lane writes its winner index
                # at row s*max_depth + depth. Rows differ per lane, so a
                # dynamic-slice store can't express it — but each (lane,
                # slot) is bounced at most once, so a masked full-tape
                # accumulate is an exact scatter: tape starts at -1 and a
                # hit adds widx+1 (miss adds 0, leaving -1 = miss marker,
                # which is also what the replay expects for never-reached
                # bounces of dead lanes).
                hit_r = t_best < jnp.float32(0.5 * K_INFINITY)  # (1, 128)
                val1 = jnp.where(hit_r, widx + 1, 0)  # i32 (1, 128)
                slot = (s * maxd_f + depth).astype(jnp.int32)  # (1, 128)
                rows = spp * max_depth
                row_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
                took = (row_iota == jnp.broadcast_to(slot, (rows, 128))) & \
                    jnp.broadcast_to(alive, (rows, 128))
                add = jnp.where(took, jnp.broadcast_to(val1, (rows, 128)), 0)
                idx_ref[...] = idx_ref[...] + add

            shade_out = _shade(
                rec, t_best, ox, oy, oz, dx, dy, dz, a, (b0, b1, b2),
                (f0, f1, f2), seed, alive, (bgr, bgg, bgb), to_px,
                pu=pu, pv=pv, tex_refs=tex_refs, flat=flat, big_tex=big, ps=ps,
                rr_start=rr_start, depth=depth,
                tape_fields=tape_fields if textape_ref is not None else 0,
                draws=draws,
            )
            if textape_ref is not None:
                o3, d3, beta, fin, seed, alive2, tms = shade_out
                # same masked-accumulate scatter as the index tape: the
                # tape starts at its neutral (1.0 for multiplier fields,
                # 0.0 for derivative/addressing) and a visited slot adds
                # (value - neutral)
                rows = spp * max_depth
                for c in range(tape_fields):
                    neutral = 1.0 if c < 3 else 0.0
                    sl = slice(c * rows, (c + 1) * rows)
                    add_c = jnp.where(
                        took, jnp.broadcast_to(tms[c] - neutral, (rows, 128)),
                        0.0)
                    textape_ref[sl, :] = textape_ref[sl, :] + add_c
                alive = alive2
            else:
                o3, d3, beta, fin, seed, alive = shade_out
            put(F_S, s)
            put(F_DEPTH, depth + 1.0)
            put(F_ALIVE, jnp.where(alive, 1.0, 0.0))
            put3(F_O, o3)
            put3(F_D, d3)
            put3(F_B, beta)
            put3(F_F, fin)
            seed_put(seed)
            return jnp.sum((s < hi_f).astype(jnp.int32))

        def body(remaining):
            rem = step_group(0)
            for g in range(1, G):
                rem = rem + step_group(g)
            return rem

        if PERSIST_UNROLL > 1:
            inner = body

            def body(remaining):
                for _ in range(PERSIST_UNROLL):
                    remaining = inner(remaining)
                return remaining

        if debug_iters:
            # diagnostic: count executed loop bodies; write into the R
            # channel (image becomes the per-tile iteration count)
            body2 = body

            def cond2(st):
                return st[0] > 0

            def body3(st):
                return (body2(st[0]), st[1] + 1)

            st = jax.lax.while_loop(
                cond2, body3, (jnp.sum(valid.astype(jnp.int32)), jnp.int32(0)))
            put(F_A + 0, jnp.broadcast_to(
                st[1].astype(jnp.float32) * jnp.float32(PERSIST_UNROLL), ps))
            if big is not None:
                # G = texture demand-loop iterations, B = DMA misses
                put(F_A + 1, jnp.broadcast_to(
                    tex_scr[2][0, TEX_SLOTS].astype(jnp.float32), ps))
                put(F_A + 2, jnp.broadcast_to(
                    tex_scr[2][0, TEX_SLOTS + 1].astype(jnp.float32), ps))
        else:
            jax.lax.while_loop(
                cond, body, jnp.int32(G) * jnp.sum(valid.astype(jnp.int32)))
        # one more fold: the final sample of each lane ended inside the
        # last iterations with its radiance still in `final`... no — the
        # fold happens at the top of the NEXT iteration, and a lane only
        # retires (s -> spp) in the same iteration its final sample folds,
        # so at loop exit every contribution is already in the acc rows.
        if smaj:
            # each sublane row holds one sample sub-stream's sums; the
            # pixel total is their cross-sublane sum (different f32
            # grouping than the sequential sample loop — tolerance, not
            # bit, parity vs the other engines)
            for c in range(3):
                out_ref[c:c + 1, :] = jnp.sum(row(F_A + c), axis=0, keepdims=True)
        else:
            for c in range(3):
                acc_c = row(F_A + c)
                for g in range(1, G):
                    acc_c = acc_c + accessors(g)[0](F_A + c)
                out_ref[c:c + 1, :] = acc_c.reshape(1, tile_px)
        return

    def one_sample(s, acc):
        if sample_block > 1:
            s = s * sample_block + s_off  # (SPB, 1) sample indices
            valid_t = valid_px & (s < spp)
        else:
            valid_t = valid
        s_g = s + samp0  # global sample id (sample_start offset)
        seed = _wang_hash(base_seed + s_g.astype(_U))
        seed, ux = _rand(seed)
        seed, uy = _rand(seed)
        if strat_k:
            # stratified cell (s % k, s // k); scalar cell, vector jitter
            kf = jnp.float32(strat_k)
            sf = s_g.astype(jnp.float32)
            cell_x = jnp.mod(sf, kf)
            cell_y = jnp.floor(sf / kf)
            offx = (cell_x + ux) / kf - 0.5
            offy = (cell_y + uy) / kf - 0.5
        else:
            offx = ux - 0.5
            offy = uy - 0.5
        pcx = p00x + i_px * dux + j_px * dvx
        pcy = p00y + i_px * duy + j_px * dvy
        pcz = p00z + i_px * duz + j_px * dvz
        dx = pcx + offx * dux + offy * dvx - ox0
        dy = pcy + offx * duy + offy * dvy - oy0
        dz = pcz + offx * duz + offy * dvz - oz0
        ox = jnp.broadcast_to(ox0, ps)
        oy = jnp.broadcast_to(oy0, ps)
        oz = jnp.broadcast_to(oz0, ps)
        dx = jnp.broadcast_to(dx, ps)
        dy = jnp.broadcast_to(dy, ps)
        dz = jnp.broadcast_to(dz, ps)

        beta = (jnp.ones_like(dx), jnp.ones_like(dx), jnp.ones_like(dx))
        final = (jnp.zeros_like(dx), jnp.zeros_like(dx), jnp.zeros_like(dx))

        # the while carry holds the liveness mask as int32: Mosaic cannot
        # legalize vector<i1> loop carries
        def cond(st):
            return (st[0] < max_depth) & (jnp.max(st[6]) > 0)

        flat = lambda x: jnp.broadcast_to(x, ps).reshape(1, flat_n)
        to_px = lambda r: r.reshape(ps)

        def bounce(st):
            depth, (ox, oy, oz), (dx, dy, dz), beta, final, seed, alive_i = st
            alive = alive_i != 0

            o8 = jnp.concatenate(
                [flat(ox), flat(oy), flat(oz), jnp.zeros((5, flat_n), jnp.float32)], axis=0
            )
            d8 = jnp.concatenate(
                [flat(dx), flat(dy), flat(dz), jnp.zeros((5, flat_n), jnp.float32)], axis=0
            )
            a = dx * dx + dy * dy + dz * dz
            od = ox * dx + oy * dy + oz * dz
            oo = ox * ox + oy * oy + oz * oz

            if clustered and culled:
                t_best, rec, pu, pv = _intersect_culled(
                    proj_ref, const_ref, join_ref, cbox_ref, cull_scr,
                    o8, d8, flat(a), flat(od), flat(oo),
                    ox, oy, oz, dx, dy, dz, num_clusters=num_clusters, k=k,
                    group=cull_group, tile_px=flat_n, fast_math=fast_math,
                )
            elif clustered:
                t_best, rec, pu, pv = _intersect_clustered(
                    proj_ref, const_ref, join_ref, cbox_ref, o8, d8,
                    flat(a), flat(od), flat(oo),
                    ox, oy, oz, dx, dy, dz, num_clusters=num_clusters, k=k,
                    tile_px=flat_n, fast_math=fast_math,
                )
            else:
                t_best, rec, pu, pv, widx = _intersect_brute(
                    proj_ref, const_ref, join_ref, o8, d8,
                    flat(a), flat(od), flat(oo),
                    num_s=num_s, num_p=num_p, n_pad=n_pad, tile_px=flat_n,
                    fast_math=fast_math, no_far=no_far,
                )

            if record_idx:
                # winner index for the differentiable replay backward
                # (tracer.pallas.replay): -1 = miss; dead lanes record
                # garbage that replay masks out via its own alive chain
                hit_r = t_best < jnp.float32(0.5 * K_INFINITY)
                val = jnp.where(hit_r, widx, -1)
                idx_ref[pl.ds(s * max_depth + depth, 1), :] = val

            shade_out = _shade(
                rec, t_best, ox, oy, oz, dx, dy, dz, a, beta, final, seed,
                alive, (bgr, bgg, bgb), to_px,
                pu=pu, pv=pv, tex_refs=tex_refs, flat=flat, big_tex=big, ps=ps,
                rr_start=rr_start, depth=depth,
                tape_fields=tape_fields if textape_ref is not None else 0,
            )
            if textape_ref is not None:
                o3, d3, beta, final, seed, alive, tms = shade_out
                rows = spp * max_depth
                for c in range(tape_fields):
                    textape_ref[pl.ds(c * rows + s * max_depth + depth, 1), :] = tms[c]
            else:
                o3, d3, beta, final, seed, alive = shade_out
            return (depth + 1, o3, d3, beta, final, seed, alive.astype(jnp.int32))

        st = (jnp.int32(0), (ox, oy, oz), (dx, dy, dz), beta, final, seed,
              jnp.broadcast_to(valid_t, ps).astype(jnp.int32))
        st = jax.lax.while_loop(cond, bounce, st)
        f0, f1, f2 = st[4]
        a0, a1, a2 = acc
        return (a0 + f0, a1 + f1, a2 + f2)

    acc = (
        jnp.zeros(ps, jnp.float32),
        jnp.zeros(ps, jnp.float32),
        jnp.zeros(ps, jnp.float32),
    )
    n_iters = pl.cdiv(spp, sample_block) if sample_block > 1 else spp
    acc = jax.lax.fori_loop(0, n_iters, one_sample, acc)
    if sample_block > 1:
        # reduce the concurrent-sample sublanes into the 128-px row
        out_ref[0:1, :] = jnp.sum(acc[0], axis=0, keepdims=True)
        out_ref[1:2, :] = jnp.sum(acc[1], axis=0, keepdims=True)
        out_ref[2:3, :] = jnp.sum(acc[2], axis=0, keepdims=True)
    else:
        out_ref[0:1, :] = acc[0].reshape(1, tile_px)
        out_ref[1:2, :] = acc[1].reshape(1, tile_px)
        out_ref[2:3, :] = acc[2].reshape(1, tile_px)
