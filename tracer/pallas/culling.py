"""Cluster-culled intersectors (closed experiments, kept with their data).

Both strategies are measured LOSERS to the brute-force intersector on
TPU at every practical scene size (docs/ROADMAP.md: the legacy
per-cluster `lax.cond` stalls the pipeline ~100x its compute; the
round-2 demand-driven redesign still loses to brute at 2K prims on
serial-iteration overhead). They stay in-tree, tested and
parity-checked, as the recorded experiment for the tile-uniform culling
design space (the TPU-coherent replacement for per-ray BVH stacks,
reference include/bvh.h:19-65) — cluster_k=0 (brute) is the default
everywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from tracer.scene.types import K_INFINITY
from tracer.pallas.kernel_lib import (
    JROWS, J_RAD, J_TEXID, T_MIN,
    _dot3, _dot_exact, _fl, _unified_ts,
)


def _intersect_clustered(
    proj_ref, const_ref, join_ref, cbox_ref, o8, d8, a, od, oo,
    ox, oy, oz, dx, dy, dz, *, num_clusters, k, tile_px, fast_math,
):
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)

    # guarded inverse direction for the slab test
    eps = 1e-30
    sdx = jnp.where(jnp.abs(dx) < eps, jnp.where(dx < 0, -eps, eps), dx)
    sdy = jnp.where(jnp.abs(dy) < eps, jnp.where(dy < 0, -eps, eps), dy)
    sdz = jnp.where(jnp.abs(dz) < eps, jnp.where(dz < 0, -eps, eps), dz)
    ivx, ivy, ivz = 1.0 / sdx, 1.0 / sdy, 1.0 / sdz

    def body(c, carry):
        t_glob, rec_glob, pu_glob, pv_glob = carry
        # cluster AABB scalars (SMEM)
        lox, loy, loz = cbox_ref[c, 0], cbox_ref[c, 1], cbox_ref[c, 2]
        hix, hiy, hiz = cbox_ref[c, 3], cbox_ref[c, 4], cbox_ref[c, 5]
        # branchless slab vs the 128-ray bundle (aabb.h:42-65)
        tx1 = (lox - ox) * ivx
        tx2 = (hix - ox) * ivx
        ty1 = (loy - oy) * ivy
        ty2 = (hiy - oy) * ivy
        tz1 = (loz - oz) * ivz
        tz2 = (hiz - oz) * ivz
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(tx1, tx2), jnp.minimum(ty1, ty2)),
            jnp.maximum(jnp.minimum(tz1, tz2), T_MIN),
        )
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(tx1, tx2), jnp.maximum(ty1, ty2)),
            jnp.minimum(jnp.maximum(tz1, tz2), K_INFINITY),
        )
        any_hit = jnp.any(tmax > tmin)

        half = num_clusters * 3 * k  # hi rows, then lo rows
        dot = _dot3 if fast_math else _dot_exact

        def visit():
            p_hi = proj_ref[pl.ds(c * 3 * k, 3 * k)]
            p_lo = proj_ref[pl.ds(half + c * 3 * k, 3 * k)]
            po = dot(p_hi, p_lo, o8)
            pd = dot(p_hi, p_lo, d8)
            cb = const_ref[pl.ds(c * k, k), :]
            t_blk, alpha, beta_uv = _unified_ts(po, pd, cb, a, od, oo, k)
            # join table is [C*K, JROWS]: dynamic slices must be on the
            # sublane dim; contract over K with dot_general (lhs dim 0)
            jb = join_ref[pl.ds(c * k, k), :]
            t_best_c = jnp.min(t_blk, axis=0, keepdims=True)
            widx = jnp.min(jnp.where(t_blk == t_best_c, iota_k, k), axis=0, keepdims=True)
            onehot = (iota_k == widx).astype(jnp.float32)
            if fast_math:
                dg = lambda x: jax.lax.dot_general(
                    x, onehot, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                rec_c = dg(jb[:, :JROWS]) + dg(jb[:, JROWS:])
            else:
                rec_c = jax.lax.dot_general(
                    jb[:, :JROWS] + jb[:, JROWS:], onehot,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            t_c = t_best_c
            pu_c = jnp.sum(onehot * alpha, axis=0, keepdims=True)
            pv_c = jnp.sum(onehot * beta_uv, axis=0, keepdims=True)
            better = t_c < t_glob
            return (
                jnp.where(better, t_c, t_glob),
                jnp.where(better, rec_c, rec_glob),
                jnp.where(better, pu_c, pu_glob),
                jnp.where(better, pv_c, pv_glob),
            )

        return jax.lax.cond(any_hit, visit, lambda: (t_glob, rec_glob, pu_glob, pv_glob))

    t0 = jnp.full((1, tile_px), K_INFINITY, jnp.float32)
    # .at[].set lowers to an unsupported scatter in Mosaic; build the
    # initial record with an iota mask instead
    rrow = jax.lax.broadcasted_iota(jnp.int32, (JROWS, tile_px), 0)
    rec0 = jnp.where(
        rrow == J_RAD, 1.0, jnp.where(rrow == J_TEXID, -1.0, 0.0)
    ).astype(jnp.float32)
    uv0 = jnp.zeros((1, tile_px), jnp.float32)
    return jax.lax.fori_loop(0, num_clusters, body, (t0, rec0, uv0, uv0))


def _intersect_culled(
    proj_ref, const_ref, join_ref, cboxv_ref, cull_scr, o8, d8, a, od, oo,
    ox, oy, oz, dx, dy, dz, *, num_clusters, k, group, tile_px, fast_math,
):
    """Demand-driven packet culling (round 2, replaces per-cluster cond).

    Round 1 measured that a scalar `lax.cond` per cluster stalls the
    pipeline ~100x its compute and LOSES to brute everywhere. This is
    the redesign from docs/ROADMAP.md: a fully VECTORIZED slab pass
    marks every cluster any ray can hit, then a while-loop visits only
    the marked clusters, `group` at a time (scalar argmax selection +
    dynamic-slice table loads), so the per-iteration scalar overhead is
    amortized over `group` clusters and invisible clusters cost nothing.
    Demand and the running winner live in VMEM scratch (the kernel's
    standard trick to keep vector state out of while-loop carries).

    cboxv_ref: [Cp, 8] VMEM cluster AABBs (lo3, hi3, pad; empty boxes on
    padding rows). cull_scr: [JROWS + 4 + cdiv(Cp,?) ...] — see caller.
    Returns (t_best (1,T), rec (JROWS,T), pu, pv) like the other
    intersectors.
    """
    T = tile_px
    demand_ref, best_ref = cull_scr  # [Cp, 128] f32, [JROWS + 3, T] f32

    # ---- vectorized visibility pass: slab vs every cluster ----------
    eps = 1e-30
    sdx = jnp.where(jnp.abs(dx) < eps, jnp.where(dx < 0, -eps, eps), dx)
    sdy = jnp.where(jnp.abs(dy) < eps, jnp.where(dy < 0, -eps, eps), dy)
    sdz = jnp.where(jnp.abs(dz) < eps, jnp.where(dz < 0, -eps, eps), dz)
    fox, foy, foz = _fl(ox, T), _fl(oy, T), _fl(oz, T)
    ivx, ivy, ivz = 1.0 / _fl(sdx, T), 1.0 / _fl(sdy, T), 1.0 / _fl(sdz, T)
    lox = cboxv_ref[:, 0:1]
    loy = cboxv_ref[:, 1:2]
    loz = cboxv_ref[:, 2:3]
    hix = cboxv_ref[:, 3:4]
    hiy = cboxv_ref[:, 4:5]
    hiz = cboxv_ref[:, 5:6]
    tx1 = (lox - fox) * ivx
    tx2 = (hix - fox) * ivx
    ty1 = (loy - foy) * ivy
    ty2 = (hiy - foy) * ivy
    tz1 = (loz - foz) * ivz
    tz2 = (hiz - foz) * ivz
    tmin = jnp.maximum(
        jnp.maximum(jnp.minimum(tx1, tx2), jnp.minimum(ty1, ty2)),
        jnp.maximum(jnp.minimum(tz1, tz2), T_MIN),
    )
    tmax = jnp.minimum(
        jnp.minimum(jnp.maximum(tx1, tx2), jnp.maximum(ty1, ty2)),
        jnp.minimum(jnp.maximum(tz1, tz2), K_INFINITY),
    )
    vis = jnp.max(jnp.where(tmax > tmin, 1.0, 0.0), axis=1, keepdims=True)
    # Padding rows (lo=+inf, hi=-inf boxes) pass the slab test above —
    # the per-axis min/max erases the lo/hi inversion — so mask them out
    # explicitly or the loop would visit out-of-range cluster ids and
    # dynamic-slice proj/const/join across the hi/lo halves whenever
    # num_clusters % 8 != 0 (advisor round-2 high finding).
    crow = jax.lax.broadcasted_iota(jnp.int32, vis.shape, 0)
    vis = vis * (crow < num_clusters).astype(jnp.float32)
    demand_ref[...] = jnp.broadcast_to(vis, demand_ref.shape)

    # ---- init the running winner (same layout as _intersect_clustered)
    rrow = jax.lax.broadcasted_iota(jnp.int32, (JROWS, T), 0)
    best_ref[0:JROWS, :] = jnp.where(
        rrow == J_RAD, 1.0, jnp.where(rrow == J_TEXID, -1.0, 0.0)
    ).astype(jnp.float32)
    best_ref[JROWS:JROWS + 1, :] = jnp.full((1, T), K_INFINITY, jnp.float32)
    best_ref[JROWS + 1:JROWS + 3, :] = jnp.zeros((2, T), jnp.float32)

    cp = demand_ref.shape[0]
    cid = jax.lax.broadcasted_iota(jnp.int32, (cp, 128), 0)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (group * k, 1), 0)
    half = num_clusters * 3 * k  # proj hi rows, then lo rows
    jr2 = join_ref.shape[1] // 2

    def cond(rem):
        return rem > 0

    def body(rem):
        dem = demand_ref[...] > 0.5
        # pick up to `group` demanded clusters (scalar argmax each)
        sel = []
        for _ in range(group):
            b = jnp.max(jnp.where(dem, cid, -1))  # scalar, -1 = none left
            sel.append(b)
            dem = dem & (cid != b)
        demand_ref[...] = jnp.where(dem, 1.0, 0.0)

        t_parts, al_parts, be_parts, jb_parts = [], [], [], []
        for b in sel:
            ok = b >= 0
            bs = jnp.maximum(b, 0)
            p_hi = proj_ref[pl.ds(bs * 3 * k, 3 * k)]
            p_lo = proj_ref[pl.ds(half + bs * 3 * k, 3 * k)]
            dot = _dot3 if fast_math else _dot_exact
            po = dot(p_hi, p_lo, o8)
            pd = dot(p_hi, p_lo, d8)
            cb = const_ref[pl.ds(bs * k, k), :]
            t_blk, alpha, beta_uv = _unified_ts(po, pd, cb, a, od, oo, k)
            # empty selection slots contribute nothing
            t_parts.append(jnp.where(ok, t_blk, K_INFINITY))
            al_parts.append(alpha)
            be_parts.append(beta_uv)
            jb_parts.append(join_ref[pl.ds(bs * k, k), :])

        t_all = jnp.concatenate(t_parts, axis=0)        # [G*k, T]
        alpha = jnp.concatenate(al_parts, axis=0)
        beta_uv = jnp.concatenate(be_parts, axis=0)
        jb = jnp.concatenate(jb_parts, axis=0)          # [G*k, 2*JROWS]

        t_best_g = jnp.min(t_all, axis=0, keepdims=True)
        widx = jnp.min(
            jnp.where(t_all == t_best_g, iota_k, group * k), axis=0, keepdims=True
        )
        onehot = (iota_k == widx).astype(jnp.float32)
        if fast_math:
            dg = lambda x: jax.lax.dot_general(
                x, onehot, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            rec_g = dg(jb[:, :jr2]) + dg(jb[:, jr2:])
        else:
            rec_g = jax.lax.dot_general(
                jb[:, :jr2] + jb[:, jr2:], onehot,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        pu_g = jnp.sum(onehot * alpha, axis=0, keepdims=True)
        pv_g = jnp.sum(onehot * beta_uv, axis=0, keepdims=True)

        t_old = best_ref[JROWS:JROWS + 1, :]
        better = t_best_g < t_old
        best_ref[0:JROWS, :] = jnp.where(better, rec_g, best_ref[0:JROWS, :])
        best_ref[JROWS:JROWS + 1, :] = jnp.where(better, t_best_g, t_old)
        best_ref[JROWS + 1:JROWS + 2, :] = jnp.where(
            better, pu_g, best_ref[JROWS + 1:JROWS + 2, :]
        )
        best_ref[JROWS + 2:JROWS + 3, :] = jnp.where(
            better, pv_g, best_ref[JROWS + 2:JROWS + 3, :]
        )
        return jnp.sum((demand_ref[:, 0:1] > 0.5).astype(jnp.int32))

    jax.lax.while_loop(
        cond, body, jnp.sum((demand_ref[:, 0:1] > 0.5).astype(jnp.int32))
    )
    return (
        best_ref[JROWS:JROWS + 1, :],
        best_ref[0:JROWS, :],
        best_ref[JROWS + 1:JROWS + 2, :],
        best_ref[JROWS + 2:JROWS + 3, :],
    )
