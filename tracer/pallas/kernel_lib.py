"""Shared megakernel library: constants, scene packing, in-kernel math.

Split out of megakernel.py (round 3) so the kernel bodies stay readable:
this module holds everything the kernels share — the packed-table layout
constants, host-side pack_scene, the counter-based RNG twin of
tracer.core.rng, the brute-force intersectors (one-hot MXU winner join,
the in-kernel twin of tracer.render.hit_fast), Cephes inverse trig for
sphere UVs, the texture samplers (VMEM-resident bilinear one-hot MXU and
the HBM demand-paged block cache), and the material scatter (_shade, the
in-kernel twin of tracer.materials.scatter). See megakernel.py for the
engine overview and reference citations.
"""

from __future__ import annotations

import collections
import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tracer.core import vec
from tracer.scene.types import Scene, K_INFINITY

TILE = 128  # default lane width; tiles are tile_px = 128 or 1024 pixels

# const-table columns (tables are [prims, CROWS])
C_CCRR = 0  # spheres: |c|^2 - r^2   | planes: D
C_BASEA = 1  # planes: base . A
C_BASEB = 2  # planes: base . B
C_PTYPE = 3  # planes: 0 quad / 1 ellipse / 2 triangle
C_KIND = 4  # 0 sphere, 1 plane, -1 padding
CROWS = 8

# join-table rows (winner record; matches hit_fast's join columns)
J_CX, J_CY, J_CZ, J_RAD = 0, 1, 2, 3
J_NX, J_NY, J_NZ = 4, 5, 6
J_ISSPH = 7
J_MTYPE, J_FUZZ, J_IR = 8, 9, 10
J_ABS0, J_ABS1, J_ABS2 = 11, 12, 13
J_ALB0, J_ALB1, J_ALB2 = 14, 15, 16
J_EMI0, J_EMI1, J_EMI2 = 17, 18, 19
J_TEXID = 20
JROWS = 24  # padded to a sublane multiple

MAX_TEX_DIM = 256  # in-kernel texture cap (bilinear one-hot matmul cost)

T_MIN = 1e-3  # camera.cu:226 (Interval(0.001f, 1e30f))
T_MAX = 1e30
DENOM_EPS = 1e-8  # plane.h:59
RR_MIN_P = 0.05  # Russian-roulette survival floor (caps 1/p at 20x)
# demand-paged texture cache geometry: TEX_SLOTS direct-mapped slots of
# (TEX_BH x 128) blocks per channel. Smaller blocks + more slots beat the
# original 2 x (128x128): a coherent tile touches 2-4 distinct blocks per
# bounce, so per-fetch bytes (3 x TEX_BH x 128 x 4B) dominate the loop.
TEX_BH = int(os.environ.get("TRACER_TEX_BH", "32"))
TEX_SLOTS = int(os.environ.get("TRACER_TEX_SLOTS", "16"))
# persistent-loop body unroll: >1 amortizes the while-loop's scalar
# overhead (cond reduction + branch) over several bounces per iteration
PERSIST_UNROLL = 4

_U = jnp.uint32


class PallasUnsupported(Exception):
    """The megakernel cannot handle this configuration (e.g. oversized
    texture); callers fall back to the XLA path."""


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _split_hi_lo(x):
    """f32 -> (hi, lo): hi exactly bf16-representable, lo = residual."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, x - hi


def _dot1(a, b):
    # DEFAULT precision: one bf16 MXU pass, f32 accumulation
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot3(a_hi, a_lo, b):
    """~f32-faithful matmul in 3 bf16 passes (manual bf16x3; Mosaic has
    no Precision.HIGH and HIGHEST costs 6 passes): split b in-kernel,
    tables are pre-split host-side. Error ~2^-16 relative — enough to
    flip razor-edge hit decisions on ~3% of pixels (different but
    equally valid Monte Carlo paths), hence opt-in via fast_math."""
    b_hi, b_lo = _split_hi_lo(b)
    return _dot1(a_hi, b_hi) + _dot1(a_hi, b_lo) + _dot1(a_lo, b_hi)


def _dot_exact(a_hi, a_lo, b):
    """Bit-faithful f32 matmul (6-pass HIGHEST) on the recombined table."""
    return jnp.dot(a_hi + a_lo, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def pack_scene(scene: Scene):
    """Host-side packing of the Scene pytree into brute-path tables."""
    sph, pla = scene.spheres, scene.planes
    num_s, num_p = scene.num_spheres, scene.num_planes
    n = num_s + num_p
    n_pad = _round_up(max(n, 8), 8)

    a_vec = vec.cross(pla.v, pla.w)
    b_vec = vec.cross(pla.w, pla.u)

    # proj: [S centers; P normals; P A; P B] -> [Npack, 8]
    rows = []
    if num_s:
        rows.append(sph.center)
    if num_p:
        rows.extend([pla.normal, a_vec, b_vec])
    proj3 = jnp.concatenate(rows, axis=0)
    npack = _round_up(proj3.shape[0], 8)
    proj_f = jnp.zeros((npack, 8), jnp.float32).at[: proj3.shape[0], :3].set(proj3)
    # stacked [hi; lo] rows for the 3-pass bf16x3 matmul
    p_hi, p_lo = _split_hi_lo(proj_f)
    proj = jnp.concatenate([p_hi, p_lo], axis=0)  # [2*npack, 8]

    # const table [Npad, CROWS] (rows = prims so (n, 1) column slices are
    # natural sublane loads in-kernel)
    const = jnp.zeros((n_pad, CROWS), jnp.float32)
    const = const.at[:, C_KIND].set(-1.0)
    if num_s:
        const = const.at[:num_s, C_CCRR].set(
            vec.length_squared(sph.center) - sph.radius**2
        )
        const = const.at[:num_s, C_KIND].set(0.0)
    if num_p:
        sl = slice(num_s, n)
        const = const.at[sl, C_CCRR].set(pla.d)
        const = const.at[sl, C_BASEA].set(jnp.sum(pla.base * a_vec, axis=-1))
        const = const.at[sl, C_BASEB].set(jnp.sum(pla.base * b_vec, axis=-1))
        const = const.at[sl, C_PTYPE].set(pla.ptype.astype(jnp.float32))
        const = const.at[sl, C_KIND].set(1.0)

    # join table [JROWS, Npad]
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
    j_hi, j_lo = _split_hi_lo(join)
    join = jnp.concatenate([j_hi, j_lo], axis=0)  # [2*JROWS, Npad]
    return proj, const, join, num_s, num_p, n_pad, npack


# ----------------------------------------------------------------------
# in-kernel RNG (bit-exact tracer.core.rng / random_utils.h:7-23)
# ----------------------------------------------------------------------


def _wang_hash(seed):
    seed = (seed ^ _U(61)) ^ (seed >> _U(16))
    seed = seed * _U(9)
    seed = seed ^ (seed >> _U(4))
    seed = seed * _U(0x27D4EB2D)
    seed = seed ^ (seed >> _U(15))
    return seed


def _u32_to_f32(x):
    # Mosaic has no u32->f32 conversion; go through i32 and wrap the
    # negative half back up. Matches static_cast<float>(uint32)
    # (random_utils.h:18) up to a possible 1-ulp double-rounding.
    f = jax.lax.bitcast_convert_type(x, jnp.int32).astype(jnp.float32)
    return jnp.where(f < 0.0, f + jnp.float32(4294967296.0), f)


def _rand(seed):
    seed = _wang_hash(seed)
    return seed, _u32_to_f32(seed) * jnp.float32(1.0 / 4294967296.0)


def _rand_unit_vector(seed):
    seed, u1 = _rand(seed)
    seed, u2 = _rand(seed)
    z = 2.0 * u1 - 1.0
    phi = (2.0 * jnp.pi) * u2
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    return seed, (r * jnp.cos(phi), r * jnp.sin(phi), z)


# ----------------------------------------------------------------------
# intersection strategies: both return (t_best (1,T), rec (JROWS, T))
# ----------------------------------------------------------------------


def _unified_ts(po, pd, const_block, a, od, oo, k):
    """t per (prim, pixel) for a K-prim block with mixed sphere/plane rows.

    po/pd: (3K, T) projections (K first-vec rows, K A rows, K B rows);
    const_block: (K, CROWS). Sphere math = sphere.h:24-53, plane math =
    plane.h:57-96 in triple-product form.
    """
    fo, ao, bo = po[0:k], po[k : 2 * k], po[2 * k : 3 * k]
    fd, ad, bd = pd[0:k], pd[k : 2 * k], pd[2 * k : 3 * k]
    ccrr_d = const_block[:, C_CCRR : C_CCRR + 1]
    base_a = const_block[:, C_BASEA : C_BASEA + 1]
    base_b = const_block[:, C_BASEB : C_BASEB + 1]
    ptype = const_block[:, C_PTYPE : C_PTYPE + 1]
    kind = const_block[:, C_KIND : C_KIND + 1]

    # sphere branch (first = center)
    half_b = od - fd
    c_term = oo - 2.0 * fo + ccrr_d
    disc = half_b * half_b - a * c_term
    s_hit = disc >= 0.0
    sqrt_d = jnp.sqrt(jnp.where(s_hit, disc, 1.0))
    inv_a = 1.0 / a
    t_near = (-half_b - sqrt_d) * inv_a
    t_far = (-half_b + sqrt_d) * inv_a
    near_ok = s_hit & (t_near >= T_MIN) & (t_near <= T_MAX)
    far_ok = s_hit & (t_far >= T_MIN) & (t_far <= T_MAX)
    t_s = jnp.where(near_ok, t_near, jnp.where(far_ok, t_far, K_INFINITY))

    # plane branch (first = normal)
    denom_ok = jnp.abs(fd) >= DENOM_EPS
    root = (ccrr_d - fo) / jnp.where(denom_ok, fd, 1.0)
    alpha = ao + root * ad - base_a
    beta_uv = bo + root * bd - base_b
    in_quad = (alpha >= 0.0) & (alpha <= 1.0) & (beta_uv >= 0.0) & (beta_uv <= 1.0)
    in_ell = (alpha - 0.5) ** 2 + (beta_uv - 0.5) ** 2 <= 0.25
    in_tri = (alpha >= 0.0) & (beta_uv >= 0.0) & (alpha + beta_uv <= 1.0)
    # bool select_n lowers to an unsupported i8->i1 trunc in Mosaic; use
    # and/or masks instead of jnp.where on booleans
    interior = (
        ((ptype == 0.0) & in_quad)
        | ((ptype == 1.0) & in_ell)
        | ((ptype >= 2.0) & in_tri)
    )
    ok_p = denom_ok & (root >= T_MIN) & (root <= T_MAX) & interior
    t_p = jnp.where(ok_p, root, K_INFINITY)

    t = jnp.where(kind == 0.0, t_s, jnp.where(kind == 1.0, t_p, K_INFINITY))
    return t, alpha, beta_uv


def _winner_join(t_blk, join_blk, iota_k, k, fast_math=False):
    """Block-best t and its joined record. t_blk (K,T), join_blk (JROWS,K)."""
    t_best = jnp.min(t_blk, axis=0, keepdims=True)
    widx = jnp.min(jnp.where(t_blk == t_best, iota_k, k), axis=0, keepdims=True)
    onehot = (iota_k == widx).astype(jnp.float32)
    jr = join_blk.shape[0] // 2
    if fast_math:
        # onehot is exactly bf16-representable -> 2 passes
        rec = _dot1(join_blk[:jr], onehot) + _dot1(join_blk[jr:], onehot)
    else:
        rec = jnp.dot(join_blk[:jr] + join_blk[jr:], onehot,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    return t_best, rec, onehot, widx


def _intersect_brute(proj_ref, const_ref, join_ref, o8, d8, a, od, oo, *,
                     num_s, num_p, n_pad, tile_px, fast_math, no_far=False):
    n = num_s + num_p
    npk = proj_ref.shape[0] // 2
    dot = _dot3 if fast_math else _dot_exact
    po = dot(proj_ref[:npk], proj_ref[npk:], o8)
    pd = dot(proj_ref[:npk], proj_ref[npk:], d8)

    t_parts = []
    if num_s:
        fo, fd = po[:num_s], pd[:num_s]
        ccrr = const_ref[:num_s, C_CCRR : C_CCRR + 1]
        half_b = od - fd
        c_term = oo - 2.0 * fo + ccrr
        disc = half_b * half_b - a * c_term
        s_hit = disc >= 0.0
        sqrt_d = jnp.sqrt(jnp.where(s_hit, disc, 1.0))
        inv_a = 1.0 / a
        t_near = (-half_b - sqrt_d) * inv_a
        t_far = None if (fast_math and no_far) else (-half_b + sqrt_d) * inv_a
        if fast_math and no_far:
            # scene has NO dielectric material (checked host-side): rays
            # never legitimately start inside a sphere, so the far root
            # (sphere.h:41-46, interior exit) is statically dead — skip
            # its compute and selection entirely. Divergence from the
            # plain estimator: a ray origin within T_MIN of a surface no
            # longer self-transmits through the sphere (it misses
            # instead), and a camera placed inside a sphere sees through
            # it — both outside fast_math's parity contract.
            s_ok = s_hit & (t_near >= T_MIN)
            t_parts.append(jnp.where(s_ok, t_near, K_INFINITY))
        elif fast_math:
            # fused near-then-far (sphere.h:38-46) in 5 VPU ops instead
            # of 8: pick far when near < T_MIN, then validate once. Drops
            # the t <= T_MAX guards — finite roots of real geometry never
            # reach 1e30, and fast_math already waives per-sample parity.
            # This is ~10% of the per-prim elementwise work that
            # dominates large scenes (BASELINE 2000-sphere ablation).
            t_nf = jnp.where(t_near >= T_MIN, t_near, t_far)
            s_ok = s_hit & (t_nf >= T_MIN)
            t_parts.append(jnp.where(s_ok, t_nf, K_INFINITY))
        else:
            near_ok = s_hit & (t_near >= T_MIN) & (t_near <= T_MAX)
            far_ok = s_hit & (t_far >= T_MIN) & (t_far <= T_MAX)
            t_parts.append(
                jnp.where(near_ok, t_near, jnp.where(far_ok, t_far, K_INFINITY))
            )
    if num_p:
        no = po[num_s : num_s + num_p]
        ao = po[num_s + num_p : num_s + 2 * num_p]
        bo = po[num_s + 2 * num_p : num_s + 3 * num_p]
        nd = pd[num_s : num_s + num_p]
        ad = pd[num_s + num_p : num_s + 2 * num_p]
        bd = pd[num_s + 2 * num_p : num_s + 3 * num_p]
        d_pl = const_ref[num_s:n, C_CCRR : C_CCRR + 1]
        base_a = const_ref[num_s:n, C_BASEA : C_BASEA + 1]
        base_b = const_ref[num_s:n, C_BASEB : C_BASEB + 1]
        ptype = const_ref[num_s:n, C_PTYPE : C_PTYPE + 1]
        denom_ok = jnp.abs(nd) >= DENOM_EPS
        root = (d_pl - no) / jnp.where(denom_ok, nd, 1.0)
        alpha = ao + root * ad - base_a
        beta_uv = bo + root * bd - base_b
        in_quad = (alpha >= 0.0) & (alpha <= 1.0) & (beta_uv >= 0.0) & (beta_uv <= 1.0)
        in_ell = (alpha - 0.5) ** 2 + (beta_uv - 0.5) ** 2 <= 0.25
        in_tri = (alpha >= 0.0) & (beta_uv >= 0.0) & (alpha + beta_uv <= 1.0)
        interior = (
            ((ptype == 0.0) & in_quad)
            | ((ptype == 1.0) & in_ell)
            | ((ptype >= 2.0) & in_tri)
        )
        ok = denom_ok & (root >= T_MIN) & (root <= T_MAX) & interior
        t_parts.append(jnp.where(ok, root, K_INFINITY))
    if n_pad > n:
        t_parts.append(jnp.full((n_pad - n, tile_px), K_INFINITY, jnp.float32))
    t_all = jnp.concatenate(t_parts, axis=0) if len(t_parts) > 1 else t_parts[0]

    iota_n = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0)
    t_best, rec, onehot, widx = _winner_join(t_all, join_ref[:], iota_n, n_pad, fast_math)
    if num_p:
        oh_p = onehot[num_s:n]
        pu = jnp.sum(oh_p * alpha, axis=0, keepdims=True)
        pv = jnp.sum(oh_p * beta_uv, axis=0, keepdims=True)
    else:
        pu = jnp.zeros_like(t_best)
        pv = jnp.zeros_like(t_best)
    return t_best, rec, pu, pv, widx


def _intersect_brute_rows(proj_ref, const_ref, join_ref, o3, d3, a, od, oo, *,
                          num_s, num_p, n_pad, fast_math, ps0, no_far=False):
    """Sample-major brute intersection: ps0 sublane rows of 128 rays each,
    intersected one row at a time so ray state NEVER leaves its native
    (ps0, 128) layout — the (8,128)<->(1,1024) relayouts that made
    1024-px tiles lose (ROADMAP round-2 measurements) simply don't occur.
    Returns t_best/pu/pv shaped (ps0, 128) and rec stacked FIELD-MAJOR
    (JROWS*ps0, 128): field f of all rows at rec[f*ps0:(f+1)*ps0], which
    is exactly the (ps0, 128) slice _shade wants per field."""
    (ox, oy, oz), (dx, dy, dz) = o3, d3
    zeros5 = jnp.zeros((5, 128), jnp.float32)
    t_rows, rec_rows, pu_rows, pv_rows = [], [], [], []
    for r in range(ps0):
        o8 = jnp.concatenate(
            [ox[r:r + 1], oy[r:r + 1], oz[r:r + 1], zeros5], axis=0)
        d8 = jnp.concatenate(
            [dx[r:r + 1], dy[r:r + 1], dz[r:r + 1], zeros5], axis=0)
        t_b, rec, pu, pv, _ = _intersect_brute(
            proj_ref, const_ref, join_ref, o8, d8,
            a[r:r + 1], od[r:r + 1], oo[r:r + 1],
            num_s=num_s, num_p=num_p, n_pad=n_pad, tile_px=128,
            fast_math=fast_math, no_far=no_far,
        )
        t_rows.append(t_b)
        rec_rows.append(rec)
        pu_rows.append(pu)
        pv_rows.append(pv)
    t_best = jnp.concatenate(t_rows, axis=0)
    jr = rec_rows[0].shape[0]
    rec_stack = jnp.concatenate(
        [rec_rows[r][f:f + 1] for f in range(jr) for r in range(ps0)], axis=0)
    pu = jnp.concatenate(pu_rows, axis=0)
    pv = jnp.concatenate(pv_rows, axis=0)
    return t_best, rec_stack, pu, pv


def _fl(x, n):
    """Flatten a ps-shaped per-lane row to (1, n)."""
    return x.reshape(1, n)


def _atan_cephes(x):
    """Cephes-style atanf (Mosaic has no inverse-trig primitives).

    Range-reduced 4-term polynomial, |err| ~ 1e-7 over the reals."""
    sign = jnp.where(x < 0.0, -1.0, 1.0)
    ax = jnp.abs(x)
    big = ax > 2.414213562373095  # tan(3pi/8)
    mid = (ax > 0.4142135623730950) & ~big  # tan(pi/8)
    safe_ax = jnp.maximum(ax, 1e-30)
    xr = jnp.where(big, -1.0 / safe_ax, jnp.where(mid, (ax - 1.0) / (ax + 1.0), ax))
    z = xr * xr
    p = (
        (((8.05374449538e-2 * z - 1.38776856032e-1) * z + 1.99777106478e-1) * z
         - 3.33329491539e-1) * z * xr + xr
    )
    y = jnp.where(big, jnp.float32(jnp.pi / 2) + p,
                  jnp.where(mid, jnp.float32(jnp.pi / 4) + p, p))
    return sign * y


def _atan2_cephes(y, x):
    """atan2 from _atan_cephes with standard quadrant fixup."""
    safe_x = jnp.where(jnp.abs(x) < 1e-30, 1e-30, x)
    base = _atan_cephes(y / safe_x)
    return jnp.where(
        x >= 0.0, base,
        jnp.where(y >= 0.0, base + jnp.float32(jnp.pi), base - jnp.float32(jnp.pi)),
    )


def _acos_cephes(y):
    """acos(y) = pi/2 - atan(y / sqrt(1 - y^2)) for y in [-1, 1]."""
    y = jnp.clip(y, -1.0, 1.0)
    denom = jnp.sqrt(jnp.maximum(1.0 - y * y, 1e-30))
    return jnp.float32(jnp.pi / 2) - _atan_cephes(y / denom)


def _tex_addressing(u, v, th, tw):
    """tex2D_cpu address math (materials.h:20-51): wrap, v flip, trunc,
    neighbor wrap. Returns int corner coords and bilinear weights."""
    u = u - jnp.floor(u)
    v = v - jnp.floor(v)
    px = u * tw
    py = (1.0 - v) * th
    x0 = jnp.minimum(px.astype(jnp.int32), tw - 1)
    y0 = jnp.minimum(py.astype(jnp.int32), th - 1)
    x1 = jnp.mod(x0 + 1, tw)
    y1 = jnp.mod(y0 + 1, th)
    dx = px - x0.astype(jnp.float32)
    dy = py - y0.astype(jnp.float32)
    return x0, y0, x1, y1, dx, dy


def _tex_demand_fetch(big_tex, u_all, v_all, textured, flat, to_px, ps,
                      want_grad=False):
    """Bilinear fetch from an HBM-resident texture of ANY size.

    TPU-native replacement for CUDA's hardware tex2D + texture cache
    (materials.h:20-51): the texture lives in HBM; (TEX_BH x 128)
    blocks are DMA'd on demand into a TEX_SLOTS-slot direct-mapped VMEM
    cache (the cache survives across bounces/samples of the tile —
    coherent tiles mostly hit). A tile's floor footprint is wide in u
    but shallow in v, so short blocks cut DMA bytes without adding loop
    iterations: 32-row blocks measured 19.2 vs 17.7 Mrays/s for the
    original 2 x (128x128) on the canonical textured scene. A demand
    while-loop serves every unserved bilinear corner of every textured
    lane, one block per iteration, so ANY access pattern terminates with
    exact tex2D_cpu results: in-block routing is a 0/1 one-hot MXU
    contraction against a bf16 hi/lo split of the block, which
    reconstructs the f32 texels exactly.
    """
    (tex_hbm, blk_ref, aux_ref, cached_ref, sem,
     th, tw, nbx, debug_stats) = big_tex
    ps0, flat_n = ps[0], ps[0] * ps[1]
    bh3 = 3 * TEX_BH

    x0, y0, x1, y1, dxw, dyw = _tex_addressing(u_all, v_all, th, tw)
    # per-corner bilinear weight and its px/py derivatives (bilinear is
    # separately linear in px and py; want_grad accumulates Sum dw/dpx*V
    # and Sum dw/dpy*V alongside Sum w*V — the recording tape's exact
    # d(texel)/d(uv) source, no extra DMA or matmul)
    corners = (
        (y0, x0, (1.0 - dxw) * (1.0 - dyw), -(1.0 - dyw), -(1.0 - dxw)),
        (y0, x1, dxw * (1.0 - dyw), (1.0 - dyw), -dxw),
        (y1, x0, (1.0 - dxw) * dyw, -dyw, (1.0 - dxw)),
        (y1, x1, dxw * dyw, dyw, dxw),
    )
    bids = [(yc // TEX_BH) * nbx + (xc // 128) for yc, xc, *_ in corners]

    arow = lambda i: aux_ref[i * ps0:(i + 1) * ps0, :]

    def aput(i, v):
        aux_ref[i * ps0:(i + 1) * ps0, :] = v

    # aux rows: 0..2 = accumulated rgb, 3..6 = corner-served flags,
    # (want_grad) 7..9 = rgb dT/dpx, 10..12 = rgb dT/dpy
    for c in range(3):
        aput(c, jnp.zeros(ps, jnp.float32))
    for c in range(4):
        aput(3 + c, jnp.where(textured, 0.0, 1.0))
    if want_grad:
        for c in range(7, 13):
            aput(c, jnp.zeros(ps, jnp.float32))

    iota128 = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
    iota_bh = jax.lax.broadcasted_iota(jnp.int32, (TEX_BH, 1), 0)

    def unserved_count():
        n = jnp.int32(0)
        for c in range(4):
            n = n + jnp.sum((arow(3 + c) < 0.5).astype(jnp.int32))
        return n

    def serve(b, base):
        """Serve every unserved corner living in block `b` (scalar id)
        from the cache lines at blk_ref[base:base+3*TEX_BH].

        The serve iteration is the ENTIRE texture tax (measured round 4:
        demand iterations x ~620 ns explain the 19.7-vs-37.5 Mrays/s gap;
        DMA misses are secondary — doubling the cache slots moved
        nothing). Two width cuts keep it lean: corner pairs (0,2)/(1,3)
        share their x column, so ONE matmul pair against a (128, 2T)
        one-hot serves all 4 corners (was 4T); and the bilinear weights
        fold into the row selectors, so each channel accumulates with a
        single fused reduce instead of per-corner VMEM round-trips. The
        hi/lo split keeps the 0/1 column selection EXACT in f32.

        Returns the number of corners served (the demand loop carries
        the remaining count down instead of recounting the flags).
        """
        by = b // nbx
        bx = b - by * nbx
        bfull = blk_ref[pl.ds(base, bh3), :]  # (3*BH, 128): r, g, b blocks
        bhi = bfull.astype(jnp.bfloat16).astype(jnp.float32)
        blo = bfull - bhi

        hits = [(arow(3 + c) < 0.5) & (bids[c] == b) for c in range(4)]
        # columns: corners (0,2) share x0, (1,3) share x1 (same x-block,
        # so one in-range lx serves both); out-of-block lx one-hots are
        # all-zero and the hit-masked weights keep them inert
        ohx = jnp.concatenate([
            (iota128 == flat(x0 - bx * 128)).astype(jnp.float32),
            (iota128 == flat(x1 - bx * 128)).astype(jnp.float32)], axis=1)
        col = _dot1(bhi, ohx) + _dot1(blo, ohx)  # (3*BH, 2T)
        ohy0 = (iota_bh == flat(y0 - by * TEX_BH)).astype(jnp.float32)
        ohy1 = (iota_bh == flat(y1 - by * TEX_BH)).astype(jnp.float32)

        def fused(widx):
            """Weight-folded row selectors: (col-x0, col-x1) pair whose
            single reduce per channel yields Sum_corner w*texel."""
            w = [flat(jnp.where(hits[c], corners[c][widx], 0.0))
                 for c in range(4)]
            return ohy0 * w[0] + ohy1 * w[2], ohy0 * w[1] + ohy1 * w[3]

        tn = flat_n
        sels = [(0, fused(2))]
        if want_grad:
            sels += [(7, fused(3)), (10, fused(4))]
        for ci in range(3):
            c0 = col[ci * TEX_BH:(ci + 1) * TEX_BH, 0:tn]
            c1 = col[ci * TEX_BH:(ci + 1) * TEX_BH, tn:2 * tn]
            for off, (wa, wb) in sels:
                add = jnp.sum(wa * c0 + wb * c1, axis=0, keepdims=True)
                aput(off + ci, arow(off + ci) + to_px(add))

        served = jnp.int32(0)
        for c in range(4):
            aput(3 + c, jnp.where(hits[c], 1.0, arow(3 + c)))
            served = served + jnp.sum(hits[c].astype(jnp.int32))
        return served

    def cond(rem):
        return rem > 0

    def body(rem):
        # most-demanded selection is unnecessary: ANY unserved block id
        # works; max is cheap and deterministic
        want = jnp.full(ps, -1, jnp.int32)
        for c in range(4):
            m = arow(3 + c) < 0.5
            want = jnp.maximum(want, jnp.where(m, bids[c], -1))
        b = jnp.max(want)  # scalar block id
        by = b // nbx
        bx = b - by * nbx
        # direct-mapped slots; x-neighbors (+1) and y-neighbors (+3) of a
        # block map to DIFFERENT slots, so bilinear straddle pairs never
        # evict each other
        slot = (bx + 3 * by) % TEX_SLOTS
        base = slot * bh3

        if debug_stats:
            cached_ref[0, TEX_SLOTS] = cached_ref[0, TEX_SLOTS] + 1

        @pl.when(b != cached_ref[0, slot])
        def _fetch():
            if debug_stats:
                cached_ref[0, TEX_SLOTS + 1] = cached_ref[0, TEX_SLOTS + 1] + 1
            # the texture is pre-blocked in HBM (block b = rows
            # [b*3*BH, (b+1)*3*BH)), so a miss is ONE contiguous DMA
            # instead of 3 strided row-pitch copies
            cp = pltpu.make_async_copy(
                tex_hbm.at[pl.ds(b * bh3, bh3), :],
                blk_ref.at[pl.ds(base, bh3), :],
                sem,
            )
            cp.start()
            cp.wait()
            cached_ref[0, slot] = b

        return rem - serve(b, base)

    # (A straight-line "warm pass" serving both cached slots before the
    # loop was measured SLOWER on hardware — 16.0 vs 17.7 Mrays/s: the
    # unconditional matmul pairs + one-hot builds cost more than the
    # demand iterations they replace. The loop stays the only server.)
    jax.lax.while_loop(cond, body, unserved_count())
    if want_grad:
        return (tuple(arow(c) for c in range(3)),
                tuple(arow(7 + c) for c in range(3)),
                tuple(arow(10 + c) for c in range(3)))
    return arow(0), arow(1), arow(2)


def _sample_texture(texr_ref, texg_ref, texb_ref, u, v, th, tw,
                    want_grad=False):
    """Bilinear texture fetch with tex2D_cpu semantics (materials.h:20-51)
    as two one-hot MXU contractions per channel: wrap addressing, v flip,
    truncation, neighbor wrap. u/v are flat (1, T); returns 3 x (1, T).

    want_grad=True also returns the texel's PIXEL-space derivatives
    (dT/dpx, dT/dpy) per channel — bilinear is separately linear in px
    and py, so these come from the same column contraction with the
    weight selectors replaced by their derivative (-1 at the near corner,
    +1 at the far one). One extra matmul per channel (the dpx pass; dpy
    reuses `col`). The recording kernel puts tw*dT/dpx and -th*dT/dpy on
    tape so the replay gets EXACT d(texel)/d(uv) without any gathers."""
    hp = jax.lax.Precision.HIGHEST
    u = u - jnp.floor(u)
    v = v - jnp.floor(v)
    px = u * tw
    py = (1.0 - v) * th
    x0 = jnp.minimum(px.astype(jnp.int32), tw - 1)
    y0 = jnp.minimum(py.astype(jnp.int32), th - 1)
    x1 = jnp.mod(x0 + 1, tw)
    y1 = jnp.mod(y0 + 1, th)
    dx = px - x0.astype(jnp.float32)
    dy = py - y0.astype(jnp.float32)

    iota_w = jax.lax.broadcasted_iota(jnp.int32, (texr_ref.shape[1], 1), 0)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (texr_ref.shape[0], 1), 0)
    rx = jnp.where(iota_w == x0, 1.0 - dx, 0.0) + jnp.where(iota_w == x1, dx, 0.0)
    ry = jnp.where(iota_h == y0, 1.0 - dy, 0.0) + jnp.where(iota_h == y1, dy, 0.0)
    if want_grad:
        gx = jnp.where(iota_w == x0, -1.0, 0.0) + jnp.where(iota_w == x1, 1.0, 0.0)
        gy = jnp.where(iota_h == y0, -1.0, 0.0) + jnp.where(iota_h == y1, 1.0, 0.0)

    out, dpx, dpy = [], [], []
    for ref in (texr_ref, texg_ref, texb_ref):
        col = jnp.dot(ref[:], rx, preferred_element_type=jnp.float32, precision=hp)
        out.append(jnp.sum(ry * col, axis=0, keepdims=True))
        if want_grad:
            colg = jnp.dot(ref[:], gx, preferred_element_type=jnp.float32,
                           precision=hp)
            dpx.append(jnp.sum(ry * colg, axis=0, keepdims=True))
            dpy.append(jnp.sum(gy * col, axis=0, keepdims=True))
    if want_grad:
        return out, dpx, dpy
    return out


# ----------------------------------------------------------------------
# shared shading / scatter (materials.h:70-140 with the fixed 8-draw
# budget of tracer.materials.scatter)
# ----------------------------------------------------------------------


def _shade_draws(seed):
    """The fixed-budget scatter draws of one bounce (materials.h:70-140
    analog; RAW — the hemisphere sign flip happens in _shade where the
    surface normal is known). Depends ONLY on the carried RNG seed, so
    the persistent kernel evaluates it before the intersection.
    Measured NEUTRAL on v5e (38.1/36.6/29.7/48.4 vs 38.2/36.7/29.8/48.7
    Mrays/s across poses): Mosaic already schedules the hash chain by
    dataflow, so the textual position never extended the critical path
    — kept because it makes the draw-stream contract explicit and
    the independence machine-checked. Returns (new_seed, draws) in the
    exact stream order of the in-place block it replaced — values and
    streams are bit-identical either way."""
    seed, u_choice = _rand(seed)
    seed, h3 = _rand_unit_vector(seed)
    seed, (ballx, bally, ballz) = _rand_unit_vector(seed)
    seed, u_ball = _rand(seed)
    # Mosaic has no cbrt; exp(log(u)/3) matches jnp.cbrt to ~1 ulp on
    # (0, 1) and maps u = 0 to ~0 via the clamp.
    br = jnp.exp(jnp.log(jnp.maximum(u_ball, 1e-38)) * jnp.float32(1.0 / 3.0))
    ball3 = (ballx * br, bally * br, ballz * br)
    seed, u_refl = _rand(seed)
    seed, u_rr = _rand(seed)
    return seed, (u_choice, h3, ball3, u_refl, u_rr)


def _shade(rec, t_best, ox, oy, oz, dx, dy, dz, a, beta, final, seed, alive, bg, to_px,
           pu=None, pv=None, tex_refs=None, flat=None, big_tex=None, ps=None,
           rr_start=None, depth=None, rec_rows=1, tape_fields=0,
           sqrt_fn=jnp.sqrt, draws=None):
    # tape_fields: texture-tape rows to return for the recording kernel —
    # 0 = none, 3 = the texel multipliers (round 2), 9 = + d(texel)/du
    # and d(texel)/dv per channel (round 3: the replay linearizes the
    # frozen texel around the recorded hit, making geometry gradients on
    # textured surfaces exact — bilinear is linear in u and v separately
    # so the first-order term IS the exact derivative at the hit),
    # 13 = + (x0, y0, fu, fv) addressing rows for texture-IMAGE gradient
    # scatter epilogues (dL/d corner = bilinear weight x dL/d texel).
    # sqrt_fn: the backward kernel passes vec._sqrt_grad_safe so reverse
    # mode through the masked dielectric branch can't emit 0*inf NaNs at
    # sqrt(0) (grazing rays with ir=1 — the round-2 NaN class); the live
    # forward keeps the plain primitive.
    # `to_px` reshapes a flat (1, T) intersection row into the kernel's
    # pixel-tile shape (identity for 128-px tiles, (1,1024)->(8,128) for
    # big tiles so shading runs at full sublane utilization).
    # `rec_rows` > 1 = sample-major mode: rec is stacked field-major with
    # rec_rows sublane rows per field (see _intersect_brute_rows), so a
    # field slice is already the (rec_rows, 128) tile shape.
    bgr, bgg, bgb = bg
    row = lambda r0: to_px(rec[r0 * rec_rows : (r0 + 1) * rec_rows])
    t_best = to_px(t_best)
    hit = t_best < K_INFINITY
    cx, cy, cz, rad = row(J_CX), row(J_CY), row(J_CZ), row(J_RAD)
    pnx, pny, pnz = row(J_NX), row(J_NY), row(J_NZ)
    is_sph = row(J_ISSPH) > 0.5
    mtype = row(J_MTYPE)
    fuzz = row(J_FUZZ)
    ir = row(J_IR)
    ab0, ab1, ab2 = row(J_ABS0), row(J_ABS1), row(J_ABS2)
    al0, al1, al2 = row(J_ALB0), row(J_ALB1), row(J_ALB2)
    em0, em1, em2 = row(J_EMI0), row(J_EMI1), row(J_EMI2)

    t_calc = jnp.where(hit, t_best, 1.0)
    px = ox + t_calc * dx
    py = oy + t_calc * dy
    pz = oz + t_calc * dz
    inv_rad = 1.0 / rad
    onx = jnp.where(is_sph, (px - cx) * inv_rad, pnx)
    ony = jnp.where(is_sph, (py - cy) * inv_rad, pny)
    onz = jnp.where(is_sph, (pz - cz) * inv_rad, pnz)
    dn = dx * onx + dy * ony + dz * onz
    front = dn < 0.0
    sgn = jnp.where(front, 1.0, -1.0)
    nx, ny, nz = onx * sgn, ony * sgn, onz * sgn

    # texture-modulated albedo (camera.cu:233-236; tex2D_cpu parity),
    # skipped with a scalar branch when no lane in the tile is textured
    if tex_refs is not None or big_tex is not None:
        texid = row(J_TEXID)
        textured = (texid > -0.5) & hit
        # sphere uv from the OUTWARD normal (sphere.h:16-22); inverse trig
        # via Cephes polynomials (no Mosaic primitives for atan2/acos)
        u_s = (_atan2_cephes(-onz, onx) + jnp.float32(jnp.pi)) / (2.0 * jnp.pi)
        v_s = _acos_cephes(ony) / jnp.pi
        u_all = jnp.where(is_sph, u_s, to_px(pu))
        v_all = jnp.where(is_sph, v_s, to_px(pv))

        want_grad = tape_fields >= 9
        tex_du = tex_dv = None
        if big_tex is not None:
            # HBM demand-paged path: the while-loop runs zero iterations
            # when no lane is textured, so no scalar gate is needed.
            # tuple layout (kernels.py): (tex_hbm, blk, aux, cached, sem,
            # th, tw, nbx, debug_stats)
            th_g, tw_g = big_tex[5], big_tex[6]
            fetched = _tex_demand_fetch(
                big_tex, u_all, v_all, textured, flat, to_px, ps,
                want_grad=want_grad,
            )
            if want_grad:
                (tr, tg, tb), dpx3, dpy3 = fetched
            else:
                tr, tg, tb = fetched
            tm0 = jnp.where(textured, tr, 1.0)
            tm1 = jnp.where(textured, tg, 1.0)
            tm2 = jnp.where(textured, tb, 1.0)
            if want_grad:
                twf, thf = jnp.float32(tw_g), jnp.float32(th_g)
                tex_du = tuple(jnp.where(textured, d * twf, 0.0) for d in dpx3)
                tex_dv = tuple(jnp.where(textured, -d * thf, 0.0) for d in dpy3)
        else:
            th, tw = tex_refs[0].shape
            th_g, tw_g = th, tw

            def apply_tex():
                fetched = _sample_texture(
                    tex_refs[0], tex_refs[1], tex_refs[2], flat(u_all),
                    flat(v_all), th, tw, want_grad=want_grad,
                )
                if want_grad:
                    (tr, tg, tb), dpx3, dpy3 = fetched
                else:
                    tr, tg, tb = fetched
                    dpx3 = dpy3 = (tr, tg, tb)  # unused
                m0 = jnp.where(textured, to_px(tr), 1.0)
                m1 = jnp.where(textured, to_px(tg), 1.0)
                m2 = jnp.where(textured, to_px(tb), 1.0)
                if not want_grad:
                    return m0, m1, m2
                twf, thf = jnp.float32(tw), jnp.float32(th)
                return (m0, m1, m2) + tuple(
                    jnp.where(textured, to_px(d) * twf, 0.0) for d in dpx3
                ) + tuple(
                    jnp.where(textured, to_px(d) * -thf, 0.0) for d in dpy3
                )

            ones = jnp.ones_like(al0)
            zeros = jnp.zeros_like(al0)
            neutral = ((ones,) * 3 + (zeros,) * 6) if want_grad else (ones,) * 3
            tex_out = jax.lax.cond(jnp.any(textured), apply_tex,
                                   lambda: neutral)
            tm0, tm1, tm2 = tex_out[:3]
            if want_grad:
                tex_du, tex_dv = tex_out[3:6], tex_out[6:9]
        al0, al1, al2 = al0 * tm0, al1 * tm1, al2 * tm2
    else:
        tm0 = tm1 = tm2 = None
        tex_du = tex_dv = None

    # miss -> background (camera.cu:226-229)
    miss = alive & ~hit
    f0, f1, f2 = final
    b0, b1, b2 = beta
    f0 = f0 + jnp.where(miss, b0 * bgr, 0.0)
    f1 = f1 + jnp.where(miss, b1 * bgg, 0.0)
    f2 = f2 + jnp.where(miss, b2 * bgb, 0.0)
    active = alive & hit

    # emission (camera.cu:237-238)
    f0 = f0 + jnp.where(active, b0 * em0, 0.0)
    f1 = f1 + jnp.where(active, b1 * em1, 0.0)
    f2 = f2 + jnp.where(active, b2 * em2, 0.0)

    # fixed 8-draw scatter (hoistable: see _shade_draws)
    if draws is None:
        draws = _shade_draws(seed)
    seed, (u_choice, (hx, hy, hz), (ballx, bally, ballz),
           u_refl, u_rr) = draws
    hdotn = hx * nx + hy * ny + hz * nz
    hsgn = jnp.where(hdotn > 0.0, 1.0, -1.0)
    hx, hy, hz = hx * hsgn, hy * hsgn, hz * hsgn  # hemisphere

    inv_dlen = jax.lax.rsqrt(jnp.maximum(a, 1e-30))
    udx, udy, udz = dx * inv_dlen, dy * inv_dlen, dz * inv_dlen

    hemi_nz = (jnp.abs(hx) >= 1e-8) | (jnp.abs(hy) >= 1e-8) | (jnp.abs(hz) >= 1e-8)
    lamx = jnp.where(hemi_nz, hx, nx)
    lamy = jnp.where(hemi_nz, hy, ny)
    lamz = jnp.where(hemi_nz, hz, nz)

    uddn = udx * nx + udy * ny + udz * nz
    rx = udx - 2.0 * uddn * nx + fuzz * ballx
    ry = udy - 2.0 * uddn * ny + fuzz * bally
    rz = udz - 2.0 * uddn * nz + fuzz * ballz
    spec = u_choice < 0.8
    metx = jnp.where(spec, rx, lamx)
    mety = jnp.where(spec, ry, lamy)
    metz = jnp.where(spec, rz, lamz)
    met_ok = ~spec | (rx * nx + ry * ny + rz * nz > 0.0)  # no bool select_n

    ratio = jnp.where(front, 1.0 / ir, ir)
    cos_t = jnp.minimum(-uddn, 1.0)
    sin_t = sqrt_fn(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    cannot = ratio * sin_t > 1.0
    r0 = ((1.0 - ratio) / (1.0 + ratio)) ** 2
    refl_p = r0 + (1.0 - r0) * (1.0 - cos_t) ** 5
    choose_refl = cannot | (refl_p > u_refl)
    perp_x = ratio * (udx + cos_t * nx)
    perp_y = ratio * (udy + cos_t * ny)
    perp_z = ratio * (udz + cos_t * nz)
    perp2 = perp_x * perp_x + perp_y * perp_y + perp_z * perp_z
    par = -sqrt_fn(jnp.abs(1.0 - perp2))
    reflx = udx - 2.0 * uddn * nx
    refly = udy - 2.0 * uddn * ny
    reflz = udz - 2.0 * uddn * nz
    diex = jnp.where(choose_refl, reflx, perp_x + par * nx)
    diey = jnp.where(choose_refl, refly, perp_y + par * ny)
    diez = jnp.where(choose_refl, reflz, perp_z + par * nz)
    dist = sqrt_fn((px - ox) ** 2 + (py - oy) ** 2 + (pz - oz) ** 2)
    tr0 = jnp.where(front, 1.0, jnp.exp(-ab0 * dist))
    tr1 = jnp.where(front, 1.0, jnp.exp(-ab1 * dist))
    tr2 = jnp.where(front, 1.0, jnp.exp(-ab2 * dist))
    p_rr = jnp.maximum(tr0, jnp.maximum(tr1, tr2))
    die_ok = u_rr <= p_rr
    inv_p = 1.0 / jnp.maximum(p_rr, 1e-30)
    da0, da1, da2 = tr0 * inv_p, tr1 * inv_p, tr2 * inv_p
    die_sgn = jnp.where(diex * nx + diey * ny + diez * nz > 0.0, 1e-4, -1e-4)
    die_ox = px + nx * die_sgn
    die_oy = py + ny * die_sgn
    die_oz = pz + nz * die_sgn

    is_lam = mtype == 0.0
    is_met = mtype == 1.0
    is_die = mtype == 2.0
    ndx = jnp.where(is_lam, lamx, jnp.where(is_met, metx, diex))
    ndy = jnp.where(is_lam, lamy, jnp.where(is_met, mety, diey))
    ndz = jnp.where(is_lam, lamz, jnp.where(is_met, metz, diez))
    nox = jnp.where(is_die, die_ox, px)
    noy = jnp.where(is_die, die_oy, py)
    noz = jnp.where(is_die, die_oz, pz)
    at0 = jnp.where(is_die, da0, al0)
    at1 = jnp.where(is_die, da1, al1)
    at2 = jnp.where(is_die, da2, al2)
    ok = is_lam | (is_met & met_ok) | (is_die & die_ok)  # no bool select_n

    live = active & ok
    b0 = jnp.where(live, b0 * at0, b0)
    b1 = jnp.where(live, b1 * at1, b1)
    b2 = jnp.where(live, b2 * at2, b2)
    ox = jnp.where(live, nox, ox)
    oy = jnp.where(live, noy, oy)
    oz = jnp.where(live, noz, oz)
    dx = jnp.where(live, ndx, dx)
    dy = jnp.where(live, ndy, dy)
    dz = jnp.where(live, ndz, dz)

    if rr_start is not None:
        # Opt-in throughput Russian roulette from bounce index `rr_start`
        # on: an unbiased path terminator the reference applies only to
        # dielectric absorption (materials.h:123-125), generalized to all
        # materials. Deep scenes spend most bounces on near-zero-beta
        # paths; killing them with probability 1 - max(beta) (survivors
        # rescaled by 1/p) keeps the estimator unbiased while cutting the
        # effective live-bounce count ~2x at depth >= 20. The extra draw
        # advances every lane's stream uniformly (fixed-budget style) and
        # matches the XLA integrator's rr_start stream exactly.
        seed, u_t = _rand(seed)
        p = jnp.clip(jnp.maximum(b0, jnp.maximum(b1, b2)),
                     jnp.float32(RR_MIN_P), 1.0)
        do = live & (jnp.asarray(depth, jnp.float32) >= jnp.float32(rr_start))
        kill = do & (u_t >= p)
        scale = jnp.where(do & ~kill, 1.0 / p, 1.0)
        b0, b1, b2 = b0 * scale, b1 * scale, b2 * scale
        live = live & ~kill

    out = (ox, oy, oz), (dx, dy, dz), (b0, b1, b2), (f0, f1, f2), seed, live
    if tape_fields:
        # per-bounce texture tape rows for the recording kernel (the
        # replay consumes them instead of re-gathering texels — XLA
        # per-ray texture gathers measured ~10x the whole grad step):
        # fields 0-2 texel multipliers, 3-8 d(texel)/d(u,v) per channel,
        # 9-12 addressing (x0, y0, fu, fv) for image-gradient scatters.
        ones = jnp.ones_like(t_best)
        zeros = jnp.zeros_like(t_best)
        tape = list((tm0, tm1, tm2) if tm0 is not None
                    else (ones, ones, ones))
        if tape_fields >= 9:
            tape += list(tex_du if tex_du is not None else (zeros,) * 3)
            tape += list(tex_dv if tex_dv is not None else (zeros,) * 3)
        if tape_fields >= 13:
            if tm0 is not None:
                x0a, y0a, _, _, fua, fva = _tex_addressing(
                    u_all, v_all, th_g, tw_g)
                tmask = textured
                tape += [jnp.where(tmask, x0a.astype(jnp.float32), 0.0),
                         jnp.where(tmask, y0a.astype(jnp.float32), 0.0),
                         jnp.where(tmask, fua, 0.0),
                         jnp.where(tmask, fva, 0.0)]
            else:
                tape += [zeros] * 4
        return out + (tuple(tape),)
    return out
