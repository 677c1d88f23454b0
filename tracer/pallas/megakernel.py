"""Pallas TPU megakernel: fused generate -> intersect -> shade wavefront.

The TPU re-design of the reference CUDA megakernel `render_kernel`
(src/camera.cu:17-34): one grid step shades a 128-pixel tile end to end
— spp loop, bounce loop, intersection and material scatter all fused in
VMEM with zero HBM round-trips between bounces (SURVEY.md §7 stage 5).

Two intersection strategies share the bounce/shading code:

  brute     — the whole primitive table every bounce: ray projections as
              one MXU matmul, ~15 elementwise ops per (prim x pixel),
              winner record joined with a one-hot matmul (the in-kernel
              twin of tracer.render.hit_fast).
  clustered — packet culling (tracer.pallas.cluster): per tile, each
              cluster AABB is slab-tested against the 128-ray bundle and
              the whole cluster is skipped with a SCALAR branch when no
              ray can hit — the TPU-coherent replacement for per-ray BVH
              stacks (bvh.h:19-65).

Layout (all 2D, VPU-native): per-pixel quantities are (1, 128) rows;
per-(prim x pixel) work is (K|Npad, 128); the winner record is one
(JROWS, 128) array so cluster-vs-cluster selection is 3 vreg selects.

The RNG is the same counter-based wang_hash stream as tracer.core.rng —
bit-identical draws, so kernel output matches the XLA renderer exactly
(modulo f32 reassociation).

Single-layer textures of any size are sampled in-kernel with exact
tex2D_cpu semantics (Cephes inverse trig for sphere UVs): up to
MAX_TEX_DIM a side the texture is VMEM-resident and fetched with
bilinear one-hot MXU contractions; larger textures stay in HBM and are
demand-paged in (TEX_BH x 128) blocks through a TEX_SLOTS-slot VMEM
cache driven by an in-kernel demand loop (the TPU analog of the CUDA
texture cache); geometry swept on hardware — see TEX_BH/TEX_SLOTS.
"""

from __future__ import annotations

import collections
import functools

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
TEX_BH = 32
TEX_SLOTS = 16
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


def _tex_demand_fetch(big_tex, u_all, v_all, textured, flat, to_px, ps):
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
    (tr_hbm, tg_hbm, tb_hbm, blk_ref, aux_ref, cached_ref, sem,
     th, tw, nbx) = big_tex
    ps0, flat_n = ps[0], ps[0] * 128
    bh3 = 3 * TEX_BH

    x0, y0, x1, y1, dxw, dyw = _tex_addressing(u_all, v_all, th, tw)
    corners = (
        (y0, x0, (1.0 - dxw) * (1.0 - dyw)),
        (y0, x1, dxw * (1.0 - dyw)),
        (y1, x0, (1.0 - dxw) * dyw),
        (y1, x1, dxw * dyw),
    )
    bids = [(yc // TEX_BH) * nbx + (xc // 128) for yc, xc, _ in corners]

    arow = lambda i: aux_ref[i * ps0:(i + 1) * ps0, :]

    def aput(i, v):
        aux_ref[i * ps0:(i + 1) * ps0, :] = v

    # aux rows: 0..2 = accumulated rgb, 3..6 = corner-served flags
    for c in range(3):
        aput(c, jnp.zeros(ps, jnp.float32))
    for c in range(4):
        aput(3 + c, jnp.where(textured, 0.0, 1.0))

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

        One matmul pair serves ALL 4 corners x 3 channels: channels are
        stacked on the block's sublanes (384 rows) and the 4 corner
        one-hots concatenate on the lane dim (128, 4T) — 2 bf16 passes
        per visit instead of 24 tiny ones. The hi/lo split keeps the
        0/1 selection EXACT in f32.
        """
        by = b // nbx
        bx = b - by * nbx
        bfull = blk_ref[pl.ds(base, bh3), :]  # (3*BH, 128): r, g, b blocks
        bhi = bfull.astype(jnp.bfloat16).astype(jnp.float32)
        blo = bfull - bhi

        ohx_parts, ohys, hits, ws = [], [], [], []
        for c, (yc, xc, wc) in enumerate(corners):
            hitc = (arow(3 + c) < 0.5) & (bids[c] == b)
            lx = xc - bx * 128
            ly = yc - by * TEX_BH
            ohx_parts.append((iota128 == flat(lx)).astype(jnp.float32))
            ohys.append((iota_bh == flat(ly)).astype(jnp.float32))
            hits.append(hitc)
            ws.append(flat(jnp.where(hitc, wc, 0.0)))
        ohx_all = jnp.concatenate(ohx_parts, axis=1)  # (128, 4T)
        col = _dot1(bhi, ohx_all) + _dot1(blo, ohx_all)  # (3*BH, 4T)

        tn = flat_n
        for c in range(4):
            colc = col[:, c * tn:(c + 1) * tn]
            for ci in range(3):
                val = jnp.sum(
                    ohys[c] * colc[ci * TEX_BH:(ci + 1) * TEX_BH, :],
                    axis=0, keepdims=True,
                )  # (1, T)
                aput(ci, arow(ci) + to_px(ws[c] * val))
            aput(3 + c, jnp.where(hits[c], 1.0, arow(3 + c)))

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

        @pl.when(b != cached_ref[0, slot])
        def _fetch():
            copies = [
                pltpu.make_async_copy(
                    src.at[pl.ds(by * TEX_BH, TEX_BH), pl.ds(bx * 128, 128)],
                    blk_ref.at[pl.ds(base + ci * TEX_BH, TEX_BH), :],
                    sem,
                )
                for ci, src in enumerate((tr_hbm, tg_hbm, tb_hbm))
            ]
            for cp in copies:
                cp.start()
            for cp in copies:
                cp.wait()
            cached_ref[0, slot] = b

        serve(b, base)
        return unserved_count()

    # (A straight-line "warm pass" serving both cached slots before the
    # loop was measured SLOWER on hardware — 16.0 vs 17.7 Mrays/s: the
    # unconditional matmul pairs + one-hot builds cost more than the
    # demand iterations they replace. The loop stays the only server.)
    jax.lax.while_loop(cond, body, unserved_count())
    return arow(0), arow(1), arow(2)


def _sample_texture(texr_ref, texg_ref, texb_ref, u, v, th, tw):
    """Bilinear texture fetch with tex2D_cpu semantics (materials.h:20-51)
    as two one-hot MXU contractions per channel: wrap addressing, v flip,
    truncation, neighbor wrap. u/v are flat (1, T); returns 3 x (1, T)."""
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

    out = []
    for ref in (texr_ref, texg_ref, texb_ref):
        col = jnp.dot(ref[:], rx, preferred_element_type=jnp.float32, precision=hp)
        out.append(jnp.sum(ry * col, axis=0, keepdims=True))
    return out


# ----------------------------------------------------------------------
# shared shading / scatter (materials.h:70-140 with the fixed 8-draw
# budget of tracer.materials.scatter)
# ----------------------------------------------------------------------


def _shade(rec, t_best, ox, oy, oz, dx, dy, dz, a, beta, final, seed, alive, bg, to_px,
           pu=None, pv=None, tex_refs=None, flat=None, big_tex=None, ps=None,
           rr_start=None, depth=None, rec_rows=1, want_tex_mult=False):
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

        if big_tex is not None:
            # HBM demand-paged path: the while-loop runs zero iterations
            # when no lane is textured, so no scalar gate is needed
            tr, tg, tb = _tex_demand_fetch(
                big_tex, u_all, v_all, textured, flat, to_px, ps
            )
            tm0 = jnp.where(textured, tr, 1.0)
            tm1 = jnp.where(textured, tg, 1.0)
            tm2 = jnp.where(textured, tb, 1.0)
        else:
            th, tw = tex_refs[0].shape

            def apply_tex():
                tr, tg, tb = _sample_texture(
                    tex_refs[0], tex_refs[1], tex_refs[2], flat(u_all), flat(v_all), th, tw
                )
                m0 = jnp.where(textured, to_px(tr), 1.0)
                m1 = jnp.where(textured, to_px(tg), 1.0)
                m2 = jnp.where(textured, to_px(tb), 1.0)
                return m0, m1, m2

            ones = jnp.ones_like(al0)
            tm0, tm1, tm2 = jax.lax.cond(
                jnp.any(textured), apply_tex, lambda: (ones, ones, ones)
            )
        al0, al1, al2 = al0 * tm0, al1 * tm1, al2 * tm2
    else:
        tm0 = tm1 = tm2 = None

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

    # fixed 8-draw scatter
    seed, u_choice = _rand(seed)
    seed, (hx, hy, hz) = _rand_unit_vector(seed)
    hdotn = hx * nx + hy * ny + hz * nz
    hsgn = jnp.where(hdotn > 0.0, 1.0, -1.0)
    hx, hy, hz = hx * hsgn, hy * hsgn, hz * hsgn  # hemisphere
    seed, (ballx, bally, ballz) = _rand_unit_vector(seed)
    seed, u_ball = _rand(seed)
    # Mosaic has no cbrt; exp(log(u)/3) matches jnp.cbrt to ~1 ulp on
    # (0, 1) and maps u = 0 to ~0 via the clamp.
    br = jnp.exp(jnp.log(jnp.maximum(u_ball, 1e-38)) * jnp.float32(1.0 / 3.0))
    ballx, bally, ballz = ballx * br, bally * br, ballz * br
    seed, u_refl = _rand(seed)
    seed, u_rr = _rand(seed)

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
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    cannot = ratio * sin_t > 1.0
    r0 = ((1.0 - ratio) / (1.0 + ratio)) ** 2
    refl_p = r0 + (1.0 - r0) * (1.0 - cos_t) ** 5
    choose_refl = cannot | (refl_p > u_refl)
    perp_x = ratio * (udx + cos_t * nx)
    perp_y = ratio * (udy + cos_t * ny)
    perp_z = ratio * (udz + cos_t * nz)
    perp2 = perp_x * perp_x + perp_y * perp_y + perp_z * perp_z
    par = -jnp.sqrt(jnp.abs(1.0 - perp2))
    reflx = udx - 2.0 * uddn * nx
    refly = udy - 2.0 * uddn * ny
    reflz = udz - 2.0 * uddn * nz
    diex = jnp.where(choose_refl, reflx, perp_x + par * nx)
    diey = jnp.where(choose_refl, refly, perp_y + par * ny)
    diez = jnp.where(choose_refl, reflz, perp_z + par * nz)
    dist = jnp.sqrt((px - ox) ** 2 + (py - oy) ** 2 + (pz - oz) ** 2)
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
    if want_tex_mult:
        # per-bounce texture multipliers for the recording tape (the
        # replay consumes them instead of re-gathering texels — XLA
        # per-ray texture gathers measured ~10x the whole grad step)
        ones = jnp.ones_like(t_best)
        return out + (((tm0, tm1, tm2) if tm0 is not None
                       else (ones, ones, ones)),)
    return out


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
            textape_ref = refs.pop()  # [3*spp*max_depth, tile] f32
            textape_ref[...] = jnp.ones(textape_ref.shape, jnp.float32)
        idx_ref = refs.pop()  # second output: [spp*max_depth, tile] i32
        idx_ref[...] = jnp.full(idx_ref.shape, -1, jnp.int32)
    tex_refs = None
    big = None
    if has_tex:
        t3 = tuple(refs[-4:-1])
        del refs[-4:-1]
        if big_tex:
            nbx = _round_up(tex_tw, 128) // 128
            big = t3 + tex_scr + (tex_th, tex_tw, nbx)
            for _sl in range(TEX_SLOTS):  # invalidate every cache slot
                tex_scr[2][0, _sl] = -1
        else:
            tex_refs = t3
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

    flat_n = ps[0] * 128  # elements per tile (pixels x samples)

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
        row = lambda i: state_ref[i * ps0:(i + 1) * ps0, :]
        F_S, F_DEPTH, F_ALIVE = 0, 1, 2
        F_O, F_D, F_B, F_F, F_A = 3, 6, 9, 12, 15

        def put(i, v):
            state_ref[i * ps0:(i + 1) * ps0, :] = v

        def put3(i, v3):
            for c in range(3):
                put(i + c, v3[c])

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

        put(F_S, jnp.where(valid, s_first, spp_f))  # about to start 1st sample
        put(F_DEPTH, jnp.broadcast_to(maxd_f, ps))  # forces regen on entry
        put(F_ALIVE, jnp.zeros(ps, jnp.float32))
        zero3 = (jnp.zeros(ps, jnp.float32),) * 3
        put3(F_O, zero3)
        put3(F_D, zero3)
        put3(F_B, zero3)
        put3(F_F, zero3)
        put3(F_A, zero3)
        seed_ref[...] = jnp.broadcast_to(base_seed, ps)

        def cond(remaining):
            return remaining > 0

        def body(remaining):
            s = row(F_S)
            depth = row(F_DEPTH)
            alive = row(F_ALIVE) > 0.5
            ox, oy, oz = row(F_O), row(F_O + 1), row(F_O + 2)
            dx, dy, dz = row(F_D), row(F_D + 1), row(F_D + 2)
            b0, b1, b2 = row(F_B), row(F_B + 1), row(F_B + 2)
            f0, f1, f2 = row(F_F), row(F_F + 1), row(F_F + 2)
            seed = seed_ref[...]

            # -- sample boundary: fold the finished sample, regenerate ----
            over = (~alive) | (depth >= maxd_f)
            put(F_A + 0, row(F_A + 0) + jnp.where(over, f0, 0.0))
            put(F_A + 1, row(F_A + 1) + jnp.where(over, f1, 0.0))
            put(F_A + 2, row(F_A + 2) + jnp.where(over, f2, 0.0))
            f0 = jnp.where(over, 0.0, f0)
            f1 = jnp.where(over, 0.0, f1)
            f2 = jnp.where(over, 0.0, f2)
            s = jnp.where(over, jnp.minimum(s + s_stride, spp_f), s)
            can = over & (s < spp_f) & valid

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
                )
                put(F_S, s)
                put(F_DEPTH, depth + 1.0)
                put(F_ALIVE, jnp.where(alive, 1.0, 0.0))
                put3(F_O, o3)
                put3(F_D, d3)
                put3(F_B, beta)
                put3(F_F, fin)
                seed_ref[...] = seed
                return jnp.sum((s < spp_f).astype(jnp.int32))

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
                want_tex_mult=textape_ref is not None,
            )
            if textape_ref is not None:
                o3, d3, beta, fin, seed, alive2, tms = shade_out
                # same masked-accumulate scatter as the index tape: the
                # tape starts at 1.0 and a visited slot adds (tm - 1)
                rows = spp * max_depth
                for c in range(3):
                    sl = slice(c * rows, (c + 1) * rows)
                    add_c = jnp.where(
                        took, jnp.broadcast_to(tms[c] - 1.0, (rows, 128)), 0.0)
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
            seed_ref[...] = seed
            return jnp.sum((s < spp_f).astype(jnp.int32))

        if PERSIST_UNROLL > 1:
            inner = body

            def body(remaining):
                for _ in range(PERSIST_UNROLL):
                    remaining = inner(remaining)
                return remaining

        jax.lax.while_loop(cond, body, jnp.sum(valid.astype(jnp.int32)))
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
            out_ref[0:1, :] = row(F_A + 0).reshape(1, tile_px)
            out_ref[1:2, :] = row(F_A + 1).reshape(1, tile_px)
            out_ref[2:3, :] = row(F_A + 2).reshape(1, tile_px)
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
                want_tex_mult=textape_ref is not None,
            )
            if textape_ref is not None:
                o3, d3, beta, final, seed, alive, tms = shade_out
                rows = spp * max_depth
                for c in range(3):
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


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "spp", "max_depth", "reference_quirk", "interpret",
        "tile_px", "stratify", "sample_block", "fast_math", "persistent",
        "rr_start", "no_far",
    ),
)
def _render_brute_jit(
    scene, cam, width, height, spp, max_depth, reference_quirk, interpret,
    tile_px, stratify, sample_block, fast_math, persistent, row_offset=0,
    rr_start=None, no_far=False,
):
    """Whole brute path (packing included) under one jit: repeat frames
    dispatch ONE remote call instead of ~30 tiny eager ops (the eager
    glue cost ~0.85s/frame through the tunneled backend)."""
    return _render_frame_impl(
        scene, cam, width, height, spp, max_depth, reference_quirk,
        interpret, 0, tile_px, stratify, None, sample_block=sample_block,
        fast_math=fast_math, persistent=persistent, row_offset=row_offset,
        rr_start=rr_start, no_far=no_far,
    )


# clustered tables are packed host-side (NumPy); cache them per scene
# content (cheap geometry fingerprint), LRU-evicted — id() keys retain
# scenes forever and break across object lifetimes (ADVICE round 1)
_CLUSTER_TABLE_CACHE = collections.OrderedDict()
_CLUSTER_CACHE_MAX = 8


def _scene_fingerprint(scene: Scene) -> bytes:
    """Hashable digest of the geometry that pack_clustered reads."""
    import hashlib

    h = hashlib.sha1()
    for arr in (scene.spheres.center, scene.spheres.radius,
                scene.planes.base, scene.planes.u, scene.planes.v,
                scene.planes.ptype):
        import numpy as _np

        a = _np.asarray(arr)
        h.update(str(a.shape).encode())
        h.update(a.tobytes())
    return h.digest()


# scene-level part of the no_far proof, cached by geometry content
_INTERIOR_FREE_CACHE = collections.OrderedDict()


def _interior_free(scene, cam) -> bool:
    """True iff no ray of this render can start inside a sphere (the
    static proof that makes the sphere far root dead code — see the
    no_far comment at the call site). Conservative: any doubt, any traced
    value, or >4096 spheres (O(n^2) guard) returns False."""
    import numpy as _np

    try:
        mt = _np.asarray(scene.materials.mtype)
        if bool((mt == 2).any()):  # 2 = DIELECTRIC: refracted interiors
            return False
        c = _np.asarray(scene.spheres.center)
        r = _np.asarray(scene.spheres.radius)
        if c.shape[0] > 4096:
            return False
        key = _scene_fingerprint(scene)
        hit = _INTERIOR_FREE_CACHE.get(key)
        if hit is None:
            ok = True
            if c.shape[0] > 1:
                d2 = ((c[:, None, :] - c[None, :, :]) ** 2).sum(-1)
                _np.fill_diagonal(d2, _np.inf)
                ok = not bool((d2 < (r[:, None] + r[None, :]) ** 2).any())
            if ok and scene.planes is not None:
                pn = _np.asarray(scene.planes.normal)
                if pn.size:
                    pd = _np.asarray(scene.planes.d)
                    nn = _np.linalg.norm(pn, axis=1)
                    # conservative: treat each finite plane as infinite
                    dist = _np.abs(c @ pn.T - pd[None, :])
                    dist = dist / _np.maximum(nn[None, :], 1e-30)
                    ok = not bool((dist < r[:, None]).any())
            while len(_INTERIOR_FREE_CACHE) >= 64:
                _INTERIOR_FREE_CACHE.popitem(last=False)
            _INTERIOR_FREE_CACHE[key] = hit = ok
        if not hit:
            return False
        eye = _np.asarray(cam.origin)
        return bool((((c - eye[None, :]) ** 2).sum(-1) > r * r).all())
    except Exception:  # traced scene/cam under an outer jit
        return False


def render_frame_pallas(
    scene: Scene,
    cam,
    width: int,
    height: int,
    spp: int,
    max_depth: int,
    reference_quirk: bool = True,
    interpret: bool = False,
    cluster_k: int = 0,
    tile_px: int = 128,
    stratify: bool = False,
    sample_block: int = 1,
    fast_math: bool = False,
    persistent: bool = True,
    culled: bool = True,
    cull_group: int = 4,
    rr_start=None,
):
    """Render one frame with the fused megakernel.

    rr_start (int, default None=off) enables throughput Russian roulette
    from that bounce index on — unbiased path termination for deep
    scenes (see _shade); changes the RNG stream and the per-sample
    estimator, so per-sample parity holds only against the XLA renderer
    run with the same rr_start.

    persistent=True (default since round 2) runs ONE while-loop per tile
    with per-lane path regeneration: a lane starts its next sample the
    moment its path dies, so lanes never idle on tile-mates. Identical
    RNG streams and summation grouping as the per-sample loop mode
    (persistent=False, round-1 behavior). Measured on v5e (canonical
    scene, 800x600 spp 32 depth 50, fast_math): 35.0 Mrays/s at 128-px
    tiles vs 14.9 for the round-1 sample-loop kernel; 1024-px tiles
    reach full (8,128) sublane shading shapes but lose to the per-bounce
    (8,128)<->(1,1024) relayouts (23.0), so 128 stays the default.

    fast_math=True runs the in-kernel matmuls as 3-pass bf16x3 instead of
    6-pass f32-exact: ~25-30% faster, statistically identical images, but
    ~3% of pixels take different (equally valid) sample paths after
    razor-edge hit flips — per-sample parity with the XLA renderer is
    waived in this mode.

    cluster_k = 0 runs the brute-force strategy; > 0 enables packet
    culling with K-primitive clusters. Textured scenes support a single
    texture layer of ANY size: up to MAX_TEX_DIM a side the texture is
    VMEM-resident (bilinear fetch as one-hot MXU contractions); larger
    textures stay in HBM and are demand-paged in short blocks through
    a multi-slot VMEM cache (round 2) — both give exact tex2D_cpu parity. Returns
    [height, width, 3] raw sample sums — same contract (and same RNG
    streams) as renderer.render_frame.

    The brute path runs fully under jit (packing is trace-safe), so
    repeat frames cost one dispatch. The clustered path packs host-side
    NumPy tables once per (scene, k) — cached by scene identity — and
    jits the rest.
    """
    if cluster_k == 0:
        # host-side static scene property: the sphere far root is dead
        # code (fast_math only) iff NO ray can ever start inside a
        # sphere. Proven when (a) no dielectric material (no refracted
        # interior rays), (b) spheres are pairwise non-overlapping and
        # intersect no plane (a scatter origin on one surface can then
        # never sit inside another sphere — overlap interiors otherwise
        # create bounce traps the reference renders), and (c) the camera
        # is outside every sphere. Only checkable when scene and cam are
        # concrete — under an outer jit the safe default (False) applies.
        no_far = fast_math and _interior_free(scene, cam)
        return _render_brute_jit(
            scene, cam, width, height, spp, max_depth, reference_quirk,
            interpret, tile_px, stratify, sample_block, fast_math, persistent,
            rr_start=rr_start, no_far=no_far,
        )
    key = (_scene_fingerprint(scene), cluster_k)
    tables = _CLUSTER_TABLE_CACHE.get(key)
    if tables is None:
        from tracer.pallas import cluster as cluster_mod

        tables = cluster_mod.pack_clustered(scene, k=cluster_k)
        while len(_CLUSTER_TABLE_CACHE) >= _CLUSTER_CACHE_MAX:
            _CLUSTER_TABLE_CACHE.popitem(last=False)
        _CLUSTER_TABLE_CACHE[key] = tables
    else:
        _CLUSTER_TABLE_CACHE.move_to_end(key)
    return _render_clustered_jit(
        tables["cboxes"], tables["proj"], tables["const"], tables["join"],
        scene.textures, cam, width, height, spp, max_depth, reference_quirk,
        interpret, tables["num_clusters"], tables["k"], tile_px, stratify,
        sample_block, fast_math, persistent, culled, cull_group,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "spp", "max_depth", "reference_quirk", "interpret",
        "tile_px", "stratify", "fast_math", "persistent",
    ),
)
def render_frame_pallas_record(
    scene, cam, width, height, spp, max_depth, reference_quirk=True,
    interpret=False, tile_px=128, stratify=False, fast_math=False,
    sample_start=0, persistent=True,
):
    """Forward render that ALSO records the per-bounce winner primitive
    index: returns (fb [H,W,3], idx [spp, max_depth, H*W] i32, -1=miss);
    textured scenes additionally return the texture-multiplier tape
    (fb, idx, tex [spp, max_depth, H*W, 3]) so the replay never has to
    gather texels.

    The index tape is what makes the fast backward possible: the replay
    VJP (tracer.pallas.replay) re-shades each bounce differentiably by
    GATHERING the recorded winner instead of re-running the O(prims)
    intersection search that dominates the remat backward.

    persistent=True (default since round 2) records through the
    persistent per-lane regeneration kernel (~2.4x the sample-loop
    forward): each lane scatters its winner into its own (sample, depth)
    tape row via a masked accumulate. Tape slots a lane never reaches
    (bounces after path death) read -1 instead of the sample-loop mode's
    dead-lane garbage — the replay masks both identically.
    """
    return _render_frame_impl(
        scene, cam, width, height, spp, max_depth, reference_quirk,
        interpret, 0, tile_px, stratify, None, sample_block=1,
        fast_math=fast_math, persistent=persistent and tile_px == 128,
        record_idx=True, sample_start=sample_start,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "spp", "max_depth", "reference_quirk", "interpret",
        "num_clusters", "k", "tile_px", "stratify", "sample_block", "fast_math",
        "persistent", "culled", "cull_group",
    ),
)
def _render_clustered_jit(
    cboxes, proj, const, join, textures, cam, width, height, spp, max_depth,
    reference_quirk, interpret, num_clusters, k, tile_px, stratify,
    sample_block, fast_math, persistent, culled=False, cull_group=4,
):
    tables = dict(cboxes=cboxes, proj=proj, const=const, join=join,
                  num_clusters=num_clusters, k=k)
    return _render_frame_impl(
        None, cam, width, height, spp, max_depth, reference_quirk,
        interpret, k, tile_px, stratify, tables, textures=textures,
        sample_block=sample_block, fast_math=fast_math, persistent=persistent,
        culled=culled, cull_group=cull_group,
    )


def _render_frame_impl(
    scene, cam, width, height, spp, max_depth, reference_quirk,
    interpret, cluster_k, tile_px, stratify, tables, textures=None,
    sample_block=1, fast_math=False, persistent=False, row_offset=0,
    record_idx=False, sample_start=0, culled=False, cull_group=4,
    rr_start=None, no_far=False,
):
    if rr_start is not None:
        # replay would need to replicate the RR kill decisions; keep the
        # recorded (differentiable) path on the plain estimator
        assert not record_idx, "rr_start is not supported with recording"
    if sample_block > 1:
        assert tile_px == 128, "sample_block requires 128-px tiles"
        if persistent:
            # sample-major persistent: per-lane regeneration at (SPB, 128)
            # with per-row intersection (no relayouts); unsupported
            # combinations fall back to the sample-loop sample-major mode
            if record_idx or cluster_k > 0:
                persistent = False
    tex_src = scene.textures if scene is not None else textures
    has_tex = tex_src is not None
    big_tex = False
    th = tw = 0
    if has_tex:
        if tex_src.shape[0] != 1:
            raise PallasUnsupported("megakernel: one texture layer only")
        th, tw = tex_src.shape[1:3]
        # textures above MAX_TEX_DIM switch from VMEM residency to the
        # HBM demand-paged block cache (no size cap)
        big_tex = max(th, tw) > MAX_TEX_DIM
    assert tile_px % 128 == 0 and tile_px >= 128
    strat_k = 0
    if stratify:
        strat_k = int(round(spp ** 0.5))
        assert strat_k * strat_k == spp, "stratify requires square spp"
    num_pixels = width * height
    grid = (num_pixels + tile_px - 1) // tile_px

    params = jnp.concatenate(
        [
            cam.origin,
            cam.pixel00_loc,
            cam.pixel_delta_u,
            cam.pixel_delta_v,
            cam.background,
            jnp.asarray(row_offset, jnp.float32).reshape(1),
            jnp.asarray(sample_start, jnp.float32).reshape(1),
            jnp.zeros((7,), jnp.float32),
        ]
    ).reshape(1, 24)

    common = dict(
        tile_px=tile_px,
        sample_block=sample_block,
        fast_math=fast_math,
        persistent=persistent,
        strat_k=strat_k,
        spp=spp,
        max_depth=max_depth,
        width=width,
        num_pixels=num_pixels,
        quirk=reference_quirk,
        has_tex=has_tex,
        big_tex=big_tex,
        tex_th=th,
        tex_tw=tw,
        record_idx=record_idx,
        rr_start=rr_start,
        no_far=no_far and fast_math,
    )

    if cluster_k > 0:
        assert tables is not None  # packed by the caller (cached per scene)
        kernel = functools.partial(
            _kernel,
            clustered=True,
            num_s=0, num_p=0, n_pad=0,
            num_clusters=tables["num_clusters"], k=tables["k"],
            culled=culled, cull_group=cull_group,
            **common,
        )
        cboxes = tables["cboxes"]
        if culled:
            # padded VMEM boxes for the vectorized slab pass (empty boxes
            # on padding rows so they never demand a visit)
            cpad = _round_up(cboxes.shape[0], 8)
            cboxes = jnp.full((cpad, 8), 0.0, jnp.float32) \
                .at[:, 0:3].set(K_INFINITY).at[:, 3:6].set(-K_INFINITY) \
                .at[: cboxes.shape[0]].set(cboxes)
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params
            pl.BlockSpec(memory_space=pltpu.VMEM if culled else pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # proj
            pl.BlockSpec(memory_space=pltpu.VMEM),  # const
            pl.BlockSpec(memory_space=pltpu.VMEM),  # join
        ]
        inputs = (params, cboxes, tables["proj"], tables["const"], tables["join"])
    else:
        proj, const, join, num_s, num_p, n_pad, _ = pack_scene(scene)
        kernel = functools.partial(
            _kernel,
            clustered=False,
            num_s=num_s, num_p=num_p, n_pad=n_pad,
            num_clusters=0, k=0,
            culled=False,
            **common,
        )
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        inputs = (params, proj, const, join)

    if has_tex:
        tex = tex_src[0]
        if big_tex:
            thp, twp = _round_up(th, 128), _round_up(tw, 128)
            chans = tuple(
                jnp.zeros((thp, twp), jnp.float32).at[:th, :tw].set(tex[:, :, c])
                for c in range(3)
            )
            inputs = inputs + chans
            # ANY keeps the texture in HBM; the kernel DMAs blocks on demand
            in_specs = in_specs + [pl.BlockSpec(memory_space=pl.ANY)] * 3
        else:
            inputs = inputs + (tex[:, :, 0], tex[:, :, 1], tex[:, :, 2])
            in_specs = in_specs + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3

    ps0 = sample_block if sample_block > 1 else tile_px // 128
    scratch_shapes = []
    if persistent:
        scratch_shapes += [
            pltpu.VMEM((18 * ps0, 128), jnp.float32),  # per-lane path state
            pltpu.VMEM((ps0, 128), jnp.uint32),        # RNG state
        ]
    if big_tex:
        scratch_shapes += [
            pltpu.VMEM((TEX_SLOTS * 3 * TEX_BH, 128), jnp.float32),  # block cache
            pltpu.VMEM((7 * ps0, 128), jnp.float32),   # fetch accum + served
            pltpu.SMEM((1, TEX_SLOTS), jnp.int32),     # cached block ids
            pltpu.SemaphoreType.DMA,
        ]
    if culled:
        cpad = _round_up(tables["num_clusters"], 8)
        scratch_shapes += [
            pltpu.VMEM((cpad, 128), jnp.float32),            # cluster demand
            pltpu.VMEM((JROWS + 3, ps0 * 128), jnp.float32), # running winner
        ]

    out_specs = pl.BlockSpec((3, tile_px), lambda g: (0, g), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((3, grid * tile_px), jnp.float32)
    if record_idx:
        rows = spp * max_depth
        out_specs = [
            out_specs,
            pl.BlockSpec((rows, tile_px), lambda g: (0, g), memory_space=pltpu.VMEM),
        ]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((rows, grid * tile_px), jnp.int32),
        ]
        if has_tex:
            # per-bounce texture multipliers (channel-major rows): the
            # replay applies these instead of re-gathering texels
            out_specs.append(pl.BlockSpec((3 * rows, tile_px), lambda g: (0, g),
                                          memory_space=pltpu.VMEM))
            out_shape.append(
                jax.ShapeDtypeStruct((3 * rows, grid * tile_px), jnp.float32))

    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*inputs)

    if record_idx:
        if has_tex:
            out, idx, textape = out
        else:
            out, idx, textape = out + (None,)
        fb = jnp.transpose(out[:, :num_pixels]).reshape(height, width, 3)
        # [spp, max_depth, num_pixels] winner indices for the replay VJP
        idx = idx[:, :num_pixels].reshape(spp, max_depth, num_pixels)
        if textape is None:
            return fb, idx
        # [spp, max_depth, num_pixels, 3] texture multipliers
        tex = jnp.moveaxis(
            textape.reshape(3, spp, max_depth, grid * tile_px)[..., :num_pixels],
            0, -1)
        return fb, idx, tex

    fb = out[:, :num_pixels]  # [3, N]
    return jnp.transpose(fb).reshape(height, width, 3)
