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

# Engine split (round 3): shared constants/packing/shading in
# kernel_lib, the kernel body in kernels, cluster-culled intersectors
# (closed experiments) in culling. Everything is re-exported here — this
# module remains the megakernel's public face.
from tracer.pallas.kernel_lib import (  # noqa: F401  (re-exports)
    TILE, CROWS, C_CCRR, C_BASEA, C_BASEB, C_PTYPE, C_KIND,
    J_CX, J_CY, J_CZ, J_RAD, J_NX, J_NY, J_NZ, J_ISSPH,
    J_MTYPE, J_FUZZ, J_IR, J_ABS0, J_ABS1, J_ABS2,
    J_ALB0, J_ALB1, J_ALB2, J_EMI0, J_EMI1, J_EMI2, J_TEXID, JROWS,
    MAX_TEX_DIM, T_MIN, T_MAX, DENOM_EPS, RR_MIN_P, TEX_BH, TEX_SLOTS,
    PERSIST_UNROLL, _U, PallasUnsupported,
    _round_up, _split_hi_lo, _dot1, _dot3, _dot_exact, pack_scene,
    _wang_hash, _u32_to_f32, _rand, _rand_unit_vector,
    _unified_ts, _winner_join, _intersect_brute, _intersect_brute_rows,
    _fl, _atan_cephes, _atan2_cephes, _acos_cephes,
    _tex_addressing, _tex_demand_fetch, _sample_texture, _shade,
)
from tracer.pallas.culling import (  # noqa: F401
    _intersect_clustered, _intersect_culled,
)
from tracer.pallas.kernels import _kernel  # noqa: F401


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "spp", "max_depth", "reference_quirk", "interpret",
        "tile_px", "stratify", "sample_block", "fast_math", "persistent",
        "rr_start", "no_far", "debug_iters", "lane_major", "interleave",
    ),
)
def _render_brute_jit(
    scene, cam, width, height, spp, max_depth, reference_quirk, interpret,
    tile_px, stratify, sample_block, fast_math, persistent, row_offset=0,
    rr_start=None, no_far=False, sample_start=0, debug_iters=False,
    lane_major=False, interleave=1,
):
    """Whole brute path (packing included) under one jit: repeat frames
    dispatch ONE remote call instead of ~30 tiny eager ops (the eager
    glue cost ~0.85s/frame through the tunneled backend)."""
    return _render_frame_impl(
        scene, cam, width, height, spp, max_depth, reference_quirk,
        interpret, 0, tile_px, stratify, None, sample_block=sample_block,
        fast_math=fast_math, persistent=persistent, row_offset=row_offset,
        rr_start=rr_start, no_far=no_far, sample_start=sample_start,
        debug_iters=debug_iters, lane_major=lane_major, interleave=interleave,
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
    sample_start=0,
    debug_iters: bool = False,
    lane_major: bool = False,
    interleave: int = 1,
):
    """Render one frame with the fused megakernel.

    lane_major=True (round 5, persistent brute path only; CLOSED
    experiment, measured loser) lays the tile out as ONE (1, tile_px)
    vector row instead of (tile_px//128, 128): flat()/to_px become
    identity (none of the relayouts that sank the big-tile experiments)
    and the per-iteration fixed cost is shared by tile_px lanes.
    Measured on v5e (canonical untextured, 800x600 spp32 d50 fm):
    t256 32.3 / t512 25.7 / t1024 22.4 vs t128 37.6 Mrays/s. The
    debug_iters accounting shows why: per lane-iteration the wide tile
    is ~14% FASTER (the amortization is real), but a tile's loop runs
    until its SLOWEST lane exhausts its total sample budget, and the
    max-over-lanes budget grows with tile width — t512 executes 1.66x
    the lane-iterations (78.5M vs 47.2M; occupancy 49% vs 81%).
    Per-lane path regeneration equalizes IDLE time, not BUDGET
    variance; without cross-lane work stealing (a per-lane dynamic
    pixel scatter the VPU cannot do cheaply), 128-lane exit granularity
    stays optimal. Output is bit-identical to the default layout.

    interleave=G (round 5, persistent brute path only; CLOSED
    experiment, measured loser) splits each 128-px tile's spp into G
    independent SAMPLE-STREAM groups — own 18-row state block and seed
    row each — advanced back-to-back inside one loop body. The bet:
    benchmarks/interleave_microbench.py measured 2 independent scratch-
    RMW chains at ~1.4x the time of one (the loop is latency-bound), and
    groups covering the SAME pixels have near-identical total budgets,
    so the occupancy loss that sank lane-major should vanish. Measured
    on v5e (canonical untextured 800x600 spp32 d50 fm, fixed pose):
    G=1 48.5 / G=2 45.4 / G=4 37.4 Mrays/s — the real body's ~dozens of
    heterogeneous ops per bounce are issue-bound enough that doubling
    the op stream costs more than the latency it hides, and each group
    re-runs the full intersection matmul set per iteration. Same
    estimator and streams; output differs from the default only in f32
    accumulation grouping (groups sum per-group then combine).

    sample_start (traced ok, brute path only) offsets the per-pixel
    sample stream — render_frame_pallas(spp=k, sample_start=c*k) summed
    over c equals the one-shot spp=c*k frame up to f32 addition order;
    used to bound single-dispatch duration on huge frames (a ~190 s
    single kernel dispatch crashed the tunneled TPU worker at 4K 256spp).

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
            rr_start=rr_start, no_far=no_far, sample_start=sample_start,
            debug_iters=debug_iters, lane_major=lane_major,
            interleave=interleave,
        )
    if not (isinstance(sample_start, int) and sample_start == 0):
        raise PallasUnsupported("sample_start: brute path only")
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
        "rr_start", "tape_fields",
    ),
)
def render_frame_pallas_record(
    scene, cam, width, height, spp, max_depth, reference_quirk=True,
    interpret=False, tile_px=128, stratify=False, fast_math=False,
    sample_start=0, persistent=True, rr_start=None, tape_fields=3,
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
        record_idx=True, sample_start=sample_start, rr_start=rr_start,
        tape_fields=tape_fields,
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
    rr_start=None, no_far=False, tape_fields=3, debug_iters=False,
    lane_major=False, interleave=1,
):
    if lane_major:
        assert persistent and sample_block == 1 and cluster_k == 0 \
            and not record_idx, \
            "lane_major: persistent brute forward only"
    if interleave > 1:
        assert persistent and sample_block == 1 and cluster_k == 0 \
            and not record_idx and not lane_major and tile_px == 128 \
            and spp % interleave == 0, \
            "interleave: persistent brute forward, 128-px tiles, spp % G == 0"
    if tile_px == 128:
        lane_major = False  # (1,128) == the default layout already
    # rr_start composes with record_idx (round 3): the RR kill decision is
    # a deterministic function of the recorded streams (beta replays
    # bit-identically, the kill draw comes from the same per-lane seed
    # chain), so the replay recomputes it instead of needing it on tape —
    # an RR-killed lane replays as dead, never as a background miss.
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
        tape_fields=tape_fields,
        debug_iters=debug_iters,
        lane_major=lane_major,
        interleave=interleave,
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
            # pre-block the texture so one cache miss = ONE contiguous DMA
            # of [r; g; b] block rows (3 strided row-pitch copies cost
            # more DMA descriptors for the same bytes)
            thp, twp = _round_up(th, TEX_BH), _round_up(tw, 128)
            nby, nbxp = thp // TEX_BH, twp // 128
            chan = jnp.zeros((3, thp, twp), jnp.float32).at[
                :, :th, :tw].set(jnp.moveaxis(tex, -1, 0))
            blocked = (
                chan.reshape(3, nby, TEX_BH, nbxp, 128)
                .transpose(1, 3, 0, 2, 4)  # (nby, nbx, chan, BH, 128)
                .reshape(nby * nbxp * 3 * TEX_BH, 128)
            )
            inputs = inputs + (blocked,)
            # ANY keeps the texture in HBM; the kernel DMAs blocks on demand
            in_specs = in_specs + [pl.BlockSpec(memory_space=pl.ANY)]
        else:
            inputs = inputs + (tex[:, :, 0], tex[:, :, 1], tex[:, :, 2])
            in_specs = in_specs + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3

    ps0 = sample_block if sample_block > 1 else tile_px // 128
    lane_w = 128
    if lane_major:
        ps0, lane_w = 1, tile_px  # ONE (1, tile_px) vector row per tile
    scratch_shapes = []
    if persistent:
        scratch_shapes += [
            # per-lane path state + RNG, one 18-row block and seed row per
            # interleave group
            pltpu.VMEM((18 * interleave * ps0, lane_w), jnp.float32),
            pltpu.VMEM((interleave * ps0, lane_w), jnp.uint32),
        ]
    if big_tex:
        # fetch accum + served flags; +6 rows of d(texel)/d(px,py)
        # accumulators when the tape records uv derivatives
        aux_rows = 13 if (record_idx and tape_fields >= 9) else 7
        scratch_shapes += [
            pltpu.VMEM((TEX_SLOTS * 3 * TEX_BH, 128), jnp.float32),  # block cache
            pltpu.VMEM((aux_rows * ps0, lane_w), jnp.float32),
            # cached block ids + 2 debug counters (demand iters, DMA misses)
            pltpu.SMEM((1, TEX_SLOTS + 2), jnp.int32),
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
            # per-bounce texture tape (channel-major field-row groups):
            # the replay applies these instead of re-gathering texels;
            # tape_fields > 3 adds d(texel)/d(uv) and addressing fields
            out_specs.append(pl.BlockSpec((tape_fields * rows, tile_px),
                                          lambda g: (0, g),
                                          memory_space=pltpu.VMEM))
            out_shape.append(
                jax.ShapeDtypeStruct((tape_fields * rows, grid * tile_px),
                                     jnp.float32))

    # Mosaic's default scoped-VMEM limit is 16 MB; the brute kernel keeps
    # the whole packed scene VMEM-resident AND its per-tile intersection
    # temporaries scale with the prim-row count, so big scenes trip the
    # check even though v5e has 128 MB of VMEM (measured: brute n=10000
    # spheres wants 23.85 MB, n=20000 48.27 MB, culled n=20000 113 MB).
    # Raise the cap only when the scene is actually big, so small-scene
    # compiles keep the default envelope.
    in_bytes = sum(int(getattr(x, "nbytes", 0)) for x in inputs)
    max_rows = max(
        (int(x.shape[0]) for x in inputs if getattr(x, "ndim", 0) >= 2),
        default=0)
    compiler_params = None
    if in_bytes > 8 * 1024 * 1024 or max_rows > 4096:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024)

    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=compiler_params,
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
        # [spp, max_depth, num_pixels, tape_fields]: fields 0-2 texel
        # multipliers; 3-8 d(texel)/d(u,v); 9-12 addressing (x0,y0,fu,fv)
        tex = jnp.moveaxis(
            textape.reshape(tape_fields, spp, max_depth,
                            grid * tile_px)[..., :num_pixels],
            0, -1)
        return fb, idx, tex

    fb = out[:, :num_pixels]  # [3, N]
    return jnp.transpose(fb).reshape(height, width, 3)
