"""Host-side primitive clustering for the packet-culled megakernel.

TPU-native replacement for per-ray BVH traversal (SURVEY.md §7 hard
part (b)): per-lane stacks don't vectorize, but per-TILE decisions do.
Primitives are grouped into spatially coherent clusters of K (recursive
median split on centroids — the same split rule as the BVH builder,
bvh_builder.h:75-87, stopped at K-sized leaves). In the kernel, each
128-pixel tile slab-tests its rays against a cluster's AABB and skips
the whole cluster's intersection work with a *scalar* branch when no
ray can hit it — packet tracing, the SIMD-coherent cousin of bvh.h's
stack traversal.

Tables produced (prims permuted cluster-contiguous, each padded to K):
  proj_c  [C*3K, 8] per cluster: K rows of first-vectors (sphere center
          / plane normal), K rows of A = cross(v,w), K rows of B =
          cross(w,u)
  const_c [C*K, CROWS] per-prim scalars (cc_rr|D, baseA, baseB, ptype,
          kind; kind = -1 marks padding)
  join_c  [C*K, JROWS] winner-record table (transposed: cluster slices
          must be sublane-dim dynamic slices — Mosaic cannot slice the
          lane dim at K granularity)
  cboxes  [C, 8] cluster AABB lo3+pad, hi3+pad (scalar-read in SMEM)
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tracer.geometry import aabb as aabb_mod
from tracer.scene.types import Scene


def _median_split_clusters(centroids: np.ndarray, k: int) -> list:
    """Recursive largest-axis median split into index groups of <= k."""
    order = np.arange(len(centroids))

    def rec(idx):
        if len(idx) <= k:
            return [idx]
        c = centroids[idx]
        axis = int(np.argmax(c.max(0) - c.min(0)))
        mid = len(idx) // 2
        part = np.argpartition(c[:, axis], mid)
        return rec(idx[part[:mid]]) + rec(idx[part[mid:]])

    return rec(order)


def pack_clustered(scene: Scene, k: int = 16):
    """Build clustered kernel tables. Returns a dict of arrays + meta."""
    from tracer.pallas import megakernel as mk

    sph, pla = scene.spheres, scene.planes
    num_s, num_p = scene.num_spheres, scene.num_planes
    n = num_s + num_p
    assert n > 0

    # unified per-prim host arrays (spheres first, then planes)
    first = np.zeros((n, 3), np.float32)
    a_rows = np.zeros((n, 3), np.float32)
    b_rows = np.zeros((n, 3), np.float32)
    centroid = np.zeros((n, 3), np.float32)
    lo = np.zeros((n, 3), np.float32)
    hi = np.zeros((n, 3), np.float32)
    const = np.zeros((n, mk.CROWS), np.float32)
    const[:, mk.C_KIND] = -1.0

    if num_s:
        c = np.asarray(sph.center)
        r = np.asarray(sph.radius)
        first[:num_s] = c
        centroid[:num_s] = c
        slo, shi = aabb_mod.sphere_boxes(c, r)
        lo[:num_s], hi[:num_s] = slo, shi
        const[:num_s, mk.C_CCRR] = (c * c).sum(1) - r * r
        const[:num_s, mk.C_KIND] = 0.0
    if num_p:
        base = np.asarray(pla.base)
        u = np.asarray(pla.u)
        v = np.asarray(pla.v)
        normal = np.asarray(pla.normal)
        w = np.asarray(pla.w)
        av = np.cross(v, w)
        bv = np.cross(w, u)
        sl = slice(num_s, n)
        first[sl] = normal
        a_rows[sl] = av
        b_rows[sl] = bv
        centroid[sl] = base + (u + v) * 0.5
        plo, phi = aabb_mod.plane_boxes(base, u, v, np.asarray(pla.ptype))
        lo[sl], hi[sl] = plo, phi
        const[sl, mk.C_CCRR] = np.asarray(pla.d)
        const[sl, mk.C_BASEA] = (base * av).sum(1)
        const[sl, mk.C_BASEB] = (base * bv).sum(1)
        const[sl, mk.C_PTYPE] = np.asarray(pla.ptype).astype(np.float32)
        const[sl, mk.C_KIND] = 1.0

    # full join table via the brute packer (same column layout), then permute.
    # pack_scene returns stacked [hi; lo] rows — recombine to the original
    # f32 values (hi + lo) before permuting; we re-split after.
    _, _, join_stacked, *_ = mk.pack_scene(scene)
    join_stacked = np.asarray(join_stacked)
    join_full = (join_stacked[: mk.JROWS] + join_stacked[mk.JROWS :])[:, :n]  # [JROWS, n]

    groups = _median_split_clusters(centroid, k)
    c_count = len(groups)

    proj_c = np.zeros((c_count * 3 * k, 8), np.float32)
    const_c = np.zeros((c_count * k, mk.CROWS), np.float32)
    const_c[:, mk.C_KIND] = -1.0
    join_c = np.zeros((c_count * k, mk.JROWS), np.float32)
    join_c[:, mk.J_RAD] = 1.0  # div-safe padding
    join_c[:, mk.J_TEXID] = -1.0
    cboxes = np.zeros((c_count, 8), np.float32)

    for ci, idx in enumerate(groups):
        m = len(idx)
        base3 = ci * 3 * k
        proj_c[base3 : base3 + m, :3] = first[idx]
        proj_c[base3 + k : base3 + k + m, :3] = a_rows[idx]
        proj_c[base3 + 2 * k : base3 + 2 * k + m, :3] = b_rows[idx]
        const_c[ci * k : ci * k + m] = const[idx]
        join_c[ci * k : ci * k + m, :] = join_full[:, idx].T
        cboxes[ci, 0:3] = lo[idx].min(axis=0)
        cboxes[ci, 3:6] = hi[idx].max(axis=0)

    # stacked [hi; lo] layouts for the in-kernel bf16x3 matmuls:
    # proj rows doubled, join columns doubled
    ph, plo = mk._split_hi_lo(jnp.asarray(proj_c))
    jh, jlo = mk._split_hi_lo(jnp.asarray(join_c))
    return dict(
        proj=jnp.concatenate([ph, plo], axis=0),
        const=jnp.asarray(const_c),
        join=jnp.concatenate([jh, jlo], axis=1),
        cboxes=jnp.asarray(cboxes),
        num_clusters=c_count,
        k=k,
    )
