"""Ray-planar-primitive intersection, vectorized over `[R]` rays x `[P]` planes.

One branchless kernel covers all three interior types (quad / ellipse /
triangle) of reference `hit_plane` (include/plane.h:57-96): the type enum
becomes a per-primitive code selecting one of three interior masks.
Differentiable w.r.t. base/u/v through the plane equation and the
barycentric coordinates.
"""

from __future__ import annotations

import jax.numpy as jnp

from tracer.core import vec
from tracer.scene.types import ELLIPSE, K_INFINITY, QUAD

DENOM_EPS = 1e-8  # reference plane.h:59


def plane_alpha_beta(origin, direction, base, normal, d, w, u, v):
    """Plane-equation root and planar (alpha, beta) coordinates.

    reference plane.h:58-70: root = (D - n.orig) / (n.dir);
    alpha = w . cross(p - base, v); beta = w . cross(u, p - base).
    Shapes: rays `[R, 3]`, plane fields `[..., 3]` broadcastable against rays.
    Returns (denom, root, alpha, beta).
    """
    denom = jnp.sum(normal * direction, axis=-1)
    safe_denom = jnp.where(jnp.abs(denom) < DENOM_EPS, 1.0, denom)
    root = (d - jnp.sum(normal * origin, axis=-1)) / safe_denom
    point = origin + root[..., None] * direction
    phv = point - base
    alpha = jnp.sum(w * vec.cross(phv, v), axis=-1)
    beta = jnp.sum(w * vec.cross(u, phv), axis=-1)
    return denom, root, alpha, beta


def interior_mask(ptype, alpha, beta):
    """Interior predicate per plane type.

    reference plane.h:30-55: QUAD closed [0,1]^2; ELLIPSE
    (a-.5)^2+(b-.5)^2 <= .25; TRIANGLE a>=0, b>=0, a+b<=1.
    """
    in_quad = (alpha >= 0.0) & (alpha <= 1.0) & (beta >= 0.0) & (beta <= 1.0)
    in_ellipse = (alpha - 0.5) ** 2 + (beta - 0.5) ** 2 <= 0.25
    in_tri = (alpha >= 0.0) & (beta >= 0.0) & (alpha + beta <= 1.0)
    return jnp.where(
        ptype == QUAD,
        in_quad,
        jnp.where(ptype == ELLIPSE, in_ellipse, in_tri),
    )


def plane_ts(origin, direction, planes, t_min, t_max):
    """Valid hit parameter per (ray, plane); +inf where miss.

    reference plane.h:57-96 semantics: reject near-parallel rays
    (|denom| < 1e-8), root in the closed [t_min, t_max] interval, then the
    type-specific interior test.
    """
    denom, root, alpha, beta = plane_alpha_beta(
        origin[:, None, :],
        direction[:, None, :],
        planes.base[None],
        planes.normal[None],
        planes.d[None],
        planes.w[None],
        planes.u[None],
        planes.v[None],
    )
    ok = (
        (jnp.abs(denom) >= DENOM_EPS)
        & (root >= t_min)
        & (root <= t_max)
        & interior_mask(planes.ptype[None], alpha, beta)
    )
    return jnp.where(ok, root, K_INFINITY)


def plane_t_gathered(origin, direction, ptype, base, u, v, normal, d, w, t_min, t_max):
    """Valid hit parameter for per-ray gathered planes (one plane per ray).

    Same semantics as plane_ts but with every plane field already indexed
    to `[R, ...]` (used by BVH leaf tests). Returns `[R]` t, +inf on miss.
    """
    denom, root, alpha, beta = plane_alpha_beta(origin, direction, base, normal, d, w, u, v)
    ok = (
        (jnp.abs(denom) >= DENOM_EPS)
        & (root >= t_min)
        & (root <= t_max)
        & interior_mask(ptype, alpha, beta)
    )
    return jnp.where(ok, root, K_INFINITY)


def plane_record(origin, direction, t, base, u, v, normal, d, w):
    """HitRecord fields for rays whose winning primitive is a plane.

    reference plane.h:84-94: point, face-flipped normal, and the planar
    (alpha, beta) as texture UVs. All inputs per-ray (winner gathered).
    """
    point = origin + t[..., None] * direction
    phv = point - base
    alpha = jnp.sum(w * vec.cross(phv, v), axis=-1)
    beta = jnp.sum(w * vec.cross(u, phv), axis=-1)
    front_face = vec.dot(direction, normal) < 0.0
    out_normal = jnp.where(front_face[..., None], normal, -normal)
    return point, out_normal, front_face, alpha, beta
