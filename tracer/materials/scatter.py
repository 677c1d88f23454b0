"""Branchless material scatter: the 4-way switch of reference
`material_scatter` (include/materials.h:70-140) as masked selects.

Design (SURVEY.md §7 stage 3): every ray draws a FIXED set of random
numbers per bounce — 8 wang_hash advances — regardless of material type
or liveness, so the RNG stream is uniform across SIMD lanes and identical
between the pure-JAX oracle and the Pallas kernel. Each material path is
computed for all lanes with safe math and the winner is selected by the
per-ray material type code. Differentiable w.r.t. albedo, fuzz, ir,
absorption (and upstream normal/point) through the selected path.

Per-bounce draw budget (in order):
  u_choice  (1)  - METAL specular-vs-diffuse gate   (materials.h:83)
  hemi      (2)  - hemisphere direction             (materials.h:74, :89)
  ball      (3)  - in-unit-sphere fuzz offset       (materials.h:86)
  u_refl    (1)  - DIELECTRIC reflectance gate      (materials.h:109)
  u_rr      (1)  - DIELECTRIC Russian roulette      (materials.h:124)
"""

from __future__ import annotations

import jax.numpy as jnp

from tracer.core import rng, vec
from tracer.scene.types import DIELECTRIC, LAMBERTIAN, METAL

METAL_SPECULAR_P = 0.8  # materials.h:82 (p_metal)
DIELECTRIC_OFFSET = 1e-4  # materials.h:127


def reflectance(cosine, ref_idx):
    """Schlick approximation (reference materials.h:64-68)."""
    r0 = (1.0 - ref_idx) / (1.0 + ref_idx)
    r0 = r0 * r0
    return r0 + (1.0 - r0) * (1.0 - cosine) ** 5


def scatter(
    ray_origin,  # [R, 3] incoming ray origin (for dielectric distance)
    ray_dir,  # [R, 3] incoming ray direction (unnormalized)
    point,  # [R, 3] hit point
    normal,  # [R, 3] face-oriented unit normal
    front_face,  # [R] bool
    mtype,  # [R] i32 material type
    fuzz,  # [R] f32
    ir,  # [R] f32
    absorption,  # [R, 3] f32
    albedo,  # [R, 3] f32 (already texture-modulated)
    seed,  # [R] u32
):
    """One scatter event for a batch of rays.

    Returns (seed, new_origin, new_dir, attenuation, scatter_ok).
    `scatter_ok` False kills the path (DIFFUSE_LIGHT, metal below-horizon,
    dielectric Russian roulette) exactly like the reference's bool return.
    """
    # --- fixed RNG draws (8 advances) ------------------------------------
    seed, u_choice = rng.random_float(seed)
    seed, hemi = rng.random_in_hemisphere(normal, seed)
    seed, ball = rng.random_in_unit_sphere(seed)
    seed, u_refl = rng.random_float(seed)
    seed, u_rr = rng.random_float(seed)

    unit_dir = vec.unit_vector(ray_dir, eps=1e-30)

    # --- LAMBERTIAN (materials.h:73-79) ----------------------------------
    # hemisphere scatter; degenerate (near-zero) direction -> normal.
    lam_dir = jnp.where(vec.near_zero(hemi)[..., None], normal, hemi)

    # --- METAL (materials.h:81-95) ----------------------------------------
    # 0.8 specular reflect + fuzz, else lambertian-style diffuse.
    spec = u_choice < METAL_SPECULAR_P
    refl_dir = vec.reflect(unit_dir, normal) + fuzz[..., None] * ball
    metal_dir = jnp.where(spec[..., None], refl_dir, lam_dir)
    metal_ok = jnp.where(spec, vec.dot(refl_dir, normal) > 0.0, True)

    # --- DIELECTRIC (materials.h:97-133) ----------------------------------
    ratio = jnp.where(front_face, 1.0 / ir, ir)
    cos_theta = jnp.minimum(vec.dot(-unit_dir, normal), 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    cannot_refract = ratio * sin_theta > 1.0
    choose_reflect = cannot_refract | (reflectance(cos_theta, ratio) > u_refl)
    die_dir = jnp.where(
        choose_reflect[..., None],
        vec.reflect(unit_dir, normal),
        vec.refract(unit_dir, normal, ratio),
    )
    # Beer-Lambert absorption on back-face exit (materials.h:114-121).
    distance = vec.length(point - ray_origin)
    transmission = jnp.exp(-absorption * distance[..., None])
    die_att = jnp.where(front_face[..., None], 1.0, transmission)
    # Russian roulette on the max channel (materials.h:123-125).
    p_rr = jnp.max(die_att, axis=-1)
    die_ok = u_rr <= p_rr
    die_att = die_att / jnp.maximum(p_rr, 1e-30)[..., None]
    # Spawn origin offset along the normal toward the outgoing side
    # (materials.h:127-128).
    side = jnp.where(vec.dot(die_dir, normal) > 0.0, 1.0, -1.0)
    die_origin = point + normal * (DIELECTRIC_OFFSET * side)[..., None]

    # --- select by material type -----------------------------------------
    is_lam = mtype == LAMBERTIAN
    is_metal = mtype == METAL
    is_die = mtype == DIELECTRIC

    new_dir = jnp.where(
        is_lam[..., None],
        lam_dir,
        jnp.where(is_metal[..., None], metal_dir, die_dir),
    )
    new_origin = jnp.where(is_die[..., None], die_origin, point)
    attenuation = jnp.where(is_die[..., None], die_att, albedo)
    ok = jnp.where(
        is_lam,
        True,
        jnp.where(is_metal, metal_ok, jnp.where(is_die, die_ok, False)),
    )
    # DIFFUSE_LIGHT (materials.h:135-137): ok already False via the chain.
    return seed, new_origin, new_dir, attenuation, ok


def scatter_reference(
    ray_origin, ray_dir, point, normal, front_face,
    mtype, fuzz, ir, absorption, albedo, seed,
):
    """Reference-stream scatter: per-lane wang_hash streams advance
    EXACTLY like the reference binary (materials.h:70-140), including the
    rejection-loop samplers (random_utils.h:25-32) and conditional draw
    consumption:

      LAMBERTIAN      hemisphere rejection draws only
      METAL           1 gate draw, then ball-rejection (specular) or
                      hemisphere-rejection (diffuse)
      DIELECTRIC      reflectance draw only when refraction is possible
                      (the || short-circuit at materials.h:109), then the
                      Russian-roulette draw
      DIFFUSE_LIGHT   no draws

    Every branch runs for every lane (SIMD), each threading its own seed
    chain from the same input state; the surviving branch's seed is
    selected per lane. Costlier than `scatter` (two rejection samplers) —
    this is the bit-parity mode, not the fast path.
    """
    unit_dir = vec.unit_vector(ray_dir, eps=1e-30)

    # --- LAMBERTIAN chain (materials.h:73-79) -----------------------------
    seed_lam, hemi_lam = rng.random_in_hemisphere_ref(normal, seed)
    lam_dir = jnp.where(vec.near_zero(hemi_lam)[..., None], normal, hemi_lam)

    # --- METAL chain (materials.h:81-95) ----------------------------------
    seed_gate, u_choice = rng.random_float(seed)
    spec = u_choice < METAL_SPECULAR_P
    seed_ball, ball = rng.random_in_unit_sphere_rejection(seed_gate)
    seed_mhemi, hemi_m = rng.random_in_hemisphere_ref(normal, seed_gate)
    refl_dir = vec.reflect(unit_dir, normal) + fuzz[..., None] * ball
    met_diff = jnp.where(vec.near_zero(hemi_m)[..., None], normal, hemi_m)
    metal_dir = jnp.where(spec[..., None], refl_dir, met_diff)
    metal_ok = jnp.where(spec, vec.dot(refl_dir, normal) > 0.0, True)
    seed_metal = jnp.where(spec, seed_ball, seed_mhemi)

    # --- DIELECTRIC chain (materials.h:97-133) ----------------------------
    ratio = jnp.where(front_face, 1.0 / ir, ir)
    cos_theta = jnp.minimum(vec.dot(-unit_dir, normal), 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    cannot_refract = ratio * sin_theta > 1.0
    seed_refl, u_refl = rng.random_float(seed)
    # short-circuit: the reflectance draw is consumed only when
    # refraction is possible (materials.h:109)
    seed_after_gate = jnp.where(cannot_refract, seed, seed_refl)
    choose_reflect = cannot_refract | (reflectance(cos_theta, ratio) > u_refl)
    die_dir = jnp.where(
        choose_reflect[..., None],
        vec.reflect(unit_dir, normal),
        vec.refract(unit_dir, normal, ratio),
    )
    distance = vec.length(point - ray_origin)
    transmission = jnp.exp(-absorption * distance[..., None])
    die_att = jnp.where(front_face[..., None], 1.0, transmission)
    p_rr = jnp.max(die_att, axis=-1)
    seed_die, u_rr = rng.random_float(seed_after_gate)
    die_ok = u_rr <= p_rr
    die_att = die_att / jnp.maximum(p_rr, 1e-30)[..., None]
    side = jnp.where(vec.dot(die_dir, normal) > 0.0, 1.0, -1.0)
    die_origin = point + normal * (DIELECTRIC_OFFSET * side)[..., None]

    # --- select by material type ------------------------------------------
    is_lam = mtype == LAMBERTIAN
    is_metal = mtype == METAL
    is_die = mtype == DIELECTRIC

    new_dir = jnp.where(
        is_lam[..., None], lam_dir,
        jnp.where(is_metal[..., None], metal_dir, die_dir),
    )
    new_origin = jnp.where(is_die[..., None], die_origin, point)
    attenuation = jnp.where(is_die[..., None], die_att, albedo)
    ok = jnp.where(
        is_lam, True,
        jnp.where(is_metal, metal_ok, jnp.where(is_die, die_ok, False)),
    )
    new_seed = jnp.where(
        is_lam, seed_lam,
        jnp.where(is_metal, seed_metal, jnp.where(is_die, seed_die, seed)),
    )
    return new_seed, new_origin, new_dir, attenuation, ok
