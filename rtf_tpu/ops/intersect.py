"""Batched ray-primitive intersection kernels.

Each function maps a wavefront of rays [N] against one primitive in its
LOCAL space and returns SoA hit fields.  Semantics follow the reference
exactly (incl. its epsilon choices):

* sphere: unit sphere quadratic with zero=1e-3, front/back cases
  (objects.h:24-70)
* plane: unit square z=0 with zero=1e-3 (objects.h:84-111)
* triangle: dominant-axis barycentric with bias=1e-3, |dz|>=1e-7
  (objects.h:226-268)
* box: slab test (Final/scene.cpp:11-65), made watertight for
  axis-parallel rays (the reference skips zero-direction axes, which is
  only ever conservative for a BVH).

All math is float32 and fully vectorized — no per-ray control flow.
"""
from __future__ import annotations

import jax.numpy as jnp

from rtf_tpu.core.math import BIGFLOAT, cross, dot, normalize

ZERO = 1e-3  # the reference's `zero`/`bias` epsilon for sphere/plane/triangle


def intersect_sphere(o: jnp.ndarray, d: jnp.ndarray, t_prev: jnp.ndarray,
                     zero: float = ZERO, textbook: bool = False,
                     minroot: bool = False):
    """Unit sphere at origin. Returns (t, front, valid).

    Mirrors Sphere::IntersectRay (objects.h:24-70): the discriminant is
    compared against `zero`, a back hit is reported only when
    t2 < zero < t1, and the new hit must beat `t_prev`.
    """
    a = dot(d, d)
    if textbook:
        # Reference-exact op order (fidelity mode): b*b - 4ac exactly as
        # Sphere::IntersectRay writes it.  Catastrophically cancels for
        # far/scaled spheres — which is precisely why deterministic
        # oracle comparisons need it: at `disc >= zero` the stable form
        # below and this one legitimately disagree on grazing-tangent
        # rays, flipping isolated silhouette/shadow pixels (prj3c).
        c = dot(o, o) - 1.0
        b = 2.0 * dot(o, d)
        disc = b * b - 4.0 * a * c
        s = jnp.sqrt(jnp.maximum(disc, 0.0))
        t1 = (-b + s) / (2.0 * a)
        t2 = (-b - s) / (2.0 * a)
    else:
        # Re-origined stable quadratic (production): move the origin to
        # the point of closest approach m = o + tc*d (the linear term
        # vanishes there), which avoids the catastrophic cancellation of
        # the textbook (-b±sqrt)/2a form for origins far from the unit
        # sphere (the reference's walls are spheres scaled by 32 viewed
        # from 60 units away).  disc here equals the reference's b^2-4ac
        # exactly in real arithmetic.
        half_b = dot(o, d)
        tc = -half_b / a
        m = o + tc[..., None] * d
        disc = 4.0 * a * (1.0 - dot(m, m))
        s = jnp.sqrt(jnp.maximum(disc, 0.0)) / (2.0 * a)
        t1 = tc + s
        t2 = tc - s
    # `zero` is era-dependent: Proj3/4 compare against literal 0
    # (insqrt>=0, z<0 reject — Proj3 objects.h/main.cpp), Proj5+ use
    # 0.001f; a 1e-3 floor on the discriminant visibly clips ~1 px of
    # silhouette at 800x600 (prj3c was losing the spheres' top rows)
    has = disc >= zero
    if minroot:
        # Proj3-era rule: z = min(t1,t2), rejected when z < 0 — the
        # sphere NEVER reports back hits (Proj3 main.cpp
        # Sphere::IntersectRay).  Without this, a shadow ray leaving a
        # sphere's own surface registers the t1~1e-5 exit root as an
        # occluder (> the 1e-14 shadow bias) and the sphere
        # self-shadows everywhere the reference renders it lit.
        back = jnp.zeros_like(has)
        frontal = has & (t2 >= zero) & (t2 < t_prev)
    else:
        back = has & (t1 > zero) & (t2 < zero) & (t1 < t_prev)
        frontal = has & (t1 > zero) & (t2 > zero) & (t2 < t_prev)
    t = jnp.where(frontal, t2, jnp.where(back, t1, BIGFLOAT))
    valid = frontal | back
    return t, frontal, valid


def sphere_attributes(o, d, t):
    """Normal & uvw at a sphere hit: N = p (normalized), spherical uv
    (objects.h:46-51)."""
    p = o + t[..., None] * d
    n = normalize(p)
    u = 0.5 - jnp.arctan2(p[..., 0], p[..., 1]) / (2.0 * jnp.pi)
    v = 0.5 + jnp.arcsin(jnp.clip(p[..., 2], -1.0, 1.0)) / jnp.pi
    uvw = jnp.stack([u, v, jnp.zeros_like(u)], axis=-1)
    return p, n, uvw


def intersect_plane(o: jnp.ndarray, d: jnp.ndarray, t_prev: jnp.ndarray):
    """Unit plane z=0, |x|<=1, |y|<=1. Returns (t, front, valid)."""
    dz = d[..., 2]
    safe_dz = jnp.where(dz == 0, 1e-30, dz)
    t = -(o[..., 2] / safe_dz)
    px = o[..., 0] + t * d[..., 0]
    py = o[..., 1] + t * d[..., 1]
    valid = (dz != 0) & (t >= ZERO) & (t < t_prev) & (t < BIGFLOAT)
    valid &= (px >= -1) & (px <= 1) & (py >= -1) & (py <= 1)
    front = dz <= 0.0
    return jnp.where(valid, t, BIGFLOAT), front, valid


def plane_attributes(o, d, t):
    p = o + t[..., None] * d
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], o.dtype), p.shape)
    u = (p[..., 0] + 1.0) * 0.5
    v = (p[..., 1] + 1.0) * 0.5
    uvw = jnp.stack([u, v, jnp.zeros_like(u)], axis=-1)
    return p, n, uvw


def intersect_triangle(o, d, a, b, c, t_prev):
    """Ray vs triangle(s); shapes broadcast over leading dims.

    Returns (t, front, bary_a, bary_b, valid).  Uses the same plane-test +
    dominant-axis projected-area barycentrics as TriObj::IntersectTriangle
    (objects.h:226-268).
    """
    n = cross(b - a, c - a)
    n = normalize(n)
    dz = dot(d, n)
    pz = dot(o - a, n)
    safe_dz = jnp.where(jnp.abs(dz) < 1e-7, 1e-7, dz)
    t = -pz / safe_dz
    p = o + t[..., None] * d

    # dominant axis of |n| -> project out; areas via 2D cross products.
    an = jnp.abs(n)
    axis = jnp.argmax(an, axis=-1)

    def area2(p0, p1, p2, axis):
        # signed double area of the triangle projected perpendicular to axis,
        # with the reference's sign conventions (TriangleArea, objects.h:146-157)
        e1 = p1 - p0
        e2 = p2 - p0
        ax = (e1[..., 1] * e2[..., 2] - e2[..., 1] * e1[..., 2])
        ay = (e1[..., 0] * e2[..., 2] - e2[..., 0] * e1[..., 2])
        az = (e1[..., 0] * e2[..., 1] - e2[..., 0] * e1[..., 1])
        return jnp.where(axis == 0, ax, jnp.where(axis == 1, ay, az))

    total = area2(a, b, c, axis)
    safe_total = jnp.where(total == 0, 1e-30, total)
    s = 1.0 / safe_total
    ba = area2(p, b, c, axis) * s
    bb = area2(p, c, a, axis) * s
    bc = 1.0 - ba - bb
    valid = (jnp.abs(dz) >= 1e-7) & (t > ZERO) & (t < t_prev) & (total != 0)
    valid &= (ba >= 0) & (bb >= 0) & (bc >= 0)
    front = dz <= 0.0
    return jnp.where(valid, t, BIGFLOAT), front, ba, bb, valid


def intersect_box(o, d, bmin, bmax, t_max):
    """Slab test (Box::IntersectRay, Final/scene.cpp:11-65). Returns bool.

    Accepts boxes behind the ray origin like the reference does NOT — we
    additionally require texit >= 0, which only prunes work, never hits.
    """
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-30, jnp.where(d < 0, -1e-30, 1e-30), d)
    t0 = (bmin - o) * inv
    t1 = (bmax - o) * inv
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    tenter = jnp.max(tn, axis=-1)
    texit = jnp.min(tf, axis=-1)
    inside = jnp.all((o >= bmin) & (o <= bmax), axis=-1)
    return inside | ((tenter <= texit) & (texit >= 0.0) & (tenter <= t_max))


def intersect_box_enter(o, d, bmin, bmax, t_max):
    """Like intersect_box but also returns tenter (for near-child ordering)."""
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-30, jnp.where(d < 0, -1e-30, 1e-30), d)
    t0 = (bmin - o) * inv
    t1 = (bmax - o) * inv
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    tenter = jnp.max(tn, axis=-1)
    texit = jnp.min(tf, axis=-1)
    inside = jnp.all((o >= bmin) & (o <= bmax), axis=-1)
    hit = inside | ((tenter <= texit) & (texit >= 0.0) & (tenter <= t_max))
    return hit, jnp.where(inside, 0.0, tenter)
