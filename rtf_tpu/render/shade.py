"""Shading: Blinn-Phong direct lighting + Fresnel reflect/refract split.

Wavefront re-formulation of MtlBlinn::Shade (Final/main.cpp:516-707):
* direct term per light with front-face gating and the Final build's
  1/numLights averaging (main.cpp:544-572),
* soft shadows by disk sampling of the spherical point light with the
  4 -> 16 adaptive escalation (lights.h:67-130),
* Schlick Fresnel + total-internal-reflection split producing the
  reflect/refract child weights rK/tK (main.cpp:577-610).

All functions are batched over the wavefront; there is no recursion here —
child rays are returned as data for the integrator's queue.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rtf_tpu.core.math import (
    BIGFLOAT, cross, dot, length_sq, normalize, offset_origin, reflect,
)
from rtf_tpu.ops.texture import sample_textured_color
from rtf_tpu.ops.trace import trace_shadow


class MtlSample(NamedTuple):
    """Material attributes sampled at the hit (textures resolved)."""
    kd: jnp.ndarray      # [N,3] diffuse (textured)
    ks: jnp.ndarray      # [N,3] specular (textured)
    gloss: jnp.ndarray   # [N]
    emission: jnp.ndarray   # [N,3]
    reflection: jnp.ndarray  # [N,3] plain colors (Shade uses GetColor)
    refraction: jnp.ndarray  # [N,3]
    absorption: jnp.ndarray  # [N,3]
    ior: jnp.ndarray     # [N]
    refl_gloss: jnp.ndarray  # [N] glossy reflection radius (Proj10+)
    refr_gloss: jnp.ndarray  # [N]


def sample_material(scene, mtl_id: jnp.ndarray, uvw: jnp.ndarray,
                    duv=None, n_filter: int = 32) -> MtlSample:
    """Per-lane material attributes.  Table rows ride unrolled selects
    (no gathers — see ops.texture._sel_rows) and texture sampling is
    SKIPPED statically for channels no material maps (scene.tm_channels),
    so untextured scenes never touch the atlas.

    duv=(duv0, duv1) [N,2] enables elliptic footprint filtering of every
    textured channel, the analog of passing hInfo.duvw into
    TexturedColor::Sample (Final/main.cpp:531-532, scene.h:331-349)."""
    from rtf_tpu.ops.texture import _sel_rows
    m = scene.materials

    def chan(color_tbl, tm_tbl, name):
        col = _sel_rows(color_tbl, mtl_id)
        if name not in scene.tm_channels:
            return col
        return sample_textured_color(scene, col, _sel_rows(tm_tbl, mtl_id),
                                     uvw, duv=duv, n_filter=n_filter)

    return MtlSample(
        kd=chan(m.diffuse, m.diffuse_tm, "diffuse"),
        ks=chan(m.specular, m.specular_tm, "specular"),
        gloss=_sel_rows(m.glossiness, mtl_id),
        emission=_sel_rows(m.emission, mtl_id),
        reflection=_sel_rows(m.reflection, mtl_id),
        refraction=_sel_rows(m.refraction, mtl_id),
        absorption=_sel_rows(m.absorption, mtl_id),
        ior=_sel_rows(m.ior, mtl_id),
        refl_gloss=_sel_rows(m.refl_gloss, mtl_id),
        refr_gloss=_sel_rows(m.refr_gloss, mtl_id),
    )


def _point_light_basis(dirv: jnp.ndarray):
    """Disk basis for the spherical light (lights.h:74-88): v1 from x or y
    axis by the reference's 0.8 dot test, v2 = v1 x dir."""
    x_axis = jnp.array([1.0, 0.0, 0.0], dirv.dtype)
    y_axis = jnp.array([0.0, 1.0, 0.0], dirv.dtype)
    use_y = (dot(dirv, jnp.broadcast_to(x_axis, dirv.shape)) > 0.8)[..., None]
    v1 = jnp.where(use_y, cross(y_axis, dirv), cross(x_axis, dirv))
    v2 = cross(v1, dirv)
    return normalize(v1), normalize(v2)


def _point_shadow(scene, p, n, lpos, size, nsamp, key, active):
    """Mean shadow over `nsamp` disk samples of the light sphere
    (lights.h:92-107), correct disk offsets in the (v1,v2) basis.
    Shadow rays use unnormalized dir = target - p with t_max = 1."""
    # ref_exact: the reference shoots Shadow(Ray(p, pos-p), 1) from the
    # hit point itself (bias 1e-14) — the normal-offset origin shifts
    # the terminator by ~eps/tan(grazing angle), visibly in 1-spp
    # oracle comparisons (prj3c)
    _off = (lambda p, n, d: p) if getattr(scene, "ref_exact", False) \
        else offset_origin
    if nsamp <= 1 or not scene.any_soft_light:
        d = lpos - p
        return trace_shadow(scene, _off(p, n, d), d, 1.0)
    dirv = lpos - p
    v1, v2 = _point_light_basis(dirv)
    acc = jnp.zeros(p.shape[0], p.dtype)
    keys = jax.random.split(key, nsamp)
    for i in range(nsamp):
        k1, k2 = jax.random.split(keys[i])
        r = jnp.sqrt(jax.random.uniform(k1, (p.shape[0],))) * size
        ang = jax.random.uniform(k2, (p.shape[0],)) * (2.0 * jnp.pi)
        off = v1 * (r * jnp.cos(ang))[:, None] + v2 * (r * jnp.sin(ang))[:, None]
        d = lpos + off - p
        acc = acc + trace_shadow(scene, _off(p, n, d), d, 1.0)
    return acc / float(nsamp)


def direct_lighting(scene, cfg, surf, mtl: MtlSample, view: jnp.ndarray,
                    key) -> jnp.ndarray:
    """Blinn-Phong sum over lights (main.cpp:544-572). `view` = -ray.dir,
    normalized. Only front hits receive light; ambient uses kd."""
    n_rays = surf.p.shape[0]
    color = jnp.zeros((n_rays, 3), surf.p.dtype)
    nlights = max(len(scene.light_kinds), 1)
    coef = 1.0 / nlights if cfg.light_average else 1.0
    front = surf.front

    for li, kind in enumerate(scene.light_kinds):
        lkey = jax.random.fold_in(key, li)
        intensity = scene.lights.intensity[li]
        if kind == "ambient":
            contrib = mtl.kd * intensity[None, :]
            color += jnp.where(front[:, None], contrib, 0.0)
            continue

        if kind == "direct":
            ldir = scene.lights.direction[li]
            sdir = jnp.broadcast_to(-ldir, surf.p.shape)
            shadow = trace_shadow(
                scene,
                surf.p if getattr(scene, "ref_exact", False)
                else offset_origin(surf.p, surf.n, sdir), sdir, BIGFLOAT)
            illum = shadow[:, None] * intensity[None, :]
            l_vec = jnp.broadcast_to(-ldir, surf.p.shape)
        else:  # point
            lpos = scene.lights.position[li]
            shadow = _point_shadow(scene, surf.p, surf.n, lpos,
                                   scene.lights.size[li],
                                   cfg.shadow_min, lkey, front)
            if cfg.shadow_min < cfg.shadow_max and scene.any_soft_light:
                # adaptive escalation: penumbra lanes re-sample at max rate
                # (lights.h:110-129)
                penumbra = (shadow > 0.0) & (shadow < 1.0)
                shadow16 = _point_shadow(scene, surf.p, surf.n, lpos,
                                         scene.lights.size[li],
                                         cfg.shadow_max,
                                         jax.random.fold_in(lkey, 7), penumbra)
                shadow = jnp.where(penumbra, shadow16, shadow)
            illum = shadow[:, None] * intensity[None, :]
            if cfg.inverse_square:
                illum = illum / jnp.maximum(length_sq(surf.p - lpos), 1e-30)[:, None]
            l_vec = normalize(lpos - surf.p)

        illum = illum * coef
        h = normalize(l_vec + view)
        cos_nl = jnp.maximum(0.0, dot(surf.n, l_vec))
        cos_nh = jnp.maximum(0.0, dot(surf.n, h))
        spec = jnp.power(cos_nh, mtl.gloss)
        contrib = (mtl.kd + mtl.ks * spec[:, None]) * illum * cos_nl[:, None]
        color += jnp.where(front[:, None], contrib, 0.0)
    return color


class FresnelSplit(NamedTuple):
    r_dir: jnp.ndarray   # [N,3] reflection direction (normalized)
    t_dir: jnp.ndarray   # [N,3] refraction direction (normalized)
    r_k: jnp.ndarray     # [N,3] reflection weight rK
    t_k: jnp.ndarray     # [N,3] refraction weight tK


def _perturb_normal(n, gloss, key):
    """Glossy normal perturbation (Proj13 main.cpp:633-647): offset N
    inside its tangent disk by radius sqrt(U)*glossiness at a uniform
    angle, then renormalize.  (The reference builds the tangent from
    N x x_axis without normalizing — we normalize, and fall back to the
    z axis when N is nearly parallel to x, which the reference leaves
    degenerate.)"""
    m = n.shape[0]
    par = (jnp.abs(n[:, 0]) > 0.9)[:, None]
    axis = jnp.where(par, jnp.array([0.0, 0.0, 1.0]),
                     jnp.array([1.0, 0.0, 0.0]))
    tx = normalize(cross(n, axis))
    ty = cross(n, tx)
    k1, k2 = jax.random.split(key)
    r = jnp.sqrt(jax.random.uniform(k1, (m,))) * gloss
    th = jax.random.uniform(k2, (m,)) * (2.0 * jnp.pi)
    pn = (n + tx * (r * jnp.cos(th))[:, None]
          + ty * (r * jnp.sin(th))[:, None])
    return normalize(pn)


def fresnel_split(cfg, surf, mtl: MtlSample, view: jnp.ndarray,
                  key=None, glossy: bool = False) -> FresnelSplit:
    """Schlick + TIR split (main.cpp:577-610).

    glossy=True adds the Proj10+ glossy reflection/refraction normal
    perturbation (main.cpp:633-659): the Fresnel COEFFICIENTS use the
    true normal (as the reference computes them before perturbing), the
    child ray DIRECTIONS use independently perturbed normals."""
    n = surf.n
    ior = jnp.maximum(mtl.ior, 1e-6)
    eta = jnp.where(surf.front, 1.0 / ior, ior)   # ein/eout

    cos_i = dot(n, view)

    n_r = n_t = n
    if glossy and key is not None:
        kr, kt = jax.random.split(key)
        n_r = jnp.where((mtl.refl_gloss > 0)[:, None],
                        _perturb_normal(n, mtl.refl_gloss, kr), n)
        n_t = jnp.where((mtl.refr_gloss > 0)[:, None],
                        _perturb_normal(n, mtl.refr_gloss, kt), n)

    cos_t = dot(n_t, view)
    y = jnp.where((cos_t > 0.0)[:, None], n_t, -n_t)
    z = cross(view, y)
    x = normalize(cross(y, z))

    sin_i = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_i * cos_i))
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    sin_o = jnp.clip(sin_t * eta, 0.0, 1.0)
    cos_o = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_o * sin_o))

    t_dir = -x * sin_o[:, None] - y * cos_o[:, None]
    r_dir = reflect(view, n_r)

    c0 = (eta - 1.0) ** 2 / (eta + 1.0) ** 2
    r_c = c0 + (1.0 - c0) * jnp.power(1.0 - jnp.abs(cos_i), 5.0)
    t_c = 1.0 - r_c

    tot = (eta * sin_i) > cfg.total_reflection_threshold
    t_k = jnp.where(tot[:, None], 0.0, mtl.refraction * t_c[:, None])
    r_k = jnp.where(tot[:, None],
                    mtl.reflection + mtl.refraction,
                    mtl.reflection + mtl.refraction * r_c[:, None])
    return FresnelSplit(r_dir=normalize(r_dir), t_dir=normalize(t_dir),
                        r_k=r_k, t_k=t_k)
