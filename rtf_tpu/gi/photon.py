"""Photon shooting: batched emission + Russian-roulette bouncing.

Wavefront reformulation of the reference's photon pass
(generatePhotonMap / PhotonTracing, Final/main.cpp:350-487, and
MtlBlinn::RandomPhotonBounce, materials.h:99-256):

* E photons are emitted at once from randomly-chosen non-ambient lights
  (50/50 between the first two in the reference, uniform here),
  direction = normalized uniform-cube sample — the reference's exact
  (corner-biased) distribution (PointLight::RandomPhoton,
  main.cpp:489-497);
* each bounce: trace the whole wavefront, STORE on diffuse surfaces
  ("photon surfaces": diffuse gray > 0, materials.h:97) for path
  segments >= 2 exactly like PhotonTracing (the light->first-hit
  segment never stores), then Russian-roulette select
  transmit/reflect/diffuse/absorb with probability proportional to
  channel luma and rescale power by 1/prob;
* the RR selection uses properly normalized cumulative probabilities.
  (The reference compares `random * total` against already-normalized
  probabilities — a scale mismatch that degenerates for total != 1; we
  implement the evident intent.)
* stored powers are scaled by 4*pi / numStored (main.cpp:396).

Storage into the fixed-capacity SoA photon buffer is a cumsum-scatter
(stream compaction) instead of the reference's mutex-free single-thread
append.  Caustic variant: store only after >= 2 specular segments
(CausticTracing, main.cpp:461-487).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rtf_tpu.core.math import (
    cross, dot, luma, normalize, offset_origin, reflect,
)
from rtf_tpu.ops.trace import resolve_surface, trace
from rtf_tpu.render.shade import sample_material


class PhotonMapData(NamedTuple):
    pos: jnp.ndarray     # [CAP,3] float32
    dir: jnp.ndarray     # [CAP,3] incoming photon direction
    power: jnp.ndarray   # [CAP,3] RGB power (already 4pi/N scaled)
    count: jnp.ndarray   # [] int32 number of valid photons


def _store(buf: PhotonMapData, pos, dirs, power, mask) -> PhotonMapData:
    """Append masked lanes into the buffer (prefix-sum scatter)."""
    cap = buf.pos.shape[0]
    idx = buf.count + jnp.cumsum(mask.astype(jnp.int32)) - 1
    ok = mask & (idx < cap)
    # out-of-bounds index + mode='drop' discards unmasked/overflow lanes
    tgt = jnp.where(ok, idx, cap)
    new_pos = buf.pos.at[tgt].set(pos, mode="drop")
    new_dir = buf.dir.at[tgt].set(dirs, mode="drop")
    new_pow = buf.power.at[tgt].set(power, mode="drop")
    new_count = buf.count + ok.sum().astype(jnp.int32)
    return PhotonMapData(new_pos, new_dir, new_pow, new_count)


def _random_photon_dirs(key, n):
    """Normalized uniform-cube directions (PointLight::RandomPhoton)."""
    cube = jax.random.uniform(key, (n, 3), minval=-1.0, maxval=1.0)
    return normalize(cube)


def _rr_bounce(scene, cfg, surf, mtl, d_in, key):
    """RandomPhotonBounce (materials.h:99-256): pick one of
    transmit/reflect/diffuse/absorb, return (new_dir, bxdf_over_prob,
    alive, is_specular)."""
    n = surf.p.shape[0]
    v = -d_in
    nrm = surf.n
    ior = jnp.maximum(mtl.ior, 1e-6)
    eta = jnp.where(surf.front, 1.0 / ior, ior)

    cos_i = dot(nrm, v)
    y = jnp.where((cos_i > 0.0)[:, None], nrm, -nrm)
    z = cross(v, y)
    x = normalize(cross(y, z))
    sin_i = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_i * cos_i))
    sin_o = jnp.clip(sin_i * eta, 0.0, 1.0)
    cos_o = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_o * sin_o))
    t_dir = -x * sin_o[:, None] - y * cos_o[:, None]
    r_dir = reflect(v, nrm)

    c0 = (eta - 1.0) ** 2 / (eta + 1.0) ** 2
    r_c = c0 + (1.0 - c0) * jnp.power(1.0 - jnp.abs(cos_i), 5.0)
    t_c = 1.0 - r_c
    tot = (eta * sin_i) > cfg.total_reflection_threshold

    t_k = mtl.refraction
    r_k = mtl.reflection
    sample_refr = jnp.where(tot[:, None], 0.0, t_k * t_c[:, None])
    sample_refl = jnp.where(tot[:, None], r_k + t_k, r_k + t_k * r_c[:, None])

    p_diff = luma(mtl.kd)
    p_refr = luma(sample_refr)
    p_refl = luma(sample_refl)
    p_abs = luma(mtl.absorption)
    total = p_diff + p_refr + p_refl + p_abs
    total = jnp.maximum(total, 1e-12)

    k1, k2, k3 = jax.random.split(key, 3)
    u = jax.random.uniform(k1, (n,)) * total
    sel_refr = u <= p_refr
    sel_refl = ~sel_refr & (u <= p_refr + p_refl)
    sel_diff = ~sel_refr & ~sel_refl & (u <= p_refr + p_refl + p_diff)
    # else absorb

    # diffuse: uniform-angle hemisphere (theta ~ U(0, pi/2), materials.h:227)
    v1 = jnp.array([1.0, 0.0, 0.0], jnp.float32)
    v2 = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    use1 = (dot(nrm, jnp.broadcast_to(v1, nrm.shape)) < 0.4)[:, None]
    nt = normalize(jnp.where(use1, cross(nrm, v1), cross(nrm, v2)))
    nb = cross(nrm, nt)
    theta = jax.random.uniform(k2, (n,)) * (jnp.pi / 2.0)
    phi = jax.random.uniform(k3, (n,)) * (2.0 * jnp.pi)
    st = jnp.sin(theta)
    d_diff = normalize(nt * (jnp.cos(phi) * st)[:, None]
                       + nb * (jnp.sin(phi) * st)[:, None]
                       + nrm * jnp.cos(theta)[:, None])
    h = normalize(v + d_diff)
    cos_nh = jnp.maximum(0.0, dot(nrm, h))
    bxdf_diff = mtl.kd + mtl.ks * jnp.power(cos_nh, mtl.gloss)[:, None]

    new_dir = jnp.where(sel_refr[:, None], normalize(t_dir),
              jnp.where(sel_refl[:, None], normalize(r_dir), d_diff))
    bxdf = jnp.where(sel_refr[:, None], sample_refr,
           jnp.where(sel_refl[:, None], sample_refl, bxdf_diff))
    prob = jnp.where(sel_refr, p_refr,
           jnp.where(sel_refl, p_refl, p_diff)) / total
    scale = jnp.maximum(prob, 1e-12)

    alive = sel_refr | sel_refl | (sel_diff & surf.front)
    is_spec = sel_refr | sel_refl
    factor = bxdf / scale[:, None]
    # Beer absorption through the medium we just crossed (materials.h:253)
    atten = jnp.exp(-mtl.absorption * surf.t[:, None])
    factor = factor * jnp.where(surf.front[:, None], 1.0, atten)
    return new_dir, factor, alive, is_spec


def shoot_photons(scene, cfg, n_emit: int, capacity: int, key,
                  caustic_only: bool = False, chunk: int = 131072):
    """Emit n_emit photons and bounce up to cfg.photon_bounces times.

    Returns a PhotonMapData with powers scaled by 4*pi / count.
    caustic_only: store only photons whose path crossed >= 2 specular
    segments before landing on a diffuse surface (Proj13 CausticTracing).

    Jit-compiled per EMISSION CHUNK: one program per `chunk` emissions,
    host loop over chunks, the store buffer carried across dispatches.
    A single 1M-emission program OOMs the chip — XLA materializes
    [N,1] keepdims temporaries with T(8,128) layout padding (128x,
    488 MB each) inside the bounce loop (observed round 4); at 128k
    lanes the same temps are 64 MB and the pass fits comfortably.
    (The eager version is far worse again: per-op tunnel latency
    hundreds of times per bounce.)
    """
    n_emit, capacity = int(n_emit), int(capacity)
    buf = PhotonMapData(
        pos=jnp.zeros((capacity, 3), jnp.float32),
        dir=jnp.zeros((capacity, 3), jnp.float32),
        power=jnp.zeros((capacity, 3), jnp.float32),
        count=jnp.zeros((), jnp.int32))
    done = 0
    i = 0
    while done < n_emit:
        nc = min(int(chunk), n_emit - done)
        buf = _shoot_photons_batch(scene, cfg, nc, capacity,
                                   jax.random.fold_in(key, i),
                                   bool(caustic_only), buf)
        done += nc
        i += 1
    # ScalePhotonPowers(4 pi / numStored) (main.cpp:396)
    return _scale_powers(buf)


@jax.jit
def _scale_powers(buf):
    cnt = jnp.maximum(buf.count, 1).astype(jnp.float32)
    return buf._replace(power=buf.power * (4.0 * jnp.pi / cnt))


import functools


@functools.partial(jax.jit, static_argnames=("cfg", "n_emit", "capacity",
                                             "caustic_only"))
def _shoot_photons_batch(scene, cfg, n_emit: int, capacity: int, key,
                         caustic_only: bool, buf: "PhotonMapData"):
    photon_lights = [i for i, k in enumerate(scene.light_kinds)
                     if k != "ambient"]
    assert photon_lights, "no photon-emitting lights in scene"
    nl = len(photon_lights)
    light_idx = jnp.asarray(photon_lights, jnp.int32)

    k_pick, k_dir, k_loop = jax.random.split(key, 3)
    pick = light_idx[jax.random.randint(k_pick, (n_emit,), 0, nl)]
    o = scene.lights.position[pick]
    d = _random_photon_dirs(k_dir, n_emit)
    power = scene.lights.intensity[pick]
    alive = jnp.ones((n_emit,), bool)
    spec_count = jnp.zeros((n_emit,), jnp.int32)

    bounces = cfg.caustic_bounces if caustic_only else cfg.photon_bounces
    for b in range(bounces + 1):
        kb = jax.random.fold_in(k_loop, b)
        hit = trace(scene, o, d)
        surf = resolve_surface(scene, o, d, hit)
        live_hit = alive & surf.valid
        mtl = sample_material(scene, surf.mtl, surf.uvw)
        is_photon_surface = luma(mtl.kd) > 0   # IsPhotonSurface (materials.h:97)

        if b == 0:
            if caustic_only:
                # caustic pass continues off a specular first hit, counting
                # it (CausticTracing hitspec, Proj13 main.cpp:416-423)
                spec_count = spec_count + (~is_photon_surface).astype(jnp.int32)
            else:
                # global map abandons paths whose FIRST hit is specular
                # (main.cpp:378-393)
                alive = alive & is_photon_surface
                live_hit = live_hit & is_photon_surface
        else:  # light->first-hit segment never stores (main.cpp:382-390)
            store = live_hit & is_photon_surface
            if caustic_only:
                # hitspec counts SPECULAR SURFACES crossed (Proj13
                # main.cpp:430-457): diffuse hit stores iff hitspec > 1,
                # non-diffuse hit increments
                store = store & (spec_count >= 2)
                spec_count = spec_count + (live_hit & ~is_photon_surface).astype(jnp.int32)
            buf = _store(buf, surf.p, d, power, store)

        if b == bounces:
            break
        new_dir, factor, rr_alive, _ = _rr_bounce(
            scene, cfg, surf, mtl, d, kb)
        power = power * factor
        alive = live_hit & rr_alive
        o = offset_origin(surf.p, surf.n, new_dir)
        d = new_dir

    return buf
