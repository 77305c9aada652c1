"""Wavefront integrator: iterative reflect/refract queue.

The reference's recursive MtlBlinn::Shade (Final/main.cpp:516-707) spawns
up to two child rays per hit (Fresnel-weighted reflection + refraction)
and recurses `bounceCount` deep.  Here the recursion becomes data:

* every live path is a lane in a fixed-capacity SoA queue,
* one bounce = trace the whole queue, splat `throughput x local shading`
  into the framebuffer via segment_sum, then emit child candidates,
* 2C candidates are compacted back to capacity C by throughput-priority
  top-k (stream compaction — the TPU replacement for call stacks).

Beer-Lambert absorption (main.cpp:620,632, Attenuation materials.h:60-66)
is deferred: each lane carries the spawning material's absorption and
applies it once its own hit distance is known, exactly reproducing
`rK * (h.front ? 1 : e^{-a z}) * Shade(...)`.

Environment-on-miss applies to refraction rays only; reflection misses
add nothing (quirk of main.cpp:613-638, preserved).  GI hooks:
  * 'hemisphere' / 'pathtrace': cosine-weighted hemisphere fan-out at the
    first hit (main.cpp:642-693), continued through the same queue;
  * 'photon': deep-bounce photon-map irradiance gather (main.cpp:694-705)
    — wired in rtf_tpu/gi.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from rtf_tpu.core.math import dot, luma, normalize, offset_origin
from rtf_tpu.ops.texture import sample_environment
from rtf_tpu.ops.trace import resolve_surface, trace
from rtf_tpu.render.shade import (
    direct_lighting, fresnel_split, sample_material,
)


RT_PRIMARY, RT_REFLECT, RT_REFRACT = 0, 1, 2


@struct.dataclass
class RayQueue:
    o: jnp.ndarray          # [C,3]
    d: jnp.ndarray          # [C,3] normalized
    tput: jnp.ndarray       # [C,3] accumulated throughput
    absorb: jnp.ndarray     # [C,3] spawning material's absorption
    pixel: jnp.ndarray      # [C] int32 framebuffer index
    rtype: jnp.ndarray      # [C] int32 RT_* (controls env-on-miss)
    alive: jnp.ndarray      # [C] bool

    @property
    def capacity(self):
        return self.o.shape[0]


def _empty_queue(c: int) -> RayQueue:
    z3 = jnp.zeros((c, 3), jnp.float32)
    return RayQueue(o=z3, d=z3.at[:, 2].set(1.0), tput=z3, absorb=z3,
                    pixel=jnp.zeros(c, jnp.int32),
                    rtype=jnp.zeros(c, jnp.int32),
                    alive=jnp.zeros(c, bool))


def _compact(cand: RayQueue, capacity: int) -> RayQueue:
    """Keep the top-`capacity` candidates by throughput priority."""
    pri = jnp.where(cand.alive, luma(cand.tput), -1.0)
    _, idx = jax.lax.top_k(pri, capacity)
    take = lambda a: a[idx]
    return RayQueue(o=take(cand.o), d=take(cand.d), tput=take(cand.tput),
                    absorb=take(cand.absorb), pixel=take(cand.pixel),
                    rtype=take(cand.rtype), alive=take(cand.alive))


def _concat_queues(a: RayQueue, b: RayQueue) -> RayQueue:
    cat = lambda x, y: jnp.concatenate([x, y], axis=0)
    return RayQueue(o=cat(a.o, b.o), d=cat(a.d, b.d), tput=cat(a.tput, b.tput),
                    absorb=cat(a.absorb, b.absorb),
                    pixel=cat(a.pixel, b.pixel),
                    rtype=cat(a.rtype, b.rtype),
                    alive=cat(a.alive, b.alive))


class ShadeResult(NamedTuple):
    radiance: jnp.ndarray    # [N,3] weighted contribution of these lanes
    children: RayQueue       # [2N] reflect+refract candidates
    hit_mask: jnp.ndarray    # [N] bool
    hit_t: jnp.ndarray       # [N]
    surf_p: jnp.ndarray      # [N,3] (GI hooks need the hit point)
    surf_n: jnp.ndarray      # [N,3]
    kd: jnp.ndarray          # [N,3]
    k_eff: jnp.ndarray       # [N,3] throughput after parent absorption


def shade_lanes(scene, cfg, o, d, tput, absorb, pixel, alive, rtype,
                key, gi_grid=None, caustic_grid=None) -> ShadeResult:
    """Trace + locally shade one wavefront; return radiance & children.

    gi_grid: photon grid for deep-bounce indirect light — the reference
    adds kd * EstimateIrradiance * max(0, N.(-meanDir)) at every Shade
    call below the first bounce (main.cpp:694-705)."""
    # dead lanes trace from a far sentinel so whole-dead ray blocks are
    # skipped by the mesh kernel's AABB culling (compaction keeps live
    # lanes contiguous, so dead lanes cluster into skippable blocks)
    o = jnp.where(alive[:, None], o, 1.0e7)
    hit = trace(scene, o, d)
    surf = resolve_surface(scene, o, d, hit)
    hit_mask = surf.valid & alive

    # Beer-Lambert attenuation by the PARENT material through this segment
    atten = jnp.exp(-absorb * surf.t[:, None])
    k_eff = tput * jnp.where(surf.front[:, None], 1.0, atten)

    if cfg.tex_filter and scene.tm_channels:
        # ray-differential footprint filtering, primary rays only (the
        # reference only ever sets xangle/yangle on camera rays,
        # RayTracingProj7 main.cpp:141-142; secondary duvw stays 0)
        import math

        from rtf_tpu.ops.trace import footprint_duv
        pix = 2.0 * math.tan(math.radians(scene.fov) * 0.5) / scene.height
        duv0, duv1 = footprint_duv(scene, o, d, hit, surf, pix, pix)
        prim = (rtype == RT_PRIMARY)[:, None]
        duv = (jnp.where(prim, duv0, 0.0), jnp.where(prim, duv1, 0.0))
    else:
        duv = None
    mtl = sample_material(scene, surf.mtl, surf.uvw, duv=duv,
                          n_filter=cfg.tex_filter_samples)
    view = -d  # d is normalized
    if cfg.gi_mode == "pm_direct":
        # photon map as ALL diffuse lighting (direct + indirect): no
        # analytic light loop; the committed reference can't reproduce
        # its own prj13box golden with its (commented-out) GI, but this
        # mode reproduces its look — photon density saturates inside the
        # estimate radius, so there is no ceiling hotspot
        col = mtl.emission
    else:
        col = mtl.emission + direct_lighting(scene, cfg, surf, mtl, view,
                                             key)
    if gi_grid is not None:
        from rtf_tpu.gi.grid import estimate_irradiance
        from rtf_tpu.gi.volume import IrradianceVolume, sample_volume
        if isinstance(gi_grid, IrradianceVolume):
            # precomputed irradiance volume: one trilinear lookup per
            # query instead of the 27-cell photon gather (gi/volume.py)
            irrad, mean_dir = sample_volume(gi_grid, surf.p)
        else:
            irrad, mean_dir = estimate_irradiance(
                gi_grid, surf.p, surf.n, cfg.knn_radius, cfg.knn_k)
        theta = jnp.maximum(0.0, -dot(surf.n, mean_dir))
        col = col + mtl.kd * irrad * theta[:, None]
    if caustic_grid is not None:
        # caustic map estimate at camera-visible hits (the reference
        # ships this commented out, Proj13 main.cpp:517-534; radius 0.5,
        # kd * irradiance * cos weighting)
        from rtf_tpu.gi.grid import estimate_irradiance as _est
        crad, cdir = _est(caustic_grid, surf.p, surf.n,
                          cfg.caustic_radius, cfg.knn_k)
        cth = jnp.maximum(0.0, -dot(surf.n, cdir))
        prim = (rtype == RT_PRIMARY)[:, None]
        col = col + jnp.where(prim, mtl.kd * crad * cth[:, None], 0.0)
    radiance = jnp.where(hit_mask[:, None], k_eff * col, 0.0)

    # environment on secondary-ray miss. Final: refraction only
    # (main.cpp:634-636); Proj8-era integrators also give it to reflection
    # misses (RayTracingProj8 main.cpp:382-384) -> cfg.env_on_reflect_miss.
    env_ok = rtype == RT_REFRACT
    if cfg.env_on_reflect_miss:
        env_ok = env_ok | (rtype == RT_REFLECT)
    env_mask = alive & ~surf.valid & env_ok
    env = sample_environment(scene, d, l2=cfg.env_l2)
    radiance = radiance + jnp.where(env_mask[:, None], tput * env, 0.0)

    # children
    fr = fresnel_split(cfg, surf, mtl, view,
                       key=jax.random.fold_in(key, 4099),
                       glossy=scene.any_glossy)
    thr = cfg.color_threshold
    r_go = hit_mask & (jnp.max(fr.r_k, axis=-1) > thr)
    t_go = hit_mask & (jnp.max(fr.t_k, axis=-1) > thr)
    _off = (lambda p, n, d: p) if getattr(scene, "ref_exact", False) \
        else offset_origin
    refl = RayQueue(o=_off(surf.p, surf.n, fr.r_dir),
                    d=fr.r_dir, tput=k_eff * fr.r_k,
                    absorb=mtl.absorption, pixel=pixel,
                    rtype=jnp.full(pixel.shape, RT_REFLECT, jnp.int32),
                    alive=r_go)
    refr = RayQueue(o=_off(surf.p, surf.n, fr.t_dir),
                    d=fr.t_dir, tput=k_eff * fr.t_k,
                    absorb=mtl.absorption, pixel=pixel,
                    rtype=jnp.full(pixel.shape, RT_REFRACT, jnp.int32),
                    alive=t_go)
    children = _concat_queues(refl, refr)
    return ShadeResult(radiance=radiance, children=children,
                       hit_mask=hit_mask, hit_t=surf.t,
                       surf_p=surf.p, surf_n=surf.n, kd=mtl.kd, k_eff=k_eff)


def _splat(image, pixel, values, mask):
    v = jnp.where(mask[:, None], values, 0.0)
    return image + jax.ops.segment_sum(v, pixel, num_segments=image.shape[0])


class WaveOutput(NamedTuple):
    radiance: jnp.ndarray    # [P,3] sum of sample radiances
    hit_count: jnp.ndarray   # [P] number of primary samples that hit
    z_min: jnp.ndarray       # [P] closest primary hit depth


def _rr_select(children: RayQueue, key) -> RayQueue:
    """Collapse the [2N] reflect+refract candidates to [N] lane-aligned
    continuations: per lane pick ONE child with probability proportional
    to its throughput luma and reweight by the inverse probability —
    an unbiased estimator of following both (the reference recursion,
    main.cpp:613-638).  Lane k of the result continues pixel
    children.pixel[k], so pixel<->lane stays a static permutation."""
    n = children.capacity // 2
    refl = jax.tree.map(lambda x: x[:n], children)
    refr = jax.tree.map(lambda x: x[n:], children)
    wr = jnp.where(refl.alive, luma(refl.tput), 0.0)
    wt = jnp.where(refr.alive, luma(refr.tput), 0.0)
    wsum = wr + wt
    u = jax.random.uniform(key, (n,)) * jnp.maximum(wsum, 1e-30)
    take_r = (u < wr) | (wt <= 0.0)
    take_r &= wr > 0.0

    def pick(a, b):
        m = take_r
        if a.ndim > 1:
            m = m[:, None]
        return jnp.where(m, a, b)

    w_chosen = jnp.where(take_r, wr, wt)
    scale = (wsum / jnp.maximum(w_chosen, 1e-30))[:, None]
    alive = (wsum > 0.0) & (refl.alive | refr.alive)
    return RayQueue(
        o=pick(refl.o, refr.o), d=pick(refl.d, refr.d),
        tput=pick(refl.tput, refr.tput) * scale,
        absorb=pick(refl.absorb, refr.absorb),
        pixel=refl.pixel,
        rtype=pick(refl.rtype, refr.rtype),
        alive=alive)


def _run_bounces_rr(scene, cfg, q: RayQueue, key, gi_grid=None,
                    bounces=None):
    """Lane-aligned bounce loop: returns summed radiance PER LANE."""
    n = q.capacity
    nb = cfg.bounces if bounces is None else bounces
    lane_rad = jnp.zeros((n, 3), jnp.float32)
    for b in range(nb):
        kb = jax.random.fold_in(key, b)
        res = shade_lanes(scene, cfg, q.o, q.d, q.tput, q.absorb, q.pixel,
                          q.alive, q.rtype, kb, gi_grid=gi_grid)
        lane_rad = lane_rad + res.radiance
        if b + 1 < nb:
            q = _rr_select(res.children, jax.random.fold_in(kb, 31))
    return lane_rad


def render_wave(scene, cfg, o, d, pixel, sample_mask, key,
                num_pixels: int, gi_grid=None, inv_pixel=None,
                caustic_grid=None) -> WaveOutput:
    """Render one wave of primary samples through the full bounce queue.

    `sample_mask` disables lanes (adaptive-AA wave 2 only touches
    unconverged pixels).  Radiance is the SUM over samples; the caller
    divides by per-pixel hit counts, reproducing the reference's
    average-over-hit-samples (main.cpp:309-311).

    `inv_pixel`: when `pixel` is a permutation of arange(num_pixels),
    its static inverse; lane->pixel assembly then becomes one gather and
    the whole wave is scatter-free (requires the 'rr' split mode path).
    """
    n = o.shape[0]

    k_prim, k_loop = jax.random.split(key)
    # photon mode keeps the photon estimate OFF the first hit (the
    # hemisphere fan-out covers it, main.cpp:642-693); pm_direct is the
    # photon map AS the lighting, so the first hit queries it too
    res = shade_lanes(scene, cfg, o, d,
                      tput=jnp.ones((n, 3), jnp.float32),
                      absorb=jnp.zeros((n, 3), jnp.float32),
                      pixel=pixel,
                      alive=sample_mask,
                      rtype=jnp.full(n, RT_PRIMARY, jnp.int32),
                      key=k_prim, caustic_grid=caustic_grid,
                      gi_grid=gi_grid if cfg.gi_mode == "pm_direct"
                      else None)

    use_rr = cfg.resolved_split_mode() == "rr" and inv_pixel is not None

    if use_rr:
        lane_rad = res.radiance
        if cfg.gi_mode in ("hemisphere", "pathtrace", "photon") \
                and cfg.hemisphere_samples > 0:
            k_gi = jax.random.fold_in(key, 101)

            # lax.scan keeps the compiled program at ONE chunk's size
            # (a python loop of 30 chunks OOMs the compiler at 800x600)
            def gi_chunk(acc, i):
                chunk = _hemisphere_chunk(scene, cfg, res, pixel,
                                          jax.random.fold_in(k_gi, i))
                kc = jax.random.fold_in(k_loop, 1000 + i)
                res_c = shade_lanes(scene, cfg, chunk.o, chunk.d,
                                    chunk.tput, chunk.absorb, chunk.pixel,
                                    chunk.alive, chunk.rtype, kc,
                                    gi_grid=gi_grid)
                acc = acc + res_c.radiance
                q_c = _rr_select(res_c.children,
                                 jax.random.fold_in(kc, 31))
                # hemisphere samples carry bounceCount-1 (main.cpp:678)
                acc = acc + _run_bounces_rr(
                    scene, cfg, q_c, jax.random.fold_in(kc, 32),
                    gi_grid=gi_grid, bounces=max(cfg.bounces - 1, 0))
                return acc, None

            lane_rad, _ = jax.lax.scan(
                gi_chunk, lane_rad,
                jnp.arange(cfg.hemisphere_samples))
        q = _rr_select(res.children, jax.random.fold_in(k_loop, 77))
        lane_rad = lane_rad + _run_bounces_rr(scene, cfg, q, k_loop,
                                              gi_grid=gi_grid)
        # lane -> pixel space: one static-permutation gather, no scatter
        image = lane_rad[inv_pixel]
        hit_count = (res.hit_mask & sample_mask).astype(jnp.int32)[inv_pixel]
        big = jnp.float32(1.0e30)
        z = jnp.where(res.hit_mask & sample_mask, res.hit_t, big)
        z_min = z[inv_pixel]
        return WaveOutput(radiance=image, hit_count=hit_count, z_min=z_min)

    image = jnp.zeros((num_pixels, 3), jnp.float32)
    image = _splat(image, pixel, res.radiance, sample_mask)
    hit_count = jax.ops.segment_sum(
        (res.hit_mask & sample_mask).astype(jnp.int32), pixel,
        num_segments=num_pixels)
    big = jnp.float32(1.0e30)
    z = jnp.where(res.hit_mask & sample_mask, res.hit_t, big)
    z_min = -jax.ops.segment_max(-z, pixel, num_segments=num_pixels)

    capacity = max(int(n * cfg.queue_factor), 1)
    # GI fan-out at the first hit (hemisphere / pathtrace modes): one
    # hemisphere sample per chunk, traced through the shared bounce queue
    # so peak memory stays O(n) (the reference pays the same ray count,
    # main.cpp:655-692).
    if cfg.gi_mode in ("hemisphere", "pathtrace", "photon") and cfg.hemisphere_samples > 0:
        k_gi = jax.random.fold_in(key, 101)

        def gi_chunk(img, i):
            chunk = _hemisphere_chunk(scene, cfg, res, pixel,
                                      jax.random.fold_in(k_gi, i))
            img, _ = _run_bounces(scene, cfg, chunk, img,
                                  jax.random.fold_in(k_loop, 1000 + i),
                                  capacity, gi_grid=gi_grid,
                                  bounces=max(cfg.bounces - 1, 0))
            return img, None

        image, _ = jax.lax.scan(gi_chunk, image,
                                jnp.arange(cfg.hemisphere_samples))

    q = _compact(res.children, capacity)
    image, _ = _run_bounces(scene, cfg, q, image, k_loop, capacity,
                            gi_grid=gi_grid)
    return WaveOutput(radiance=image, hit_count=hit_count, z_min=z_min)


def _run_bounces(scene, cfg, q: RayQueue, image, key, capacity,
                 gi_grid=None, bounces=None):
    nb = cfg.bounces if bounces is None else bounces
    for b in range(nb):
        kb = jax.random.fold_in(key, b)
        res = shade_lanes(scene, cfg, q.o, q.d, q.tput, q.absorb, q.pixel,
                          q.alive, q.rtype, kb, gi_grid=gi_grid)
        image = image + jax.ops.segment_sum(
            res.radiance, q.pixel, num_segments=image.shape[0])
        if b + 1 < cfg.bounces:
            q = _compact(res.children, capacity)
    return image, q


def _hemisphere_chunk(scene, cfg, res: ShadeResult, pixel, key) -> RayQueue:
    """One hemisphere GI sample per first-hit lane (main.cpp:642-693),
    weighted kd * (N.wi) / S.

    The reference draws phi ~ U(0,2pi), sin(theta) = sqrt(U); we reproduce
    the identical distribution (and its basis-building rule,
    main.cpp:643-654).
    """
    n = res.surf_p.shape[0]
    s = cfg.hemisphere_samples
    nz = res.surf_n
    v1 = jnp.array([1.0, 0.0, 0.0], jnp.float32)
    v2 = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    use1 = (dot(nz, jnp.broadcast_to(v1, nz.shape)) < 0.4)[:, None]
    nx = normalize(jnp.where(use1, jnp.cross(nz, v1), jnp.cross(nz, v2)))
    ny = jnp.cross(nz, nx)

    k1, k2 = jax.random.split(key)
    phi = jax.random.uniform(k1, (n,)) * (2.0 * jnp.pi)
    ysq = jax.random.uniform(k2, (n,))
    sin_t = jnp.sqrt(ysq)
    cos_t = jnp.sqrt(1.0 - ysq)
    hdir = normalize(nx * (sin_t * jnp.cos(phi))[:, None]
                     + ny * (sin_t * jnp.sin(phi))[:, None]
                     + nz * cos_t[:, None])
    w = jnp.maximum(0.0, dot(hdir, nz))[:, None]
    tput = res.k_eff * res.kd * w / float(s)
    alive = res.hit_mask & (jnp.max(tput, axis=-1) > 0)
    return RayQueue(
        o=offset_origin(res.surf_p, res.surf_n, hdir), d=hdir, tput=tput,
        absorb=jnp.zeros((n, 3), jnp.float32), pixel=pixel,
        rtype=jnp.full(n, RT_REFRACT, jnp.int32),  # GI miss samples the env
        alive=alive)
