"""Segmented fused path: Pallas hit kernel + XLA texture segment +
Pallas shade kernel per bounce, all inside ONE jit program.

The monolithic wave kernel (render/fused.py) cannot express per-lane
texture gathers (Pallas TPU has no vector gather), so file-textured
scenes previously fell back to the ~100x-slower XLA wavefront.  This
path keeps intersection and shading in Pallas and hops out to XLA only
for the texture fetches — per bounce that segment is ONE batched atlas
gather per textured channel plus elementwise uv math, so the whole
bounce stays memory-light: rays in HBM between segments
([nblk,16,8,128]), everything else in registers.

Coverage (fusable_seg): kd/ks file or checker textures on any material
(mesh hits interpolate per-face vertex uv in-kernel: immediates rows
21-29 of the packed triangle table, one-hot matmul cols 13-18 of the
MXU shade table), textured environment maps, textured backgrounds
(handled at finalize), gi_mode none, 'rr' split, and the monolithic
path's light/material limits.

Reference semantics preserved: identical to the monolithic kernel —
MtlBlinn::Shade direct+Fresnel structure (Final/main.cpp:516-638) with
TexturedColor::Sample kd/ks (main.cpp:531-532) and
SampleEnvironment on refraction miss (main.cpp:634-636).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rtf_tpu.ops.pallas_mesh import TRI_LANES
from rtf_tpu.ops.pallas_util import out_struct
from rtf_tpu.render.fused import (
    BIG, BLOCK, MXU_STREAM_MAX_FACES, SENTINEL, SUB,
    R_ALIVE, R_D, R_O, R_RTYPE, R_TPUT,
    _blk4, _closest_hit, _pack_rays_sh, _pad_blocks, _shade_from_hit,
)

HIT_ROWS = 9    # t, nx, ny, nz, mtl, front, u, v, fid (deferred resolve)
TEX_ROWS = 9    # kd rgb, ks rgb, env rgb
OUT_ROWS = 21   # rad rgb, hit, z, next-ray state (16)


import os as _os

# Deferred winner resolve (RTF_SEG_DEFER=1 to enable; default OFF).
# Read ONCE at import: jit caches are not keyed on env vars, so a
# mid-process flip would serve stale programs.  Measured tradeoff on
# scene_b 800x600 hybrid GI (v5e): in-kernel resolve 15.5 s/frame,
# deferred 19.4 s — the per-bounce XLA face-gathers (~45 f32/lane over
# every lane x bounce x wave) cost more than the rare in-kernel
# resolve epilogues they replace (scene_b's slab-passing tiles mostly
# produce no hit).  Defer remains the right shape for hit-heavy sweeps
# and HBM-streamed meshes (622 vs 1182 us/block in tools/profile_tiles,
# and no per-tile shade-table DMAs), so it stays available per-process.
_SEG_DEFER = _os.environ.get("RTF_SEG_DEFER", "0") != "0"


def _defer_enabled() -> bool:
    return _SEG_DEFER


def _dead_row_values(n_rows):
    """{row: fill} of an all-dead wave's shade output — the single
    source of truth shared by _seg_shade_kernel's ~any_alive branch and
    the driver's bounce_dead lax.cond branch (which must stay
    bit-identical): zero radiance/hit/gi rows, z=BIG, next-ray origin
    SENTINEL / dir.x 1 / alive 0."""
    vals = {r: 0.0 for r in range(n_rows)}
    vals[4] = BIG
    for c in range(3):
        vals[5 + R_O + c] = SENTINEL
    vals[5 + R_D] = 1.0
    return vals


# ---------------------------------------------------------------------------
# gate

_SEG_INFO_CACHE = {}


def seg_reason(scene, cfg):
    """None if the segmented path can run, else why not (logged by the
    renderer's path selection)."""
    if cfg.gi_mode == "photon" and not cfg.photon_volume:
        return "gi_mode=photon without photon_volume (exact kNN is XLA)"
    if cfg.gi_mode not in ("none", "hemisphere", "pathtrace", "photon"):
        return f"gi_mode={cfg.gi_mode!r} not kernelized"
    if cfg.resolved_split_mode() != "rr":
        return "split_mode='both' (exact Fresnel split is XLA-only)"
    if cfg.tex_filter:
        return "tex_filter (ray-differential filtering is XLA-only)"
    import weakref
    k = id(scene)
    ent = _SEG_INFO_CACHE.get(k)
    if ent is not None and ent[0]() is scene:
        return ent[1]
    why = None
    mt = scene.materials
    for tm in (mt.emission_tm, mt.reflection_tm, mt.refraction_tm):
        if int(np.asarray(tm).max(initial=-1)) >= 0:
            why = "emission/reflection/refraction texture maps"
            break
    if why is None and sum(1 for kk in scene.light_kinds
                           if kk != "ambient") > 2:
        why = "more than 2 non-ambient lights"
    if why is None and scene.mesh is not None \
            and scene.mesh.tri_a.shape[0] > MXU_STREAM_MAX_FACES:
        why = (f"mesh has {scene.mesh.tri_a.shape[0]} faces > "
               f"streaming budget {MXU_STREAM_MAX_FACES}")
    if why is None and mt.diffuse.shape[0] > 16:
        why = f"{mt.diffuse.shape[0]} materials > 16"
    try:
        ref = weakref.ref(scene)
    except TypeError:
        ref = (lambda s=scene: s)
    _SEG_INFO_CACHE[k] = (ref, why)
    return why


def fusable_seg(scene, cfg) -> bool:
    """Can this scene+config run on the segmented path?  Everything the
    monolithic gate requires EXCEPT kd/ks/env/bg texture restrictions —
    textures are free here (incl. on mesh materials: the hit kernels
    interpolate per-face vertex uv).  GI modes ride the same fused GI
    drivers with wave_fn=fused_wave_seg; 'photon' needs the
    irradiance-volume option like the monolithic path."""
    return seg_reason(scene, cfg) is None


# ---------------------------------------------------------------------------
# kernels


def _seg_hit_kernel(rays_ref, *refs, consts, has_mesh_tables=False,
                    stream_mesh=False):
    """Closest hit only: writes (t, n, mtl, front, uv, fid) rows.

    With mesh tables the sweep runs DEFERRED (round 5): mesh winners
    record only (t, global face row) in-kernel — rows 1-7 then hold the
    PRIMITIVE winner's values, valid exactly where fid < 0 — and the
    driver's _resolve_hit gathers normals/mtl/front/uv by face id in
    XLA, which removes the per-tile one-hot resolve matmuls from the
    sweep (1182 -> 622 us/block on mesh-interested GI blocks)."""
    if has_mesh_tables and stream_mesh:
        (trit_ref, shade_ref, aabb_ref, out_ref, st,
         trit_s, shade_s, sem_t, sem_s) = refs
        mesh_refs = (trit_ref, shade_ref, aabb_ref,
                     trit_s, shade_s, sem_t, sem_s)
    elif has_mesh_tables:
        trit_ref, shade_ref, aabb_ref, out_ref, st = refs
        mesh_refs = (trit_ref, shade_ref, aabb_ref)
    else:
        out_ref, st = refs
        mesh_refs = None
    sh = rays_ref[0]
    shape = (SUB, TRI_LANES)
    any_alive = jnp.max(sh[R_ALIVE]) > 0.0
    defer = has_mesh_tables and _defer_enabled()

    @pl.when(~any_alive)
    def _():
        out_ref[0, 0] = jnp.full(shape, BIG, jnp.float32)
        zero = jnp.zeros(shape, jnp.float32)
        for r in range(1, HIT_ROWS - 1):
            out_ref[0, r] = zero
        out_ref[0, HIT_ROWS - 1] = jnp.full(shape, -1.0, jnp.float32)

    @pl.when(any_alive)
    def _():
        o3 = (sh[R_O], sh[R_O + 1], sh[R_O + 2])
        d3 = (sh[R_D], sh[R_D + 1], sh[R_D + 2])
        out = _closest_hit(
            o3, d3, consts, st, mesh_refs=mesh_refs, need_uv=True,
            defer=defer)
        if defer:
            t, n3n, mtl, front, uv, fid = out
        else:
            t, n3n, mtl, front, uv = out
            fid = jnp.full(shape, -1.0, jnp.float32)
        out_ref[0, 0] = t
        out_ref[0, 1] = n3n[0]
        out_ref[0, 2] = n3n[1]
        out_ref[0, 3] = n3n[2]
        out_ref[0, 4] = mtl
        out_ref[0, 5] = front
        out_ref[0, 6] = uv[0]
        out_ref[0, 7] = uv[1]
        out_ref[0, 8] = fid


def _seg_shade_kernel(seed_ref, rays_ref, hit_ref, tex_ref, *refs,
                      consts, cfg_c, use_pid=True,
                      has_mesh_tables=False, stream_mesh=False,
                      gi_out=False):
    """Shading from precomputed hit + texture rows: direct lighting +
    shadows + Fresnel/RR; emits radiance and the next ray state.

    gi_out: also emit this bounce's surface rows (p, n, kd, k_eff) and
    the photon-query weight kd*k_eff at rows 21-32 / 33-35 — the driver
    turns them into hemisphere fan-outs and irradiance-volume lookups
    exactly like the monolithic kernel's surf_out/gi_from outputs."""
    if has_mesh_tables and stream_mesh:
        (trit_ref, shade_ref, aabb_ref, out_ref, st,
         trit_s, shade_s, sem_t, sem_s) = refs
        mesh_refs = (trit_ref, shade_ref, aabb_ref,
                     trit_s, shade_s, sem_t, sem_s)
    elif has_mesh_tables:
        trit_ref, shade_ref, aabb_ref, out_ref, st = refs
        mesh_refs = (trit_ref, shade_ref, aabb_ref)
    else:
        out_ref, st = refs
        mesh_refs = None
    sh = rays_ref[0]
    ht = hit_ref[0]
    tx = tex_ref[0]
    shape = (SUB, TRI_LANES)
    n_rows = OUT_ROWS + (15 if gi_out else 0)
    seed0 = seed_ref[0, 0] + (pl.program_id(0) * 7919 if use_pid else 0)
    any_alive = jnp.max(sh[R_ALIVE]) > 0.0

    @pl.when(~any_alive)
    def _():
        for r, v in _dead_row_values(n_rows).items():
            out_ref[0, r] = jnp.full(shape, v, jnp.float32)

    @pl.when(any_alive)
    def _():
        state = (sh[R_O], sh[R_O + 1], sh[R_O + 2],
                 sh[R_D], sh[R_D + 1], sh[R_D + 2],
                 sh[R_TPUT], sh[R_TPUT + 1], sh[R_TPUT + 2],
                 sh[R_TPUT + 3], sh[R_TPUT + 4], sh[R_TPUT + 5],
                 sh[R_ALIVE], sh[R_RTYPE])
        rad3, hitf, tz, surf, qw, nstate = _shade_from_hit(
            state, seed0, st, consts, cfg_c,
            ht[0], (ht[1], ht[2], ht[3]), ht[4], ht[5],
            (tx[0], tx[1], tx[2]), (tx[3], tx[4], tx[5]),
            (tx[6], tx[7], tx[8]), mesh_refs=mesh_refs)
        out_ref[0, 0] = rad3[0]
        out_ref[0, 1] = rad3[1]
        out_ref[0, 2] = rad3[2]
        out_ref[0, 3] = hitf
        out_ref[0, 4] = tz
        for i, vv in enumerate(nstate):
            out_ref[0, 5 + i] = vv
        zero = jnp.zeros(shape, jnp.float32)
        out_ref[0, 5 + 14] = zero
        out_ref[0, 5 + 15] = zero
        if gi_out:
            for i in range(12):
                out_ref[0, 21 + i] = surf[i]
            for c in range(3):
                out_ref[0, 33 + c] = qw[c]


# ---------------------------------------------------------------------------
# XLA texture segment (channelwise)


def _seg_texture(scene, mtl, u, v):
    """kd/ks per lane: material color x texture sample
    (TexturedColor::Sample, main.cpp:531-532)."""
    from rtf_tpu.ops.texture import _sel_rows, sample_texmap_ch
    m = scene.materials
    mi = mtl.astype(jnp.int32)
    out = []
    for color_tbl, tm_tbl, name in (
            (m.diffuse, m.diffuse_tm, "diffuse"),
            (m.specular, m.specular_tm, "specular")):
        base = [_sel_rows(color_tbl[:, c], mi) for c in range(3)]
        if name in scene.tm_channels:
            tm = _sel_rows(tm_tbl, mi)
            tex = sample_texmap_ch(scene, tm, u, v)
            base = [base[c] * tex[c] for c in range(3)]
        out.append(tuple(base))
    return out[0], out[1]


def _resolve_hit(consts, mesh_tables, rays, hit):
    """XLA winner resolve for the deferred seg hit kernel (round 5).

    hit rows 1-7 hold the PRIMITIVE winner's values; row 8 is the mesh
    winner's GLOBAL face row (-1 = primitive winner or miss).  This
    gathers the per-face shade columns (normals/mtl/uv — the same
    [T, 24] table the in-kernel one-hot matmuls used, face-major) and
    the Plücker rows (to recompute the winner's barycentrics), applies
    the instance transforms, and rebuilds the 9-row hit tensor with
    mesh lanes resolved.  Identical math to the retired in-kernel
    epilogue (fused.py _mesh_closest_mxu resolve branch) — elementwise
    f32 instead of HIGHEST-precision MXU passes."""
    from rtf_tpu.render.fused import MXU_TILE, _mat3_apply_const, _norm3
    nblk = hit.shape[0]
    n = nblk * SUB * TRI_LANES

    def row(a, r):
        return a[:, r].reshape(n)

    fid = row(hit, 8)
    trit, shade, aabb = mesh_tables
    t_ = MXU_TILE
    nt = trit.shape[0]
    fs = shade.reshape(nt * t_, 24)
    wa = jnp.swapaxes(trit[:, 0:6, 0 * t_:1 * t_], 1, 2).reshape(-1, 6)
    wb = jnp.swapaxes(trit[:, 0:6, 1 * t_:2 * t_], 1, 2).reshape(-1, 6)
    wc = jnp.swapaxes(trit[:, 0:6, 2 * t_:3 * t_], 1, 2).reshape(-1, 6)
    fi = jnp.clip(fid.astype(jnp.int32), 0, nt * t_ - 1)
    is_mesh = fid >= 0.0

    ox, oy, oz = row(rays, R_O), row(rays, R_O + 1), row(rays, R_O + 2)
    dx, dy, dz = row(rays, R_D), row(rays, R_D + 1), row(rays, R_D + 2)
    # per-instance local rays + normal matrix, selected by the winner's
    # face-row range (face rows are global across instances)
    zero = jnp.zeros_like(ox)
    lox = loy = loz = ldx = ldy = ldz = zero
    nrm_rows = [zero] * 9
    for inst in consts["mesh_insts"]:
        row0, nti = inst["mxu"]
        sel = is_mesh & (fi >= row0 * t_) & (fi < (row0 + nti) * t_)
        l3 = _mat3_apply_const(inst["itm"], ox - inst["pos"][0],
                               oy - inst["pos"][1],
                               oz - inst["pos"][2])
        ld3 = _mat3_apply_const(inst["itm"], dx, dy, dz)
        lox = jnp.where(sel, l3[0], lox)
        loy = jnp.where(sel, l3[1], loy)
        loz = jnp.where(sel, l3[2], loz)
        ldx = jnp.where(sel, ld3[0], ldx)
        ldy = jnp.where(sel, ld3[1], ldy)
        ldz = jnp.where(sel, ld3[2], ldz)
        for k in range(9):
            nrm_rows[k] = jnp.where(
                sel, jnp.float32(inst["nrm"][k // 3][k % 3]),
                nrm_rows[k])

    # Plücker signs of the winner face: s = d . m + (o x d) . e
    cx = loy * ldz - loz * ldy
    cy = loz * ldx - lox * ldz
    cz = lox * ldy - loy * ldx

    def sign(w):
        g = w[fi]
        return (ldx * g[:, 0] + ldy * g[:, 1] + ldz * g[:, 2]
                + cx * g[:, 3] + cy * g[:, 4] + cz * g[:, 5])

    sa, sb = sign(wa), sign(wb)
    sc = sign(wc)
    ssum = sa + sb + sc
    rs = 1.0 / jnp.where(ssum == 0.0, 1.0, ssum)
    ba = sa * rs
    bb = sb * rs
    g = fs[fi]
    nlx = g[:, 0] + ba * g[:, 3] + bb * g[:, 6]
    nly = g[:, 1] + ba * g[:, 4] + bb * g[:, 7]
    nlz = g[:, 2] + ba * g[:, 5] + bb * g[:, 8]
    wn = (nrm_rows[0] * nlx + nrm_rows[1] * nly + nrm_rows[2] * nlz,
          nrm_rows[3] * nlx + nrm_rows[4] * nly + nrm_rows[5] * nlz,
          nrm_rows[6] * nlx + nrm_rows[7] * nly + nrm_rows[8] * nlz)
    wn = _norm3(*wn)
    dn = ldx * g[:, 10] + ldy * g[:, 11] + ldz * g[:, 12]
    front_m = jnp.where(dn <= 0.0, 1.0, 0.0)
    u_m = g[:, 13] + ba * g[:, 15] + bb * g[:, 17]
    v_m = g[:, 14] + ba * g[:, 16] + bb * g[:, 18]

    def merge(r, mval):
        return jnp.where(is_mesh, mval, row(hit, r))

    rows = [row(hit, 0),
            merge(1, wn[0]), merge(2, wn[1]), merge(3, wn[2]),
            merge(4, g[:, 9]), merge(5, front_m),
            merge(6, u_m), merge(7, v_m), fid]
    return jnp.concatenate(
        [r.reshape(nblk, 1, SUB, TRI_LANES) for r in rows], axis=1)


def _seg_env(scene, dx, dy, dz, l2=False):
    """Environment radiance per lane (SampleEnvironment,
    scene.h:426-432); solid env colors come back as python floats so the
    kernel sees constants."""
    if scene.env_tm < 0:
        return None   # caller uses constant env rows
    from rtf_tpu.ops.texture import env_uv_ch, sample_texmap_ch
    u, v = env_uv_ch(dx, dy, dz, l2=l2)
    tm = jnp.full(dx.shape, scene.env_tm, jnp.int32)
    tex = sample_texmap_ch(scene, tm, u, v)
    ec = scene.env_color
    return tuple(ec[c] * tex[c] for c in range(3))


# ---------------------------------------------------------------------------
# driver


def fused_wave_seg(cfg, consts, scene, o3, d3, alive, seed,
                   bounces=None, tput3=None, absorb3=None, rtype=None,
                   surf_out=False, gi_from=None, mesh_tables=None):
    """Full wave on the segmented path; same contract as
    fused.fused_wave (primary channel tuples in, (rad3, hit, z) out;
    with surf_out/gi_from also (surf rows, per-bounce queries) — so the
    fused GI drivers work unchanged with wave_fn=this)."""
    n0 = o3[0].shape[0]
    n = _pad_blocks(n0)
    nblk = n // BLOCK
    interpret = jax.default_backend() != "tpu"

    def padded(x, fill=0.0):
        if x.shape[0] == n:
            return x
        return jnp.concatenate([x, jnp.full((n - n0,), fill, x.dtype)])

    alive_f = padded(alive.astype(jnp.float32))
    one = jnp.ones((n,), jnp.float32)
    cols = {R_ALIVE: alive_f}
    for c in range(3):
        cols[R_O + c] = padded(jnp.where(alive, o3[c], SENTINEL), SENTINEL)
        cols[R_D + c] = padded(d3[c], 1.0)
        cols[R_TPUT + c] = one if tput3 is None else padded(tput3[c])
        if absorb3 is not None:
            cols[R_TPUT + 3 + c] = padded(absorb3[c])
    if rtype is not None:
        cols[R_RTYPE] = padded(jnp.full((n0,), float(rtype), jnp.float32))
    rays = _pack_rays_sh(cols)

    nb = cfg.bounces if bounces is None else bounces
    cfg_c = dict(light_average=cfg.light_average,
                 inverse_square=cfg.inverse_square,
                 env_on_reflect_miss=cfg.env_on_reflect_miss,
                 total_reflection_threshold=cfg.total_reflection_threshold,
                 color_threshold=cfg.color_threshold,
                 shadow_samples=cfg.shadow_max,
                 shadow_min_samples=cfg.shadow_min)

    has_mesh = mesh_tables is not None
    from rtf_tpu.render.fused import _stream_tables
    stream = _stream_tables(mesh_tables)
    gi_out = surf_out or gi_from is not None
    n_out = OUT_ROWS + (15 if gi_out else 0)
    hit_kern = functools.partial(_seg_hit_kernel, consts=consts,
                                 has_mesh_tables=has_mesh,
                                 stream_mesh=stream)
    shade_kern = functools.partial(_seg_shade_kernel, consts=consts,
                                   cfg_c=cfg_c, use_pid=not interpret,
                                   has_mesh_tables=has_mesh,
                                   stream_mesh=stream,
                                   gi_out=gi_out)
    mesh_specs, mesh_args = [], []
    scratch = [pltpu.VMEM((9, SUB, TRI_LANES), jnp.float32)]
    if has_mesh:
        trit, shade, aabb = mesh_tables
        if stream:
            mesh_specs = [pl.BlockSpec(memory_space=pl.ANY),
                          pl.BlockSpec(memory_space=pl.ANY)]
            scratch += [pltpu.VMEM(trit.shape[1:], jnp.float32),
                        pltpu.VMEM(shade.shape[1:], jnp.float32),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA]
        else:
            mesh_specs = [
                pl.BlockSpec(trit.shape, lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(shade.shape, lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ]
        mesh_specs.append(pl.BlockSpec(aabb.shape, lambda i: (0, 0),
                                       memory_space=pltpu.SMEM))
        mesh_args = [trit, shade, aabb]
    seed_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)
    # large-mesh tables + per-block rows can exceed the default 16M
    # scoped-vmem budget by a hair; raise the cap
    cparams = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)

    def row(a, r):
        return a[:, r].reshape(n)

    env_const = tuple(float(x) for x in np.asarray(consts["env"]))

    def bounce_body(rays, b):
        hit = pl.pallas_call(
            hit_kern, grid=(nblk,),
            out_shape=out_struct(
                (nblk, HIT_ROWS, SUB, TRI_LANES), jnp.float32, rays),
            in_specs=[_blk4(16)] + mesh_specs,
            out_specs=_blk4(HIT_ROWS),
            scratch_shapes=scratch,
            compiler_params=cparams,
            interpret=interpret,
        )(rays, *mesh_args)
        if has_mesh and _defer_enabled():
            # deferred winner resolve: gather normals/mtl/front/uv of
            # mesh winners by face id (kernel only tracked t + fid)
            hit = _resolve_hit(consts, mesh_tables, rays, hit)

        mtl_l = row(hit, 4)
        u_l = row(hit, 6)
        v_l = row(hit, 7)
        import os as _os
        if _os.environ.get("RTF_PROBE_NOTEX"):  # perf probe only
            one = jnp.ones((n,), jnp.float32)
            kd3, ks3 = (one, one, one), (one, one, one)
        else:
            kd3, ks3 = _seg_texture(scene, mtl_l, u_l, v_l)
        env3 = _seg_env(scene, row(rays, R_D), row(rays, R_D + 1),
                        row(rays, R_D + 2), l2=cfg.env_l2)
        if env3 is None:
            env3 = tuple(jnp.full((n,), env_const[c], jnp.float32)
                         for c in range(3))
        tex = jnp.concatenate(
            [x.reshape(nblk, 1, SUB, TRI_LANES)
             for x in (list(kd3) + list(ks3) + list(env3))], axis=1)

        seeds = jnp.full((1, 1), seed + b * 101, jnp.int32)
        return pl.pallas_call(
            shade_kern, grid=(nblk,),
            out_shape=out_struct(
                (nblk, n_out, SUB, TRI_LANES), jnp.float32,
                seeds, rays, hit, tex),
            in_specs=[seed_spec, _blk4(16), _blk4(HIT_ROWS),
                      _blk4(TEX_ROWS)] + mesh_specs,
            out_specs=_blk4(n_out),
            scratch_shapes=scratch,
            compiler_params=cparams,
            interpret=interpret,
        )(seeds, rays, hit, tex, *mesh_args)

    def bounce_dead(rays):
        # exactly what _seg_shade_kernel emits for an all-dead wave
        # (shared recipe so the lax.cond branches stay interchangeable)
        z = jnp.zeros((nblk, n_out, SUB, TRI_LANES), jnp.float32)
        for r, v in _dead_row_values(n_out).items():
            if v != 0.0:
                z = z.at[:, r].set(v)
        return z

    racc = [jnp.zeros((n,), jnp.float32) for _ in range(3)]
    hit0 = z0 = None
    surf0 = None
    queries = []
    for b in range(nb + 1):
        if b == 0:
            out = bounce_body(rays, b)
        else:
            # device-side early exit: hemisphere-GI child waves in
            # mostly-diffuse scenes are all-dead after 1-2 bounces, and
            # without this every remaining bounce still paid both
            # kernels + the full-size texture gather segment
            any_alive = jnp.max(rays[:, R_ALIVE]) > 0.0
            out = jax.lax.cond(any_alive,
                               functools.partial(bounce_body, b=b),
                               bounce_dead, rays)

        for c in range(3):
            racc[c] = racc[c] + row(out, c)
        if b == 0:
            hit0 = row(out, 3) > 0.0
            z0 = row(out, 4)
            if surf_out:
                surf0 = tuple(row(out, 21 + r)[:n0] for r in range(12))
        if gi_from is not None and b >= gi_from:
            queries.append((
                tuple(row(out, 21 + r)[:n0] for r in range(3)),
                tuple(row(out, 24 + r)[:n0] for r in range(3)),
                tuple(row(out, 33 + r)[:n0] for r in range(3))))
        rays = out[:, 5:21]

    rad3 = tuple(r[:n0] for r in racc)
    if not surf_out and gi_from is None:
        return (rad3, hit0[:n0], z0[:n0])
    return (rad3, hit0[:n0], z0[:n0], surf0, queries)
