"""Wavefront scene tracing: closest-hit over all instance groups.

Replaces the reference's recursive TraceNode walk + virtual
Object::IntersectRay dispatch (Final/main.cpp:94-130) with dense batched
intersection — the shape that actually feeds a TPU's vector/matrix units:

* spheres/planes: one broadcast intersection of the whole wavefront
  against ALL instances at once ([N rays, I instances] lanes), min-t
  reduction over instances;
* meshes: tiled dense ray x triangle intersection — a `lax.scan` over
  fixed-size face tiles, each step testing every ray against a [T]-face
  tile fully vectorized ([N, T] VPU lanes, argmin-t per tile).  At the
  reference's mesh sizes (320-9.5k faces) this outruns any divergent
  per-ray BVH walk on TPU by orders of magnitude: no gathers, no
  variable-trip while_loops, no per-ray stacks in HBM.
* the classic lock-step BVH traversal (per-ray VMEM stacks under one
  `lax.while_loop`) is kept as `bvh_traverse` for very large meshes and
  is selectable via `RenderConfig.mesh_algo`.

Hit attributes (position/normal/uvw/material) are reconstructed once at
the end for the winning primitive only — the traversal carries just
(t, kind, inst, face, bary, front).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from rtf_tpu.core.math import (
    BIGFLOAT, dot, mat3_apply, mat3_apply_batched, normalize,
)
from rtf_tpu.ops.intersect import (
    intersect_box_enter, intersect_plane, intersect_sphere,
    intersect_triangle, plane_attributes, sphere_attributes,
)

KIND_NONE, KIND_SPHERE, KIND_PLANE, KIND_MESH = 0, 1, 2, 3


@struct.dataclass
class Hit:
    """SoA hit record (HitInfo, scene.h:151-164, minus cached attributes)."""
    t: jnp.ndarray        # [N] float32, BIGFLOAT = miss
    kind: jnp.ndarray     # [N] int32
    inst: jnp.ndarray     # [N] int32 group-local instance id
    face: jnp.ndarray     # [N] int32 arena face id (meshes)
    ba: jnp.ndarray       # [N] barycentric a (meshes)
    bb: jnp.ndarray       # [N] barycentric b (meshes)
    front: jnp.ndarray    # [N] bool

    @property
    def is_hit(self):
        return self.kind != KIND_NONE


def _empty_hit(n: int) -> Hit:
    return Hit(
        t=jnp.full((n,), BIGFLOAT, jnp.float32),
        kind=jnp.zeros((n,), jnp.int32),
        inst=jnp.zeros((n,), jnp.int32),
        face=jnp.zeros((n,), jnp.int32),
        ba=jnp.zeros((n,), jnp.float32),
        bb=jnp.zeros((n,), jnp.float32),
        front=jnp.ones((n,), bool),
    )


def _to_local(itm, pos, o, d):
    """World ray -> instance local ray (ToNodeCoords, scene.h:502-508)."""
    lo = mat3_apply(itm, o - pos)
    ld = mat3_apply(itm, d)
    return lo, ld


def _scan_group(group, o, d, hit: Hit, kind_code: int, intersect_fn) -> Hit:
    """Intersect the wavefront against every instance of a group AT ONCE:
    [N rays, I instances] broadcast, then a min-t reduction over I."""
    k = group.itm.shape[0]
    if k == 0:
        return hit

    # local rays for all instances: [N, I, 3].  Explicit mul+sum, NOT
    # einsum: XLA routes tiny einsums to the MXU in bf16 (see
    # core.math.mat3_apply) which costs ~3 decimal digits of transform
    # precision.
    rel = o[:, None, :] - group.pos[None, :, :]
    lo = (group.itm[None] * rel[:, :, None, :]).sum(-1)
    ld = (group.itm[None] * d[:, None, None, :]).sum(-1)
    tt, fr, valid = intersect_fn(lo, ld, hit.t[:, None])

    tt = jnp.where(valid, tt, BIGFLOAT)
    j = jnp.argmin(tt, axis=1)
    rows = jnp.arange(tt.shape[0])
    t_min = tt[rows, j]
    upd = t_min < hit.t
    return hit.replace(
        t=jnp.where(upd, t_min, hit.t),
        kind=jnp.where(upd, kind_code, hit.kind),
        inst=jnp.where(upd, j.astype(jnp.int32), hit.inst),
        front=jnp.where(upd, fr[rows, j], hit.front))


def _dense_mesh(mesh, o, d, t_init, face_init, front_init, ba_init, bb_init,
                face_range: tuple, tile: int = 512):
    """Dense tiled mesh intersection, rays already in instance-local space.

    Scans over fixed-size face tiles; each step intersects every ray with
    every face of the tile ([N, T] lanes — pure VPU work, no gathers) and
    keeps the per-ray argmin-t.  `face_base`..`face_base+F` is this mesh's
    slice of the arena; padding faces are degenerate (total area 0) and
    never validate.
    """
    f0, f1 = face_range[0], face_range[1]
    a_all = mesh.tri_a[f0:f1]
    b_all = mesh.tri_b[f0:f1]
    c_all = mesh.tri_c[f0:f1]
    nf = a_all.shape[0]
    t = max(8, min(tile, nf))
    pad = (-nf) % t
    if pad:
        z = jnp.zeros((pad, 3), a_all.dtype)
        a_all = jnp.concatenate([a_all, z])
        b_all = jnp.concatenate([b_all, z])
        c_all = jnp.concatenate([c_all, z])
    ntiles = a_all.shape[0] // t
    a_t = a_all.reshape(ntiles, t, 3)
    b_t = b_all.reshape(ntiles, t, 3)
    c_t = c_all.reshape(ntiles, t, 3)

    o_b = o[:, None, :]
    d_b = d[:, None, :]
    rows = jnp.arange(o.shape[0])

    def body(carry, xs):
        t_best, face, front, ba, bb = carry
        at, bt, ct, tix = xs
        tt, fr, tba, tbb, valid = intersect_triangle(
            o_b, d_b, at[None], bt[None], ct[None], t_best[:, None])
        tt = jnp.where(valid, tt, BIGFLOAT)
        j = jnp.argmin(tt, axis=1)
        t_min = tt[rows, j]
        upd = t_min < t_best
        t_best = jnp.where(upd, t_min, t_best)
        face = jnp.where(upd, f0 + tix * t + j.astype(jnp.int32), face)
        front = jnp.where(upd, fr[rows, j], front)
        ba = jnp.where(upd, tba[rows, j], ba)
        bb = jnp.where(upd, tbb[rows, j], bb)
        return (t_best, face, front, ba, bb), None

    xs = (a_t, b_t, c_t, jnp.arange(ntiles, dtype=jnp.int32))
    carry = (t_init, face_init, front_init, ba_init, bb_init)
    if ntiles == 1:
        carry, _ = body(carry, jax.tree.map(lambda x: x[0], xs))
    else:
        carry, _ = jax.lax.scan(body, carry, xs)
    return carry


def bvh_traverse(mesh, root, o, d, t_init, face_init, front_init,
                 ba_init, bb_init):
    """Batched BVH walk for one mesh instance, rays already in local space.

    Every ray keeps a private stack slice in a [N, D] array; the whole
    batch iterates until all stacks drain.  Near child is pushed last
    (popped first).  t-pruning uses the current best hit — a strict
    improvement over the reference's BIGFLOAT box test
    (objects.h:276 TraceBVHNode).
    """
    n = o.shape[0]
    depth = mesh.max_depth
    max_leaf = mesh.max_leaf
    rows = jnp.arange(n)

    stack = jnp.zeros((n, depth), jnp.int32)
    stack = stack.at[:, 0].set(root)
    sp = jnp.ones((n,), jnp.int32)

    state = (sp, stack, t_init, face_init, front_init, ba_init, bb_init)

    def cond(state):
        return jnp.any(state[0] > 0)

    def body(state):
        sp, stack, t_best, face, front, ba, bb = state
        active = sp > 0
        top = jnp.maximum(sp - 1, 0)
        node = stack[rows, top]
        sp = jnp.where(active, sp - 1, sp)

        bmin = mesh.bvh_min[node]
        bmax = mesh.bvh_max[node]
        box_hit, _ = intersect_box_enter(o, d, bmin, bmax, t_best)
        box_hit &= active

        child = mesh.bvh_child[node]
        is_leaf = child < 0

        # --- leaf: test up to max_leaf triangles (masked static unroll)
        eoff = mesh.bvh_eoff[node]
        ecnt = mesh.bvh_ecnt[node]
        leaf_m = box_hit & is_leaf
        emax = mesh.bvh_elems.shape[0] - 1
        for kk in range(max_leaf):
            fid = mesh.bvh_elems[jnp.minimum(eoff + kk, emax)]
            m = leaf_m & (kk < ecnt)
            a = mesh.tri_a[fid]
            b = mesh.tri_b[fid]
            c = mesh.tri_c[fid]
            tt, fr, tba, tbb, valid = intersect_triangle(o, d, a, b, c, t_best)
            upd = m & valid
            t_best = jnp.where(upd, tt, t_best)
            face = jnp.where(upd, fid, face)
            front = jnp.where(upd, fr, front)
            ba = jnp.where(upd, tba, ba)
            bb = jnp.where(upd, tbb, bb)

        # --- internal: push far child then near child
        push = box_hit & ~is_leaf
        c1 = jnp.maximum(child, 0)
        c2 = c1 + 1
        _, e1 = intersect_box_enter(o, d, mesh.bvh_min[c1], mesh.bvh_max[c1], t_best)
        _, e2 = intersect_box_enter(o, d, mesh.bvh_min[c2], mesh.bvh_max[c2], t_best)
        near = jnp.where(e1 <= e2, c1, c2)
        far = jnp.where(e1 <= e2, c2, c1)

        slot0 = jnp.minimum(sp, depth - 1)
        stack = stack.at[rows, slot0].set(jnp.where(push, far, stack[rows, slot0]))
        sp = jnp.where(push, jnp.minimum(sp + 1, depth - 1), sp)
        slot1 = jnp.minimum(sp, depth - 1)
        stack = stack.at[rows, slot1].set(jnp.where(push, near, stack[rows, slot1]))
        sp = jnp.where(push, jnp.minimum(sp + 1, depth - 1), sp)

        return (sp, stack, t_best, face, front, ba, bb)

    state = jax.lax.while_loop(cond, body, state)
    _, _, t, face, front, ba, bb = state
    return t, face, front, ba, bb


def trace(scene, o: jnp.ndarray, d: jnp.ndarray) -> Hit:
    """Closest hit of world rays (o, d) against the whole scene."""
    n = o.shape[0]
    hit = _empty_hit(n)
    # era-dependent sphere epsilon (Proj3/4: 0; Proj5+: 1e-3) — a
    # static GpuScene field set from the profile by the renderer
    zero = float(getattr(scene, "isect_zero", 1e-3))
    tb = bool(getattr(scene, "ref_exact", False))
    mr = bool(getattr(scene, "sphere_minroot", False))
    hit = _scan_group(scene.spheres, o, d, hit, KIND_SPHERE,
                      lambda lo, ld, tp: intersect_sphere(
                          lo, ld, tp, zero=zero, textbook=tb,
                          minroot=mr))
    hit = _scan_group(scene.planes, o, d, hit, KIND_PLANE, intersect_plane)

    if scene.mesh is not None and scene.num_mesh_inst > 0:
        algo = getattr(scene, "mesh_algo", "auto")
        if algo == "auto":
            algo = "pallas" if jax.default_backend() == "tpu" else "dense"
        slots = scene.mesh_inst_slots
        for i in range(scene.num_mesh_inst):
            itm = scene.mesh_inst.itm[i]
            pos = scene.mesh_inst.pos[i]
            lo, ld = _to_local(itm, pos, o, d)
            if algo == "bvh":
                root = scene.mesh.slot_root[scene.mesh_inst.mesh_slot[i]]
                t, face, front, ba, bb = bvh_traverse(
                    scene.mesh, root, lo, ld,
                    hit.t, hit.face, hit.front, hit.ba, hit.bb)
            elif algo in ("pallas", "pallas_interpret"):
                from rtf_tpu.ops.pallas_mesh import (
                    mesh_closest_hit, pack_rays)
                slot = int(slots[i])
                col0, fpad, ar0, nt, (mlo, mhi) = scene.mesh.slot_pack[slot]
                tris = jax.lax.slice_in_dim(scene.mesh.tri_packed,
                                            col0, col0 + fpad, axis=1)
                aabb = jax.lax.slice_in_dim(scene.mesh.tile_aabb,
                                            ar0, ar0 + nt, axis=0)
                rays8, npad = pack_rays(lo, ld, hit.t)
                tp, face_p, fr_p, ba_p, bb_p = mesh_closest_hit(
                    rays8, tris, aabb, face0=col0,
                    mesh_lo=mlo, mesh_hi=mhi,
                    interpret=(algo == "pallas_interpret"))
                nr = lo.shape[0]
                got = face_p[:nr] >= 0
                # packed (Morton) id -> arena face id
                face_a = scene.mesh.tri_perm[
                    jnp.clip(face_p[:nr], 0, scene.mesh.tri_perm.shape[0] - 1)]
                t = jnp.where(got, tp[:nr], BIGFLOAT)
                face = jnp.where(got, face_a, hit.face)
                front = jnp.where(got, fr_p[:nr] > 0.5, hit.front)
                ba = jnp.where(got, ba_p[:nr], hit.ba)
                bb = jnp.where(got, bb_p[:nr], hit.bb)
            else:
                t, face, front, ba, bb = _dense_mesh(
                    scene.mesh, lo, ld,
                    hit.t, hit.face, hit.front, hit.ba, hit.bb,
                    scene.mesh.slot_faces[int(slots[i])])
            upd = t < hit.t
            hit = hit.replace(
                t=jnp.where(upd, t, hit.t),
                kind=jnp.where(upd, KIND_MESH, hit.kind),
                inst=jnp.where(upd, i, hit.inst),
                face=jnp.where(upd, face, hit.face),
                front=jnp.where(upd, front, hit.front),
                ba=jnp.where(upd, ba, hit.ba),
                bb=jnp.where(upd, bb, hit.bb),
            )
    return hit


@struct.dataclass
class Surface:
    """Full shading-ready hit attributes (the rest of HitInfo)."""
    p: jnp.ndarray      # [N,3] world hit position
    n: jnp.ndarray      # [N,3] world shading normal (normalized)
    uvw: jnp.ndarray    # [N,3] texture coords
    mtl: jnp.ndarray    # [N] int32 global material id
    front: jnp.ndarray  # [N] bool
    t: jnp.ndarray      # [N]
    valid: jnp.ndarray  # [N] bool


def resolve_surface(scene, o, d, hit: Hit) -> Surface:
    """Reconstruct p/N/uvw/material for the winning primitive
    (FromNodeCoords + per-object attribute code, scene.h:509-513)."""
    n_rays = o.shape[0]
    # missed lanes get a far sentinel position: downstream shadow/GI rays
    # from dead lanes then live in blocks whose reach box misses every
    # mesh tile, so the Pallas kernel's block culling skips them
    p_world = jnp.where(hit.is_hit[:, None],
                        o + hit.t[..., None] * d, 1.0e7)

    nrm_w = jnp.zeros((n_rays, 3), o.dtype)
    uvw = jnp.full((n_rays, 3), 0.5, o.dtype)
    mtl = jnp.zeros((n_rays,), jnp.int32)

    def group_attrs(group, attr_fn):
        from rtf_tpu.ops.texture import _sel_rows
        itm = _sel_rows(group.itm, hit.inst)
        pos = _sel_rows(group.pos, hit.inst)
        nrm = _sel_rows(group.nrm, hit.inst)
        lo = mat3_apply_batched(itm, o - pos)
        ld = mat3_apply_batched(itm, d)
        _, ln, luv = attr_fn(lo, ld, hit.t)
        wn = normalize(mat3_apply_batched(nrm, ln))
        return wn, luv, _sel_rows(group.mtl, hit.inst)

    if scene.num_spheres > 0:
        wn, luv, m = group_attrs(scene.spheres, sphere_attributes)
        mask = (hit.kind == KIND_SPHERE)[:, None]
        nrm_w = jnp.where(mask, wn, nrm_w)
        uvw = jnp.where(mask, luv, uvw)
        mtl = jnp.where(hit.kind == KIND_SPHERE, m, mtl)

    if scene.num_planes > 0:
        wn, luv, m = group_attrs(scene.planes, plane_attributes)
        mask = (hit.kind == KIND_PLANE)[:, None]
        nrm_w = jnp.where(mask, wn, nrm_w)
        uvw = jnp.where(mask, luv, uvw)
        mtl = jnp.where(hit.kind == KIND_PLANE, m, mtl)

    if scene.mesh is not None and scene.num_mesh_inst > 0:
        mesh = scene.mesh
        f = hit.face
        ba = hit.ba[:, None]
        bb = hit.bb[:, None]
        bc = 1.0 - ba - bb
        # single wide gathers instead of 7 narrow ones (attr packing)
        an = mesh.attr_n[f]                       # [N,16]
        at = mesh.attr_t[f]
        ln = an[:, 0:3] * ba + an[:, 3:6] * bb + an[:, 6:9] * bc
        luv = at[:, 0:3] * ba + at[:, 3:6] * bb + at[:, 6:9] * bc
        from rtf_tpu.ops.texture import _sel_rows
        nrm = _sel_rows(scene.mesh_inst.nrm, hit.inst)
        wn = normalize(mat3_apply_batched(nrm, ln))
        mask = (hit.kind == KIND_MESH)[:, None]
        nrm_w = jnp.where(mask, wn, nrm_w)
        uvw = jnp.where(mask, luv, uvw)
        mtl = jnp.where(hit.kind == KIND_MESH,
                        an[:, 9].astype(jnp.int32), mtl)
        # Mesh hit POINT from the barycentric vertex combination in node
        # space, pushed to world through the forward transform — exactly
        # the reference's `hInfo.p = alpha*A + beta*B + gamma*C` +
        # FromNodeCoords (Proj13 objects.h:199, scene.h:509-513).  The
        # ray-parameterized o + t*d point drifts off the surface by
        # ~t*ulp/sin(theta) at grazing incidence (t~64 in the prj13 box
        # scene => ~1e-4 world units), which shifted shadow-ray origins
        # at the teapot's self-shadowing terminator and flipped
        # visibility at the exact boundary pixels (GOLDENS.md prj13c
        # decomposition); the on-surface point kills that drift class.
        p_node = (mesh.tri_a[f] * ba + mesh.tri_b[f] * bb
                  + mesh.tri_c[f] * bc)
        fwd = _sel_rows(scene.mesh_inst.tm, hit.inst)
        ipos = _sel_rows(scene.mesh_inst.pos, hit.inst)
        pw = mat3_apply_batched(fwd, p_node) + ipos
        p_world = jnp.where(mask & hit.is_hit[:, None], pw, p_world)

    return Surface(p=p_world, n=nrm_w, uvw=uvw, mtl=mtl,
                   front=hit.front, t=hit.t, valid=hit.is_hit)


def footprint_duv(scene, o, d, hit: Hit, surf: Surface,
                  xang: float, yang: float):
    """Texture-space footprint derivatives (duv0, duv1), each [N,2] —
    the analog of the reference's disabled `calculateduvw`
    (RayTracingProj7 objects.h:81-87 plane, :152-158 mesh): the pixel's
    angular extent (xang/yang = per-pixel width/height at unit distance)
    is projected onto the hit tangent plane,

        f0 = t * yang * normalize(d x N),
        f1 = t * xang * normalize((d x N) x N),

    then converted from world to uv space through each primitive's
    parameterization (the reference added the world vectors to uvw
    directly; we convert exactly: plane uv = (local.xy+1)/2, sphere
    angular-map derivative, mesh per-face sqrt(uv-area/world-area))."""
    n_rays = o.shape[0]
    nw = surf.n
    yhat = jnp.cross(d, nw)
    ylen = jnp.linalg.norm(yhat, axis=-1, keepdims=True)
    # head-on rays (d parallel to N) degenerate d x N; fall back to any
    # tangent frame of N (the reference formula would NaN here)
    alt = jnp.where((jnp.abs(nw[:, :1]) < 0.9),
                    jnp.asarray([1.0, 0.0, 0.0], o.dtype),
                    jnp.asarray([0.0, 1.0, 0.0], o.dtype))
    fallback = normalize(jnp.cross(nw, alt))
    yhat = jnp.where(ylen > 1e-6, yhat / jnp.maximum(ylen, 1e-12),
                     fallback)
    xhat = normalize(jnp.cross(yhat, nw))
    t = hit.t[:, None]
    # grazing incidence stretches the footprint along xhat by 1/|N.d|
    # (ray-cone projection; clamped so silhouettes stay bounded)
    stretch = 1.0 / jnp.maximum(jnp.abs(dot(d, nw))[:, None], 0.05)
    f0 = t * yang * yhat
    f1 = t * xang * xhat * stretch

    duv0 = jnp.zeros((n_rays, 2), o.dtype)
    duv1 = jnp.zeros((n_rays, 2), o.dtype)

    from rtf_tpu.ops.texture import _sel_rows

    def local_pair(group):
        itm = _sel_rows(group.itm, hit.inst)
        return mat3_apply_batched(itm, f0), mat3_apply_batched(itm, f1)

    if scene.num_planes > 0:
        lf0, lf1 = local_pair(scene.planes)
        m = (hit.kind == KIND_PLANE)[:, None]
        duv0 = jnp.where(m, lf0[:, :2] * 0.5, duv0)
        duv1 = jnp.where(m, lf1[:, :2] * 0.5, duv1)

    if scene.num_spheres > 0:
        itm = _sel_rows(scene.spheres.itm, hit.inst)
        pos = _sel_rows(scene.spheres.pos, hit.inst)
        lp = mat3_apply_batched(itm, surf.p - pos)   # unit-sphere point
        lf0, lf1 = local_pair(scene.spheres)
        r2xy = jnp.maximum(lp[:, 0] ** 2 + lp[:, 1] ** 2, 1e-8)
        vden = jnp.pi * jnp.sqrt(jnp.maximum(1.0 - lp[:, 2] ** 2, 1e-8))

        def sph_duv(lf):
            du = ((lp[:, 0] * lf[:, 1] - lp[:, 1] * lf[:, 0])
                  / (2.0 * jnp.pi * r2xy))
            dv = lf[:, 2] / vden
            return jnp.stack([du, dv], axis=-1)

        m = (hit.kind == KIND_SPHERE)[:, None]
        duv0 = jnp.where(m, sph_duv(lf0), duv0)
        duv1 = jnp.where(m, sph_duv(lf1), duv1)

    if scene.mesh is not None and scene.num_mesh_inst > 0:
        itm = _sel_rows(scene.mesh_inst.itm, hit.inst)
        lf0 = mat3_apply_batched(itm, f0)
        lf1 = mat3_apply_batched(itm, f1)
        uvscale = scene.mesh.attr_t[hit.face, 9]
        s0 = jnp.linalg.norm(lf0, axis=-1) * uvscale
        s1 = jnp.linalg.norm(lf1, axis=-1) * uvscale
        z = jnp.zeros_like(s0)
        m = (hit.kind == KIND_MESH)[:, None]
        duv0 = jnp.where(m, jnp.stack([s0, z], -1), duv0)
        duv1 = jnp.where(m, jnp.stack([z, s1], -1), duv1)

    ok = surf.valid[:, None]
    return jnp.where(ok, duv0, 0.0), jnp.where(ok, duv1, 0.0)


def trace_shadow(scene, o: jnp.ndarray, d: jnp.ndarray,
                 t_max) -> jnp.ndarray:
    """Shadow factor: 1.0 lit, 0.0 occluded (GenLight::Shadow,
    Final/main.cpp:499-513; bias 1e-14, hit must satisfy bias < z < t_max).
    `d` may be unnormalized — t is in units of |d| like the reference."""
    hit = trace(scene, o, d)
    occluded = hit.is_hit & (hit.t > 1e-14) & (hit.t < t_max)
    return jnp.where(occluded, 0.0, 1.0)
