"""Micro-bench: per-tile cost of the seg hit kernel's MXU sweep.

Times ONE _seg_hit_kernel dispatch on scene_b's mesh tables over
controlled ray populations:
  * interested  — hemisphere child rays that enter a mesh root AABB
    (grouped, ~99% block occupancy, the expensive case)
  * meshfree    — child rays that miss every root AABB (the gated case:
    every tile's matmul is pl.when-skipped, only loop overhead remains)
with the full 78-tile table and a truncated prefix, so the linear fit
separates fori_loop-iteration overhead from slab+matmul work.

Usage: python -m tools.profile_tiles
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tools.cache  # noqa: F401

SCENE_B = ("/root/reference/RayTracingFinal/RayTracingFinal/"
           "data/scene_b.xml")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rtf_tpu.scene import build_scene, load_scene

    cwd = os.getcwd()
    os.chdir(os.path.dirname(SCENE_B) + "/..")
    try:
        desc = load_scene(SCENE_B)
        desc.camera.width, desc.camera.height = 400, 300
        scene = build_scene(desc)
    finally:
        os.chdir(cwd)

    from rtf_tpu.ops.trace import resolve_surface, trace
    from rtf_tpu.render.camera import pixel_order, primary_rays
    from rtf_tpu.render.fused import frozen_consts, mxu_tables

    w, h = 400, 300
    order = jnp.asarray(pixel_order(w, h))
    o, d = primary_rays(scene, order % w, order // w,
                        jnp.zeros((w * h,)), None)
    hit = trace(scene, o, d)
    surf = resolve_surface(scene, o, d, hit)
    p = np.asarray(surf.p)
    n = np.asarray(surf.n)

    rng = np.random.default_rng(0)
    u1, u2 = rng.random(w * h), rng.random(w * h)
    nz = n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-9)
    a = np.where(np.abs(nz[:, 0:1]) < 0.4, np.array([[1.0, 0, 0]]),
                 np.array([[0.0, 0, 1]]))
    t1 = np.cross(nz, a)
    t1 /= np.maximum(np.linalg.norm(t1, axis=1, keepdims=True), 1e-9)
    t2 = np.cross(nz, t1)
    st_, ct = np.sqrt(u1), np.sqrt(1 - u1)
    ph = 2 * np.pi * u2
    dirs = (t1 * (st_ * np.cos(ph))[:, None]
            + t2 * (st_ * np.sin(ph))[:, None] + nz * ct[:, None])

    consts = frozen_consts(scene)
    cobj = consts.obj
    interested = np.zeros(w * h, bool)
    for inst in cobj["mesh_insts"]:
        itm = np.asarray(inst["itm"]).reshape(3, 3)
        pos = np.asarray(inst["pos"])
        lo = np.asarray(inst["mesh_lo"])
        hi = np.asarray(inst["mesh_hi"])
        ol = (p - pos) @ itm.T
        dl = dirs @ itm.T
        idl = 1.0 / np.where(np.abs(dl) < 1e-20, 1e-20, dl)
        t0 = (lo - ol) * idl
        t1b = (hi - ol) * idl
        tmin = np.minimum(t0, t1b).max(1).clip(min=0)
        tmax = np.maximum(t0, t1b).min(1)
        interested |= (tmax >= tmin)

    NL = 128 * 1024   # lanes per timed dispatch (128 blocks)

    def rayset(sel):
        idx = np.flatnonzero(sel)
        idx = np.resize(idx, NL)
        return (tuple(jnp.asarray(p[idx, c]) for c in range(3)),
                tuple(jnp.asarray(dirs[idx, c]) for c in range(3)))

    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from rtf_tpu.render.fused import SUB, TRI_LANES, _pack_rays_sh, \
        R_ALIVE, R_D, R_O
    from rtf_tpu.render.fused_seg import HIT_ROWS, _blk4, _seg_hit_kernel
    from rtf_tpu.ops.pallas_util import out_struct

    trit, shade, aabb = mxu_tables(scene)

    def run_case(label, o3, d3, ntiles):
        # truncate to a tile prefix; patch each instance's (row0, nt)
        tr = trit[:ntiles]
        sh = shade[:ntiles]
        ab = np.asarray(aabb)[:ntiles].copy()
        # octant order columns index global rows; clamp into the prefix
        ab[:, 6:14] = np.clip(ab[:, 6:14], 0, ntiles - 1)
        insts = []
        for inst in cobj["mesh_insts"]:
            row0, nt = inst["mxu"]
            if row0 >= ntiles:
                continue
            inst = dict(inst)
            inst["mxu"] = (row0, min(nt, ntiles - row0))
            insts.append(inst)
        cc = dict(cobj)
        cc["mesh_insts"] = insts

        n = o3[0].shape[0]
        nblk = n // (SUB * TRI_LANES)
        cols = {R_ALIVE: jnp.ones((n,), jnp.float32)}
        for c in range(3):
            cols[R_O + c] = o3[c]
            cols[R_D + c] = d3[c]
        rays = _pack_rays_sh(cols)
        kern = functools.partial(_seg_hit_kernel, consts=cc,
                                 has_mesh_tables=True, stream_mesh=False)
        mesh_specs = [
            pl.BlockSpec(tr.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sh.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(ab.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ]
        cparams = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)

        @jax.jit
        def go(rays, tr, sh, ab):
            return pl.pallas_call(
                kern, grid=(nblk,),
                out_shape=out_struct(
                    (nblk, HIT_ROWS, SUB, TRI_LANES), jnp.float32, rays),
                in_specs=[_blk4(16)] + mesh_specs,
                out_specs=_blk4(HIT_ROWS),
                scratch_shapes=[
                    pltpu.VMEM((8, SUB, TRI_LANES), jnp.float32)],
                compiler_params=cparams,
            )(rays, jnp.asarray(tr), jnp.asarray(sh), jnp.asarray(ab))

        out = go(rays, tr, sh, ab)
        np.asarray(out[0, 0]).mean()
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            out = go(rays, tr, sh, ab)
            np.asarray(out[0, 0]).mean()
            best = min(best, time.perf_counter() - t0)
        print(f"{label:12s} ntiles={ntiles:3d}  {best*1e3:8.2f} ms "
              f"({best*1e9/ (nblk):.0f} ns/block)", flush=True)
        return best

    ri = rayset(interested)
    rf = rayset(~interested)
    only = os.environ.get("RTF_PROFILE_TILES", "")
    if only == "noresolve":
        # perf bound for DEFERRED winner resolve: the sweep tracks only
        # (t, face id) per tile visit; normals/mtl/uv resolution (the 3
        # one-hot HIGHEST matmuls + interp) is assumed moved off-kernel
        import rtf_tpu.render.fused as F
        orig = F._mesh_closest_mxu

        def noresolve(o3, d3, consts, st, t_cap_scalar, mesh_refs,
                      need_uv=False):
            import jax as _jax
            import jax.numpy as _jnp
            trit_ref, shade_ref, aabb_ref = mesh_refs[:3]
            for inst in consts["mesh_insts"]:
                row0, nt = inst["mxu"]
                lo3 = F._mat3_apply_const(inst["itm"],
                                          o3[0] - inst["pos"][0],
                                          o3[1] - inst["pos"][1],
                                          o3[2] - inst["pos"][2])
                ld3 = F._mat3_apply_const(inst["itm"], d3[0], d3[1],
                                          d3[2])
                ild3 = F._inv_dir(ld3)
                rays16 = F._rays16(lo3, ld3)
                oct_col = F._octant_col(ld3)

                def tile(j, acc, rays16=rays16, lo3=lo3, ild3=ild3):
                    jj = aabb_ref[j, oct_col].astype(_jnp.int32)

                    @pl.when(F._lane_slab_any(aabb_ref, jj, lo3, ild3,
                                              st[0]))
                    def _():
                        trit_j = trit_ref[jj]
                        t, valid, *_ = F._mxu_pair(rays16, trit_j)
                        tt = _jnp.where(valid & (t < t_cap_scalar), t,
                                        F.BIG)
                        tmin = _jnp.min(tt, axis=1, keepdims=True)
                        col = _jax.lax.broadcasted_iota(
                            _jnp.int32, tt.shape, 1)
                        fid = _jnp.where(tt == tmin, col,
                                         _jnp.int32(2 ** 30))
                        fmin = _jnp.min(fid, axis=1, keepdims=True)
                        t8 = F._to88(tmin[:, 0])
                        f8 = F._to88(fmin[:, 0].astype(_jnp.float32))
                        ok = t8 < st[0]
                        st[0] = _jnp.where(ok, t8, st[0])
                        st[4] = _jnp.where(
                            ok, f8 + jj.astype(_jnp.float32) * 128.0,
                            st[4])
                    return acc

                jax.lax.fori_loop(row0, row0 + nt, tile, 0)

        F._mesh_closest_mxu = noresolve
        try:
            for ntiles in (78, 33):
                run_case("defer-int", ri[0], ri[1], ntiles)
                run_case("defer-free", rf[0], rf[1], ntiles)
        finally:
            F._mesh_closest_mxu = orig
        return
    for ntiles in (78, 33, 8):
        run_case("interested", ri[0], ri[1], ntiles)
        run_case("meshfree", rf[0], rf[1], ntiles)


if __name__ == "__main__":
    main()
