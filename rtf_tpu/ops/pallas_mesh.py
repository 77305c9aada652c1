"""Pallas TPU kernel: fused dense ray x triangle closest-hit (VPU).

Orientation is the whole trick.  A [rays, tris] outer product needs one
operand broadcast per pair-term; on TPU, broadcasting along LANES is
expensive (cross-lane splat) while broadcasting along SUBLANES is free.
So:

* TRIANGLES ride the 128-wide lane dimension: per-triangle constants are
  [1, 128] row slices of a VMEM-resident table and broadcast natively;
* RAYS ride the sublane dimension in subtiles of 8: the 7 per-ray
  scalars are lane-broadcast ONCE per subtile ([8,1] -> [8,128]) and
  reused across every triangle tile — amortized to ~nothing.

Each inner step evaluates ~50 VPU ops on an [8 rays, 128 tris] vreg,
with the running best hit in 5 [8, 128] registers; one lane-reduction +
one-hot select per subtile collapses it to per-ray outputs.

The triangle test is algebraically identical to intersect_triangle
(TriObj::IntersectTriangle, objects.h:226-268): normalized-normal plane
test with |dn| >= 1e-7, t > 1e-3, strict t < t_init, dominant-axis
projected barycentrics (the area terms are expanded into per-triangle
affine coefficients K, L so the per-pair cost is 3 madds per bary),
front = dn <= 0.

Table layout [16, F_pad] (host-packed): rows 0-2 unit normal, 3 n.a,
4-6 K (bary a), 7-9 L (bary b), 10 axis==0 mask, 11 axis==2 mask.
Padding columns are all-zero => dn == 0 => never valid.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ZERO = 1e-3        # reference `bias` epsilon (objects.h:226-268)
DZ_EPS = 1e-7      # reference |dz| cutoff
BIGFLOAT = 1.0e30

RAY_BLOCK = 512    # rays per program
RAY_SUB = 8        # ray subtile (sublanes)
TRI_LANES = 128    # triangle tile (lanes)


def _morton3(x: np.ndarray) -> np.ndarray:
    """Interleave 10-bit quantized xyz into a 30-bit Morton key."""
    def spread(v):
        v = v.astype(np.uint64)
        v = (v | (v << 16)) & np.uint64(0x030000FF)
        v = (v | (v << 8)) & np.uint64(0x0300F00F)
        v = (v | (v << 4)) & np.uint64(0x030C30C3)
        v = (v | (v << 2)) & np.uint64(0x09249249)
        return v
    lo = x.min(axis=0)
    ext = np.maximum(x.max(axis=0) - lo, 1e-30)
    q = np.clip(((x - lo) / ext * 1023.0), 0, 1023).astype(np.uint32)
    return (spread(q[:, 0]) << np.uint64(2)) | (spread(q[:, 1]) << np.uint64(1)) \
        | spread(q[:, 2])


def pack_triangles(a: np.ndarray, b: np.ndarray, c: np.ndarray,
                   na: np.ndarray = None, nb: np.ndarray = None,
                   nc: np.ndarray = None, ta: np.ndarray = None,
                   tb: np.ndarray = None, tc: np.ndarray = None,
                   mtl: np.ndarray = None):
    """Host-side packed triangle table.

    Faces are Morton-sorted by centroid so each 128-face lane tile is
    spatially coherent, enabling per-tile AABB culling in the kernel.

    Returns (table [32, F_pad] f32, perm [F_pad] int32 packed->original
    face id (padding cols repeat the last id), tile_aabb [nt, 8] f32
    rows (xlo ylo zlo xhi yhi zhi 0 0), mesh_bounds (lo3, hi3) floats).

    Rows 0-11: intersection constants (see module docstring).
    Rows 12-20: vertex normals a/b/c (when `na..nc` given).
    Rows 21-29: vertex uvw a/b/c (when `ta..tc` given).
    Row 30: per-face material id (when `mtl` given).
    Rows 32-37: per-face AABB lo/hi (culling).
    """
    f = len(a)
    fp = max(TRI_LANES, ((f + TRI_LANES - 1) // TRI_LANES) * TRI_LANES)
    nt = fp // TRI_LANES
    out = np.zeros((40, fp), np.float32)
    perm = np.zeros(fp, np.int32)
    aabb = np.zeros((nt, 8), np.float32)
    if f == 0:
        return out, perm, aabb, ((0.0,) * 3, (0.0,) * 3)
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    c = np.asarray(c, np.float32)
    order = np.argsort(_morton3(((a + b + c) / 3.0)), kind="stable")
    a, b, c = a[order], b[order], c[order]
    perm[:f] = order.astype(np.int32)
    perm[f:] = perm[f - 1] if f > 0 else 0

    tri_lo = np.minimum(np.minimum(a, b), c)
    tri_hi = np.maximum(np.maximum(a, b), c)
    for j in range(nt):
        lo = j * TRI_LANES
        hi = min(f, lo + TRI_LANES)
        if hi > lo:
            aabb[j, 0:3] = tri_lo[lo:hi].min(axis=0)
            aabb[j, 3:6] = tri_hi[lo:hi].max(axis=0)
        else:  # all-padding tile: empty box that never overlaps
            aabb[j, 0:3] = 1e30
            aabb[j, 3:6] = -1e30
    mesh_bounds = (tuple(float(x) for x in tri_lo.min(axis=0)),
                   tuple(float(x) for x in tri_hi.max(axis=0)))
    n = np.cross(b - a, c - a)
    ln = np.linalg.norm(n, axis=-1, keepdims=True)
    n = n / np.where(ln > 0, ln, 1.0)
    axis = np.argmax(np.abs(n), axis=-1)

    # projected (u, v) coords per dominant axis: x->(y,z), y->(x,z), z->(x,y)
    def uv(p):
        u = np.where(axis == 0, p[:, 1], p[:, 0])
        v = np.where(axis == 2, p[:, 1], p[:, 2])
        return u, v

    au, av = uv(a)
    bu, bv = uv(b)
    cu, cv = uv(c)
    # signed double area of the projected triangle, reference component
    # conventions (TriangleArea, objects.h:146-157; the y-axis component
    # is NOT sign-flipped — quirk preserved, it cancels in the ratio)
    total = (bu - au) * (cv - av) - (cu - au) * (bv - av)
    inv_total = np.where(total != 0, 1.0 / np.where(total == 0, 1.0, total), 0.0)
    # area(p,b,c) = K0' + K1'*pu + K2'*pv ; bary_a = area * inv_total
    k0 = (bu * cv - cu * bv) * inv_total
    k1 = (bv - cv) * inv_total
    k2 = (cu - bu) * inv_total
    # area(p,c,a)
    l0 = (cu * av - au * cv) * inv_total
    l1 = (cv - av) * inv_total
    l2 = (au - cu) * inv_total

    out[0, :f] = n[:, 0]
    out[1, :f] = n[:, 1]
    out[2, :f] = n[:, 2]
    out[3, :f] = np.sum(n * a, axis=-1)
    out[4, :f] = k0
    out[5, :f] = k1
    out[6, :f] = k2
    out[7, :f] = l0
    out[8, :f] = l1
    out[9, :f] = l2
    out[10, :f] = (axis == 0).astype(np.float32)
    out[11, :f] = (axis == 2).astype(np.float32)
    # degenerate triangles (zero normal or zero area): force invalid
    degen = (ln[:, 0] == 0) | (total == 0)
    for r in range(12):
        out[r, :f] = np.where(degen, 0.0, out[r, :f])
    # shading attributes (Morton order), for in-kernel surface resolve
    for base, arr in ((12, na), (15, nb), (18, nc),
                      (21, ta), (24, tb), (27, tc)):
        if arr is not None:
            out[base:base + 3, :f] = np.asarray(arr, np.float32)[order].T
    if mtl is not None:
        out[30, :f] = np.asarray(mtl, np.float32)[order]
    out[32:35, :f] = tri_lo[:f].T
    out[35:38, :f] = tri_hi[:f].T
    return out, perm, aabb, mesh_bounds


def _mesh_kernel(rays_ref, tris_ref, aabb_ref, out_ref, flags_ref, st_ref,
                 *, ntiles: int, face0: int, mesh_lo: tuple, mesh_hi: tuple):
    # rays_ref [RAY_BLOCK, 8]: cols ox oy oz dx dy dz t_init pad
    # tris_ref [16, F_pad]; aabb_ref [nt, 8] SMEM tile boxes;
    # out_ref [RAY_BLOCK, 8]: t face front ba bb . . .
    # flags_ref SMEM [nt] per-tile overlap; st_ref VMEM [5, 8, 128] state
    shape = (RAY_SUB, TRI_LANES)
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32)

    # ---- block-level culling bounds (scalars) ----------------------------
    # reach box = origin box swept by T * direction box, T = conservative
    # travel bound (L1 distance from the origin box to the farthest mesh
    # bbox corner — an overestimate of any useful hit distance).
    olo = [jnp.min(rays_ref[:, k:k + 1]) for k in range(3)]
    ohi = [jnp.max(rays_ref[:, k:k + 1]) for k in range(3)]
    dlo = [jnp.min(rays_ref[:, 3 + k:4 + k]) for k in range(3)]
    dhi = [jnp.max(rays_ref[:, 3 + k:4 + k]) for k in range(3)]
    t_cap = jnp.max(rays_ref[:, 6:7])          # largest t_init in block
    big_dist = sum(
        jnp.maximum(jnp.abs(mesh_hi[k] - olo[k]), jnp.abs(ohi[k] - mesh_lo[k]))
        for k in range(3))
    # distance -> t units: t = dist / |d|, and |d| >= Linf(d); use the
    # block-min Linf as the conservative divisor (local-space rays from
    # scaled instances have |d| != 1)
    linf = jnp.maximum(jnp.maximum(jnp.abs(rays_ref[:, 3:4]),
                                   jnp.abs(rays_ref[:, 4:5])),
                       jnp.abs(rays_ref[:, 5:6]))
    dmin = jnp.maximum(jnp.min(linf), 1e-20)
    reach = jnp.minimum(big_dist / dmin, t_cap)
    rlo = [olo[k] + reach * jnp.minimum(dlo[k], 0.0) for k in range(3)]
    rhi = [ohi[k] + reach * jnp.maximum(dhi[k], 0.0) for k in range(3)]

    # per-tile overlap flags, once per block (pl.when lowers to a real
    # branch — lax.cond would evaluate both sides)
    def flag_tile(j, acc):
        ov = ((rhi[0] >= aabb_ref[j, 0]) & (rlo[0] <= aabb_ref[j, 3])
              & (rhi[1] >= aabb_ref[j, 1]) & (rlo[1] <= aabb_ref[j, 4])
              & (rhi[2] >= aabb_ref[j, 2]) & (rlo[2] <= aabb_ref[j, 5]))
        ovi = ov.astype(jnp.int32)
        flags_ref[j] = ovi
        return acc | ovi

    any_ov = jax.lax.fori_loop(0, ntiles, flag_tile, jnp.int32(0))

    @pl.when(any_ov == 0)
    def _miss_block():
        t_init_col = rays_ref[:, 6:7]                       # [512, 1]
        z = jnp.zeros_like(t_init_col)
        out_ref[:, :] = jnp.concatenate(
            [t_init_col, z - 1.0, z, z, z, z, z, z], axis=1)

    @pl.when(any_ov != 0)
    def _hit_block():
        _block_body(rays_ref, tris_ref, out_ref, flags_ref, st_ref,
                    ntiles=ntiles, face0=face0, shape=shape, col=col)


def _block_body(rays_ref, tris_ref, out_ref, flags_ref, st_ref, *,
                ntiles, face0, shape, col):
    def subtile(k, _):
        rays = rays_ref[pl.ds(k * RAY_SUB, RAY_SUB), :]      # [8, 8]

        def bc(i):
            return jnp.broadcast_to(rays[:, i:i + 1], shape)  # [8, 128]

        ox, oy, oz = bc(0), bc(1), bc(2)
        dx, dy, dz = bc(3), bc(4), bc(5)
        t_init = bc(6)

        # running state in VMEM scratch so tri_tile can be a real branch
        st_ref[0] = t_init
        st_ref[1] = jnp.full(shape, -1.0, jnp.float32)   # face
        st_ref[2] = jnp.zeros(shape, jnp.float32)        # front
        st_ref[3] = jnp.zeros(shape, jnp.float32)        # ba
        st_ref[4] = jnp.zeros(shape, jnp.float32)        # bb

        def tri_tile(j, acc):
            @pl.when(flags_ref[j] != 0)
            def _():
                tri_tile_body(j)
            return acc

        def tri_tile_body(j):
            t_best = st_ref[0]
            tri = tris_ref[:, pl.ds(j * TRI_LANES, TRI_LANES)]  # [16, 128]
            nx, ny, nz = tri[0:1, :], tri[1:2, :], tri[2:3, :]
            na = tri[3:4, :]
            k0, k1, k2 = tri[4:5, :], tri[5:6, :], tri[6:7, :]
            l0, l1, l2 = tri[7:8, :], tri[8:9, :], tri[9:10, :]
            is_x, is_z = tri[10:11, :], tri[11:12, :]

            dn = dx * nx + dy * ny + dz * nz
            pn = ox * nx + oy * ny + oz * nz - na
            bad = jnp.abs(dn) < DZ_EPS
            t = -pn / jnp.where(bad, DZ_EPS, dn)
            px = ox + t * dx
            py = oy + t * dy
            pz = oz + t * dz
            pu = jnp.where(is_x > 0.0, py, px)
            pv = jnp.where(is_z > 0.0, py, pz)
            ba_t = k0 + k1 * pu + k2 * pv
            bb_t = l0 + l1 * pu + l2 * pv
            bc_t = 1.0 - ba_t - bb_t

            valid = (~bad) & (t > ZERO) & (t < t_best)
            valid &= (ba_t >= 0.0) & (bb_t >= 0.0) & (bc_t >= 0.0)

            fid = jnp.float32(face0 + j * TRI_LANES) + col
            st_ref[0] = jnp.where(valid, t, t_best)
            st_ref[1] = jnp.where(valid, fid, st_ref[1])
            st_ref[2] = jnp.where(
                valid, jnp.where(dn <= 0.0, 1.0, 0.0), st_ref[2])
            st_ref[3] = jnp.where(valid, ba_t, st_ref[3])
            st_ref[4] = jnp.where(valid, bb_t, st_ref[4])

        jax.lax.fori_loop(0, ntiles, tri_tile, 0)
        t_best, face = st_ref[0], st_ref[1]
        front, ba, bb = st_ref[2], st_ref[3], st_ref[4]

        # collapse lanes: min-t, lowest face id among exact ties
        t_min = jnp.min(t_best, axis=1, keepdims=True)       # [8, 1]
        cand = jnp.where(t_best == t_min, face, BIGFLOAT)
        f_min = jnp.min(cand, axis=1, keepdims=True)
        pick = (face == f_min) & (t_best == t_min)

        def sel(x):
            return jnp.sum(jnp.where(pick, x, 0.0), axis=1, keepdims=True)

        hit = t_min < bc(6)[:, 0:1]
        o_t = jnp.where(hit, t_min, bc(6)[:, 0:1])
        o_face = jnp.where(hit, f_min, -1.0)
        o_front = jnp.where(hit, sel(front), 0.0)
        o_ba = jnp.where(hit, sel(ba), 0.0)
        o_bb = jnp.where(hit, sel(bb), 0.0)
        z = jnp.zeros_like(o_t)
        out_ref[pl.ds(k * RAY_SUB, RAY_SUB), :] = jnp.concatenate(
            [o_t, o_face, o_front, o_ba, o_bb, z, z, z], axis=1)
        return 0

    jax.lax.fori_loop(0, RAY_BLOCK // RAY_SUB, subtile, 0)


@functools.partial(jax.jit,
                   static_argnames=("face0", "mesh_lo", "mesh_hi", "interpret"))
def mesh_closest_hit(rays8: jnp.ndarray, tris: jnp.ndarray,
                     aabb: jnp.ndarray, face0: int = 0,
                     mesh_lo: tuple = (-1e30,) * 3,
                     mesh_hi: tuple = (1e30,) * 3,
                     interpret: bool = False):
    """rays8: [N, 8] packed rays (cols ox..dz, t_init, pad), N % RAY_BLOCK
    == 0.  tris [16, F_pad], aabb [nt, 8], mesh_lo/hi from pack_triangles.
    Returns (t, face, front, ba, bb) each [N]; face == -1 where no hit
    beats t_init.  Face ids are PACKED (Morton) order plus face0 — remap
    through the perm array."""
    n = rays8.shape[0]
    fpad = tris.shape[1]
    ntiles = fpad // TRI_LANES
    grid = (n // RAY_BLOCK,)
    kern = functools.partial(_mesh_kernel, ntiles=ntiles, face0=face0,
                             mesh_lo=mesh_lo, mesh_hi=mesh_hi)
    from rtf_tpu.ops.pallas_util import out_struct
    out = pl.pallas_call(
        kern,
        grid=grid,
        out_shape=out_struct((n, 8), jnp.float32, rays8),
        in_specs=[
            pl.BlockSpec((RAY_BLOCK, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tris.shape[0], fpad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ntiles, 8), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((RAY_BLOCK, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((ntiles,), jnp.int32),
            pltpu.VMEM((5, RAY_SUB, TRI_LANES), jnp.float32),
        ],
        interpret=interpret,
    )(rays8, tris, aabb)
    return (out[:, 0], out[:, 1].astype(jnp.int32), out[:, 2],
            out[:, 3], out[:, 4])


def pack_rays(o: jnp.ndarray, d: jnp.ndarray, t_init: jnp.ndarray):
    """[N,3]x2 + [N] -> ([N_pad, 8], N_pad) ray pack.  Padding rays get
    t_init = 0 so nothing validates (face stays -1)."""
    n = o.shape[0]
    npad = ((max(n, RAY_BLOCK) + RAY_BLOCK - 1) // RAY_BLOCK) * RAY_BLOCK
    rays = jnp.zeros((npad, 8), jnp.float32)
    rays = rays.at[:n, 0:3].set(o)
    rays = rays.at[:n, 3:6].set(d)
    rays = rays.at[:n, 6].set(t_init)
    return rays, npad
