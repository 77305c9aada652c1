"""Pallas TPU kernel: MXU (Plücker) dense ray x triangle intersection.

The VPU kernel (ops/pallas_mesh.py) is bound by lane-broadcasts of
per-triangle scalars.  This kernel restructures the ray x triangle outer
product as a MATMUL, which is exactly what the MXU systolic array does:

    sign_k(ray, tri) = d . m_k + (o x d) . e_k      (Plücker inner product)
    dn(ray, tri)     = d . n
    on(ray, tri)     = n . a - o . n

are all bilinear in (per-ray 16-vector) x (per-triangle column), so one
[B, 16] x [16, 5*F] matmul per ray block produces, for every pair, the
three edge signs (s_a, s_b, s_c), the plane denominator dn and numerator
on.  The VPU epilogue is ~30 elementwise ops per pair:

    inside  = all signs >= 0  or  all signs <= 0   (both windings, like
              the reference's signed inv-area barycentric test)
    t       = on / dn,  valid = inside & |dn| >= 1e-7 & t > 1e-3 & t < t_init
    bary    = s_a / (s_a+s_b+s_c), s_b / (...)     (identical to the
              projected-area barycentrics of objects.h:226-268 up to fp
              rounding)
    front   = dn <= 0

Closest hit is a lane-dimension min + one-hot select (face id = lowest
among t-ties).  Triangles are tiled over a second grid dimension with the
output block revisited (resident accumulator) so arbitrarily large meshes
fit VMEM.

Ray layout [N, 16]: cols 0-2 d, 3-5 o x d, 6-8 o, 9 = 1, 10 = t_init.
Tri matrix [16, 5*Fp]: column blocks [s_a | s_b | s_c | dn | on], each
Fp = 128-aligned; padding columns are all-zero => dn == 0 => invalid.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ZERO = 1e-3
DZ_EPS = 1e-7
BIGFLOAT = 1.0e30

RAY_BLOCK = 512     # rays per program (sublane-major rows)
TRI_LANES = 512     # triangle columns per tile (lane dim per sign block)


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pack_tri_matrix(a: np.ndarray, b: np.ndarray, c: np.ndarray,
                    tile: int = TRI_LANES) -> np.ndarray:
    """Host-side [n_tiles, 16, 5*tile] Plücker triangle matrix.

    Per tile j, columns [0:tile] = s_a (edge b->c), [tile:2t] = s_b
    (c->a), [2t:3t] = s_c (a->b), [3t:4t] = dn, [4t:5t] = on."""
    f = len(a)
    nt = max(1, (f + tile - 1) // tile)
    out = np.zeros((nt, 16, 5 * tile), np.float32)
    if f == 0:
        return out
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    c = np.asarray(c, np.float32)
    n = np.cross(b - a, c - a)
    ln = np.linalg.norm(n, axis=-1, keepdims=True)
    n = n / np.where(ln > 0, ln, 1.0)
    na = np.sum(n * a, axis=-1)

    def plucker(p, q):
        return np.concatenate([np.cross(p, q), q - p], axis=-1)  # (m, e)

    w_a = plucker(b, c)     # sign ~ bary of vertex a
    w_b = plucker(c, a)
    w_c = plucker(a, b)

    for j in range(nt):
        lo = j * tile
        hi = min(f, lo + tile)
        w = hi - lo
        # rows 0-2 pair with d (m), rows 3-5 with o x d (e)
        out[j, 0:6, 0 * tile:0 * tile + w] = w_a[lo:hi].T
        out[j, 0:6, 1 * tile:1 * tile + w] = w_b[lo:hi].T
        out[j, 0:6, 2 * tile:2 * tile + w] = w_c[lo:hi].T
        # dn = d . n
        out[j, 0:3, 3 * tile:3 * tile + w] = n[lo:hi].T
        # on = na - o . n  (rows 6-8 pair with o, row 9 with 1)
        out[j, 6:9, 4 * tile:4 * tile + w] = -n[lo:hi].T
        out[j, 9, 4 * tile:4 * tile + w] = na[lo:hi]
    return out


def _kernel(rays_ref, tri_ref, t_ref, face_ref, front_ref, ba_ref, bb_ref,
            *, tile: int, face0: int):
    j = pl.program_id(1)
    rays = rays_ref[:, :]                     # [B, 16]
    t_init = rays[:, 10:11]                   # [B, 1]

    @pl.when(j == 0)
    def _():
        t_ref[:, :] = t_init
        face_ref[:, :] = jnp.full_like(face_ref[:, :], -1)
        front_ref[:, :] = jnp.zeros_like(front_ref[:, :])
        ba_ref[:, :] = jnp.zeros_like(ba_ref[:, :])
        bb_ref[:, :] = jnp.zeros_like(bb_ref[:, :])

    # HIGHEST: f32 via multi-pass MXU — the default single-pass bf16
    # matmul loses ~8 mantissa bits, visible as ~1% hit-distance error
    s = jnp.dot(rays, tri_ref[0], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    sa = s[:, 0 * tile:1 * tile]
    sb = s[:, 1 * tile:2 * tile]
    sc = s[:, 2 * tile:3 * tile]
    dn = s[:, 3 * tile:4 * tile]
    on = s[:, 4 * tile:5 * tile]

    inside = ((jnp.minimum(jnp.minimum(sa, sb), sc) >= 0.0)
              | (jnp.maximum(jnp.maximum(sa, sb), sc) <= 0.0))
    bad = jnp.abs(dn) < DZ_EPS
    t = on / jnp.where(bad, DZ_EPS, dn)
    t_best = t_ref[:, :]                      # [B, 1]
    valid = inside & ~bad & (t > ZERO) & (t < t_best)
    tt = jnp.where(valid, t, BIGFLOAT)

    t_min = jnp.min(tt, axis=1, keepdims=True)            # [B, 1]
    any_hit = t_min < t_best

    col = jax.lax.broadcasted_iota(jnp.int32, tt.shape, 1)
    fid = jnp.where(tt == t_min, col, jnp.int32(2 ** 30))
    fmin = jnp.min(fid, axis=1, keepdims=True)            # lowest tie col
    pick = col == fmin                                    # exactly one col

    ssum = sa + sb + sc
    rs = 1.0 / jnp.where(ssum == 0.0, 1.0, ssum)
    ba = sa * rs
    bb = sb * rs
    fr = jnp.where(dn <= 0.0, 1.0, 0.0)

    def sel(x):
        return jnp.sum(jnp.where(pick, x, 0.0), axis=1, keepdims=True)

    t_ref[:, :] = jnp.where(any_hit, t_min, t_ref[:, :])
    face_ref[:, :] = jnp.where(
        any_hit, face0 + j * tile + fmin, face_ref[:, :])
    front_ref[:, :] = jnp.where(any_hit, sel(fr), front_ref[:, :])
    ba_ref[:, :] = jnp.where(any_hit, sel(ba), ba_ref[:, :])
    bb_ref[:, :] = jnp.where(any_hit, sel(bb), bb_ref[:, :])


@functools.partial(jax.jit, static_argnames=("face0", "interpret"))
def mesh_closest_hit_mxu(rays16: jnp.ndarray, trim: jnp.ndarray,
                         face0: int = 0, interpret: bool = False):
    """rays16 [N, 16] (N % RAY_BLOCK == 0), trim [n_tiles, 16, 5*tile].
    Returns (t, face, front, ba, bb) each [N]; face == -1 = no hit."""
    n = rays16.shape[0]
    ntiles, _, five_tile = trim.shape
    tile = five_tile // 5
    grid = (n // RAY_BLOCK, ntiles)
    kern = functools.partial(_kernel, tile=tile, face0=face0)
    from rtf_tpu.ops.pallas_util import out_struct
    out_shape = [
        out_struct((n, 1), jnp.float32, rays16),
        out_struct((n, 1), jnp.int32, rays16),
        out_struct((n, 1), jnp.float32, rays16),
        out_struct((n, 1), jnp.float32, rays16),
        out_struct((n, 1), jnp.float32, rays16),
    ]
    ray_spec = pl.BlockSpec((RAY_BLOCK, 16), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((1, 16, five_tile), lambda i, j: (j, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((RAY_BLOCK, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)

    t, face, front, ba, bb = pl.pallas_call(
        kern,
        grid=grid,
        out_shape=out_shape,
        in_specs=[ray_spec, tri_spec],
        out_specs=[out_spec] * 5,
        interpret=interpret,
    )(rays16, trim)
    return t[:, 0], face[:, 0], front[:, 0], ba[:, 0], bb[:, 0]


def pack_rays16(o: jnp.ndarray, d: jnp.ndarray, t_init: jnp.ndarray):
    """[N,3]x2 + [N] -> ([N_pad, 16], N_pad). Padding rays get t_init=0
    so nothing validates."""
    n = o.shape[0]
    npad = _ceil_to(max(n, RAY_BLOCK), RAY_BLOCK)
    r = jnp.zeros((npad, 16), jnp.float32)
    r = r.at[:n, 0:3].set(d)
    r = r.at[:n, 3:6].set(jnp.cross(o, d))
    r = r.at[:n, 6:9].set(o)
    r = r.at[:n, 9].set(1.0)
    r = r.at[:n, 10].set(t_init)
    return r, npad
