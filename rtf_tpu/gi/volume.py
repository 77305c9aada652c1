"""Irradiance volume: the photon-map estimate precomputed on a world grid.

The reference calls EstimateIrradiance<400>(radius=1) at every shaded
point below the first bounce (Final/main.cpp:694-705) — a kd-tree kNN
walk per query (cyPhotonMap.h:288-336).  Our hash-grid gather
(gi/grid.estimate_irradiance) reproduces it batched, but the 27-cell x
max_per_cell masked loop is still the most expensive op in a GI render:
at 800x600 x bounces x hemisphere samples it exceeded the backend's
runtime limits (round-1 GOLDENS.md).

TPU-native answer: the photon-map estimate is a SMOOTH field (k=400,
r=1 averages hundreds of photons), so evaluate it ONCE on a dense grid
of cell corners and turn every shading query into a trilinear gather —
8 table lookups instead of a 3456-iteration gather loop.  This is also
the moral equivalent of the reference's (vendored but never wired)
progressive irradiance cache, cyIrradianceMap.h:30-241: precompute the
expensive estimate sparsely, reconstruct by interpolation — done in
world space instead of screen space so it is view- and
wavefront-independent.

Fidelity notes vs the exact estimator:
* the per-photon normal-disc rejection (photon dir . N >= 0 skipped,
  cyPhotonMap.h:385-387) cannot be baked into a position-only table;
  the shading-time factor max(0, -N . meanDir) (main.cpp:700-705)
  still applies and provides the directional gating;
* between corners the field is trilinear instead of re-gathered.
Both effects are bounded by the field's smoothness; use
cfg.photon_volume=False to fall back to exact per-point gathers.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from rtf_tpu.gi.grid import PhotonGrid


@struct.dataclass
class IrradianceVolume:
    table: jnp.ndarray   # [6, n_corners] channel-major: E.rgb, meanDir.xyz
    origin: jnp.ndarray  # [3] corner (0,0,0) position
    dims: tuple = struct.field(pytree_node=False, default=(2, 2, 2))
    cell: float = struct.field(pytree_node=False, default=1.0)


def build_irradiance_volume(grid: PhotonGrid, radius: float, k: int,
                            bounds_min, bounds_max,
                            cell: float = None,
                            filter_type: int = 0,
                            max_per_cell: int = None,
                            chunk: int = 65536,
                            occ_cap: int = 2048) -> IrradianceVolume:
    """Evaluate estimate_irradiance at every corner of a world-space grid.

    cell defaults to the search radius (the field cannot vary faster than
    the estimator's own support).  Corner counts are (dims+1) per axis.

    occ_cap: before estimating, thin cells denser than this with the
    UNBIASED power-rescaled cap (grid.cap_occupancy) — a 1M-photon
    scene concentrates tens of thousands of photons in single cells,
    and the exact truncation-free gather then runs 27*occupancy
    sequential loop iterations per pass in one dispatch (a worker-
    killing hours-long program).  The bake resolves nothing finer than
    trilinear-at-cell-size anyway, so the cap's only effect is extra
    smoothing inside ultra-dense cells.  None disables.
    """
    if occ_cap is not None and grid.max_occupancy > occ_cap:
        from rtf_tpu.gi.grid import cap_occupancy
        # the cap must stay comfortably above k: a capped cell with
        # fewer than k photons would drop the estimator from the kNN
        # regime into the radius-fallback regime, which measures a
        # different (boundary-truncated) quantity at surface edges
        grid = cap_occupancy(grid, max(int(occ_cap), 2 * int(k)))
    if cell is None:
        cell = float(radius)
    bounds_min = np.asarray(bounds_min, np.float32)
    bounds_max = np.asarray(bounds_max, np.float32)
    ext = np.maximum(bounds_max - bounds_min, 1e-3)
    dims = tuple(int(x) for x in np.maximum(1, np.ceil(ext / cell)))
    nx, ny, nz = (d + 1 for d in dims)
    n_corners = nx * ny * nz

    ix = np.arange(nx, dtype=np.float32)
    iy = np.arange(ny, dtype=np.float32)
    iz = np.arange(nz, dtype=np.float32)
    gx, gy, gz = np.meshgrid(ix, iy, iz, indexing="ij")
    # corner id = (i * ny + j) * nz + kk  (x-major, see sample below)
    corners = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=-1)
    corners = corners * cell + bounds_min

    # materialized estimator, small query chunks: ~27*occupancy
    # candidates per query as ONE wide tensor op per chunk (gather +
    # top_k + masked reductions) — a handful of short massively-
    # parallel dispatches.  The previous per-photon fori_loop gather
    # was a single dispatch with a 27*occupancy-long serial chain,
    # which exceeded the tunneled TPU worker's runtime tolerance and
    # crashed it (round 4) — serial loops over photons are a CPU
    # design; the TPU-native shape is materialize-and-reduce.
    p = int(grid.max_occupancy)
    q_chunk = max(8, min(int(chunk), (8 << 20) // max(27 * p, 1)))
    # pad the corner array to a q_chunk multiple so every dispatch
    # reuses ONE compiled shape — a ragged final chunk forced a second
    # full XLA compile of a large program per bake (ADVICE r4)
    n_pad = -n_corners % q_chunk
    if n_pad:
        corners = np.concatenate(
            [corners, np.repeat(corners[-1:], n_pad, axis=0)], axis=0)
    rows = []
    for lo in range(0, n_corners + n_pad, q_chunk):
        q = jnp.asarray(corners[lo:lo + q_chunk])
        irrad, mean_dir = _estimate_corners(grid, q, float(radius),
                                            int(k), int(filter_type))
        rows.append(jnp.concatenate([irrad, mean_dir], axis=-1))
    # channel-major [6, NC]: corner gathers then ride the (long) lane dim
    table = jnp.transpose(jnp.concatenate(rows, axis=0)[:n_corners])
    return IrradianceVolume(table=table, origin=jnp.asarray(bounds_min),
                            dims=dims, cell=float(cell))


@jax.jit
def _normalize_dir(dsum):
    n = jnp.sqrt(jnp.maximum(jnp.sum(dsum * dsum, -1, keepdims=True),
                             1e-30))
    return dsum / n


@functools.partial(jax.jit,
                   static_argnames=("radius", "k", "filter_type"))
def _estimate_corners(grid: PhotonGrid, qp, radius: float, k: int,
                      filter_type: int):
    """Normal-free exact bounded-k irradiance estimate, materialized:
    the [Q, 27*P] candidate set is built with batched gathers, the
    exact k-th-nearest selection radius comes from one top_k (the
    reference heap's dist2[0], cyPhotonMap.h:425-437), and the sums are
    masked reductions.  Semantics identical to
    gi/grid.estimate_irradiance(exact=True, q_normal=None): strict
    d2 < r_cap^2 acceptance, inclusive d2 <= r_k^2 selection when more
    than k candidates pass, pi*r^2-family area normalization."""
    nx, ny, nz = grid.dims
    p = int(grid.max_occupancy)
    capn = grid.pos.shape[0]
    r2cap = jnp.float32(radius * radius)
    base = jnp.floor((qp - grid.origin) / grid.cell_size).astype(jnp.int32)
    lane = jnp.arange(p)[None, :]
    cols_d2, cols_idx = [], []
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                ijk = base + jnp.asarray([dx, dy, dz])
                in_grid = ((ijk[:, 0] >= 0) & (ijk[:, 0] < nx)
                           & (ijk[:, 1] >= 0) & (ijk[:, 1] < ny)
                           & (ijk[:, 2] >= 0) & (ijk[:, 2] < nz))
                ijk = jnp.clip(ijk, 0,
                               jnp.asarray([nx - 1, ny - 1, nz - 1]))
                cid = (ijk[:, 2] * ny + ijk[:, 1]) * nx + ijk[:, 0]
                start = grid.cell_start[cid]
                cnt = jnp.where(in_grid, grid.cell_count[cid], 0)
                cnt = jnp.minimum(cnt, p)
                idx = jnp.minimum(start[:, None] + lane, capn - 1)
                pp = grid.pos[idx]                        # [Q,P,3]
                diff = pp - qp[:, None, :]
                d2 = jnp.sum(diff * diff, axis=-1)
                ok = (lane < cnt[:, None]) & (d2 < r2cap)
                cols_d2.append(jnp.where(ok, d2, jnp.inf))
                cols_idx.append(idx)
    alld2 = jnp.concatenate(cols_d2, axis=1)              # [Q, 27P]
    allidx = jnp.concatenate(cols_idx, axis=1)
    count = jnp.sum(jnp.isfinite(alld2), axis=1)
    kk = min(max(k, 1), alld2.shape[1])
    r2k = -jax.lax.top_k(-alld2, kk)[0][:, kk - 1]
    over = (count > k) & jnp.isfinite(r2k) if k > 0 \
        else jnp.zeros_like(count, bool)
    r2_eff = jnp.where(over, r2k, r2cap)
    sel = alld2 <= r2_eff[:, None]      # inf candidates never selected
    d2c = jnp.where(sel, alld2, 0.0)
    if filter_type == 1:                # FILTER_LINEAR
        filt = 1.0 - jnp.sqrt(d2c / jnp.maximum(r2_eff, 1e-30)[:, None])
        area = (jnp.pi / 3.0) * r2_eff
    elif filter_type == 2:              # FILTER_QUADRATIC
        filt = 1.0 - d2c / jnp.maximum(r2_eff, 1e-30)[:, None]
        area = (jnp.pi * 0.5) * r2_eff
    else:
        filt = jnp.ones_like(d2c)
        area = jnp.pi * r2_eff
    w = jnp.where(sel, filt, 0.0)
    pw = grid.power[allidx]                               # [Q,27P,3]
    pd = grid.dir[allidx]
    irrad = jnp.sum(pw * w[:, :, None], axis=1)
    maxp = jnp.max(pw, axis=-1)
    dsum = jnp.sum(pd * (w * maxp)[:, :, None], axis=1)
    irrad = irrad / jnp.maximum(area, 1e-30)[:, None]
    return irrad, _normalize_dir(dsum)


def sample_volume_ch(vol: IrradianceVolume, p3):
    """Trilinear sample at channelwise points p3 = (px, py, pz), each
    [M].  Returns (E3, D3) channel tuples of [M] arrays.  Every
    intermediate is [M] (TPU lane-major) or a [6, M] gather; points
    outside the volume clamp to the border (photon estimates there are
    ~zero anyway)."""
    nxd, nyd, nzd = vol.dims
    ny, nz = nyd + 1, nzd + 1
    fx = jnp.clip((p3[0] - vol.origin[0]) * (1.0 / vol.cell),
                  0.0, nxd - 1e-4)
    fy = jnp.clip((p3[1] - vol.origin[1]) * (1.0 / vol.cell),
                  0.0, nyd - 1e-4)
    fz = jnp.clip((p3[2] - vol.origin[2]) * (1.0 / vol.cell),
                  0.0, nzd - 1e-4)
    ix = jnp.floor(fx).astype(jnp.int32)
    iy = jnp.floor(fy).astype(jnp.int32)
    iz = jnp.floor(fz).astype(jnp.int32)
    wx, wy, wz = fx - ix, fy - iy, fz - iz

    acc = [jnp.zeros_like(fx) for _ in range(6)]
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                cid = ((ix + dx) * ny + (iy + dy)) * nz + (iz + dz)
                tab = vol.table[:, cid]              # [6, M]
                w = ((wx if dx else 1.0 - wx)
                     * (wy if dy else 1.0 - wy)
                     * (wz if dz else 1.0 - wz))
                for r in range(6):
                    acc[r] = acc[r] + tab[r] * w
    e3 = tuple(acc[0:3])
    dlen = jnp.sqrt(jnp.maximum(
        acc[3] * acc[3] + acc[4] * acc[4] + acc[5] * acc[5], 1e-30))
    d3 = tuple(acc[3 + c] / dlen for c in range(3))
    return e3, d3


def sample_volume(vol: IrradianceVolume, p: jnp.ndarray):
    """[M,3] wrapper over sample_volume_ch: returns (irradiance [M,3],
    unit mean_dir [M,3])."""
    e3, d3 = sample_volume_ch(vol, (p[:, 0], p[:, 1], p[:, 2]))
    return jnp.stack(e3, axis=-1), jnp.stack(d3, axis=-1)


def gi_term(vol: IrradianceVolume, p, n, kd):
    """kd * E(p) * max(0, N . -meanDir): the reference's deep-bounce GI
    contribution (main.cpp:700-705) from the volume."""
    irrad, mean_dir = sample_volume(vol, p)
    cos = jnp.maximum(0.0, -jnp.sum(n * mean_dir, axis=-1))
    return kd * irrad * cos[:, None]
