"""Multi-chip scaling: shard_map over pixel tiles + sample groups.

The reference's entire parallel runtime is an atomic pixel queue consumed
by 2x-hardware_concurrency detached std::threads writing a shared
framebuffer (Final/main.cpp:65-87,984-998).  The TPU-native equivalent is
SPMD data parallelism over a device mesh:

* axis "tile"  — the pixel dimension is split into contiguous row tiles,
  one shard per device group (the moral equivalent of the pixel queue);
* axis "spp"   — independent sample batches of the SAME pixels render on
  different devices and are combined with a psum over ICI (how you soak
  up chips once pixel tiles get small).

Scene arrays (instances, BVH, textures, photon grid) are replicated;
only ray/framebuffer state is sharded, so the only collective is the
final psum of the "spp" axis — it rides ICI, never DCN.  Multi-host
works through standard jax.distributed initialization; this module only
sees the global mesh.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax import shard_map as _shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map as _shard_map
import inspect

_HAS_VMA = "check_vma" in inspect.signature(_shard_map).parameters


def shard_map(f=None, *, strict: bool = True, **kw):
    """shard_map with the varying-manual-axes check ON by default
    (VERDICT.md round-1 #7).  Kernel outputs declare their vma via
    ops/pallas_util.out_struct.  strict=False exists for exactly one
    case: Pallas INTERPRET mode (CPU-mesh tests/dryruns), whose HLO
    interpreter discharges block loads into dynamic_slice ops mixing
    varying operands with unvarying loop indices — a jax-internal
    limitation ("Primitive dynamic_slice requires varying manual axes
    to match ... please open an issue"), not a property of our
    kernels; the same kernels pass the check when compiled."""
    if _HAS_VMA and not strict:
        return _shard_map(f, check_vma=False, **kw)
    return _shard_map(f, **kw)
from jax.sharding import Mesh, PartitionSpec as P


def make_mesh(n_tile: int = None, n_spp: int = 1, devices=None) -> Mesh:
    """Build a ("tile", "spp") mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_tile is None:
        n_tile = n // n_spp
    assert n_tile * n_spp == n, f"{n_tile}x{n_spp} != {n} devices"
    arr = np.array(devices).reshape(n_tile, n_spp)
    return Mesh(arr, ("tile", "spp"))


def render_sharded(scene, cfg, mesh: Mesh, seed: int = 0,
                   fused: bool = None, gi_grid=None, caustic_grid=None):
    """The FULL adaptive render, sharded over the mesh.  Returns
    (rad [3,P], hits [P], z [P], nsamples [P]) in pixel-id space,
    replicated on the host — the same contract as `render_device`.

    Per shard: each "tile" rank owns a contiguous chunk of LANE space
    (camera.pixel_order tile order); each "spp" rank renders a strided
    subset of the GLOBAL sample indices for those lanes.  The whole
    per-shard program is `renderer.adaptive_ladder` over
    `renderer.wave_contrib` — the exact bodies the single-chip renderer
    runs (one integrator, no fork), including the adaptive variance
    rungs (need-masks agree across ranks via a psum over "spp") and the
    photon/caustic GI terms.

    Scene arrays (instances, BVH/MXU tables, textures, photon volumes)
    are closed over — replicated, no collectives; only the spp-axis
    psum/pmin of the accumulators touches ICI.

    fused=None auto-selects like render_device_host: the mono Pallas
    wave kernel when the scene/config fuses, the XLA wavefront
    otherwise.  gi_grid/caustic_grid follow render()'s conventions
    (photon grids, or prebuilt IrradianceVolumes on the fused path)."""
    from rtf_tpu.render.camera import pixel_order
    from rtf_tpu.render.fused import frozen_consts, fuse_reason, mxu_tables
    from rtf_tpu.render.renderer import (
        _cached_volume, adaptive_ladder, lanes_to_pixels,
    )
    w, h = scene.width, scene.height
    num_px = w * h
    n_tile = mesh.shape["tile"]
    n_spp = mesh.shape["spp"]
    assert num_px % n_tile == 0, "pixel count must divide the tile axis"

    if fused is None:
        fused = jax.default_backend() == "tpu" \
            and fuse_reason(scene, cfg) is None

    # photon volumes: same conversion the single-chip host loop does
    gi_vol = caustic_vol = None
    if fused and cfg.photon_volume:
        from rtf_tpu.gi.volume import IrradianceVolume
        if gi_grid is not None and cfg.gi_mode in ("photon", "pm_direct"):
            gi_vol = gi_grid if isinstance(gi_grid, IrradianceVolume) \
                else _cached_volume(gi_grid, cfg.knn_radius, cfg.knn_k,
                                    scene.world_min, scene.world_max)
        if caustic_grid is not None:
            caustic_vol = caustic_grid \
                if isinstance(caustic_grid, IrradianceVolume) \
                else _cached_volume(caustic_grid, cfg.caustic_radius,
                                    cfg.knn_k, scene.world_min,
                                    scene.world_max)

    if fused:
        consts = frozen_consts(scene)
        wave_kwargs = dict(fused_consts=consts,
                           mesh_tables=mxu_tables(scene),
                           gi_vol=gi_vol, caustic_vol=caustic_vol)
    else:
        wave_kwargs = dict(gi_grid=gi_grid, caustic_grid=caustic_grid)
    order = jnp.asarray(pixel_order(w, h))

    # strict vma everywhere except Pallas interpret mode (see shard_map)
    strict = not (fused and jax.default_backend() != "tpu")

    @functools.partial(
        shard_map, mesh=mesh, strict=strict,
        in_specs=(P(), P("tile")),
        out_specs=(P(None, "tile"), P("tile"), P("tile"), P("tile")),
    )
    def shard_fn(key, pix):
        kw = dict(wave_kwargs)
        if fused:
            # this tile's first GLOBAL block: keeps in-kernel RNG
            # streams identical to the single-device kernel (exactly
            # so when the shard lane count is a BLOCK multiple; the
            # padding tail of each shard draws from its own blocks
            # otherwise — decorrelated either way)
            from rtf_tpu.render.fused import BLOCK, _pad_blocks
            nblk_shard = _pad_blocks(pix.shape[0]) // BLOCK
            kw["blk0"] = jax.lax.axis_index("tile") * nblk_shard
        return adaptive_ladder(
            scene, cfg, pix % w, pix // w, key,
            spp_rank=jax.lax.axis_index("spp"), n_spp=n_spp,
            psum_axis="spp", vary_axes=tuple(mesh.axis_names),
            **kw)

    key = jax.random.PRNGKey(seed)
    rad, hits, z, ns = jax.jit(shard_fn)(key, order)
    return lanes_to_pixels(rad, hits, z, ns, order)
