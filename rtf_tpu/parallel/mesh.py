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

from rtf_tpu.core.math import BIGFLOAT
from rtf_tpu.render.camera import primary_rays
from rtf_tpu.render.integrator import render_wave


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
                   fused: bool = None, gi_vol=None):
    """Render scene.width x scene.height with spp = cfg.min_samples x
    (spp axis size), sharded over the mesh. Returns (radiance [P,3],
    hit_count [P], z [P]) fully replicated on the host.

    Per shard: each "tile" rank owns a contiguous block of pixel rows;
    each "spp" rank renders a disjoint set of sample indices for those
    pixels.  Combine: sum radiance/hits (psum over "spp"), then
    all_gather tiles.

    fused=True (default: auto via fusable()) runs the Pallas wave kernel
    per shard instead of the XLA wavefront: each tile rank owns a
    contiguous chunk of LANE space (camera.pixel_order), so the kernel's
    block packing is a plain reshape per shard.  Scene immediates are
    compile-time constants and the mesh tables are closed-over arrays —
    replicated, no collectives; only the spp-axis psum touches ICI.
    """
    from rtf_tpu.render.camera import pixel_order, primary_rays_ch
    from rtf_tpu.render.fused import (
        frozen_consts, fusable, mxu_tables, fused_wave, fused_gi_wave,
    )
    w, h = scene.width, scene.height
    num_px = w * h
    n_tile = mesh.shape["tile"]
    n_spp = mesh.shape["spp"]
    assert num_px % n_tile == 0, "pixel count must divide the tile axis"
    px_per_shard = num_px // n_tile

    if fused is None:
        # photon-volume GI rides the fused path only when the caller
        # passes the prebuilt irradiance volume (gi_vol)
        fused = fusable(scene, cfg) and (cfg.gi_mode != "photon"
                                         or gi_vol is not None)
    if fused:
        consts = frozen_consts(scene)
        mesh_tables = mxu_tables(scene)
        order = jnp.asarray(pixel_order(w, h))
        pix_global = order
    else:
        pix_global = jnp.arange(num_px, dtype=jnp.int32)

    # strict vma everywhere except Pallas interpret mode (see shard_map)
    strict = not (fused and jax.default_backend() != "tpu")

    @functools.partial(
        shard_map, mesh=mesh, strict=strict,
        in_specs=(P(), P("tile")),
        out_specs=(P("tile"), P("tile"), P("tile")),
    )
    def shard_fn(key, pix):
        spp_rank = jax.lax.axis_index("spp")
        rad = jnp.zeros((px_per_shard, 3), jnp.float32)
        hits = jnp.zeros((px_per_shard,), jnp.int32)
        z = jnp.full((px_per_shard,), BIGFLOAT, jnp.float32)
        px = pix % w
        py = pix // w
        local_ids = jnp.arange(px_per_shard, dtype=jnp.int32)
        mask = jnp.ones((px_per_shard,), bool)
        for j in range(cfg.min_samples):
            sample_idx = spp_rank * cfg.min_samples + j
            kj = jax.random.fold_in(jax.random.fold_in(key, sample_idx), 13)
            if fused:
                o3, d3 = primary_rays_ch(
                    scene, px, py, jnp.full_like(px, sample_idx), key=kj,
                    halton_bases=(cfg.halton_base_x, cfg.halton_base_y),
                    dof=scene.dof > 0)
                tile_rank = jax.lax.axis_index("tile")
                seed32 = (jax.random.randint(
                    jax.random.fold_in(kj, 7), (), 0, 2 ** 31 - 1
                ).astype(jnp.int32) + spp_rank * 15485863
                    + tile_rank * 32452843)
                if cfg.gi_mode == "none":
                    rad3, hitl, zl = fused_wave(
                        cfg, consts.obj, o3, d3, mask, seed32,
                        mesh_tables=mesh_tables)
                else:
                    rad3, hitl, zl = fused_gi_wave(
                        cfg, consts.obj, o3, d3, mask, seed32,
                        jax.random.fold_in(kj, 11), gi_vol=gi_vol,
                        mesh_tables=mesh_tables)
                rad = rad + jnp.stack(rad3, axis=-1)
                hits = hits + hitl.astype(jnp.int32)
                z = jnp.minimum(z, jnp.where(hitl, zl, BIGFLOAT))
            else:
                o, d = primary_rays(scene, px, py,
                                    jnp.full_like(px, sample_idx),
                                    key=kj,
                                    halton_bases=(cfg.halton_base_x,
                                                  cfg.halton_base_y),
                                    dof=scene.dof > 0)
                out = render_wave(scene, cfg, o, d, local_ids, mask,
                                  jax.random.fold_in(kj, 7), px_per_shard)
                rad = rad + out.radiance
                hits = hits + out.hit_count
                z = jnp.minimum(z, out.z_min)
        # combine the independent sample batches over ICI
        rad = jax.lax.psum(rad, "spp")
        hits = jax.lax.psum(hits, "spp")
        z = jax.lax.pmin(z, "spp")
        return rad, hits, z

    key = jax.random.PRNGKey(seed)
    fn = jax.jit(shard_fn)
    rad, hits, z = fn(key, pix_global)
    if fused:
        # lane space -> pixel-id space (scatter by the tile order)
        inv = jnp.zeros((num_px,), jnp.int32).at[pix_global].set(
            jnp.arange(num_px, dtype=jnp.int32))
        rad, hits, z = rad[inv], hits[inv], z[inv]
    return rad, hits, z
