"""Multi-host scaling over DCN: standard JAX distributed initialization.

The reference has no distributed anything (single process, shared
memory + atomics, Final/main.cpp:65-87); the TPU-native story is:

* within a host/pod slice, `parallel.mesh.render_sharded` shards pixel
  tiles and sample groups over the ("tile", "spp") device mesh with a
  psum over ICI;
* across hosts, initialize JAX's distributed runtime (this module) and
  build the SAME mesh over `jax.devices()` — which then spans every
  process's local devices.  Scene data is replicated per device, so the
  only cross-host traffic is the spp-axis psum and the final tile
  gather, both handled by XLA collectives (ICI within a slice, DCN
  between slices).

Usage (one call per process, before any other JAX work):

    from rtf_tpu.parallel.distributed import init_multihost
    init_multihost()                       # TPU pods: all-auto
    # or explicitly:
    init_multihost("10.0.0.1:8476", num_processes=4, process_id=rank)
"""
from __future__ import annotations

import jax


def init_multihost(coordinator_address: str = None,
                   num_processes: int = None,
                   process_id: int = None) -> int:
    """Initialize jax.distributed; returns this process's index.

    On Cloud TPU pods all three arguments are discovered automatically;
    elsewhere pass them explicitly (coordinator = "host:port" of
    process 0)."""
    kw = {}
    if coordinator_address is not None:
        kw["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    jax.distributed.initialize(**kw)
    return jax.process_index()


def local_tile_range(num_px: int):
    """The contiguous pixel-lane range this process's shards own under
    render_sharded's 'tile' sharding (for host-side IO splitting)."""
    n_proc = jax.process_count()
    per = num_px // n_proc
    i = jax.process_index()
    return i * per, (i + 1) * per if i + 1 < n_proc else num_px
