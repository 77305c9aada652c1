"""Subprocess body for the 2-process multi-host test (run by
tests/test_multihost.py, one copy per rank).

Exercises rtf_tpu.parallel.distributed.init_multihost +
parallel.mesh.render_sharded end-to-end over a REAL multi-process JAX
runtime: 2 processes x 2 virtual CPU devices, gloo collectives, a
("tile", "spp") mesh spanning both processes.  Each rank verifies its
addressable output shards against a locally-rendered single-device
reference and checks local_tile_range's IO split.

Usage: multihost_worker.py <rank> <coordinator_port>
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=2").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
os.makedirs("/tmp/rtf_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/rtf_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402

from rtf_tpu.parallel.distributed import init_multihost, local_tile_range
from rtf_tpu.parallel.mesh import make_mesh, render_sharded
from rtf_tpu.render.config import RenderConfig
from rtf_tpu.scene.build import build_scene
from rtf_tpu.scene.procedural import box_scene


def main():
    rank = int(sys.argv[1])
    port = sys.argv[2]
    got_rank = init_multihost(f"127.0.0.1:{port}", num_processes=2,
                              process_id=rank)
    assert got_rank == rank == jax.process_index()
    assert jax.process_count() == 2
    assert jax.device_count() == 4, jax.device_count()
    assert len(jax.local_devices()) == 2

    w, h = 64, 8
    scene = build_scene(box_scene(width=w, height=h, with_mesh=False))
    # 2 global samples: one per spp rank (global sample indices are
    # strided across the spp axis)
    cfg = RenderConfig(min_samples=2, max_samples=2, bounces=2,
                       shadow_min=1, shadow_max=1)

    # global mesh: tile axis spans the two processes, spp axis is the
    # two local devices of each process
    mesh = make_mesh(n_tile=2, n_spp=2)
    rad, hits, z, ns = render_sharded(scene, cfg, mesh, seed=0,
                                      fused=False)

    # expected: the SAME render on a purely-local single-device mesh
    # (sample-index striding means the global sample set is identical)
    mesh1 = make_mesh(n_tile=1, n_spp=1, devices=[jax.local_devices()[0]])
    exp = render_sharded(scene, cfg, mesh1, seed=0, fused=False)
    exp = [np.asarray(a) for a in exp]
    assert exp[1].sum() > 0, "degenerate reference render"

    # the per-process IO split helper covers this image's lanes 50/50
    lo, hi = local_tile_range(w * h)
    assert (lo, hi) == ((0, 256) if rank == 0 else (256, 512)), (lo, hi)

    # the global result is NOT fully addressable here — force an
    # all-gather (gloo collectives across the two processes) to
    # replicate it, then compare the full arrays
    from jax.sharding import NamedSharding, PartitionSpec
    rep = jax.jit(lambda *xs: xs,
                  out_shardings=NamedSharding(mesh, PartitionSpec()))
    full = [np.asarray(a.addressable_data(0))
            for a in rep(rad, hits, z, ns)]
    for got, want in zip(full, exp):
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    print(f"MULTIHOST OK rank={rank} hits={int(exp[1].sum())}",
          flush=True)


if __name__ == "__main__":
    main()
