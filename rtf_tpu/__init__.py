"""rtf_tpu — a TPU-native (JAX/XLA/Pallas) ray-tracing framework.

A from-scratch re-design of the capabilities of the CS-6620 CPU ray tracer
(reference: Roia2529/RayTracing-folder) as a wavefront renderer:

* megabatched SoA ray queues instead of per-pixel recursion
  (ref: RayTracingFinal/RayTracingFinal/main.cpp:202-344 RenderPixel)
* flattened scene-instance arrays instead of a recursive scene graph walk
  (ref: main.cpp:108-130 TraceNode)
* batched intersection kernels + stackless BVH traversal instead of
  virtual dispatch + recursive BVH walks (ref: include/objects.h)
* hash-grid photon gathers instead of a pointer-chasing kd-tree
  (ref: include/cyPhotonMap.h)
* `jax.sharding`/`shard_map` over pixel tiles instead of an atomic pixel
  queue consumed by detached std::threads (ref: main.cpp:65-87,984-998)
"""

__version__ = "0.1.0"

from rtf_tpu.render.config import RenderConfig, PROFILES  # noqa: F401
