"""Import side-effect module: enable the persistent XLA compile cache.

tools/cpu.py already enables it for CPU debugging runs; this is the
backend-agnostic variant for TPU entry points (bench.py, flagship,
profilers) — without it every bench/flagship process pays the full
multi-minute compile of the photon pass + wave kernels again, which is
what starved the sceneb bench extra past its alarm cap."""
import os

import jax

# repo-local (gitignored) so the cache survives container restarts —
# /tmp does not, and losing it costs multi-minute recompiles of the
# photon pass + wave kernels on every entry point after a restart
_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    ".cache", "jax")

try:
    os.makedirs(_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass   # cache is an optimization; never fail an entry point over it
