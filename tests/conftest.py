"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before jax is imported anywhere — this is the TPU-world analog of
a fake backend for multi-chip tests (SURVEY.md §4), and keeps unit-test
compiles fast and hermetic.
"""
import os
import sys

# NOTE: the environment may preimport jax with a TPU backend forced via
# JAX_PLATFORMS; override (not setdefault) and also flip the live config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent compile cache: re-runs of the suite skip recompilation.
# Compression forced to zlib — the zstandard writer segfaulted on a
# large CPU-mesh executable mid-suite (VERDICT r3 #7); fresh dir so old
# zstd entries are never read back through zlib.
os.makedirs("/tmp/rtf_jax_cache_zlib", exist_ok=True)
import jax  # noqa: E402

from tools.cache import force_zlib_compression  # noqa: E402

force_zlib_compression()
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/rtf_jax_cache_zlib")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

REFERENCE = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE)
