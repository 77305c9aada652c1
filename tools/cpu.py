"""Import side-effect module: force JAX onto CPU for host-side debugging.

Usage:  python -c "import tools.cpu; ..."  or  import tools.cpu first.
(The container preimports jax with the TPU backend pinned via
JAX_PLATFORMS; plain env vars set after interpreter start are ignored.)
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
os.makedirs("/tmp/rtf_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/rtf_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
