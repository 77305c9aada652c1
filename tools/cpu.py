"""Import side-effect module: force JAX onto CPU for host-side debugging.

Usage:  python -c "import tools.cpu; ..."  or  import tools.cpu first.
(The container preimports jax with the TPU backend pinned via
JAX_PLATFORMS; plain env vars set after interpreter start are ignored.)
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import tools.cache  # noqa: E402,F401  (persistent compile cache owner)
