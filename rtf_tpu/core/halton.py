"""Halton low-discrepancy sequence.

Semantics of the reference's scalar generator (scene.h:131-140):

    float Halton(int index, int base) {
        r = 0; f = 1/base;
        for (i = index; i > 0; i /= base) { r += f * (i % base); f /= base; }
        return r;
    }

Here vectorized over an index array (device) and as a NumPy variant for
host-side precompute tables.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax


def _num_digits(base: int, max_index: int) -> int:
    n, v = 0, 1
    while v <= max_index:
        v *= base
        n += 1
    return max(n, 1)


def halton(index: jnp.ndarray, base: int, max_index: int = 1 << 16) -> jnp.ndarray:
    """Radical inverse of `index` in `base`, vectorized.

    `max_index` bounds the digit loop so it unrolls statically under jit.
    """
    index = index.astype(jnp.int32)
    ndig = _num_digits(base, max_index)
    inv_base = 1.0 / base

    def body(k, carry):
        r, f, i = carry
        r = r + f * (i % base).astype(jnp.float32)
        return (r, f * inv_base, i // base)

    # derive the accumulator from `index` so it inherits index's
    # varying-manual-axes under shard_map (a plain zeros() carry would be
    # unvarying on input but varying on output -> scan type error)
    r0 = (index * 0).astype(jnp.float32)
    f0 = jnp.asarray(inv_base, jnp.float32)
    r, _, _ = lax.fori_loop(0, ndig, body, (r0, f0, index))
    return r


def halton_np(index, base: int):
    """NumPy host-side version; accepts scalar or array index."""
    index = np.asarray(index, np.int64)
    r = np.zeros(index.shape, np.float64)
    f = np.full(index.shape, 1.0 / base)
    i = index.copy()
    while np.any(i > 0):
        r += f * (i % base)
        f /= base
        i //= base
    return r.astype(np.float32)
