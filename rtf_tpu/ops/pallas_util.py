"""Shared Pallas helpers.

`out_struct` builds a `jax.ShapeDtypeStruct` whose varying-manual-axes
set (vma) is the union of the given example inputs' vma.  Under a
STRICT `shard_map` (check_vma=True, the default we keep enabled —
VERDICT.md round-1 #7) every `pallas_call` inside the sharded region
must declare how its outputs vary across mesh axes; outside shard_map
the vma set is empty and this degrades to a plain ShapeDtypeStruct.
"""
from __future__ import annotations

import jax


def _vma_of(x) -> frozenset:
    try:
        return frozenset(getattr(jax.typeof(x), "vma", frozenset()))
    except Exception:
        return frozenset()


def out_struct(shape, dtype, *like) -> jax.ShapeDtypeStruct:
    """ShapeDtypeStruct varying over the union of `like` arrays' manual
    axes (kernel outputs vary wherever any traced input varies)."""
    vma = frozenset()
    for a in like:
        vma = vma | _vma_of(a)
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)
